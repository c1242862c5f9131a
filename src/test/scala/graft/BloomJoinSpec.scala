package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bloom_might_contain: no false negatives; nulls stay null") {
    import spark.implicits._
    functions.GraftFunctions.register(spark)
    val dim = (1L to 1000L by 7).toDF("k")
    val bytes = functions.Bloom.build(dim, "k", 200L, 0.01)
    val keys = dim.collect().map(_.getLong(0)).toSet
    // every inserted key MUST probe true — the sketch guarantee
    val probed = (1L to 1000L).toDF("x")
      .select(col("x"), functions.Bloom.mightContain(col("x"), bytes).as("hit"))
      .collect()
    assert(probed.filter(r => keys(r.getLong(0))).forall(_.getBoolean(1)))
    // fpp sanity: non-members rarely probe true at 1% target
    val fp = probed.count(r => !keys(r.getLong(0)) && r.getBoolean(1))
    assert(fp <= 30, s"implausible false positive count $fp/857")
    // null key → null probe (IN semantics), and SQL-surface parity
    val n = Seq[Option[Long]](Some(8L), None).toDF("x")
      .select(functions.Bloom.mightContain(col("x"), bytes)).collect()
    assert(n.exists(_.isNullAt(0)))
    val viaSql = (1L to 50L).toDF("x")
      .selectExpr("bloom_might_contain(x, " +
        s"X'${bytes.map("%02X".format(_)).mkString}') AS hit")
      .collect().map(_.getBoolean(0))
    assert(viaSql.toSeq == probed.take(50).map(_.getBoolean(1)).toSeq)
  }

  test("bloomSemiJoin: equals the exact semi join; probe sits before the shuffle") {
    import spark.implicits._
    val fact = (1L to 5000L).map(i => (i, i % 97)).toDF("id", "key")
    val dim = Seq(3L, 11L, 42L, 96L).toDF("dk")
    val got = ops.BloomJoin.bloomSemiJoin(fact, "key", dim, "dk", 10L, 0.03)
      .select(col("id")).as[Long].collect().sorted
    val want = fact.join(dim, col("key") === col("dk"), "left_semi")
      .select(col("id")).as[Long].collect().sorted
    assert(got.toSeq == want.toSeq, "bloom join changed the semi-join result")
    // a null fact key never matches, mirroring SQL IN
    val nf = Seq[(Long, Option[Long])]((1L, Some(3L)), (2L, None))
      .toDF("id", "key")
    val nr = ops.BloomJoin.bloomSemiJoin(nf, "key", dim, "dk", 10L, 0.03)
      .select(col("id")).as[Long].collect()
    assert(nr.toSeq == Seq(1L))
    // plan contract: the bloom probe is a Filter on the fact side,
    // not a post-join predicate — at scale that is the whole point
    val plan = ops.BloomJoin.bloomSemiJoin(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("bloom_might_contain"),
      s"probe missing from the physical plan:\n$plan")
    assert(plan.contains("LeftSemi"),
      s"exact semi join missing — bloom alone may admit false positives:\n$plan")
    // corpus result matches the oracle-shaped plain semi join
    val corpus = ops.BloomJoin.bloomSemiJoin(spark, sfDir).collect()
    assert(corpus.length == 5 && corpus.map(_.getAs[Long]("n_orders")).sum > 0)
  }

  test("bloomSemiJoin: probe survives in shuffle-join mode — the shape it exists for") {
    // with broadcast off (the over-the-ceiling dim scenario), the plan
    // must keep the codegen probe on the fact side AND fall back to a
    // shuffled semi join — the bloom cuts the exchange, the join keeps
    // exactness
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = ops.BloomJoin.bloomSemiJoin(spark, sfDir)
      val plan = q.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("bloom_might_contain"),
        s"probe lost in shuffle mode:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffled semi join with broadcast disabled:\n$plan")
      // and the result is unchanged from the broadcast-mode run
      val rows = q.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      val bc = ops.BloomJoin.bloomSemiJoin(spark, sfDir).collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(rows == bc, "join strategy changed the answer")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
