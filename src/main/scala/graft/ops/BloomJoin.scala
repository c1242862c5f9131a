package graft.ops

import graft.Tables
import graft.functions.{Bloom, GraftFunctions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-prefiltered semi join — the explicit runtime-filter join
  * strategy for the "big fact ⋈ selective mid-size dim" shape.
  *
  * Spark's own choices at this shape are (a) broadcast the dim — dies
  * when the dim passes the broadcast ceiling — or (b) shuffle BOTH
  * sides, which at 100 TB means the exchange of the entire fact table
  * even when only 1% of it survives the join. This operator takes the
  * third path: one distributed pass builds a bloom filter over the
  * dim keys ([[graft.functions.Bloom.build]]), the filter rides the
  * plan as a BINARY literal inside a codegen'd probe
  * ([[graft.functions.BloomMightContain]]) that drops ~99% of fact
  * rows AT THE SCAN, and the exact semi join that follows (now over
  * the surviving sliver) removes the bloom's false positives. Result
  * is bit-identical to the plain semi join — the sketch can only
  * ADMIT extra candidate rows (no false negatives), never lose one.
  *
  * The reference engine (`/root/reference/batch_processor.go:109-134`)
  * pulls whole batches and dispatches them opaquely — the
  * push-a-predicate-to-the-source idea has no analogue there; this is
  * north-star scale machinery.
  */
object BloomJoin {

  /** Dim cardinality the default query sizes its filter for; ~18 KB
    * at 3% fpp. Real deployments pass their own expectation — a
    * 100×-undersized filter degrades fpp toward 1 and the operator
    * degrades gracefully to the plain semi join's cost, never to a
    * wrong answer.
    */
  private val ExpectedRichCustomers = 20000L
  private val DefaultFpp = 0.03
  private val RichBalance = 9000.0

  /** Flagship shape: revenue of orders placed by high-balance
    * customers, per priority — fact `orders` bloom-prefiltered by the
    * `c_acctbal > 9000` dim slice before the exact semi join.
    */
  def bloomSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > RichBalance)
      .select(col("c_custkey").as("k"))
    val fact = Tables.orders(spark, dir)
    bloomSemiJoin(fact, "o_custkey", dim, "k",
        ExpectedRichCustomers, DefaultFpp)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("revenue_cents"))
      .orderBy(col("o_orderpriority"))
  }

  /** DataFrame-first form: semi-join `fact` to `dim` on
    * `factKey = dimKey`, pre-filtering the fact scan with a bloom
    * filter built from the dim keys. Exact semantics of
    * `fact.join(dim, fact(factKey) === dim(dimKey), "left_semi")` —
    * NULL fact keys never match, same as SQL `IN`.
    *
    * Builds the filter eagerly (one Spark job on the dim side) — call
    * once and reuse the returned frame; at scale the job is a key-only
    * scan of the dim, orders of magnitude cheaper than the fact
    * exchange it saves.
    *
    * STATIC-DIM ASSUMPTION: the bloom filter is embedded in the plan
    * as a literal at build time, while the exact semi join re-reads
    * `dim` at action time. The bit-identical-to-plain-semi-join
    * guarantee therefore holds only when the dim frame is a stable
    * snapshot between this call and the action — a dim whose
    * underlying data changes (or recomputes non-deterministically,
    * e.g. an unseeded sample) can gain keys the frozen filter never
    * saw, and fact rows matching those keys are dropped at the probe.
    * For a mutating dim, snapshot it first (`localCheckpoint()` or a
    * written copy) and pass the snapshot to both roles.
    */
  def bloomSemiJoin(fact: DataFrame, factKey: String, dim: DataFrame,
                    dimKey: String, expectedItems: Long,
                    fpp: Double): DataFrame = {
    GraftFunctions.register(fact.sparkSession)
    val bytes = Bloom.build(dim, dimKey, expectedItems, fpp)
    fact
      .filter(Bloom.mightContain(col(factKey), bytes))
      .join(dim.select(col(dimKey).cast("long").as(s"__bloom_$dimKey")),
        col(factKey).cast("long") === col(s"__bloom_$dimKey"), "left_semi")
  }

  val bloomSemiJoinSql: String =
    """SELECT o_orderpriority,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS revenue_cents
      |FROM orders
      |WHERE o_custkey IN (
      |  SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin
}
