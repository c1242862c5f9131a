package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-2 relational surface (grouping sets,
  * window battery, correlated subqueries) and the deterministic
  * sampling ops — value correctness is covered by the DuckDB oracle
  * gate; these pin the structural properties the oracle can't express.
  */
class AdvancedSpec extends AnyFunSuite {
  import SparkTestSession._

  test("grouping sets: per-nation rows + per-priority rows + one grand total, consistent counts") {
    val df = ops.Advanced.groupingSetsAgg(spark, sfDir).cache()
    val nNations = df.filter(col("n_name") =!= "ALL").count()
    val nPrios = df.filter(col("n_name") === "ALL" && col("o_orderpriority") =!= "ALL").count()
    val grand = df.filter(col("n_name") === "ALL" && col("o_orderpriority") === "ALL")
    assert(grand.count() == 1)
    assert(df.count() == nNations + nPrios + 1)
    // each grouping set partitions the same order set: totals agree
    val total = grand.head().getAs[Long]("n_orders")
    val byNation = df.filter(col("n_name") =!= "ALL").agg(sum("n_orders")).head().getLong(0)
    val byPrio = df.filter(col("n_name") === "ALL" && col("o_orderpriority") =!= "ALL")
      .agg(sum("n_orders")).head().getLong(0)
    assert(byNation == total && byPrio == total)
  }

  test("window battery: offsets, frames and ranks agree with per-group recomputation") {
    val df = ops.Advanced.windowBattery(spark, sfDir).cache()
    val orders = Tables.orders(spark, sfDir)
    assert(df.count() == orders.count())
    // first order per customer has no predecessor; every quartile is 1..4
    assert(df.filter(col("quartile") < 1 || col("quartile") > 4).count() == 0)
    assert(df.filter(col("cd") <= 0 || col("cd") > 1).count() == 0)
    // the last running sum per customer equals that customer's total
    val lastRun = df.join(
        df.groupBy("o_custkey").agg(max("run_sum").as("max_run")), Seq("o_custkey"))
      .filter(col("run_sum") === col("max_run"))
      .select(col("o_custkey"), col("run_sum")).distinct()
    val totals = orders.groupBy("o_custkey")
      .agg(round(sum("o_totalprice"), 2).as("expect"))
    assert(lastRun.join(totals, Seq("o_custkey"))
      .filter(abs(col("run_sum") - col("expect")) > 0.011).count() == 0)
  }

  test("correlated subqueries decorrelate into joins — no nested loop, no cartesian") {
    val df = ops.Advanced.subqueries(spark, sfDir)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"subquery did not decorrelate:\n$plan")
    // semantics: every surviving customer has at least one order
    val custWithOrders = Tables.orders(spark, sfDir).select(col("o_custkey")).distinct()
    assert(df.join(custWithOrders, df("c_custkey") === custWithOrders("o_custkey"), "left_anti")
      .count() == 0)
  }

  test("lateral top-n decorrelates to a keyed join + ranking, not per-row re-execution") {
    val df = ops.Advanced.lateralTopN(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"LATERAL degraded to a nested loop:\n$plan")
    // 25 nations × top-2 (ties impossible on the unique custkey order)
    assert(df.count() <= 50 && df.count() > 0)
    assert(df.groupBy("n_name").count().filter(col("count") > 2).count() == 0,
      "a nation returned more than its LIMIT 2 rows")
  }

  test("correlated IN / NOT IN decorrelate, and NOT IN honors NULL semantics") {
    val df = ops.Advanced.subqueriesIn(spark, sfDir).cache()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"correlated IN/NOT IN degraded to a nested loop:\n$plan")
    // the IN decorrelates to a semi join and the NOT IN to Spark's
    // null-aware anti hash join — keyed joins at any scale
    assert(plan.contains("LeftSemi"), s"IN did not become a semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT IN did not become an anti join:\n$plan")
    // expected set, recomputed with explicit joins: the correlated IN is
    // a semi join; the NOT IN excludes EVERY customer with an urgent
    // order — matching ones via equality, price>400000 ones via the
    // injected NULL (x NOT IN (...NULL...) is never TRUE). A non
    // null-aware anti join would wrongly keep the latter group.
    val c = Tables.customer(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val richer = c.join(s,
      c("c_nationkey") === s("s_nationkey") && s("s_acctbal") > c("c_acctbal"), "left_semi")
    val expected = richer.join(o.filter(col("o_orderpriority") === "1-URGENT"),
        richer("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"))
    val got = df.select(col("c_custkey"))
    assert(got.exceptAll(expected).count() == 0 && expected.exceptAll(got).count() == 0,
      "NOT IN NULL semantics diverge from the ANSI expectation")
  }

  test("SQL-backed queries run concurrently without racing on temp views") {
    import scala.concurrent._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // before per-call namespaced views, concurrent createOrReplaceTempView
      // calls could rebind another in-flight query's table mid-analysis
      val futs = (1 to 4).map { _ =>
        Future {
          ops.Advanced.subqueries(spark, sfDir).count() * 100000 +
            ops.Advanced.subqueriesIn(spark, sfDir).count()
        }
      }
      val results = Await.result(Future.sequence(futs),
        duration.Duration(180, "s"))
      assert(results.distinct.size == 1,
        s"concurrent runs disagreed: $results")
    } finally pool.shutdown()
  }

  test("SQL-backed queries leave no canonically-named temp views behind") {
    ops.Advanced.subqueries(spark, sfDir).count()
    ops.Advanced.subqueriesIn(spark, sfDir).count()
    val views = spark.catalog.listTables().collect().map(_.name).toSet
    Seq("customer", "supplier", "orders", "nation").foreach { n =>
      assert(!views.contains(n),
        s"global temp view '$n' leaked — concurrent queries would race on it")
    }
  }

  test("train split is deterministic, disjoint and covering with ~80/10/10 mass") {
    val df = ops.Sampling.trainSplit(spark, sfDir).cache()
    val n = Tables.documents(spark, sfDir).count()
    assert(df.count() == n)
    val bySplit = df.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum == n)
    assert(bySplit("train") > bySplit.getOrElse("val", 0L))
    assert(bySplit("train") > bySplit.getOrElse("test", 0L))
    // deterministic: a second evaluation assigns identically
    val again = ops.Sampling.trainSplit(spark, sfDir)
    assert(df.exceptAll(again).count() == 0 && again.exceptAll(df).count() == 0)
  }

  test("content split co-assigns byte-identical documents; corpus split is leak-free") {
    import spark.implicits._
    // planted: three ids share one text, two ids share another
    val docs = Seq(
      (1L, "alpha beta gamma"), (200L, "alpha beta gamma"), (999999L, "alpha beta gamma"),
      (2L, "delta epsilon"), (777L, "delta epsilon"),
      (3L, "unique text here"))
      .toDF("doc_id", "text")
    val out = ops.Sampling.contentSplit(docs, "doc_id", "text")
    val planted = out.join(docs, Seq("doc_id"))
      .groupBy("text").agg(countDistinct("split").as("ns"))
    assert(planted.filter(col("ns") > 1).count() == 0,
      "identical texts landed in different splits")
    // corpus-level: every md5(text) maps to exactly one split
    val corpus = ops.Sampling.contentSplit(spark, sfDir)
      .join(Tables.documents(spark, sfDir), Seq("doc_id"))
      .groupBy(md5(col("text"))).agg(countDistinct("split").as("ns"))
    assert(corpus.filter(col("ns") > 1).count() == 0,
      "content-keyed split leaked a duplicated text across splits")
  }

  test("scd2: versions chain without gaps, exactly one current row per key") {
    import spark.implicits._
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val feed = Seq(
      (1L, 10L, ts(0), "A"), (1L, 11L, ts(5), "B"), (1L, 12L, ts(9), "C"),
      (2L, 20L, ts(2), "X"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = ops.Advanced.scd2(feed, "user_id", "event_id", "ts", "event_type")
      .collect()
    val k1 = got.filter(_.getLong(0) == 1L)
    assert(k1.map(r => (r.getInt(1), r.getString(2))).toSeq ==
      Seq((1, "A"), (2, "B"), (3, "C")))
    // intervals chain: each version's valid_to is the next valid_from
    k1.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(4) == b.getLong(3), "validity gap or overlap")
    }
    assert(k1.count(_.getInt(5) == 1) == 1 && k1.last.getInt(5) == 1)
    assert(got.filter(_.getLong(0) == 2L).map(r =>
      (r.getInt(1), r.getInt(5))).toSeq == Seq((1, 1)))
    // corpus run: one open row per key, versions dense from 1
    val corpus = ops.Advanced.scd2(spark, sfDir).cache()
    val keys = corpus.select("key").distinct().count()
    assert(corpus.filter(col("is_current") === 1).count() == keys)
    assert(corpus.filter(col("version") === 1).count() == keys)
    assert(corpus.count() == Tables.events(spark, sfDir).count())
  }

  test("weighted sample favors heavy rows and stays deterministic") {
    import spark.implicits._
    // 400 light rows (w=1) vs 100 heavy rows (w=10000): A-Res must pick
    // overwhelmingly heavy despite lights outnumbering heavies 4:1
    val planted = ((0L until 400L).map(i => (i, 1L)) ++
      (1000L until 1100L).map(i => (i, 10000L))).toDF("doc_id", "n_chars")
    val got = ops.Sampling.weightedSample(planted, "doc_id", "n_chars", 50).cache()
    assert(got.count() == 50)
    val heavy = got.filter(col("doc_id") >= 1000L).count()
    assert(heavy >= 45, s"weighting too weak: only $heavy/50 heavy rows")
    // zero/negative weights can never be sampled
    val withZero = planted.withColumn("n_chars",
      when(col("doc_id") < 200, lit(0L)).otherwise(col("n_chars")))
    assert(ops.Sampling.weightedSample(withZero, "doc_id", "n_chars", 600)
      .filter(col("w") <= 0).count() == 0)
    // determinism: the corpus sample equals itself run-to-run
    val a = ops.Sampling.weightedSample(spark, sfDir).collect().map(_.getLong(0))
    val b = ops.Sampling.weightedSample(spark, sfDir).collect().map(_.getLong(0))
    assert(a.toSeq == b.toSeq)
  }

  test("stratified sample downsamples the majority language harder") {
    val doc = Tables.documents(spark, sfDir)
    val s = ops.Sampling.stratifiedSample(spark, sfDir).cache()
    val rates = s.groupBy("lang").count().withColumnRenamed("count", "kept")
      .join(doc.groupBy("lang").count(), Seq("lang"))
      .withColumn("rate", col("kept") / col("count"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("rate")).toMap
    assert(rates("en") < 0.2, s"en rate ${rates("en")} should be ~0.10")
    assert(rates.filter(_._1 != "en").values.forall(r => r > 0.05 && r < 0.4),
      s"non-en rates should be ~0.20: $rates")
  }

  test("tfidf: exactly five non-negative-score terms per language, ranks contiguous") {
    val df = ops.TextAnalysis.tfidf(spark, sfDir).cache()
    val langs = Tables.documents(spark, sfDir).select("lang").distinct().count()
    assert(df.count() == 5 * langs)
    assert(df.filter(col("score") < 0).count() == 0)
    assert(df.groupBy("lang").agg(collect_set("rank").as("rs"))
      .filter(size(col("rs")) =!= 5).count() == 0)
  }

  test("text normalization round-trips the messed-up copy back to the original") {
    val df = ops.TextAnalysis.textNormalize(spark, sfDir)
    assert(df.filter(col("roundtrip") =!= 1).count() == 0)
  }

  test("pii redaction removes exactly the injected identifiers on every document") {
    val df = ops.TextAnalysis.piiRedact(spark, sfDir)
    assert(df.filter(col("clean") =!= 1).count() == 0)
  }

  test("interpolate: full grid, observed days untouched, gaps bounded by their endpoints") {
    val df = ops.Advanced.interpolate(spark, sfDir).cache()
    val types = Tables.events(spark, sfDir).select("event_type").distinct().count()
    val days = df.select("day").distinct().count()
    assert(df.count() == types * days, "grid must be dense: |types| x |days|")
    // observed days (n > 0) keep their exact daily average: never interpolated
    assert(df.filter(col("n") > 0 && col("interpolated") =!= 0).count() == 0)
    // every gap-filled value lies within [min(prev,next), max(prev,next)]:
    // recompute the neighbor bounds independently with lag/lead over observed rows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("day")
    val withBounds = df
      .withColumn("pv", last(when(col("n") > 0, col("v_interp")), ignoreNulls = true)
        .over(w.rowsBetween(Long.MinValue, -1)))
      .withColumn("nv", first(when(col("n") > 0, col("v_interp")), ignoreNulls = true)
        .over(w.rowsBetween(1, Long.MaxValue)))
      .filter(col("interpolated") === 1 && col("pv").isNotNull && col("nv").isNotNull)
    val outside = withBounds.filter(
      col("v_interp") < least(col("pv"), col("nv")) - 1e-9 ||
        col("v_interp") > greatest(col("pv"), col("nv")) + 1e-9)
    assert(outside.count() == 0, "interpolated value escaped its endpoint bounds")
  }

  test("transitions: planted path counts exact; outgoing probabilities sum to one") {
    import spark.implicits._
    // user 1: v→c→v→c→p ; user 2: v→v→p. Transitions:
    // v→c ×2, c→v ×1, c→p ×1, v→v ×1, v→p ×1
    val rows = Seq(
      (1L, 1L, "2024-01-01 00:00:01", "v"), (2L, 1L, "2024-01-01 00:00:02", "c"),
      (3L, 1L, "2024-01-01 00:00:03", "v"), (4L, 1L, "2024-01-01 00:00:04", "c"),
      (5L, 1L, "2024-01-01 00:00:05", "p"),
      (6L, 2L, "2024-01-01 00:00:01", "v"), (7L, 2L, "2024-01-01 00:00:02", "v"),
      (8L, 2L, "2024-01-01 00:00:03", "p"))
      .map { case (id, u, t, ty) => (id, u, java.sql.Timestamp.valueOf(t), ty) }
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = ops.Advanced.transitions(rows, "event_id", "user_id", "ts", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got(("v", "c")) == ((2L, 0.5)) && got(("v", "v")) == ((1L, 0.25)) &&
      got(("v", "p")) == ((1L, 0.25)), s"v-row wrong: $got")
    assert(got(("c", "v")) == ((1L, 0.5)) && got(("c", "p")) == ((1L, 0.5)),
      s"c-row wrong: $got")
    assert(!got.keys.exists(_._1 == "p"), "terminal type must have no outgoing row")
    // corpus run: each prev_type's probabilities sum to ~1
    val corpus = ops.Advanced.transitions(spark, sfDir)
    val sums = corpus.groupBy("prev_type").agg(sum("p").as("sp"))
      .filter(abs(col("sp") - 1.0) > 0.01).count()
    assert(sums == 0, "outgoing probabilities do not sum to one")
  }

  test("anomaly: planted spike flagged, stable stream and constant stream silent") {
    import spark.implicits._
    // user 1: 30 alternating 10.0/10.2 readings (z ≈ ±1), then a 50.0
    // spike — only the spike may flag. user 2: constant values → zero
    // sample variance → excluded entirely, never divided by zero.
    val rows =
      (1 to 30).map(i => (i.toLong, 1L,
        java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d"),
        if (i % 2 == 0) 10.2 else 10.0)) ++
      Seq((31L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 50.0)) ++
      (1 to 25).map(i => (100L + i, 2L,
        java.sql.Timestamp.valueOf(f"2024-01-01 01:00:${i - 1}%02d"), 7.0))
    val planted = rows.toDF("event_id", "user_id", "ts", "value")
    val got = ops.Advanced.anomaly(planted, "event_id", "user_id", "ts", "value")
      .collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(31L),
      s"expected exactly the planted spike: ${got.mkString(",")}")
    val spike = got.head
    assert(spike.getAs[Long]("value_milli") == 50000L)
    assert(spike.getAs[Long]("win_n") == 20L)
    assert(spike.getAs[Double]("z") > 100, s"spike z too small: $spike")
    // corpus run: flags are a strict subset of scored rows; z beyond the
    // threshold on every output row
    val corpus = ops.Advanced.anomaly(spark, sfDir).cache()
    assert(corpus.filter(abs(col("z")) <= 3.0).count() == 0)
    assert(corpus.filter(col("win_n") < 10 || col("win_n") > 20).count() == 0)
  }

  test("ewma: planted decay exact in dyadic arithmetic; constant stream is a fixed point") {
    import spark.implicits._
    def t(sec: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$sec%02d")
    // user 1: 1.0, 2.0, 3.0 — hand-computed dyadic EWMA at each row.
    // user 2: 20 constant 5.0 readings — EWMA must sit exactly on 5000
    // milli at every row (convex weights), and the denominator saturates
    // at 2^16 − 1 once 16 lags exist.
    val rows = Seq((1L, 1L, t(1), 1.0), (2L, 1L, t(2), 2.0), (3L, 1L, t(3), 3.0)) ++
      (1 to 20).map(i => (100L + i, 2L, t(i), 5.0))
    val got = ops.Advanced.ewma(rows.toDF("event_id", "user_id", "ts", "value"),
      "event_id", "user_id", "ts", "value").collect()
    val byId = got.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Double]("ewma_milli") == 1000.0)
    assert(byId(2L).getAs[Double]("ewma_milli") == 1666.6667) // 81920000/49152
    assert(byId(3L).getAs[Double]("ewma_milli") == 2428.5714) // 139264000/57344
    assert(byId(2L).getAs[Long]("w_den") == 49152L)
    val u2 = got.filter(_.getLong(1) == 2L)
    assert(u2.forall(_.getAs[Double]("ewma_milli") == 5000.0),
      "constant stream must be an EWMA fixed point")
    assert(u2.filter(_.getLong(0) >= 116L).forall(_.getAs[Long]("w_den") == 65535L),
      "denominator must saturate at 2^16 - 1 once 16 lags exist")
    // corpus: EWMA is a convex combination of the user's values — it can
    // never leave the user's [min, max] envelope
    val corpus = ops.Advanced.ewma(spark, sfDir)
    val breached = corpus.groupBy("user_id")
      .agg(min("value_milli").as("lo"), max("value_milli").as("hi"),
        min("ewma_milli").as("elo"), max("ewma_milli").as("ehi"))
      .filter(col("elo") < col("lo") - 0.0001 || col("ehi") > col("hi") + 0.0001)
    assert(breached.count() == 0, "EWMA left the convex envelope")
  }

  test("autocorr: alternating series hits r = ±1 exactly; constant series is excluded") {
    import spark.implicits._
    def t(sec: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:0${sec / 60}:${sec % 60}%02d")
    // user 1: 14 events alternating 1.0 / 3.0 — lag-1 pairs satisfy
    // y = 4 − x exactly (r = −1), lag-2 pairs y = x (r = +1), lag-3
    // y = 4 − x (r = −1). user 2: constant → zero variance → no rows.
    val rows = (1 to 14).map(i =>
        (i.toLong, 1L, t(i), if (i % 2 == 0) 3.0 else 1.0)) ++
      (1 to 14).map(i => (100L + i, 2L, t(i), 7.0))
    val got = ops.Advanced.autocorr(rows.toDF("event_id", "user_id", "ts", "value"),
      "event_id", "user_id", "ts", "value").collect()
    val byLag = got.filter(_.getLong(0) == 1L)
      .map(r => r.getAs[Int]("lag_k") -> r.getAs[Double]("r")).toMap
    assert(byLag == Map(1 -> -1.0, 2 -> 1.0, 3 -> -1.0), s"got $byLag")
    assert(got.count(_.getLong(0) == 2L) == 0,
      "constant series must be excluded, not NaN")
    // pair counts: lag k over 14 events → 14 − k pairs
    val ns = got.filter(_.getLong(0) == 1L)
      .map(r => r.getAs[Int]("lag_k") -> r.getAs[Long]("n")).toMap
    assert(ns == Map(1 -> 13L, 2 -> 12L, 3 -> 11L), s"got $ns")
    // corpus: r bounded, lags from the configured set, n floors hold
    val corpus = ops.Advanced.autocorr(spark, sfDir).cache()
    assert(corpus.filter(abs(col("r")) > 1.0001).count() == 0)
    assert(corpus.filter(!col("lag_k").isin(1, 2, 3)).count() == 0)
    assert(corpus.filter(col("n") < 10).count() == 0)
  }

  test("streaks: planted islands counted exactly; duplicate same-day events collapse") {
    import spark.implicits._
    def t(day: Int, hour: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")
    // user 1: days 1,2,3 then 5,6 → streaks 3 and 2 (two events on day 2
    // must not double-count); user 2: isolated days 1, 3, 5 → three 1-streaks
    val events = Seq(
      (1L, t(1, 9)), (1L, t(2, 9)), (1L, t(2, 18)), (1L, t(3, 9)),
      (1L, t(5, 9)), (1L, t(6, 9)),
      (2L, t(1, 9)), (2L, t(3, 9)), (2L, t(5, 9))
    ).toDF("user_id", "ts")
    val got = ops.Advanced.streaks(events, "user_id", "ts")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((5L, 3L, 2L)), s"user 1 wrong: ${got(1L)}")
    assert(got(2L) == ((3L, 1L, 3L)), s"user 2 wrong: ${got(2L)}")
    // corpus run: longest_streak <= n_active_days, n_streaks >= 1
    val corpus = ops.Advanced.streaks(spark, sfDir).cache()
    assert(corpus.filter(col("longest_streak") > col("n_active_days")).count() == 0)
    assert(corpus.filter(col("n_streaks") < 1).count() == 0)
  }

  test("rollingDistinct: planted trailing-7 counts; agrees with brute force") {
    import spark.implicits._
    def t(day: Int) = new java.sql.Timestamp(day.toLong * 86400000L)
    // u1 active days 0,1,8 (two events day 1 must not double-count);
    // u2 active day 1 only. Trailing-7 window ending each day:
    // day 0 → {u1}; days 1..7 → {u1,u2}; day 8 → {u1}
    val events = Seq(
      (1L, t(0)), (1L, t(1)), (1L, t(1)), (1L, t(8)), (2L, t(1))
    ).toDF("user_id", "ts")
    val got = ops.Advanced.rollingDistinct(events, "user_id", "ts", 7)
      .collect().map(r => r.getDate(0).toLocalDate.toEpochDay -> r.getLong(1)).toMap
    val want = (Map(0L -> 1L, 8L -> 1L) ++ (1L to 7L).map(_ -> 2L)).toMap
    assert(got == want, s"planted counts wrong: $got")
    // law: equals brute-force distinct-count-per-window on an irregular set
    val pairs = for (u <- 0L until 10L; k <- 0 until 6)
      yield (u, ((u * 7 + k * 3) % 20).toInt)
    val ev2 = pairs.map { case (u, d) => (u, t(d)) }.toDF("user_id", "ts")
    val got2 = ops.Advanced.rollingDistinct(ev2, "user_id", "ts", 7)
      .collect().map(r => r.getDate(0).toLocalDate.toEpochDay -> r.getLong(1)).toMap
    val maxD = pairs.map(_._2).max
    val brute = (0 to maxD).map { e =>
      e.toLong -> pairs.filter { case (_, d) => d <= e && d > e - 7 }
        .map(_._1).distinct.size.toLong
    }.filter(_._2 > 0L).toMap
    assert(got2 == brute, s"brute-force mismatch: got $got2 want $brute")
  }

  test("cusum: planted level shift detected on the last pre-shift day") {
    import spark.implicits._
    def t(day: Int) = new java.sql.Timestamp(day.toLong * 86400000L)
    // "a": 10.0 on days 0–4, 20.0 on days 5–9 → mean 15, cumulative
    // deviation bottoms out at −25000 milli on day 4 (the last day of
    // the old regime — the offline CUSUM change-point estimator)
    val a = (0 to 4).map(d => ("a", t(d), 10.0)) ++
      (5 to 9).map(d => ("a", t(d), 20.0))
    // "b": symmetric two-day series — |cusum| ties at day 0 only
    // (day 1 closes at zero); argmax must pick day 0
    val b = Seq(("b", t(0), 10.0), ("b", t(1), 20.0))
    val events = (a ++ b).toDF("event_type", "ts", "value")
    val got = ops.Advanced.cusum(events, "event_type", "ts", "value")
      .collect().map(r => r.getString(0) ->
        ((r.getDate(1).toLocalDate.toEpochDay, r.getLong(2), r.getLong(3),
          r.getLong(4)))).toMap
    assert(got("a") == ((4L, -25000L, 15000L, 10L)), s"a wrong: ${got("a")}")
    assert(got("b") == ((0L, -5000L, 15000L, 2L)), s"b wrong: ${got("b")}")
    // corpus run: one row per type, n_days positive
    val corpus = ops.Advanced.cusum(spark, sfDir).cache()
    assert(corpus.select("event_type").distinct.count() == corpus.count())
    assert(corpus.filter(col("n_days") < 1).count() == 0)
  }

  test("rfm: extreme users land on extreme scores; segment sizes partition users") {
    import spark.implicits._
    def t(day: Int) = new java.sql.Timestamp(day.toLong * 86400000L)
    // user i (0..9): active only on day i (rec = 9−i), i+1 events,
    // value i+1 each → strictly increasing freq and monetary with i,
    // strictly improving recency with i
    val events = (for (i <- 0 until 10; _ <- 0 to i)
      yield (i.toLong, t(i), (i + 1).toDouble)).toDF("user_id", "ts", "value")
    val seg = ops.Advanced.rfm(events, "user_id", "ts", "value").collect()
    assert(seg.map(_.getAs[Long]("n_users")).sum == 10L, "segments must partition users")
    // all three metrics rank users identically, so the grid collapses
    // to the diagonal with exactly 2 users per quintile: users 8,9 →
    // (5,5,5), users 0,1 → (1,1,1)
    val cells = seg.map(r => ((r.getAs[Int]("r_score"), r.getAs[Int]("f_score"),
      r.getAs[Int]("m_score")), r.getAs[Long]("n_users"))).toMap
    assert(cells == (1 to 5).map(s => (s, s, s) -> 2L).toMap, s"grid: $cells")
    assert(cells.keys.forall { case (r, f, m) =>
      Seq(r, f, m).forall(s => s >= 1 && s <= 5) }, s"scores out of range: $cells")
    // corpus run: grid bounded, all scores in range, users conserved
    val corpus = ops.Advanced.rfm(spark, sfDir).cache()
    assert(corpus.count() <= 125)
    val nUsers = Tables.events(spark, sfDir).select("user_id").distinct.count()
    assert(corpus.agg(sum("n_users")).head.getLong(0) == nUsers)
  }

  test("seasonality: planted weekday mix with integer shares and unique peak") {
    import spark.implicits._
    // 1970-01-05 is a Monday (isodow 1). Type "a": 3 Mondays, 1 Tuesday;
    // shares 7500/2500 bp; peak Monday. Type "b": 2 Mon, 2 Tue — tie →
    // peak is the EARLIEST tied day (Monday), exactly one peak row.
    def t(day: Int) = new java.sql.Timestamp((4 + day).toLong * 86400000L)
    val events = (Seq(t(0), t(0), t(0), t(1)).map(("a", _)) ++
      Seq(t(0), t(7), t(1), t(8)).map(("b", _))).toDF("event_type", "ts")
    val got = ops.Advanced.seasonality(events, "event_type", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(("a", 1L)) == ((3L, 7500L, true)), s"a-mon: $got")
    assert(got(("a", 2L)) == ((1L, 2500L, false)), s"a-tue: $got")
    assert(got(("b", 1L)) == ((2L, 5000L, true)), s"b-mon: $got")
    assert(got(("b", 2L)) == ((2L, 5000L, false)), s"tie must peak earliest: $got")
    // corpus run: shares sum to ≤10000 per type (floor division), one
    // peak per type, isodow in 1..7
    val corpus = ops.Advanced.seasonality(spark, sfDir).cache()
    assert(corpus.filter(col("isodow") < 1 || col("isodow") > 7).count() == 0)
    val sums = corpus.groupBy("event_type")
      .agg(sum("share_bp").as("s"), sum(when(col("is_peak"), 1L).otherwise(0L)).as("p"))
    assert(sums.filter(col("s") > 10000 || col("s") < 9993).count() == 0)
    assert(sums.filter(col("p") =!= 1L).count() == 0)
  }

  test("cohortMatrix: planted cohorts retain exactly; offset-0 share is always 10000 bp") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // weeks (Mondays): W0=2024-01-01, W1=01-08, W2=01-15, W3=01-22
    val events = Seq(
      (1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-03 11:00:00")), // u1 W0 ×2
      (1L, t("2024-01-16 09:00:00")),                                 // u1 W2
      (2L, t("2024-01-02 08:00:00")),                                 // u2 W0
      (3L, t("2024-01-15 12:00:00")), (3L, t("2024-01-22 12:00:00"))  // u3 W2,W3
    ).toDF("user_id", "ts")
    val got = ops.Advanced.cohortMatrix(events, "user_id", "ts").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      ("2024-01-01", 0L) -> ((2L, 2L, 10000L)),
      ("2024-01-01", 2L) -> ((1L, 2L, 5000L)),
      ("2024-01-15", 0L) -> ((1L, 1L, 10000L)),
      ("2024-01-15", 1L) -> ((1L, 1L, 10000L))), s"matrix wrong: $got")
    // corpus invariants: offset 0 exists per cohort at 10000 bp; counts
    // never exceed the cohort size; offsets non-negative
    val corpus = ops.Advanced.cohortMatrix(spark, sfDir).cache()
    assert(corpus.filter(col("week_offset") === 0)
      .filter(col("retention_bp") =!= 10000L || col("n_users") =!= col("cohort_size"))
      .count() == 0)
    assert(corpus.filter(col("n_users") > col("cohort_size")).count() == 0)
    assert(corpus.filter(col("week_offset") < 0).count() == 0)
  }

  test("purchaseGaps: planted cadence yields exact median/mean/max gaps") {
    import spark.implicits._
    def d(day: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2021, 1, 1).plusDays(day))
    // cust 1: orders on days 0,10,30 → gaps 10, 20; cust 2: one order
    val orders = Seq(
      (1L, d(0), 100L), (1L, d(10), 101L), (1L, d(30), 102L),
      (2L, d(5), 200L)).toDF("o_custkey", "o_orderdate", "o_orderkey")
    val cust = Seq((1L, "SEG"), (2L, "SEG"))
      .toDF("c_custkey", "c_mktsegment")
    val r = ops.Advanced.purchaseGaps(orders, cust).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_customers") == 2L &&
      row.getAs[Long]("n_repeat_customers") == 1L &&
      row.getAs[Long]("n_gaps") == 2L)
    assert(row.getAs[Double]("median_gap_days") == 15.0) // midpoint of 10, 20
    assert(row.getAs[Double]("avg_gap_days") == 15.0)
    assert(row.getAs[Long]("max_gap_days") == 20L)
    // corpus: repeat customers bounded by customers, gaps positive
    val c = ops.Advanced.purchaseGaps(spark, sfDir).collect()
    assert(c.length == 5)
    c.foreach { s =>
      assert(s.getAs[Long]("n_repeat_customers") <= s.getAs[Long]("n_customers"))
      assert(s.getAs[Double]("median_gap_days") >= 0.0 &&
        s.getAs[Double]("median_gap_days") <= s.getAs[Long]("max_gap_days"))
    }
  }

  test("attribution: planted journey splits exact ppm; totals close to the unit") {
    import spark.implicits._
    def ts(h: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2020, 6, 1).atStartOfDay.plusHours(h))
    // user 1: view, click, view → purchase (3 touches, n=3:
    // each ⌊1e6/3⌋=333333, remainder 1 → first view 333334);
    // user 2: purchase with no prior touch → attributes nothing
    val ev = Seq(
      (1L, "view", ts(0), 10L), (1L, "click", ts(1), 11L),
      (1L, "view", ts(2), 12L), (1L, "purchase", ts(3), 13L),
      (2L, "purchase", ts(5), 20L))
      .toDF("u", "et", "at", "id")
    val got = ops.Advanced.attribution(ev, "u", "et", "at", "id").collect()
    val by = got.map(r => r.getAs[String]("touch_type") -> r).toMap
    assert(by("view").getAs[Long]("n_touches") == 2L &&
      by("view").getAs[Long]("first_touch") == 1L &&
      by("view").getAs[Long]("last_touch") == 1L &&
      by("view").getAs[Long]("linear_ppm") == 333334L + 333333L)
    assert(by("click").getAs[Long]("n_touches") == 1L &&
      by("click").getAs[Long]("first_touch") == 0L &&
      by("click").getAs[Long]("last_touch") == 0L &&
      by("click").getAs[Long]("linear_ppm") == 333333L)
    // corpus invariants: the remainder policy makes linear credit close
    // EXACTLY — 1e6 per touched purchase, no dust
    val c = ops.Advanced.attribution(spark, sfDir).collect()
    val firsts = c.map(_.getAs[Long]("first_touch")).sum
    val lasts = c.map(_.getAs[Long]("last_touch")).sum
    val ppm = c.map(_.getAs[Long]("linear_ppm")).sum
    assert(firsts == lasts && firsts > 0)
    assert(ppm == 1000000L * firsts, s"linear credit leaked: $ppm vs $firsts")
  }

  test("crossCorr: a one-day-shifted copy correlates perfectly at lag 1") {
    import spark.implicits._
    def ts(day: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2020, 3, 1).plusDays(day).atStartOfDay())
    // type a: day i carries i+1 events (i=0..19); type b is a's series
    // delayed one day — "a leads b by one day"
    val rows = (0 until 20).flatMap { i =>
      Seq.fill(i + 1)(("a", ts(i))) ++ Seq.fill(i + 1)(("b", ts(i + 1)))
    }
    val got = ops.Advanced.crossCorr(rows.toDF("t", "at"), "t", "at")
      .collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b"),
        r.getAs[Int]("lag_k")) -> r.getAs[Double]("r")).toMap
    assert(got(("a", "b", 1)) == 1.0, s"lead not detected: $got")
    assert(got(("b", "a", -1)) == 1.0)
    // at wrong-direction lags the ramp still correlates, but less
    assert(got(("a", "b", -1)) < 1.0)
    // corpus: bounded grid of pairs × lags, r within [-1, 1]
    val corpus = ops.Advanced.crossCorr(spark, sfDir).collect()
    assert(corpus.nonEmpty && corpus.length <= 5 * 4 * 7)
    corpus.foreach { r =>
      val v = r.getAs[Double]("r")
      assert(v >= -1.0 && v <= 1.0)
      assert(r.getAs[String]("type_a") != r.getAs[String]("type_b"))
    }
  }

  test("bootstrapMean: constant data collapses the band; band brackets the mean and is reproducible") {
    import spark.implicits._
    // constant values: every replicate mean equals the value, so the
    // band is degenerate at it — the bootstrap's fixed point
    val const = (1L to 200L).map(i => ("a", i, 500L))
      .toDF("g", "id", "v")
    val c = ops.Sampling.bootstrapMean(const, "g", "id", "v").collect()(0)
    assert(c.getAs[Double]("mean_val") == 5.0)
    assert(c.getAs[Double]("boot_lo") == 5.0)
    assert(c.getAs[Double]("boot_hi") == 5.0)
    // corpus: lo ≤ mean ≤ hi per segment, band strictly positive
    // width on real variance, and the whole report is deterministic
    val one = ops.Sampling.bootstrapMean(spark, sfDir).collect()
    val two = ops.Sampling.bootstrapMean(spark, sfDir).collect()
    assert(one.toSeq == two.toSeq, "hash bootstrap must be reproducible")
    assert(one.length == 5)
    one.foreach { r =>
      assert(r.getAs[Double]("boot_lo") <= r.getAs[Double]("mean_val") + 1.0)
      assert(r.getAs[Double]("boot_hi") >= r.getAs[Double]("mean_val") - 1.0)
      assert(r.getAs[Double]("boot_lo") < r.getAs[Double]("boot_hi"))
    }
  }
}
