package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DiagnosticsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("skewProfile: planted counts exact; ranking never plans a window") {
    import spark.implicits._
    // key 7 x5, key 3 x3, key 9 x1 — n_rows 9, n_keys 3, uniform mean 3
    val planted = (Seq.fill(5)(7L) ++ Seq.fill(3)(3L) ++ Seq(9L))
      .toDF("k")
    val got = ops.Diagnostics.skewProfile(planted, "k", topN = 2).collect()
    assert(got.length == 2)
    val r1 = got(0)
    assert(r1.getAs[Int]("rank") == 1 && r1.getAs[Long]("key") == 7L &&
      r1.getAs[Long]("cnt") == 5L && r1.getAs[Long]("n_rows") == 9L &&
      r1.getAs[Long]("n_keys") == 3L && r1.getAs[Long]("max_cnt") == 5L)
    assert(r1.getAs[Double]("skew") == math.rint(5.0 * 3 / 9 * 1e4) / 1e4)
    val r2 = got(1)
    assert(r2.getAs[Long]("key") == 3L && r2.getAs[Long]("cnt") == 3L)
    // tie-break: equal counts rank by ascending key
    val ties = Seq(5L, 5L, 2L, 2L, 8L, 8L).toDF("k")
    val t = ops.Diagnostics.skewProfile(ties, "k", topN = 3).collect()
    assert(t.map(_.getAs[Long]("key")).toSeq == Seq(2L, 5L, 8L))
    // plan contract: the top-k must ride the bounded partial aggregate,
    // not a window (a window funnels all distinct keys to one task)
    val plan = ops.Diagnostics.skewProfile(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("Window"), s"window crept into the profile:\n$plan")
    // corpus run: ranks contiguous, counts non-increasing
    val corpus = ops.Diagnostics.skewProfile(spark, sfDir).collect()
    assert(corpus.nonEmpty && corpus.length <= 10)
    assert(corpus.map(_.getAs[Int]("rank")).toSeq == (1 to corpus.length))
    val cnts = corpus.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    assert(corpus.forall(_.getAs[Long]("max_cnt") == cnts.head))
  }

  test("skewProfile: empty input yields an empty profile, not a crash") {
    import spark.implicits._
    val empty = Seq.empty[Long].toDF("k")
    assert(ops.Diagnostics.skewProfile(empty, "k", topN = 5).count() == 0)
  }

  test("tableProfile: planted nulls/dupes/bounds exact; one scan, no join, no window") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some(2.5), "a"),
      (Some(1L), None, "b"),
      (Some(3L), Some(7.25), "a"),
      (None, Some(2.5), "c")
    ).toDF("id", "v", "tag")
    val got = ops.Diagnostics.tableProfile(df, Seq("id", "v", "tag"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(got("id") == ((1L, 2L, "1", "3")), s"id profile: ${got("id")}")
    assert(got("v") == ((1L, 2L, "2.50", "7.25")), s"v profile: ${got("v")}")
    assert(got("tag") == ((0L, 3L, "a", "c")), s"tag profile: ${got("tag")}")
    // plan: one column-pruned scan per profiled column, no join, no
    // window, and NO Expand — the fused multi-distinct's Expand
    // multiplies every row by k+1 and is 6.6× slower at sf0.1
    val plan = ops.Diagnostics.tableProfile(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("Window") && !plan.contains("Join"),
      s"profile must stay aggregate-only:\n$plan")
    assert("Scan parquet [^\n]*\\(\\d".r.findAllIn(plan).size == 5,
      s"profile must scan once per column (pruned):\n$plan")
    assert(!plan.contains("Expand"),
      s"profile regressed to the row-multiplying Expand shape:\n$plan")
  }

  test("constraintCheck: planted violations exact; NULL keys are not FK orphans") {
    import spark.implicits._
    // row-local battery: 2 range violations + 1 duplicate key in one pass
    val t = Seq((1L, 10.0), (1L, -5.0), (2L, 0.0)).toDF("k", "v")
    val local = ops.Diagnostics.rowLocalChecks(t, "t",
        Seq("v positive" -> (col("v") <= 0)), uniqueKey = Some("k"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(local("t.v positive") == ((3L, 2L)), s"range: $local")
    assert(local("t.k unique") == ((3L, 1L)), s"unique: $local")
    // FK: 5 is an orphan; the NULL child key is NOT (explicit not-null
    // checks own nullability) — mirrors the oracle's IS NOT NULL guard
    val child = Seq(Some(1L), Some(5L), None).toDF("ck")
    val parent = Seq(1L, 2L).toDF("pk")
    val fk = ops.Diagnostics.fkCheck(child, "ck", parent, "pk", "fk").collect()
    assert(fk.length == 1 && fk(0).getLong(1) == 3L && fk(0).getLong(2) == 1L,
      s"fk: ${fk.toSeq}")
    // corpus contract: the synthetic tables are clean — every check ok
    val rep = ops.Diagnostics.constraintCheck(spark, sfDir).collect()
    assert(rep.length == 11, s"expected 11 constraints, got ${rep.length}")
    assert(rep.forall(_.getAs[Boolean]("ok")),
      s"clean corpus failed: ${rep.filterNot(_.getAs[Boolean]("ok")).toSeq}")
    // plan: never a window; referential integrity plans as anti joins
    val plan = ops.Diagnostics.constraintCheck(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("Window"), s"window crept into the report:\n$plan")
    assert(plan.contains("LeftAnti"), s"FK lost its anti-join shape:\n$plan")
  }

  test("benford: planted uniform digits deviate by the known amounts; sub-1 amounts drop") {
    import spark.implicits._
    // digits 1..9 once each (+ one 0.5 that must be excluded): observed
    // frequency 1/9 → obs_micro 111111 for every digit
    val amounts = (1 to 9).map(d => d + 0.25) :+ 0.5
    val got = ops.Diagnostics.benford(amounts.toDF("amt"), "amt").collect()
    assert(got.length == 9)
    assert(got.forall(_.getAs[Long]("total") == 9L))
    assert(got.forall(_.getAs[Long]("obs_micro") == 111111L))
    // a digit that never occurs still appears, with the full expected
    // shortfall — an absent digit is the loudest Benford violation
    val sparse = ops.Diagnostics.benford(Seq(1.5, 2.5).toDF("amt"), "amt")
      .collect()
    assert(sparse.length == 9)
    val s9 = sparse.find(_.getAs[Int]("digit") == 9).get
    assert(s9.getAs[Long]("observed") == 0L)
    assert(s9.getAs[Long]("dev_micro") ==
      -ops.Diagnostics.BenfordMicro.toMap.apply(9))
    val d1 = got.find(_.getAs[Int]("digit") == 1).get
    assert(d1.getAs[Long]("exp_micro") == 301030L)
    assert(d1.getAs[Long]("dev_micro") == 111111L - 301030L)
    // max |dev| is digit 1's shortfall (Benford is most top-heavy at 1)
    assert(got.forall(_.getAs[Long]("max_abs_dev_micro") == 301030L - 111111L))
    // expected frequencies are a fixed partition of one (±rounding)
    assert(math.abs(ops.Diagnostics.BenfordMicro.map(_._2).sum - 1000000L) <= 2L)
    // corpus: all nine digits present, one shared audit number
    val corpus = ops.Diagnostics.benford(spark, sfDir).cache()
    assert(corpus.count() == 9)
    assert(corpus.select("max_abs_dev_micro").distinct.count() == 1)
  }

  test("linReg: exact line recovers slope/intercept/r2=1; noisy group hand-checked") {
    import spark.implicits._
    val planted = Seq(
      ("exact", 1L, 2L), ("exact", 2L, 4L), ("exact", 3L, 6L),
      ("noisy", 1L, 1L), ("noisy", 2L, 3L), ("noisy", 3L, 2L))
      .toDF("g", "x", "y")
    val got = ops.Diagnostics.linReg(planted, "g", "x", "y").collect()
    val exact = got.find(_.getAs[String]("segment") == "exact").get
    assert(exact.getAs[Long]("n_orders") == 3L)
    assert(exact.getAs[Double]("slope") == 2.0)
    assert(exact.getAs[Double]("intercept") == 0.0)
    assert(exact.getAs[Double]("r2") == 1.0)
    // noisy: n=3 Sx=6 Sy=6 Sxx=14 Sxy=13 Syy=14 → num=3 den=6 → 0.5, 1.0, 0.25
    val noisy = got.find(_.getAs[String]("segment") == "noisy").get
    assert(noisy.getAs[Double]("slope") == 0.5)
    assert(noisy.getAs[Double]("intercept") == 1.0)
    assert(noisy.getAs[Double]("r2") == 0.25)
    // degenerate x (zero variance) → NULL stats, never a divide blowup
    val flat = ops.Diagnostics.linReg(
      Seq(("f", 2L, 5L), ("f", 2L, 7L)).toDF("g", "x", "y"), "g", "x", "y")
      .collect().head
    assert(flat.isNullAt(flat.fieldIndex("slope")))
    assert(flat.isNullAt(flat.fieldIndex("r2")))
    // corpus: one row per market segment, r2 in [0,1]
    val corpus = ops.Diagnostics.linReg(spark, sfDir).collect()
    assert(corpus.length == 5)
    corpus.foreach { r =>
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
  }

  test("sprt: planted paths cross the exact Wald boundaries") {
    import spark.implicits._
    def d(day: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 3, 1).plusDays(day))
    // 2 hits/day: +575364/day → first ≥ 2944439 at day index 5 (6th day)
    val h1 = (0 until 8).flatMap(i => Seq((d(i), true), (d(i), true)))
      .toDF("day", "hit")
    val rh = ops.Diagnostics.sprt(h1, "day", "hit").collect()
    assert(rh.forall(_.getAs[String]("decision") == "accept_h1"))
    assert(rh.forall(_.getAs[java.sql.Date]("decision_day") == d(5)))
    assert(rh.map(r => r.getAs[java.sql.Date]("day") -> r.getAs[String]("state"))
      .toMap.apply(d(4)) == "continue")
    assert(rh.find(_.getAs[java.sql.Date]("day") == d(5)).get
      .getAs[Long]("llr_cum_micro") == 6L * 575364L)
    // 10 misses/day: −606250/day → first ≤ −2944439 at day index 4
    val h0 = (0 until 6).flatMap(i => (1 to 10).map(_ => (d(i), false)))
      .toDF("day", "hit")
    val r0 = ops.Diagnostics.sprt(h0, "day", "hit").collect()
    assert(r0.forall(_.getAs[String]("decision") == "accept_h0"))
    assert(r0.forall(_.getAs[java.sql.Date]("decision_day") == d(4)))
    // 1 hit + 4 misses/day: +45182/day → never crosses in 30 days
    val mid = (0 until 30).flatMap(i =>
      (d(i), true) +: (1 to 4).map(_ => (d(i), false))).toDF("day", "hit")
    val rm = ops.Diagnostics.sprt(mid, "day", "hit").collect()
    assert(rm.forall(_.getAs[String]("decision") == "continue"))
    assert(rm.forall(_.isNullAt(rm.head.fieldIndex("decision_day"))))
    assert(rm.last.getAs[Long]("llr_cum_micro") == 30L * 45182L)
  }

  test("logRank: symmetric cohorts score exactly zero") {
    import spark.implicits._
    def d(day: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2020, 1, 1).plusDays(day).atStartOfDay())
    // both groups carry the identical lifetime multiset → at every
    // event time na = nb and da = db, so O−E = 0 term by term
    val ev = Seq(
      ("A1", "A", d(0)), ("A1", "A", d(10)),
      ("A2", "A", d(0)), ("A2", "A", d(100)),
      ("A3", "A", d(100)), ("A3", "A", d(200)),
      ("B1", "B", d(0)), ("B1", "B", d(10)),
      ("B2", "B", d(0)), ("B2", "B", d(100)),
      ("B3", "B", d(100)), ("B3", "B", d(200)))
      .toDF("k", "grp", "dt")
    val got = ops.Diagnostics.logRank(ev, "k", "dt", "grp", 90).collect()
    assert(got.length == 2)
    got.foreach { r =>
      assert(r.getAs[Long]("n_subj") == 3L)
      assert(r.getAs[Long]("o_events") == 2L)
      assert(r.getAs[Long]("e_micro") == 2000000L)
      assert(r.getAs[Double]("z") == 0.0)
      assert(r.getAs[Double]("chi2") == 0.0)
    }
  }

  test("logRank: hand-traced asymmetric cohorts match the exact micro terms") {
    import spark.implicits._
    def d(day: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2020, 1, 1).plusDays(day).atStartOfDay())
    // A: events at t=10,20; B: event at t=30, one censored (t=200)
    // t=10: d=1 na=2 nb=2 → E_A=500000, V=250000
    // t=20: d=1 na=1 nb=2 → E_A=333333, V=222222
    // t=30: d=1 na=0 nb=2 → E_A=0,      V=0
    val ev = Seq(
      ("A1", "A", d(0)), ("A1", "A", d(10)),
      ("A2", "A", d(0)), ("A2", "A", d(20)),
      ("B1", "B", d(0)), ("B1", "B", d(30)),
      ("B2", "B", d(0)), ("B2", "B", d(200)))
      .toDF("k", "grp", "dt")
    val got = ops.Diagnostics.logRank(ev, "k", "dt", "grp", 90)
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    val a = got("A")
    assert(a.getAs[Long]("o_events") == 2L)
    assert(a.getAs[Long]("e_micro") == 833333L)
    assert(a.getAs[Long]("v_micro") == 472222L)
    val b = got("B")
    assert(b.getAs[Long]("o_events") == 1L)
    assert(b.getAs[Long]("e_micro") == 2166667L)
    val z = (2e6 - 833333.0) / (math.sqrt(472222.0) * 1e3)
    assert(a.getAs[Double]("z") == math.rint(z * 1e4) / 1e4)
    assert(a.getAs[Double]("chi2") == math.rint(z * z * 1e4) / 1e4)
    // corpus laws: expectations close to the pooled event mass exactly,
    // and both rows share one statistic
    val c = ops.Diagnostics.logRank(spark, sfDir).collect()
    assert(c.length == 2)
    val totEv = c.map(_.getAs[Long]("o_events")).sum
    assert(c.map(_.getAs[Long]("e_micro")).sum == totEv * 1000000L)
    assert(c.map(_.getAs[Double]("z")).distinct.length == 1)
  }

  test("kaplanMeier: planted cohort traces the exact product-limit curve") {
    import spark.implicits._
    def d(day: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2020, 1, 1).plusDays(day).atStartOfDay())
    // A,B: t=10 events; C: t=100 event; D: t=100 censored (active at end)
    val ev = Seq(
      ("A", d(0)), ("A", d(10)), ("B", d(0)), ("B", d(10)),
      ("C", d(0)), ("C", d(100)), ("D", d(100)), ("D", d(200)))
      .toDF("k", "dt")
    val got = ops.Diagnostics.kaplanMeier(ev, "k", "dt", censorDays = 90)
      .collect()
    assert(got.length == 2)
    val r10 = got(0)
    assert(r10.getAs[Long]("t_days") == 10L && r10.getAs[Long]("n_risk") == 4L &&
      r10.getAs[Long]("n_event") == 2L && r10.getAs[Long]("surv_micro") == 500000L)
    val r100 = got(1)
    assert(r100.getAs[Long]("t_days") == 100L && r100.getAs[Long]("n_risk") == 2L &&
      r100.getAs[Long]("n_event") == 1L && r100.getAs[Long]("surv_micro") == 250000L)
    // corpus: curve is monotone non-increasing, risk sets shrink with t
    val c = ops.Diagnostics.kaplanMeier(spark, sfDir).collect()
    assert(c.nonEmpty)
    val sv = c.map(_.getAs[Long]("surv_micro"))
    assert(sv.zip(sv.tail).forall { case (a, b) => a >= b })
    val nr = c.map(_.getAs[Long]("n_risk"))
    assert(nr.zip(nr.tail).forall { case (a, b) => a >= b })
    assert(sv.forall(s => s >= 0 && s <= 1000000L))
  }

  test("nelsonAalen: planted cohort steps exactly; grid agrees with KM") {
    import spark.implicits._
    def d(day: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2020, 1, 1).plusDays(day).atStartOfDay())
    val ev = Seq(
      ("A", d(0)), ("A", d(10)), ("B", d(0)), ("B", d(10)),
      ("C", d(0)), ("C", d(100)), ("D", d(100)), ("D", d(200)))
      .toDF("k", "dt")
    val got = ops.Diagnostics.nelsonAalen(ev, "k", "dt", censorDays = 90)
      .collect()
      .map(r => (r.getAs[Long]("t_days"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("n_event"), r.getAs[Long]("hazard_step_micro"),
        r.getAs[Long]("cum_hazard_micro")))
    // t=10: 2/4 → 500000; t=100: 1/2 → +500000 = 1000000
    assert(got.toSeq == Seq((10L, 4L, 2L, 500000L, 500000L),
      (100L, 2L, 1L, 500000L, 1000000L)))
    // corpus: same risk grid as Kaplan–Meier, hazard strictly accumulates
    val na = ops.Diagnostics.nelsonAalen(spark, sfDir).collect()
    val km = ops.Diagnostics.kaplanMeier(spark, sfDir).collect()
    assert(na.map(r => (r.getAs[Long]("t_days"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("n_event"))).toSeq ==
      km.map(r => (r.getAs[Long]("t_days"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("n_event"))).toSeq)
    val cum = na.map(_.getAs[Long]("cum_hazard_micro"))
    assert(cum.zip(cum.tail).forall { case (a, b) => a < b })
    assert(na.map(_.getAs[Long]("hazard_step_micro")).sum == cum.last)
  }

  test("welchTTest: planted two-sample t and Welch df match hand computation") {
    import spark.implicits._
    // A: 1,2,3 (milli 1000,2000,3000); B: 2,4 → t=-0.8660, df=1.68
    val planted = (Seq(1000L, 2000L, 3000L).map(("a", _)) ++
      Seq(2000L, 4000L).map(("b", _))).toDF("t", "vm")
    val got = ops.Diagnostics.welchTTest(planted, "t", "vm").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[String]("type_a") == "a" && r.getAs[String]("type_b") == "b")
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("mean_a") == 2.0 && r.getAs[Double]("mean_b") == 3.0)
    assert(r.getAs[Double]("t_stat") == -0.866)
    assert(r.getAs[Double]("df") == 1.68)
    // zero-variance pair → NULL t/df in BOTH engines (Spark's double
    // division would otherwise emit Infinity where DuckDB NULLs)
    val const = (Seq.fill(3)(("x", 5000L)) ++ Seq.fill(2)(("y", 5000L)))
      .toDF("t", "vm")
    val cr = ops.Diagnostics.welchTTest(const, "t", "vm").collect().head
    assert(cr.isNullAt(cr.fieldIndex("t_stat")) && cr.isNullAt(cr.fieldIndex("df")))
    // a 1-row group has no sample variance and is excluded
    val single = Seq(("x", 1000L), ("x", 2000L), ("y", 500L)).toDF("t", "vm")
    assert(ops.Diagnostics.welchTTest(single, "t", "vm").count() == 0)
    // corpus: all 5-choose-2 event-type pairs, df <= n_a+n_b-2,
    // pair columns in strict order
    val corpus = ops.Diagnostics.welchTTest(spark, sfDir).collect()
    assert(corpus.length == 10)
    corpus.foreach { p =>
      assert(p.getAs[String]("type_a") < p.getAs[String]("type_b"))
      assert(p.getAs[Double]("df") <=
        (p.getAs[Long]("n_a") + p.getAs[Long]("n_b") - 2).toDouble)
    }
  }

  test("theilSen: planted slopes median exactly; outlier cannot move it") {
    import spark.implicits._
    // slopes (1,2)=10e6, (1,3)=12.5e6, (2,3)=15e6 → median 12.5e6
    val a = Seq(("A", 1L, 10L), ("A", 2L, 20L), ("A", 3L, 35L))
    val got = ops.Diagnostics.theilSen(a.toDF("g", "x", "y"), "g", "x", "y")
      .collect().head
    assert(got.getAs[Long]("n_pairs") == 3L)
    assert(got.getAs[Long]("slope_micro2") == 25000000L)
    assert(got.getAs[Double]("slope_cents_per_month") == 12.5)
    // robust: a perfect 10/month line + one wild final point — six of
    // ten pairwise slopes are exactly 10e6, so the median stays put
    val b = Seq(10L, 20L, 30L, 40L, 1000L).zipWithIndex
      .map { case (y, i) => ("B", (i + 1).toLong, y) }
    val gotB = ops.Diagnostics.theilSen(b.toDF("g", "x", "y"), "g", "x", "y")
      .collect().head
    assert(gotB.getAs[Long]("n_pairs") == 10L)
    assert(gotB.getAs[Double]("slope_cents_per_month") == 10.0)
  }

  test("theilSen: negative slope truncates toward zero, not floor") {
    import spark.implicits._
    // (1e6 * -7) DIV 3 = -2333333 under truncation; floor would give
    // -2333334 — the exact cross-engine division contract
    val rows = ops.Diagnostics.theilSen(
      Seq(("A", 1L, 0L), ("A", 4L, -7L)).toDF("g", "x", "y"), "g", "x", "y")
      .collect()
    assert(rows.head.getAs[Long]("slope_micro2") == 2L * -2333333L)
  }

  test("q_theil_sen: one row per segment, slope column closes over med2") {
    val rows = ops.Diagnostics.theilSen(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_months")
      assert(r.getAs[Long]("n_pairs") == n * (n - 1) / 2)
      assert(r.getAs[Double]("slope_cents_per_month") ==
        math.rint(r.getAs[Long]("slope_micro2").toDouble / 2e6 * 1e4) / 1e4)
    }
  }

  test("partialCorr: planted triples match the exact shared expression tree") {
    import spark.implicits._
    val pts = Seq((1L, 5L, 1L), (2L, 3L, 2L), (3L, 8L, 3L),
      (4L, 6L, 4L), (6L, 10L, 5L))
    val got = ops.Diagnostics.partialCorr(
      pts.map { case (x, y, z) => ("A", x, y, z) }.toDF("g", "x", "y", "z"),
      "g", "x", "y", "z").collect().head
    // independent driver replication of the identical double tail
    val n = pts.length.toDouble
    def s(f: ((Long, Long, Long)) => Long) = pts.map(f).sum.toDouble
    val (sx, sy, sz) = (s(_._1), s(_._2), s(_._3))
    val vx = n * s(t => t._1 * t._1) - sx * sx
    val vy = n * s(t => t._2 * t._2) - sy * sy
    val vz = n * s(t => t._3 * t._3) - sz * sz
    val rxy = (n * s(t => t._1 * t._2) - sx * sy) / math.sqrt(vx * vy)
    val rxz = (n * s(t => t._1 * t._3) - sx * sz) / math.sqrt(vx * vz)
    val ryz = (n * s(t => t._2 * t._3) - sy * sz) / math.sqrt(vy * vz)
    def r6(v: Double) = math.rint(v * 1e6) / 1e6
    assert(got.getAs[Double]("r_xy") == r6(rxy))
    assert(got.getAs[Double]("partial_r") ==
      r6((rxy - rxz * ryz) /
        math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))))
  }

  test("partialCorr: perfect confounding and degenerate margins yield NULL") {
    import spark.implicits._
    // x and y are exact multiples of z: every r is 1, the partial is
    // 0/0 — must be NULL, not NaN or Infinity
    val conf = (1L to 4L).map(z => ("A", 2 * z, 3 * z, z))
    val g1 = ops.Diagnostics.partialCorr(conf.toDF("g", "x", "y", "z"),
      "g", "x", "y", "z").collect().head
    assert(!g1.isNullAt(g1.fieldIndex("r_xy")) &&
      g1.getAs[Double]("r_xy") == 1.0)
    assert(g1.isNullAt(g1.fieldIndex("partial_r")))
    // constant z: control variance is zero → everything NULL
    val flat = Seq(("B", 1L, 2L, 7L), ("B", 3L, 5L, 7L), ("B", 4L, 9L, 7L))
    val g2 = ops.Diagnostics.partialCorr(flat.toDF("g", "x", "y", "z"),
      "g", "x", "y", "z").collect().head
    assert(g2.isNullAt(g2.fieldIndex("r_xy")))
    assert(g2.isNullAt(g2.fieldIndex("partial_r")))
  }

  test("q_partial_corr: per-segment rows, coefficients in range") {
    val rows = ops.Diagnostics.partialCorr(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      Seq("r_xy", "r_xz", "r_yz", "partial_r").foreach { c =>
        if (!r.isNullAt(r.fieldIndex(c))) {
          val v = r.getAs[Double](c)
          assert(v >= -1.0 && v <= 1.0, s"$c out of range: $v")
        }
      }
    }
  }

  test("kendallTau: hand-counted concordance with every tie class") {
    import spark.implicits._
    // pairs of (1,1),(2,2),(2,3),(3,0),(2,3): C=3, D=4, x-only ties 2,
    // one fully-tied pair → n1=3, n2=1, τb = -1/√63
    val pts = Seq(("A", 1L, 1L), ("A", 2L, 2L), ("A", 2L, 3L),
      ("A", 3L, 0L), ("A", 2L, 3L))
    val got = ops.Diagnostics.kendallTau(pts.toDF("g", "x", "y"), "g", "x", "y")
      .collect().head
    assert(got.getAs[Long]("concordant") == 3L)
    assert(got.getAs[Long]("discordant") == 4L)
    assert(got.getAs[Long]("ties_x_only") == 2L)
    assert(got.getAs[Long]("ties_y_only") == 0L)
    assert(got.getAs[Double]("tau_b") ==
      math.rint(-1.0 / math.sqrt(63.0) * 1e6) / 1e6)
  }

  test("kendallTau: strict monotone hits +1; all-tied x yields NULL") {
    import spark.implicits._
    val mono = (1L to 6L).map(i => ("A", i, i * i))
    val gm = ops.Diagnostics.kendallTau(mono.toDF("g", "x", "y"),
      "g", "x", "y").collect().head
    assert(gm.getAs[Double]("tau_b") == 1.0)
    val flat = Seq(("B", 7L, 1L), ("B", 7L, 2L), ("B", 7L, 3L))
    val gf = ops.Diagnostics.kendallTau(flat.toDF("g", "x", "y"),
      "g", "x", "y").collect().head
    assert(gf.isNullAt(gf.fieldIndex("tau_b")))
  }

  test("q_kendall_tau: per-segment rows, tau in range, pair budget closes") {
    val rows = ops.Diagnostics.kendallTau(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_months")
      val counted = r.getAs[Long]("concordant") + r.getAs[Long]("discordant") +
        r.getAs[Long]("ties_x_only") + r.getAs[Long]("ties_y_only")
      assert(counted <= n * (n - 1) / 2)
      if (!r.isNullAt(r.fieldIndex("tau_b"))) {
        val t = r.getAs[Double]("tau_b")
        assert(t >= -1.0 && t <= 1.0)
      }
    }
  }

  test("priceElasticity: a planted constant-elasticity curve recovers its exponent") {
    import spark.implicits._
    // q = 1000 · p^(−2): ln q = ln 1000 − 2·ln p exactly; plant a few
    // (price, qty) points on the curve via a synthetic lineitem+part
    val pts = Seq(1.0 -> 1000.0, 2.0 -> 250.0, 4.0 -> 62.5, 5.0 -> 40.0)
    val li = pts.zipWithIndex.map { case ((p, q), i) =>
      (i.toLong, q, p * q) }.toDF("l_partkey", "l_quantity", "l_extendedprice")
    val part = (0L until 4L).map((_, "B1")).toDF("p_partkey", "p_brand")
    val xy = li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        round(log(col("l_extendedprice") / col("l_quantity")) * 1e6)
          .cast("long").as("x"),
        round(log(col("l_quantity")) * 1e6).cast("long").as("y"))
    val r = ops.Diagnostics.linReg(xy, "brand", "x", "y").collect()(0)
    // micro-ln quantization perturbs the fit below the rounded scale
    assert(math.abs(r.getAs[Double]("slope") - (-2.0)) < 1e-4,
      s"elasticity ${r.getAs[Double]("slope")}")
    assert(r.getAs[Double]("r2") > 0.999999)
    // corpus: one row per brand, finite estimates
    val corpus = ops.Diagnostics.priceElasticity(spark, sfDir).collect()
    assert(corpus.length == 25)
    corpus.foreach { row =>
      assert(!row.isNullAt(row.fieldIndex("elasticity")))
      val r2 = row.getAs[Double]("r2")
      assert(r2 >= 0 && r2 <= 1)
    }
  }

  test("diffInDiff: hand-computed 2x2 estimate and t; degenerate cells go NULL") {
    import spark.implicits._
    // Δtreated = 45−15 = 30, Δcontrol = 25−15 = 10 → DiD 20¢ = $0.2
    // each cell var 50, va = 25 → SE = 10 → t = 2.0
    val planted = Seq(
      (true, false, 10L), (true, false, 20L),
      (true, true, 40L), (true, true, 50L),
      (false, false, 10L), (false, false, 20L),
      (false, true, 20L), (false, true, 30L)).toDF("t", "p", "v")
    val r = ops.Diagnostics.diffInDiff(planted, "t", "p", "v").collect()(0)
    assert(r.getAs[Double]("delta_treated") == 0.3)
    assert(r.getAs[Double]("delta_control") == 0.1)
    assert(r.getAs[Double]("did") == 0.2)
    assert(r.getAs[Double]("t_stat") == 2.0)
    // a 1-row cell has no variance: estimate survives, t goes NULL
    val thin = Seq((true, false, 10L), (true, true, 40L),
      (false, false, 10L), (false, true, 20L)).toDF("t", "p", "v")
    val s = ops.Diagnostics.diffInDiff(thin, "t", "p", "v").collect()(0)
    assert(s.getAs[Double]("did") == 0.2 &&
      s.isNullAt(s.fieldIndex("t_stat")))
    // corpus: all four cells populated, estimate finite
    val corpus = ops.Diagnostics.diffInDiff(spark, sfDir).collect()(0)
    assert(Seq("n_tpre", "n_tpost", "n_cpre", "n_cpost")
      .forall(c => corpus.getAs[Long](c) > 0))
    assert(!corpus.isNullAt(corpus.fieldIndex("t_stat")))
  }

  test("winsorize: exact clamp bounds on 0..100; outlier-immune mean") {
    import spark.implicits._
    // 0..100 cents: p05=5, p95=95 land exactly on elements
    val flat = (0L to 100L).map(("g", _)).toDF("seg", "cents")
    val r = ops.Diagnostics.winsorize(flat, "seg", "cents", 0.05, 0.95)
      .collect()(0)
    assert(r.getAs[Long]("lo") == 5L && r.getAs[Long]("hi") == 95L)
    assert(r.getAs[Long]("n_lo") == 5L && r.getAs[Long]("n_hi") == 5L)
    // winsorized sum = 5·5 + Σ(5..95) + 5·95 = 5050 → mean 50¢ = $0.5
    assert(r.getAs[Double]("winsor_mean") == 0.5)
    assert(r.getAs[Double]("trim_mean") == 0.5)
    // a catastrophic outlier moves the winsorized mean barely at all
    val dirty = flat.union(Seq(("g", 1000000000L)).toDF("seg", "cents"))
    val d = ops.Diagnostics.winsorize(dirty, "seg", "cents", 0.05, 0.95)
      .collect()(0)
    assert(d.getAs[Double]("winsor_mean") < 2.0,
      s"winsorized mean not robust: ${d.getAs[Double]("winsor_mean")}")
    assert(d.getAs[Long]("n_hi") >= 1)
    // corpus: one row per segment, ordered, lo < hi, means finite
    val corpus = ops.Diagnostics.winsorize(spark, sfDir).collect()
    assert(corpus.length == 5)
    assert(corpus.forall(r => r.getAs[Long]("lo") < r.getAs[Long]("hi")))
    assert(corpus.map(_.getAs[String]("g")).toSeq ==
      corpus.map(_.getAs[String]("g")).sorted.toSeq)
  }

  test("changepoint: planted level shift is the argmax; flat series gains nothing") {
    import spark.implicits._
    def series(vals: Seq[(String, Long)]) =
      vals.toDF("d", "cents").withColumn("m", to_date(col("d")))
    // level 10 for 3 periods then level 50: the boundary split is best
    val shifted = series(Seq(
      ("2024-01-01", 10L), ("2024-02-01", 10L), ("2024-03-01", 10L),
      ("2024-04-01", 50L), ("2024-05-01", 50L), ("2024-06-01", 50L)))
    val got = ops.Diagnostics.changepoint(shifted, "m", "cents").collect()
    assert(got.length == 5) // last period never splits
    val best = got.filter(_.getAs[Boolean]("is_best"))
    assert(best.length == 1)
    assert(best.head.getAs[java.sql.Date]("m").toString == "2024-03-01",
      s"split must land on the level boundary: ${got.mkString(",")}")
    // between-segment gain is ≥ 0 up to per-term truncation (±3 milli)
    assert(got.forall(_.getAs[Long]("gain_milli") >= -3L))
    // flat series: every split gains ~0 → earliest period wins the tie
    val flat = series((1 to 4).map(i => (f"2024-0$i%01d-01", 7L)))
    val f = ops.Diagnostics.changepoint(flat, "m", "cents").collect()
    assert(f.forall(r => math.abs(r.getAs[Long]("gain_milli")) <= 3L))
    assert(f.filter(_.getAs[Boolean]("is_best")).head
      .getAs[java.sql.Date]("m").toString == "2024-01-01")
    // corpus: exactly one best split, cumulative masses conserved
    val corpus = ops.Diagnostics.changepoint(spark, sfDir).collect()
    assert(corpus.count(_.getAs[Boolean]("is_best")) == 1)
    assert(corpus.forall(r =>
      r.getAs[Long]("n_l") > 0 && r.getAs[Long]("n_r") > 0))
  }

  test("countMin: never undercounts; a lone term is exact; k bounds the report") {
    import spark.implicits._
    // single distinct token: its 4 cells hold only its own count →
    // the min-of-cells estimate is EXACT
    val lone = Seq.fill(7)("solo solo solo").toDF("text")
    val l = ops.Diagnostics.countMin(lone, "text", 5).collect()
    assert(l.length == 1)
    assert(l.head.getAs[Long]("true_cnt") == 21L)
    assert(l.head.getAs[Long]("cms_est") == 21L)
    assert(l.head.getAs[Long]("overcount") == 0L)
    // the CMS one-sided-error invariant on the real corpus: estimates
    // never fall below truth, report is top-k by true count
    val corpus = ops.Diagnostics.countMin(spark, sfDir).collect()
    assert(corpus.length == 20)
    assert(corpus.forall(_.getAs[Long]("overcount") >= 0L))
    val truths = corpus.map(_.getAs[Long]("true_cnt"))
    assert(truths.toSeq == truths.sortBy(-(_: Long)).toSeq)
  }

  test("mkTrend: hand-computed z with and without ties, degenerate NULL") {
    import spark.implicits._
    // strictly rising [1,2,3]: S = 3, 18V = 3·2·11 = 66,
    // z = 2/sqrt(66/18) = 1.0445
    val up = Seq(("a", 1, 1L), ("a", 2, 2L), ("a", 3, 3L))
      .toDF("g", "m", "x")
    val u = ops.Diagnostics.mkTrend(up, "g", "m", "x").collect().head
    assert(u.getAs[Long]("s_stat") == 3L &&
      u.getAs[Long]("var18") == 66L)
    assert(u.getAs[Double]("z") == 1.0445 &&
      u.getAs[String]("trend") == "up")
    // tie correction: [1,1,2] → S = 2, 18V = 66 − 2·1·9 = 48,
    // z = 1/sqrt(48/18) = 0.6124
    val tie = Seq(("a", 1, 1L), ("a", 2, 1L), ("a", 3, 2L))
      .toDF("g", "m", "x")
    val t = ops.Diagnostics.mkTrend(tie, "g", "m", "x").collect().head
    assert(t.getAs[Long]("s_stat") == 2L && t.getAs[Long]("var18") == 48L)
    assert(t.getAs[Double]("z") == 0.6124)
    // mirrored series mirrors the statistic
    val dn = Seq(("a", 1, 3L), ("a", 2, 2L), ("a", 3, 1L))
      .toDF("g", "m", "x")
    val d0 = ops.Diagnostics.mkTrend(dn, "g", "m", "x").collect().head
    assert(d0.getAs[Double]("z") == -1.0445 &&
      d0.getAs[String]("trend") == "down")
    // all-tied series: no ordering information → NULL z, flat
    val flat = Seq(("a", 1, 5L), ("a", 2, 5L), ("a", 3, 5L))
      .toDF("g", "m", "x")
    val f = ops.Diagnostics.mkTrend(flat, "g", "m", "x").collect().head
    assert(f.isNullAt(f.fieldIndex("z")) &&
      f.getAs[String]("trend") == "flat")
    // corpus: |S| is bounded by the pair count n(n−1)/2
    val c = ops.Diagnostics.mkTrend(spark, sfDir).collect()
    assert(c.length == 5)
    assert(c.forall { r =>
      val n = r.getAs[Long]("n_months")
      math.abs(r.getAs[Long]("s_stat")) <= n * (n - 1) / 2 })
  }

  test("poissonDispersion: exact hand ratios, zero-fill, Poisson unit") {
    import spark.implicits._
    def ts(d: Int, i: Int) =
      java.sql.Timestamp.valueOf(f"2024-04-$d%02d 0$i:00:00")
    // A: counts [2,0,4] → D = 2.0 (2000 milli), χ² = 4.0 (4000 milli)
    // B: one event on the middle day → zero-filled [0,1,0] → D exactly
    //    1.0 — a minimal Poisson-consistent series
    val ev = Seq(("A", ts(1, 1)), ("A", ts(1, 2)), ("A", ts(3, 1)),
      ("A", ts(3, 2)), ("A", ts(3, 3)), ("A", ts(3, 4)),
      ("B", ts(2, 1))).toDF("t", "ts")
    val r = ops.Diagnostics.poissonDispersion(ev, "t", "ts").collect()
    val a = r.find(_.getString(0) == "A").get
    assert(a.getAs[Long]("n_days") == 3 && a.getAs[Long]("total") == 6)
    assert(a.getAs[Long]("dispersion_milli") == 2000L)
    assert(a.getAs[Long]("chi2_milli") == 4000L)
    val b = r.find(_.getString(0) == "B").get
    assert(b.getAs[Long]("n_days") == 3, "grid must zero-fill B's span")
    assert(b.getAs[Long]("dispersion_milli") == 1000L)
    // constant arrivals: D = χ² = exactly 0
    val const = Seq(("C", ts(1, 1)), ("C", ts(2, 1)), ("C", ts(3, 1)))
      .toDF("t", "ts")
    val c0 = ops.Diagnostics.poissonDispersion(const, "t", "ts")
      .collect().head
    assert(c0.getAs[Long]("dispersion_milli") == 0L &&
      c0.getAs[Long]("chi2_milli") == 0L)
    // corpus: 5 types share one grid, D defined and positive
    val c = ops.Diagnostics.poissonDispersion(spark, sfDir).collect()
    assert(c.length == 5)
    assert(c.map(_.getAs[Long]("n_days")).distinct.length == 1,
      "all types must share the global calendar grid")
    assert(c.forall(_.getAs[Long]("dispersion_milli") >= 0L))
  }

  test("grubbs: hand G, integer-argmax tie rule, degenerate NULL") {
    import spark.implicits._
    // [1,2,9]: x̄=4, s=√19, G = 5/4.358899 = 1.1471, suspect = the 9
    val df = Seq(("a", 1, 1L), ("a", 2, 2L), ("a", 3, 9L))
      .toDF("g", "m", "x")
    val r = ops.Diagnostics.grubbs(df, "g", "m", "x").collect().head
    assert(r.getAs[Long]("n_periods") == 3)
    assert(r.getAs[Int]("suspect_month") == 3 &&
      r.getAs[Long]("suspect_cents") == 9L)
    assert(r.getAs[Double]("g_stat") == 1.1471)
    // symmetric pair: both deviations tie → earlier period wins and
    // carries ITS OWN value (min_by, not min-of-values)
    val sym = Seq(("a", 1, 10L), ("a", 2, 0L)).toDF("g", "m", "x")
    val s = ops.Diagnostics.grubbs(sym, "g", "m", "x").collect().head
    assert(s.getAs[Int]("suspect_month") == 1 &&
      s.getAs[Long]("suspect_cents") == 10L)
    assert(s.getAs[Double]("g_stat") == 0.7071)
    // constant series → zero variance → NULL statistic
    val flat = Seq(("a", 1, 5L), ("a", 2, 5L)).toDF("g", "m", "x")
    val f = ops.Diagnostics.grubbs(flat, "g", "m", "x").collect().head
    assert(f.isNullAt(f.fieldIndex("g_stat")))
    // corpus: 5 segments, G bounded by (n−1)/√n (Grubbs' identity)
    val c = ops.Diagnostics.grubbs(spark, sfDir).collect()
    assert(c.length == 5)
    assert(c.forall { r =>
      val n = r.getAs[Long]("n_periods").toDouble
      r.getAs[Double]("g_stat") <= (n - 1) / math.sqrt(n) + 1e-9 })
  }
}
