package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-data exactness for [[graft.ops.Evaluation]] — every
  * statistic is checked against a hand-computed closed form on inputs
  * small enough to verify on paper, then smoke-checked on the corpus.
  */
class EvaluationSpec extends AnyFunSuite {
  import SparkTestSession._

  test("auc: separation, tie-averaging, and degenerate margins") {
    import spark.implicits._
    // perfect separation: every positive outscores every negative
    val perfect = Seq(("a", 1L, false), ("a", 2L, false),
      ("a", 3L, true), ("a", 4L, true)).toDF("g", "v", "y")
    val p = ops.Evaluation.auc(perfect, "g", "v", "y", 4L).collect()
    assert(p.length == 1 && p(0).getAs[Double]("auc") == 1.0)
    assert(p(0).getAs[Long]("n_pos") == 2 && p(0).getAs[Long]("n_neg") == 2)
    // hand case with a tie: neg@1, pos@2, neg@2, pos@3
    // ranks: 1, {2,3}→2.5 each, 4; R+ = 2.5 + 4 = 6.5; U = 3.5; AUC = 0.875
    val tied = Seq(("a", 1L, false), ("a", 2L, true),
      ("a", 2L, false), ("a", 3L, true)).toDF("g", "v", "y")
    val t = ops.Evaluation.auc(tied, "g", "v", "y", 4L).collect()
    assert(t(0).getAs[Double]("auc") == 0.875)
    // all scores identical → AUC exactly 1/2 by tie-averaging
    val flat = Seq(("a", 5L, true), ("a", 5L, false),
      ("a", 5L, true)).toDF("g", "v", "y")
    assert(ops.Evaluation.auc(flat, "g", "v", "y", 4L)
      .collect()(0).getAs[Double]("auc") == 0.5)
    // a single-class group has no ranking to score → NULL, not NaN
    val mono = Seq(("a", 1L, true), ("a", 2L, true)).toDF("g", "v", "y")
    assert(ops.Evaluation.auc(mono, "g", "v", "y", 4L)
      .collect()(0).isNullAt(4))
    // corpus smoke: one row per linestatus, AUC in [0,1]
    val corpus = ops.Evaluation.auc(spark, sfDir).collect()
    assert(corpus.length == 2)
    assert(corpus.forall { r =>
      val a = r.getAs[Double]("auc"); a >= 0.0 && a <= 1.0 })
  }

  test("calibration: fixed bins, exact rates and Brier terms") {
    import spark.implicits._
    val planted = Seq((50L, false), (150L, true), (950L, true),
      (1000L, true)).toDF("p", "y")
    val got = ops.Evaluation.calibration(planted, "p", "y")
      .collect().map(r => (r.getAs[Long]("bin"), r)).toMap
    assert(got.keySet == Set(0L, 1L, 9L)) // p=1000 capped into bin 9
    assert(got(0L).getAs[Double]("pos_rate") == 0.0)
    assert(got(0L).getAs[Double]("brier") == 0.0025) // (50/1000)²
    assert(got(1L).getAs[Double]("mean_pred") == 0.15)
    assert(got(1L).getAs[Double]("brier") == 0.7225) // (0.15−1)²
    assert(got(9L).getAs[Long]("n") == 2 &&
      got(9L).getAs[Long]("n_pos") == 2)
    assert(got(9L).getAs[Double]("brier") == 0.00125) // (2500+0)/2/1e6
    // corpus smoke: bins ordered, rates within [0,1]
    val corpus = ops.Evaluation.calibration(spark, sfDir).collect()
    assert(corpus.nonEmpty && corpus.length <= 10)
    assert(corpus.forall { r =>
      val pr = r.getAs[Double]("pos_rate"); pr >= 0 && pr <= 1 })
  }

  test("psi: identical populations score zero; total is the contrib sum") {
    import spark.implicits._
    val same = (Seq.tabulate(10)(i => (i.toLong % 2, true)) ++
      Seq.tabulate(10)(i => (i.toLong % 2, false))).toDF("bin", "base")
    val s = ops.Evaluation.psi(same, "bin", "base").collect()
    assert(s.forall(_.getAs[Double]("contrib") == 0.0))
    assert(s.forall(_.getAs[Double]("psi") == 0.0))
    // a bin present on one side only stays finite through +1 smoothing
    val skew = (Seq.fill(8)((0L, true)) ++ Seq.fill(8)((1L, false)))
      .toDF("bin", "base")
    val k = ops.Evaluation.psi(skew, "bin", "base").collect()
    assert(k.length == 2 && k.forall(r =>
      !r.getAs[Double]("contrib").isInfinite))
    assert(k.forall(_.getAs[Double]("psi") > 1.0)) // grossly shifted
    // total equals the sum of per-bin contributions (shared micro grid)
    val corpus = ops.Evaluation.psi(spark, sfDir).collect()
    val total = corpus.map(_.getAs[Double]("contrib")).sum
    assert(math.abs(corpus.head.getAs[Double]("psi") - total) < 1e-9)
  }

  test("anovaF: hand-computed two-group F and eta squared") {
    import spark.implicits._
    // g1 = {100,300}, g2 = {500,700}: SSB=160000, SSW=40000 → F=8, η²=0.8
    val planted = Seq(("g1", 100L), ("g1", 300L), ("g2", 500L),
      ("g2", 700L)).toDF("g", "v")
    val r = ops.Evaluation.anovaF(planted, "g", "v").collect()(0)
    assert(r.getAs[Long]("k") == 2 && r.getAs[Long]("n") == 4)
    assert(r.getAs[Double]("f_stat") == 8.0)
    assert(r.getAs[Double]("eta_sq") == 0.8)
    // zero within-group variance → NULL F, not Infinity
    val flat = Seq(("g1", 5L), ("g1", 5L), ("g2", 9L), ("g2", 9L))
      .toDF("g", "v")
    assert(ops.Evaluation.anovaF(flat, "g", "v").collect()(0).isNullAt(2))
    // singleton groups are excluded from the dfs
    val single = Seq(("g1", 1L), ("g1", 3L), ("lone", 9L)).toDF("g", "v")
    val s = ops.Evaluation.anovaF(single, "g", "v").collect()(0)
    assert(s.getAs[Long]("k") == 1 && s.getAs[Long]("n") == 2)
    val corpus = ops.Evaluation.anovaF(spark, sfDir).collect()(0)
    assert(corpus.getAs[Long]("k") == 5 && corpus.getAs[Double]("f_stat") >= 0)
  }

  test("brownForsythe: hand case on doubled median deviations") {
    import spark.implicits._
    // g1 = {0, 20000, 100000}: med2=40000 → z2 = {40000, 0, 160000}
    // g2 = {0,0,0}: z2 = {0,0,0}; W = 666666/346666.75 → 1.9231
    val planted = Seq(("g1", 0L), ("g1", 20000L), ("g1", 100000L),
      ("g2", 0L), ("g2", 0L), ("g2", 0L)).toDF("g", "v")
    val r = ops.Evaluation.brownForsythe(planted, "g", "v").collect()(0)
    assert(r.getAs[Long]("k") == 2 && r.getAs[Long]("n") == 6)
    assert(r.getAs[Double]("w_stat") == 1.9231)
    val corpus = ops.Evaluation.brownForsythe(spark, sfDir).collect()(0)
    assert(corpus.getAs[Long]("k") == 5 &&
      corpus.getAs[Double]("w_stat") >= 0)
  }

  test("cramersV: perfect association is 1, independence is 0") {
    import spark.implicits._
    val perfect = (Seq.fill(10)(("x", "x")) ++ Seq.fill(10)(("y", "y")))
      .toDF("a", "b")
    val p = ops.Evaluation.cramersV(perfect, "a", "b").collect()(0)
    assert(p.getAs[Long]("n") == 20 && p.getAs[Double]("cramers_v") == 1.0)
    assert(p.getAs[Double]("chi2") == 20.0)
    val indep = (Seq.fill(5)(("x", "u")) ++ Seq.fill(5)(("x", "w")) ++
      Seq.fill(5)(("y", "u")) ++ Seq.fill(5)(("y", "w"))).toDF("a", "b")
    val i = ops.Evaluation.cramersV(indep, "a", "b").collect()(0)
    assert(i.getAs[Double]("chi2") == 0.0 &&
      i.getAs[Double]("cramers_v") == 0.0)
    // a 1×k table has no association dimension → NULL, not divide-by-0
    val oneRow = Seq(("x", "u"), ("x", "w")).toDF("a", "b")
    assert(ops.Evaluation.cramersV(oneRow, "a", "b").collect()(0).isNullAt(4))
    val corpus = ops.Evaluation.cramersV(spark, sfDir).collect()(0)
    assert(corpus.getAs[Long]("r") == 3 && corpus.getAs[Long]("c") == 5)
    val v = corpus.getAs[Double]("cramers_v")
    assert(v >= 0 && v <= 1)
  }

  test("logLoss: perfect, uninformative and clipped predictions") {
    import spark.implicits._
    // p = 500‰ on every row → LL = ln 2 regardless of labels
    val coin = Seq(("a", 500L, true), ("a", 500L, false)).toDF("g", "p", "y")
    val c = ops.Evaluation.logLoss(coin, "g", "p", "y").collect()(0)
    assert(c.getAs[Double]("log_loss") == math.rint(math.log(2) * 1e6) / 1e6)
    // confident-right is near-free; confident-wrong clamps at 999/1
    val sure = Seq(("a", 999L, true)).toDF("g", "p", "y")
    val s = ops.Evaluation.logLoss(sure, "g", "p", "y").collect()(0)
    assert(s.getAs[Double]("log_loss") ==
      math.rint(-math.log(0.999) * 1e6) / 1e6)
    val wrong = Seq(("a", 0L, true)).toDF("g", "p", "y") // clips to 1‰
    val w = ops.Evaluation.logLoss(wrong, "g", "p", "y").collect()(0)
    assert(w.getAs[Double]("log_loss") ==
      math.rint(-math.log(0.001) * 1e6) / 1e6)
    val corpus = ops.Evaluation.logLoss(spark, sfDir).collect()
    assert(corpus.length == 2 &&
      corpus.forall(_.getAs[Double]("log_loss") > 0))
  }

  test("jsDivergence: identical mix scores 0; disjoint approaches ln 2") {
    import spark.implicits._
    // two sources with the same category mix → JSD 0 for both
    val same = (Seq.fill(6)(("s1", "en")) ++ Seq.fill(3)(("s1", "de")) ++
      Seq.fill(4)(("s2", "en")) ++ Seq.fill(2)(("s2", "de")))
      .toDF("src", "cat")
    val s = ops.Evaluation.jsDivergence(same, "src", "cat").collect()
    assert(s.forall(_.getAs[Double]("jsd") == 0.0))
    // a source fully disjoint from the rest of the corpus: its JSD
    // vs the corpus mix is large but below the ln 2 ceiling (the
    // corpus mix still contains the source's own mass)
    val disjoint = (Seq.fill(10)(("loner", "zz")) ++
      Seq.fill(990)(("rest", "en"))).toDF("src", "cat")
    val d = ops.Evaluation.jsDivergence(disjoint, "src", "cat")
      .collect().map(r => r.getAs[String]("src") -> r.getAs[Double]("jsd"))
      .toMap
    assert(d("loner") > 0.5 && d("loner") < math.log(2) + 1e-9)
    assert(d("rest") > 0 && d("rest") < 0.05)
    // corpus: one row per source, all within [0, ln 2]
    val corpus = ops.Evaluation.jsDivergence(spark, sfDir).collect()
    assert(corpus.length == 20)
    assert(corpus.forall { r =>
      val j = r.getAs[Double]("jsd"); j >= 0 && j <= math.log(2) + 1e-9 })
  }

  test("laws: AUC monotone-invariance and label-flip complement; PSI swap symmetry") {
    import spark.implicits._
    // AUC depends only on the score ORDER: any strictly increasing
    // transform leaves it bit-identical (ranks are unchanged)
    val rows = (0L until 200L).map(i =>
      ("a", (i * 2654435761L) % 97L, i % 3 == 0)).toDF("g", "v", "y")
    val a1 = ops.Evaluation.auc(rows, "g", "v", "y", 16L)
      .collect()(0).getAs[Double]("auc")
    val mono = rows.select(col("g"), (col("v") * 3 + 7).as("v"), col("y"))
    val a2 = ops.Evaluation.auc(mono, "g", "v", "y", 16L)
      .collect()(0).getAs[Double]("auc")
    assert(a1 == a2, s"monotone transform moved AUC: $a1 vs $a2")
    // flipping the labels complements the AUC exactly (U-identity)
    val flipped = rows.select(col("g"), col("v"), (!col("y")).as("y"))
    val a3 = ops.Evaluation.auc(flipped, "g", "v", "y", 16L)
      .collect()(0).getAs[Double]("auc")
    assert(math.abs(a1 + a3 - 1.0) < 2e-6, s"complement broken: $a1 + $a3")
    // PSI is swap-symmetric: each term (p−q)·ln(p/q) is invariant
    // under exchanging the populations
    val pop = (0L until 300L).map(i =>
      ((i * 31L) % 7L, i % 2 == 0)).toDF("bin", "base")
    val p1 = ops.Evaluation.psi(pop, "bin", "base").collect()
      .head.getAs[Double]("psi")
    val swapped = pop.select(col("bin"), (!col("base")).as("base"))
    val p2 = ops.Evaluation.psi(swapped, "bin", "base").collect()
      .head.getAs[Double]("psi")
    assert(p1 == p2, s"PSI swap symmetry broken: $p1 vs $p2")
    // Cliff's delta is antisymmetric under group exchange: relabel so
    // the pair order flips and the sign must flip with it
    val ab = Seq(("a", 1L), ("a", 5L), ("b", 2L), ("b", 9L)).toDF("g", "v")
    val ba = ab.select(when(col("g") === "a", "z").otherwise("b").as("g"),
      col("v"))
    val d1 = ops.Evaluation.effectSizes(ab, "g", "v")
      .collect()(0).getAs[Double]("cliffs_delta")
    val d2 = ops.Evaluation.effectSizes(ba, "g", "v")
      .collect()(0).getAs[Double]("cliffs_delta")
    assert(d1 == -d2, s"delta antisymmetry broken: $d1 vs $d2")
  }

  test("effectSizes: hand-computed d, g and delta; disjoint groups saturate delta") {
    import spark.implicits._
    // a = {0,2}, b = {1,3}: means 1 vs 2, va = vb = 2 → sp = √2
    // d = −1/√2 = −0.7071; g = d·(1 − 3/(4·4−9)) = d·4/7 = −0.4041
    // pairs: (0<1),(0<3),(2>1),(2<3) → gt=1, lt=3, eq=0 → δ = −0.5
    val planted = Seq(("a", 0L), ("a", 2L), ("b", 1L), ("b", 3L))
      .toDF("g", "v")
    val r = ops.Evaluation.effectSizes(planted, "g", "v").collect()(0)
    assert(r.getAs[String]("t_a") == "a" && r.getAs[String]("t_b") == "b")
    assert(r.getAs[Double]("cohen_d") ==
      BigDecimal(-1.0 / math.sqrt(2.0))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("hedges_g") ==
      BigDecimal(-1.0 / math.sqrt(2.0) * (1.0 - 3.0 / 7.0))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("cliffs_delta") == -0.5)
    // fully separated groups: δ = ±1 regardless of the gap size
    val sep = Seq(("lo", 1L), ("lo", 2L), ("hi", 100L), ("hi", 200L))
      .toDF("g", "v")
    val s = ops.Evaluation.effectSizes(sep, "g", "v").collect()(0)
    assert(s.getAs[Double]("cliffs_delta") == 1.0) // t_a="hi" > t_b="lo"
    // zero pooled variance → NULL d/g, δ still defined (all ties → 0)
    val flat = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L)).toDF("g", "v")
    val f = ops.Evaluation.effectSizes(flat, "g", "v").collect()(0)
    assert(f.isNullAt(4) && f.isNullAt(5) &&
      f.getAs[Double]("cliffs_delta") == 0.0)
    // corpus: all C(5,2)=10 pairs, δ within [−1,1]
    val corpus = ops.Evaluation.effectSizes(spark, sfDir).collect()
    assert(corpus.length == 10)
    assert(corpus.forall { r =>
      val dd = r.getAs[Double]("cliffs_delta"); dd >= -1 && dd <= 1 })
  }

  test("splitConformal: perfect fit collapses the band; driver-model law agrees exactly") {
    import spark.implicits._
    def bucket(key: Long): Long = ((key % 1000000007L) * 2654435761L) % 10L
    // perfectly linear group: every residual is 0 → qhat 0, full coverage
    val exact = (0L until 400L).map(i =>
      ("a", (i % 40) + 1, 500L * ((i % 40) + 1) + 700L, i))
      .toDF("g", "x", "y", "key")
    val e = ops.Evaluation.splitConformal(exact, "g", "x", "y", "key", 1000)
      .collect()(0)
    assert(e.getAs[Long]("qhat_cents") == 0L &&
      e.getAs[Long]("coverage_bp") == 10000L)
    assert(e.getAs[Double]("slope") == 500.0 &&
      e.getAs[Double]("intercept_cents") == 700.0)
    // noisy group: independent driver-side recomputation (same staged
    // arithmetic) of fit, k-th-smallest residual and coverage
    val rows = (0L until 1000L).map { i =>
      val x = (i % 37) + 1
      val y = 200L * x + 5000L + ((i * 2654435761L) % 997L) - 498L
      ("b", x, y, i)
    }
    val got = ops.Evaluation.splitConformal(rows.toDF("g", "x", "y", "key"),
      "g", "x", "y", "key", 1000).collect()(0)
    val train = rows.filter(r => bucket(r._4) < 6)
    val cal = rows.filter(r => { val b = bucket(r._4); b >= 6 && b < 8 })
    val test = rows.filter(r => bucket(r._4) >= 8)
    val n = train.size.toDouble
    val (sx, sy) = (train.map(_._2).sum.toDouble, train.map(_._3).sum.toDouble)
    val sxy = train.map(r => BigInt(r._2) * BigInt(r._3)).sum.toDouble
    val sxx = train.map(r => BigInt(r._2) * BigInt(r._2)).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
    def resid(x: Long, y: Long): Long =
      BigDecimal(math.abs(y.toDouble - icept - slope * x.toDouble))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val calR = cal.map(r => resid(r._2, r._3)).sorted
    val k = (((cal.size + 1) * 9000 + 9999) / 10000).min(cal.size)
    val qhat = calR(k - 1)
    assert(got.getAs[Long]("n_train") == train.size &&
      got.getAs[Long]("n_cal") == cal.size &&
      got.getAs[Long]("n_test") == test.size)
    assert(got.getAs[Long]("qhat_cents") == qhat,
      s"qhat ${got.getAs[Long]("qhat_cents")} vs model $qhat")
    val covered = test.count(r => resid(r._2, r._3) <= qhat)
    assert(got.getAs[Long]("coverage_bp") == covered * 10000L / test.size)
    // corpus: 3 groups, coverage honors the 90% target within slack
    val corpus = ops.Evaluation.splitConformal(spark, sfDir).collect()
    assert(corpus.length == 3)
    assert(corpus.forall { r =>
      val c = r.getAs[Long]("coverage_bp"); c >= 8500 && c <= 10000 })
  }

  test("burstiness: metronome scores exactly -1; bursty gaps match the model") {
    import spark.implicits._
    def t(ms: Long) = new java.sql.Timestamp(ms)
    // equal gaps → σ = 0 → B = −1 exactly
    val metro = (0L to 5L).map(i => ("a", t(i * 1000), i)).toDF("g", "ts", "id")
    val m = ops.Evaluation.burstiness(metro, "g", "ts", Seq("ts", "id"))
      .collect()(0)
    assert(m.getAs[Long]("n_gaps") == 5L)
    assert(m.getAs[Double]("burstiness") == -1.0)
    // gaps {1,1,1,97}: μ=25, σ=√1728 — same staged math on the driver
    val times = Seq(0L, 1L, 2L, 3L, 100L)
    val bursty = times.zipWithIndex.map { case (ms, i) => ("a", t(ms), i.toLong) }
      .toDF("g", "ts", "id")
    val b = ops.Evaluation.burstiness(bursty, "g", "ts", Seq("ts", "id"))
      .collect()(0)
    val mu = 100.0 / 4; val sigma = math.sqrt((1.0 + 1 + 1 + 9409) / 4 - mu * mu)
    assert(b.getAs[Double]("burstiness") ==
      BigDecimal((sigma - mu) / (sigma + mu))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // a single gap has no dispersion to measure → filtered out
    val thin = Seq(("a", t(0), 0L), ("a", t(5), 1L)).toDF("g", "ts", "id")
    assert(ops.Evaluation.burstiness(thin, "g", "ts", Seq("ts", "id"))
      .collect().isEmpty)
    // corpus: one row per event type, B strictly inside (−1, 1)
    val corpus = ops.Evaluation.burstiness(spark, sfDir).collect()
    assert(corpus.length == 5)
    corpus.foreach { r =>
      val x = r.getAs[Double]("burstiness")
      assert(x > -1 && x < 1)
    }
  }

  test("runsTest: alternation and clustering are symmetric hand cases") {
    import spark.implicits._
    // median of {1,9}×3 = 5; alternating signs → 6 runs, z = +1.8257
    val alt = Seq.tabulate(6)(i =>
      ("a", if (i % 2 == 0) 1L else 9L, i.toLong)).toDF("g", "v", "seq")
    val a = ops.Evaluation.runsTest(alt, "g", "v", Seq("seq")).collect()(0)
    assert(a.getAs[Long]("n1") == 3 && a.getAs[Long]("n2") == 3 &&
      a.getAs[Long]("runs") == 6)
    assert(a.getAs[Double]("z") == 1.8257)
    // fully clustered: 2 runs, z = −1.8257 (same magnitude by symmetry)
    val clu = Seq.tabulate(6)(i =>
      ("a", if (i < 3) 1L else 9L, i.toLong)).toDF("g", "v", "seq")
    val c = ops.Evaluation.runsTest(clu, "g", "v", Seq("seq")).collect()(0)
    assert(c.getAs[Long]("runs") == 2 && c.getAs[Double]("z") == -1.8257)
    // exact-to-median rows (odd n) drop: {1,5,9} keeps one of each sign
    val odd = Seq(("a", 1L, 0L), ("a", 5L, 1L), ("a", 9L, 2L))
      .toDF("g", "v", "seq")
    val o = ops.Evaluation.runsTest(odd, "g", "v", Seq("seq")).collect()(0)
    assert(o.getAs[Long]("n1") == 1 && o.getAs[Long]("n2") == 1)
    // one-sided series → NULL z
    val mono = Seq(("a", 1L, 0L), ("a", 1L, 1L), ("a", 9L, 2L))
      .toDF("g", "v", "seq")
    val m = ops.Evaluation.runsTest(mono, "g", "v", Seq("seq")).collect()(0)
    assert(m.getAs[Long]("runs") >= 1) // defined even when z is null
    val corpus = ops.Evaluation.runsTest(spark, sfDir).collect()
    assert(corpus.length == 5 && corpus.forall(r => !r.isNullAt(4)))
  }

  test("cuped: perfectly correlated pre-metric removes all variance; constant X is a no-op") {
    import spark.implicits._
    def ev(rows: Seq[(Long, String, Double)]) =
      rows.toDF("user_id", "d", "value")
        .withColumn("ts", to_timestamp(col("d")))
    // Y = 2X exactly → θ = 2, ρ² = 1 → var_reduction 100% and every
    // variant's adjusted mean collapses to the global post mean
    val corr = ev(Seq(
      (1L, "2024-01-02", 1.0), (1L, "2024-01-20", 2.0),
      (2L, "2024-01-02", 2.0), (2L, "2024-01-20", 4.0),
      (3L, "2024-01-02", 3.0), (3L, "2024-01-20", 6.0),
      (4L, "2024-01-02", 4.0), (4L, "2024-01-20", 8.0)))
    val c = ops.Evaluation.cuped(corr, "user_id", "value", "ts",
      "2024-01-16").collect()
    assert(c.length == 2)
    assert(c.forall(_.getAs[Double]("theta") == 2.0))
    assert(c.forall(_.getAs[Double]("var_reduction_pct") == 100.0))
    val globalPost = (2.0 + 4.0 + 6.0 + 8.0) / 4
    assert(c.forall(_.getAs[Double]("mean_y_adj") == globalPost),
      s"adjusted means must collapse to the global mean: ${c.mkString(",")}")
    // constant pre-metric: var(X) = 0 → θ defined as 0, reduction NULL,
    // adjusted mean = raw mean
    val const = ev(Seq(
      (1L, "2024-01-02", 5.0), (1L, "2024-01-20", 2.0),
      (2L, "2024-01-02", 5.0), (2L, "2024-01-20", 9.0)))
    val k = ops.Evaluation.cuped(const, "user_id", "value", "ts",
      "2024-01-16").collect()
    assert(k.forall(_.getAs[Double]("theta") == 0.0))
    assert(k.forall(r => r.isNullAt(r.fieldIndex("var_reduction_pct"))))
    assert(k.forall(r =>
      r.getAs[Double]("mean_y_adj") == r.getAs[Double]("mean_y")))
    // corpus: exactly two variants, both sides populated
    val corpus = ops.Evaluation.cuped(spark, sfDir).collect()
    assert(corpus.map(_.getAs[String]("variant")).toSeq == Seq("A", "B"))
    assert(corpus.forall(_.getAs[Long]("n_users") > 0))
  }

  test("rrfFusion: opposed rankings — extremes beat the middle, ties break by id") {
    import spark.implicits._
    // a-desc ranks ids 1,2,3; b-desc ranks them 3,2,1. The two
    // extremes score 1e9÷61 + 1e9÷63 (truncating), the middle
    // 2·(1e9÷62) — extremes win, and their tie breaks on id
    val df = Seq((1L, 30L, 1L), (2L, 20L, 2L), (3L, 10L, 3L))
      .toDF("id", "rev", "cnt")
    val got = ops.Evaluation.rrfFusion(df, "id", "rev", "cnt", 3).collect()
    val extreme = 1000000000L / 61 + 1000000000L / 63
    val middle = 2 * (1000000000L / 62)
    assert(extreme > middle)
    assert(got.map(_.getAs[Long]("id")).toSeq == Seq(1L, 3L, 2L))
    assert(got.take(2).forall(_.getAs[Long]("rrf_nano") == extreme))
    assert(got.last.getAs[Long]("rrf_nano") == middle)
    // value ties take the min (competition) rank; the next rank skips
    val tied = Seq((1L, 30L, 1L), (2L, 30L, 2L), (3L, 10L, 3L))
      .toDF("id", "rev", "cnt")
    val t = ops.Evaluation.rrfFusion(tied, "id", "rev", "cnt", 3).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank_rev")).toMap
    assert(t(1L) == 1L && t(2L) == 1L && t(3L) == 3L)
    // corpus: 20 rows, scores non-increasing
    val corpus = ops.Evaluation.rrfFusion(spark, sfDir).collect()
    assert(corpus.length == 20)
    val s = corpus.map(_.getAs[Long]("rrf_nano"))
    assert(s.toSeq == s.sortBy(-(_: Long)).toSeq)
  }

  test("isotonic: planted violator pools to the PAV average; monotone input is untouched") {
    import spark.implicits._
    // rates by score: 0/2, 2/2, 1/2 — scores 2 and 3 violate
    // monotonicity and must pool to 3/4; score 1 stays at 0
    val viol = Seq((1L, false), (1L, false), (2L, true), (2L, true),
      (3L, true), (3L, false)).toDF("p", "y")
    val v = ops.Evaluation.isotonic(viol, "p", "y").collect()
      .map(r => r.getAs[Long]("p") -> r.getAs[Double]("iso_rate")).toMap
    assert(v == Map(1L -> 0.0, 2L -> 0.75, 3L -> 0.75), s"$v")
    // already-isotonic rates are a fixed point of PAV
    val mono = Seq((1L, false), (1L, false), (2L, true), (2L, false),
      (3L, true), (3L, true)).toDF("p", "y")
    val m = ops.Evaluation.isotonic(mono, "p", "y").collect()
    assert(m.forall(r =>
      r.getAs[Double]("iso_rate") == r.getAs[Double]("raw_rate")))
    // corpus law: the fit is non-decreasing in the score and stays
    // inside [0, 1]
    val corpus = ops.Evaluation.isotonic(spark, sfDir).collect()
    val iso = corpus.map(_.getAs[Double]("iso_rate"))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b },
      s"PAV fit must be monotone: ${iso.mkString(",")}")
    assert(iso.forall(r => r >= 0.0 && r <= 1.0))
  }

  test("stratifiedAte: Simpson's paradox corrected; one-armed strata excluded with mass") {
    import spark.implicits._
    // every stratum's gap is +2.00, but treatment concentrates where
    // outcomes are low: the naive pooled gap is NEGATIVE (-1.00).
    // Stratification must report +2 per stratum and ATE = +2.
    val rows = Seq(
      ("A", true, 1000L),
      ("A", false, 800L), ("A", false, 800L), ("A", false, 800L),
      ("B", true, 400L), ("B", true, 400L), ("B", true, 400L),
      ("B", false, 200L))
      .toDF("stratum", "t", "y")
    val got = ops.Evaluation.stratifiedAte(rows, "stratum", "t", "y")
      .collect()
    assert(got.forall(_.getAs[Long]("diff_milli") == 200000L))
    assert(got.forall(_.getAs[Long]("ate_milli") == 200000L))
    // the naive pooled gap really is negative — the paradox is planted
    val nt = rows.filter(col("t")).agg(avg(col("y"))).head.getDouble(0)
    val nc = rows.filter(!col("t")).agg(avg(col("y"))).head.getDouble(0)
    assert(nt - nc == -100.0)
    // a one-armed stratum reports NULL and leaves the ATE untouched
    val withC = rows.union(Seq(("C", true, 7000L)).toDF("stratum", "t", "y"))
    val g2 = ops.Evaluation.stratifiedAte(withC, "stratum", "t", "y")
      .collect()
    assert(g2.forall(_.getAs[Long]("ate_milli") == 200000L))
    val cRow = g2.find(_.getAs[String]("stratum") == "C").get
    assert(cRow.isNullAt(cRow.fieldIndex("diff_milli")))
    // corpus: 5 segments, one shared ATE
    val corpus = ops.Evaluation.stratifiedAte(spark, sfDir).collect()
    assert(corpus.length == 5)
    assert(corpus.map(_.getAs[Long]("ate_milli")).distinct.length == 1)
  }

  test("ebShrinkage: matches a driver-side MoM recomputation; low-n moves most") {
    import spark.implicits._
    // A 30/100, B 10/100, C 3/4 (tiny n, extreme rate), D 20/100
    val rows = Seq(("A", 100, 30), ("B", 100, 10), ("C", 4, 3),
      ("D", 100, 20)).flatMap { case (g, n, x) =>
      (1 to n).map(i => (g, if (i <= x) 1L else 0L))
    }
    val got = ops.Evaluation.ebShrinkage(rows.toDF("grp", "h"), "grp", "h")
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    // independent driver model off the same one-DIV micro rates
    val rm = Map("A" -> 300000L, "B" -> 100000L, "C" -> 750000L,
      "D" -> 200000L)
    assert(got.forall { case (g, r) => r.getAs[Long]("rate_micro") == rm(g) })
    val m = rm.size.toDouble
    val mu = rm.values.sum / m / 1e6
    val v = rm.values.map(x => x.toDouble * x).sum / m / 1e12 - mu * mu
    val k = mu * (1 - mu) / v - 1.0
    val ns = Map("A" -> 100, "B" -> 100, "C" -> 4, "D" -> 100)
    val xs = Map("A" -> 30, "B" -> 10, "C" -> 3, "D" -> 20)
    rm.keys.foreach { g =>
      val want = math.rint((xs(g) + mu * k) / (ns(g) + k) * 1e6) / 1e6
      assert(got(g).getAs[Double]("shrunk_rate") == want)
    }
    // C's 75% collapses toward the prior mean far more than any n=100 arm
    val pull = rm.keys.map(g => g ->
      math.abs(got(g).getAs[Double]("shrunk_rate") - rm(g) / 1e6)).toMap
    assert(pull("C") > pull("A") && pull("C") > pull("B") &&
      pull("C") > pull("D"))
    // degenerate ensemble: identical rates → zero variance → NULL, loudly
    val flat = Seq(("A", 1L), ("A", 0L), ("B", 1L), ("B", 0L))
      .toDF("grp", "h")
    val f = ops.Evaluation.ebShrinkage(flat, "grp", "h").collect()
    assert(f.forall(r => r.isNullAt(r.fieldIndex("shrunk_rate"))))
  }

  test("fdrBh: planted shift is rejected, nulls survive, BH set is a rank prefix") {
    import spark.implicits._
    // S sits 1000 away from A/B with tiny within-group spread → |z|
    // huge, first rank, rejected. (A and B are ALSO rejected here —
    // correctly: one-vs-rest means their complement contains S, so
    // they genuinely differ from their rest too.)
    val rows = (1 to 60).flatMap { i =>
      Seq(("S", 1000L + i % 3), ("A", (i % 3).toLong), ("B", (i % 3).toLong))
    }
    val got = ops.Evaluation.fdrBh(rows.toDF("grp", "v"), "grp", "v")
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(got("S").getAs[Boolean]("reject"))
    assert(got.values.map(_.getAs[Long]("p_e7")).min ==
      got("S").getAs[Long]("p_e7"))
    assert(math.abs(got("S").getAs[Double]("z")) >
      math.abs(got("A").getAs[Double]("z")))
    assert(got.values.forall(_.getAs[Long]("m") == 3L))
    // a shift far below one standard error is noise → nothing rejected
    val tiny = (1 to 60).flatMap { i =>
      Seq(("A", (i % 200).toLong), ("B", (i % 200).toLong),
        ("D", (i % 200).toLong + 1L))
    }
    val t = ops.Evaluation.fdrBh(tiny.toDF("grp", "v"), "grp", "v").collect()
    assert(t.forall(!_.getAs[Boolean]("reject")))
    // identical group multisets → z = 0 exactly, p = 1, nothing rejected
    val flat = (1 to 30).flatMap(i =>
      Seq(("A", (i % 5).toLong), ("B", (i % 5).toLong), ("C", (i % 5).toLong)))
    val f = ops.Evaluation.fdrBh(flat.toDF("grp", "v"), "grp", "v").collect()
    assert(f.forall(!_.getAs[Boolean]("reject")))
    assert(f.forall(_.getAs[Double]("z") == 0.0))
    assert(f.forall(_.getAs[Long]("p_e7") >= 9999990L))
    // corpus: ranks are a permutation, adjusted p monotone in rank,
    // rejections form a rank prefix
    val c = ops.Evaluation.fdrBh(spark, sfDir).collect()
    val byRank = c.sortBy(_.getAs[Long]("rk"))
    assert(byRank.map(_.getAs[Long]("rk")).toSeq ==
      (1L to c.length.toLong).toSeq)
    val adj = byRank.map(_.getAs[Long]("p_adj_e7"))
    assert(adj.zip(adj.tail).forall { case (a, b) => a <= b })
    val rej = byRank.map(_.getAs[Boolean]("reject"))
    assert(!rej.zip(rej.tail).exists { case (a, b) => !a && b })
  }

  test("ipsOffPolicy: hand-traced cells; degenerate policy equals the plain mean") {
    import spark.implicits._
    // cell P: 4 rows, 2 urgent (y=100,200); cell Q: 2 rows, none urgent
    val logs = Seq(("P", true, 100L), ("P", true, 200L),
      ("P", false, 50L), ("P", false, 60L),
      ("Q", false, 10L), ("Q", false, 20L)).toDF("cell", "tgt", "y")
    val got = ops.Evaluation.ipsOffPolicy(logs, "cell", "tgt", "y")
      .collect().map(r => r.getAs[String]("cell") -> r).toMap
    val p = got("P")
    assert(p.getAs[Long]("term_milli") == 600000L) // 300·4·1000/2
    assert(p.getAs[Long]("ips_milli") == 100000L)  // /6
    assert(p.getAs[Long]("snips_milli") == 150000L) // /4 = urgent mean
    assert(p.getAs[Double]("ess") == 2.0)          // 16/(8000/1e3)
    assert(p.getAs[Long]("covered_milli") == 666L)
    val q = got("Q")
    assert(q.isNullAt(q.fieldIndex("term_milli"))) // unsupported, visible
    // target == logging policy → IPS = SNIPS = plain mean, full support
    val all = Seq(("P", true, 100L), ("P", true, 200L), ("Q", true, 300L))
      .toDF("cell", "tgt", "y")
    val a = ops.Evaluation.ipsOffPolicy(all, "cell", "tgt", "y")
      .collect().head
    assert(a.getAs[Long]("ips_milli") == 200000L)
    assert(a.getAs[Long]("snips_milli") == 200000L)
    assert(a.getAs[Double]("ess") == 3.0)
    assert(a.getAs[Long]("covered_milli") == 1000L)
    // corpus: SNIPS ≥ IPS iff coverage < 1 (same numerator, smaller base)
    val c = ops.Evaluation.ipsOffPolicy(spark, sfDir).collect()
    val h = c.head
    assert(h.getAs[Long]("snips_milli") >= h.getAs[Long]("ips_milli"))
    assert(c.map(_.getAs[Long]("ips_milli")).distinct.length == 1)
  }

  test("cmh: hand-quantized strata, degenerate variance, corpus") {
    import spark.implicits._
    // S1: a=2 b=1 c=1 d=2 (N=6): E = 3·3·1e6 DIV 6 = 1_500_000,
    //     V = 3·3·3·3·1e6 DIV (36·5) = 450_000,
    //     orn = 2·2·1e6 DIV 6 = 666_666, ord = 1·1·1e6 DIV 6 = 166_666
    // S2: a=3 b=0 c=0 d=3 (N=6): E = 1_500_000, V = 450_000,
    //     orn = 9e6 DIV 6 = 1_500_000, ord = 0
    // χ² = (5e6 − 3e6)² / (9e5·1e6) = 4.4444
    def rows(s: String, e: Boolean, o: Boolean, n: Int) =
      Seq.fill(n)((s, e, o))
    val df = (rows("S1", true, true, 2) ++ rows("S1", true, false, 1) ++
      rows("S1", false, true, 1) ++ rows("S1", false, false, 2) ++
      rows("S2", true, true, 3) ++ rows("S2", false, false, 3))
      .toDF("st", "e", "o")
    val r = ops.Evaluation.cmh(df, "st", "e", "o").collect().head
    assert(r.getAs[Long]("n_strata") == 2)
    assert(r.getAs[Long]("o_a") == 5L)
    assert(r.getAs[Long]("e_micro") == 3000000L)
    assert(r.getAs[Long]("v_micro") == 900000L)
    assert(r.getAs[Double]("chi2") == 4.4444)
    assert(r.getAs[Double]("or_mh") == 13.0)
    // all-outcome stratum: m0 = 0 → V = 0 → NULL chi2, not NaN
    val dg = (rows("S", true, true, 2) ++ rows("S", false, true, 2))
      .toDF("st", "e", "o")
    val g = ops.Evaluation.cmh(dg, "st", "e", "o").collect().head
    assert(g.isNullAt(g.fieldIndex("chi2")))
    // corpus smoke: uniform synthetic priorities → tiny chi2, OR near 1
    val c = ops.Evaluation.cmh(spark, sfDir).collect().head
    assert(c.getAs[Long]("n_strata") == 5)
    assert(c.getAs[Long]("v_micro") > 0)
  }

  test("fleiss kappa: hand identity, perfect, degenerate") {
    import spark.implicits._
    // N=2 m=2: subj1 {X,X}, subj2 {X,Y} → T=6, M=4, ΣS²=10
    // P̄ = 0.5, P̄e = 0.625 → κ = −1/3
    val df = Seq((1L, "X"), (1L, "X"), (2L, "X"), (2L, "Y"))
      .toDF("subj", "cat")
    val r = ops.Evaluation.fleissKappa(df, "subj", "cat", 2).collect().head
    assert(r.getAs[Long]("n_subjects") == 2)
    assert(r.getAs[Long]("t_sum") == 6L)
    assert(r.getAs[Long]("sum_sj2") == 10L)
    assert(r.getAs[Long]("pbar_micro") == 500000L)
    assert(r.getAs[Long]("pe_micro") == 625000L)
    assert(r.getAs[Double]("kappa") == -0.333333)
    // perfect within-subject agreement across two categories → κ = 1
    val perfect = Seq((1L, "X"), (1L, "X"), (2L, "Y"), (2L, "Y"))
      .toDF("subj", "cat")
    assert(ops.Evaluation.fleissKappa(perfect, "subj", "cat", 2)
      .collect().head.getAs[Double]("kappa") == 1.0)
    // a single category → P̄e = 1 → undefined, NULL not NaN
    val mono = Seq((1L, "X"), (1L, "X"), (2L, "X"), (2L, "X"))
      .toDF("subj", "cat")
    val m = ops.Evaluation.fleissKappa(mono, "subj", "cat", 2)
      .collect().head
    assert(m.isNullAt(m.fieldIndex("kappa")))
    // corpus: subjects are exactly-3-line orders; κ defined and small
    // (synthetic flags are independent), |κ| < 0.1
    val c = ops.Evaluation.fleissKappa(spark, sfDir).collect().head
    assert(c.getAs[Long]("m") == 3L)
    assert(math.abs(c.getAs[Double]("kappa")) < 0.1)
  }

  test("cochran q: hand case, all-or-none degenerate, corpus") {
    import spark.implicits._
    // s1:{A,B,C} s2:{A} s3:{A,B} → G=(3,2,1) L=(3,1,2)
    // Q = 2·(3·14 − 36)/(3·6 − 14) = 3.0, df = 2
    val df = Seq((1L, "A"), (1L, "B"), (1L, "C"), (2L, "A"),
      (3L, "A"), (3L, "B")).toDF("s", "t")
    val r = ops.Evaluation.cochranQ(df, "s", "t").collect().head
    assert(r.getAs[Long]("n_subjects") == 3)
    assert(r.getAs[Long]("k") == 3)
    assert(r.getAs[Long]("sum_g") == 6L)
    assert(r.getAs[Long]("sum_g2") == 14L)
    assert(r.getAs[Long]("sum_l2") == 14L)
    assert(r.getAs[Long]("df") == 2L)
    assert(r.getAs[Double]("q") == 3.0)
    // duplicate incidence rows collapse (x is binary)
    val dup = ops.Evaluation.cochranQ(df.union(df), "s", "t")
      .collect().head
    assert(dup.getAs[Double]("q") == 3.0)
    // every subject hit every treatment → no contrast → NULL
    val full = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"))
      .toDF("s", "t")
    val f = ops.Evaluation.cochranQ(full, "s", "t").collect().head
    assert(f.isNullAt(f.fieldIndex("q")))
    // corpus smoke: 5 observed event types, Q defined
    val c = ops.Evaluation.cochranQ(spark, sfDir).collect().head
    assert(c.getAs[Long]("k") == 5)
    assert(c.getAs[Long]("sum_g") >= c.getAs[Long]("n_subjects"))
  }

  test("liftCurve: exact decile capture, closure at 10000 bp, no-positive NULL") {
    import spark.implicits._
    // scores 1..20, positives at {16..20} ∪ {1}
    val pos = Set(16L, 17L, 18L, 19L, 20L, 1L)
    val df = (1L to 20L).map(v => (v, if (pos(v)) 1L else 0L))
      .toDF("v", "p")
    val r = ops.Evaluation.liftCurve(df, "v", "p", 4L).collect()
    assert(r.length == 10)
    val d1 = r.head
    assert(d1.getAs[Long]("n_cust") == 2 && d1.getAs[Long]("n_pos") == 2)
    assert(d1.getAs[Long]("recall_bp") == 3333L)
    assert(d1.getAs[Long]("lift_bp") == 33333L)
    val d3 = r(2)
    assert(d3.getAs[Long]("cum_pos") == 5 &&
      d3.getAs[Long]("recall_bp") == 8333L &&
      d3.getAs[Long]("lift_bp") == 27777L)
    val last = r.last
    assert(last.getAs[Long]("recall_bp") == 10000L &&
      last.getAs[Long]("lift_bp") == 10000L,
      "curve must close at exactly 10000 bp")
    // no positives → NULL bps, counts still reported
    val none = (1L to 10L).map(v => (v, 0L)).toDF("v", "p")
    val n0 = ops.Evaluation.liftCurve(none, "v", "p", 4L).collect()
    assert(n0.forall(_.isNullAt(n0.head.fieldIndex("lift_bp"))))
    // corpus: closes at exactly 10000 bp and every decile reports
    val c = ops.Evaluation.liftCurve(spark, sfDir).collect()
    assert(c.last.getAs[Long]("lift_bp") == 10000L)
    assert(c.forall(_.getAs[Long]("cum_cust") > 0L))
  }

  test("abPower: driver-model MDE, underpowered verdict, degenerate NULL") {
    import spark.implicits._
    // treat [10,20,30] vs control [10,10,10]: s²p = 50,
    // MDE = 2.801585·√(50·(1/3+1/3)); diff = 10 < MDE → not powered
    val df = Seq(("g", true, 10L), ("g", true, 20L), ("g", true, 30L),
      ("g", false, 10L), ("g", false, 10L), ("g", false, 10L))
      .toDF("g", "t", "y")
    val r = ops.Evaluation.abPower(df, "g", "t", "y").collect().head
    assert(r.getAs[Long]("n_treat") == 3 && r.getAs[Long]("n_ctrl") == 3)
    assert(r.getAs[Long]("diff_milli") == 10000L)
    def r2(x: Double) = BigDecimal(x)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mde = 2.801585 * math.sqrt(50.0 * (1.0 / 3 + 1.0 / 3))
    assert(r.getAs[Double]("mde_cents") == r2(mde))
    assert(!r.getAs[Boolean]("powered"))
    // a big true effect IS powered at the same spread
    val big = Seq(("g", true, 100L), ("g", true, 110L), ("g", true, 120L),
      ("g", false, 10L), ("g", false, 10L), ("g", false, 20L))
      .toDF("g", "t", "y")
    assert(ops.Evaluation.abPower(big, "g", "t", "y").collect()
      .head.getAs[Boolean]("powered"))
    // single-row arm → NULL fit
    val one = Seq(("g", true, 10L), ("g", false, 1L), ("g", false, 2L))
      .toDF("g", "t", "y")
    val o = ops.Evaluation.abPower(one, "g", "t", "y").collect().head
    assert(o.isNullAt(o.fieldIndex("mde_cents")))
    // EMPTY arm → diff_milli NULL by explicit contract (not an
    // engine DIV-by-zero artifact): all-control group
    val empt = Seq(("g", false, 10L), ("g", false, 20L)).toDF("g", "t", "y")
    val e = ops.Evaluation.abPower(empt, "g", "t", "y").collect().head
    assert(e.getAs[Long]("n_treat") == 0L)
    assert(e.isNullAt(e.fieldIndex("diff_milli")))
    assert(e.isNullAt(e.fieldIndex("mde_cents")))
    // corpus: every segment reports a positive MDE
    val c = ops.Evaluation.abPower(spark, sfDir).collect()
    assert(c.length == 5)
    assert(c.forall(_.getAs[Double]("mde_cents") > 0.0))
  }

  test("wilsonCi: exact edge behavior, driver-model parity, corpus nesting") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val z = 1.959964
    def model(k: Long, n: Long): (Double, Double) = {
      val p = k.toDouble / n
      val half = z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
      val den = 1.0 + z * z / n
      (r6((p + z * z / n / 2.0 - half) / den),
        r6((p + z * z / n / 2.0 + half) / den))
    }
    // k = 0: the lower bound is EXACTLY 0 (numerator cancels), the
    // upper is z²/(n+z²) — the edge Wald collapses on
    val zero = (1 to 10).map(_ => ("a", false)).toDF("g", "h")
    val rz = ops.Evaluation.wilsonCi(zero, "g", "h").collect().head
    assert(rz.getAs[Double]("wilson_lo") == 0.0)
    assert(rz.getAs[Double]("wilson_hi") == model(0, 10)._2)
    // k = n mirrors: upper exactly 1
    val full = (1 to 10).map(_ => ("a", true)).toDF("g", "h")
    val rf = ops.Evaluation.wilsonCi(full, "g", "h").collect().head
    assert(rf.getAs[Double]("wilson_hi") == 1.0)
    assert(rf.getAs[Double]("wilson_lo") == model(10, 10)._1)
    // generic interior case matches the driver model bit for bit
    val mix = ((1 to 3).map(_ => ("a", true)) ++
      (1 to 7).map(_ => ("a", false))).toDF("g", "h")
    val rm = ops.Evaluation.wilsonCi(mix, "g", "h").collect().head
    val (lo, hi) = model(3, 10)
    assert(rm.getAs[Double]("wilson_lo") == lo &&
      rm.getAs[Double]("wilson_hi") == hi)
    // corpus: interval brackets the share, everything in [0, 1]
    val c = ops.Evaluation.wilsonCi(spark, sfDir).collect()
    assert(c.length == 5)
    assert(c.forall { r =>
      val (l, s, h) = (r.getAs[Double]("wilson_lo"),
        r.getAs[Double]("share"), r.getAs[Double]("wilson_hi"))
      l >= 0.0 && l <= s && s <= h && h <= 1.0 })
  }
}
