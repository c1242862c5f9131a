package graft

import org.scalatest.funsuite.AnyFunSuite

class RanksSpec extends AnyFunSuite {
  import SparkTestSession._

  test("doubledRanks: planted census ranks exactly across bucket boundaries") {
    import spark.implicits._
    // values span two far-apart buckets at width 64; dr = 2·lt+cnt+1
    val census = Seq(("A", 10L, 2L), ("A", 12L, 1L), ("A", 1000000L, 3L))
    val got = ops.Ranks.doubledRanks(census.toDF("g", "v", "cnt"), 64L)
      .collect().map(r => r.getAs[Long]("v") ->
        (r.getAs[Long]("lt"), r.getAs[Long]("dr"))).toMap
    assert(got == Map(10L -> (0L, 3L), 12L -> (2L, 6L), 1000000L -> (3L, 10L)))
    // rank-mass identity: Σ cnt·dr = n(n+1)
    val mass = census.map { case (_, v, c) => c * got(v)._2 }.sum
    assert(mass == 6L * 7L)
  }

  test("doubledRanks: negative values bucket by exact floor, order intact") {
    import spark.implicits._
    val census = Seq(("A", -5L, 1L), ("A", 3L, 1L))
    val got = ops.Ranks.doubledRanks(census.toDF("g", "v", "cnt"), 4L)
      .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("lt")).toMap
    assert(got == Map(-5L -> 0L, 3L -> 1L))
  }

  test("spearman: monotone curve scores exactly ±1; ties hand-checked") {
    import spark.implicits._
    val mono = (1L to 5L).map(i => ("A", i, i * i * i))
    val g1 = ops.Ranks.spearman(mono.toDF("g", "x", "y"), "g", "x", "y", 64L)
      .collect().head
    assert(g1.getAs[Double]("rho") == 1.0)
    val anti = (1L to 5L).map(i => ("A", i, -(i * i * i)))
    val g2 = ops.Ranks.spearman(anti.toDF("g", "x", "y"), "g", "x", "y", 64L)
      .collect().head
    assert(g2.getAs[Double]("rho") == -1.0)
    // tie case: doubled ranks drx=(2,5,5,8), dry=(4,7,7,2) — recompute
    // Pearson on those integers independently on the driver
    val tied = Seq(("A", 1L, 10L), ("A", 2L, 20L), ("A", 2L, 20L),
      ("A", 3L, 5L))
    val got = ops.Ranks.spearman(tied.toDF("g", "x", "y"), "g", "x", "y", 64L)
      .collect().head.getAs[Double]("rho")
    val (dx, dy) = (Seq(2d, 5d, 5d, 8d), Seq(4d, 7d, 7d, 2d))
    val n = 4d
    val (sx, sy) = (dx.sum, dy.sum)
    val (sxx, syy) = (dx.map(v => v * v).sum, dy.map(v => v * v).sum)
    val sxy = dx.zip(dy).map { case (a, b) => a * b }.sum
    val want = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(got == math.rint(want * 1e6) / 1e6)
  }

  test("spearman: an all-tied margin yields NULL, not a zero division") {
    import spark.implicits._
    val flat = Seq(("A", 7L, 1L), ("A", 7L, 2L), ("A", 7L, 3L))
    val r = ops.Ranks.spearman(flat.toDF("g", "x", "y"), "g", "x", "y", 64L)
      .collect().head
    assert(r.isNullAt(r.fieldIndex("rho")))
  }

  test("gini: uniform, degenerate and fully-concentrated cases exact") {
    import spark.implicits._
    // {1,2,3,4} → 0.25; one-customer-takes-all over 4 → (n-1)/n = 0.75;
    // all-equal → 0; single row → NULL
    val df = (Seq(("U", 1L), ("U", 2L), ("U", 3L), ("U", 4L)) ++
      Seq(("C", 100L), ("C", 0L), ("C", 0L), ("C", 0L)) ++
      Seq(("E", 5L), ("E", 5L), ("E", 5L)) ++
      Seq(("S", 9L))).toDF("g", "v")
    val got = ops.Ranks.gini(df, "g", "v", 64L).collect()
      .map(r => r.getAs[String]("nation") ->
        (if (r.isNullAt(r.fieldIndex("gini"))) None
         else Some(r.getAs[Double]("gini")))).toMap
    assert(got("U").contains(0.25))
    assert(got("C").contains(0.75))
    assert(got("E").contains(0.0))
    assert(got("S").isEmpty)
  }

  test("quantileBins: uniform distinct values cut into exact deciles") {
    import spark.implicits._
    val df = (1L to 20L).map(v => ("A", v)).toDF("g", "v")
    val got = ops.Ranks.quantileBins(df, "g", "v", 10, 8L).collect()
      .map(r => (r.getAs[Int]("bin"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("lo_cents"), r.getAs[Long]("hi_cents")))
    assert(got.toSeq ==
      (1 to 10).map(b => (b, 2L, 2L * b - 1, 2L * b)).toSeq)
  }

  test("quantileBins: tie groups land whole in one bin") {
    import spark.implicits._
    // five 7s (lt=0 → bin 1) and five 9s (lt=5 → bin 6): no ntile-style
    // row-position split of a tie group
    val df = (Seq.fill(5)(7L) ++ Seq.fill(5)(9L)).map(("A", _)).toDF("g", "v")
    val got = ops.Ranks.quantileBins(df, "g", "v", 10, 8L).collect()
      .map(r => (r.getAs[Int]("bin"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("lo_cents")))
    assert(got.toSeq == Seq((1, 5L, 7L), (6, 5L, 9L)))
  }

  test("q_quantile_bins: per-segment bins partition the rows, boundaries nest") {
    val rows = ops.Ranks.quantileBins(spark, sfDir).collect()
    val bySeg = rows.groupBy(_.getAs[String]("segment"))
    assert(bySeg.size == 5)
    bySeg.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("bin"))
      // bins ascend with non-overlapping [lo, hi] ranges
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Int]("bin") < b.getAs[Int]("bin"))
          assert(a.getAs[Long]("hi_cents") < b.getAs[Long]("lo_cents"))
        case _ =>
      }
      sorted.foreach(r =>
        assert(r.getAs[Long]("lo_cents") <= r.getAs[Long]("hi_cents")))
    }
  }

  test("lorenz: planted deciles carry exact shares; curve closes at 1e6") {
    import spark.implicits._
    val df = (1L to 20L).map(v => ("A", v)).toDF("g", "v")
    val got = ops.Ranks.lorenz(df, "g", "v", 10, 8L).collect()
      .map(r => (r.getAs[Int]("bin"), r.getAs[Long]("n_customers"),
        r.getAs[Long]("spend_cents"), r.getAs[Long]("share_ppm"),
        r.getAs[Long]("cum_share_ppm")))
    val want = (1 to 10).map { k =>
      val spend = 4L * k - 1 // (2k-1) + 2k
      val cum = k.toLong * (2 * k + 1)
      (k, 2L, spend, spend * 1000000L / 210L, cum * 1000000L / 210L)
    }
    assert(got.toSeq == want)
    assert(got.last._5 == 1000000L) // exact closure, no quantization dust
  }

  test("q_lorenz: curves close at exactly 1e6 and rise monotonically") {
    val rows = ops.Ranks.lorenz(spark, sfDir).collect()
    val byNation = rows.groupBy(_.getAs[String]("nation"))
    assert(byNation.size == 25)
    byNation.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("bin"))
      val cums = sorted.map(_.getAs[Long]("cum_share_ppm"))
      assert(cums.last == 1000000L)
      assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
      // the top decile out-earns the bottom one
      assert(sorted.last.getAs[Long]("share_ppm") >
        sorted.head.getAs[Long]("share_ppm"))
    }
  }

  test("q_spearman: per-segment rows with rho in range") {
    val rows = ops.Ranks.spearman(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orders") > 0)
      val rho = r.getAs[Double]("rho")
      assert(rho >= -1.0 && rho <= 1.0)
    }
  }

  test("q_gini: per-nation rows, coefficient strictly inside [0, 1)") {
    val rows = ops.Ranks.gini(spark, sfDir).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      assert(r.getAs[Long]("total_spend_cents") > 0)
      val g = r.getAs[Double]("gini")
      assert(g >= 0.0 && g < 1.0)
    }
  }

  test("weightedMedian: weight mass moves the statistic where counts cannot") {
    import spark.implicits._
    // values 10,20,30 with weights 1,1,8: half of W=10 is reached at
    // v=30 (cum 2 < 5 before it) — but the UNWEIGHTED median is 20
    val planted = Seq(("a", 10L, 1L), ("a", 20L, 1L), ("a", 30L, 8L))
      .toDF("g", "v", "w")
    val r = ops.Ranks.weightedMedian(planted, "g", "v", "w", 16L)
      .collect()(0)
    assert(r.getAs[Long]("wmedian_cents") == 30L)
    assert(r.getAs[Long]("median_cents") == 20L)
    assert(r.getAs[Long]("total_weight") == 10L)
    // exact half-crossing uses the LOWER convention: weights 1,1 on
    // {10,20} → 2·(0+1) ≥ 2 already at v=10
    val even = Seq(("a", 10L, 1L), ("a", 20L, 1L)).toDF("g", "v", "w")
    val e = ops.Ranks.weightedMedian(even, "g", "v", "w", 16L).collect()(0)
    assert(e.getAs[Long]("wmedian_cents") == 10L)
    // zero/negative weights are excluded, not poison
    val zw = Seq(("a", 10L, 0L), ("a", 20L, 3L), ("a", 5L, -1L))
      .toDF("g", "v", "w")
    val z = ops.Ranks.weightedMedian(zw, "g", "v", "w", 16L).collect()(0)
    assert(z.getAs[Long]("wmedian_cents") == 20L &&
      z.getAs[Long]("n") == 1L)
    // corpus: per-flag rows; weighted and unweighted both inside the
    // observed price range
    val corpus = ops.Ranks.weightedMedian(spark, sfDir).collect()
    assert(corpus.length == 3)
    corpus.foreach { r =>
      assert(r.getAs[Long]("wmedian_cents") > 0 &&
        r.getAs[Long]("median_cents") > 0)
    }
  }

  test("hillTail: hand-computed alpha with boundary ties; all-tied top is NULL") {
    import spark.implicits._
    def alpha(k: Long, lnSum: Double) =
      BigDecimal(k / (math.rint(lnSum * 1e6) / 1e6))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // top-2 of {1,2,4,8}: x(k)=4, Σ = ln(8/4) → α = 2/ln2
    val planted = Seq(("a", 1L), ("a", 2L), ("a", 4L), ("a", 8L))
      .toDF("g", "v")
    val r = ops.Ranks.hillTail(planted, "g", "v", 2L, 16L).collect()(0)
    assert(r.getAs[Long]("xmin_cents") == 4L && r.getAs[Long]("k_eff") == 2L)
    assert(r.getAs[Double]("alpha_hill") == alpha(2, math.log(2)))
    // 3-way tie at the boundary occupies exactly one remaining slot
    val tied = Seq(("a", 10L), ("a", 5L), ("a", 5L), ("a", 5L))
      .toDF("g", "v")
    val t = ops.Ranks.hillTail(tied, "g", "v", 2L, 16L).collect()(0)
    assert(t.getAs[Long]("xmin_cents") == 5L && t.getAs[Long]("k_eff") == 2L)
    assert(t.getAs[Double]("alpha_hill") == alpha(2, math.log(2)))
    // all-tied top block: zero log-sum → NULL, not Infinity
    val flat = Seq(("a", 7L), ("a", 7L), ("a", 7L)).toDF("g", "v")
    val f = ops.Ranks.hillTail(flat, "g", "v", 2L, 16L).collect()(0)
    assert(f.isNullAt(f.fieldIndex("alpha_hill")))
    // a group smaller than k uses everything it has
    val small = Seq(("a", 4L), ("a", 2L)).toDF("g", "v")
    val s = ops.Ranks.hillTail(small, "g", "v", 50L, 16L).collect()(0)
    assert(s.getAs[Long]("k_eff") == 2L)
    // corpus: one row per segment; k_eff = min(k, segment spenders)
    // (the spec SF has < 50 spenders per segment), index positive
    val corpus = ops.Ranks.hillTail(spark, sfDir).collect()
    assert(corpus.length == 5)
    corpus.foreach { r =>
      assert(r.getAs[Long]("k_eff") ==
        math.min(50L, r.getAs[Long]("n")))
      assert(r.getAs[Double]("alpha_hill") > 0)
    }
  }

  test("kruskalWallis: identical groups score 0; clean shift matches the closed form") {
    import spark.implicits._
    // identical distributions → every group's mean rank is the global
    // mean → dev = 0 → H exactly 0
    val same = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 1L), ("b", 2L), ("b", 3L)).toDF("g", "v")
    val s = ops.Ranks.kruskalWallis(same, "g", "v", 4L).collect()
    assert(s.forall(_.getAs[Long]("h_micro") == 0L))
    assert(s.forall(_.getAs[Double]("h_adj") == 0.0))
    // untied clean shift: A={1,2,3} B={11,12,13}, pooled ranks 1..6,
    // doubled rank sums 12 and 30, dev = ∓9;
    // per-group term = 3·81·1e6 DIV (3·6·7) = 1928571 → H_micro 3857142,
    // tie correction 1 → h_adj = round(3.857142, 4)
    val shift = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 11L), ("b", 12L), ("b", 13L)).toDF("g", "v")
    val h = ops.Ranks.kruskalWallis(shift, "g", "v", 4L).collect()
    assert(h.forall(_.getAs[Long]("h_micro") == 3857142L))
    assert(h.forall(_.getAs[Double]("h_adj") == 3.8571))
    assert(h.forall(_.getAs[Long]("df") == 1L))
    assert(h.map(r => (r.getAs[String]("grp"), r.getAs[Long]("r2"))).toSet
      == Set(("a", 12L), ("b", 30L)))
    // all values tied: tie correction denominator collapses → NULL
    val flat = Seq(("a", 5L), ("a", 5L), ("b", 5L)).toDF("g", "v")
    val f = ops.Ranks.kruskalWallis(flat, "g", "v", 4L).collect()
    assert(f.forall(r => r.isNullAt(r.fieldIndex("h_adj"))))
    assert(f.forall(_.getAs[Long]("h_micro") == 0L))
  }

  test("wilcoxonSigned: hand-traced diffs, zero-drop, and sign antisymmetry") {
    import spark.implicits._
    def d(day: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(day).atStartOfDay())
    // mid = day 5; diffs (post−pre): +1 +2 +3 −4, one zero dropped
    // |d| ranks 1..4 doubled → w2_pos = 2+4+6 = 12, w2_neg = 8
    // z = (24 − 20) / (2·√30) = 0.3652
    def frame(flip: Boolean) = Seq(
      ("s1", 0, 100L), ("s1", 10, 101L),
      ("s2", 0, 100L), ("s2", 10, 102L),
      ("s3", 0, 100L), ("s3", 10, 103L),
      ("s4", 0, 104L), ("s4", 10, 100L),
      ("s5", 0, 100L), ("s5", 10, 100L))
      .map { case (k, day, c) => (k, d(day), if (flip) -c else c) }
      .toDF("k", "dt", "cents")
    val r = ops.Ranks.wilcoxonSigned(frame(flip = false),
      "k", "dt", "cents", 4L).collect().head
    assert(r.getAs[Long]("n_pairs") == 4L)
    assert(r.getAs[Long]("n_zero") == 1L)
    assert(r.getAs[Long]("w2_pos") == 12L)
    assert(r.getAs[Long]("w2_neg") == 8L)
    assert(r.getAs[Long]("tie_sum") == 0L)
    assert(r.getAs[Double]("z") ==
      math.rint(4.0 / (2.0 * math.sqrt(30.0)) * 1e4) / 1e4)
    // negating every value mirrors the diffs → z flips sign exactly
    val m = ops.Ranks.wilcoxonSigned(frame(flip = true),
      "k", "dt", "cents", 4L).collect().head
    assert(m.getAs[Long]("w2_pos") == 8L && m.getAs[Long]("w2_neg") == 12L)
    assert(m.getAs[Double]("z") == -r.getAs[Double]("z"))
    // corpus law: doubled rank mass closes — w2_pos + w2_neg = n(n+1)
    val c = ops.Ranks.wilcoxonSigned(spark, sfDir).collect().head
    val n = c.getAs[Long]("n_pairs")
    assert(c.getAs[Long]("w2_pos") + c.getAs[Long]("w2_neg") == n * (n + 1))
  }

  test("tailRisk: exact ceiling rank, boundary-tie occupancy, single row") {
    import spark.implicits._
    // 1..20: m = ⌈0.95·20⌉ = 19 → VaR = 19, tail = {19,20},
    // ES = 19500 milli, share = 390000 DIV 210 = 1857 bp
    val seq20 = (1L to 20L).map(("a", _)).toDF("g", "v")
    val r = ops.Ranks.tailRisk(seq20, "g", "v", 4L).collect().head
    assert(r.getAs[Long]("n") == 20 && r.getAs[Long]("var_cents") == 19L)
    assert(r.getAs[Long]("tail_n") == 2L)
    assert(r.getAs[Long]("es_milli") == 19500L)
    assert(r.getAs[Long]("tail_share_bp") == 1857L)
    // heavy tie crossing the boundary: only k − gt slots of the tie
    // block count (1,2,3 then seven 4s: m = 10, k = 1 → ES = 4 exactly)
    val tied = (Seq(1L, 2L, 3L) ++ Seq.fill(7)(4L)).map(("a", _))
      .toDF("g", "v")
    val t = ops.Ranks.tailRisk(tied, "g", "v", 4L).collect().head
    assert(t.getAs[Long]("var_cents") == 4L &&
      t.getAs[Long]("tail_n") == 1L &&
      t.getAs[Long]("es_milli") == 4000L &&
      t.getAs[Long]("tail_share_bp") == 40000L / 34L)
    // single value: VaR = ES = the value
    val one = Seq(("a", 7L)).toDF("g", "v")
    val o = ops.Ranks.tailRisk(one, "g", "v", 4L).collect().head
    assert(o.getAs[Long]("var_cents") == 7L &&
      o.getAs[Long]("es_milli") == 7000L)
    // corpus: ES ≥ VaR (tail mean can't undercut its own floor),
    // share in (0, 10000), one row per segment
    val corpus = ops.Ranks.tailRisk(spark, sfDir).collect()
    assert(corpus.length == 5)
    assert(corpus.forall(r => r.getAs[Long]("es_milli")
      >= r.getAs[Long]("var_cents") * 1000))
    assert(corpus.forall(r => r.getAs[Long]("tail_share_bp") > 0 &&
      r.getAs[Long]("tail_share_bp") < 10000))
  }

  test("friedman: hand chi2 with and without within-block ties, degenerate") {
    import spark.implicits._
    // two blocks, consistent A<B<C ordering → χ² = 4.0 exactly
    val consistent = Seq((1, "A", 1L), (1, "B", 2L), (1, "C", 3L),
      (2, "A", 10L), (2, "B", 20L), (2, "C", 30L)).toDF("b", "t", "v")
    val r = ops.Ranks.friedman(consistent, "b", "t", "v").collect()
    assert(r.map(x => (x.getString(0), x.getAs[Long]("rank2_sum"))).toSeq ==
      Seq(("A", 4L), ("B", 8L), ("C", 12L)))
    assert(r.forall(_.getAs[Double]("chi2") == 4.0))
    assert(r.forall(_.getAs[Long]("df") == 2L))
    // second block fully tied → its doubled ranks are all k+1 → χ² = 2.0
    val tied = Seq((1, "A", 1L), (1, "B", 2L), (1, "C", 3L),
      (2, "A", 5L), (2, "B", 5L), (2, "C", 5L)).toDF("b", "t", "v")
    assert(ops.Ranks.friedman(tied, "b", "t", "v").collect()
      .head.getAs[Double]("chi2") == 2.0)
    // every block fully tied → no ordering information → NULL
    val flat = Seq((1, "A", 5L), (1, "B", 5L), (2, "A", 7L), (2, "B", 7L))
      .toDF("b", "t", "v")
    val f = ops.Ranks.friedman(flat, "b", "t", "v").collect().head
    assert(f.isNullAt(f.fieldIndex("chi2")))
    // corpus: one row per segment, χ² ≥ 0, doubled rank mass closes —
    // Σ_j R2_j = n·k·(k+1)
    val c = ops.Ranks.friedman(spark, sfDir).collect()
    assert(c.length == 5)
    val n = c.head.getAs[Long]("n_blocks")
    assert(c.map(_.getAs[Long]("rank2_sum")).sum == n * 5 * 6)
  }

  test("theilIndex: equality zero, max-concentration ln n, corpus range") {
    import spark.implicits._
    // perfect equality → exactly 0
    val eq = Seq.fill(4)(("a", 10L)).toDF("g", "v")
    assert(ops.Ranks.theilIndex(eq, "g", "v").collect()
      .head.getAs[Long]("theil_micro") == 0L)
    // one holder of everything: T = ln n (micro-rounded, one DIV)
    // [0,0,0,4]: term = round(4·ln4·1e6) = 5545177 → DIV 4 = 1386294
    val conc = Seq(("a", 0L), ("a", 0L), ("a", 0L), ("a", 4L))
      .toDF("g", "v")
    assert(ops.Ranks.theilIndex(conc, "g", "v").collect()
      .head.getAs[Long]("theil_micro") == 1386294L)
    // corpus: 0 ≤ T ≤ ln(n)·1e6 per nation
    val c = ops.Ranks.theilIndex(spark, sfDir).collect()
    assert(c.nonEmpty)
    assert(c.forall { r =>
      val t = r.getAs[Long]("theil_micro")
      val cap = math.round(math.log(r.getAs[Long]("n").toDouble) * 1e6)
      t >= 0L && t <= cap })
  }

  test("qqDeciles: doubled distribution reads exactly 5000 bp everywhere") {
    import spark.implicits._
    // B is exactly 2× A value-for-value: every decile ratio is 1/2
    val df = ((1L to 10L).map(("A", _)) ++ (1L to 10L).map(i => ("B", 2 * i)))
      .toDF("g", "v")
    val r = ops.Ranks.qqDeciles(df, "g", "v", 4L).collect()
    assert(r.length == 9)
    assert(r.forall(_.getAs[String]("g_a") == "A"))
    r.zipWithIndex.foreach { case (row, i) =>
      val d = i + 1L
      assert(row.getAs[Long]("q_a_cents") == d)
      assert(row.getAs[Long]("q_b_cents") == 2 * d)
      assert(row.getAs[Long]("ratio_bp") == 5000L)
    }
    // corpus: 9 rows, both sides monotone non-decreasing in d
    val c = ops.Ranks.qqDeciles(spark, sfDir).collect()
    assert(c.length == 9)
    val qa = c.map(_.getAs[Long]("q_a_cents"))
    val qb = c.map(_.getAs[Long]("q_b_cents"))
    assert(qa.toSeq == qa.sorted.toSeq && qb.toSeq == qb.sorted.toSeq)
  }
}
