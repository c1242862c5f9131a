package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-data contracts for the sequence analytics ops beyond the
  * DuckDB oracle: session-path assembly order, gap splitting, the
  * EWMA integer recurrence traced by hand, and the alarm rule's exact
  * boundary.
  */
class SequenceSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("sessionPaths: gap splits sessions, paths keep event order, ties break on event_id") {
    import spark.implicits._
    // user 1: one session view>click>purchase + a 4th event (dropped by
    // rk<=3), then a gap > 1800 s starts a second session "view"
    // user 2: two simultaneous events — event_id order decides the path
    val events = Seq(
      (1L, 1L, "view", 1000L), (2L, 1L, "click", 1100L),
      (3L, 1L, "purchase", 1200L), (4L, 1L, "view", 1300L),
      (5L, 1L, "view", 1300L + 1801L + 1300L),
      (6L, 2L, "click", 5000L), (7L, 2L, "view", 5000L)
    ).map { case (eid, u, t, s) => (eid, u, t, ts(s)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = ops.Sequence
      .sessionPaths(events, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("view>click>purchase" -> 1L, "view" -> 1L,
      "click>view" -> 1L), s"paths wrong: $got")
  }

  test("sessionPaths: adjacent-at-exactly-gap events stay in one session") {
    import spark.implicits._
    // gap of exactly 1800 s does NOT split (the eventsSessionize rule:
    // only > 1800 starts a new session)
    val events = Seq(
      (1L, 9L, "view", 0L), (2L, 9L, "click", 1800L),
      (3L, 9L, "view", 1800L + 1801L))
      .map { case (eid, u, t, s) => (eid, u, t, ts(s)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = ops.Sequence
      .sessionPaths(events, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("view>click" -> 1L, "view" -> 1L),
      s"boundary-gap handling wrong: $got")
  }

  test("gspPatterns: non-adjacent pairs count, per-session dedup, singletons only dilute support") {
    import spark.implicits._
    // user 1 session: view, click, view, purchase
    //   ordered pairs (distinct): view>click, view>view, view>purchase,
    //   click>view, click>purchase — view>purchase holds even though
    //   never adjacent (the GSP semantics transitions cannot see);
    //   duplicate (view, purchase) from both views counts ONCE
    // user 2: singleton session — no pairs, but total = 2 sessions
    val events = Seq(
      (1L, 1L, "view", 1000L), (2L, 1L, "click", 1100L),
      (3L, 1L, "view", 1200L), (4L, 1L, "purchase", 1300L),
      (5L, 2L, "view", 1000L))
      .map { case (eid, u, t, s) => (eid, u, t, ts(s)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = ops.Sequence
      .gspPatterns(events, "user_id", "event_type", "ts", "event_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == Set(("view", "click"), ("view", "view"),
      ("view", "purchase"), ("click", "view"), ("click", "purchase")),
      s"pair set wrong: $got")
    // every pattern appears in 1 of 2 sessions → 5000 bp
    assert(got.values.forall(_ == ((1L, 5000L))), s"support wrong: $got")
  }

  test("ewmaChart: hand-traced integer recurrence with truncation and the exact alarm boundary") {
    import spark.implicits._
    // days with cents 1000, 1247, 600, 2000:
    //   z1 = 1000
    //   z2 = (2·1247 + 8·1000) DIV 10 = 10494 DIV 10 = 1049
    //        |1247−1000|·4 = 988  ≤ 1000        → no alarm
    //   z3 = (2·600 + 8·1049) DIV 10 = 9592 DIV 10 = 959
    //        |600−1049|·4 = 1796 > 1049          → alarm
    //   z4 = (2·2000 + 8·959) DIV 10 = 11672 DIV 10 = 1167
    //        |2000−959|·4 = 4164 > 959           → alarm
    val orders = Seq(
      ("2024-01-01", 10.00), ("2024-01-02", 12.47),
      ("2024-01-03", 6.00), ("2024-01-05", 20.00) // day 4 is a gap: skipped
    ).toDF("d", "price").select(col("d").cast("date").as("d"), col("price"))
    val got = ops.Sequence.ewmaChart(orders, "d", "price").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 1000L, 1000L, false),
      ("2024-01-02", 1247L, 1049L, false),
      ("2024-01-03", 600L, 959L, true),
      ("2024-01-05", 2000L, 1167L, true)), s"trace wrong: ${got.toSeq}")
  }

  test("ewmaChart: alarm fires only strictly past the 25% boundary") {
    import spark.implicits._
    // z1 = 1000; |1250−1000|·4 = 1000 = z1 → NOT an alarm (strict >);
    // third day |1300−1050|·4 = 1000 ≤ 1050? 250·4=1000 < 1050 → no
    // alarm; fourth day drops to 700: z3=(2·1300+8·1050) DIV 10 = 1100,
    // |700−1100|·4 = 1600 > 1100 → alarm
    val orders = Seq(
      ("2024-02-01", 10.00), ("2024-02-02", 12.50),
      ("2024-02-03", 13.00), ("2024-02-04", 7.00))
      .toDF("d", "price").select(col("d").cast("date").as("d"), col("price"))
    val got = ops.Sequence.ewmaChart(orders, "d", "price").collect()
      .map(r => r.getBoolean(3)).toSeq
    assert(got == Seq(false, false, false, true), s"alarm rule wrong: $got")
  }

  test("ewmaChart on the corpus: one row per order day, EWMA within the series' range") {
    val orders = Tables.orders(spark, sfDir)
    val nDays = orders.select(to_date(col("o_orderdate"))).distinct().count()
    val rows = ops.Sequence.ewmaChart(spark, sfDir).collect()
    assert(rows.length == nDays, "one row per observed day expected")
    val (lo, hi) = (rows.map(_.getLong(1)).min, rows.map(_.getLong(1)).max)
    assert(rows.forall(r => r.getLong(2) >= lo && r.getLong(2) <= hi),
      "EWMA left the observed revenue range — recurrence broken")
  }

  test("pageHinkley: hand-traced drawup, alarm crossing, decrease stays 0") {
    import spark.implicits._
    // cents: 4×100_00 then 3×200_00.
    // t5: sx=600_00 mean=120_00 inc=80_00 u=80_00 ph=80_00 (400<600 no)
    // t6: mean=800_00 DIV 6=133_33 inc=66_67 u=146_67 ph=146_67
    //     (733_35 ≤ 800_00 no)
    // t7: mean=1000_00 DIV 7=142_85 inc=57_15 u=203_82 ph=203_82
    //     (1019_10 > 1000_00 → alarm)
    val up = Seq("01" -> 100.0, "02" -> 100.0, "03" -> 100.0,
      "04" -> 100.0, "05" -> 200.0, "06" -> 200.0, "07" -> 200.0)
      .map { case (d, p) => (s"2024-03-$d", p) }.toDF("d", "p")
      .select(col("d").cast("date").as("d"), col("p"))
    val r = ops.Sequence.pageHinkley(up, "d", "p").collect()
    assert(r.map(_.getAs[Long]("ph_cents")).toSeq ==
      Seq(0L, 0L, 0L, 0L, 8000L, 14667L, 20382L))
    assert(r.map(_.getAs[Boolean]("alarm")).toSeq ==
      Seq(false, false, false, false, false, false, true))
    // a mean DECREASE drives U down; the running min tracks it → PH 0
    val down = Seq("2024-03-01" -> 1.00, "2024-03-02" -> 0.90,
      "2024-03-03" -> 0.80).toDF("d", "p")
      .select(col("d").cast("date").as("d"), col("p"))
    assert(ops.Sequence.pageHinkley(down, "d", "p").collect()
      .forall(_.getAs[Long]("ph_cents") == 0L))
    // corpus: one row per day, PH non-negative everywhere
    val c = ops.Sequence.pageHinkley(spark, sfDir).collect()
    assert(c.forall(_.getAs[Long]("ph_cents") >= 0L))
  }

  test("croston: hand-traced smoothing, first-row NULLs, corpus sparsity") {
    import spark.implicits._
    // demands: d1 q=10, d4 q=20, d10 q=5 (α=0.2 milli recurrences)
    // r2: i=3 z=(40000+20000)/5=12000 p=3000 f=4000
    // r3: i=6 z=(48000+5000)/5=10600 p=(12000+6000)/5=3600
    //     f=10600000 DIV 3600=2944
    val dem = Seq(("2024-03-01", 10L), ("2024-03-04", 20L),
      ("2024-03-10", 5L)).toDF("dd", "q")
      .select(col("dd").cast("date").as("dd"), col("q"))
    val r = ops.Sequence.croston(dem, "dd", "q").collect()
    assert(r.length == 3)
    assert(r(0).isNullAt(r(0).fieldIndex("p_milli")) &&
      r(0).isNullAt(r(0).fieldIndex("forecast_milli")) &&
      r(0).getAs[Long]("z_milli") == 10000L)
    assert(r(1).getAs[Long]("interval_days") == 3L &&
      r(1).getAs[Long]("z_milli") == 12000L &&
      r(1).getAs[Long]("p_milli") == 3000L &&
      r(1).getAs[Long]("forecast_milli") == 4000L)
    assert(r(2).getAs[Long]("interval_days") == 6L &&
      r(2).getAs[Long]("z_milli") == 10600L &&
      r(2).getAs[Long]("p_milli") == 3600L &&
      r(2).getAs[Long]("forecast_milli") == 2944L)
    // corpus: the argmax-part series is genuinely intermittent —
    // fewer demand days than the calendar span, all intervals ≥ 1
    val c = ops.Sequence.croston(spark, sfDir).collect()
    assert(c.length > 1)
    assert(c.drop(1).forall(_.getAs[Long]("interval_days") >= 1L))
    val span = c.last.getAs[java.sql.Date]("demand_day").toLocalDate.toEpochDay -
      c.head.getAs[java.sql.Date]("demand_day").toLocalDate.toEpochDay
    assert(c.length < span, "series is dense — not intermittent")
  }

  private def evs(types: String*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    types.zipWithIndex.map { case (t, i) =>
      (i.toLong, 1L, java.sql.Timestamp.valueOf(f"2024-03-01 00:00:${i}%02d"), t)
    }.toDF("eid", "u", "ts", "etype")
  }

  test("markovStationary: deterministic cycles and absorbing mass, exact") {
    // A↔B period-2 chain: uniform is the exact fixed point of the
    // integer recurrence (masses swap each round, no truncation)
    val cyc = ops.Sequence.markovStationary(evs("A", "B", "A", "B", "A"),
      "eid", "u", "ts", "etype").collect()
    assert(cyc.map(r => (r.getString(0), r.getAs[Long]("pi_e12"))).toSeq ==
      Seq(("A", 500000000000L), ("B", 500000000000L)))
    // A→B, B→B: all mass reaches the absorbing state after round 1
    val abs = ops.Sequence.markovStationary(evs("A", "B", "B", "B"),
      "eid", "u", "ts", "etype").collect()
    assert(abs.map(r => (r.getString(0), r.getAs[Long]("pi_e12"))).toSeq ==
      Seq(("A", 0L), ("B", 1000000000000L)))
    // corpus: mass conservation modulo documented truncation leak
    val c = ops.Sequence.markovStationary(spark, sfDir).collect()
    val tot = c.map(_.getAs[Long]("pi_e12")).sum
    assert(c.length == 5 && tot <= 1000000000000L &&
      tot >= 990000000000L, s"mass leak too large: $tot")
  }

  test("markovStationary: sink-state mass drain is the documented substochastic fold") {
    // A,B,A,B,C — C occurs only as next_type (a SINK): pairs A→B ×2,
    // B→A ×1, B→C ×1 → ppm rows A→B 10⁶, B→A 5·10⁵, B→C 5·10⁵. C has
    // no outgoing row, so its mass drains each round. Pin the shipped
    // values against the exact driver-model recurrence (per-cell
    // truncating DIV then sum — the engine fold verbatim).
    val out = ops.Sequence.markovStationary(evs("A", "B", "A", "B", "C"),
      "eid", "u", "ts", "etype").collect()
    val cells = Seq((1, 2, 1000000L), (2, 1, 500000L), (2, 3, 500000L))
    var pi = Array.fill(3)(1000000000000L / 3)
    for (_ <- 1 to ops.Sequence.MarkovRounds)
      pi = Array.tabulate(3) { j =>
        cells.collect { case (si, di, p) if di == j + 1 =>
          pi(si - 1) * p / 1000000L }.sum
      }
    assert(out.map(r => (r.getString(0), r.getAs[Long]("pi_e12"))).toSeq ==
      Seq(("A", pi(0)), ("B", pi(1)), ("C", pi(2))))
    // the drain is real: total mass is far below the conserved 10¹²
    // (each round ~half of B's mass exits through the sink)
    val drained = pi.sum
    assert(drained < 700000000000L,
      s"sink drain missing: total mass $drained")
  }

  test("entropyRate: exact ln2 chain, zero for deterministic, corpus bound") {
    // A,A,B,B,A → all four cells at exactly 500000 ppm; every cell
    // contributes (2.5e11 · 693147) DIV 1e12 = 173286 micro-nats
    val half = ops.Sequence.entropyRate(evs("A", "A", "B", "B", "A"),
      "eid", "u", "ts", "etype").collect().head
    assert(half.getAs[Long]("h_micro") == 693144L)
    assert(half.getAs[Long]("uniform_micro") == 693147L)
    assert(half.getAs[Long]("ratio_bp") == 9999L)
    // a deterministic cycle is perfectly predictable → exactly 0
    val cyc = ops.Sequence.entropyRate(evs("A", "B", "A", "B"),
      "eid", "u", "ts", "etype").collect().head
    assert(cyc.getAs[Long]("h_micro") == 0L &&
      cyc.getAs[Long]("ratio_bp") == 0L)
    // corpus: 0 ≤ H ≤ uniform ceiling (ratio at most 10000 bp)
    val c = ops.Sequence.entropyRate(spark, sfDir).collect().head
    assert(c.getAs[Long]("n_states") == 5L)
    assert(c.getAs[Long]("h_micro") >= 0L &&
      c.getAs[Long]("ratio_bp") <= 10000L)
  }

  test("sax: hand step word, equal-count segments, degenerate NULL") {
    import spark.implicits._
    // 8 days: four at 0¢, four at 100¢, w = 4 → PAA [0,0,100,100];
    // σ = √((40000−20000)/7) = 53.452, z = ∓0.9354 → word "aadd"
    val step = (1 to 8).map(i =>
      (f"2024-03-$i%02d", if (i <= 4) 0.00 else 1.00))
      .toDF("d", "p").select(col("d").cast("date").as("d"), col("p"))
    val r = ops.Sequence.sax(step, "d", "p", 4).collect()
    assert(r.length == 4)
    assert(r.map(_.getAs[Long]("n_days")).forall(_ == 2L))
    assert(r.map(_.getAs[Long]("paa_milli")).toSeq ==
      Seq(0L, 0L, 100000L, 100000L))
    assert(r.map(_.getAs[String]("symbol")).mkString == "aadd")
    // 9 days at w=4: equal-count map puts the extra day in a
    // deterministic segment ((r·4) DIV 9 → sizes 3,2,2,2)
    val nine = (1 to 9).map(i => (f"2024-03-$i%02d", i.toDouble))
      .toDF("d", "p").select(col("d").cast("date").as("d"), col("p"))
    val n9 = ops.Sequence.sax(nine, "d", "p", 4).collect()
    assert(n9.map(_.getAs[Long]("n_days")).toSeq == Seq(3L, 2L, 2L, 2L))
    // monotone series → monotone word (a…d, never decreasing)
    val syms = n9.map(_.getAs[String]("symbol"))
    assert(syms.toSeq == syms.sorted.toSeq)
    // constant series → zero variance → NULL z and symbol
    val flat = (1 to 4).map(i => (f"2024-03-$i%02d", 5.00))
      .toDF("d", "p").select(col("d").cast("date").as("d"), col("p"))
    val f = ops.Sequence.sax(flat, "d", "p", 2).collect()
    assert(f.forall(_.isNullAt(f.head.fieldIndex("symbol"))))
    // corpus: 16 segments, day counts differ by at most 1 (equal-count
    // law), symbols all in the alphabet
    val c = ops.Sequence.sax(spark, sfDir).collect()
    assert(c.length == 16)
    val counts = c.map(_.getAs[Long]("n_days"))
    assert(counts.max - counts.min <= 1)
    assert(c.forall(r => Set("a", "b", "c", "d")
      .contains(r.getAs[String]("symbol"))))
  }

  test("hurst: hand R/S block, remainder drop, degenerate exclusion") {
    import spark.implicits._
    // one size m=4 over 9 days: two full blocks, the 9th day dropped.
    // block [1,2,3,4]¢: S=10, m·cum−k·S = (−6,−8,−6,0) → R·m = 8,
    // σ_pop = √1.25 → R/S = 2/1.118034 = 1.788854 → 1789 milli.
    // block [4,3,2,1] mirrors to the same R and σ → same R/S.
    val days = (1 to 9).map { i =>
      val v = if (i <= 4) i.toDouble else if (i <= 8) (9 - i).toDouble
        else 99.0
      (f"2024-03-$i%02d", v / 100.0) // cents = v
    }.toDF("d", "p").select(col("d").cast("date").as("d"), col("p"))
    val r = ops.Sequence.hurst(days, "d", "p", Seq(4)).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_blocks") == 2,
      "remainder day must be dropped, full blocks kept")
    assert(r.head.getAs[Long]("mean_rs_milli") == 1789L)
    // a single size cannot support a slope → NULL hurst
    assert(r.head.isNullAt(r.head.fieldIndex("hurst")))
    // constant blocks (σ = 0) are excluded with visibility
    val flat = (1 to 8).map(i => (f"2024-03-$i%02d", 1.00))
      .toDF("d", "p").select(col("d").cast("date").as("d"), col("p"))
    val f = ops.Sequence.hurst(flat, "d", "p", Seq(4)).collect()
    assert(f.isEmpty, "zero-variance blocks must drop the size entirely")
    // corpus: 4 sizes, one shared H in a sane range (R/S estimates
    // live in (0, 1.2) with finite-sample bias), R/S grows with m
    val c = ops.Sequence.hurst(spark, sfDir).collect()
    assert(c.length == 4)
    val h = c.head.getAs[Double]("hurst")
    assert(c.forall(_.getAs[Double]("hurst") == h))
    assert(h > 0.0 && h < 1.2, s"implausible Hurst $h")
    val rsSeq = c.map(_.getAs[Long]("mean_rs_milli"))
    assert(rsSeq.last > rsSeq.head,
      "mean R/S must grow from the smallest to the largest block size")
  }
  test("burstEpisodes: hand-built episodes, gap and quiet-day breaks, peak tie rule") {
    import spark.implicits._
    def ev(t: String, day: Int, n: Int) = (1 to n).map(i =>
      (t, new java.sql.Timestamp(day.toLong * 86400000L + i * 1000L)))
    // t: counts day1..day10 = 10,10,1,_,10,1,1,1,1,1 (day 4 unobserved)
    //   total 36 over 9 active days -> burst iff c*9 > 72 -> c > 8:
    //   days 1,2 chain (episode of 2), day 5 alone (gap at 4 breaks it)
    // u: uniform 2,2,2 -> no bursts, peak = earliest max day
    // v: 5,1,5 then six quiet days -> total 16/9 days, burst iff c*9 > 32:
    //   days 1 and 3 burst but the QUIET day 2 breaks them into 2 episodes
    val rows = ev("t", 1, 10) ++ ev("t", 2, 10) ++ ev("t", 3, 1) ++
      ev("t", 5, 10) ++ (6 to 10).flatMap(d => ev("t", d, 1)) ++
      (1 to 3).flatMap(d => ev("u", d, 2)) ++
      (ev("v", 1, 5) ++ ev("v", 2, 1) ++ ev("v", 3, 5) ++
        (4 to 9).flatMap(d => ev("v", d, 1)))
    val got = ops.Sequence.burstEpisodes(rows.toDF("g", "ts"), "g", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        r.getAs[java.sql.Date](5).toLocalDate.toEpochDay, r.getLong(6)))
      .toSeq
    assert(got == Seq(
      ("t", 9L, 3L, 2L, 2L, 1L, 10L),
      ("u", 3L, 0L, 0L, 0L, 1L, 2L),
      ("v", 9L, 2L, 2L, 1L, 1L, 5L)), s"got $got")
    // corpus: every type reports, invariants hold
    val c = ops.Sequence.burstEpisodes(spark, sfDir).collect()
    assert(c.nonEmpty)
    c.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "burst days exceed active days")
      assert(r.getLong(4) <= r.getLong(2), "longest run exceeds burst days")
      assert((r.getLong(3) == 0) == (r.getLong(2) == 0))
    }
  }

  test("dowSeasonality: Thursday epoch anchor, zero-filled grid, exact integer chi2") {
    import spark.implicits._
    def ev(t: String, day: Int, n: Int) = (1 to n).map(i =>
      (t, new java.sql.Timestamp(day.toLong * 86400000L + i * 1000L)))
    // 1970-01-01 (day 0) was a THURSDAY -> dow (0+4)%7 = 4
    // skew: 6 events on day 0 (Thu), 1 on day 1 (Fri):
    //   T=7, sum n^2 = 37, chi2 = (7*37-49)/7 = 30 exactly -> 30000 milli
    // unif: one event on each of days 0..6 -> every dow once, chi2 = 0
    val rows = ev("skew", 0, 6) ++ ev("skew", 1, 1) ++
      (0 to 6).flatMap(d => ev("unif", d, 1))
    val got = ops.Sequence.dowSeasonality(rows.toDF("g", "ts"), "g", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.length == 14, "grid must zero-fill to 7 rows per type")
    val skew = got.filter(_._1 == "skew")
    assert(skew.map(x => (x._2, x._3, x._4)).toSeq ==
      Seq((0L, 0L, 0L), (1L, 0L, 0L), (2L, 0L, 0L), (3L, 0L, 0L),
        (4L, 6L, 8571L), (5L, 1L, 1428L), (6L, 0L, 0L)))
    assert(skew.forall(_._5 == 30000L), s"chi2 ${skew.head._5}")
    val unif = got.filter(_._1 == "unif")
    assert(unif.forall(x => x._3 == 1L && x._4 == 1428L && x._5 == 0L))
    // corpus: 7 rows per type, shares close at <= 10000 bp, chi2 >= 0
    val c = ops.Sequence.dowSeasonality(spark, sfDir).collect()
    assert(c.length % 7 == 0)
    val byType = c.groupBy(_.getString(0))
    byType.values.foreach { rs =>
      val bp = rs.map(_.getLong(3)).sum
      assert(bp > 9990L && bp <= 10000L, s"shares sum $bp")
      assert(rs.forall(_.getLong(4) >= 0L))
    }
  }

  test("dowSeasonality: pre-1970 timestamps fold to non-negative dow (no dropped cells)") {
    import spark.implicits._
    // 1969-12-31 is epoch day -1: (-1+4)%7 = 3 (Wednesday). A C-style
    // modulo over a deeper negative day would go negative — e.g.
    // 1969-12-25 is day -7, (-7+4) = -3, C-style -3 % 7 = -3, pmod = 4
    // (it was a Thursday). Both events must land in the 0..6 grid and
    // be counted, not dropped by the grid LEFT JOIN.
    val rows = Seq(
      ("old", new java.sql.Timestamp(-1L * 86400000L + 1000L)),
      ("old", new java.sql.Timestamp(-7L * 86400000L + 1000L))
    ).toDF("g", "ts")
    val got = ops.Sequence.dowSeasonality(rows, "g", "ts")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got.keySet == (0L to 6L).toSet, s"grid keys $got")
    assert(got(3L) == 1L && got(4L) == 1L, s"pre-1970 dows wrong: $got")
    assert(got.values.sum == 2L, "a pre-1970 event was dropped")
  }
}
