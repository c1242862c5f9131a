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
}
