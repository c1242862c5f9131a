package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence analytics over event streams — the behavioral building
  * blocks next to [[Advanced.funnel]]/[[Advanced.retention]]/
  * [[Advanced.transitions]]: how sessions OPEN (ordered path mining —
  * where [[Advanced.transitions]] counts memoryless pairs, this keeps
  * the first-k ordered prefix) and when a daily series leaves control
  * (EWMA control chart — where [[Advanced.ewma]] is the depth-bounded
  * dyadic smoother per user, this is the UNBOUNDED α=0.2 recurrence
  * over the whole series with an alarm rule). The reference engine
  * (`/root/reference/batch_processor.go:1-194`) carries records
  * opaquely and has none of these; they are part of the north-star
  * analytics surface.
  *
  * Numeric discipline (the [[Mixing.mutualInfo]] family): every
  * probability is an exact integer ratio (ppm via truncating `DIV`),
  * every recurrence runs in integer units both engines replay
  * identically — no double ever accumulates across rows.
  */
object Sequence {

  /** Session gap shared with [[Relational.eventsSessionize]]: a pause
    * longer than this many seconds starts a new session.
    */
  val SessionGapSec = 1800L

  /** Top-20 session-opening paths: each session's first (up to) 3
    * event types joined as `"a>b>c"`, counted across all sessions —
    * the classic "how do journeys start" mining query. Sessions split
    * on the [[SessionGapSec]] gap; event order is (ts, event_id).
    * Ties in the top-20 cut break on the path string, so the cut is
    * reproducible cross-engine.
    *
    * Scale shape: two user-keyed window passes (lag/running-sum reuse
    * ONE exchange; the per-session rank re-keys by (user, session)),
    * then a row-local sorted path assembly and a |paths|-bounded
    * count. Path cardinality is ≤ |types|³ + |types|² + |types| —
    * bounded regardless of corpus size.
    */
  def sessionPaths(spark: SparkSession, dir: String): DataFrame =
    sessionPaths(Tables.events(spark, dir), "user_id", "event_type",
      "ts", "event_id")

  /** DataFrame-first form over any (actor, label, timestamp, tiebreak)
    * frame.
    */
  def sessionPaths(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, idCol: String): DataFrame = {
    val wu = Window.partitionBy(col("u")).orderBy(col("es"), col("eid"))
    val ws = Window.partitionBy(col("u"), col("sess"))
      .orderBy(col("es"), col("eid"))
    val e = events.select(col(userCol).as("u"), col(typeCol).as("t"),
      unix_timestamp(col(tsCol)).as("es"), col(idCol).as("eid"))
    e.withColumn("prev", lag(col("es"), 1).over(wu))
      .withColumn("new_s",
        when(col("prev").isNull ||
          col("es") - col("prev") > SessionGapSec, 1L).otherwise(0L))
      .withColumn("sess", sum(col("new_s")).over(wu))
      .withColumn("rk", row_number().over(ws))
      .filter(col("rk") <= 3)
      .groupBy(col("u"), col("sess"))
      // sort_array on (rk, t) structs orders the collected steps by
      // rank regardless of task arrival order — deterministic path
      .agg(array_join(
        expr("transform(sort_array(collect_list(struct(rk, t))), s -> s.t)"),
        ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(20)
  }

  // Floor-division CASE (not bare `//`): DuckDB truncates toward zero
  // while Spark's unix_timestamp floors — see Relational.scala's epoch
  // comment for the pre-1970 fractional-second divergence this closes.
  val sessionPathsSql: String =
    s"""WITH e AS (
       |  SELECT user_id AS u, event_type AS t,
       |    (CASE WHEN epoch_us(ts) < 0 THEN (epoch_us(ts)+1) // 1000000 - 1 ELSE epoch_us(ts) // 1000000 END) AS es, event_id AS eid
       |  FROM events),
       |g AS (
       |  SELECT u, t, es, eid,
       |    CASE WHEN lag(es) OVER w IS NULL
       |           OR es - lag(es) OVER w > $SessionGapSec
       |         THEN 1 ELSE 0 END AS new_s
       |  FROM e WINDOW w AS (PARTITION BY u ORDER BY es, eid)),
       |s AS (
       |  SELECT u, t, es, eid,
       |    sum(new_s) OVER (PARTITION BY u ORDER BY es, eid
       |                     ROWS UNBOUNDED PRECEDING) AS sess
       |  FROM g),
       |r AS (
       |  SELECT u, sess, t,
       |    row_number() OVER (PARTITION BY u, sess ORDER BY es, eid) AS rk
       |  FROM s),
       |paths AS (
       |  SELECT u, sess, string_agg(t, '>' ORDER BY rk) AS path
       |  FROM r WHERE rk <= 3 GROUP BY u, sess)
       |SELECT path, count(*) AS n_sessions
       |FROM paths GROUP BY path
       |ORDER BY n_sessions DESC, path
       |LIMIT 20""".stripMargin

  /** Length-2 sequential-pattern support (the GSP/SPADE base case):
    * for every ordered event-type pair (a, b), the number of sessions
    * containing a and, STRICTLY LATER in the same session, b — at any
    * distance, which is what separates it from
    * [[Advanced.transitions]]' adjacent-pair matrix. Support is
    * reported in exact basis points of all sessions (`n · 10000 DIV
    * total`), top-30 by (support, a, b) so the cut is reproducible.
    *
    * Scale shape: sessions are capped at their first [[GspMaxEvents]]
    * events (one keyed row_number — a runaway bot session cannot emit
    * quadratic pairs), the ordered-pair expansion is ROW-LOCAL over
    * the per-session prefix array with `array_distinct` applied
    * BEFORE the explode (per-session dedup never shuffles), and the
    * count runs on the |types|²-bounded pair frame.
    */
  def gspPatterns(spark: SparkSession, dir: String): DataFrame =
    gspPatterns(Tables.events(spark, dir), "user_id", "event_type",
      "ts", "event_id")

  /** Per-session event cap for [[gspPatterns]] — bounds the row-local
    * pair expansion at cap·(cap−1)/2 regardless of session length.
    */
  val GspMaxEvents = 50

  /** DataFrame-first form over any (actor, label, timestamp, tiebreak)
    * frame.
    */
  def gspPatterns(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, idCol: String): DataFrame = {
    val wu = Window.partitionBy(col("u")).orderBy(col("es"), col("eid"))
    val ws = Window.partitionBy(col("u"), col("sess"))
      .orderBy(col("es"), col("eid"))
    val e = events.select(col(userCol).as("u"), col(typeCol).as("t"),
      unix_timestamp(col(tsCol)).as("es"), col(idCol).as("eid"))
    val sessions = e
      .withColumn("prev", lag(col("es"), 1).over(wu))
      .withColumn("new_s",
        when(col("prev").isNull ||
          col("es") - col("prev") > SessionGapSec, 1L).otherwise(0L))
      .withColumn("sess", sum(col("new_s")).over(wu))
      .withColumn("rk", row_number().over(ws))
      .filter(col("rk") <= GspMaxEvents)
      .groupBy(col("u"), col("sess"))
      .agg(expr("transform(sort_array(collect_list(struct(rk, t))), s -> s.t)")
        .as("arr"))
    val tot = sessions.agg(count(lit(1)).as("total"))
    sessions
      // size-1 sessions carry no pair but STAY in the support
      // denominator (tot is computed above this filter); the guard
      // also keeps sequence() ascending — sequence(0, -1) descends
      .filter(size(col("arr")) >= 2)
      // i<j ordered pairs, deduped row-locally before the explode
      .select(explode(expr(
        """array_distinct(flatten(transform(
          |  sequence(0, size(arr) - 2),
          |  i -> transform(slice(arr, i + 2, size(arr) - i - 1),
          |       x -> named_struct('a', arr[i], 'b', x)))))""".stripMargin))
        .as("p"))
      .groupBy(col("p.a").as("a_type"), col("p.b").as("b_type"))
      .agg(count(lit(1)).as("n_sessions"))
      .crossJoin(broadcast(tot))
      .select(col("a_type"), col("b_type"), col("n_sessions"),
        expr("n_sessions * 10000 DIV total").as("support_bp"))
      .orderBy(col("n_sessions").desc, col("a_type"), col("b_type"))
      .limit(30)
  }

  val gspPatternsSql: String =
    s"""WITH e AS (
       |  SELECT user_id AS u, event_type AS t,
       |    (CASE WHEN epoch_us(ts) < 0 THEN (epoch_us(ts)+1) // 1000000 - 1 ELSE epoch_us(ts) // 1000000 END) AS es, event_id AS eid
       |  FROM events),
       |g AS (
       |  SELECT u, t, es, eid,
       |    CASE WHEN lag(es) OVER w IS NULL
       |           OR es - lag(es) OVER w > $SessionGapSec
       |         THEN 1 ELSE 0 END AS new_s
       |  FROM e WINDOW w AS (PARTITION BY u ORDER BY es, eid)),
       |s AS (
       |  SELECT u, t, es, eid,
       |    sum(new_s) OVER (PARTITION BY u ORDER BY es, eid
       |                     ROWS UNBOUNDED PRECEDING) AS sess
       |  FROM g),
       |r AS (
       |  SELECT u, sess, t,
       |    row_number() OVER (PARTITION BY u, sess ORDER BY es, eid) AS rk
       |  FROM s QUALIFY rk <= $GspMaxEvents),
       |p AS (
       |  SELECT DISTINCT r1.u, r1.sess, r1.t AS a_type, r2.t AS b_type
       |  FROM r r1 JOIN r r2
       |    ON r1.u = r2.u AND r1.sess = r2.sess AND r1.rk < r2.rk),
       |tot AS (
       |  SELECT count(*) AS total
       |  FROM (SELECT DISTINCT u, sess FROM r))
       |SELECT a_type, b_type, count(*) AS n_sessions,
       |  CAST(count(*) * 10000 // any_value(total) AS BIGINT) AS support_bp
       |FROM p CROSS JOIN tot
       |GROUP BY a_type, b_type
       |ORDER BY n_sessions DESC, a_type, b_type
       |LIMIT 30""".stripMargin

  /** EWMA control chart over the daily order-revenue series, ENTIRELY
    * in integer cents: z_t = ⌊(2·x_t + 8·z_{t−1}) / 10⌋ (α = 0.2,
    * truncating division — Spark `DIV` and DuckDB `//` agree), init
    * z_1 = x_1. A day alarms when its revenue deviates from
    * yesterday's EWMA by more than 25% (`|x_t − z_{t−1}| · 4 >
    * z_{t−1}` — pure integer cross-multiply, no ratio). The recurrence
    * runs as a row-local `aggregate` fold over the |days|-bounded
    * sorted series that ACCUMULATES the full per-day trajectory (the
    * [[Analytics.holtForecast]] fold, extended with an array append
    * per step), so DuckDB replays it as a recursive CTE and
    * hash-matches every row. Gap days are stepped over in calendar
    * order, not zero-filled (the [[Analytics.holtForecast]] rule).
    *
    * Scale posture: the corpus-sized work is ONE keyed day aggregate;
    * the fold runs on a single |days|-bounded row (the PCA/IVF
    * bounded-collect contract). The O(|days|²) array copying of the
    * trajectory append is ~5 MB at a 10-year daily series — bounded
    * by calendar time, not data volume.
    */
  def ewmaChart(spark: SparkSession, dir: String): DataFrame =
    ewmaChart(Tables.orders(spark, dir), "o_orderdate", "o_totalprice")

  /** DataFrame-first form over any (date, amount) frame; needs ≥ 1
    * observed day.
    */
  def ewmaChart(orders: DataFrame, dateCol: String,
                priceCol: String): DataFrame = {
    val fold =
      """aggregate(
        |  slice(a, 2, greatest(size(a) - 1, 0)),
        |  named_struct(
        |    'z', a[0].x,
        |    'out', array(named_struct(
        |      'd', a[0].d, 'x', a[0].x, 'z', a[0].x, 'alarm', false))),
        |  (acc, r) -> named_struct(
        |    'z', (2 * r.x + 8 * acc.z) DIV 10,
        |    'out', array_append(acc.out, named_struct(
        |      'd', r.d, 'x', r.x,
        |      'z', (2 * r.x + 8 * acc.z) DIV 10,
        |      'alarm', abs(r.x - acc.z) * 4 > acc.z))))""".stripMargin
    orders
      .select(to_date(col(dateCol)).as("d"),
        round(col(priceCol) * 100).cast("long").as("pc"))
      .groupBy(col("d")).agg(sum(col("pc")).as("x"))
      .agg(sort_array(collect_list(struct(col("d"), col("x")))).as("a"))
      .select(expr(fold).as("st"))
      .select(explode(col("st.out")).as("r"))
      .select(col("r.d").as("day"), col("r.x").as("revenue_cents"),
        col("r.z").as("ewma_cents"), col("r.alarm").as("alarm"))
      .orderBy(col("day"))
  }

  /** DuckDB twin: the identical integer recurrence as a recursive CTE
    * over the row-numbered day series.
    */
  val ewmaChartSql: String =
    """WITH RECURSIVE daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
      |  FROM orders GROUP BY 1),
      |nd AS (
      |  SELECT d, x, row_number() OVER (ORDER BY d) AS rn FROM daily),
      |r AS (
      |  SELECT rn, d, x, x AS z, FALSE AS alarm FROM nd WHERE rn = 1
      |  UNION ALL
      |  SELECT nd.rn, nd.d, nd.x,
      |    CAST((2 * nd.x + 8 * r.z) // 10 AS BIGINT),
      |    abs(nd.x - r.z) * 4 > r.z
      |  FROM nd JOIN r ON nd.rn = r.rn + 1)
      |SELECT d AS day, x AS revenue_cents, z AS ewma_cents, alarm
      |FROM r ORDER BY day""".stripMargin
}
