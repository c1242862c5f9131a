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

  /** Page–Hinkley test (1954) — the cumulative mean-shift monitor ML
    * pipelines run against model-input streams: where [[ewmaChart]]
    * alarms on a SINGLE day's deviation from the smoothed level, PH
    * accumulates every day's excess over the RUNNING MEAN
    * (U_t = Σ x_i − m̄_i, m̄ including x_i, allowance δ = 0,
    * documented) and alarms on the drawup PH_t = U_t − min_{i≤t} U_i
    * — a slow drift no one day makes conspicuous still raises PH.
    *
    * Entirely in integer cents: the running mean is ONE truncating
    * `DIV` per day (Spark `DIV` ≡ DuckDB `//` toward zero — operands
    * here are non-negative), so U, its running minimum and PH stay
    * exact BIGINTs both engines replay identically. The alarm is the
    * scale-invariant integer cross-multiply `PH_t · 5 > Σ_{i≤t} x_i`
    * (PH exceeding 20% of cumulative revenue) — a fixed cent
    * threshold would not survive a corpus scale-up.
    *
    * Scale posture: the corpus-sized work is ONE keyed day aggregate;
    * the recurrence is a row-local `aggregate` fold over the single
    * |days|-bounded sorted row (the [[ewmaChart]] contract), replayed
    * by DuckDB as a recursive CTE — every row hash-matches.
    */
  def pageHinkley(spark: SparkSession, dir: String): DataFrame =
    pageHinkley(Tables.orders(spark, dir), "o_orderdate", "o_totalprice")

  /** DataFrame-first form over any (date, amount) frame; needs ≥ 1
    * observed day. Gap days are stepped over in calendar order, not
    * zero-filled (the [[ewmaChart]] rule).
    */
  def pageHinkley(orders: DataFrame, dateCol: String,
                  priceCol: String): DataFrame = {
    val fold =
      """aggregate(
        |  slice(a, 2, greatest(size(a) - 1, 0)),
        |  named_struct(
        |    't', CAST(1 AS BIGINT), 'sx', a[0].x,
        |    'u', CAST(0 AS BIGINT), 'um', CAST(0 AS BIGINT),
        |    'out', array(named_struct(
        |      'd', a[0].d, 'x', a[0].x, 'u', CAST(0 AS BIGINT),
        |      'ph', CAST(0 AS BIGINT), 'alarm', false))),
        |  (acc, r) -> named_struct(
        |    't', acc.t + 1,
        |    'sx', acc.sx + r.x,
        |    'u', acc.u + r.x - (acc.sx + r.x) DIV (acc.t + 1),
        |    'um', least(acc.um,
        |      acc.u + r.x - (acc.sx + r.x) DIV (acc.t + 1)),
        |    'out', array_append(acc.out, named_struct(
        |      'd', r.d, 'x', r.x,
        |      'u', acc.u + r.x - (acc.sx + r.x) DIV (acc.t + 1),
        |      'ph', (acc.u + r.x - (acc.sx + r.x) DIV (acc.t + 1))
        |        - least(acc.um,
        |            acc.u + r.x - (acc.sx + r.x) DIV (acc.t + 1)),
        |      'alarm', ((acc.u + r.x - (acc.sx + r.x) DIV (acc.t + 1))
        |        - least(acc.um,
        |            acc.u + r.x - (acc.sx + r.x) DIV (acc.t + 1))) * 5
        |        > acc.sx + r.x))))""".stripMargin
    orders
      .select(to_date(col(dateCol)).as("d"),
        round(col(priceCol) * 100).cast("long").as("pc"))
      .groupBy(col("d")).agg(sum(col("pc")).as("x"))
      .agg(sort_array(collect_list(struct(col("d"), col("x")))).as("a"))
      .select(expr(fold).as("st"))
      .select(explode(col("st.out")).as("r"))
      .select(col("r.d").as("day"), col("r.x").as("revenue_cents"),
        col("r.u").as("u_cents"), col("r.ph").as("ph_cents"),
        col("r.alarm").as("alarm"))
      .orderBy(col("day"))
  }

  /** DuckDB twin: the identical integer recurrence as a recursive CTE
    * over the row-numbered day series.
    */
  val pageHinkleySql: String =
    """WITH RECURSIVE daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
      |  FROM orders GROUP BY 1),
      |nd AS (
      |  SELECT d, x, row_number() OVER (ORDER BY d) AS rn FROM daily),
      |r AS (
      |  SELECT rn, d, x, CAST(1 AS BIGINT) AS t, x AS sx,
      |    CAST(0 AS BIGINT) AS u, CAST(0 AS BIGINT) AS um,
      |    CAST(0 AS BIGINT) AS ph, FALSE AS alarm
      |  FROM nd WHERE rn = 1
      |  UNION ALL
      |  SELECT nd.rn, nd.d, nd.x, r.t + 1, r.sx + nd.x,
      |    r.u + nd.x - (r.sx + nd.x) // (r.t + 1),
      |    least(r.um, r.u + nd.x - (r.sx + nd.x) // (r.t + 1)),
      |    (r.u + nd.x - (r.sx + nd.x) // (r.t + 1))
      |      - least(r.um, r.u + nd.x - (r.sx + nd.x) // (r.t + 1)),
      |    ((r.u + nd.x - (r.sx + nd.x) // (r.t + 1))
      |      - least(r.um, r.u + nd.x - (r.sx + nd.x) // (r.t + 1))) * 5
      |      > r.sx + nd.x
      |  FROM nd JOIN r ON nd.rn = r.rn + 1)
      |SELECT d AS day, x AS revenue_cents, u AS u_cents, ph AS ph_cents,
      |  alarm
      |FROM r ORDER BY day""".stripMargin

  /** Croston's method (1972) — the forecaster for INTERMITTENT demand,
    * where [[Analytics.holtForecast]]'s level+trend assumes a dense
    * series: demand size z and inter-demand interval p are smoothed
    * SEPARATELY (α = 0.2 each), only on days demand actually occurs,
    * and the per-period rate forecast is z/p. The shipped series is
    * the daily shipped quantity of the highest-volume part
    * (deterministic argmax: total quantity, min partkey tie-break) —
    * genuinely intermittent at every SF (~40–50 demand days over a
    * ~2500-day span).
    *
    * Entirely in integer milli-units: z_t = ⌊(4z + 1000·q_t)/5⌋,
    * p_t = ⌊(4p + 1000·i_t)/5⌋ (init z₁ = 1000·q₁; p initializes to
    * the FIRST observed interval — the first demand day has no
    * interval, so its p and forecast are NULL, documented), forecast
    * = ⌊1000·z/p⌋ milli-units of demand per day. Truncating `DIV` ≡
    * DuckDB `//` on these non-negative operands.
    *
    * Scale posture: one (part, day) keyed census, a 1-row TakeOrdered
    * argmax broadcast-semi-joined back, then a row-local fold over
    * the single |demand-days|-bounded row (the [[ewmaChart]]
    * contract), replayed by DuckDB as a recursive CTE.
    */
  def croston(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("pk"),
        to_date(col("l_shipdate")).as("dd"),
        round(col("l_quantity")).cast("long").as("q"))
      .groupBy(col("pk"), col("dd")).agg(sum(col("q")).as("q"))
    val top = d.groupBy(col("pk")).agg(sum(col("q")).as("tq"))
      .orderBy(col("tq").desc, col("pk")).limit(1).select(col("pk"))
    croston(d.join(broadcast(top), Seq("pk"), "left_semi"), "dd", "q")
  }

  /** DataFrame-first form over any single-series (day, quantity)
    * demand frame (zero-demand days simply absent); needs ≥ 1 demand
    * day.
    */
  def croston(demand: DataFrame, dayCol: String, qtyCol: String): DataFrame = {
    val fold =
      """aggregate(
        |  slice(a, 2, greatest(size(a) - 1, 0)),
        |  named_struct(
        |    'pd', a[0].dd, 'z', a[0].q * 1000,
        |    'p', CAST(NULL AS BIGINT),
        |    'out', array(named_struct(
        |      'dd', a[0].dd, 'q', a[0].q,
        |      'interval_days', CAST(NULL AS BIGINT),
        |      'z_milli', a[0].q * 1000, 'p_milli', CAST(NULL AS BIGINT),
        |      'forecast_milli', CAST(NULL AS BIGINT)))),
        |  (acc, r) -> named_struct(
        |    'pd', r.dd,
        |    'z', (4 * acc.z + 1000 * r.q) DIV 5,
        |    'p', CASE WHEN acc.p IS NULL
        |      THEN 1000 * CAST(datediff(r.dd, acc.pd) AS BIGINT)
        |      ELSE (4 * acc.p
        |        + 1000 * CAST(datediff(r.dd, acc.pd) AS BIGINT)) DIV 5 END,
        |    'out', array_append(acc.out, named_struct(
        |      'dd', r.dd, 'q', r.q,
        |      'interval_days', CAST(datediff(r.dd, acc.pd) AS BIGINT),
        |      'z_milli', (4 * acc.z + 1000 * r.q) DIV 5,
        |      'p_milli', CASE WHEN acc.p IS NULL
        |        THEN 1000 * CAST(datediff(r.dd, acc.pd) AS BIGINT)
        |        ELSE (4 * acc.p
        |          + 1000 * CAST(datediff(r.dd, acc.pd) AS BIGINT)) DIV 5
        |        END,
        |      'forecast_milli', ((4 * acc.z + 1000 * r.q) DIV 5) * 1000
        |        DIV (CASE WHEN acc.p IS NULL
        |          THEN 1000 * CAST(datediff(r.dd, acc.pd) AS BIGINT)
        |          ELSE (4 * acc.p
        |            + 1000 * CAST(datediff(r.dd, acc.pd) AS BIGINT)) DIV 5
        |          END)))))""".stripMargin
    demand
      .select(col(dayCol).cast("date").as("dd"),
        col(qtyCol).cast("long").as("q"))
      .agg(sort_array(collect_list(struct(col("dd"), col("q")))).as("a"))
      .select(expr(fold).as("st"))
      .select(explode(col("st.out")).as("r"))
      .select(col("r.dd").as("demand_day"), col("r.q").as("qty"),
        col("r.interval_days").as("interval_days"),
        col("r.z_milli").as("z_milli"), col("r.p_milli").as("p_milli"),
        col("r.forecast_milli").as("forecast_milli"))
      .orderBy(col("demand_day"))
  }

  /** DuckDB twin: identical argmax series pick and integer recurrence
    * as a recursive CTE.
    */
  val crostonSql: String =
    """WITH RECURSIVE d AS (
      |  SELECT l_partkey AS pk, CAST(l_shipdate AS DATE) AS dd,
      |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
      |  FROM lineitem GROUP BY 1, 2),
      |top AS (
      |  SELECT pk FROM d GROUP BY pk
      |  ORDER BY sum(q) DESC, pk LIMIT 1),
      |s AS (
      |  SELECT dd, q, row_number() OVER (ORDER BY dd) AS rn
      |  FROM d JOIN top USING (pk)),
      |r AS (
      |  SELECT rn, dd, q, dd AS pd, q * 1000 AS z,
      |    CAST(NULL AS BIGINT) AS p, CAST(NULL AS BIGINT) AS iv,
      |    CAST(NULL AS BIGINT) AS f
      |  FROM s WHERE rn = 1
      |  UNION ALL
      |  SELECT s.rn, s.dd, s.q, s.dd,
      |    (4 * r.z + 1000 * s.q) // 5,
      |    CASE WHEN r.p IS NULL
      |      THEN 1000 * CAST(s.dd - r.pd AS BIGINT)
      |      ELSE (4 * r.p + 1000 * CAST(s.dd - r.pd AS BIGINT)) // 5 END,
      |    CAST(s.dd - r.pd AS BIGINT),
      |    ((4 * r.z + 1000 * s.q) // 5) * 1000
      |      // (CASE WHEN r.p IS NULL
      |        THEN 1000 * CAST(s.dd - r.pd AS BIGINT)
      |        ELSE (4 * r.p + 1000 * CAST(s.dd - r.pd AS BIGINT)) // 5 END)
      |  FROM s JOIN r ON s.rn = r.rn + 1)
      |SELECT dd AS demand_day, q AS qty, iv AS interval_days,
      |  z AS z_milli, p AS p_milli, f AS forecast_milli
      |FROM r ORDER BY demand_day""".stripMargin

  /** Power-iteration rounds for [[markovStationary]] /
    * [[entropyRate]] — 8 is comfortably past mixing for a ≤10-state
    * user-journey chain, and small enough for DuckDB to unroll as
    * chained CTEs (the [[Graph.pageRank]] discipline).
    */
  val MarkovRounds = 8

  /** Single-row (states, m) Markov-chain frame shared by
    * [[markovStationary]] and [[entropyRate]]: `states` the sorted
    * distinct event types (prev ∪ next roles), `m` the transition
    * entries (si, di = 1-based state indices, p = row-normalized
    * probability in exact ppm — `n·10⁶ DIV rowtotal`). Cells whose
    * probability truncates to 0 ppm are DROPPED in both engines
    * (sub-ppm mass, visible degradation documented on the public
    * ops); ppm keeps π·p inside BIGINT at ANY corpus size
    * (π ≤ 10¹², p ≤ 10⁶ → product ≤ 10¹⁸ &lt; 2⁶³). The matrix
    * build's n·10⁶ bounds a single cell's pair count to ≲ 9·10¹² —
    * past that, widen the normalization to DECIMAL(38,0).
    */
  private def markovMatrix(events: DataFrame, idCol: String, keyCol: String,
                           tsCol: String, typeCol: String): DataFrame = {
    val e = events.select(col(idCol).as("eid"), col(keyCol).as("u"),
      col(tsCol).as("ts"), col(typeCol).as("etype"))
    val w = Window.partitionBy(col("u")).orderBy(col("ts"), col("eid"))
    val pairs = e.withColumn("prev_type", lag(col("etype"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("etype").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val out = pairs.groupBy(col("prev_type")).agg(sum(col("n")).as("r"))
    val st = pairs.select(col("prev_type").as("s"))
      .union(pairs.select(col("next_type"))).distinct()
      .agg(sort_array(collect_list(col("s"))).as("states"))
    pairs.join(out, Seq("prev_type"))
      .withColumn("p", expr("n * 1000000 DIV r"))
      .filter(col("p") > 0)
      .crossJoin(broadcast(st))
      .select(col("states"), struct(
        array_position(col("states"), col("prev_type")).as("si"),
        array_position(col("states"), col("next_type")).as("di"),
        col("p")).as("e"))
      .groupBy(col("states")).agg(sort_array(collect_list(col("e"))).as("m"))
  }

  /** The [[MarkovRounds]]-round power-iteration fold: π₀ uniform at
    * 10¹² DIV k, each round π'_j = Σ_i (π_i · p_ij) DIV 10⁶ — pure
    * BIGINT, replayed by DuckDB as [[MarkovRounds]] chained CTEs.
    */
  private val markovFold: String =
    s"""aggregate(
       |  sequence(1, $MarkovRounds),
       |  transform(states, s -> CAST(1000000000000 AS BIGINT)
       |    DIV size(states)),
       |  (pi, it) -> transform(sequence(1, size(states)), j ->
       |    aggregate(filter(m, e -> e.di = j), CAST(0 AS BIGINT),
       |      (acc, e) -> acc
       |        + (element_at(pi, CAST(e.si AS INT)) * e.p) DIV 1000000)))
       |""".stripMargin.trim

  /** Stationary distribution of the user-journey Markov chain — "in
    * equilibrium, what share of journey steps sit at each event
    * type?": the row-normalized transition matrix of
    * [[Advanced.transitions]] taken to its fixed point by
    * [[MarkovRounds]] rounds of power iteration, ENTIRELY in scaled
    * BIGINT (π at 10¹², matrix cells in exact ppm) so DuckDB unrolls
    * the identical recurrence as chained CTEs and every state's mass
    * hash-matches — the [[Graph.pageRank]] discipline on the
    * |types|-bounded chain. States with no surviving incoming cell
    * hold exactly 0; truncation leaks ≤ k ppm of mass per round,
    * deterministic in both engines (no rescale — documented).
    *
    * SINK states — types that occur only as `next_type`, never as
    * `prev_type` (journeys END there) — have no outgoing matrix row,
    * so the iteration is SUBSTOCHASTIC: a sink receives mass from its
    * predecessors each round but its own mass is not passed on, and
    * total mass drains toward the recurrent classes. On corpora with
    * absorbing terminal events the total can fall far below 10¹²;
    * this is the chain's true structure (the journey population is
    * not in equilibrium), identical in both engines, and pinned by a
    * SequenceSpec fixture. Callers wanting a conserved distribution
    * must close the chain first (add a sink→start restart edge in the
    * input frame) rather than expect a hidden renormalization here.
    *
    * Scale posture: corpus work is one user-keyed lag window + one
    * pair census; the iteration itself runs INSIDE one row-local
    * `aggregate` fold on the single |types|²-bounded row — zero jobs
    * per round, unlike the billion-node [[Graph.pageRank]] where the
    * rank frame must stay distributed.
    */
  def markovStationary(spark: SparkSession, dir: String): DataFrame =
    markovStationary(Tables.events(spark, dir), "event_id", "user_id",
      "ts", "event_type")

  /** DataFrame-first form over any (id, key, time, type) frame. */
  def markovStationary(events: DataFrame, idCol: String, keyCol: String,
                       tsCol: String, typeCol: String): DataFrame =
    markovMatrix(events, idCol, keyCol, tsCol, typeCol)
      .select(col("states"), expr(markovFold).as("pi"))
      .select(explode(arrays_zip(col("states"), col("pi"))).as("z"))
      .select(col("z.states").as("state"), col("z.pi").as("pi_e12"),
        expr("z.pi DIV 1000000").as("pi_ppm"))
      .orderBy(col("state"))

  /** Chained-CTE unroll shared by [[markovStationarySql]] and
    * [[entropyRateSql]]: pairs → ppm matrix → p0 (uniform) → p1..p8.
    */
  private val markovCtes: String = {
    val rounds = (1 to MarkovRounds).map { i =>
      s"""p$i AS (
         |  SELECT st.s AS state,
         |    CAST(coalesce(sum((p.v * m.p) // 1000000), 0) AS BIGINT) AS v
         |  FROM st LEFT JOIN m ON m.next_type = st.s
         |  LEFT JOIN p${i - 1} p ON p.state = m.prev_type
         |  GROUP BY st.s)""".stripMargin
    }.mkString(",\n")
    s"""l AS (
       |  SELECT user_id, event_type AS next_type,
       |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |      AS prev_type
       |  FROM events),
       |pairs AS (
       |  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
       |  FROM l WHERE prev_type IS NOT NULL
       |  GROUP BY prev_type, next_type),
       |o AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS r
       |      FROM pairs GROUP BY prev_type),
       |m0 AS (
       |  SELECT prev_type, next_type, (n * 1000000) // r AS p
       |  FROM pairs JOIN o USING (prev_type)),
       |m AS (SELECT * FROM m0 WHERE p > 0),
       |st AS (
       |  SELECT DISTINCT s FROM (
       |    SELECT prev_type AS s FROM pairs
       |    UNION SELECT next_type FROM pairs)),
       |kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM st),
       |p0 AS (
       |  SELECT s AS state, 1000000000000 // k AS v
       |  FROM st CROSS JOIN kk),
       |$rounds""".stripMargin
  }

  /** DuckDB twin of [[markovStationary]]. */
  val markovStationarySql: String =
    s"""WITH $markovCtes
       |SELECT state, v AS pi_e12, v // 1000000 AS pi_ppm
       |FROM p$MarkovRounds ORDER BY state""".stripMargin

  /** Entropy rate of the user-journey Markov chain — "how predictable
    * is the next step, in equilibrium?": H = Σ_ij π_i·p_ij·ln(1/p_ij)
    * with π the [[markovStationary]] fixed point. Each cell's
    * ln(10⁶/p_ppm) is micro-rounded to an integer (the
    * [[Evaluation.psi]] transcendental discipline), the cell mass
    * w = (π_i·p_ij) DIV 10⁶ stays BIGINT, and the per-cell
    * contribution (w·l) DIV 10¹² is an exact integer micro-nat — the
    * cross-cell sum is order-free. Also reports the uniform ceiling
    * ln(k) in micro-nats and the predictability ratio in basis
    * points (H / ln k — 10000 bp = indistinguishable from uniform).
    *
    * Same corpus shape as [[markovStationary]]; the w·l product
    * passes 2⁶³ (10¹²·1.4·10⁷) so it widens to DECIMAL(38,0) /
    * HUGEINT for the one multiply.
    */
  def entropyRate(spark: SparkSession, dir: String): DataFrame =
    entropyRate(Tables.events(spark, dir), "event_id", "user_id",
      "ts", "event_type")

  /** DataFrame-first form over any (id, key, time, type) frame. */
  def entropyRate(events: DataFrame, idCol: String, keyCol: String,
                  tsCol: String, typeCol: String): DataFrame =
    markovMatrix(events, idCol, keyCol, tsCol, typeCol)
      .select(col("states"), col("m"), expr(markovFold).as("pi"))
      .select(size(col("states")).cast("long").as("n_states"),
        explode(col("m")).as("e"), col("pi"))
      .select(col("n_states"),
        expr("CAST((element_at(pi, CAST(e.si AS INT)) * e.p) DIV 1000000" +
          " AS DECIMAL(38,0))").as("w"),
        expr("CAST(round(ln(1000000.0 / CAST(e.p AS DOUBLE)) * 1000000)" +
          " AS BIGINT)").as("lmic"))
      .groupBy(col("n_states"))
      .agg(sum(expr("CAST(w * lmic DIV 1000000000000 AS DECIMAL(38,0))"))
        .cast("long").as("h_micro"))
      .select(col("n_states"), col("h_micro"),
        expr("CAST(round(ln(CAST(n_states AS DOUBLE)) * 1000000) AS BIGINT)")
          .as("uniform_micro"),
        expr("h_micro * 10000 DIV CAST(round(ln(CAST(n_states AS DOUBLE))" +
          " * 1000000) AS BIGINT)").as("ratio_bp"))

  /** DuckDB twin of [[entropyRate]] — same unroll, HUGEINT cell
    * products, micro-rounded logs.
    */
  val entropyRateSql: String =
    s"""WITH $markovCtes,
       |cell AS (
       |  SELECT (SELECT k FROM kk) AS n_states,
       |    (p.v * m.p) // 1000000 AS w,
       |    CAST(round(ln(1000000.0 / CAST(m.p AS DOUBLE)) * 1000000)
       |      AS BIGINT) AS lmic
       |  FROM m JOIN p$MarkovRounds p ON p.state = m.prev_type),
       |h AS (
       |  SELECT n_states,
       |    CAST(sum((CAST(w AS HUGEINT) * lmic) // 1000000000000)
       |      AS BIGINT) AS h_micro
       |  FROM cell GROUP BY n_states)
       |SELECT n_states, h_micro,
       |  CAST(round(ln(CAST(n_states AS DOUBLE)) * 1000000) AS BIGINT)
       |    AS uniform_micro,
       |  h_micro * 10000 // CAST(round(ln(CAST(n_states AS DOUBLE))
       |    * 1000000) AS BIGINT) AS ratio_bp
       |FROM h""".stripMargin

  /** Block sizes for the [[hurst]] R/S ladder — powers of two so the
    * log-log fit's abscissae are exact literals.
    */
  val HurstSizes: Seq[Int] = Seq(16, 32, 64, 128)

  /** Hurst exponent by rescaled-range analysis (Hurst 1951; Mandelbrot
    * & Wallis 1969) of the daily-revenue series — "does the series
    * remember?": H ≈ 0.5 for an uncorrelated walk, &gt; 0.5 for
    * long-memory persistence, &lt; 0.5 for mean reversion. For each
    * block size m in [[HurstSizes]], the series splits into ⌊n/m⌋
    * full blocks (remainder days dropped, documented); each block's
    * R = range of mean-adjusted cumulative deviations and S = its
    * POPULATION σ (the classical convention) give R/S, averaged per
    * size; H is the 4-point log-log OLS slope.
    *
    * Exactness: cumulative deviations ride the integer
    * cross-multiply m·Σ_{i≤k}x − k·S_b (no division), so R·m is an
    * exact integer per block; R/S is ONE shared double micro-rounded
    * to milli BEFORE the per-size average (one truncating DIV); the
    * slope numerator/denominator fold the four (ln m, ln mean-R/S)
    * points micro-rounded to integers — order-free in both engines.
    * Degenerate blocks (σ = 0) are excluded WITH visibility
    * (`n_blocks` counts survivors); a size with no surviving block
    * reports NULL and drops from the fit.
    *
    * Scale posture: corpus work is ONE keyed day aggregate; the ×4
    * size explode, per-block windows and folds all run on the
    * |days|-bounded frame.
    */
  def hurst(spark: SparkSession, dir: String): DataFrame =
    hurst(Tables.orders(spark, dir), "o_orderdate", "o_totalprice",
      HurstSizes)

  /** DataFrame-first form over any (date, amount) frame. */
  def hurst(orders: DataFrame, dateCol: String, priceCol: String,
            sizes: Seq[Int]): DataFrame = {
    require(sizes.nonEmpty && sizes.forall(_ >= 2), s"hurst: $sizes")
    val daily = orders
      .select(to_date(col(dateCol)).as("d"),
        expr(s"CAST(round($priceCol * 100) AS BIGINT)").as("pc"))
      .groupBy(col("d")).agg(sum(col("pc")).as("x"))
      .withColumn("r",
        row_number().over(Window.orderBy(col("d"))).cast("long") - 1)
    val sized = daily.crossJoin(broadcast(
      orders.sparkSession.createDataFrame(
        sizes.map(Tuple1(_))).toDF("m")))
      .withColumn("m", col("m").cast("long"))
      .withColumn("b", expr("r DIV m"))
      .withColumn("k", expr("r % m + 1"))
    val nAll = daily.agg(count(lit(1)).as("n"))
    // keep only FULL blocks: block b is full iff (b+1)·m ≤ n
    val full = sized.crossJoin(broadcast(nAll))
      .filter((col("b") + 1) * col("m") <= col("n"))
    val wB = Window.partitionBy(col("m"), col("b")).orderBy(col("k"))
    val blocks = full
      .withColumn("cum", sum(col("x")).over(wB))
      .groupBy(col("m"), col("b"))
      .agg(sum(col("x")).as("sb"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("ssb"),
        collect_list(struct(col("k"), col("cum"))).as("trace"))
    // R·m = max_k(m·cum_k − k·S) − min_k(m·cum_k − k·S): fold the
    // bounded per-block trace row-locally (k ≤ m ≤ 128)
    val rs = blocks
      .withColumn("rm", expr(
        """aggregate(trace, named_struct(
          |    'mx', CAST(-9223372036854775807 AS BIGINT),
          |    'mn', CAST(9223372036854775807 AS BIGINT)),
          |  (acc, t) -> named_struct(
          |    'mx', greatest(acc.mx, m * t.cum - t.k * sb),
          |    'mn', least(acc.mn, m * t.cum - t.k * sb)),
          |  acc -> acc.mx - acc.mn)""".stripMargin))
      .withColumn("sd", expr(
        "sqrt((CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / m) / m)"))
      .filter(col("sd") > 0)
      .withColumn("rs_milli", expr(
        "CAST(round(CAST(rm AS DOUBLE) / m / sd * 1000) AS BIGINT)"))
    val perSize = rs.groupBy(col("m"))
      .agg(count(lit(1)).as("n_blocks"), sum(col("rs_milli")).as("srs"))
      .withColumn("mean_rs_milli", expr("srs DIV n_blocks"))
      .filter(col("mean_rs_milli") > 0)
      .withColumn("lx", expr(
        "CAST(round(ln(CAST(m AS DOUBLE)) * 1000000) AS BIGINT)"))
      .withColumn("ly", expr(
        "CAST(round(ln(CAST(mean_rs_milli AS DOUBLE) / 1000) * 1000000)" +
          " AS BIGINT)"))
    val fit = perSize.agg(count(lit(1)).as("np"), sum(col("lx")).as("sx"),
      sum(col("ly")).as("sy"),
      sum(expr("CAST(lx AS DECIMAL(38,0)) * ly")).as("sxy"),
      sum(expr("CAST(lx AS DECIMAL(38,0)) * lx")).as("sxx"))
    perSize.crossJoin(broadcast(fit))
      .select(col("m"), col("n_blocks"), col("mean_rs_milli"),
        when(col("np") < 2
            || expr("CAST(np AS DECIMAL(38,0)) * sxx" +
              " - CAST(sx AS DECIMAL(38,0)) * sx") === 0, lit(null))
          .otherwise(round(
            expr("CAST(CAST(np AS DECIMAL(38,0)) * sxy" +
              " - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)")
              / expr("CAST(CAST(np AS DECIMAL(38,0)) * sxx" +
                " - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)"), 4))
          .as("hurst"))
      .orderBy(col("m"))
  }

  /** DuckDB twin of [[hurst]] — same integer cross-multiplied
    * deviations, milli R/S rounding, micro-log fit.
    */
  val hurstSql: String = {
    val sizesList = HurstSizes.mkString(", ")
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS d,
       |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |      AS x
       |  FROM orders GROUP BY 1),
       |rnk AS (
       |  SELECT x, (row_number() OVER (ORDER BY d) - 1) AS r FROM daily),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
       |sized AS (
       |  SELECT x, CAST(m AS BIGINT) AS m, r // m AS b, r % m + 1 AS k
       |  FROM rnk CROSS JOIN (SELECT unnest([$sizesList]) AS m) sz
       |  CROSS JOIN nn
       |  WHERE (r // m + 1) * m <= n),
       |cum AS (
       |  SELECT m, b, k, x,
       |    sum(x) OVER (PARTITION BY m, b ORDER BY k) AS c
       |  FROM sized),
       |blk AS (
       |  SELECT m, b, CAST(sum(x) AS BIGINT) AS sb,
       |    sum(CAST(x AS HUGEINT) * x) AS ssb
       |  FROM cum GROUP BY m, b),
       |dev AS (
       |  SELECT cum.m, cum.b,
       |    cum.m * cum.c - cum.k * blk.sb AS devv
       |  FROM cum JOIN blk ON cum.m = blk.m AND cum.b = blk.b),
       |rng AS (
       |  SELECT m, b, CAST(max(devv) - min(devv) AS BIGINT) AS rm
       |  FROM dev GROUP BY m, b),
       |rs AS (
       |  SELECT blk.m,
       |    CAST(round(CAST(rng.rm AS DOUBLE) / blk.m
       |      / sqrt((CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / blk.m)
       |          / blk.m) * 1000) AS BIGINT) AS rs_milli
       |  FROM blk JOIN rng ON blk.m = rng.m AND blk.b = rng.b
       |  WHERE (CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / blk.m)
       |    / blk.m > 0),
       |per AS (
       |  SELECT m, CAST(count(*) AS BIGINT) AS n_blocks,
       |    CAST(sum(rs_milli) // count(*) AS BIGINT) AS mean_rs_milli
       |  FROM rs GROUP BY m),
       |pl AS (
       |  SELECT *,
       |    CAST(round(ln(CAST(m AS DOUBLE)) * 1000000) AS BIGINT) AS lx,
       |    CAST(round(ln(CAST(mean_rs_milli AS DOUBLE) / 1000) * 1000000)
       |      AS BIGINT) AS ly
       |  FROM per WHERE mean_rs_milli > 0),
       |fit AS (
       |  SELECT CAST(count(*) AS BIGINT) AS np, CAST(sum(lx) AS BIGINT)
       |      AS sx,
       |    CAST(sum(ly) AS BIGINT) AS sy,
       |    sum(CAST(lx AS HUGEINT) * ly) AS sxy,
       |    sum(CAST(lx AS HUGEINT) * lx) AS sxx
       |  FROM pl)
       |SELECT m, n_blocks, mean_rs_milli,
       |  CASE WHEN np < 2
       |      OR CAST(np AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx = 0
       |    THEN NULL
       |    ELSE round(CAST(CAST(np AS HUGEINT) * sxy
       |        - CAST(sx AS HUGEINT) * sy AS DOUBLE)
       |      / CAST(CAST(np AS HUGEINT) * sxx
       |        - CAST(sx AS HUGEINT) * sx AS DOUBLE), 4) END AS hurst
       |FROM pl CROSS JOIN fit
       |ORDER BY m""".stripMargin
  }

  /** PAA segment count for the shipped [[sax]] query. */
  val SaxSegments = 16

  /** Gaussian breakpoints for the fixed 4-symbol SAX alphabet
    * (Lin/Keogh 2003 table) — parsed literals shared by both engines.
    */
  val SaxBreakLo = -0.6745
  val SaxBreakHi = 0.6745

  /** SAX — Symbolic Aggregate approXimation (Lin, Keogh, Lonardi &
    * Chiu 2003) of the daily-revenue series: Piecewise Aggregate
    * Approximation into [[SaxSegments]] equal-count segments, then a
    * fixed 4-symbol alphabet over the z-normalized segment means —
    * the discretization that turns a numeric series into a WORD, the
    * front door to motif mining and symbolic anomaly matching that
    * [[ewmaChart]]-style numeric monitors can't do.
    *
    * Exactness: the day→segment map is the pure-integer
    * (rank·w) DIV n over the calendar-bounded day frame (equal-count
    * segments — boundary days land deterministically); each segment
    * mean is milli-quantized by ONE truncating DIV; z and the symbol
    * cut are ONE shared double expression each off the exact
    * DAY-level moments (normalizing by the series' σ, the standard
    * SAX convention), with the Gaussian breakpoints as parsed
    * literals. NULL z/symbol when the series variance is 0.
    *
    * Scale posture: corpus work is ONE keyed day aggregate; the rank
    * window, PAA fold and symbol map run on the |days|-bounded frame.
    */
  def sax(spark: SparkSession, dir: String): DataFrame =
    sax(Tables.orders(spark, dir), "o_orderdate", "o_totalprice",
      SaxSegments)

  /** DataFrame-first form over any (date, amount) frame; needs ≥ 1
    * observed day and `w` ≤ the day count for non-empty segments.
    */
  def sax(orders: DataFrame, dateCol: String, priceCol: String,
          w: Int): DataFrame = {
    require(w >= 1, s"sax: w=$w")
    val daily = orders
      .select(to_date(col(dateCol)).as("d"),
        expr(s"CAST(round($priceCol * 100) AS BIGINT)").as("pc"))
      .groupBy(col("d")).agg(sum(col("pc")).as("x"))
    val mo = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("ss"))
    val ranked = daily
      .withColumn("r",
        row_number().over(Window.orderBy(col("d"))).cast("long") - 1)
      .crossJoin(broadcast(mo))
      .withColumn("seg", expr(s"r * $w DIV n"))
    ranked.groupBy(col("seg"), col("n"), col("s"), col("ss"))
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("sx"))
      .withColumn("paa_milli", expr(
        "CAST(CAST(sx AS DECIMAL(38,0)) * 1000 DIV n_days AS BIGINT)"))
      .withColumn("sd", expr(
        """CASE WHEN n < 2 THEN NULL ELSE
          |  sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
          |    / (n - 1)) END""".stripMargin))
      .withColumn("z", when(col("sd").isNull || col("sd") <= 0, lit(null))
        .otherwise(round((expr("CAST(sx AS DOUBLE) / n_days")
          - expr("CAST(s AS DOUBLE) / n")) / col("sd"), 6)))
      .select(col("seg").as("seg_idx"), col("n_days"), col("paa_milli"),
        col("z"),
        when(col("z").isNull, lit(null))
          .when(col("z") < SaxBreakLo, lit("a"))
          .when(col("z") < 0.0, lit("b"))
          .when(col("z") < SaxBreakHi, lit("c"))
          .otherwise(lit("d")).as("symbol"))
      .orderBy(col("seg_idx"))
  }

  /** DuckDB twin of [[sax]] — same integer segment map, milli PAA
    * and shared double z/symbol cut.
    */
  val saxSql: String =
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS d,
       |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |      AS x
       |  FROM orders GROUP BY 1),
       |mo AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s,
       |    sum(CAST(x AS HUGEINT) * x) AS ss
       |  FROM daily),
       |r AS (
       |  SELECT x, (row_number() OVER (ORDER BY d) - 1) AS rk
       |  FROM daily),
       |seg AS (
       |  SELECT (rk * $SaxSegments) // n AS seg, n, s, ss,
       |    CAST(count(*) AS BIGINT) AS n_days, CAST(sum(x) AS BIGINT) AS sx
       |  FROM r CROSS JOIN mo
       |  GROUP BY 1, n, s, ss),
       |t AS (
       |  SELECT seg, n_days,
       |    CAST(CAST(sx AS HUGEINT) * 1000 // n_days AS BIGINT)
       |      AS paa_milli,
       |    CASE WHEN n < 2 THEN NULL ELSE
       |      sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
       |        / (n - 1)) END AS sd,
       |    CAST(sx AS DOUBLE) / n_days - CAST(s AS DOUBLE) / n AS dev
       |  FROM seg)
       |SELECT CAST(seg AS BIGINT) AS seg_idx, n_days, paa_milli,
       |  CASE WHEN sd IS NULL OR sd <= 0 THEN NULL
       |    ELSE round(dev / sd, 6) END AS z,
       |  CASE WHEN sd IS NULL OR sd <= 0 THEN NULL
       |    WHEN round(dev / sd, 6) < $SaxBreakLo THEN 'a'
       |    WHEN round(dev / sd, 6) < 0.0 THEN 'b'
       |    WHEN round(dev / sd, 6) < $SaxBreakHi THEN 'c'
       |    ELSE 'd' END AS symbol
       |FROM t ORDER BY seg_idx""".stripMargin

  /** Burst threshold numerator/denominator: a day bursts when its
    * count exceeds [[BurstNum]]/[[BurstDen]] × the type's mean daily
    * count — a RATIO, not a fixed count, so the rule survives a
    * corpus scale-up (the cochranQ lesson).
    */
  val BurstNum = 2L
  val BurstDen = 1L

  /** Burst-episode detection per event type — the EPISODE-structured
    * complement of the point monitors ([[pageHinkley]] drift,
    * [[graft.ops.Advanced.cusum]] level shift,
    * [[graft.ops.Diagnostics]] Poisson over-dispersion): a day BURSTS
    * when its event count strictly exceeds 2× the type's mean daily
    * count over its OWN active days (integer cross-multiply
    * `c·n_days &gt; 2·total` — no rate division anywhere), and
    * consecutive CALENDAR bursting days chain into episodes (a
    * quiet or unobserved day breaks the chain — day numbers are
    * epoch-day integers, so gaps-and-islands on `day − rank` needs no
    * calendar fill). Per type: active days, bursting days, episode
    * count, the longest episode in days, and the peak day (argmax
    * count, earliest-day tie-break) with its count — the trending/
    * incident shape detector (Kleinberg 2002's two-state intuition
    * without the HMM machinery, which would not be oracle-checkable).
    *
    * Scale posture: one (type, day) census off the events scan, a
    * 1-row-per-type totals broadcast back, and all windows keyed by
    * type over the |types|×|days|-bounded daily frame.
    */
  def burstEpisodes(spark: SparkSession, dir: String): DataFrame =
    burstEpisodes(Tables.events(spark, dir), "event_type", "ts")

  /** DataFrame-first form over any (group, timestamp) frame. */
  def burstEpisodes(events: DataFrame, groupCol: String,
                    tsCol: String): DataFrame = {
    val daily = events
      .select(col(groupCol).as("g"),
        datediff(to_date(col(tsCol)), lit("1970-01-01")).as("day"))
      .groupBy(col("g"), col("day")).agg(count(lit(1)).as("c"))
    val tot = daily.groupBy(col("g"))
      .agg(sum(col("c")).as("total"), count(lit(1)).as("n_days"))
    val marked = daily.join(broadcast(tot), Seq("g"))
      .withColumn("burst",
        col("c") * col("n_days") * BurstDen > col("total") * BurstNum)
    val wRank = Window.partitionBy(col("g")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPeak = Window.partitionBy(col("g"))
      .orderBy(col("c").desc, col("day"))
    val runs = marked
      .withColumn("isl", when(col("burst"),
        col("day") - sum(when(col("burst"), 1L).otherwise(0L)).over(wRank)))
      .withColumn("pk", row_number().over(wPeak))
      .groupBy(col("g"), col("isl"))
      .agg(max(col("n_days")).as("n_days"), count(lit(1)).as("cnt"),
        sum(when(col("burst"), 1L).otherwise(0L)).as("burst_days"),
        min(when(col("pk") === 1,
          struct(col("day"), col("c")))).as("peak"))
    runs.groupBy(col("g"))
      .agg(max(col("n_days")).as("n_days"),
        sum(col("burst_days")).as("n_burst_days"),
        sum(when(col("isl").isNotNull, 1L).otherwise(0L)).as("n_episodes"),
        coalesce(max(when(col("isl").isNotNull, col("cnt"))), lit(0L))
          .as("longest_episode_days"),
        min(col("peak")).as("peak"))
      .select(col("g").as("event_type"), col("n_days"), col("n_burst_days"),
        col("n_episodes"), col("longest_episode_days"),
        date_add(lit("1970-01-01").cast("date"), col("peak.day"))
          .as("peak_day"),
        col("peak.c").as("peak_count"))
      .orderBy(col("event_type"))
  }

  /** DuckDB twin of [[burstEpisodes]] — same integer cross-multiplied
    * burst rule and day−rank islands.
    */
  val burstEpisodesSql: String =
    s"""WITH daily AS (
       |  SELECT event_type AS g,
       |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2),
       |tot AS (
       |  SELECT g, CAST(sum(c) AS BIGINT) AS total,
       |    CAST(count(*) AS BIGINT) AS n_days
       |  FROM daily GROUP BY 1),
       |m AS (
       |  SELECT d.g, day, c, n_days,
       |    c * n_days * $BurstDen > total * $BurstNum AS burst
       |  FROM daily d JOIN tot t ON d.g = t.g),
       |lab AS (
       |  SELECT *,
       |    CASE WHEN burst THEN day - sum(CASE WHEN burst THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY g ORDER BY day ROWS UNBOUNDED PRECEDING)
       |    END AS isl,
       |    row_number() OVER (PARTITION BY g ORDER BY c DESC, day) AS pk
       |  FROM m),
       |runs AS (
       |  SELECT g, isl, max(n_days) AS n_days, count(*) AS cnt,
       |    CAST(sum(CASE WHEN burst THEN 1 ELSE 0 END) AS BIGINT)
       |      AS burst_days,
       |    min(CASE WHEN pk = 1 THEN {'day': day, 'c': c} END) AS peak
       |  FROM lab GROUP BY 1, 2)
       |SELECT g AS event_type, CAST(max(n_days) AS BIGINT) AS n_days,
       |  CAST(sum(burst_days) AS BIGINT) AS n_burst_days,
       |  CAST(sum(CASE WHEN isl IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_episodes,
       |  CAST(coalesce(max(CASE WHEN isl IS NOT NULL THEN cnt END), 0)
       |    AS BIGINT) AS longest_episode_days,
       |  DATE '1970-01-01' + CAST((min(peak)).day AS INTEGER) AS peak_day,
       |  CAST((min(peak)).c AS BIGINT) AS peak_count
       |FROM runs GROUP BY g ORDER BY event_type""".stripMargin

  /** Day-of-week seasonality profile per event type — the calendar
    * rhythm [[graft.ops.Diagnostics]]' Poisson dispersion (bursty vs
    * uniform ARRIVALS) and [[graft.ops.Advanced.cusum]] (level SHIFT)
    * both integrate away: 7 zero-filled rows per type with the event
    * share per weekday in exact basis points, plus the uniformity χ²
    * as ONE exact integer ratio — from E = T/7,
    * χ² = Σ(n_i − T/7)²/(T/7) = (7·Σn_i² − T²)/T identically, so
    * `chi2_milli = (7·Σn² − T²)·1000 DIV T` needs no per-cell float
    * division (squares ride DECIMAL(38,0); the BIGINT ceiling falls
    * only past 10¹⁸ events/type). Weekday is PURE ARITHMETIC,
    * `(epoch_day + 4) % 7` (1970-01-01 was a Thursday; 0 = Sunday) —
    * not an engine calendar function, whose week-start conventions
    * differ between engines. Both sides fold to a NON-NEGATIVE
    * residue (Spark `pmod`, SQL `((x % 7) + 7) % 7`) — DuckDB's bare
    * `%` is C-style (sign of dividend), so pre-1970 timestamps would
    * otherwise land on dow −6..−1 and be silently dropped by the
    * grid's LEFT JOIN.
    *
    * Scale posture: one (type, dow) census off the events scan, the
    * 7-row grid fill and totals on |types|-bounded frames.
    */
  def dowSeasonality(spark: SparkSession, dir: String): DataFrame =
    dowSeasonality(Tables.events(spark, dir), "event_type", "ts")

  /** DataFrame-first form over any (group, timestamp) frame. */
  def dowSeasonality(events: DataFrame, groupCol: String,
                     tsCol: String): DataFrame = {
    val cells = events
      .select(col(groupCol).as("g"),
        pmod(datediff(to_date(col(tsCol)), lit("1970-01-01")) + 4, lit(7))
          .cast("long").as("dow"))
      .groupBy(col("g"), col("dow")).agg(count(lit(1)).as("n"))
    val grid = cells.select(col("g")).distinct()
      .crossJoin(broadcast(cells.sparkSession.range(0, 7)
        .toDF("dow")))
    val filled = grid.join(cells, Seq("g", "dow"), "left")
      .na.fill(0L, Seq("n"))
    val tot = filled.groupBy(col("g"))
      .agg(sum(col("n")).as("t"),
        sum(expr("CAST(n AS DECIMAL(38,0)) * n")).as("sn2"))
    filled.join(broadcast(tot), Seq("g"))
      .select(col("g").as("event_type"), col("dow"),
        col("n").as("n_events"),
        expr("n * 10000 DIV t").as("share_bp"),
        expr("CAST((7 * sn2 - CAST(t AS DECIMAL(38,0)) * t) * 1000" +
          " DIV t AS BIGINT)").as("chi2_milli"))
      .orderBy(col("event_type"), col("dow"))
  }

  /** DuckDB twin of [[dowSeasonality]] — same arithmetic weekday,
    * zero-filled grid, integer χ².
    */
  val dowSeasonalitySql: String =
    """WITH cells AS (
      |  SELECT event_type AS g,
      |    (((datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4) % 7)
      |      + 7) % 7
      |      AS dow,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT g, CAST(d AS BIGINT) AS dow
      |  FROM (SELECT DISTINCT g FROM cells),
      |    (SELECT unnest(generate_series(0, 6)) AS d)),
      |filled AS (
      |  SELECT grid.g, grid.dow, coalesce(n, 0) AS n
      |  FROM grid LEFT JOIN cells
      |    ON grid.g = cells.g AND grid.dow = cells.dow),
      |tot AS (
      |  SELECT g, CAST(sum(n) AS BIGINT) AS t,
      |    sum(CAST(n AS HUGEINT) * n) AS sn2
      |  FROM filled GROUP BY 1)
      |SELECT f.g AS event_type, f.dow, CAST(f.n AS BIGINT) AS n_events,
      |  CAST(f.n * 10000 // t AS BIGINT) AS share_bp,
      |  CAST((7 * sn2 - CAST(t AS HUGEINT) * t) * 1000 // t AS BIGINT)
      |    AS chi2_milli
      |FROM filled f JOIN tot ON f.g = tot.g
      |ORDER BY event_type, dow""".stripMargin
}
