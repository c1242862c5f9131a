package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row (key, t), attach the right
  * row with the same key and the greatest right-time ≤ t.
  *
  * Spark has no native as-of operator, and the naive formulation —
  * an inequality join + argmax — plans as a broadcast-nested-loop or
  * an O(n·m) sort-merge over the inequality. This implementation
  * composes existing operators into the scalable shape:
  * union both sides, ONE shuffle on the key, a single ordered window
  * pass carrying the last right payload forward (`last(..., ignoreNulls)`
  * over rows preceding), then keep the left rows. Cost: one shuffle +
  * one sort — identical to a regular sort-merge join at 100 TB.
  * Right rows sort before left rows at equal timestamps, giving the
  * inclusive (t_right <= t_left) semantics of DuckDB's ASOF JOIN.
  */
object AsOf {

  /** Generic as-of join.
    *
    * @param left      left (probe) side
    * @param right     right (reference) side; should be unique per
    *                  (key, time) — pre-aggregate if not, or the match
    *                  is nondeterministic
    * @param leftKey/rightKey   equi-join key columns
    * @param leftTime/rightTime event-time columns (same comparable type)
    * @param payload   right-side columns to attach to each left row
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    val lCols = left.columns
    val l = left
      .withColumn("__k", col(leftKey)).withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      // the whole payload travels as ONE nullable struct: the window's
      // ignoreNulls then skips "no right row here" markers but
      // preserves legitimately-NULL payload FIELDS, and all payload
      // columns always come from the SAME matched right row
      .withColumn("__p", lit(null).cast(
        org.apache.spark.sql.types.StructType(payload.map(c => right.schema(c)))))
    val lAll = l.select((lCols.toSeq ++ Seq("__k", "__t", "__side", "__p")).map(col): _*)
    // right rows with a NULL key can never equi-match — drop them up
    // front (SQL join semantics: NULL = NULL is not a match)
    val r = right
      .withColumn("__k", col(rightKey)).withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__p", struct(payload.map(col): _*))
      .filter(col("__k").isNotNull)
      .select(col("__k"), col("__t"), col("__side"), col("__p"))
    val rAll = lCols.foldLeft(r) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lAll.unionByName(rAll)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select((lCols.toSeq.map(col) ++
        payload.map(c => col("__m").getField(c).as(c))): _*)
  }

  /** Range (interval) join: pairs within a time band of each other.
    * The naive inequality join plans as a nested loop (O(n·m)); this
    * buckets both sides by the band width and equi-joins on
    * (key, bucket) — each left row probes its own and both adjacent
    * buckets (any right row within ±width must land in one of them),
    * then the exact band predicate filters. One shuffle on
    * (key, bucket); the bucket explosion is ×3 on the left side only.
    *
    * @param width band half-width in the time unit of leftSec/rightSec
    */
  def rangeJoin(left: DataFrame, right: DataFrame,
                leftKey: String, rightKey: String,
                leftSec: String, rightSec: String,
                width: Long): DataFrame = {
    val l = left.withColumn("__bkt",
      explode(expr(s"sequence(CAST(($leftSec - $width) / $width AS LONG), " +
        s"CAST(($leftSec + $width) / $width AS LONG))")))
    val r = right.withColumn("__bkt",
      expr(s"CAST($rightSec / $width AS LONG)"))
    l.join(r, l(leftKey) === r(rightKey) && l("__bkt") === r("__bkt"))
      .filter(abs(col(leftSec) - col(rightSec)) <= width)
      .drop("__bkt")
  }

  /** Driver query: order activity within ±7 days of each event, for
    * the event's user. Second-granularity arithmetic (floor-to-second
    * commutes with the parquet ns→µs truncation, so the DuckDB oracle
    * is exact); left-join semantics — every event appears, zero-count
    * included.
    */
  def eventOrdersNearby(spark: SparkSession, dir: String): DataFrame = {
    val week = 7L * 24 * 3600
    val events = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_timestamp(col("ts")).as("es"))
    val orders = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), unix_timestamp(col("o_orderdate")).as("os"))
    val matched = rangeJoin(events, orders, "user_id", "o_custkey", "es", "os", week)
      .groupBy(col("event_id")).agg(count(col("o_orderkey")).as("n_orders_7d"))
    events.select(col("event_id"))
      .join(matched, Seq("event_id"), "left")
      .na.fill(0L, Seq("n_orders_7d"))
      .orderBy(col("event_id"))
  }

  val eventOrdersNearbySql: String =
    """SELECT e.event_id, count(o.o_orderkey) AS n_orders_7d
      |FROM events e LEFT JOIN orders o
      |  ON e.user_id = o.o_custkey
      |  AND abs(CAST(epoch(e.ts) AS BIGINT) - CAST(epoch(o.o_orderdate) AS BIGINT)) <= 604800
      |GROUP BY e.event_id
      |ORDER BY e.event_id""".stripMargin

  /** Driver query: each event matched to the user's most recent order
    * at or before the event time. The right side is pre-deduplicated
    * to one row per (custkey, orderdate) so the match is deterministic
    * in both engines.
    */
  def eventOrderAsof(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir).select(col("event_id"), col("user_id"), col("ts"))
    val orders = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("ord_key"))
    asofJoin(events, orders,
      leftKey = "user_id", rightKey = "o_custkey",
      leftTime = "ts", rightTime = "o_orderdate",
      payload = Seq("ord_key", "o_orderdate"))
      .select(col("event_id"), col("user_id"), col("ord_key"),
        col("o_orderdate").cast("date").as("ord_date"))
      .orderBy(col("event_id"))
  }

  val eventOrderAsofSql: String =
    """WITH o AS (
      |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS ord_key
      |  FROM orders GROUP BY o_custkey, o_orderdate)
      |SELECT e.event_id, e.user_id, o.ord_key,
      |  CAST(o.o_orderdate AS DATE) AS ord_date
      |FROM events e ASOF LEFT JOIN o
      |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      |ORDER BY e.event_id""".stripMargin
}
