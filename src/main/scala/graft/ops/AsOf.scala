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
