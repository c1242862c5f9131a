package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session-scoped memo of the segment-labeled order fact — the one
  * derived frame a dozen per-segment statistics all start from
  * (orders ⋈ customer on custkey, analysis columns plus exact integer
  * cents). Within one session — or one bench round — the first caller
  * pays the broadcast join + checkpoint; every later per-segment
  * statistic reads the |orders|-row checkpoint instead of re-scanning
  * two parquet tables and re-running the join. The bench clears it
  * once per round (the [[DatasetMemo]] fairness discipline shared
  * with the graph/dedup/similarity memos).
  *
  * Versioning caveat (shared with [[Graph]]'s edge memo): the entry is
  * keyed on the FACT side's file version (orders.parquet); the
  * customer dimension is assumed co-versioned — a rewrite of one
  * without the other is not a state this project's datasets produce.
  */
private[graft] object SegOrders {
  private val memo = new DatasetMemo("orders.parquet")

  /** (o_custkey, g = c_mktsegment, o_orderdate, o_orderpriority,
    * o_orderstatus, cents) — eagerly `localCheckpoint`ed.
    */
  def apply(spark: SparkSession, dir: String): DataFrame =
    memo.getOrCompute(spark, dir)(
      Tables.orders(spark, dir)
        .join(broadcast(Tables.customer(spark, dir)
          .select(col("c_custkey"), col("c_mktsegment").as("g"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_custkey"), col("g"), col("o_orderdate"),
          col("o_orderpriority"), col("o_orderstatus"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
        .localCheckpoint(true))

  /** Release every entry's checkpoint blocks (bench per-round reset). */
  def clear(): Unit = memo.clear()

  /** Retained RDD ids — for the cache-lifecycle contract tests. */
  private[graft] def rddIds(spark: SparkSession, dir: String): Set[Int] =
    memo.rddIds(spark, dir)
}
