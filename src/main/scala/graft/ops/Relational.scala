package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query surface (SURVEY.md §7.3).
  *
  * The reference (`/root/reference/batch_processor.go:1-194`) is a
  * data-agnostic batch framework with no relational operators; the
  * relational capability here implements the driver north star over the
  * TPC-H-ish test tables. Every query is pure DataFrame API — Catalyst
  * does predicate pushdown, column pruning, join selection and AQE
  * re-planning; nothing here hand-schedules what the optimizer owns.
  *
  * Scale posture (100 TB): dimension tables (region/nation) are
  * explicitly broadcast; fact-fact joins shuffle on their join keys and
  * rely on AQE for skew; all aggregates are partial (map-side combine)
  * by construction of `groupBy().agg()`; no `collect()` anywhere.
  *
  * Determinism: every query sorts its output on a unique key and rounds
  * double aggregates, so the driver's DuckDB hash-compare is stable.
  */
object Relational {

  /** Pricing summary (TPC-H Q1 shape): scan → filter → hash-agg → sort.
    * Filter pushes to the parquet scan; aggregation is partial+final.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_extendedprice")), 2).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 2) AS avg_qty,
      |  round(avg(l_extendedprice), 2) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
