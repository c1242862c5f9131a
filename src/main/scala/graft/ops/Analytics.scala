package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decision-support analytics queries (SURVEY.md §7.3): the TPC-H
  * market-share / profit / returned-item shapes the round-4 relational
  * surface did not yet cover. Like the rest of [[Relational]], the
  * reference (`/root/reference/batch_processor.go:1-194`) supplies no
  * relational operators — these implement the driver north star over
  * the test tables, pure DataFrame API.
  *
  * Scale posture (100 TB): region/nation dims are explicitly broadcast;
  * part and supplier join the fact on their keys (shuffled equi-joins —
  * part is NOT broadcast: at TPC-H scale it is 200M rows/SF, far past
  * broadcastable, and AQE may still downgrade to broadcast at toy
  * scale); fact⋈fact (lineitem⋈orders) shuffles on the order key; all
  * money aggregates sum exact integer CENTS (each row rounds
  * deterministically; the BIGINT sum is order-independent), and ratios
  * divide the two exact sums at the very end.
  */
object Analytics {

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  /** Market share (TPC-H Q8 shape): within the ASIA customer market,
    * the share of revenue supplied from the EUROPE region, by order
    * year. Share-by-supplier-REGION rather than Q8's single nation so
    * the result is non-empty at every scale factor (the smallest corpus
    * covers 10 of 25 nations; regions are always complete). The share
    * divides two exact BIGINT cent-sums, so it is reproducible
    * cross-engine to the last double bit.
    */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val nr = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir), col("n_regionkey") === col("r_regionkey"))
    val suppNat = nr.select(col("n_nationkey").as("s_nk"), col("r_name").as("supp_region"))
    val custNat = nr.filter(col("r_name") === "ASIA")
      .select(col("n_nationkey").as("c_nk"))
    val vol = cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
    Tables.lineitem(spark, dir)
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNat), col("s_nationkey") === col("s_nk"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNat), col("c_nationkey") === col("c_nk"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(vol).as("total_cents"),
        sum(when(col("supp_region") === "EUROPE", vol).otherwise(lit(0L)))
          .as("europe_cents"))
      .withColumn("mkt_share",
        round(col("europe_cents").cast("double") / col("total_cents"), 6))
      .orderBy(col("o_year"))
  }

  val marketShareSql: String =
    """WITH t AS (
      |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |    CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS vol,
      |    r1.r_name AS supp_region
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      |  WHERE r2.r_name = 'ASIA'),
      |a AS (
      |  SELECT o_year, CAST(sum(vol) AS BIGINT) AS total_cents,
      |    CAST(sum(CASE WHEN supp_region = 'EUROPE' THEN vol ELSE 0 END) AS BIGINT)
      |      AS europe_cents
      |  FROM t GROUP BY o_year)
      |SELECT o_year, total_cents, europe_cents,
      |  round(CAST(europe_cents AS DOUBLE) / total_cents, 6) AS mkt_share
      |FROM a ORDER BY o_year""".stripMargin

  /** Product-type profit (TPC-H Q9 shape): profit by supplier nation ×
    * order year over 'widget' parts. The test tables carry no partsupp,
    * so supply cost is proxied as 60% of `p_retailprice` — the shape
    * (4-way fact⋈dim join tree under a two-key rollup) is what's being
    * exercised, per-row profit rounds to exact cents before the sum.
    */
  def productProfit(spark: SparkSession, dir: String): DataFrame = {
    val profit = cents(
      col("l_extendedprice") * (lit(1) - col("l_discount")) -
        col("p_retailprice") * lit(0.6) * col("l_quantity"))
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).filter(col("p_name").contains("widget")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(profit).as("profit_cents"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("nation"), col("o_year"))
  }

  val productProfitSql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
      |  CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)
      |    - p_retailprice * 0.6 * l_quantity) * 100) AS BIGINT)) AS BIGINT)
      |    AS profit_cents,
      |  CAST(count(*) AS BIGINT) AS n_lines
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1, 2
      |ORDER BY nation, o_year""".stripMargin

  /** Returned-item report (TPC-H Q10 shape): the 20 customers with the
    * highest revenue lost to returns in 1996. Filter pushes to the scan
    * (`l_returnflag = 'R'`, the order-date year band), the per-customer
    * aggregate is partial+final, and the top-20 runs as
    * `TakeOrderedAndProject` — a per-partition heap, never a global
    * sort. Tie-broken on the customer key so the cut is deterministic.
    */
  def returnedItems(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"), col("c_acctbal"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("c_custkey"))
      .limit(20)

  /** Order-priority check (TPC-H Q4 shape): order counts per priority
    * over a half-year window, restricted to orders with at least one
    * returned line — the EXISTS is a LEFT-SEMI join (first match wins,
    * no fan-out, no distinct needed), planned as a hash semi-join on
    * the order key. (Q4's commit<receipt predicate needs columns the
    * test tables don't carry; the returned-line EXISTS exercises the
    * same shape.)
    */
  def orderPriority(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      .join(Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))

  val orderPrioritySql: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Forecast-revenue change (TPC-H Q6 shape): one table, three
    * band predicates, one global sum — the pure pushdown showcase.
    * Every filter must reach the parquet scan (`PushedFilters`) so row
    * groups outside the bands never decompress; at 100 TB this query
    * is I/O-bound on exactly the rows it keeps. The one output row
    * sums exact integer cents.
    */
  def revenueForecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
      .agg(
        sum(cents(col("l_extendedprice") * col("l_discount"))).as("revenue_cents"),
        count(lit(1)).as("n_lines"))

  val revenueForecastSql: String =
    """SELECT
      |  CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT)
      |    AS revenue_cents,
      |  CAST(count(*) AS BIGINT) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** Customer order-count distribution (TPC-H Q13 shape): how many
    * customers placed exactly k orders, INCLUDING k = 0 — the LEFT
    * join keeps order-less customers, the first aggregate counts
    * orders per customer (counting order keys, not rows, so the
    * no-order row counts 0), the second histograms the counts. Both
    * aggregates are partial+final; output is bounded by the maximum
    * order count per customer.
    */
  def custDistribution(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  val custDistributionSql: String =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM (
      |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey) t
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  val returnedItemsSql: String =
    """SELECT c_custkey, c_name, n_name, c_acctbal,
      |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
      |    AS BIGINT) AS revenue_cents
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY c_custkey, c_name, n_name, c_acctbal
      |ORDER BY revenue_cents DESC, c_custkey
      |LIMIT 20""".stripMargin
}
