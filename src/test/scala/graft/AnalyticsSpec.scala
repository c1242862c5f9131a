package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants + plan contracts for the decision-support analytics
  * queries (value correctness is covered by the DuckDB oracle gate).
  */
class AnalyticsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("market share: share = europe/total, bounded to [0,1], one row per year") {
    val df = ops.Analytics.marketShare(spark, sfDir).cache()
    assert(df.count() > 0)
    assert(df.select(countDistinct("o_year")).head().getLong(0) == df.count())
    assert(df.filter(col("europe_cents") < 0 ||
      col("europe_cents") > col("total_cents")).count() == 0)
    val drift = df.filter(
      abs(col("mkt_share") -
        col("europe_cents").cast("double") / col("total_cents")) > 1e-6)
    assert(drift.count() == 0)
  }

  test("product profit: only widget parts contribute; line counts recount") {
    val df = ops.Analytics.productProfit(spark, sfDir).cache()
    assert(df.count() > 0)
    // independent recount of the group sizes through a different join order
    val expected = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sfDir), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .filter(col("p_name").contains("widget"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .count()
    val mismatch = df.join(expected, Seq("nation", "o_year"), "full_outer")
      .filter(col("n_lines").isNull || col("count").isNull ||
        col("n_lines") =!= col("count"))
    assert(mismatch.count() == 0)
  }

  test("returned items: top-20 cut is sorted, deterministic, and heap-shaped") {
    val df = ops.Analytics.returnedItems(spark, sfDir)
    val rows = df.collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val rev = rows.map(_.getAs[Long]("revenue_cents"))
    assert(rev.zip(rev.tail).forall { case (a, b) => a >= b }, "not sorted desc")
    val plan = formatted(df)
    assert(plan.contains("TakeOrderedAndProject"), s"top-k shape lost:\n$plan")
    assert(plan.contains("EqualTo(l_returnflag,R)") || plan.contains("l_returnflag"),
      s"returnflag filter not near the scan:\n$plan")
  }

  test("order priority: semi-join never fans out; counts recount via distinct-join") {
    val df = ops.Analytics.orderPriority(spark, sfDir).cache()
    assert(df.count() > 0)
    // independent derivation: inner join + distinct order keys
    val expected = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      .join(Tables.lineitem(spark, sfDir).filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .select("o_orderkey", "o_orderpriority").distinct()
      .groupBy("o_orderpriority").count()
    val bad = df.join(expected, Seq("o_orderpriority"), "full_outer")
      .filter(col("order_count").isNull || col("count").isNull ||
        col("order_count") =!= col("count"))
    assert(bad.count() == 0, "semi-join fanned out or dropped orders")
  }

  test("revenue forecast: every band predicate reaches the parquet scan") {
    val df = ops.Analytics.revenueForecast(spark, sfDir)
    val plan = formatted(df)
    Seq("l_shipdate", "l_discount", "l_quantity").foreach { c =>
      assert(plan.contains(s"IsNotNull($c)") || plan.contains(s"($c"),
        s"$c filter not pushed:\n$plan")
    }
    assert(plan.contains("PushedFilters: ["), s"no pushdown at all:\n$plan")
    assert(!plan.contains("PushedFilters: []"), s"empty pushdown:\n$plan")
    assert(df.count() == 1)
  }

  test("customer distribution: masses conserve — customers and orders both add up") {
    val df = ops.Analytics.custDistribution(spark, sfDir).cache()
    val customers = Tables.customer(spark, sfDir).count()
    val orders = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"),
        "left_semi").count()
    assert(df.agg(sum("custdist")).head().getLong(0) == customers,
      "every customer must land in exactly one bucket")
    assert(df.agg(sum(col("c_count") * col("custdist"))).head().getLong(0) == orders,
      "bucket-weighted counts must equal the total joined-order count")
  }

  test("analytics joins broadcast dims and never plan a cartesian/NLJ") {
    Seq(
      ops.Analytics.marketShare(spark, sfDir),
      ops.Analytics.productProfit(spark, sfDir),
      ops.Analytics.returnedItems(spark, sfDir)).foreach { df =>
      val plan = formatted(df)
      assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop join:\n$plan")
      assert(plan.contains("BroadcastHashJoin"), s"no dim broadcast:\n$plan")
    }
  }
}
