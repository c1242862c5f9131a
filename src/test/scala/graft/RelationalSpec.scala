package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all engine specs: local, UTC, AQE on, small
  * shuffle partitioning to match the test scale.
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("every declared query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql keys without queries: $missing")
  }

  test("pricing summary groups are the 4 TPC-H flag/status combos or fewer") {
    val rows = ops.Relational.pricingSummary(spark, sfDir).collect()
    assert(rows.length >= 1 && rows.length <= 8)
    // count_order column must be positive everywhere
    rows.foreach(r => assert(r.getAs[Long]("count_order") > 0))
  }

  test("approx percentiles stay within 5% of the exact values") {
    val exact = ops.Relational.percentiles(spark, sfDir)
      .select("o_orderpriority", "p50", "p95")
    val approx = ops.Relational.approxPercentiles(spark, sfDir)
      .select("o_orderpriority", "p50_approx", "p95_approx")
    val joined = exact.join(approx, "o_orderpriority").collect()
    joined.foreach { r =>
      val (p50, p95) = (r.getAs[Double]("p50"), r.getAs[Double]("p95"))
      val (a50, a95) = (r.getAs[Double]("p50_approx"), r.getAs[Double]("p95_approx"))
      assert(math.abs(a50 - p50) <= 0.05 * p50, s"p50 off: $a50 vs $p50")
      assert(math.abs(a95 - p95) <= 0.05 * p95, s"p95 off: $a95 vs $p95")
    }
  }

  test("top orders returns exactly 10 rows in descending price order") {
    val prices = ops.Relational.topOrders(spark, sfDir)
      .collect().map(_.getAs[Double]("price"))
    assert(prices.length == 10)
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("window rank never exceeds 3 per customer") {
    val df = ops.Relational.windowRank(spark, sfDir)
    assert(df.filter(df("rn") > 3).count() == 0)
    val perCust = df.groupBy("o_custkey").count()
    assert(perCust.filter(perCust("count") > 3).count() == 0)
  }

  test("semi + anti partition the customer table") {
    val df = ops.Relational.semiAnti(spark, sfDir)
    val total = df.agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    val nCust = Tables.customer(spark, sfDir).count()
    assert(total == nCust, "semi+anti counts must sum to |customer|")
  }

  test("setops obey |A∪B| = |A| + |B| − |A∩B| via except") {
    val rows = ops.Relational.setOps(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // except = A − (A∩B): union = except + intersect + (B − A∩B) ≥ except + intersect
    assert(rows("union") >= rows("intersect"))
    assert(rows("union") >= rows("except") + rows("intersect"))
  }

  test("sessionize: n_sessions between 1 and n_events for every user") {
    val bad = ops.Relational.eventsSessionize(spark, sfDir)
      .filter("n_sessions < 1 OR n_sessions > n_events")
    assert(bad.count() == 0)
  }
}
