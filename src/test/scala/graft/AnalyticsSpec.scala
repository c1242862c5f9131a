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

  test("ship lag: high+low = all qualifying lines; date band reaches the scan") {
    val df = ops.Analytics.shipLag(spark, sfDir).cache()
    val total = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .filter(datediff(col("l_shipdate"), col("o_orderdate")) > 60)
      .count()
    assert(df.agg(sum(col("high_line_count") + col("low_line_count")))
      .head().getLong(0) == total, "conditional counts must partition the lines")
    val plan = formatted(ops.Analytics.shipLag(spark, sfDir))
    assert(plan.contains("l_shipdate") && plan.contains("PushedFilters: [") &&
      !plan.contains("PushedFilters: []"), s"ship-date band not pushed:\n$plan")
  }

  test("promo share: one row, promo within total, share recomputes") {
    val row = ops.Analytics.promoShare(spark, sfDir).collect() match {
      case Array(r) => r
      case rs       => fail(s"expected 1 row, got ${rs.length}")
    }
    val promo = row.getAs[Long]("promo_cents")
    val total = row.getAs[Long]("total_cents")
    assert(promo >= 0 && promo <= total)
    assert(math.abs(row.getAs[Double]("promo_share_pct") -
      100.0 * promo / total) < 1e-6)
  }

  test("top supplier: keeps every tied max; equals an independent groupBy-max") {
    val df = ops.Analytics.topSupplier(spark, sfDir).cache()
    val rev = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
        .cast("long")).as("tc")).cache()
    val mx = rev.agg(max("tc")).head().getLong(0)
    val winners = rev.filter(col("tc") === mx).count()
    assert(df.count() == winners, "must keep ALL tied maxima")
    assert(df.filter(col("total_cents") =!= mx).count() == 0)
    rev.unpersist()
  }

  test("disjunctive predicate: envelope prefilters don't change the answer") {
    val bands =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 15)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
        col("l_quantity").between(10, 25)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
        col("l_quantity").between(20, 35))
    // the plain OR with NO per-side envelope filters — same answer required
    val plain = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .filter(bands)
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
        .cast("long")).as("revenue_cents"), count(lit(1)).as("n_lines"))
      .head()
    val got = ops.Analytics.disjunctivePred(spark, sfDir).head()
    assert(got.getAs[Long]("revenue_cents") == plain.getAs[Long]("revenue_cents"))
    assert(got.getAs[Long]("n_lines") == plain.getAs[Long]("n_lines"))
    val plan = formatted(ops.Analytics.disjunctivePred(spark, sfDir))
    assert(plan.contains("PushedFilters: [") && !plan.contains("PushedFilters: []"),
      s"envelope filters must reach the scans:\n$plan")
  }

  test("small-qty revenue: correlated avg decorrelates; equals explicit join form") {
    val df = ops.Analytics.smallQtyRevenue(spark, sfDir)
    val plan = formatted(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"correlated subquery did not decorrelate to a keyed join:\n$plan")
    // independent derivation: explicit per-part avg joined back
    val brandLines = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).filter(col("p_brand") === "Brand#23"),
        col("l_partkey") === col("p_partkey"))
    val th = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey").as("tk"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    val expected = brandLines.join(th, col("l_partkey") === col("tk"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("rc"),
        count(lit(1)).as("nl")).head()
    val got = df.head()
    assert(got.getAs[Long]("revenue_cents") == expected.getAs[Long]("rc"))
    assert(got.getAs[Long]("n_lines") == expected.getAs[Long]("nl"))
  }

  test("large orders: every kept order really exceeds the quantity threshold") {
    val df = ops.Analytics.largeOrders(spark, sfDir).cache()
    assert(df.count() > 0)
    assert(df.filter(col("total_qty") <= 300).count() == 0)
    // recount the hot-order set independently and require exact agreement
    val hot = Tables.lineitem(spark, sfDir)
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      .filter(col("q") > 300).count()
    assert(df.select("o_orderkey").distinct().count() == hot,
      "semi-join must keep exactly the hot orders")
  }

  test("waiting suppliers: semi+anti self-joins match a HOF re-derivation") {
    val df = ops.Analytics.waitingSuppliers(spark, sfDir).cache()
    val plan = formatted(df)
    assert(plan.contains("LeftSemi"), s"EXISTS must plan as left-semi:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS must plan as left-anti:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    // independent algorithm: collect each order's (supplier, shipdate) pairs
    // once, then decide per late line with array HOFs — no subqueries.
    val pairs = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey").as("pk"))
      .agg(collect_list(struct(col("l_suppkey").as("sk"),
        col("l_shipdate").as("sd"))).as("ps"))
    val expected = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(datediff(col("l_shipdate"), col("o_orderdate")) > 365)
      .join(pairs, col("l_orderkey") === col("pk"))
      .filter(exists(col("ps"), p => p("sk") =!= col("l_suppkey")) &&
        !exists(col("ps"), p =>
          p("sk") =!= col("l_suppkey") && p("sd") > col("l_shipdate")))
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sfDir), col("s_nationkey") === col("n_nationkey"))
      .groupBy("s_name", "n_name").agg(count(lit(1)).as("w"))
      .orderBy(col("w").desc, col("s_name")).limit(20)
    val bad = df.join(expected, Seq("s_name", "n_name"), "full_outer")
      .filter(col("numwait").isNull || col("w").isNull ||
        col("numwait") =!= col("w"))
    assert(bad.count() == 0, "self-join derivation disagrees with HOF derivation")
  }

  test("idle customers: threshold is integer-exact and anti-join holds") {
    val df = ops.Analytics.idleCustomers(spark, sfDir).cache()
    assert(df.count() > 0)
    val cust = Tables.customer(spark, sfDir)
      .withColumn("bal_cents", round(col("c_acctbal") * 100).cast("long"))
    val st = cust.filter(col("c_acctbal") > 0)
      .agg(sum("bal_cents"), count(lit(1))).head()
    val (s, n) = (st.getLong(0), st.getLong(1))
    val recent = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("2000-07-01").cast("timestamp"))
      .select(col("o_custkey"))
    val expected = cust.filter(col("bal_cents") * n > s)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("nc"))
    val bad = df.join(expected, Seq("c_mktsegment"), "full_outer")
      .filter(col("numcust").isNull || col("nc").isNull ||
        col("numcust") =!= col("nc"))
    assert(bad.count() == 0)
  }

  test("revenue concentration: hand-computed grid on planted revenues; monotone tails") {
    import spark.implicits._
    // four customers, one order each: 1.00 / 2.00 / 3.00 / 4.00 dollars
    // → revenue cents 100..400, grid t_i = 100 + 30i
    val planted = Seq((1L, 1.00), (2L, 2.00), (3L, 3.00), (4L, 4.00))
      .toDF("o_custkey", "o_totalprice")
    val got = ops.Analytics.revenueConcentration(planted, "o_custkey", "o_totalprice")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(0) == ((4L, 1.0, 1.0)), s"bin 0 wrong: $got")
    assert(got(5) == ((2L, 0.5, 0.7)), s"bin 5 wrong: $got") // t=250 → {300,400}
    assert(got(10) == ((1L, 0.25, 0.4)), s"bin 10 wrong: $got")
    // corpus run: 11 bins, both shares monotone non-increasing in bin
    val corpus = ops.Analytics.revenueConcentration(spark, sfDir)
      .collect()
    assert(corpus.length == 11)
    val byBin = corpus.sortBy(_.getInt(0))
    assert(byBin.sliding(2).forall(p =>
      p(0).getLong(2) >= p(1).getLong(2) &&
      p(0).getDouble(4) >= p(1).getDouble(4) - 1e-9),
      "concentration tails must be monotone")
    assert(byBin.head.getDouble(3) == 1.0 && byBin.head.getDouble(4) == 1.0)
  }

  test("revenueGrowth: planted months compute exact ratios; leading periods stay null") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    val orders = Seq(
      (d("2024-01-05"), 10.00), (d("2024-01-20"), 10.00), // Jan: 2000c
      (d("2024-02-10"), 30.00),                           // Feb: 3000c → +50%
      (d("2024-03-15"), 15.00))                           // Mar: 1500c → −50%
      .toDF("d", "price")
    val got = ops.Analytics.revenueGrowth(orders, "d", "price").collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(got("2024-01-01") == ((2000L, None)), s"jan wrong: $got")
    assert(got("2024-02-01") == ((3000L, Some(0.5))), s"feb wrong: $got")
    assert(got("2024-03-01") == ((1500L, Some(-0.5))), s"mar wrong: $got")
    // corpus: one row per month, months strictly increasing, yoy null
    // until a full year of history exists
    val corpus = ops.Analytics.revenueGrowth(spark, sfDir).collect()
    val months = corpus.map(_.getDate(0).toString)
    assert(months.sorted.toSeq == months.toSeq && months.distinct.length == months.length)
    assert(corpus.take(12).forall(_.isNullAt(4)), "yoy must be null in the first year")
  }

  test("revenueGrowth: calendar gaps yield NULL growth, never a wrong-month pairing") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    // March has no orders: April's mom must be NULL (a 1-row lag would
    // silently pair April with February). Jan-2025 pairs yoy with
    // Jan-2024 even though only 4 month-rows exist between them (a
    // 12-row lag would find nothing); May-2025 has no May-2024 → NULL.
    val orders = Seq(
      (d("2024-01-05"), 10.00), (d("2024-02-10"), 20.00),
      (d("2024-04-15"), 40.00), (d("2025-01-09"), 25.00),
      (d("2025-05-02"), 8.00))
      .toDF("d", "price")
    val got = ops.Analytics.revenueGrowth(orders, "d", "price").collect()
      .map(r => r.getDate(0).toString ->
        ((Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    assert(got("2024-04-01") == ((None, None)), s"gap month paired wrongly: $got")
    assert(got("2025-01-01") == ((None, Some(1.5))), s"yoy must pair Jan24: $got")
    assert(got("2025-05-01") == ((None, None)), s"no May24 → null yoy: $got")
    assert(got("2024-02-01") == ((Some(1.0), None)))
  }

  test("skyline: planted frontier with ties; dominated points excluded; corpus law holds") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    val orders = Seq(
      (1L, d("2024-01-01"), 10.00), (2L, d("2024-01-01"), 5.00),
      (3L, d("2024-01-02"), 8.00), (6L, d("2024-01-02"), 9.00),
      (4L, d("2024-01-03"), 8.00), (5L, d("2024-01-03"), 8.00))
      .toDF("id", "d", "price")
    val got = ops.Analytics.skyline(orders, "id", "d", "price")
      .collect().map(_.getLong(0)).toSet
    // 1 is latest-nothing-richer, 6 beats 3 same-day, 4 and 5 tie on the
    // frontier point (no strict dominance between equals)
    assert(got == Set(1L, 6L, 4L, 5L), s"frontier wrong: $got")
    // corpus law: no surviving order is dominated by ANY order (brute check)
    val sky = ops.Analytics.skyline(spark, sfDir).cache()
    val all = Tables.orders(spark, sfDir).select(
      col("o_orderkey").as("k2"), col("o_orderdate").as("d2"),
      round(col("o_totalprice") * 100).cast("long").as("p2"))
    val dominated = sky
      .withColumn("pc", round(col("price") * 100).cast("long"))
      .join(all,
        col("d2") >= col("o_orderdate") && col("p2") >= col("pc") &&
        (col("d2") > col("o_orderdate") || col("p2") > col("pc")))
    assert(dominated.count() == 0, "a skyline member is dominated")
    assert(sky.count() > 0)
  }

  test("freqItemsets: planted baskets score exact support/confidence/lift; sub-support absent") {
    import spark.implicits._
    // baskets: o1{10,20} o2{10,20} o3{10,20,30} o4{30,40} o5{40,10};
    // the duplicated (1,10) line must not inflate support (DISTINCT).
    val lines = Seq(
      (1L, 10L), (1L, 10L), (1L, 20L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (3L, 30L),
      (4L, 30L), (4L, 40L),
      (5L, 40L), (5L, 10L)).toDF("ok", "pk")
    val got = ops.Analytics.freqItemsets(lines, "ok", "pk").collect()
    // only (10,20) reaches support 2 (it has 3); every other pair is 1
    assert(got.length == 1, s"expected one surviving pair: ${got.toSeq}")
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((10L, 20L, 3L, 4L, 3L)), s"counts wrong: $r")
    // conf = 3/4; lift = 3·5/(4·3) = 1.25 — exact divisions of exact counts
    assert(r.getDouble(5) == 0.75 && r.getDouble(6) == 1.25, s"ratios wrong: $r")
    // corpus run: pairs ordered by support; confidence within (0,1]
    val corpus = ops.Analytics.freqItemsets(spark, sfDir).collect()
    assert(corpus.nonEmpty && corpus.length <= 50)
    val sups = corpus.map(_.getLong(2)).toSeq
    assert(sups.zip(sups.tail).forall { case (a, b) => a >= b })
    assert(corpus.forall(r => r.getDouble(5) > 0 && r.getDouble(5) <= 1.0))
  }

  test("holtForecast: a perfect linear trend forecasts exactly; noisy step hand-traced") {
    import spark.implicits._
    def d(m: Int) = java.sql.Timestamp.valueOf(f"2020-$m%02d-15 00:00:00")
    // revenue 10.00, 12.00, 14.00, 16.00 — slope +200 cents/month
    val lin = Seq(d(1) -> 10.0, d(2) -> 12.0, d(3) -> 14.0, d(4) -> 16.0)
      .toDF("dt", "price")
    val got = ops.Analytics.holtForecast(lin, "dt", "price").collect()
    assert(got.length == 3)
    // l4=1600 b4=200: forecasts 1800/2000/2200 cents, zero in-sample error
    assert(got.map(_.getAs[Long]("forecast_cents")).toSeq ==
      Seq(1800L, 2000L, 2200L))
    assert(got.forall(_.getAs[Long]("sae_cents") == 0L))
    assert(got.forall(_.getAs[Long]("trend_cents") == 200L))
    assert(got.head.getAs[java.sql.Date]("forecast_month").toString == "2020-05-01")
    // noisy third month: y = 1000, 1200, 1000 (cents)
    // init l2=1200 b2=200; t=3: fitted=1400, err=400,
    // l3=floor((2*1000+8*1400)/10)=1320, b3=floor((3*120+7*200)/10)=176
    val noisy = Seq(d(1) -> 10.0, d(2) -> 12.0, d(3) -> 10.0).toDF("dt", "price")
    val n1 = ops.Analytics.holtForecast(noisy, "dt", "price").collect().head
    assert(n1.getAs[Long]("level_cents") == 1320L)
    assert(n1.getAs[Long]("trend_cents") == 176L)
    assert(n1.getAs[Long]("sae_cents") == 400L)
    assert(n1.getAs[Long]("forecast_cents") == 1320L + 176L)
    assert(n1.getAs[Long]("n_fit") == 1L)
    // corpus: 3 rows, forecast arithmetic consistent with level/trend
    val c = ops.Analytics.holtForecast(spark, sfDir).collect()
    assert(c.length == 3)
    c.foreach { r =>
      assert(r.getAs[Long]("forecast_cents") ==
        r.getAs[Long]("level_cents") + r.getAs[Int]("h") * r.getAs[Long]("trend_cents"))
    }
  }

  test("seasonalDecompose: planted trend+seasonal separates exactly, residual zero") {
    import spark.implicits._
    // c_t = 1000·t + p(moy), p = +120 Jan / −120 Jul / 0 else (zero-sum
    // annual pattern): the 2×12 MA kills p exactly and reproduces the
    // line, so seasonal recovers p and the residual is exactly 0
    def p(moy: Int) = if (moy == 1) 120L else if (moy == 7) -120L else 0L
    val months = (1 to 36).map { t =>
      val ts = java.sql.Timestamp.valueOf(
        f"${2020 + (t - 1) / 12}-${(t - 1) % 12 + 1}%02d-10 00:00:00")
      (ts, (1000L * t + p((t - 1) % 12 + 1)) / 100.0)
    }
    val got = ops.Analytics.seasonalDecompose(
      months.toDF("dt", "price"), "dt", "price").collect()
    assert(got.length == 24, s"expected 36−12 full-window months: ${got.length}")
    got.foreach { r =>
      val m = r.getAs[java.sql.Date]("m").toLocalDate
      val t = (m.getYear - 2020) * 12 + m.getMonthValue
      assert(r.getAs[Long]("trend_milli") == 1000000L * t, s"trend at $m")
      assert(r.getAs[Long]("seasonal_milli") == 1000L * p(m.getMonthValue),
        s"seasonal at $m")
      assert(r.getAs[Long]("resid_milli") == 0L, s"residual at $m")
    }
    // corpus: components reassemble the series exactly by construction
    val corpus = ops.Analytics.seasonalDecompose(spark, sfDir).collect()
    assert(corpus.length >= 12)
    corpus.foreach { r =>
      assert(r.getAs[Long]("revenue_cents") * 1000L ==
        r.getAs[Long]("trend_milli") + r.getAs[Long]("seasonal_milli") +
          r.getAs[Long]("resid_milli"))
    }
  }

  test("forecastEval: zero-error trend scores MASE 0; naive denominators exact") {
    import spark.implicits._
    def dm(y: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"$y-$m%02d-15 00:00:00")
    // 20 months of a perfect +100-cent trend: Holt tracks it exactly
    val months = (0 until 20).map(t => dm(2020 + t / 12, t % 12 + 1) ->
      (1.0 * (t + 1)))
    val got = ops.Analytics.forecastEval(months.toDF("dt", "price"),
      "dt", "price").collect()(0)
    assert(got.getAs[Long]("n_months") == 20L &&
      got.getAs[Long]("n_fit") == 18L)
    assert(got.getAs[Long]("sae_cents") == 0L)
    assert(got.getAs[Double]("mase") == 0.0)
    assert(got.getAs[Long]("mae_naive_cents") == 100L)  // |Δ| = 100 always
    assert(got.getAs[Long]("mae_snaive_cents") == 1200L) // 12-month gap
    assert(got.getAs[Double]("mase_seasonal") == 0.0)
    // a short series (≤ 12 months) nulls the seasonal columns
    val short = months.take(6)
    val s = ops.Analytics.forecastEval(short.toDF("dt", "price"),
      "dt", "price").collect()(0)
    assert(s.isNullAt(s.fieldIndex("mae_snaive_cents")) &&
      s.isNullAt(s.fieldIndex("mase_seasonal")))
    // corpus: MASE well-defined and the integer identities close
    val corpus = ops.Analytics.forecastEval(spark, sfDir).collect()(0)
    assert(corpus.getAs[Long]("mae_holt_cents") ==
      corpus.getAs[Long]("sae_cents") / corpus.getAs[Long]("n_fit"))
    assert(corpus.getAs[Double]("mase") > 0)
  }

  test("abcXyz: planted parts hit the exact class grid incl. both threshold edges") {
    import spark.implicits._
    import java.sql.Date
    val (m1, m2) = (Date.valueOf("2024-01-15"), Date.valueOf("2024-02-15"))
    // p1: steady 10+10, rev 800 → A/X (higher=0); p2: 3 once, rev 150 →
    // exactly ON the 80% boundary (5·800 = 4·1000 — NOT A) → B, and
    // CV = 1 exactly (V = S² — NOT Y) → Z; p3: 2+1, rev 50 → exactly ON
    // the 95% boundary (20·950 = 19·1000 — NOT B) → C, CV < 0.5 → X
    val li = Seq(
      (1L, 10.0, 4.00, m1), (1L, 10.0, 4.00, m2),
      (2L, 3.0, 1.50, m1),
      (3L, 2.0, 0.30, m1), (3L, 1.0, 0.20, m2))
      .toDF("pk", "qty", "price", "ship")
    val got = ops.Analytics.abcXyz(li, "pk", "qty", "price", "ship")
      .collect()
      .map(r => (r.getAs[String]("abc"), r.getAs[String]("xyz"),
        r.getAs[Long]("n_parts"), r.getAs[Long]("revenue_cents"),
        r.getAs[Long]("revenue_ppm")))
    assert(got.toSeq == Seq(("A", "X", 1L, 800L, 800000L),
      ("B", "Z", 1L, 150L, 150000L), ("C", "X", 1L, 50L, 50000L)))
  }

  test("q_abc_xyz: grid bounded at 9, ppm closes to one million") {
    val rows = ops.Analytics.abcXyz(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    assert(rows.map(r => (r.getAs[String]("abc"), r.getAs[String]("xyz")))
      .forall { case (a, x) => Set("A", "B", "C")(a) && Set("X", "Y", "Z")(x) })
    // truncating per-class ppm can only lose dust, never overshoot
    val ppm = rows.map(_.getAs[Long]("revenue_ppm")).sum
    assert(ppm <= 1000000L && ppm >= 1000000L - rows.length)
    // the A head out-earns the C tail per part by construction
    val byClass = rows.groupBy(_.getAs[String]("abc"))
      .map { case (k, rs) => k -> (rs.map(_.getAs[Long]("revenue_cents")).sum,
        rs.map(_.getAs[Long]("n_parts")).sum) }
    for (a <- byClass.get("A"); c <- byClass.get("C"))
      assert(a._1 * c._2 > c._1 * a._2, "A parts must out-earn C parts")
  }

  test("priceIndex: hand closed form, unmatched exclusion, identity year") {
    import spark.implicits._
    // A: p 10¢→20¢ at q 10/10; B: 20¢→10¢ at q 5/5; C base-only
    // L = (20·10 + 10·5)/(10·10 + 20·5) = 250/200 → 12500 bp
    // P = (20·10 + 10·5)/(10·10 + 20·5) = 12500 bp; F = 12500.0
    val rows = Seq(
      ("A", "1995-06-01", 1.00, 10L), ("A", "1996-06-01", 2.00, 10L),
      ("B", "1995-06-01", 1.00, 5L), ("B", "1996-06-01", 0.50, 5L),
      ("C", "1995-06-01", 9.99, 1L))
      .toDF("item", "dt", "price", "qty")
      .select(col("item"), col("dt").cast("date").as("dt"),
        col("price"), col("qty"))
    val r = ops.Analytics.priceIndex(rows, "item", "dt", "price", "qty",
      1995, 1996).collect().head
    assert(r.getAs[Long]("n_items") == 2)
    assert(r.getAs[Long]("rev0_cents") == 200L &&
      r.getAs[Long]("rev1_cents") == 250L)
    assert(r.getAs[Long]("laspeyres_bp") == 12500L)
    assert(r.getAs[Long]("paasche_bp") == 12500L)
    assert(r.getAs[Double]("fisher_bp") == 12500.0)
    // identical years → every index exactly 10000 bp
    val same = ops.Analytics.priceIndex(rows, "item", "dt", "price", "qty",
      1995, 1995).collect().head
    assert(same.getAs[Long]("laspeyres_bp") == 10000L &&
      same.getAs[Long]("paasche_bp") == 10000L &&
      same.getAs[Double]("fisher_bp") == 10000.0)
    // corpus: matched basket nearly complete; Fisher between L and P
    val c = ops.Analytics.priceIndex(spark, sfDir).collect().head
    assert(c.getAs[Long]("n_items") > 0)
    val (l, p) = (c.getAs[Long]("laspeyres_bp"), c.getAs[Long]("paasche_bp"))
    val f = c.getAs[Double]("fisher_bp")
    assert(f >= math.min(l, p) - 1 && f <= math.max(l, p) + 1,
      s"Fisher $f outside [$l, $p]")
  }

  test("gumbelReturn: driver-model MoM parity, degenerate NULLs") {
    import spark.implicits._
    // monthly maxima 300, 200, 400 cents (known by construction)
    val rows = Seq(("2024-01-05", 1.00), ("2024-01-20", 3.00),
      ("2024-02-10", 2.00), ("2024-03-15", 4.00)).toDF("dt", "p")
      .select(col("dt").cast("date").as("dt"), col("p"))
    val r = ops.Analytics.gumbelReturn(rows, "dt", "p", 12).collect().head
    assert(r.getAs[Long]("n_blocks") == 3 &&
      r.getAs[Long]("observed_max_cents") == 400L)
    // identical double model: n=3 s=900 ss=290000
    val (n, s, ss) = (3.0, 900.0, 290000.0)
    val mean = s / n
    val beta = math.sqrt((ss - s * s / n) / (n - 1)) * math.sqrt(6.0) / math.Pi
    val gamma = 0.5772156649015329
    def r2(x: Double) = BigDecimal(x)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("beta_cents") == r2(beta))
    assert(r.getAs[Double]("mu_cents") == r2(mean - gamma * beta))
    assert(r.getAs[Double]("return_level_cents") ==
      r2(mean - gamma * beta - beta * math.log(-math.log(1.0 - 1.0 / 12))))
    // the 1-in-12 level extrapolates past the location parameter
    // (−ln(−ln(11/12)) > γ, so RL > μ whenever β > 0)
    assert(r.getAs[Double]("return_level_cents") >
      r.getAs[Double]("mu_cents"))
    // single block / zero variance → NULL fit
    val one = Seq(("2024-01-05", 1.00)).toDF("dt", "p")
      .select(col("dt").cast("date").as("dt"), col("p"))
    val o = ops.Analytics.gumbelReturn(one, "dt", "p", 12).collect().head
    assert(o.isNullAt(o.fieldIndex("mu_cents")))
    val flat = Seq(("2024-01-05", 2.00), ("2024-02-05", 2.00))
      .toDF("dt", "p")
      .select(col("dt").cast("date").as("dt"), col("p"))
    val fl = ops.Analytics.gumbelReturn(flat, "dt", "p", 12).collect().head
    assert(fl.isNullAt(fl.fieldIndex("return_level_cents")))
    // corpus: fit defined, return level above location
    val c2 = ops.Analytics.gumbelReturn(spark, sfDir).collect().head
    assert(c2.getAs[Double]("return_level_cents") >
      c2.getAs[Double]("mu_cents"))
  }
}
