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
  * by construction of `groupBy().agg()`; top-k uses
  * `TakeOrderedAndProject` (per-partition heap, no global sort); no
  * `collect()` anywhere.
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

  /** Top-k: orderBy(desc).limit(k) compiles to TakeOrderedAndProject —
    * a per-partition bounded heap + single driver merge of k rows, not a
    * global sort. At 100 TB this is the only sane top-k physical shape.
    */
  def topOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(
        col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("price"),
        col("o_orderdate").cast("date").as("odate"))

  val topOrdersSql: String =
    """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price,
      |  CAST(o_orderdate AS DATE) AS odate
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** Star-schema join: both dimension sides broadcast explicitly —
    * at 100 TB nation/region are KB-sized; a shuffle join here would be
    * a planner failure, so the hint pins it.
    */
  def custNationJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_cust"),
        round(sum(col("c_acctbal")), 2).as("sum_bal"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val custNationJoinSql: String =
    """SELECT r_name, n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** Fact-fact join: orders ⋈ lineitem on the order key. Both sides are
    * huge at scale → shuffle (sort-merge or AQE-chosen shuffled hash) on
    * l_orderkey/o_orderkey is correct; partial aggregation runs before
    * the final shuffle on the group key.
    */
  def orderLineitemJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  val orderLineitemJoinSql: String =
    """SELECT o_orderpriority, count(DISTINCT o_orderkey) AS n_orders,
      |  count(*) AS n_items,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Left-semi (EXISTS) and left-anti (NOT EXISTS) joins. The probe side
    * only ships the join key; at scale the orders key-set is shuffled
    * once and reused for both branches via the same scan.
    */
  def semiAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val oKeys = Tables.orders(spark, dir).select(col("o_custkey"))
    def branch(joinType: String, tag: String) =
      c.join(oKeys, c("c_custkey") === oKeys("o_custkey"), joinType)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
        .withColumn("status", lit(tag))
    branch("left_semi", "has_orders")
      .unionByName(branch("left_anti", "no_orders"))
      .select(col("c_mktsegment"), col("status"), col("n"))
      .orderBy(col("c_mktsegment"), col("status"))
  }

  val semiAntiSql: String =
    """SELECT c_mktsegment, 'has_orders' AS status, count(*) AS n
      |FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY c_mktsegment
      |UNION ALL
      |SELECT c_mktsegment, 'no_orders' AS status, count(*) AS n
      |FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment, status""".stripMargin

  /** Window rank: top-3 orders per customer. One shuffle on the window
    * partition key; rank filter applied before any further operator so
    * nothing downstream sees the un-filtered cardinality.
    */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val windowRankSql: String =
    """SELECT o_custkey, CAST(rn AS INT) AS rn, o_orderkey, price FROM (
      |  SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** Rollup grouping sets over a broadcast-dim join. NULL group keys are
    * coalesced to a sentinel so Spark/DuckDB NULL-ordering differences
    * can't perturb the compare.
    */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val o = Tables.orders(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .rollup(col("n_name"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("sum_price"))
      .select(
        coalesce(col("n_name"), lit("ALL")).as("n_name"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        col("n_orders"), col("sum_price"))
      .orderBy(col("n_name"), col("o_orderpriority"))
  }

  val rollupAggSql: String =
    """SELECT coalesce(n_name, 'ALL') AS n_name,
      |  coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
      |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY ROLLUP(n_name, o_orderpriority)
      |ORDER BY n_name, o_orderpriority""".stripMargin

  /** Exact distinct aggregation (expands to a two-phase partial/final
    * plan under the hood). The approximate (HLL) variant lives in
    * [[approxDistinct]] — not oracle-matchable by design.
    */
  def distinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_cust_exact"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  val distinctAggSql: String =
    """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust_exact,
      |  count(*) AS n_orders
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** approx_count_distinct = HyperLogLog++ sketch: single pass, fixed
    * memory per group — the 100 TB answer when exact distinct would
    * shuffle every key. No DuckDB oracle (sketch estimates differ);
    * driver records a rows-only check; RelationalSpec bounds the
    * estimate against the exact count.
    *
    * rsd stays at Spark's default 0.05 deliberately: the aggregation
    * buffer is 6·2^p bits per group laid out as UnsafeRow columns, and
    * the generated aggregate code grows with that width — measured
    * here, rsd 0.01 (p=14, 1536 longs) costs ~3× the wall-clock of
    * 0.05 (p=11) at ANY data size because plan compilation dominates.
    * Tighter rsd is a per-call opt-in, not a default worth that tax.
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        approx_count_distinct(col("o_custkey"), 0.05).as("n_cust_approx"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  /** Mergeable HLL distinct-count sketches (Apache DataSketches HLL,
    * Spark 3.5+ `hll_sketch_agg`/`hll_union_agg`) — the capability
    * [[approxDistinct]]'s scalar estimate lacks: per-shard sketches are
    * STORED STATE that re-aggregates without rescanning the data. At
    * 100 TB this is how distinct-user/doc counts roll up across
    * partitions, days, and datacenters: build once per shard, union the
    * ≤ |shards| fixed-size (2^lgK registers) byte arrays for any
    * cross-shard total. Per source: sketch estimate + exact distinct +
    * the error in basis points. Determinism is stated honestly:
    * per-group sketches at sparse-mode cardinalities are functions of
    * the value SET and layout-invariant (spec-pinned across
    * repartitionings), but a UNION's estimate can move in its low
    * digits with merge order — inherent to DataSketches HLL (a
    * streamed sketch reports the HIP estimator, a union the composite
    * one) — so the union row is pinned to a tolerance against the
    * one-pass whole-corpus sketch, never to bit equality. No DuckDB
    * analogue of the sketch → rows-only driver check.
    */
  def hllSketch(spark: SparkSession, dir: String): DataFrame =
    hllSketch(Tables.documents(spark, dir), "source", "text")

  /** DataFrame-first form: distinct `valCol` per `grpCol` group. */
  def hllSketch(docs: DataFrame, grpCol: String, valCol: String): DataFrame = {
    val perGroup = docs.groupBy(col(grpCol).as("grp"))
      .agg(hll_sketch_agg(col(valCol), 12).as("sk"),
        count_distinct(col(valCol)).as("exact_distinct"))
    val union = perGroup
      .agg(hll_union_agg(col("sk"), allowDifferentLgConfigK = false).as("sk"))
    val globalExact = docs.agg(count_distinct(col(valCol)).as("g"))
      .select(col("g")).head().getLong(0)
    val all = union.select(lit("__ALL__").as("grp"),
      col("sk"), lit(globalExact).as("exact_distinct"))
    perGroup.select(col("grp"), col("sk"), col("exact_distinct"))
      .unionByName(all)
      .select(col("grp").as("source"),
        hll_sketch_estimate(col("sk")).as("est_distinct"),
        col("exact_distinct"))
      .withColumn("err_bp",
        expr("abs(est_distinct - exact_distinct) * 10000L div greatest(exact_distinct, 1L)"))
      .orderBy(col("source"))
  }

  /** Set operations (UNION/INTERSECT/EXCEPT, all DISTINCT semantics). */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val a = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val b = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    def counted(df: DataFrame, tag: String) =
      df.agg(count(lit(1)).as("n")).withColumn("op", lit(tag))
    counted(a.union(b).distinct(), "union")
      .unionByName(counted(a.intersect(b), "intersect"))
      .unionByName(counted(a.except(b), "except"))
      .select(col("op"), col("n"))
      .orderBy(col("op"))
  }

  val setOpsSql: String =
    """SELECT 'union' AS op, count(*) AS n FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  UNION SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') t
      |UNION ALL
      |SELECT 'intersect' AS op, count(*) AS n FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') t
      |UNION ALL
      |SELECT 'except' AS op, count(*) AS n FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') t
      |ORDER BY op""".stripMargin

  /** ANSI-safety battery: the engine runs Spark 4's ANSI mode (a
    * divide-by-zero, bad cast, or invalid array index THROWS instead
    * of silently corrupting), and `try_*` is the per-expression escape
    * hatch a production pipeline uses where NULL is the correct
    * answer for malformed input. Each probe mixes valid and invalid
    * rows off the customer table and the battery counts survivors —
    * proving NULL-not-throw semantics on the invalid rows and
    * value-preservation on the valid ones. One scan, one row out.
    */
  def tryFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .agg(
        count(lit(1)).as("n_rows"),
        count(expr("try_divide(c_acctbal, CAST(c_custkey % 3 AS DOUBLE))"))
          .as("n_div_ok"),
        count(expr("try_cast(CASE WHEN c_custkey % 2 = 0 " +
          "THEN CAST(c_custkey AS STRING) ELSE c_name END AS BIGINT)"))
          .as("n_cast_ok"),
        // index 1..4 over a 1-element array: 1 hits, 2..4 are OOB →
        // NULL (index 0 is an invalid ARGUMENT, which try_element_at
        // deliberately still throws on — only DATA errors are soft)
        count(expr("try_element_at(array(c_custkey), CAST(c_custkey % 4 + 1 AS INT))"))
          .as("n_elem_ok"),
        count(expr("try_cast(CASE WHEN c_custkey % 5 = 0 " +
          "THEN '2024-01-01 00:00:00' ELSE c_mktsegment END AS TIMESTAMP)"))
          .as("n_ts_ok"))

  val tryFuncsSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(count(c_acctbal / NULLIF(CAST(c_custkey % 3 AS DOUBLE), 0.0))
      |    AS BIGINT) AS n_div_ok,
      |  CAST(count(TRY_CAST(CASE WHEN c_custkey % 2 = 0
      |    THEN CAST(c_custkey AS VARCHAR) ELSE c_name END AS BIGINT))
      |    AS BIGINT) AS n_cast_ok,
      |  CAST(count(([c_custkey])[CAST(c_custkey % 4 + 1 AS INT)]) AS BIGINT)
      |    AS n_elem_ok,
      |  CAST(count(TRY_CAST(CASE WHEN c_custkey % 5 = 0
      |    THEN '2024-01-01 00:00:00' ELSE c_mktsegment END AS TIMESTAMP))
      |    AS BIGINT) AS n_ts_ok
      |FROM customer""".stripMargin

  /** String/math scalar-function battery — all codegen'd built-ins, so
    * the whole projection stays inside one WholeStageCodegen span.
    */
  def scalarFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
        length(col("p_name")).as("name_len"),
        lower(col("p_brand")).as("brand_lower"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        round(col("p_retailprice") * 1.1, 2).as("price_up"),
        floor(col("p_retailprice")).as("price_floor"),
        (col("p_size") % 7).as("size_mod"),
        round(sqrt(col("p_size")), 4).as("size_sqrt"))
      .orderBy(col("p_partkey"))

  val scalarFuncsSql: String =
    """SELECT p_partkey,
      |  upper(substring(p_name, 1, 8)) AS name_prefix,
      |  CAST(length(p_name) AS INT) AS name_len,
      |  lower(p_brand) AS brand_lower,
      |  concat_ws('-', p_brand, p_type) AS brand_type,
      |  round(p_retailprice * 1.1, 2) AS price_up,
      |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
      |  p_size % 7 AS size_mod,
      |  round(sqrt(p_size), 4) AS size_sqrt
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** Date/time scalar-function battery over orders. Outputs are ints
    * and DATEs (never raw timestamps) for cross-engine hash stability.
    */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        last_day(col("o_orderdate")).as("month_end"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since"))
      .orderBy(col("o_orderkey"))

  val dateFuncsSql: String =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(quarter(o_orderdate) AS INT) AS q,
      |  CAST(month(o_orderdate) AS INT) AS m,
      |  CAST(day(o_orderdate) AS INT) AS d,
      |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** Sessionization via lag window: gap > 30 min starts a new session.
    * Gaps are computed on integer epoch seconds so sub-second precision
    * differences between engines can't flip a boundary. One shuffle on
    * user_id; at 100 TB this is the canonical partition-by-entity shape.
    */
  def eventsSessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("es"))
    Tables.events(spark, dir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"))
      .withColumn("prev", lag(col("es"), 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull || col("es") - col("prev") > 1800, 1).otherwise(0))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("new_s")).as("n_sessions"))
      .orderBy(col("user_id"))
  }

  // Epoch seconds in the SQL twins use an explicit floor-division CASE:
  // Spark's unix_timestamp FLOORS while DuckDB's `//` truncates toward
  // zero, so a pre-1970 fractional-second timestamp would land in a
  // different second (and potentially a different session/rank) across
  // engines under a bare `epoch_us(ts) // 1000000`.
  val eventsSessionizeSql: String =
    """WITH e AS (
      |  SELECT user_id, (CASE WHEN epoch_us(ts) < 0 THEN (epoch_us(ts)+1) // 1000000 - 1 ELSE epoch_us(ts) // 1000000 END) AS es FROM events),
      |g AS (
      |  SELECT user_id,
      |    CASE WHEN lag(es) OVER (PARTITION BY user_id ORDER BY es) IS NULL
      |           OR es - lag(es) OVER (PARTITION BY user_id ORDER BY es) > 1800
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM e)
      |SELECT user_id, count(*) AS n_events, CAST(sum(new_s) AS BIGINT) AS n_sessions
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

  /** CUBE grouping sets: all 2^2 combinations of (nation, status). */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val o = Tables.orders(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .cube(col("n_name"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"))
      .select(
        coalesce(col("n_name"), lit("ALL")).as("n_name"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        col("n_orders"))
      .orderBy(col("n_name"), col("o_orderstatus"))
  }

  val cubeAggSql: String =
    """SELECT coalesce(n_name, 'ALL') AS n_name,
      |  coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
      |  count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY CUBE(n_name, o_orderstatus)
      |ORDER BY n_name, o_orderstatus""".stripMargin

  /** Exact interpolated percentiles per group. Spark's exact
    * `percentile` (TypedImperativeAggregate) buffers a value→count map
    * per task, so it is safe at scale ONLY over a BOUNDED-CARDINALITY
    * measure — here `l_quantity` (50 distinct values: the buffer is a
    * ≤50-entry map regardless of corpus size, and the partial+final
    * merge ships 50 counters, not rows). Exact percentiles of an
    * unbounded measure (a near-unique price/embedding norm) buffer
    * O(rows/partition) and are the first OOM at 100 TB — that case
    * belongs to [[approxPercentiles]] (fixed-memory sketch). DuckDB
    * `quantile_cont` matches the interpolation exactly.
    */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 2).as("p25"),
        round(expr("percentile(l_quantity, 0.5)"), 2).as("p50"),
        round(expr("percentile(l_quantity, 0.75)"), 2).as("p75"),
        round(expr("percentile(l_quantity, 0.95)"), 2).as("p95"))
      .orderBy(col("l_returnflag"))

  val percentilesSql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.25), 2) AS p25,
      |  round(quantile_cont(l_quantity, 0.5), 2) AS p50,
      |  round(quantile_cont(l_quantity, 0.75), 2) AS p75,
      |  round(quantile_cont(l_quantity, 0.95), 2) AS p95
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Sketch percentiles: `approx_percentile` (KLL/quantile sketch) —
    * single pass, fixed memory per group, mergeable across partitions:
    * the 100 TB replacement for [[percentiles]]' exact sort. No SQL
    * oracle (sketch estimates are engine-specific); error vs the exact
    * values is bounded by RelationalSpec.
    */
  def approxPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("approx_percentile(o_totalprice, 0.5, 10000)"), 2).as("p50_approx"),
        round(expr("approx_percentile(o_totalprice, 0.95, 10000)"), 2).as("p95_approx"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  /** Array-function battery over tokenized part names: construction,
    * dedup, sort, membership, indexing, filtering — all codegen'd
    * built-ins mirrored by DuckDB list functions.
    */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"), split(col("p_name"), " ").as("toks"))
      .select(
        col("p_partkey"),
        size(col("toks")).as("n_toks"),
        size(array_distinct(col("toks"))).as("n_uniq"),
        array_join(array_sort(array_distinct(col("toks"))), ",").as("sorted_uniq"),
        array_contains(col("toks"), "green").cast("int").as("has_green"),
        element_at(col("toks"), 1).as("first_tok"),
        element_at(col("toks"), -1).as("last_tok"),
        size(expr("filter(toks, t -> length(t) > 4)")).as("n_long"))
      .orderBy(col("p_partkey"))

  val arrayFuncsSql: String =
    """SELECT p_partkey,
      |  CAST(len(string_split(p_name, ' ')) AS INT) AS n_toks,
      |  CAST(len(list_distinct(string_split(p_name, ' '))) AS INT) AS n_uniq,
      |  array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), ',') AS sorted_uniq,
      |  CAST(list_contains(string_split(p_name, ' '), 'green') AS INT) AS has_green,
      |  string_split(p_name, ' ')[1] AS first_tok,
      |  string_split(p_name, ' ')[-1] AS last_tok,
      |  CAST(len(list_filter(string_split(p_name, ' '), t -> length(t) > 4)) AS INT) AS n_long
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** TPC-H Q3 shape (shipping priority): 3-way selective join, grouped
    * revenue, top-10. The customer filter cuts the build side before
    * the join; the lineitem date filter pushes to the scan.
    */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("odate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("odate"), col("revenue"))
  }

  val shippingPrioritySql: String =
    """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS odate,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1995-03-15'
      |  AND l_shipdate > TIMESTAMP '1995-03-15'
      |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5 shape (local-supplier volume): 5-way join across the
    * whole star — two broadcast dims, two shuffled facts, supplier
    * co-nation constraint — grouped revenue per nation.
    */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .join(s, l("l_suppkey") === s("s_suppkey") && c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val localSupplierVolumeSql: String =
    """SELECT r_name, n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS n_items
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** Map-type battery: construction, lookup, keys, cardinality.
    * DuckDB map extraction returns a single-element list — the oracle
    * unwraps with [1].
    */
  def mapFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"),
        map_from_arrays(
          array(lit("brand"), lit("type")),
          array(col("p_brand"), col("p_type"))).as("m"))
      .select(
        col("p_partkey"),
        col("m")("brand").as("brand"),
        col("m")("type").as("ptype"),
        size(col("m")).as("m_size"),
        array_join(map_keys(col("m")), ",").as("keys"))
      .orderBy(col("p_partkey"))

  val mapFuncsSql: String =
    """SELECT p_partkey,
      |  (map(['brand','type'], [p_brand, p_type])['brand'])[1] AS brand,
      |  (map(['brand','type'], [p_brand, p_type])['type'])[1] AS ptype,
      |  CAST(cardinality(map(['brand','type'], [p_brand, p_type])) AS INT) AS m_size,
      |  array_to_string(map_keys(map(['brand','type'], [p_brand, p_type])), ',') AS keys
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** String-distance battery: edit distance between consecutive part
    * names within a brand — the scalar primitive under fuzzy matching.
    * The window is PARTITIONED (by brand): an unpartitioned global
    * order-by window would serialize onto one task at scale.
    */
  def stringDistance(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_partkey"))
    Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_name"))
      .withColumn("prev_name", lag(col("p_name"), 1).over(w))
      .filter(col("prev_name").isNotNull)
      .select(col("p_partkey"),
        levenshtein(col("p_name"), col("prev_name")).as("edit_dist"),
        (length(col("p_name")) - length(col("prev_name"))).as("len_delta"))
      .orderBy(col("p_partkey"))
  }

  val stringDistanceSql: String =
    """SELECT p_partkey,
      |  CAST(levenshtein(p_name, prev_name) AS INT) AS edit_dist,
      |  CAST(length(p_name) - length(prev_name) AS INT) AS len_delta
      |FROM (
      |  SELECT p_partkey, p_name,
      |    lag(p_name) OVER (PARTITION BY p_brand ORDER BY p_partkey) AS prev_name
      |  FROM part) t
      |WHERE prev_name IS NOT NULL
      |ORDER BY p_partkey""".stripMargin

  /** Pivot: order counts per nation (rows) × order status (columns).
    * Spark's `pivot` takes explicit values — mandatory at scale, where
    * value discovery would be a full extra pass. Oracle spells the same
    * thing as conditional aggregation (engine-neutral formulation).
    */
  def pivotAgg(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val o = Tables.orders(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("n_name"), col("F").as("n_f"), col("O").as("n_o"), col("P").as("n_p"))
      .orderBy(col("n_name"))
  }

  val pivotAggSql: String =
    """SELECT n_name,
      |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
      |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
      |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Regex battery over part names: extraction, replacement, matching,
    * counting — all codegen'd built-ins with DuckDB equivalents.
    */
  def regexFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        col("p_name").rlike("ro").cast("int").as("has_ro"),
        regexp_count(col("p_name"), lit("o")).cast("int").as("n_o"))
      .orderBy(col("p_partkey"))

  val regexFuncsSql: String =
    """SELECT p_partkey,
      |  regexp_extract(p_name, '^(\w+)', 1) AS first_word,
      |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
      |  CAST(regexp_matches(p_name, 'ro') AS INT) AS has_ro,
      |  CAST(len(regexp_extract_all(p_name, 'o')) AS INT) AS n_o
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** Unpivot (melt): wide per-part numeric columns → long (part,
    * metric, value) rows. The inverse of [[pivotAgg]]; oracle is the
    * engine-neutral UNION ALL spelling.
    */
  def unpivotFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"),
        col("p_size").cast("double").as("size"),
        round(col("p_retailprice"), 2).as("price"))
      .unpivot(
        ids = Array(col("p_partkey")),
        values = Array(col("size"), col("price")),
        variableColumnName = "metric",
        valueColumnName = "value")
      .orderBy(col("p_partkey"), col("metric"))

  val unpivotFuncsSql: String =
    """SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
      |UNION ALL
      |SELECT p_partkey, 'price' AS metric, round(p_retailprice, 2) AS value FROM part
      |ORDER BY p_partkey, metric""".stripMargin

  /** JSON extraction from the events.props string column. */
  /** The same semi-structured extraction through Spark 4's VARIANT
    * type: `parse_json` once into the binary variant encoding, then
    * typed `variant_get` path reads — the modern engine path that
    * parses each JSON document ONCE and reads fields at near-columnar
    * speed, where repeated `get_json_object` calls re-parse the string
    * per path. `try_variant_get` on a missing path yields NULL (not an
    * error), pinned by the null-count column. Values and nulls must
    * match the string-path derivation exactly — and the DuckDB oracle.
    */
  def variantExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      // parse ONCE into the variant encoding, then both path reads hit
      // the same variant column — two parse_json calls per row would
      // re-tokenize the string for each path, defeating the whole point
      .select(col("event_type"), expr("parse_json(props)").as("v"))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'long')").as("k"),
        expr("try_variant_get(v, '$.missing', 'long')").as("m"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"),
        round(avg(col("k")), 4).as("avg_k"),
        count_if(col("m").isNull).as("n_missing"))
      .orderBy(col("event_type"))

  val variantExtractSql: String =
    """SELECT event_type,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  count(*) AS n,
      |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
      |  count(*) FILTER (WHERE json_extract_string(props, '$.missing') IS NULL)
      |    AS n_missing
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"),
        round(avg(col("k")), 4).as("avg_k"))
      .orderBy(col("event_type"))

  val jsonExtractSql: String =
    """SELECT event_type,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  count(*) AS n,
      |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** FULL OUTER join — the reconciliation shape: per-customer order
    * counts from the early and late halves of the order history, full
    * outer joined so customers active in only one half still appear
    * (null side coalesced to 0). Completes the join matrix next to
    * inner/broadcast/semi/anti/as-of/range/salted. Shuffles once per
    * side on the join key; the outer join itself is a standard
    * sort-merge full outer at scale.
    */
  def fullOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val early = o.filter(col("o_orderdate") < "1996-01-01")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_early"))
    val late = o.filter(col("o_orderdate") >= "1996-01-01")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_late"))
    early.join(late, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        coalesce(col("n_early"), lit(0L)).as("n_early"),
        coalesce(col("n_late"), lit(0L)).as("n_late"))
      .withColumn("status",
        when(col("n_early") === 0, "late_only")
          .when(col("n_late") === 0, "early_only")
          .otherwise("both"))
      .orderBy(col("o_custkey"))
  }

  val fullOuterJoinSql: String =
    """WITH early AS (
      |  SELECT o_custkey, count(*) AS n_early FROM orders
      |  WHERE o_orderdate < DATE '1996-01-01' GROUP BY o_custkey),
      |late AS (
      |  SELECT o_custkey, count(*) AS n_late FROM orders
      |  WHERE o_orderdate >= DATE '1996-01-01' GROUP BY o_custkey)
      |SELECT coalesce(early.o_custkey, late.o_custkey) AS o_custkey,
      |  coalesce(n_early, 0) AS n_early,
      |  coalesce(n_late, 0) AS n_late,
      |  CASE WHEN coalesce(n_early, 0) = 0 THEN 'late_only'
      |       WHEN coalesce(n_late, 0) = 0 THEN 'early_only'
      |       ELSE 'both' END AS status
      |FROM early FULL OUTER JOIN late ON early.o_custkey = late.o_custkey
      |ORDER BY o_custkey""".stripMargin

  /** Deliberately skewed fact-dim join through the salted path
    * ([[graft.functions.Skew.saltedJoin]]): ~1/3 of orders are remapped
    * onto ONE hot customer key (the replayed-log / default-record
    * pathology that AQE can't always split, e.g. on bucketed reads),
    * then joined to customer with an 8-way salt — the hot key's rows
    * spread across 8 shuffle partitions instead of one straggler task.
    * The salted join is row-identical to the plain join, so the oracle
    * runs the unsalted SQL. Plan contract (PlanSpec): the shuffle
    * partitions on (key, salt), never on the bare hot key.
    */
  def skewJoin(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.orders(spark, dir)
      .select(
        when(col("o_custkey") % 3 === 0, lit(1L)).otherwise(col("o_custkey")).as("skey"),
        col("o_totalprice"))
    val small = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    graft.functions.Skew.saltedJoin(big, small, "skey", "c_custkey", salt = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy(col("c_mktsegment"))
  }

  val skewJoinSql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS sum_price
      |FROM (SELECT CASE WHEN o_custkey % 3 = 0 THEN 1 ELSE o_custkey END AS skey,
      |             o_totalprice
      |      FROM orders) o
      |JOIN customer ON skey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Schema-evolution union: two snapshots with DIFFERENT columns are
    * combined with `unionByName(allowMissingColumns = true)` — missing
    * columns null-fill, names align by NAME (positional union silently
    * mismatches columns when schemas drift, the classic ingestion bug
    * when a source adds a field). The unioned frame is then aggregated
    * per key with null-safe coalesces. DuckDB's `UNION ALL BY NAME`
    * oracles the exact semantics.
    */
  def unionByNameEvolved(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    // old-schema snapshot: count only; new-schema snapshot adds a sum
    val early = o.filter(col("o_orderdate") < "1996-01-01")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_early"))
    // integer CENTS, not a rounded double: per-row round is deterministic
    // on both engines and the BIGINT sum is order-independent (same
    // discipline as [[volumeShipping]])
    val late = o.filter(col("o_orderdate") >= "1996-01-01")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_late"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("late_cents"))
    early.unionByName(late, allowMissingColumns = true)
      .groupBy(col("o_custkey"))
      .agg(
        sum(coalesce(col("n_early"), lit(0L))).as("n_early"),
        sum(coalesce(col("n_late"), lit(0L))).as("n_late"),
        sum(coalesce(col("late_cents"), lit(0L))).as("late_cents"))
      .orderBy(col("o_custkey"))
  }

  val unionByNameEvolvedSql: String =
    """WITH u AS (
      |  SELECT o_custkey, count(*) AS n_early FROM orders
      |  WHERE o_orderdate < DATE '1996-01-01' GROUP BY o_custkey
      |  UNION ALL BY NAME
      |  SELECT o_custkey, count(*) AS n_late,
      |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS late_cents
      |  FROM orders WHERE o_orderdate >= DATE '1996-01-01' GROUP BY o_custkey)
      |SELECT o_custkey,
      |  CAST(sum(coalesce(n_early, 0)) AS BIGINT) AS n_early,
      |  CAST(sum(coalesce(n_late, 0)) AS BIGINT) AS n_late,
      |  CAST(sum(coalesce(late_cents, 0)) AS BIGINT) AS late_cents
      |FROM u GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** Sessionization via Spark's NATIVE `session_window` aggregation (the
    * same operator Structured Streaming uses for session state), cross-
    * validated against an INDEPENDENT derivation: the DuckDB oracle
    * computes sessions with the lag-gap algorithm instead — two
    * different session constructions must agree on every user's
    * session/event counts. Timestamps are second-truncated on both
    * sides first. Boundary semantics, established EMPIRICALLY at sf0.1
    * (a user with a gap of exactly 1800 s): Spark merges ADJACENT
    * session intervals — an event at exactly last+gap continues the
    * session — so the oracle's new-session rule is strictly `> 1800`,
    * the same convention as [[eventsSessionize]]. (An earlier `>=`
    * oracle passed at sf0.01 only because no exact-gap pair existed
    * there; the sf0.1 gate caught it.) One shuffle on user_id; the
    * session assembly is Spark's specialized session-merge exec, not a
    * window sort.
    */
  def sessionWindowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"),
        to_timestamp(unix_timestamp(col("ts"))).as("tss"))
      .groupBy(col("user_id"), session_window(col("tss"), "30 minutes"))
      .agg(count(lit(1)).as("n_ev"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_ev")).as("n_events"))
      .orderBy(col("user_id"))

  val sessionWindowAggSql: String =
    """WITH e AS (
      |  SELECT user_id, (CASE WHEN epoch_us(ts) < 0 THEN (epoch_us(ts)+1) // 1000000 - 1 ELSE epoch_us(ts) // 1000000 END) AS es FROM events),
      |g AS (
      |  SELECT user_id,
      |    CASE WHEN lag(es) OVER (PARTITION BY user_id ORDER BY es) IS NULL
      |           OR es - lag(es) OVER (PARTITION BY user_id ORDER BY es) > 1800
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM e)
      |SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions,
      |  count(*) AS n_events
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Conditional / boolean aggregate battery: `count_if`, `bool_or`,
    * `bool_and` and interpolated `median` per order priority — the
    * "quality gate" aggregation shapes (how many violations, does any
    * row violate, do all rows satisfy) as single-pass hash aggregates.
    * median == DuckDB quantile_cont(0.5), value-exact cross-engine.
    */
  def condAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        count_if(col("o_totalprice") > 300000).as("n_big"),
        bool_or(col("o_orderstatus") === "F").as("any_f"),
        bool_and(col("o_totalprice") > 0).as("all_pos"),
        round(median(col("o_totalprice")), 2).as("med_price"))
      .orderBy(col("o_orderpriority"))

  val condAggSql: String =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  count(*) FILTER (WHERE o_totalprice > 300000) AS n_big,
      |  bool_or(o_orderstatus = 'F') AS any_f,
      |  bool_and(o_totalprice > 0) AS all_pos,
      |  round(median(o_totalprice), 2) AS med_price
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** NULL-safe equality join (`<=>` / IS NOT DISTINCT FROM): both sides
    * aggregate on a key with injected NULLs, then join null-safely so
    * the NULL group MATCHES (a plain `=` join silently drops it — the
    * classic missing-row bug when a bucketing expression can produce
    * NULL). Both sides are pre-aggregated so the NULL key is one row
    * per side, never a hot key; Spark plans `<=>` as an ordinary
    * equi-join key (hash/SMJ-able), not a nested loop. The NULL key is
    * coalesced to −1 on output so Spark/DuckDB NULL-ordering
    * differences cannot perturb the compare.
    */
  def nullSafeJoin(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.orders(spark, dir)
      .select(expr("nullif(o_custkey % 50, 7)").as("nkey"))
      .groupBy(col("nkey")).agg(count(lit(1)).as("n_orders"))
    val r = Tables.customer(spark, dir)
      .select(expr("nullif(c_custkey % 50, 7)").as("nkey"))
      .groupBy(col("nkey")).agg(count(lit(1)).as("n_cust"))
    l.join(r, l("nkey") <=> r("nkey"))
      .select(coalesce(l("nkey"), lit(-1L)).as("nkey"),
        col("n_orders"), col("n_cust"))
      .orderBy(col("nkey"))
  }

  val nullSafeJoinSql: String =
    """WITH l AS (
      |  SELECT nullif(o_custkey % 50, 7) AS nkey, count(*) AS n_orders
      |  FROM orders GROUP BY 1),
      |r AS (
      |  SELECT nullif(c_custkey % 50, 7) AS nkey, count(*) AS n_cust
      |  FROM customer GROUP BY 1)
      |SELECT coalesce(l.nkey, -1) AS nkey, n_orders, n_cust
      |FROM l JOIN r ON l.nkey IS NOT DISTINCT FROM r.nkey
      |ORDER BY nkey""".stripMargin

  /** Exact DECIMAL aggregation: prices cast to DECIMAL(18,2) up front,
    * so the sum is EXACT and order-independent — the principled answer
    * to cross-engine double-sum drift (see [[volumeShipping]]'s
    * integer-cent workaround): financial rollups at 100 TB should
    * aggregate decimals, where any summation order gives the same
    * digits. The AGGREGATION runs in decimal (Spark widens
    * sum(DECIMAL(18,2)) to DECIMAL(28,2)); the OUTPUT is scaled to
    * BIGINT cents because engines canonicalize the widened decimal
    * type differently (DuckDB widens to DECIMAL(38,2)), and integer
    * cents carry the identical exact value in a representation every
    * engine hashes the same way.
    */
  def decimalAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
      .groupBy(col("o_orderstatus"))
      .agg((sum(col("price")) * 100).cast("long").as("sum_cents"),
        (min(col("price")) * 100).cast("long").as("min_cents"),
        (max(col("price")) * 100).cast("long").as("max_cents"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus"))

  val decimalAggSql: String =
    """SELECT o_orderstatus,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_cents,
      |  CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS min_cents,
      |  CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS max_cents,
      |  count(*) AS n_orders
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** Ordered string aggregation: per nation, a CSV of "segment:count"
    * entries over its customers — both the native `listagg ... WITHIN
    * GROUP (ORDER BY ...)` form (Spark 4) and the classic
    * `array_join(array_sort(collect_list(...)))` composition, in one
    * output so the oracle pins them equal. Two-level aggregation: the
    * inner (nation, segment) count is a partial+final hash agg, so the
    * string agg itself only ever sees |segments| rows per nation —
    * the group size is bounded by the segment domain, which is the
    * contract that makes string aggregation safe at 100 TB (an ordered
    * string agg over UNBOUNDED groups concentrates whole groups in
    * memory and has no scale story).
    */
  def stringAgg(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val seg = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("entry", concat_ws(":", col("c_mktsegment"), col("cnt")))
    seg.groupBy(col("n_name"))
      .agg(
        expr("listagg(entry, ',') WITHIN GROUP (ORDER BY entry)").as("segments"),
        array_join(array_sort(collect_list(col("entry"))), ",").as("segments_composed"),
        sum(col("cnt")).as("n_customers"))
      .orderBy(col("n_name"))
  }

  val stringAggSql: String =
    """WITH seg AS (
      |  SELECT n_name, c_mktsegment || ':' || count(*) AS entry, count(*) AS cnt
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name, c_mktsegment)
      |SELECT n_name,
      |  string_agg(entry, ',' ORDER BY entry) AS segments,
      |  string_agg(entry, ',' ORDER BY entry) AS segments_composed,
      |  CAST(sum(cnt) AS BIGINT) AS n_customers
      |FROM seg GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Statistical-aggregate battery: correlation, covariance, standard
    * deviation / variance and least-squares slope+intercept of
    * extendedprice on quantity, per return flag. All are single-pass
    * co-moment aggregates (partial+final, map-side combined) — the
    * shape that replaces "collect and fit" at scale. Unit-scale
    * outputs (corr, slope) round at 4; price-scale moments at 2.
    */
  def statsBattery(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qty_price"),
        round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
        round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 2).as("intercept"))
      .orderBy(col("l_returnflag"))

  val statsBatterySql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
      |  round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
      |  round(stddev_samp(l_extendedprice), 2) AS sd_price,
      |  round(var_samp(l_quantity), 4) AS var_qty,
      |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
      |  round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Latest-record-per-key compaction (the CDC / upsert-log shape):
    * one row per user carrying their most recent event, via
    * `max(struct(ts, event_id, ...))` — an ARGMAX AGGREGATION, not a
    * window: partial aggregation reduces each map task to one row per
    * key before the shuffle, where a row_number window would shuffle
    * every event and sort each user's history just to keep one row.
    * The (ts, event_id) prefix makes the pick deterministic under
    * same-timestamp ties.
    */
  def latestByKey(spark: SparkSession, dir: String): DataFrame =
    latestByKey(
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_timestamp(col("ts")).as("es")),
      "user_id", "event_id", "event_type", "es")

  /** DataFrame-first form over any (key, seq-id, payload, epoch-sec)
    * frame. The argmax is MERGEABLE: re-aggregating per-partition (or
    * per-micro-batch) outputs with max(struct)+sum(n_events) yields the
    * exact global result — pinned by MicroBatchSpec's streaming parity
    * test, and the property that makes the op incremental-friendly.
    */
  def latestByKey(events: DataFrame, keyCol: String, idCol: String,
                  typeCol: String, tsCol: String): DataFrame =
    events
      .select(col(keyCol).as("user_id"), col(idCol).as("event_id"),
        col(typeCol).as("event_type"), col(tsCol).as("es"))
      .groupBy(col("user_id"))
      .agg(
        max(struct(col("es"), col("event_id"), col("event_type"))).as("m"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("m.event_id").as("last_event_id"),
        col("m.event_type").as("last_type"), col("m.es").as("last_ts_sec"),
        col("n_events"))
      .orderBy(col("user_id"))

  val latestByKeySql: String =
    """WITH r AS (
      |  SELECT user_id, event_id, event_type,
      |    (CASE WHEN epoch_us(ts) < 0 THEN (epoch_us(ts)+1) // 1000000 - 1 ELSE epoch_us(ts) // 1000000 END) AS es,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY (CASE WHEN epoch_us(ts) < 0 THEN (epoch_us(ts)+1) // 1000000 - 1 ELSE epoch_us(ts) // 1000000 END) DESC, event_id DESC) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n_events
      |  FROM events)
      |SELECT user_id, event_id AS last_event_id, event_type AS last_type,
      |  es AS last_ts_sec, n_events
      |FROM r WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  /** OHLC resample (time-series downsampling): per (event_type, day),
    * the first value (open), max (high), min (low) and last value
    * (close) of the day. Open/close are `min_by`/`max_by` argmin/argmax
    * AGGREGATES over the unique (epoch-sec, event_id) ordering struct —
    * one partial+final hash agg, no per-key sort, where the textbook
    * first_value/last_value window would shuffle and sort every event
    * just to keep two of them. Output is bounded by |types| × |days|
    * regardless of event volume.
    */
  def ohlcResample(spark: SparkSession, dir: String): DataFrame =
    ohlcResample(
      Tables.events(spark, dir)
        .select(col("event_type"), to_date(col("ts")).as("day"),
          unix_timestamp(col("ts")).as("es"), col("event_id"), col("value")))

  /** DataFrame-first form over any (event_type, day, es, event_id,
    * value) frame; (es, event_id) must be unique for a deterministic
    * open/close pick.
    */
  def ohlcResample(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), col("day"))
      .agg(
        round(min_by(col("value"), struct(col("es"), col("event_id"))), 2).as("open"),
        round(max(col("value")), 2).as("high"),
        round(min(col("value")), 2).as("low"),
        round(max_by(col("value"), struct(col("es"), col("event_id"))), 2).as("close"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"), col("day"))

  val ohlcResampleSql: String =
    """WITH e AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, value,
      |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
      |      ORDER BY (CASE WHEN epoch_us(ts) < 0 THEN (epoch_us(ts)+1) // 1000000 - 1 ELSE epoch_us(ts) // 1000000 END), event_id) AS rn_a,
      |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
      |      ORDER BY (CASE WHEN epoch_us(ts) < 0 THEN (epoch_us(ts)+1) // 1000000 - 1 ELSE epoch_us(ts) // 1000000 END) DESC, event_id DESC) AS rn_d
      |  FROM events)
      |SELECT event_type, day,
      |  round(min(CASE WHEN rn_a = 1 THEN value END), 2) AS open,
      |  round(max(value), 2) AS high,
      |  round(min(value), 2) AS low,
      |  round(min(CASE WHEN rn_d = 1 THEN value END), 2) AS close,
      |  count(*) AS n_events
      |FROM e GROUP BY event_type, day
      |ORDER BY event_type, day""".stripMargin

  /** Percent-of-total report: each nation's share of global revenue,
    * with rank. The share comes from an UNPARTITIONED window sum — the
    * single-partition shape this engine otherwise avoids — applied
    * only AFTER the keyed aggregation has reduced the input to the
    * |nations|-row report frame, where one partition is the right
    * call (same discipline as [[Mixing.temperatureMix]]'s n_min).
    * The fact-table work stays a partial+final hash agg.
    */
  def pctOfTotal(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val o = Tables.orders(spark, dir)
    val byNation = o
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      // round() BEFORE the long cast: Spark's cast truncates while
      // DuckDB's rounds — rounding first makes both engines agree on
      // every row's exact cents (the volumeShipping discipline)
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val w = Window.orderBy(lit(1))
    byNation
      .select(col("n_name"),
        round(col("cents") / 100.0, 2).as("revenue"),
        round(col("cents") * 100.0 / sum(col("cents")).over(w), 4).as("pct"),
        rank().over(Window.orderBy(col("cents").desc, col("n_name"))).as("rev_rank"))
      .orderBy(col("n_name"))
  }

  val pctOfTotalSql: String =
    """WITH by_nation AS (
      |  SELECT n_name,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name)
      |SELECT n_name,
      |  round(cents / 100.0, 2) AS revenue,
      |  round(cents * 100.0 / sum(cents) OVER (), 4) AS pct,
      |  CAST(rank() OVER (ORDER BY cents DESC, n_name) AS INT) AS rev_rank
      |FROM by_nation
      |ORDER BY n_name""".stripMargin

  /** Higher-order-function battery over the embedding vectors:
    * `transform` / `filter` / `exists` / `forall` / `zip_with` /
    * `aggregate` — the lambda surface that keeps array computations
    * ROW-LOCAL (scan speed at any scale) instead of exploding elements
    * into a shuffle. Floats are cast to double first and every fold is
    * a sequential left-to-right double sum, which is exactly DuckDB's
    * list semantics — so the oracle matches bit-for-bit before the
    * final rounding.
    */
  def hofBattery(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      .select(
        col("vec_id"),
        round(expr("aggregate(e, 0D, (a, x) -> a + abs(x))"), 4).as("l1"),
        expr("size(filter(e, x -> x > 0))").as("n_pos"),
        expr("exists(e, x -> abs(x) > 2)").cast("int").as("any_big"),
        expr("forall(e, x -> abs(x) < 10)").cast("int").as("all_small"),
        round(expr("aggregate(zip_with(e, e, (x, y) -> x * y), 0D, (a, x) -> a + x)"),
          4).as("dot_self"))
      .orderBy(col("vec_id"))

  val hofBatterySql: String =
    """WITH d AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings)
      |SELECT vec_id,
      |  round(list_aggregate(list_transform(e, x -> abs(x)), 'sum'), 4) AS l1,
      |  CAST(len(list_filter(e, x -> x > 0)) AS INT) AS n_pos,
      |  CAST(len(list_filter(e, x -> abs(x) > 2)) > 0 AS INT) AS any_big,
      |  CAST(len(list_filter(e, x -> abs(x) >= 10)) = 0 AS INT) AS all_small,
      |  round(list_dot_product(e, e), 4) AS dot_self
      |FROM d
      |ORDER BY vec_id""".stripMargin

  /** Multiple DISTINCT aggregates over DIFFERENT columns in one query —
    * the shape Spark plans through `Expand`: each input row is
    * replicated once per distinct column (each replica keeping only its
    * column), then a single two-level aggregation dedups and counts all
    * three at once. One pass over the fact table and one shuffle,
    * where the naive alternative is three self-joined single-distinct
    * queries — at 100 TB, three scans versus one. The plain count and
    * sum ride along unchanged.
    */
  def multiDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_linestatus")).as("n_statuses"),
        count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("l_returnflag"))

  val multiDistinctSql: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps,
      |  count(DISTINCT l_linestatus) AS n_statuses,
      |  count(*) AS n_rows,
      |  round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Batch sliding-window aggregation via the SAME `window()` function
    * the streaming paths use ([[graft.streaming.EventTime]]): each
    * event lands in windowLen/slide = 2 epoch-aligned 2-hour windows,
    * and Catalyst expands that membership row-locally (a generator,
    * not a join against a window table), so the whole query is one
    * explode-then-hash-agg with output bounded by |windows| × |types|.
    * Batch/stream symmetry of the window assignment is what lets a
    * backfill reuse the streaming query's semantics verbatim.
    */
  def slidingWindowAgg(spark: SparkSession, dir: String): DataFrame =
    slidingWindowAgg(Tables.events(spark, dir), "ts", "event_type", "value",
      "2 hours", "1 hour")

  /** DataFrame-first form over any (timestamp, key, value) frame. */
  def slidingWindowAgg(events: DataFrame, tsCol: String, keyCol: String,
                       valCol: String, windowLen: String, slide: String): DataFrame =
    events
      .groupBy(window(col(tsCol), windowLen, slide), col(keyCol).as("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col(valCol)), 2).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("w_start_sec"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("w_start_sec"), col("event_type"))

  val slidingWindowAggSql: String =
    """WITH e AS (
      |  SELECT event_type, value,
      |    epoch_us(date_trunc('hour', ts)) // 1000000 AS h
      |  FROM events),
      |w AS (
      |  SELECT event_type, value, h - 3600 AS w_start FROM e
      |  UNION ALL
      |  SELECT event_type, value, h AS w_start FROM e)
      |SELECT w_start AS w_start_sec, event_type, count(*) AS n_events,
      |  round(sum(value), 2) AS sum_value
      |FROM w GROUP BY w_start, event_type
      |ORDER BY w_start, event_type""".stripMargin

  /** MERGE INTO / snapshot-maintenance shape: a base snapshot (latest
    * state per user before the split date) has a changelog (events on
    * or after it) applied — the incremental-pipeline pattern where
    * yesterday's compacted table absorbs today's delta. Both sides
    * compact via the mergeable max(struct) argmax ([[latestByKey]]) so
    * each shuffles at most one row per key; the merge itself is a
    * single full-outer hash join: change-side `error` tombstones
    * delete, other change rows update or insert, untouched base rows
    * carry forward. No window, no sort, no driver round-trip — at
    * 100 TB this is two keyed compactions and one keyed join.
    */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame =
    mergeUpsert(
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), unix_timestamp(col("ts")).as("es"), col("ts")),
      lit("2024-01-16").cast("timestamp"))

  /** DataFrame-first form over any (user_id, event_id, event_type,
    * value, es, ts) changelog; rows with ts at or past `split` are the
    * delta, `event_type = "error"` is the tombstone marker.
    */
  def mergeUpsert(e: DataFrame, split: Column): DataFrame = {
    def latest(df: DataFrame): DataFrame = df.groupBy(col("user_id"))
      .agg(max(struct(col("es"), col("event_id"), col("event_type"),
        col("value"))).as("m"))
    val base = latest(e.filter(col("ts") < split))
      .select(col("user_id"), col("m.value").as("base_value"),
        col("m.es").as("base_es"))
    val chg = latest(e.filter(col("ts") >= split))
      .select(col("user_id"),
        (col("m.event_type") === "error").as("is_delete"),
        col("m.value").as("chg_value"), col("m.es").as("chg_es"))
    base.join(chg, Seq("user_id"), "full_outer")
      .filter(!coalesce(col("is_delete"), lit(false)))
      .select(col("user_id"),
        round(coalesce(col("chg_value"), col("base_value")), 2).as("value"),
        coalesce(col("chg_es"), col("base_es")).as("last_ts_sec"),
        when(col("chg_es").isNull, "kept")
          .when(col("base_es").isNull, "inserted")
          .otherwise("updated").as("action"))
      .orderBy(col("user_id"))
  }

  val mergeUpsertSql: String =
    """WITH base AS (
      |  SELECT user_id, value AS base_value,
      |    (CASE WHEN epoch_us(ts) < 0 THEN (epoch_us(ts)+1) // 1000000 - 1 ELSE epoch_us(ts) // 1000000 END) AS base_es,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY (CASE WHEN epoch_us(ts) < 0 THEN (epoch_us(ts)+1) // 1000000 - 1 ELSE epoch_us(ts) // 1000000 END) DESC, event_id DESC) AS rn
      |  FROM events WHERE ts < TIMESTAMP '2024-01-16'),
      |chg AS (
      |  SELECT user_id, event_type = 'error' AS is_delete,
      |    value AS chg_value, (CASE WHEN epoch_us(ts) < 0 THEN (epoch_us(ts)+1) // 1000000 - 1 ELSE epoch_us(ts) // 1000000 END) AS chg_es,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY (CASE WHEN epoch_us(ts) < 0 THEN (epoch_us(ts)+1) // 1000000 - 1 ELSE epoch_us(ts) // 1000000 END) DESC, event_id DESC) AS rn
      |  FROM events WHERE ts >= TIMESTAMP '2024-01-16')
      |SELECT user_id,
      |  round(coalesce(c.chg_value, b.base_value), 2) AS value,
      |  coalesce(c.chg_es, b.base_es) AS last_ts_sec,
      |  CASE WHEN c.chg_es IS NULL THEN 'kept'
      |       WHEN b.base_es IS NULL THEN 'inserted'
      |       ELSE 'updated' END AS action
      |FROM (SELECT * FROM base WHERE rn = 1) b
      |FULL OUTER JOIN (SELECT * FROM chg WHERE rn = 1) c USING (user_id)
      |WHERE NOT coalesce(c.is_delete, false)
      |ORDER BY user_id""".stripMargin

  /** Equi-width numeric histogram of order totals: the bucket id is a
    * row-local floor division, so the whole histogram is one
    * partial+final hash agg over ≤ |buckets| groups — scan speed at
    * any scale. (Equi-DEPTH histograms at scale go through
    * approx_percentile — see [[approxPercentiles]] — never a global
    * ntile sort.)
    */
  def histogram(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select((floor(col("o_totalprice") / 50000) * 50000).cast("long").as("bucket_lo"),
        col("o_totalprice"))
      .groupBy(col("bucket_lo"))
      .agg(count(lit(1)).as("n_orders"),
        round(min(col("o_totalprice")), 2).as("min_price"),
        round(max(col("o_totalprice")), 2).as("max_price"))
      .orderBy(col("bucket_lo"))

  val histogramSql: String =
    """SELECT CAST(floor(o_totalprice / 50000) * 50000 AS BIGINT) AS bucket_lo,
      |  count(*) AS n_orders,
      |  round(min(o_totalprice), 2) AS min_price,
      |  round(max(o_totalprice), 2) AS max_price
      |FROM orders
      |GROUP BY 1
      |ORDER BY bucket_lo""".stripMargin

  /** Grouped argmax: each nation's dominant market segment — the
    * `max(struct(metric, key))` pick again ([[latestByKey]]), stacked
    * on a keyed count. Deterministic under count ties via the segment
    * name in the struct; both levels are partial+final hash aggs.
    */
  def argmaxSegment(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("n_name"))
      .agg(max(struct(col("cnt"), col("c_mktsegment"))).as("m"),
        sum(col("cnt")).as("n_customers"))
      .select(col("n_name"), col("m.c_mktsegment").as("top_segment"),
        col("m.cnt").as("top_count"), col("n_customers"))
      .orderBy(col("n_name"))
  }

  val argmaxSegmentSql: String =
    """WITH seg AS (
      |  SELECT n_name, c_mktsegment, count(*) AS cnt
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name, c_mktsegment),
      |r AS (
      |  SELECT n_name, c_mktsegment, cnt,
      |    row_number() OVER (PARTITION BY n_name
      |      ORDER BY cnt DESC, c_mktsegment DESC) AS rn,
      |    CAST(sum(cnt) OVER (PARTITION BY n_name) AS BIGINT) AS n_customers
      |  FROM seg)
      |SELECT n_name, c_mktsegment AS top_segment, cnt AS top_count, n_customers
      |FROM r WHERE rn = 1
      |ORDER BY n_name""".stripMargin

  /** TPC-H Q7 shape (volume shipping): bilateral trade revenue between
    * supplier region and customer region by ship year, through a
    * five-way join — lineitem ⋈ supplier ⋈ orders ⋈ customer plus TWO
    * roles of the (nation ⋈ region) dim. The dims are broadcast; the
    * fact-fact join (lineitem ⋈ orders) shuffles on the order key; the
    * output is bounded by |regions|² × |years|. (Regions rather than a
    * nation pair so the result is non-empty at every scale factor —
    * the smallest test corpus covers only 10 of 25 nations.)
    */
  def volumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val nr = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir), col("n_regionkey") === col("r_regionkey"))
    val n1 = nr.select(col("n_nationkey").as("s_nk"), col("r_name").as("supp_region"))
    val n2 = nr.select(col("n_nationkey").as("c_nk"), col("r_name").as("cust_region"))
    Tables.lineitem(spark, dir)
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .groupBy(col("supp_region"), col("cust_region"),
        year(col("l_shipdate")).as("l_year"))
      // sum exact integer CENTS, not doubles: each row rounds
      // deterministically on both engines, and the BIGINT sum is
      // order-independent — round(sum(double)) flips the last cent
      // whenever the engines' summation orders differ at a .005 boundary
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
        .cast("long")).as("revenue_cents"))
      .orderBy(col("supp_region"), col("cust_region"), col("l_year"))
  }

  val volumeShippingSql: String =
    """SELECT supp_region, cust_region, l_year,
      |  CAST(sum(CAST(round(volume * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM (
      |  SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
      |    CAST(year(l_shipdate) AS INT) AS l_year,
      |    l_extendedprice * (1 - l_discount) AS volume
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey) t
      |GROUP BY supp_region, cust_region, l_year
      |ORDER BY supp_region, cust_region, l_year""".stripMargin
}
