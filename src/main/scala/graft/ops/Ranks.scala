package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed ranking, and the two classical statistics built
  * on it: Spearman rank correlation and the Gini coefficient.
  *
  * Ranking is where naive Spark plans silently stop scaling: a
  * `rank().over(Window.partitionBy(group).orderBy(v))` funnels every
  * row of a group through ONE task, so five market segments at 100 TB
  * become five executor-melting sorts. This module never ranks rows.
  * It ranks the VALUE CENSUS — one row per distinct (group, value)
  * with its count — via a TWO-LEVEL PREFIX SCAN, the distributed
  * scan-primitive classic (Blelloch 1990):
  *
  *  1. fine: within each (group, bucket = v DIV width) a running sum
  *     of counts ordered by value — partitioned by (group, bucket),
  *     so parallelism is #buckets, not #groups;
  *  2. coarse: per (group, bucket) subtotals, prefix-summed per group
  *     — a frame with one row per OCCUPIED BUCKET (bounded by the
  *     value RANGE over the width, independent of corpus row count).
  *
  * `lt(v)` — rows strictly below v — is the coarse prefix plus the
  * fine prefix, and the tie-averaged rank every statistic below needs
  * comes out exactly, in integers, as the DOUBLED rank
  * `dr = 2·lt + cnt + 1` (= rank_min + rank_max, so tie groups carry
  * their average rank with no fraction). Both engines derive the same
  * integers — DuckDB via plain rank windows (single-node, its sort is
  * fine), Spark via the scan — and every downstream moment is an
  * order-independent integer sum.
  *
  * The reference (`/root/reference/batch_processor.go:1-194`) has no
  * analytics surface; these are north-star capability ops.
  */
object Ranks {

  /** Doubled tie-averaged ranks over a value census.
    *
    * Input: one row per distinct (g, v) with `cnt` ≥ 1 occurrences
    * (integral v — negative values are handled: bucketing uses the
    * exact pmod floor form, not truncating DIV). Output adds
    * `lt` (rows strictly below v within g) and `dr = 2·lt + cnt + 1`.
    *
    * `bucketWidth` trades the two levels off: the coarse frame holds
    * (value range / width) rows per group, the fine windows sort at
    * most `width` distinct values each. Callers pick a width that
    * keeps BOTH bounded — for a value domain spanning R, √R is the
    * balanced default.
    */
  def doubledRanks(census: DataFrame, bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val b = census.withColumn("bk",
      expr(s"CAST((v - pmod(v, $bucketWidth)) / $bucketWidth AS BIGINT)"))
    val coarse = b.groupBy(col("g"), col("bk"))
      .agg(sum(col("cnt")).as("bc"))
      .withColumn("cb",
        sum(col("bc")).over(Window.partitionBy(col("g")).orderBy(col("bk")))
          - col("bc"))
      .select(col("g"), col("bk"), col("cb"))
    b.join(coarse, Seq("g", "bk"))
      .withColumn("fb",
        sum(col("cnt")).over(
          Window.partitionBy(col("g"), col("bk")).orderBy(col("v")))
          - col("cnt"))
      .withColumn("lt", col("cb") + col("fb"))
      .withColumn("dr", lit(2L) * col("lt") + col("cnt") + lit(1L))
      .select(col("g"), col("v"), col("cnt"), col("lt"), col("dr"))
  }

  /** Weighted exclusive prefix over a value census: like
    * [[doubledRanks]] but scanning an arbitrary integral weight column
    * — `ltw(v)` = Σ wt over values strictly below v within g. The
    * count scan ranks; the weight scan powers cumulative-share
    * statistics (Pareto / ABC cuts, Lorenz curves) with the same
    * two-level shape.
    */
  def weightedPrefix(census: DataFrame, bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val b = census.withColumn("bk",
      expr(s"CAST((v - pmod(v, $bucketWidth)) / $bucketWidth AS BIGINT)"))
    val coarse = b.groupBy(col("g"), col("bk"))
      .agg(sum(col("wt")).as("bw"))
      .withColumn("cw",
        sum(col("bw")).over(Window.partitionBy(col("g")).orderBy(col("bk")))
          - col("bw"))
      .select(col("g"), col("bk"), col("cw"))
    b.join(coarse, Seq("g", "bk"))
      .withColumn("fw",
        sum(col("wt")).over(
          Window.partitionBy(col("g"), col("bk")).orderBy(col("v")))
          - col("wt"))
      .withColumn("ltw", col("cw") + col("fw"))
      .drop("bk", "cw", "fw")
  }

  /** Census width for order-price cents: the price DOMAIN is a fixed
    * range (it does not grow with SF), ~9e4..6e7 cents, so 2^16 keeps
    * ~1k coarse buckets and ≤65536-value fine sorts.
    */
  private val PriceBucketWidth = 1L << 16

  /** Spearman rank correlation between order price and order line
    * count, per market segment — the monotone-association complement
    * of [[Diagnostics.linReg]]'s linear fit: ρ is Pearson computed on
    * tie-averaged ranks, so a relationship that is monotone but curved
    * still scores 1. Ranks come from [[doubledRanks]] (exact doubled
    * integers, two-level scan — see the module doc for why per-row
    * rank windows are banned); the row frame reaches its two rank
    * frames by value-keyed equi-joins, all moments accumulate in
    * DECIMAL(38,0) (dr² sums pass the BIGINT ceiling near SF100), and
    * the final ρ is ONE shared double expression tree, NULL for a
    * degenerate (all-tied) margin.
    *
    * Scale posture: one per-order aggregation, one orders equi-join +
    * one broadcast dim join, two census aggregations (keyed on
    * (segment, value) — well spread), the two bounded scan windows,
    * two value-keyed row joins, one k-row final aggregate. No per-row
    * window anywhere.
    */
  def spearman(spark: SparkSession, dir: String): DataFrame = {
    val perOrder = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("y"))
    val rows = Tables.orders(spark, dir)
      .join(perOrder, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment").as("segment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("segment"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("x"), col("y"))
    spearman(rows, "segment", "x", "y", PriceBucketWidth)
  }

  /** DataFrame-first form over any (group, x, y) frame with integral
    * x/y. `bucketWidth` buckets BOTH margins' censuses (pick by the
    * wider value range).
    */
  def spearman(df: DataFrame, groupCol: String, xCol: String, yCol: String,
               bucketWidth: Long): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val rows = df.select(col(groupCol).as("g"), col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
    def ranks(c: String) = doubledRanks(
      rows.groupBy(col("g"), col(c).as("v")).agg(count(lit(1)).as("cnt")),
      bucketWidth)
      .select(col("g"), col("v").as(c), col("dr").as(s"dr$c"))
    val ranked = rows
      .join(ranks("x"), Seq("g", "x"))
      .join(ranks("y"), Seq("g", "y"))
    def dec(c: Column) = c.cast(DecimalType(38, 0))
    val m = ranked.groupBy(col("g")).agg(
      count(lit(1)).as("n"),
      sum(col("drx")).as("sx"), sum(col("dry")).as("sy"),
      sum(dec(col("drx")) * dec(col("drx"))).as("sxx"),
      sum(dec(col("drx")) * dec(col("dry"))).as("sxy"),
      sum(dec(col("dry")) * dec(col("dry"))).as("syy"))
    def d(name: String) = col(name).cast("double")
    val num = d("n") * d("sxy") - d("sx") * d("sy")
    val denx = d("n") * d("sxx") - d("sx") * d("sx")
    val deny = d("n") * d("syy") - d("sy") * d("sy")
    m.select(col("g").as("segment"), col("n").as("n_orders"),
        when(denx === 0d || deny === 0d, lit(null))
          .otherwise(round(num / sqrt(denx * deny), 6)).as("rho"))
      .orderBy(col("segment"))
  }

  /** DuckDB twin of [[spearman]]: the identical doubled ranks via
    * plain rank windows (lt = rank() − 1), HUGEINT moments, the same
    * double tail.
    */
  val spearmanSql: String =
    """WITH po AS (
      |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS y
      |  FROM lineitem GROUP BY 1),
      |r AS (
      |  SELECT c_mktsegment AS g,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS x, y
      |  FROM orders JOIN po ON o_orderkey = l_orderkey
      |  JOIN customer ON o_custkey = c_custkey),
      |rk AS (
      |  SELECT g, x, y,
      |    2 * rank() OVER (PARTITION BY g ORDER BY x)
      |      + count(*) OVER (PARTITION BY g, x) - 1 AS drx,
      |    2 * rank() OVER (PARTITION BY g ORDER BY y)
      |      + count(*) OVER (PARTITION BY g, y) - 1 AS dry
      |  FROM r),
      |m AS (
      |  SELECT g, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(drx) AS BIGINT) AS sx, CAST(sum(dry) AS BIGINT) AS sy,
      |    sum(CAST(drx AS HUGEINT) * drx) AS sxx,
      |    sum(CAST(drx AS HUGEINT) * dry) AS sxy,
      |    sum(CAST(dry AS HUGEINT) * dry) AS syy
      |  FROM rk GROUP BY g)
      |SELECT g AS segment, n AS n_orders,
      |  CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx = 0
      |         OR CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy = 0
      |       THEN NULL
      |       ELSE round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |                   - CAST(sx AS DOUBLE) * sy)
      |                  / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |                          - CAST(sx AS DOUBLE) * sx)
      |                         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |                            - CAST(sy AS DOUBLE) * sy)), 6)
      |  END AS rho
      |FROM m ORDER BY segment""".stripMargin

  /** Bin count for [[quantileBins]]. */
  private val NBins = 10

  /** Equal-frequency (decile) binning of order prices per market
    * segment — the feature-bucketization pass an ML pipeline runs
    * before hashing continuous features, and the exact distributed
    * answer to the `ntile()` window nobody should run over a fact
    * table. A row's bin is its empirical-CDF decile computed at the
    * VALUE level, `bin = (lt·B) DIV n + 1`: tie groups land whole in
    * one bin (ntile's row-position splits are engine-dependent on
    * ties; CDF binning is deterministic by construction), so bins are
    * only approximately equal-frequency in the presence of ties — the
    * honest version. Emits per (segment, bin): row count and the
    * exact [lo, hi] cent boundaries, everything integer.
    *
    * Scale posture: census aggregate + the [[doubledRanks]] two-level
    * scan + one bounded aggregate. No row ever meets a window.
    */
  def quantileBins(spark: SparkSession, dir: String): DataFrame = {
    val rows = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment").as("segment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("segment"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"))
    quantileBins(rows, "segment", "v", NBins, PriceBucketWidth)
  }

  /** DataFrame-first form over a (group, value) frame. */
  def quantileBins(df: DataFrame, groupCol: String, vCol: String,
                   nBins: Int, bucketWidth: Long): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    val census = df.select(col(groupCol).as("g"), col(vCol).cast("long").as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
    val n = census.groupBy(col("g")).agg(sum(col("cnt")).as("n"))
    doubledRanks(census, bucketWidth)
      .join(n, Seq("g"))
      .withColumn("bin", (expr(s"lt * $nBins DIV n") + 1L).cast("int"))
      .groupBy(col("g"), col("bin"))
      .agg(sum(col("cnt")).as("n_rows"), min(col("v")).as("lo"),
        max(col("v")).as("hi"))
      .select(col("g").as("segment"), col("bin"), col("n_rows"),
        col("lo").as("lo_cents"), col("hi").as("hi_cents"))
      .orderBy(col("segment"), col("bin"))
  }

  /** DuckDB twin of [[quantileBins]] — value-level CDF binning via a
    * census window.
    */
  val quantileBinsSql: String =
    """WITH r AS (
      |  SELECT c_mktsegment AS g,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |cen AS (
      |  SELECT g, v, CAST(count(*) AS BIGINT) AS cnt FROM r GROUP BY g, v),
      |rk AS (
      |  SELECT g, v, cnt,
      |    CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v) AS BIGINT) - cnt
      |      AS lt
      |  FROM cen),
      |n AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n FROM cen GROUP BY g)
      |SELECT g AS segment, CAST(lt * 10 // n + 1 AS INT) AS bin,
      |  CAST(sum(cnt) AS BIGINT) AS n_rows,
      |  CAST(min(v) AS BIGINT) AS lo_cents, CAST(max(v) AS BIGINT) AS hi_cents
      |FROM rk JOIN n USING (g)
      |GROUP BY g, lt * 10 // n + 1
      |ORDER BY segment, bin""".stripMargin

  /** Census width for customer lifetime spend in cents: spend per
    * customer is bounded by orders-per-customer (constant in SF) times
    * the price ceiling, ~5e8 cents, so 2^22 keeps ~128 coarse buckets.
    */
  private val SpendBucketWidth = 1L << 22

  /** Gini coefficient of customer lifetime spend per nation — the
    * classical inequality measure ("how concentrated is revenue on few
    * customers?"), the smooth complement of
    * [[Analytics.revenueConcentration]]'s discrete top-share cuts.
    * With tie-averaged ranks the mean-difference form collapses to
    *   G = (Σᵢ xᵢ·2r̄ᵢ − (n+1)·Σx) / (n·Σx)
    * and with [[doubledRanks]] the numerator is the exact integer
    * Σ_v cnt·v·dr − (n+1)·Σx, accumulated in DECIMAL(38,0) — no row
    * ever needs its own rank, the whole statistic folds over the
    * census. One shared double division at the end; NULL for nations
    * with zero total spend or a single customer.
    *
    * Scale posture: per-customer aggregate (the only corpus shuffle),
    * broadcast nation dim, census aggregate, two bounded scan windows,
    * k-row final fold. Gini at 100 TB costs two scans and change.
    */
  def gini(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("v"))
    val byNation = spend
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("g"), col("v"))
    gini(byNation, "g", "v", SpendBucketWidth)
  }

  /** DataFrame-first form over a (group, value) frame with integral
    * non-negative values.
    */
  def gini(df: DataFrame, groupCol: String, vCol: String,
           bucketWidth: Long): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val census = df.select(col(groupCol).as("g"), col(vCol).cast("long").as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
    def dec(c: Column) = c.cast(DecimalType(38, 0))
    val m = doubledRanks(census, bucketWidth)
      .groupBy(col("g")).agg(
        sum(col("cnt")).as("n"),
        sum(col("cnt") * col("v")).as("sv"),
        sum(dec(col("cnt")) * dec(col("v")) * dec(col("dr"))).as("svdr"))
    def d(name: String) = col(name).cast("double")
    m.select(col("g").as("nation"), col("n").as("n_customers"),
        col("sv").as("total_spend_cents"),
        when(col("n") < 2 || col("sv") <= 0, lit(null))
          .otherwise(round(
            (d("svdr") - (d("n") + 1d) * d("sv")) / (d("n") * d("sv")), 6))
          .as("gini"))
      .orderBy(col("nation"))
  }

  /** Lorenz curve of customer lifetime spend per nation — the decile
    * view behind [[gini]]'s single number: customers are CDF-binned
    * into spend deciles ([[quantileBins]]' value-level rule, tie
    * groups whole) and each decile reports its exact customer count,
    * spend, and ppm share plus the cumulative ppm running up the
    * curve ("the bottom 80% of customers hold X% of spend"). Shares
    * are single truncating divisions of exact integers — the
    * CUMULATIVE share divides the cumulative spend directly rather
    * than summing rounded per-bin shares, so it carries no
    * accumulated quantization dust and ends at exactly 1e6.
    *
    * Scale posture: census + two-level scan as [[gini]]; the decile
    * aggregate is value-keyed; the cumulative window sees ≤ nBins
    * rows per group.
    */
  def lorenz(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("v"))
    val byNation = spend
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("g"), col("v"))
    lorenz(byNation, "g", "v", 10, SpendBucketWidth)
  }

  /** DataFrame-first form over a (group, value) frame. */
  def lorenz(df: DataFrame, groupCol: String, vCol: String, nBins: Int,
             bucketWidth: Long): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val census = df.select(col(groupCol).as("g"), col(vCol).cast("long").as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
    val n = census.groupBy(col("g")).agg(sum(col("cnt")).as("n"),
      sum(col("cnt").cast(DecimalType(38, 0)) * col("v")).as("tot"))
    val bins = doubledRanks(census, bucketWidth)
      .join(n, Seq("g"))
      .withColumn("bin", (expr(s"lt * $nBins DIV n") + 1L).cast("int"))
      .groupBy(col("g"), col("bin"))
      .agg(sum(col("cnt")).as("n_customers"),
        sum(col("cnt").cast(DecimalType(38, 0)) * col("v")).as("spend"),
        max(col("tot")).as("tot"))
    val cumW = Window.partitionBy(col("g")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bins
      .withColumn("cum", sum(col("spend")).over(cumW))
      .select(col("g").as("nation"), col("bin"), col("n_customers"),
        col("spend").cast("long").as("spend_cents"),
        expr("CAST(spend * 1000000 DIV tot AS BIGINT)").as("share_ppm"),
        expr("CAST(cum * 1000000 DIV tot AS BIGINT)").as("cum_share_ppm"))
      .orderBy(col("nation"), col("bin"))
  }

  /** DuckDB twin of [[lorenz]] — census CDF bins, HUGEINT shares. */
  val lorenzSql: String =
    """WITH sp AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
      |  FROM orders GROUP BY 1),
      |r AS (
      |  SELECT n_name AS g, v
      |  FROM sp JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey),
      |cen AS (
      |  SELECT g, v, CAST(count(*) AS BIGINT) AS cnt FROM r GROUP BY g, v),
      |n AS (
      |  SELECT g, CAST(sum(cnt) AS BIGINT) AS n,
      |    CAST(sum(CAST(cnt AS HUGEINT) * v) AS HUGEINT) AS tot
      |  FROM cen GROUP BY g),
      |rk AS (
      |  SELECT g, v, cnt,
      |    CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v) AS BIGINT) - cnt
      |      AS lt
      |  FROM cen),
      |bins AS (
      |  SELECT rk.g, CAST(lt * 10 // n + 1 AS INT) AS bin,
      |    CAST(sum(cnt) AS BIGINT) AS n_customers,
      |    CAST(sum(CAST(cnt AS HUGEINT) * v) AS HUGEINT) AS spend,
      |    max(tot) AS tot
      |  FROM rk JOIN n USING (g)
      |  GROUP BY rk.g, lt * 10 // n + 1)
      |SELECT g AS nation, bin, n_customers,
      |  CAST(spend AS BIGINT) AS spend_cents,
      |  CAST(spend * 1000000 // tot AS BIGINT) AS share_ppm,
      |  CAST(sum(spend) OVER (PARTITION BY g ORDER BY bin
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |       * 1000000 // tot AS BIGINT) AS cum_share_ppm
      |FROM bins
      |ORDER BY nation, bin""".stripMargin

  /** DuckDB twin of [[gini]]: same census, rank-window doubled ranks,
    * HUGEINT numerator, same tail.
    */
  val giniSql: String =
    """WITH sp AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
      |  FROM orders GROUP BY 1),
      |r AS (
      |  SELECT n_name AS g, v
      |  FROM sp JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey),
      |cen AS (
      |  SELECT g, v, CAST(count(*) AS BIGINT) AS cnt FROM r GROUP BY g, v),
      |rk AS (
      |  SELECT g, v, cnt,
      |    2 * (CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v) AS BIGINT) - cnt)
      |      + cnt + 1 AS dr
      |  FROM cen),
      |m AS (
      |  SELECT g, CAST(sum(cnt) AS BIGINT) AS n,
      |    CAST(sum(cnt * v) AS BIGINT) AS sv,
      |    sum(CAST(cnt AS HUGEINT) * v * dr) AS svdr
      |  FROM rk GROUP BY g)
      |SELECT g AS nation, n AS n_customers, sv AS total_spend_cents,
      |  CASE WHEN n < 2 OR sv <= 0 THEN NULL
      |       ELSE round((CAST(svdr AS DOUBLE) - (CAST(n AS DOUBLE) + 1)
      |                   * CAST(sv AS DOUBLE))
      |                  / (CAST(n AS DOUBLE) * CAST(sv AS DOUBLE)), 6)
      |  END AS gini
      |FROM m ORDER BY nation""".stripMargin

  /** Exact weighted median per group — the order statistic that
    * `percentile_approx` only approximates and no built-in computes
    * weighted: the smallest value whose CUMULATIVE WEIGHT reaches
    * half the group total (`2·(ltw + wt) ≥ W`, exact integers, lower
    * weighted median convention). Rides [[weightedPrefix]]'s
    * two-level scan over the value census, so no per-row sort or
    * window exists at any scale; the unweighted median comes from the
    * same frame with cnt as the weight for contrast.
    *
    * Default: quantity-weighted median line price per return flag —
    * "the price of the median shipped UNIT, not the median line".
    */
  def weightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select(
      col("l_returnflag").as("g"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"),
      col("l_quantity").cast("long").as("w"))
    weightedMedian(l, "g", "v", "w", PriceBucketWidth)
  }

  /** DataFrame-first form over a (group, value, integral weight)
    * frame; rows with non-positive weight are excluded (a zero-weight
    * observation cannot move a weighted order statistic).
    *
    * A median is ONE order statistic, so the full two-level scan is
    * overkill: the coarse (bucket-level) prefix alone locates the ≤ 2
    * buckets the half-mass boundaries land in, and only THOSE buckets
    * get a fine scan — on a near-unique value column (prices) this
    * prunes ~99.9% of the fine-window work and drops the
    * census⋈coarse corpus join entirely. Both running sums (weight
    * and count) still ride one shared coarse pass; both medians fall
    * out of a single conditional-min over the pruned rows.
    */
  def weightedMedian(df: DataFrame, groupCol: String, vCol: String,
                     wCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val rows = df
      .select(col(groupCol).as("g"), col(vCol).cast("long").as("v"),
        col(wCol).cast("long").as("w"))
      .filter(col("w") > 0)
      .withColumn("bk",
        expr(s"CAST((v - pmod(v, $bucketWidth)) / $bucketWidth AS BIGINT)"))
    // coarse pass straight off the ROWS — never the (g, v) census: on
    // a near-unique value column the census is corpus-sized and barely
    // map-side-combines, while the (g, bucket) aggregate collapses to
    // a bounded frame in one combine-friendly pass
    val coarseAgg = rows.groupBy(col("g"), col("bk"))
      .agg(sum(col("w")).as("bw"), count(lit(1)).as("bc"))
    val wg = Window.partitionBy(col("g")).orderBy(col("bk"))
    val pre = coarseAgg.select(col("g"), col("bk"), col("bw"), col("bc"),
      (sum(col("bw")).over(wg) - col("bw")).as("cw"),
      (sum(col("bc")).over(wg) - col("bc")).as("cc"))
    val tot = coarseAgg.groupBy(col("g"))
      .agg(sum(col("bw")).as("tw"), sum(col("bc")).as("n"))
    // MEDIAN-BUCKET PRUNING: both medians are single order statistics,
    // so only the (at most two) buckets the half-mass boundaries land
    // in need a fine scan — the coarse prefix alone locates them. The
    // corpus-sized fine window + census⋈coarse join of the naive
    // two-level scan shrink to ≤ 2·bucketWidth values per group.
    // (doubledRanks itself can't prune: its callers need EVERY value's
    // rank. A single quantile doesn't.)
    val pt = pre.join(broadcast(tot), Seq("g"))
    val targets = pt
      .filter(lit(2L) * (col("cw") + col("bw")) >= col("tw"))
      .groupBy(col("g")).agg(min(col("bk")).as("bk"))
      .unionByName(pt
        .filter(lit(2L) * (col("cc") + col("bc")) >= col("n"))
        .groupBy(col("g")).agg(min(col("bk")).as("bk")))
      .distinct()
    val fine = Window.partitionBy(col("g"), col("bk")).orderBy(col("v"))
    rows.join(broadcast(targets), Seq("g", "bk"), "left_semi")
      .groupBy(col("g"), col("bk"), col("v"))
      .agg(sum(col("w")).as("wt"), count(lit(1)).as("cnt"))
      .join(broadcast(pre.select(col("g"), col("bk"), col("cw"),
        col("cc"))), Seq("g", "bk"))
      .select(col("g"), col("v"), col("wt"), col("cnt"),
        (col("cw") + sum(col("wt")).over(fine) - col("wt")).as("ltw"),
        (col("cc") + sum(col("cnt")).over(fine) - col("cnt")).as("ltc"))
      .join(broadcast(tot), Seq("g"))
      .groupBy(col("g"), col("n"), col("tw"))
      .agg(
        min(when(lit(2L) * (col("ltw") + col("wt")) >= col("tw"), col("v")))
          .as("wmedian_cents"),
        min(when(lit(2L) * (col("ltc") + col("cnt")) >= col("n"), col("v")))
          .as("median_cents"))
      .select(col("g"), col("n"), col("tw").as("total_weight"),
        col("wmedian_cents"), col("median_cents"))
      .orderBy(col("g"))
  }

  val weightedMedianSql: String =
    """WITH q AS (
      |  SELECT l_returnflag AS g,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
      |    CAST(l_quantity AS BIGINT) AS w
      |  FROM lineitem WHERE l_quantity > 0),
      |c AS (
      |  SELECT g, v, CAST(sum(w) AS BIGINT) AS wt, count(*) AS cnt
      |  FROM q GROUP BY g, v),
      |t AS (
      |  SELECT g, CAST(sum(wt) AS BIGINT) AS tw,
      |    CAST(sum(cnt) AS BIGINT) AS n
      |  FROM c GROUP BY g),
      |pf AS (
      |  SELECT g, v, wt, cnt,
      |    sum(wt) OVER (PARTITION BY g ORDER BY v) - wt AS ltw,
      |    sum(cnt) OVER (PARTITION BY g ORDER BY v) - cnt AS ltc
      |  FROM c),
      |wm AS (
      |  SELECT pf.g, min(v) AS wmedian_cents
      |  FROM pf JOIN t ON pf.g = t.g
      |  WHERE 2 * (ltw + wt) >= tw GROUP BY pf.g),
      |um AS (
      |  SELECT pf.g, min(v) AS median_cents
      |  FROM pf JOIN t ON pf.g = t.g
      |  WHERE 2 * (ltc + cnt) >= n GROUP BY pf.g)
      |SELECT t.g, n, tw AS total_weight, wmedian_cents, median_cents
      |FROM t JOIN wm ON t.g = wm.g JOIN um ON t.g = um.g
      |ORDER BY t.g""".stripMargin

  /** Top-order-statistics count for [[hillTail]]. */
  private val HillK = 50L

  /** Hill tail-index estimator per group (Hill 1975) — the standard
    * "how heavy is the spending tail" diagnostic pairing the
    * frequency-side [[graft.ops.TextAnalysis]] Zipf fit:
    * `α̂ = k / Σᵢ ln(x₍ᵢ₎/x₍ₖ₎)` over the k largest values. Small α̂
    * (≈1–2) = whale-dominated, large = thin tail.
    *
    * Order statistics come from the census, not a sort: `gt(v)` =
    * count strictly above v falls out of [[doubledRanks]]
    * (`n − lt − cnt`), the k-th largest value is the smallest v with
    * `gt < k`, and each tied value contributes `min(cnt, k − gt)`
    * top-k slots — so ties at the boundary are handled exactly and
    * deterministically. Each value's `occ·ln(v/x₍ₖ₎)` term is
    * micro-rounded before the per-group integer sum (the module's
    * order-free-summation rule). Groups smaller than k use all
    * their values (k_eff < k); an all-tied top block (zero sum)
    * reports NULL.
    */
  def hillTail(spark: SparkSession, dir: String): DataFrame = {
    // g is constant per customer, so grouping by (custkey, g) on the
    // shared segment-labeled fact equals the spend⋈dim join
    val bySeg = SegOrders(spark, dir)
      .groupBy(col("o_custkey"), col("g"))
      .agg(sum(col("cents")).as("v"))
      .select(col("g"), col("v"))
    hillTail(bySeg, "g", "v", HillK, SpendBucketWidth)
  }

  /** DataFrame-first form over a (group, positive integral value)
    * frame.
    */
  def hillTail(df: DataFrame, groupCol: String, vCol: String, k: Long,
               bucketWidth: Long): DataFrame = {
    require(k >= 2, s"hillTail: k=$k")
    val census = df
      .select(col(groupCol).as("g"), col(vCol).cast("long").as("v"))
      .filter(col("v") > 0) // ln needs positive support
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
    val n = census.groupBy(col("g")).agg(sum(col("cnt")).as("n"))
    val ranked = doubledRanks(census, bucketWidth)
      .join(n, Seq("g"))
      .withColumn("gt", col("n") - col("lt") - col("cnt"))
      .filter(col("gt") < k)
      .withColumn("occ", least(col("cnt"), lit(k) - col("gt")))
    val xmin = ranked.groupBy(col("g"))
      .agg(min(col("v")).as("xmin_cents"))
    ranked.join(broadcast(xmin), Seq("g"))
      .select(col("g"), col("n"), col("xmin_cents"), col("occ"),
        round(col("occ") * log(d(col("v")) / d(col("xmin_cents"))) * 1e6)
          .cast("long").as("t_micro"))
      .groupBy(col("g"), col("n"), col("xmin_cents"))
      .agg(sum(col("occ")).as("k_eff"), sum(col("t_micro")).as("s_micro"))
      .select(col("g"), col("n"), col("k_eff"), col("xmin_cents"),
        when(col("s_micro") <= 0, lit(null))
          .otherwise(round(d(col("k_eff")) / (d(col("s_micro")) / 1e6), 4))
          .as("alpha_hill"))
      .orderBy(col("g"))
  }

  private def d(c: Column): Column = c.cast("double")

  val hillTailSql: String =
    """WITH spend AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
      |  FROM orders GROUP BY o_custkey),
      |q AS (
      |  SELECT c_mktsegment AS g, v
      |  FROM spend JOIN customer ON o_custkey = c_custkey
      |  WHERE v > 0),
      |c AS (SELECT g, v, count(*) AS cnt FROM q GROUP BY g, v),
      |r AS (
      |  SELECT g, v, cnt,
      |    sum(cnt) OVER (PARTITION BY g ORDER BY v) - cnt AS lt,
      |    CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
      |  FROM c),
      |t AS (
      |  SELECT g, v, n, n - lt - cnt AS gt,
      |    least(cnt, 50 - (n - lt - cnt)) AS occ
      |  FROM r WHERE n - lt - cnt < 50),
      |x AS (SELECT g, min(v) AS xmin_cents FROM t GROUP BY g),
      |m AS (
      |  SELECT t.g, n, xmin_cents,
      |    CAST(sum(occ) AS BIGINT) AS k_eff,
      |    CAST(sum(CAST(round(occ * ln(CAST(v AS DOUBLE)
      |      / CAST(xmin_cents AS DOUBLE)) * 1e6) AS BIGINT)) AS BIGINT)
      |      AS s_micro
      |  FROM t JOIN x ON t.g = x.g
      |  GROUP BY t.g, n, xmin_cents)
      |SELECT g, n, k_eff, xmin_cents,
      |  CASE WHEN s_micro <= 0 THEN NULL
      |    ELSE round(CAST(k_eff AS DOUBLE)
      |      / (CAST(s_micro AS DOUBLE) / 1e6), 4) END AS alpha_hill
      |FROM m ORDER BY g""".stripMargin

  /** Tail quantile for [[tailRisk]]: 95th percentile — VaR₉₅ / ES₉₅
    * in the risk vocabulary (here applied to order VALUES: the top 5%
    * of order sizes, the operationally interesting tail for capacity
    * and fraud review).
    */
  private val TailNum = 19L
  private val TailDen = 20L

  /** Value-at-Risk and Expected Shortfall per group — "where does the
    * top 5% of order value start, and how big is a top-5% order on
    * average?": VaR₉₅ = the ⌈0.95·n⌉-th smallest value, ES₉₅ = the
    * exact mean of the k = n − m + 1 largest (the discrete
    * upper-tail convention, boundary ties split by top-k occupancy —
    * the [[hillTail]] rule), plus the tail's share of total value in
    * basis points. ENTIRELY exact integers: the rank position
    * m = (19n + 19) DIV 20 is an integer ceiling, VaR is the smallest
    * census value with lt + cnt ≥ m, ES is one truncating DIV of the
    * DECIMAL(38,0) tail sum — no float percentile interpolation
    * anywhere (`percentile_approx` could not oracle-match and `ntile`
    * splits ties engine-dependently).
    *
    * Scale posture: one (group, value) census, the [[doubledRanks]]
    * two-level scan, a |groups|-bounded totals broadcast, bounded
    * final aggregates. No per-row sort or window at any scale.
    */
  def tailRisk(spark: SparkSession, dir: String): DataFrame =
    tailRisk(SegOrders(spark, dir).select(col("g"), col("cents").as("v")),
      "g", "v", PriceBucketWidth)

  /** DataFrame-first form over a (group, integral value) frame. */
  def tailRisk(df: DataFrame, groupCol: String, vCol: String,
               bucketWidth: Long): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def dec(c: Column) = c.cast(DecimalType(38, 0))
    val census = df
      .select(col(groupCol).as("g"), col(vCol).cast("long").as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
    val tot = census.groupBy(col("g"))
      .agg(sum(col("cnt")).as("n"),
        sum(dec(col("cnt")) * col("v")).as("sv"))
      .withColumn("m",
        expr(s"(CAST($TailNum AS BIGINT) * n + $TailNum) DIV $TailDen"))
      .withColumn("k", col("n") - col("m") + 1)
    // VaR (min census value with lt + cnt ≥ m) and the tail sum (top-k
    // occupancy-weighted) fold in ONE conditional aggregate over ONE
    // evaluation of the ranked census — the previous two-consumer
    // shape (a varF filter-agg plus a tail filter-agg joined back)
    // re-evaluated the census + two-level rank scan twice for no
    // semantic gain (measured ~2× the work at sf0.1)
    val ranked = doubledRanks(census, bucketWidth)
      .join(broadcast(tot), Seq("g"))
      .withColumn("gt", col("n") - col("lt") - col("cnt"))
    ranked
      .groupBy(col("g"), col("n"), col("sv"), col("k"))
      .agg(
        min(when(col("lt") + col("cnt") >= col("m"), col("v")))
          .as("var_cents"),
        sum(when(col("gt") < col("k"),
          dec(least(col("cnt"), col("k") - col("gt"))) * col("v")))
          .as("ts"))
      .select(col("g"), col("n"), col("var_cents"),
        col("k").as("tail_n"),
        expr("CAST(ts * 1000 DIV k AS BIGINT)").as("es_milli"),
        expr("CAST(ts * 10000 DIV sv AS BIGINT)").as("tail_share_bp"))
      .orderBy(col("g"))
  }

  /** DuckDB twin of [[tailRisk]] — same integer ceiling rank, top-k
    * occupancy and truncating HUGEINT folds (plain rank windows are
    * fine single-node).
    */
  val tailRiskSql: String =
    """WITH q AS (
      |  SELECT c_mktsegment AS g,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |c AS (SELECT g, v, CAST(count(*) AS BIGINT) AS cnt
      |      FROM q GROUP BY g, v),
      |r AS (
      |  SELECT g, v, cnt,
      |    sum(cnt) OVER (PARTITION BY g ORDER BY v) - cnt AS lt,
      |    CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS n,
      |    sum(CAST(cnt AS HUGEINT) * v) OVER (PARTITION BY g) AS sv
      |  FROM c),
      |t AS (
      |  SELECT *, (19 * n + 19) // 20 AS m,
      |    n - ((19 * n + 19) // 20) + 1 AS k
      |  FROM r),
      |vf AS (
      |  SELECT g, min(v) AS var_cents FROM t
      |  WHERE lt + cnt >= m GROUP BY g),
      |tl AS (
      |  SELECT g, n, sv, k,
      |    sum(CAST(least(cnt, k - (n - lt - cnt)) AS HUGEINT) * v) AS ts
      |  FROM t WHERE n - lt - cnt < k
      |  GROUP BY g, n, sv, k)
      |SELECT tl.g, n, var_cents, k AS tail_n,
      |  CAST(ts * 1000 // k AS BIGINT) AS es_milli,
      |  CAST(ts * 10000 // sv AS BIGINT) AS tail_share_bp
      |FROM tl JOIN vf ON tl.g = vf.g
      |ORDER BY tl.g""".stripMargin

  /** Kruskal–Wallis H — the k-group extension of [[Mixing.mannWhitney]]
    * (rank-based one-way ANOVA): does at least one group's value
    * distribution sit shifted against the others? Reported per group
    * (n, doubled rank sum) plus the global tie-corrected H and its
    * degrees of freedom, so the caller reads both the test statistic
    * and which group drives it. Rank tests resist the heavy tails that
    * wreck moment-based ANOVA ([[Evaluation.anova]] is the moment
    * sibling over the same shape).
    *
    * Exactness: pooled tie-averaged ranks come out of [[doubledRanks]]
    * as exact DOUBLED integers (dr = rank_min + rank_max), so each
    * group's rank sum r2 = 2·R_g is an exact integer. With
    * dev_g = r2_g − n_g·(N+1) (= 2·n_g·(R̄_g − (N+1)/2), exact), the
    * uncorrected statistic is H = 3/(N(N+1)) · Σ dev_g²/n_g — each
    * group's term is quantized to micro-units by ONE truncating DIV on
    * DECIMAL(38,0) BEFORE the cross-group sum (integer addition is
    * order-free, the engine's cross-engine determinism rule), and the
    * tie correction 1 − Σ(t³−t)/(N³−N) divides ONCE in double at the
    * end. dev² ≤ 4N⁴ bounds exactness to N ≲ 4e7 rows at micro
    * precision — past that, feed a quantized/bucketed measure (the
    * census collapses ties, and H is rank-based so quantization is the
    * statistically honest degradation, not a silent one).
    *
    * Scale posture: one pooled census aggregate, the [[doubledRanks]]
    * two-level scan (no per-row window), one (group, value) census +
    * value-keyed join, one k-row final aggregate. The only
    * unpartitioned windows run inside the scan's bounded frames.
    */
  def kruskalWallis(spark: SparkSession, dir: String): DataFrame =
    // whole-DOLLAR quantization (not cents): rank tests are invariant
    // to any monotone transform up to tie granularity, and the dollar
    // census is ~100× smaller than the near-unique cent census — the
    // quantized-measure degradation the exactness note above
    // recommends, applied by default
    kruskalWallis(
      Tables.orders(spark, dir).select(
        col("o_orderpriority").as("grp"),
        expr("CAST(round(o_totalprice) AS BIGINT)").as("v")),
      "grp", "v", 1L << 10)

  /** DataFrame-first form over any (group, integral value) frame. */
  def kruskalWallis(df: DataFrame, groupCol: String, valCol: String,
                    bucketWidth: Long): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val rows = df.select(col(groupCol).as("grp"), col(valCol).cast("long").as("v"))
    // pooled census: ranks are GLOBAL (across groups), so g is constant
    val pooled = rows.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("g", lit(0L))
    val ranked = doubledRanks(pooled, bucketWidth)
      .select(col("v"), col("dr"))
    def dec(c: Column) = c.cast(DecimalType(38, 0))
    val tot = pooled.agg(
      sum(col("cnt")).as("n_tot"),
      sum(dec(col("cnt")) * dec(col("cnt")) * dec(col("cnt"))
        - dec(col("cnt"))).as("tie_sum"),
      count(lit(1)).as("n_distinct"))
    val perGrp = rows.groupBy(col("grp"), col("v"))
      .agg(count(lit(1)).as("scnt"))
      .join(ranked, Seq("v"))
      .groupBy(col("grp"))
      .agg(sum(col("scnt")).as("n"),
        sum(dec(col("scnt")) * dec(col("dr"))).as("r2"))
    val k = perGrp.agg(count(lit(1)).as("df_plus1"))
    val scored = perGrp.crossJoin(broadcast(tot)).crossJoin(broadcast(k))
      .withColumn("dev", col("r2") - dec(col("n")) * dec(col("n_tot") + 1))
      .withColumn("h_term_micro",
        expr("CAST(3 * dev * dev * 1000000 DIV " +
          "(CAST(n AS DECIMAL(38,0)) * n_tot * (n_tot + 1)) AS BIGINT)"))
    val h = scored.groupBy(col("n_tot"), col("tie_sum"), col("df_plus1"))
      .agg(sum(col("h_term_micro")).as("h_micro"))
      .withColumn("denom",
        dec(col("n_tot")) * dec(col("n_tot")) * dec(col("n_tot"))
          - dec(col("n_tot")))
      .select(col("h_micro").cast("long").as("h_micro"),
        (col("df_plus1") - 1).as("df"),
        when(col("denom") === col("tie_sum") || col("denom") <= 0, lit(null))
          .otherwise(round(
            (col("h_micro").cast("double") / 1e6) /
              (lit(1.0) - col("tie_sum").cast("double")
                / col("denom").cast("double")), 4)).as("h_adj"))
    perGrp.select(col("grp"), col("n"), col("r2").cast("long").as("r2"))
      .crossJoin(broadcast(h))
      .orderBy(col("grp"))
  }

  /** DuckDB twin of [[kruskalWallis]]: identical doubled pooled ranks
    * via plain windows, HUGEINT moments, the same per-group truncating
    * micro DIV before the cross-group sum, one double tail.
    */
  val kruskalWallisSql: String =
    """WITH r AS (
      |  SELECT o_orderpriority AS grp,
      |    CAST(round(o_totalprice) AS BIGINT) AS v
      |  FROM orders),
      |pooled AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM r GROUP BY v),
      |rk AS (
      |  SELECT v, 2 * (sum(cnt) OVER (ORDER BY v) - cnt) + cnt + 1 AS dr
      |  FROM pooled),
      |tot AS (
      |  SELECT CAST(sum(cnt) AS BIGINT) AS n_tot,
      |    sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tie_sum
      |  FROM pooled),
      |pg AS (
      |  SELECT grp, CAST(count(*) AS BIGINT) AS scnt, v
      |  FROM r GROUP BY grp, v),
      |g AS (
      |  SELECT grp, CAST(sum(scnt) AS BIGINT) AS n,
      |    sum(CAST(scnt AS HUGEINT) * dr) AS r2
      |  FROM pg JOIN rk USING (v) GROUP BY grp),
      |kk AS (SELECT CAST(count(*) AS BIGINT) AS df_plus1 FROM g),
      |sc AS (
      |  SELECT grp, n, r2, n_tot, tie_sum, df_plus1,
      |    (r2 - CAST(n AS HUGEINT) * (n_tot + 1)) AS dev
      |  FROM g CROSS JOIN tot CROSS JOIN kk),
      |h AS (
      |  SELECT CAST(sum((3 * dev * dev * 1000000)
      |      // (CAST(n AS HUGEINT) * n_tot * (n_tot + 1))) AS BIGINT)
      |      AS h_micro,
      |    any_value(df_plus1) - 1 AS df,
      |    any_value(n_tot) AS n_tot, any_value(tie_sum) AS tie_sum,
      |    CAST(any_value(n_tot) AS HUGEINT) * any_value(n_tot)
      |      * any_value(n_tot) - any_value(n_tot) AS denom
      |  FROM sc)
      |SELECT grp, n, CAST(r2 AS BIGINT) AS r2, h_micro,
      |  CAST(df AS BIGINT) AS df,
      |  CASE WHEN denom = tie_sum OR denom <= 0 THEN NULL
      |    ELSE round((CAST(h_micro AS DOUBLE) / 1e6)
      |      / (1.0 - CAST(tie_sum AS DOUBLE) / CAST(denom AS DOUBLE)), 4)
      |  END AS h_adj
      |FROM g CROSS JOIN h
      |ORDER BY grp""".stripMargin

  /** Wilcoxon signed-rank test — the PAIRED sibling of
    * [[Mixing.mannWhitney]] (which compares two independent samples):
    * each subject is its own control, so per-subject pre/post
    * differences are ranked by magnitude and the signed rank sum asks
    * "did the distribution shift?" without assuming normality. Here:
    * per-customer order spend in the first half of the dataset's date
    * range vs the second half (a customer silent in a half contributes
    * 0 for that half — the paired design over the full customer base);
    * zero differences are dropped per the classic treatment and
    * reported.
    *
    * Exactness: the date split point is an exact integer DIV off a
    * 1-row aggregate; |d| ranks come from [[doubledRanks]] as exact
    * DOUBLED integers, so `w2_pos = Σ dr(|d|) over d>0` is an exact
    * BIGINT (= 2·W⁺) and `w2_pos + w2_neg = n(n+1)` is a built-in
    * self-check. With the tie term T = Σ(t³−t) over the |d| census,
    * Var(2W⁺)·12 = 2n(n+1)(2n+1) − T stays exact in DECIMAL(38,0) at
    * any n, and the z tail (no continuity correction — documented, so
    * both engines share ONE expression) divides exact integers once in
    * double.
    *
    * Scale posture: one per-customer aggregate (the corpus shuffle),
    * 1-row min/max broadcast, the |d|-census two-level scan, one
    * value-keyed join back, one 1-row final aggregate. No per-row
    * window anywhere.
    */
  def wilcoxonSigned(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_custkey").as("k"),
      col("o_orderdate").cast("date").as("dt"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    wilcoxonSigned(o, "k", "dt", "cents", PriceBucketWidth)
  }

  /** DataFrame-first form over any (subject, event date, integral
    * value) frame: pre = spend on dates ≤ midpoint, post = after.
    */
  def wilcoxonSigned(df: DataFrame, subjCol: String, dateCol: String,
                     valCol: String, bucketWidth: Long): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def dec(c: Column) = c.cast(DecimalType(38, 0))
    val rows = df.select(col(subjCol).as("k"), col(dateCol).as("dt"),
      col(valCol).cast("long").as("cents"))
    val mm = rows.agg(min(col("dt")).as("mn"), max(col("dt")).as("mx"))
      .select(expr("date_add(mn, CAST(datediff(mx, mn) DIV 2 AS INT))")
        .as("mid"))
    val diffs = rows.crossJoin(broadcast(mm))
      .groupBy(col("k"))
      .agg((sum(when(col("dt") > col("mid"), col("cents")).otherwise(0L))
        - sum(when(col("dt") <= col("mid"), col("cents")).otherwise(0L)))
        .as("dlt"))
    val nz = diffs.filter(col("dlt") =!= 0)
      .select(col("dlt"), abs(col("dlt")).as("v"))
    val census = nz.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("g", lit(0L))
    val ranked = doubledRanks(census, bucketWidth).select(col("v"), col("dr"))
    val ties = census.agg(
      sum(dec(col("cnt")) * dec(col("cnt")) * dec(col("cnt"))
        - dec(col("cnt"))).as("tie_sum"))
    val zeros = diffs.agg(count_if(col("dlt") === 0).as("n_zero"))
    nz.join(ranked, Seq("v"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("dlt") > 0, col("dr")).otherwise(0L)).as("w2_pos"),
        sum(when(col("dlt") < 0, col("dr")).otherwise(0L)).as("w2_neg"))
      .crossJoin(broadcast(ties)).crossJoin(broadcast(zeros))
      .withColumn("var12",
        dec(lit(2)) * dec(col("n_pairs")) * dec(col("n_pairs") + 1)
          * dec(lit(2) * col("n_pairs") + 1) - col("tie_sum"))
      .select(col("n_pairs"), col("n_zero"),
        col("w2_pos").cast("long").as("w2_pos"),
        col("w2_neg").cast("long").as("w2_neg"),
        col("tie_sum").cast("long").as("tie_sum"),
        when(col("var12") <= 0, lit(null)).otherwise(round(
          (lit(2.0) * col("w2_pos").cast("double")
            - col("n_pairs").cast("double") * (col("n_pairs").cast("double")
              + 1.0))
            / (lit(2.0) * sqrt(col("var12").cast("double") / 12.0)), 4))
          .as("z"))
  }

  /** DuckDB twin of [[wilcoxonSigned]] — identical midpoint DIV,
    * doubled |d| ranks via plain windows, HUGEINT tie moments, the
    * same no-continuity z expression.
    */
  val wilcoxonSignedSql: String =
    """WITH rows_ AS (
      |  SELECT o_custkey AS k, CAST(o_orderdate AS DATE) AS dt,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |mm AS (
      |  SELECT min(dt) + CAST(CAST(max(dt) - min(dt) AS BIGINT) // 2
      |    AS INTEGER) AS mid FROM rows_),
      |diffs AS (
      |  SELECT k,
      |    sum(CASE WHEN dt > (SELECT mid FROM mm) THEN cents ELSE 0 END)
      |    - sum(CASE WHEN dt <= (SELECT mid FROM mm) THEN cents ELSE 0 END)
      |      AS dlt
      |  FROM rows_ GROUP BY k),
      |nz AS (SELECT dlt, abs(dlt) AS v FROM diffs WHERE dlt <> 0),
      |census AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM nz GROUP BY v),
      |rk AS (
      |  SELECT v, 2 * (sum(cnt) OVER (ORDER BY v) - cnt) + cnt + 1 AS dr
      |  FROM census),
      |ties AS (
      |  SELECT sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tie_sum
      |  FROM census),
      |zeros AS (
      |  SELECT CAST(count(*) FILTER (WHERE dlt = 0) AS BIGINT) AS n_zero
      |  FROM diffs),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
      |    CAST(sum(CASE WHEN dlt > 0 THEN dr ELSE 0 END) AS BIGINT) AS w2_pos,
      |    CAST(sum(CASE WHEN dlt < 0 THEN dr ELSE 0 END) AS BIGINT) AS w2_neg
      |  FROM nz JOIN rk USING (v)),
      |v12 AS (
      |  SELECT n_pairs, w2_pos, w2_neg, CAST(tie_sum AS HUGEINT) AS tie_sum,
      |    2 * CAST(n_pairs AS HUGEINT) * (n_pairs + 1) * (2 * n_pairs + 1)
      |      - tie_sum AS var12
      |  FROM agg CROSS JOIN ties)
      |SELECT n_pairs, n_zero, w2_pos, w2_neg,
      |  CAST(tie_sum AS BIGINT) AS tie_sum,
      |  CASE WHEN var12 <= 0 THEN NULL ELSE
      |    round((2.0 * w2_pos - CAST(n_pairs AS DOUBLE) * (n_pairs + 1.0))
      |      / (2.0 * sqrt(CAST(var12 AS DOUBLE) / 12.0)), 4) END AS z
      |FROM v12 CROSS JOIN zeros""".stripMargin

  /** Theil T inequality index per nation over customer lifetime spend
    * — the DECOMPOSABLE inequality measure beside [[gini]]'s
    * rank-based one (Theil is additively separable across subgroups,
    * which Gini is not — the reason national statistics offices carry
    * both): T = (1/n)·Σ (x/μ)·ln(x/μ), 0 = perfect equality,
    * ln n = one customer holds everything.
    *
    * Exactness: per distinct value, the transcendental term
    * cnt·(v·n/S)·ln(v·n/S) is micro-rounded to an integer BEFORE the
    * cross-value sum (the [[Evaluation.psi]] discipline — v, n, S are
    * exact integers, so both engines feed identical doubles), and the
    * final (1/n) is one truncating DIV. Zero-spend customers
    * contribute the exact limit 0 (guarded, not NaN).
    *
    * Scale posture: one customer-keyed aggregate + one dim join; the
    * term fold runs on the (nation, value) census.
    */
  def theilIndex(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("v"))
    val byNation = spend
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("g"), col("v"))
    theilIndex(byNation, "g", "v")
  }

  /** DataFrame-first form over a (group, non-negative integral value)
    * frame.
    */
  def theilIndex(df: DataFrame, groupCol: String, vCol: String): DataFrame = {
    val census = df
      .select(col(groupCol).as("g"), col(vCol).cast("long").as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
    val tot = census.groupBy(col("g"))
      .agg(sum(col("cnt")).as("n"), sum(col("cnt").cast(
        org.apache.spark.sql.types.DecimalType(38, 0)) * col("v")).as("s"))
    census.join(broadcast(tot), Seq("g"))
      .select(col("g"), col("n"),
        when(col("v") <= 0 || col("s") <= 0, lit(0L)).otherwise(expr(
          """CAST(round(cnt * (CAST(v AS DOUBLE) * n / CAST(s AS DOUBLE))
            |  * ln(CAST(v AS DOUBLE) * n / CAST(s AS DOUBLE)) * 1e6)
            |  AS BIGINT)""".stripMargin)).as("t_micro"))
      .groupBy(col("g"), col("n"))
      .agg(sum(col("t_micro")).as("tm"))
      .select(col("g"), col("n"),
        expr("CAST(tm DIV n AS BIGINT)").as("theil_micro"))
      .orderBy(col("g"))
  }

  /** DuckDB twin of [[theilIndex]] — same census terms, micro
    * rounding and truncating DIV.
    */
  val theilIndexSql: String =
    """WITH spend AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS v
      |  FROM orders GROUP BY o_custkey),
      |q AS (
      |  SELECT n_name AS g, v
      |  FROM spend
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey),
      |c AS (SELECT g, v, CAST(count(*) AS BIGINT) AS cnt
      |      FROM q GROUP BY g, v),
      |t AS (
      |  SELECT g, CAST(sum(cnt) AS BIGINT) AS n,
      |    sum(CAST(cnt AS HUGEINT) * v) AS s
      |  FROM c GROUP BY g),
      |m AS (
      |  SELECT c.g, n,
      |    CASE WHEN v <= 0 OR s <= 0 THEN 0 ELSE
      |      CAST(round(cnt * (CAST(v AS DOUBLE) * n / CAST(s AS DOUBLE))
      |        * ln(CAST(v AS DOUBLE) * n / CAST(s AS DOUBLE)) * 1e6)
      |        AS BIGINT) END AS t_micro
      |  FROM c JOIN t ON c.g = t.g)
      |SELECT g, n, CAST(sum(t_micro) // n AS BIGINT) AS theil_micro
      |FROM m GROUP BY g, n
      |ORDER BY g""".stripMargin

  /** Q–Q decile comparison between two groups' order-price
    * distributions — the distribution-SHAPE readout behind
    * [[Mixing.mannWhitney]]'s single shift number: nine exact decile
    * pairs (d/10-th order statistics, d = 1..9) plus their ratio in
    * basis points, read like a Q–Q plot ("low deciles match, the top
    * ones diverge" = a tail effect, not a shift). Here: AUTOMOBILE
    * customers' orders against everyone else's.
    *
    * Exactness: each decile is a SINGLE order statistic at the
    * integer-ceiling rank (d·n + 9) DIV 10 selected from the
    * [[doubledRanks]] census scan (the [[tailRisk]] rule — tie groups
    * land whole, no `ntile`, no interpolation); the ratio is one
    * truncating DIV. The lexicographically smaller group is side A.
    *
    * Scale posture: one (group, value) census, one two-level scan,
    * a 9-row-per-group fold. No per-row sort or window.
    */
  def qqDeciles(spark: SparkSession, dir: String): DataFrame =
    qqDeciles(SegOrders(spark, dir)
        .select(when(col("g") === "AUTOMOBILE", lit("AUTOMOBILE"))
          .otherwise(lit("OTHER")).as("g"), col("cents").as("v")),
      "g", "v", PriceBucketWidth)

  /** DataFrame-first form over a (group, integral value) frame with
    * EXACTLY two groups (the Q–Q construction is pairwise).
    */
  def qqDeciles(df: DataFrame, groupCol: String, vCol: String,
                bucketWidth: Long): DataFrame = {
    val census = df
      .select(col(groupCol).as("g"), col(vCol).cast("long").as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
    val n = census.groupBy(col("g")).agg(sum(col("cnt")).as("n"))
    val ranked = doubledRanks(census, bucketWidth)
      .join(broadcast(n), Seq("g"))
    val vals = ranked
      .crossJoin(broadcast(
        df.sparkSession.range(1, 10).select(col("id").as("d"))))
      .filter(col("lt") + col("cnt") >= expr("(d * n + 9) DIV 10"))
      .groupBy(col("g"), col("d")).agg(min(col("v")).as("qv"))
    val ga = census.agg(min(col("g")).as("ga"))
    val a = vals.crossJoin(broadcast(ga)).filter(col("g") === col("ga"))
      .select(col("d").as("decile"), col("g").as("g_a"),
        col("qv").as("q_a_cents"))
    val b = vals.crossJoin(broadcast(ga)).filter(col("g") =!= col("ga"))
      .select(col("d").as("decile"), col("g").as("g_b"),
        col("qv").as("q_b_cents"))
    a.join(b, Seq("decile"))
      .select(col("decile"), col("g_a"), col("q_a_cents"),
        col("g_b"), col("q_b_cents"),
        when(col("q_b_cents") <= 0, lit(null))
          .otherwise(expr("CAST(q_a_cents * 10000 DIV q_b_cents" +
            " AS BIGINT)")).as("ratio_bp"))
      .orderBy(col("decile"))
  }

  /** DuckDB twin of [[qqDeciles]] — same ceiling-rank order
    * statistics off plain rank windows.
    */
  val qqDecilesSql: String =
    """WITH q AS (
      |  SELECT CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 'AUTOMOBILE'
      |    ELSE 'OTHER' END AS g,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |c AS (SELECT g, v, CAST(count(*) AS BIGINT) AS cnt
      |      FROM q GROUP BY g, v),
      |r AS (
      |  SELECT g, v, cnt,
      |    sum(cnt) OVER (PARTITION BY g ORDER BY v) - cnt AS lt,
      |    CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
      |  FROM c),
      |dd AS (SELECT unnest(generate_series(1, 9)) AS d),
      |vals AS (
      |  SELECT g, d, min(v) AS qv
      |  FROM r CROSS JOIN dd
      |  WHERE lt + cnt >= (d * n + 9) // 10
      |  GROUP BY g, d),
      |ga AS (SELECT min(g) AS ga FROM c)
      |SELECT CAST(a.d AS BIGINT) AS decile, a.g AS g_a,
      |  a.qv AS q_a_cents, b.g AS g_b, b.qv AS q_b_cents,
      |  CASE WHEN b.qv <= 0 THEN NULL
      |    ELSE CAST(a.qv * 10000 // b.qv AS BIGINT) END AS ratio_bp
      |FROM vals a JOIN vals b ON a.d = b.d AND a.g <> b.g
      |CROSS JOIN ga
      |WHERE a.g = ga.ga
      |ORDER BY decile""".stripMargin

  /** Friedman test (1937) — the repeated-measures rank ANOVA:
    * "across matched blocks, do the k treatments rank the same?",
    * here "does segment revenue keep one ordering month after
    * month?". The within-block complement of [[kruskalWallis]]
    * (which pools ranks globally and needs independent groups; a
    * strong month effect would drown it — Friedman ranks WITHIN each
    * month, removing the block effect entirely).
    *
    * Exactness: within-block tie-averaged ranks come out DOUBLED
    * (dr = 2·lt + cnt + 1) off the per-block value census, so every
    * rank sum R2_j = 2·R_j is an exact integer, and the fully
    * tie-corrected statistic is the exact-integer ratio
    * χ²_F = (k−1)·Σ_j (R2_j − n(k+1))² / (Σ_ij dr² − n·k·(k+1)²)
    * — ONE shared double division, NULL when the denominator is 0
    * (every block fully tied: no ordering information). The zero-fill
    * matters (a segment absent from a month ranks LOWEST that month,
    * not missing) and is documented.
    *
    * Scale posture: one (block, treatment) keyed aggregate off the
    * corpus; the grid fill, per-block rank windows (k rows each) and
    * folds all run on the blocks×treatments-bounded frame.
    */
  def friedman(spark: SparkSession, dir: String): DataFrame = {
    val cell = SegOrders(spark, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("b"),
        col("g").as("t"))
      .agg(sum(col("cents")).as("x"))
    val grid = cell.select(col("b")).distinct()
      .crossJoin(broadcast(cell.select(col("t")).distinct()))
      .join(cell, Seq("b", "t"), "left").na.fill(0L, Seq("x"))
    friedman(grid, "b", "t", "x")
  }

  /** DataFrame-first form over a COMPLETE (block, treatment, value)
    * grid — every block must carry every treatment (the shipped query
    * zero-fills; Friedman is undefined on ragged blocks).
    */
  def friedman(df: DataFrame, blockCol: String, treatCol: String,
               vCol: String): DataFrame = {
    val rows0 = df.select(col(blockCol).as("b"), col(treatCol).as("t"),
      col(vCol).cast("long").as("v"))
    val cen = rows0.groupBy(col("b"), col("v")).agg(count(lit(1)).as("cnt"))
    val wb = Window.partitionBy(col("b")).orderBy(col("v"))
    val dr = cen
      .withColumn("lt", sum(col("cnt")).over(wb) - col("cnt"))
      .withColumn("dr", lit(2L) * col("lt") + col("cnt") + 1L)
      .select(col("b"), col("v"), col("dr"))
    val ranked = rows0.join(dr, Seq("b", "v"))
    val nk = rows0.agg(countDistinct(col("b")).as("n"),
      countDistinct(col("t")).as("k"))
    val a2 = ranked.agg(sum(col("dr") * col("dr")).as("sdr2"))
    val per = ranked.groupBy(col("t")).agg(sum(col("dr")).as("r2"))
      .crossJoin(broadcast(nk)).crossJoin(broadcast(a2))
      .withColumn("dev2", col("r2") - col("n") * (col("k") + 1))
    val num = per.groupBy(col("n"), col("k"), col("sdr2"))
      .agg(sum(col("dev2") * col("dev2")).as("sd2"))
      .withColumn("den",
        col("sdr2") - col("n") * col("k") * (col("k") + 1)
          * (col("k") + 1))
    per.crossJoin(broadcast(num.select(col("sd2"), col("den"))))
      .select(col("t").as("treatment"), col("r2").as("rank2_sum"),
        col("n").as("n_blocks"), (col("k") - 1).as("df"),
        when(col("den") <= 0, lit(null)).otherwise(round(
          ((col("k") - 1) * col("sd2")).cast("double")
            / col("den").cast("double"), 4)).as("chi2"))
      .orderBy(col("treatment"))
  }

  /** DuckDB twin of [[friedman]] — same zero-filled grid, doubled
    * within-block ranks and exact-integer tie-corrected ratio.
    */
  val friedmanSql: String =
    """WITH cell AS (
      |  SELECT date_trunc('month', o_orderdate) AS b, c_mktsegment AS t,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS x
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |grid AS (
      |  SELECT bb.b, tt.t, coalesce(cell.x, 0) AS v
      |  FROM (SELECT DISTINCT b FROM cell) bb
      |  CROSS JOIN (SELECT DISTINCT t FROM cell) tt
      |  LEFT JOIN cell ON cell.b = bb.b AND cell.t = tt.t),
      |cen AS (
      |  SELECT b, v, CAST(count(*) AS BIGINT) AS cnt
      |  FROM grid GROUP BY b, v),
      |dr AS (
      |  SELECT b, v,
      |    2 * (sum(cnt) OVER (PARTITION BY b ORDER BY v) - cnt)
      |      + cnt + 1 AS dr
      |  FROM cen),
      |ranked AS (
      |  SELECT grid.b, grid.t, dr.dr
      |  FROM grid JOIN dr ON grid.b = dr.b AND grid.v = dr.v),
      |nk AS (
      |  SELECT CAST(count(DISTINCT b) AS BIGINT) AS n,
      |    CAST(count(DISTINCT t) AS BIGINT) AS k
      |  FROM grid),
      |a2 AS (SELECT CAST(sum(dr * dr) AS BIGINT) AS sdr2 FROM ranked),
      |per AS (
      |  SELECT t, CAST(sum(dr) AS BIGINT) AS r2,
      |    CAST(sum(dr) - (SELECT n FROM nk) * ((SELECT k FROM nk) + 1)
      |      AS BIGINT) AS dev2
      |  FROM ranked GROUP BY t),
      |tot AS (
      |  SELECT CAST(sum(CAST(dev2 AS HUGEINT) * dev2) AS BIGINT) AS sd2,
      |    (SELECT sdr2 FROM a2)
      |      - (SELECT n FROM nk) * (SELECT k FROM nk)
      |      * ((SELECT k FROM nk) + 1) * ((SELECT k FROM nk) + 1) AS den
      |  FROM per)
      |SELECT t AS treatment, r2 AS rank2_sum,
      |  (SELECT n FROM nk) AS n_blocks,
      |  (SELECT k FROM nk) - 1 AS df,
      |  CASE WHEN den <= 0 THEN NULL ELSE
      |    round(CAST(((SELECT k FROM nk) - 1) * CAST(sd2 AS HUGEINT)
      |        AS DOUBLE)
      |      / CAST(den AS DOUBLE), 4) END AS chi2
      |FROM per CROSS JOIN tot
      |ORDER BY treatment""".stripMargin
}
