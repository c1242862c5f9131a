package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Model-evaluation and distribution-comparison statistics — the
  * measurements a training-data pipeline runs to decide whether a
  * filter model, a mixing policy, or a drifted source is fit for the
  * next crawl round. The reference engine
  * (`/root/reference/batch_processor.go:1-194`) carries records
  * opaquely and has none of these; they are part of the north-star
  * analytics surface.
  *
  * Numeric discipline (shared with [[Diagnostics]] / [[Ranks]]):
  * every corpus-sized pass accumulates EXACT integer moments (cents /
  * permille units, DECIMAL(38,0) where products can pass the BIGINT
  * ceiling); doubles appear only in the final bounded frame, through
  * expression trees mirrored verbatim in the DuckDB oracle SQL.
  * Where a statistic sums a transcendental term across cells/bins
  * (PSI's `(p−q)·ln(p/q)`, chi-square's `(o−e)²/e`), the term is
  * micro-rounded to an integer FIRST and the integers are summed —
  * integer addition is order-free, so the result cannot depend on
  * which engine (or which partitioning) adds the cells in which
  * order. The micro quantum is documented per op and is far below
  * each statistic's decision resolution.
  */
object Evaluation {

  private def d(c: Column): Column = c.cast("double")
  private def d(name: String): Column = col(name).cast("double")
  private val Dec = DecimalType(38, 0)

  // ---------------------------------------------------------------- AUC

  /** Discount values are permille-scaled to 0..100; 16 covers the
    * domain with one coarse bucket per [[Ranks.doubledRanks]] level.
    */
  private val AucBucketWidth = 16L

  /** ROC AUC of a monotone score against a binary outcome, per group
    * — computed as the tie-corrected Mann-Whitney statistic:
    * `AUC = (R⁺ − P(P+1)/2) / (P·(N−P))` with `R⁺` the sum of
    * tie-AVERAGED ranks of the positives. Heavy ties are the normal
    * case for a quantized score (the default scores are permille
    * discounts with 11 distinct values), so the tie-averaged form is
    * the only correct one — `rank()`/`row_number()` would both be
    * wrong AND unscalable.
    *
    * Shape: one keyed census aggregation (group, score) → bounded
    * two-level rank scan ([[Ranks.doubledRanks]] — windows only over
    * the score-domain-bounded census, never rows), one value-keyed
    * join, one per-group fold in DECIMAL(38,0) (`Σ np·dr` passes
    * 2⁶³ near corpus scale). No per-row window, no collect.
    */
  def auc(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select(
      col("l_linestatus").as("g"),
      round(col("l_discount") * 1000).cast("long").as("v"),
      (col("l_returnflag") === "R").as("y"))
    auc(l, "g", "v", "y", AucBucketWidth)
  }

  /** DataFrame-first form over any (group, integral score, boolean
    * outcome) frame. `bucketWidth` follows [[Ranks.doubledRanks]]:
    * √(score domain) balances the two scan levels.
    */
  def auc(df: DataFrame, groupCol: String, scoreCol: String,
          labelCol: String, bucketWidth: Long): DataFrame = {
    val census = df.select(
        col(groupCol).as("g"), col(scoreCol).cast("long").as("v"),
        col(labelCol).cast("boolean").as("y"))
      .groupBy(col("g"), col("v"))
      .agg(count(lit(1)).as("cnt"), count_if(col("y")).as("np"))
    val ranked = Ranks.doubledRanks(
        census.select(col("g"), col("v"), col("cnt")), bucketWidth)
      .join(census.select(col("g"), col("v"), col("np")), Seq("g", "v"))
    ranked.groupBy(col("g"))
      .agg(
        sum(col("cnt")).as("n"),
        sum(col("np")).as("n_pos"),
        sum(col("np").cast(Dec) * col("dr").cast(Dec)).as("rp2"))
      .select(col("g"), col("n"), col("n_pos"),
        (col("n") - col("n_pos")).as("n_neg"),
        // 2U = Σ np·dr − P(P+1);  AUC = 2U / (2·P·(N−P))
        (col("rp2") - col("n_pos").cast(Dec) * (col("n_pos") + 1).cast(Dec))
          .as("u2"),
        (col("n_pos").cast(Dec) * (col("n") - col("n_pos")).cast(Dec) * 2)
          .as("den2"))
      .select(col("g"), col("n"), col("n_pos"), col("n_neg"),
        when(col("den2") === 0, lit(null))
          .otherwise(round(d(col("u2")) / d(col("den2")), 6)).as("auc"))
      .orderBy(col("g"))
  }

  val aucSql: String =
    """WITH q AS (
      |  SELECT l_linestatus AS g,
      |    CAST(round(l_discount * 1000) AS BIGINT) AS v,
      |    (l_returnflag = 'R') AS y
      |  FROM lineitem),
      |c AS (
      |  SELECT g, v, count(*) AS cnt,
      |    count(*) FILTER (y) AS np
      |  FROM q GROUP BY g, v),
      |r AS (
      |  SELECT g, v, cnt, np,
      |    2 * (sum(cnt) OVER (PARTITION BY g ORDER BY v) - cnt)
      |      + cnt + 1 AS dr
      |  FROM c),
      |a AS (
      |  SELECT g, CAST(sum(cnt) AS BIGINT) AS n,
      |    CAST(sum(np) AS BIGINT) AS n_pos,
      |    sum(CAST(np AS HUGEINT) * dr) AS rp2
      |  FROM r GROUP BY g)
      |SELECT g, n, n_pos, n - n_pos AS n_neg,
      |  CASE WHEN n_pos = 0 OR n = n_pos THEN NULL
      |    ELSE round(
      |      CAST(rp2 - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS DOUBLE)
      |      / CAST(CAST(n_pos AS HUGEINT) * (n - n_pos) * 2 AS DOUBLE), 6)
      |  END AS auc
      |FROM a ORDER BY g""".stripMargin

  // -------------------------------------------------------- calibration

  /** Reliability table + Brier decomposition input for a [0,1]
    * probability score against a binary outcome: fixed decile bins
    * (NEVER `ntile` — rank ties at bin edges make ntile
    * engine-dependent; a fixed bin edge is reproducible everywhere),
    * per-bin mean predicted probability, observed positive rate, and
    * mean squared error (the bin's Brier contribution).
    *
    * Scores are taken in permille (0..1000); per-row squared errors
    * `(p − 1000·y)²` are exact integers folded in DECIMAL(38,0), so
    * the whole table is one keyed aggregation with no doubles until
    * the final 10-row frame.
    */
  def calibration(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select(
      // discount stretched ×10 into [0,1] as the toy probability
      round(col("l_discount") * 10000).cast("long").as("p"),
      (col("l_returnflag") === "R").as("y"))
    calibration(l, "p", "y")
  }

  /** DataFrame-first form: `probCol` is an integral permille score in
    * 0..1000, `labelCol` boolean. The domain is ENFORCED by an
    * explicit clamp to [0, 1000] (the data-level analogue of
    * [[splitConformal]]'s `require`): an out-of-range score lands on
    * the nearest boundary instead of silently inflating bin 9's
    * `mean_pred` past 1.0.
    */
  def calibration(df: DataFrame, probCol: String, labelCol: String): DataFrame = {
    val q = df.select(
      greatest(lit(0L), least(lit(1000L), col(probCol).cast("long"))).as("p"),
      col(labelCol).cast("boolean").as("y"))
    q.select(
        least(expr("p div 100"), lit(9L)).as("bin"),
        col("p"), col("y"),
        (col("p") - when(col("y"), 1000L).otherwise(0L)).cast(Dec).as("e"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), count_if(col("y")).as("n_pos"),
        sum(col("p")).as("sp"), sum(col("e") * col("e")).as("sse"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(d("sp") / d("n") / 1000.0, 6).as("mean_pred"),
        round(d("n_pos") / d("n"), 6).as("pos_rate"),
        round(d(col("sse")) / d("n") / 1.0e6, 6).as("brier"))
      .orderBy(col("bin"))
  }

  val calibrationSql: String =
    """WITH q AS (
      |  SELECT CAST(round(l_discount * 10000) AS BIGINT) AS p,
      |    (l_returnflag = 'R') AS y
      |  FROM lineitem),
      |b AS (
      |  SELECT least(p // 100, 9) AS bin, p, y,
      |    CAST(p - CASE WHEN y THEN 1000 ELSE 0 END AS HUGEINT) AS e
      |  FROM q),
      |a AS (
      |  SELECT bin, count(*) AS n,
      |    CAST(count(*) FILTER (y) AS BIGINT) AS n_pos,
      |    sum(p) AS sp, sum(e * e) AS sse
      |  FROM b GROUP BY bin)
      |SELECT bin, n, n_pos,
      |  round(CAST(sp AS DOUBLE) / CAST(n AS DOUBLE) / 1000.0, 6) AS mean_pred,
      |  round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS pos_rate,
      |  round(CAST(sse AS DOUBLE) / CAST(n AS DOUBLE) / 1.0e6, 6) AS brier
      |FROM a ORDER BY bin""".stripMargin

  /** Isotonic calibration curve — the PAV (pool-adjacent-violators)
    * fit of positive rate as a NON-DECREASING function of the score,
    * computed by the minimax identity
    * `iso(i) = max_{a ≤ i} min_{b ≥ i} posrate(a..b)` (Ayer et al.
    * 1955; Robertson–Wright–Dykstra 1988 §1.2) instead of the
    * sequential pooling loop: the loop is inherently serial, the
    * minimax is a closed form over interval aggregates — exactly what
    * a declarative engine wants. [[calibration]] reports the RAW
    * per-bin rates a reviewer eyeballs; this is the monotone fit a
    * pipeline actually applies to recalibrate scores (isotonic
    * regression is the standard nonparametric calibrator next to
    * Platt scaling).
    *
    * Exactness and scale: the corpus collapses to the SCORE CENSUS
    * (one aggregate — the only corpus-sized pass); the m-row census
    * (m ≤ score domain, 11 here) expands to the m³/6 (a ≤ i ≤ b)
    * interval grid ROW-LOCALLY bounded by the domain, never by corpus
    * size. Interval rates are single divisions of exact integer
    * cumulative sums — both engines produce bit-identical doubles, so
    * min/max over them agree bitwise; output rounds once.
    */
  def isotonic(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select(
      round(col("l_discount") * 10000).cast("long").as("p"),
      (col("l_returnflag") === "R").as("y"))
    isotonic(l, "p", "y")
  }

  /** DataFrame-first form: `scoreCol` integral (bounded domain —
    * quantize first if continuous), `labelCol` boolean.
    */
  def isotonic(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val census = df
      .select(col(scoreCol).cast("long").as("p"),
        col(labelCol).cast("boolean").as("y"))
      .groupBy(col("p"))
      .agg(count(lit(1)).as("n"), count_if(col("y")).as("n_pos"))
    // bounded frame from here on: cumulative sums over the census
    val w = Window.orderBy(col("p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = census
      .withColumn("cn", sum(col("n")).over(w))
      .withColumn("cp", sum(col("n_pos")).over(w))
    val lo = cum.select(col("p").as("pa"), (col("cn") - col("n")).as("na0"),
      (col("cp") - col("n_pos")).as("pa0"))
    val hi = cum.select(col("p").as("pb"), col("cn").as("nb"),
      col("cp").as("pb1"))
    val grid = census.select(col("p").as("pi"))
    // (a ≤ i ≤ b) interval rates — m³-bounded, row-local arithmetic
    val intervals = lo.join(grid, col("pa") <= col("pi"))
      .join(hi, col("pi") <= col("pb"))
      .select(col("pa"), col("pi"), col("pb"),
        ((col("pb1") - col("pa0")).cast("double")
          / (col("nb") - col("na0")).cast("double")).as("rate"))
    val fitted = intervals
      .groupBy(col("pa"), col("pi")).agg(min(col("rate")).as("mn"))
      .groupBy(col("pi")).agg(max(col("mn")).as("iso"))
    census.join(fitted, col("p") === col("pi")).drop("pi")
      .select(col("p"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("raw_rate"),
        round(col("iso"), 6).as("iso_rate"))
      .orderBy(col("p"))
  }

  /** DuckDB twin of [[isotonic]]: the same census, cumulative frame,
    * interval grid and minimax — bit-identical doubles throughout.
    */
  val isotonicSql: String =
    """WITH q AS (
      |  SELECT CAST(round(l_discount * 10000) AS BIGINT) AS p,
      |    (l_returnflag = 'R') AS y
      |  FROM lineitem),
      |census AS (
      |  SELECT p, CAST(count(*) AS BIGINT) AS n,
      |    CAST(count(*) FILTER (y) AS BIGINT) AS n_pos
      |  FROM q GROUP BY p),
      |cum AS (
      |  SELECT p, n, n_pos,
      |    CAST(sum(n) OVER (ORDER BY p) AS BIGINT) AS cn,
      |    CAST(sum(n_pos) OVER (ORDER BY p) AS BIGINT) AS cp
      |  FROM census),
      |iv AS (
      |  SELECT lo.p AS pa, g.p AS pi, hi.p AS pb,
      |    CAST(hi.cp - (lo.cp - lo.n_pos) AS DOUBLE)
      |      / CAST(hi.cn - (lo.cn - lo.n) AS DOUBLE) AS rate
      |  FROM cum lo JOIN census g ON lo.p <= g.p
      |  JOIN cum hi ON g.p <= hi.p),
      |inner_min AS (
      |  SELECT pa, pi, min(rate) AS mn FROM iv GROUP BY pa, pi),
      |fit AS (
      |  SELECT pi, max(mn) AS iso FROM inner_min GROUP BY pi)
      |SELECT census.p, n, n_pos,
      |  round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS raw_rate,
      |  round(iso, 6) AS iso_rate
      |FROM census JOIN fit ON census.p = fit.pi
      |ORDER BY census.p""".stripMargin

  // ---------------------------------------------------------------- PSI

  private val PsiBinWidth = 50000.0 // order-price dollars per bin
  private val PsiSplitDate = "1998-07-01"

  /** Population stability index between a baseline and a comparison
    * population over fixed value bins:
    * `PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i)` with Laplace +1
    * smoothing so a bin empty on one side contributes a finite term
    * instead of ±∞. Emits one row per observed bin (counts, smoothed
    * shares, contribution) plus the total on every row.
    *
    * Determinism: each bin's contribution is micro-rounded
    * (`round(c·10⁶)` → BIGINT) and the TOTAL is the integer sum of
    * those micro terms — so the published `psi` is bit-stable no
    * matter the add order, at a quantum (10⁻⁶) three orders below
    * the smallest conventional decision threshold (0.1 = "unstable").
    *
    * Shape: one keyed census (bin × side) over the corpus, then a
    * ≤-bins-sized frame; totals reach the bins via a broadcast 1-row
    * cross join.
    */
  def psi(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      least(floor(col("o_totalprice") / PsiBinWidth), lit(9L)).cast("long")
        .as("bin"),
      (col("o_orderdate") < lit(PsiSplitDate).cast("timestamp")).as("base"))
    psi(o, "bin", "base")
  }

  /** DataFrame-first form over any (integral bin, boolean is-baseline)
    * frame.
    */
  def psi(df: DataFrame, binCol: String, baseCol: String): DataFrame = {
    val cells = df.select(col(binCol).cast("long").as("bin"),
        col(baseCol).cast("boolean").as("base"))
      .groupBy(col("bin"))
      .agg(count_if(col("base")).as("c_base"),
        count_if(!col("base")).as("c_cmp"))
    val totals = cells.agg(
      sum(col("c_base")).as("n_base"), sum(col("c_cmp")).as("n_cmp"),
      count(lit(1)).as("n_bins"))
    val t = cells.crossJoin(broadcast(totals))
      .select(col("bin"), col("c_base"), col("c_cmp"),
        col("n_base"), col("n_cmp"),
        (d(col("c_base") + 1) / d(col("n_base") + col("n_bins"))).as("p"),
        (d(col("c_cmp") + 1) / d(col("n_cmp") + col("n_bins"))).as("q"))
      .select(col("bin"), col("c_base"), col("c_cmp"),
        col("n_base"), col("n_cmp"),
        round(col("p"), 6).as("p_base"), round(col("q"), 6).as("p_cmp"),
        round((col("p") - col("q")) * log(col("p") / col("q")) * 1e6)
          .cast("long").as("contrib_micro"))
    val total = t.agg(sum(col("contrib_micro")).as("psi_micro"))
    t.crossJoin(broadcast(total))
      .select(col("bin"), col("c_base"), col("c_cmp"),
        col("p_base"), col("p_cmp"),
        round(d("contrib_micro") / 1e6, 6).as("contrib"),
        round(d("psi_micro") / 1e6, 6).as("psi"))
      .orderBy(col("bin"))
  }

  val psiSql: String =
    s"""WITH o AS (
       |  SELECT least(CAST(floor(o_totalprice / 50000.0) AS BIGINT), 9) AS bin,
       |    (o_orderdate < TIMESTAMP '1998-07-01') AS base
       |  FROM orders),
       |c AS (
       |  SELECT bin,
       |    CAST(count(*) FILTER (base) AS BIGINT) AS c_base,
       |    CAST(count(*) FILTER (NOT base) AS BIGINT) AS c_cmp
       |  FROM o GROUP BY bin),
       |t AS (
       |  SELECT CAST(sum(c_base) AS BIGINT) AS n_base,
       |    CAST(sum(c_cmp) AS BIGINT) AS n_cmp, count(*) AS n_bins
       |  FROM c),
       |m AS (
       |  SELECT bin, c_base, c_cmp,
       |    round(CAST(c_base + 1 AS DOUBLE) / CAST(n_base + n_bins AS DOUBLE), 6)
       |      AS p_base,
       |    round(CAST(c_cmp + 1 AS DOUBLE) / CAST(n_cmp + n_bins AS DOUBLE), 6)
       |      AS p_cmp,
       |    CAST(round(
       |      (CAST(c_base + 1 AS DOUBLE) / CAST(n_base + n_bins AS DOUBLE)
       |       - CAST(c_cmp + 1 AS DOUBLE) / CAST(n_cmp + n_bins AS DOUBLE))
       |      * ln((CAST(c_base + 1 AS DOUBLE) / CAST(n_base + n_bins AS DOUBLE))
       |         / (CAST(c_cmp + 1 AS DOUBLE) / CAST(n_cmp + n_bins AS DOUBLE)))
       |      * 1e6) AS BIGINT) AS contrib_micro
       |  FROM c, t)
       |SELECT bin, c_base, c_cmp, p_base, p_cmp,
       |  round(CAST(contrib_micro AS DOUBLE) / 1e6, 6) AS contrib,
       |  round(CAST((SELECT sum(contrib_micro) FROM m) AS DOUBLE) / 1e6, 6)
       |    AS psi
       |FROM m ORDER BY bin""".stripMargin

  // -------------------------------------------------------------- ANOVA

  /** One-way ANOVA F over (group, integral value): between/within
    * sum-of-squares from exact per-group integer moments. Per-group
    * terms `s²/n` are evaluated as doubles (exact inputs → identical
    * bits everywhere), then rounded to integer units of 10⁴ value² —
    * the 10⁻⁴-quantum makes the cross-group SUM order-free while
    * leaving F and η² resolution far finer than any test decision.
    * Emits one row: k, n, f_stat, eta_sq.
    *
    * Numeric-discipline note (the [[linReg]] BIGINT-ceiling caveat
    * applied to the s² path): Spark forms each group's s² as an exact
    * DECIMAL(38,0) product cast ONCE to double, while the DuckDB twin
    * squares an already-rounded double (`CAST(sum(v) AS DOUBLE) *
    * CAST(sum(v) AS DOUBLE)`). The two agree bit-for-bit exactly while
    * every per-group sum stays below 2^53 — cent-scale sums hold that
    * to roughly SF1000; beyond it the exact product can differ from
    * the double square by an ulp, which the 10⁻⁴ micro-rounding can
    * amplify to a 1-unit `t4` step.
    *
    * Shape: one keyed aggregation (corpus-sized), one k-row fold.
    */
  def anovaF(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(
      col("c_mktsegment").as("g"),
      round(col("c_acctbal") * 100).cast("long").as("v"))
    anovaF(c, "g", "v")
  }

  /** DataFrame-first form over any (group, integral value) frame. */
  def anovaF(df: DataFrame, groupCol: String, vCol: String): DataFrame = {
    val v = col(vCol).cast("long")
    val stats = df.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n"), sum(v).as("s"),
        sum(v.cast(Dec) * v.cast(Dec)).as("ss"))
      // the F statistic needs a within-group variance: 1-row groups
      // contribute none and only bend the dfs — excluded, documented
      .filter(col("n") >= 2)
      .select(col("g"), col("n"), col("s"), col("ss"),
        // s²/n in units of 1e4 value², micro-rounded for order-free Σ
        round(d(col("s").cast(Dec) * col("s").cast(Dec)) / d("n") / 1.0e4)
          .cast("long").as("t4"))
    stats
      .agg(count(lit(1)).as("k"), sum(col("n")).as("n"),
        sum(col("s")).as("stot"), sum(col("ss")).as("sstot"),
        sum(col("t4")).as("sum_t4"))
      .select(col("k"), col("n"),
        (d("sum_t4") -
          round(d(col("stot").cast(Dec) * col("stot").cast(Dec)) / d("n")
            / 1.0e4)).as("ssb4"),
        (round(d(col("sstot")) / 1.0e4) - d("sum_t4")).as("ssw4"))
      .select(col("k"), col("n"),
        when(col("k") <= 1 || col("ssw4") <= 0, lit(null))
          .otherwise(round((col("ssb4") / (d("k") - 1.0)) /
            (col("ssw4") / (d("n") - d("k"))), 4)).as("f_stat"),
        when(col("ssb4") + col("ssw4") <= 0, lit(null))
          .otherwise(round(col("ssb4") / (col("ssb4") + col("ssw4")), 6))
          .as("eta_sq"))
  }

  val anovaFSql: String =
    """WITH q AS (
      |  SELECT c_mktsegment AS g,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS v
      |  FROM customer),
      |m AS (
      |  SELECT g, count(*) AS n, sum(v) AS s,
      |    sum(CAST(v AS HUGEINT) * v) AS ss,
      |    CAST(round(CAST(sum(v) AS DOUBLE) * CAST(sum(v) AS DOUBLE)
      |      / CAST(count(*) AS DOUBLE) / 1.0e4) AS BIGINT) AS t4
      |  FROM q GROUP BY g HAVING count(*) >= 2),
      |a AS (
      |  SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS n,
      |    sum(s) AS stot, sum(ss) AS sstot,
      |    CAST(sum(t4) AS BIGINT) AS sum_t4
      |  FROM m),
      |f AS (
      |  SELECT k, n,
      |    CAST(sum_t4 AS DOUBLE)
      |      - round(CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE)
      |          / CAST(n AS DOUBLE) / 1.0e4) AS ssb4,
      |    round(CAST(sstot AS DOUBLE) / 1.0e4) - CAST(sum_t4 AS DOUBLE)
      |      AS ssw4
      |  FROM a)
      |SELECT k, n,
      |  CASE WHEN k <= 1 OR ssw4 <= 0 THEN NULL
      |    ELSE round((ssb4 / (CAST(k AS DOUBLE) - 1.0))
      |      / (ssw4 / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 4)
      |  END AS f_stat,
      |  CASE WHEN ssb4 + ssw4 <= 0 THEN NULL
      |    ELSE round(ssb4 / (ssb4 + ssw4), 6)
      |  END AS eta_sq
      |FROM f""".stripMargin

  // ------------------------------------------------- Brown–Forsythe

  /** Brown–Forsythe test (the median-anchored Levene variant) for
    * variance homogeneity across groups: the one-way ANOVA F computed
    * on `z = |v − median_g|`. Doubling keeps z exactly integral when
    * an even-sized group's median lands on a half (`z2 = |2v − med2|`,
    * `med2 = 2·median` is always a whole number of half-units).
    * Emits one row: k, n, w_stat.
    *
    * Shape: one keyed exact-percentile aggregation (k rows, broadcast
    * back), one corpus map, then [[anovaF]]'s integer machinery.
    */
  def brownForsythe(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(
      col("c_mktsegment").as("g"),
      round(col("c_acctbal") * 100).cast("long").as("v"))
    brownForsythe(c, "g", "v")
  }

  /** DataFrame-first form over any (group, integral value) frame. */
  def brownForsythe(df: DataFrame, groupCol: String, vCol: String): DataFrame = {
    val v = col(vCol).cast("long")
    val base = df.select(col(groupCol).as("g"), v.as("v"))
    val med = base.groupBy(col("g"))
      .agg(round(percentile(col("v"), lit(0.5)) * 2).cast("long").as("med2"))
    val z = base.join(broadcast(med), Seq("g"))
      .select(col("g"), abs(lit(2L) * col("v") - col("med2")).as("z2"))
    anovaF(z, "g", "z2")
      .select(col("k"), col("n"), col("f_stat").as("w_stat"))
  }

  val brownForsytheSql: String =
    """WITH q AS (
      |  SELECT c_mktsegment AS g,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS v
      |  FROM customer),
      |md AS (
      |  SELECT g, CAST(round(quantile_cont(v, 0.5) * 2) AS BIGINT) AS med2
      |  FROM q GROUP BY g),
      |z AS (
      |  SELECT q.g, abs(2 * v - med2) AS v
      |  FROM q JOIN md ON q.g = md.g),
      |m AS (
      |  SELECT g, count(*) AS n, sum(v) AS s,
      |    sum(CAST(v AS HUGEINT) * v) AS ss,
      |    CAST(round(CAST(sum(v) AS DOUBLE) * CAST(sum(v) AS DOUBLE)
      |      / CAST(count(*) AS DOUBLE) / 1.0e4) AS BIGINT) AS t4
      |  FROM z GROUP BY g HAVING count(*) >= 2),
      |a AS (
      |  SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS n,
      |    sum(s) AS stot, sum(ss) AS sstot,
      |    CAST(sum(t4) AS BIGINT) AS sum_t4
      |  FROM m),
      |f AS (
      |  SELECT k, n,
      |    CAST(sum_t4 AS DOUBLE)
      |      - round(CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE)
      |          / CAST(n AS DOUBLE) / 1.0e4) AS ssb4,
      |    round(CAST(sstot AS DOUBLE) / 1.0e4) - CAST(sum_t4 AS DOUBLE)
      |      AS ssw4
      |  FROM a)
      |SELECT k, n,
      |  CASE WHEN k <= 1 OR ssw4 <= 0 THEN NULL
      |    ELSE round((ssb4 / (CAST(k AS DOUBLE) - 1.0))
      |      / (ssw4 / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 4)
      |  END AS w_stat
      |FROM f""".stripMargin

  // ---------------------------------------------------------- Cramér V

  /** Cramér's V association between two categorical columns: the
    * chi-square statistic over the contingency table, normalized to
    * [0,1] by `√(χ² / (N·min(r−1, c−1)))`. χ² is computed through
    * the margin identity `χ² = N·(Σ_cells o²/(rowTot·colTot) − 1)`,
    * which needs only the OBSERVED cells — a naive `Σ (o−e)²/e`
    * over a grouped cell frame silently drops the zero cells the
    * group-by never materializes and under-counts χ². Cell terms are
    * pico-rounded (10⁻¹²) before the cross-cell integer sum — see
    * the module doc. Emits one row: n, r, c, chi2, cramers_v.
    *
    * Shape: one keyed cell census (the only corpus shuffle), then
    * margins and totals re-aggregated from the ≤ r·c cell frame and
    * broadcast back.
    */
  def cramersV(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderstatus").as("a"), col("o_orderpriority").as("b"))
    cramersV(o, "a", "b")
  }

  /** DataFrame-first form over any two categorical columns. */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.select(col(aCol).as("a"), col(bCol).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("o"))
    val rm = cells.groupBy(col("a")).agg(sum(col("o")).as("ra"))
    val cm = cells.groupBy(col("b")).agg(sum(col("o")).as("cb"))
    val tot = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("a")).as("r"), countDistinct(col("b")).as("c"))
    val contrib = cells
      .join(broadcast(rm), Seq("a")).join(broadcast(cm), Seq("b"))
      .crossJoin(broadcast(tot))
      .select(col("n"), col("r"), col("c"),
        round(d("o") * d("o") / (d("ra") * d("cb")) * 1e12)
          .cast("long").as("t_pico"))
    contrib.groupBy(col("n"), col("r"), col("c"))
      .agg(sum(col("t_pico")).as("s_pico"))
      .select(col("n"), col("r"), col("c"),
        (d("n") * (d("s_pico") / 1e12 - 1.0)).as("chi2d"))
      .select(col("n"), col("r"), col("c"),
        round(col("chi2d"), 4).as("chi2"),
        when(least(col("r"), col("c")) <= 1, lit(null))
          .otherwise(round(
            sqrt(greatest(col("chi2d"), lit(0.0)) /
              (d("n") * (d(least(col("r"), col("c"))) - 1.0))), 6))
          .as("cramers_v"))
  }

  val cramersVSql: String =
    """WITH cells AS (
      |  SELECT o_orderstatus AS a, o_orderpriority AS b, count(*) AS o
      |  FROM orders GROUP BY 1, 2),
      |rm AS (SELECT a, CAST(sum(o) AS BIGINT) AS ra FROM cells GROUP BY a),
      |cm AS (SELECT b, CAST(sum(o) AS BIGINT) AS cb FROM cells GROUP BY b),
      |tot2 AS (
      |  SELECT (SELECT CAST(sum(o) AS BIGINT) FROM cells) AS n,
      |    (SELECT CAST(count(DISTINCT a) AS BIGINT) FROM cells) AS r,
      |    (SELECT CAST(count(DISTINCT b) AS BIGINT) FROM cells) AS c),
      |m AS (
      |  SELECT n, r, c,
      |    CAST(round(
      |      CAST(o AS DOUBLE) * CAST(o AS DOUBLE)
      |      / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE))
      |      * 1e12) AS BIGINT) AS t_pico
      |  FROM cells
      |  JOIN rm USING (a) JOIN cm USING (b), tot2),
      |s AS (
      |  SELECT n, r, c,
      |    CAST(n AS DOUBLE)
      |      * (CAST(sum(t_pico) AS DOUBLE) / 1e12 - 1.0) AS chi2d
      |  FROM m GROUP BY n, r, c)
      |SELECT n, r, c,
      |  round(chi2d, 4) AS chi2,
      |  CASE WHEN least(r, c) <= 1 THEN NULL
      |    ELSE round(sqrt(greatest(chi2d, 0.0)
      |      / (CAST(n AS DOUBLE) * (CAST(least(r, c) AS DOUBLE) - 1.0))), 6)
      |  END AS cramers_v
      |FROM s""".stripMargin

  // ---------------------------------------------------- burstiness

  /** Goh–Barabási burstiness of inter-arrival times per series:
    * `B = (σ − μ)/(σ + μ)` over the gaps between consecutive events
    * — −1 for a metronome, ≈0 for a Poisson stream, →1 for extreme
    * bursts. The memorylessness diagnostic that tells an ingest
    * monitor whether rate-based alerting assumptions hold. Gaps are
    * exact epoch-millis integers; moments fold in DECIMAL(38,0); σ
    * and the final B are one shared staged double tail (population
    * σ — the gap list is the complete population of the observed
    * window). Series with < 2 gaps are EXCLUDED from the output
    * entirely (both engines filter them, matching the SQL twin's
    * HAVING); a surviving series whose gaps show zero spread AND zero
    * mean reports NULL.
    *
    * Shape: one per-series ordered `lag` window (inherently
    * sequential per key — the [[runsTest]] posture), then a k-row
    * exact fold.
    */
  def burstiness(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(
      col("event_type").as("g"), col("ts"), col("event_id"))
    burstiness(e, "g", "ts", Seq("ts", "event_id"))
  }

  /** DataFrame-first form; `orderCols` must totally order each
    * series.
    */
  def burstiness(df: DataFrame, groupCol: String, tsCol: String,
                 orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(orderCols.map(col): _*)
    val gaps = df
      .select(col(groupCol).as("g") +: unix_millis(col(tsCol)).as("tms") +:
        orderCols.map(col): _*)
      .select(col("g"), (col("tms") - lag(col("tms"), 1).over(w)).as("gap"))
      .filter(col("gap").isNotNull)
    gaps.groupBy(col("g"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("gap")).as("s"),
        sum(col("gap").cast(Dec) * col("gap").cast(Dec)).as("ss"))
      .filter(col("n_gaps") >= 2)
      .select(col("g"), col("n_gaps"),
        (d(col("s")) / d("n_gaps")).as("mu"),
        sqrt(greatest(
          d(col("ss")) / d("n_gaps")
            - (d(col("s")) / d("n_gaps")) * (d(col("s")) / d("n_gaps")),
          lit(0.0))).as("sigma"))
      .select(col("g"), col("n_gaps"),
        round(col("mu"), 2).as("mean_gap_ms"),
        round(col("sigma"), 2).as("sd_gap_ms"),
        when(col("sigma") + col("mu") === 0.0, lit(null))
          .otherwise(round((col("sigma") - col("mu"))
            / (col("sigma") + col("mu")), 6)).as("burstiness"))
      .orderBy(col("g"))
  }

  val burstinessSql: String =
    """WITH q AS (
      |  SELECT event_type AS g,
      |    CAST(epoch_ms(ts) AS BIGINT) AS tms, ts, event_id
      |  FROM events),
      |gp AS (
      |  SELECT g,
      |    tms - lag(tms) OVER (PARTITION BY g ORDER BY ts, event_id)
      |      AS gap
      |  FROM q),
      |m AS (
      |  SELECT g, count(*) AS n_gaps, CAST(sum(gap) AS BIGINT) AS s,
      |    sum(CAST(gap AS HUGEINT) * gap) AS ss
      |  FROM gp WHERE gap IS NOT NULL GROUP BY g HAVING count(*) >= 2),
      |t AS (
      |  SELECT g, n_gaps,
      |    CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mu,
      |    sqrt(greatest(
      |      CAST(ss AS DOUBLE) / CAST(n_gaps AS DOUBLE)
      |        - (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE))
      |          * (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE)),
      |      0.0)) AS sigma
      |  FROM m)
      |SELECT g, n_gaps,
      |  round(mu, 2) AS mean_gap_ms,
      |  round(sigma, 2) AS sd_gap_ms,
      |  CASE WHEN sigma + mu = 0.0 THEN NULL
      |    ELSE round((sigma - mu) / (sigma + mu), 6) END AS burstiness
      |FROM t ORDER BY g""".stripMargin

  // ----------------------------------------------------- runs test

  /** Wald–Wolfowitz runs test for serial randomness, per series: each
    * value is dichotomized against its series median (exact-to-median
    * rows dropped, the standard convention), the run count R is
    * 1 + the number of adjacent sign flips in time order, and the
    * z-statistic compares R with its null mean
    * `μ = 2·n₁·n₂/n + 1` and variance
    * `σ² = 2n₁n₂(2n₁n₂ − n) / (n²(n−1))`. A significantly low R means
    * clustering (trend/regime), high R means oscillation.
    *
    * Shape: the sign sequence needs time adjacency, so this op uses a
    * per-series ordered window (`lag`) — inherently sequential per
    * key, the same posture as the streak/transition ops; partitions
    * scale with series count, and the post-window fold is exact
    * integers into a k-row frame.
    */
  def runsTest(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(
      col("event_type").as("g"),
      col("ts"), col("event_id"),
      round(col("value") * 1000).cast("long").as("v"))
    runsTest(e, "g", "v", Seq("ts", "event_id"))
  }

  /** DataFrame-first form: `orderCols` must totally order each series
    * (ties broken by a unique id) or the run count is undefined.
    */
  def runsTest(df: DataFrame, groupCol: String, vCol: String,
               orderCols: Seq[String]): DataFrame = {
    val med = df.groupBy(col(groupCol).as("g"))
      .agg(round(percentile(col(vCol).cast("long"), lit(0.5)) * 2)
        .cast("long").as("med2"))
    val signed = df
      .select(col(groupCol).as("g") +: col(vCol).cast("long").as("v") +:
        orderCols.map(col): _*)
      .join(broadcast(med), Seq("g"))
      .filter(lit(2L) * col("v") =!= col("med2"))
      .select(col("g") +: (lit(2L) * col("v") > col("med2")).as("up") +:
        orderCols.map(col): _*)
    val w = Window.partitionBy(col("g")).orderBy(orderCols.map(col): _*)
    signed
      .select(col("g"), col("up"),
        (lag(col("up"), 1).over(w) =!= col("up")).as("flip"))
      .groupBy(col("g"))
      .agg(count_if(col("up")).as("n1"), count_if(!col("up")).as("n2"),
        (count_if(col("flip")) + 1).as("runs"))
      .select(col("g"), col("n1"), col("n2"), col("runs"),
        (d("n1") + d("n2")).as("nn"),
        (lit(2.0) * d("n1") * d("n2")).as("p2"))
      .select(col("g"), col("n1"), col("n2"), col("runs"),
        when(col("n1") === 0 || col("n2") === 0 || col("nn") <= 1 ||
            col("p2") * (col("p2") - col("nn")) <= 0, lit(null))
          .otherwise(round(
            (d("runs") - (col("p2") / col("nn") + 1.0)) /
              sqrt(col("p2") * (col("p2") - col("nn")) /
                (col("nn") * col("nn") * (col("nn") - 1.0))), 4))
          .as("z"))
      .orderBy(col("g"))
  }

  // -------------------------------------------------- effect sizes

  /** Pairwise effect sizes between groups — the "is the difference
    * big, not just significant" companion to [[anovaF]] and the Welch
    * t: Cohen's d (pooled-SD standardized mean gap), Hedges' g (the
    * small-sample-corrected d), and Cliff's δ (the ordinal,
    * outlier-proof `P(x>y) − P(x<y)`).
    *
    * Everything derives from ONE value census (group × value):
    * moments for d/g as `Σ cnt·v` in DECIMAL(38,0), and δ's
    * greater/equal pair counts from per-group cumulative counts on
    * the dense (value × group) grid — the census discipline of
    * [[Ranks]]/[[Mixing.mannWhitney]], windows only over the
    * domain-bounded grid, never rows. δ is one exact-integer rational
    * (`#gt − #lt` over `n_a·n_b`, with `#lt` recovered from the
    * `n_a·n_b − #gt − #eq` identity); d and g are one shared staged
    * double tail. Pairs with a sub-2 sample are excluded (no sample
    * variance — the [[Diagnostics.welchTTest]] convention).
    */
  def effectSizes(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("event_type").as("g"),
      round(col("value") * 1000).cast("long").as("v"))
    effectSizes(e, "g", "v")
  }

  /** DataFrame-first form over any (group, integral value) frame. */
  def effectSizes(df: DataFrame, groupCol: String, vCol: String): DataFrame = {
    val census = df.select(col(groupCol).as("g"), col(vCol).cast("long").as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
    val mom = census.groupBy(col("g"))
      .agg(sum(col("cnt")).as("n"),
        sum(col("cnt").cast(Dec) * col("v").cast(Dec)).as("s"),
        sum(col("cnt").cast(Dec) * col("v").cast(Dec) * col("v").cast(Dec))
          .as("ss"))
      .filter(col("n") >= 2)
    val dense = census.select(col("v")).distinct()
      .crossJoin(broadcast(mom.select(col("g"))))
      .join(census, Seq("g", "v"), "left").na.fill(0L, Seq("cnt"))
      .withColumn("lt",
        sum(col("cnt")).over(
          Window.partitionBy(col("g")).orderBy(col("v"))) - col("cnt"))
    def side(sfx: String) = dense.select(col("v"),
      col("g").as(s"t_$sfx"), col("cnt").as(s"cnt_$sfx"),
      col("lt").as(s"lt_$sfx"))
    val pairCounts = side("a")
      .join(side("b"), Seq("v"))
      .filter(col("t_a") < col("t_b"))
      .groupBy(col("t_a"), col("t_b"))
      .agg(
        sum(col("cnt_a").cast(Dec) * col("lt_b").cast(Dec)).as("gt"),
        sum(col("cnt_a").cast(Dec) * col("cnt_b").cast(Dec)).as("eq"))
    def m(sfx: String) = mom.select(col("g").as(s"t_$sfx"),
      col("n").as(s"n_$sfx"), col("s").as(s"s_$sfx"), col("ss").as(s"ss_$sfx"))
    pairCounts
      .join(broadcast(m("a")), Seq("t_a")).join(broadcast(m("b")), Seq("t_b"))
      .select(col("t_a"), col("t_b"), col("n_a"), col("n_b"),
        (d(col("s_a")) / d("n_a")).as("ma"), (d(col("s_b")) / d("n_b")).as("mb"),
        ((d(col("ss_a")) - d(col("s_a")) * d(col("s_a")) / d("n_a"))
          / (d("n_a") - lit(1.0))).as("va"),
        ((d(col("ss_b")) - d(col("s_b")) * d(col("s_b")) / d("n_b"))
          / (d("n_b") - lit(1.0))).as("vb"),
        col("gt"), col("eq"))
      .select(col("t_a"), col("t_b"), col("n_a"), col("n_b"),
        col("ma"), col("mb"), col("gt"), col("eq"),
        sqrt(((d("n_a") - 1.0) * col("va") + (d("n_b") - 1.0) * col("vb"))
          / (d("n_a") + d("n_b") - 2.0)).as("sp"))
      .select(col("t_a"), col("t_b"), col("n_a"), col("n_b"),
        when(col("sp") === 0.0, lit(null))
          .otherwise(round((col("ma") - col("mb")) / col("sp"), 4))
          .as("cohen_d"),
        when(col("sp") === 0.0, lit(null))
          .otherwise(round((col("ma") - col("mb")) / col("sp") *
            (lit(1.0) - lit(3.0) /
              (lit(4.0) * (d("n_a") + d("n_b")) - 9.0)), 4))
          .as("hedges_g"),
        // δ = (#gt − #lt)/(na·nb); #lt = na·nb − #gt − #eq
        round((d(col("gt")) * 2 + d(col("eq"))
          - d("n_a") * d("n_b")) / (d("n_a") * d("n_b")), 6)
          .as("cliffs_delta"))
      .orderBy(col("t_a"), col("t_b"))
  }

  val effectSizesSql: String =
    """WITH q AS (
      |  SELECT event_type AS g,
      |    CAST(round(value * 1000) AS BIGINT) AS v
      |  FROM events),
      |c AS (SELECT g, v, count(*) AS cnt FROM q GROUP BY g, v),
      |mo AS (
      |  SELECT g, CAST(sum(cnt) AS BIGINT) AS n,
      |    sum(CAST(cnt AS HUGEINT) * v) AS s,
      |    sum(CAST(cnt AS HUGEINT) * v * v) AS ss
      |  FROM c GROUP BY g HAVING sum(cnt) >= 2),
      |dense AS (
      |  SELECT vv.v, mo.g, coalesce(c.cnt, 0) AS cnt
      |  FROM (SELECT DISTINCT v FROM c) vv
      |  CROSS JOIN (SELECT g FROM mo) mo
      |  LEFT JOIN c ON c.g = mo.g AND c.v = vv.v),
      |cdf AS (
      |  SELECT v, g, cnt,
      |    sum(cnt) OVER (PARTITION BY g ORDER BY v) - cnt AS lt
      |  FROM dense),
      |pc AS (
      |  SELECT a.g AS t_a, b.g AS t_b,
      |    sum(CAST(a.cnt AS HUGEINT) * b.lt) AS gt,
      |    sum(CAST(a.cnt AS HUGEINT) * b.cnt) AS eq
      |  FROM cdf a JOIN cdf b ON a.v = b.v AND a.g < b.g
      |  GROUP BY a.g, b.g),
      |j AS (
      |  SELECT t_a, t_b, ma.n AS n_a, mb.n AS n_b,
      |    CAST(ma.s AS DOUBLE) / CAST(ma.n AS DOUBLE) AS mma,
      |    CAST(mb.s AS DOUBLE) / CAST(mb.n AS DOUBLE) AS mmb,
      |    (CAST(ma.ss AS DOUBLE)
      |      - CAST(ma.s AS DOUBLE) * CAST(ma.s AS DOUBLE) / CAST(ma.n AS DOUBLE))
      |      / (CAST(ma.n AS DOUBLE) - 1.0) AS va,
      |    (CAST(mb.ss AS DOUBLE)
      |      - CAST(mb.s AS DOUBLE) * CAST(mb.s AS DOUBLE) / CAST(mb.n AS DOUBLE))
      |      / (CAST(mb.n AS DOUBLE) - 1.0) AS vb,
      |    gt, eq
      |  FROM pc JOIN mo ma ON pc.t_a = ma.g JOIN mo mb ON pc.t_b = mb.g),
      |sp AS (
      |  SELECT t_a, t_b, n_a, n_b, mma, mmb, gt, eq,
      |    sqrt(((CAST(n_a AS DOUBLE) - 1.0) * va
      |      + (CAST(n_b AS DOUBLE) - 1.0) * vb)
      |      / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 2.0)) AS spd
      |  FROM j)
      |SELECT t_a, t_b, n_a, n_b,
      |  CASE WHEN spd = 0.0 THEN NULL
      |    ELSE round((mma - mmb) / spd, 4) END AS cohen_d,
      |  CASE WHEN spd = 0.0 THEN NULL
      |    ELSE round((mma - mmb) / spd
      |      * (1.0 - 3.0 / (4.0 * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
      |          - 9.0)), 4) END AS hedges_g,
      |  round((CAST(gt AS DOUBLE) * 2 + CAST(eq AS DOUBLE)
      |    - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
      |    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) AS cliffs_delta
      |FROM sp ORDER BY t_a, t_b""".stripMargin

  // ------------------------------------------------ split conformal

  /** Residual domain is order-price-like cents; 2¹² keeps both rank
    * levels bounded (see [[Ranks.doubledRanks]]).
    */
  private val ConformalBucketWidth = 1L << 12

  /** Split-conformal prediction intervals (Vovk et al.; Lei et al.
    * 2018) for a per-group linear model — the distribution-free
    * answer to "how wide must the error band be to cover 1−α of
    * unseen data": fit OLS on the TRAIN split, take `q̂` = the
    * `⌈(n_cal+1)(1−α)⌉`-th smallest absolute residual on the
    * CALIBRATION split, and report the guaranteed-coverage band plus
    * its ACTUAL coverage on the held-out TEST split. All three splits
    * derive from the engine's portable multiplicative hash (the
    * [[Sampling.trainSplit]] discipline — no RNG, both engines agree
    * row-for-row).
    *
    * Numeric discipline: OLS comes from DECIMAL(38,0) moments;
    * residuals quantize to integer cents through ONE shared double
    * expression; the rank `k` is exact integer ceiling arithmetic
    * (`(p + q − 1) div q`, never float `ceil`); and the k-th order
    * statistic is selected by the two-level census scan
    * ([[Ranks.doubledRanks]]: the value where `lt < k ≤ lt + cnt`) —
    * never a per-row sort. Coverage is an exact basis-point integer.
    *
    * Shape: one keyed moment aggregation, two broadcast joins of
    * k-row frames, one residual census + bounded rank scan, one test
    * fold. A group whose train split has zero x-variance cannot fit
    * a slope and is excluded (documented).
    */
  def splitConformal(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select(
      col("l_returnflag").as("g"),
      col("l_quantity").cast("long").as("x"),
      round(col("l_extendedprice") * 100).cast("long").as("y"),
      (col("l_orderkey") * 16 + col("l_linenumber")).as("key"))
    splitConformal(l, "g", "x", "y", "key", alphaBp = 1000)
  }

  /** DataFrame-first form; `alphaBp` is the miscoverage budget in
    * basis points (1000 = 10% → a 90% interval).
    */
  def splitConformal(df: DataFrame, groupCol: String, xCol: String,
                     yCol: String, keyCol: String, alphaBp: Int): DataFrame = {
    require(alphaBp > 0 && alphaBp < 10000, s"splitConformal: alphaBp=$alphaBp")
    val base = df.select(col(groupCol).as("g"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"),
        (((col(keyCol) % 1000000007L) * 2654435761L) % 10L).as("b"))
      .select(col("g"), col("x"), col("y"),
        when(col("b") < 6, "train").when(col("b") < 8, "cal")
          .otherwise("test").as("part"))
    val xd = col("x").cast(Dec); val yd = col("y").cast(Dec)
    val fit = base.filter(col("part") === "train")
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_train"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(xd * yd).as("sxy"),
        sum(xd * xd).as("sxx"))
      .select(col("g"), col("n_train"),
        (d(col("n_train")) * d(col("sxy")) - d(col("sx")) * d(col("sy")))
          .as("num"),
        (d(col("n_train")) * d(col("sxx")) - d(col("sx")) * d(col("sx")))
          .as("den"),
        d(col("sy")).as("syd"), d(col("sx")).as("sxd"))
      .filter(col("den") =!= 0.0) // zero x-variance: no slope to fit
      .select(col("g"), col("n_train"), (col("num") / col("den")).as("slope"),
        ((col("syd") - col("num") / col("den") * col("sxd"))
          / d(col("n_train"))).as("icept"))
    // the residual frame appears twice in the final plan (calibration
    // census, then the test fold) — deliberately NOT persisted:
    // both references share one subplan, so the single collecting job
    // reuses the exchange; an eager persist was measured SLOWER
    // (extra materialization job + cache write for zero saved work)
    val scored = base.filter(col("part") =!= "train")
      .join(broadcast(fit), Seq("g"))
      .select(col("g"), col("part"), col("n_train"), col("slope"), col("icept"),
        round(abs(d(col("y")) - col("icept") - col("slope") * d(col("x"))))
          .cast("long").as("r"))
    // QUANTILE-BUCKET PRUNING (the weightedMedian trick, adapted): q̂
    // is ONE order statistic, so after the census the coarse
    // (g, bucket) count prefix alone locates the single bucket the
    // k-th residual lands in, and only THAT bucket's census rows get
    // the fine window — doubledRanks' corpus-census⋈coarse join and
    // full fine window never exist. Unlike weightedMedian the census
    // IS still built: `scored` is an expensive subplan (scan ⋈ fit),
    // so one census evaluation beats a second raw-row pass (measured —
    // the census-free form re-evaluated `scored` and ran 25% SLOWER).
    // The DuckDB twin keeps the two-level census scan, so the oracle
    // stays an independent derivation of the same statistic.
    val calCensus = scored.filter(col("part") === "cal")
      .groupBy(col("g").as("g"), col("r").as("v"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("bk", expr(s"CAST((v - pmod(v, $ConformalBucketWidth))" +
        s" / $ConformalBucketWidth AS BIGINT)"))
    val coarse = calCensus.groupBy(col("g"), col("bk"))
      .agg(sum(col("cnt")).as("bc"))
    val wg = Window.partitionBy(col("g")).orderBy(col("bk"))
    val pre = coarse.select(col("g"), col("bk"), col("bc"),
      (sum(col("bc")).over(wg) - col("bc")).as("cc"))
    val kOf = coarse.groupBy(col("g"))
      .agg(sum(col("bc")).as("n_cal"))
      .select(col("g"), col("n_cal"),
        // k = ⌈(n_cal+1)·(1−α)⌉ in exact integer arithmetic
        least(
          expr(s"((n_cal + 1) * ${10000 - alphaBp} + 9999) div 10000"),
          col("n_cal")).as("k"))
    val target = pre.join(broadcast(kOf), Seq("g"))
      .filter(col("cc") < col("k") && col("k") <= col("cc") + col("bc"))
      .select(col("g"), col("bk"), col("cc"), col("n_cal"), col("k"))
    val fineW = Window.partitionBy(col("g"), col("bk")).orderBy(col("v"))
    val qhat = calCensus.join(broadcast(target), Seq("g", "bk"))
      .withColumn("lt",
        col("cc") + sum(col("cnt")).over(fineW) - col("cnt"))
      .filter(col("lt") < col("k") && col("k") <= col("lt") + col("cnt"))
      .select(col("g"), col("n_cal"), col("v").as("qhat_cents"))
    scored.filter(col("part") === "test")
      .join(broadcast(qhat), Seq("g"))
      .groupBy(col("g"), col("n_train"), col("n_cal"), col("qhat_cents"),
        col("slope"), col("icept"))
      .agg(count(lit(1)).as("n_test"),
        count_if(col("r") <= col("qhat_cents")).as("covered"))
      .select(col("g"), col("n_train"), col("n_cal"), col("n_test"),
        round(col("slope"), 6).as("slope"),
        round(col("icept"), 2).as("intercept_cents"),
        col("qhat_cents"),
        expr("covered * 10000 div n_test").as("coverage_bp"))
      .orderBy(col("g"))
  }

  val splitConformalSql: String =
    """WITH q AS (
      |  SELECT l_returnflag AS g,
      |    CAST(l_quantity AS BIGINT) AS x,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
      |    (((l_orderkey * 16 + l_linenumber) % 1000000007) * 2654435761)
      |      % 10 AS b
      |  FROM lineitem),
      |p AS (
      |  SELECT g, x, y,
      |    CASE WHEN b < 6 THEN 'train' WHEN b < 8 THEN 'cal'
      |      ELSE 'test' END AS part
      |  FROM q),
      |f AS (
      |  SELECT g, count(*) AS n_train,
      |    CAST(count(*) AS DOUBLE) * CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE)
      |      - CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE) AS num,
      |    CAST(count(*) AS DOUBLE) * CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE)
      |      - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE) AS den,
      |    CAST(sum(y) AS DOUBLE) AS syd, CAST(sum(x) AS DOUBLE) AS sxd
      |  FROM p WHERE part = 'train' GROUP BY g),
      |ab AS (
      |  SELECT g, n_train, num / den AS slope,
      |    (syd - num / den * sxd) / CAST(n_train AS DOUBLE) AS icept
      |  FROM f WHERE den <> 0),
      |s AS (
      |  SELECT p.g, part, n_train, slope, icept,
      |    CAST(round(abs(CAST(y AS DOUBLE) - icept
      |      - slope * CAST(x AS DOUBLE))) AS BIGINT) AS r
      |  FROM p JOIN ab ON p.g = ab.g WHERE part <> 'train'),
      |cc AS (
      |  SELECT g, r AS v, count(*) AS cnt
      |  FROM s WHERE part = 'cal' GROUP BY g, r),
      |ko AS (
      |  SELECT g, CAST(sum(cnt) AS BIGINT) AS n_cal,
      |    least(((sum(cnt) + 1) * 9000 + 9999) // 10000,
      |      sum(cnt)) AS k
      |  FROM cc GROUP BY g),
      |rk AS (
      |  SELECT g, v, cnt,
      |    sum(cnt) OVER (PARTITION BY g ORDER BY v) - cnt AS lt
      |  FROM cc),
      |qh AS (
      |  SELECT rk.g, n_cal, v AS qhat_cents
      |  FROM rk JOIN ko ON rk.g = ko.g
      |  WHERE lt < k AND k <= lt + cnt)
      |SELECT s.g, n_train, n_cal, count(*) AS n_test,
      |  round(slope, 6) AS slope,
      |  round(icept, 2) AS intercept_cents,
      |  qhat_cents,
      |  CAST((count(*) FILTER (r <= qhat_cents)) * 10000 // count(*)
      |    AS BIGINT) AS coverage_bp
      |FROM s JOIN qh ON s.g = qh.g
      |WHERE part = 'test'
      |GROUP BY s.g, n_train, n_cal, qhat_cents, slope, icept
      |ORDER BY s.g""".stripMargin

  // ------------------------------------------------------- log loss

  /** Logistic log loss (cross-entropy) of a permille probability
    * against a binary outcome, per group:
    * `LL = −mean( y·ln(p̂) + (1−y)·ln(1−p̂) )`. Probabilities clamp
    * to [1, 999]‰ first — the standard ε-clip that keeps a confident
    * wrong prediction finite. Each row's term is quantized to
    * integer MICRO-NATS before the fold (the unigram/bigram-LM
    * discipline): the corpus-sized sum is then exact integer
    * arithmetic, order-free, and the only double work left is one
    * division per group.
    */
  def logLoss(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select(
      col("l_linestatus").as("g"),
      round(col("l_discount") * 10000).cast("long").as("p"),
      (col("l_returnflag") === "R").as("y"))
    logLoss(l, "g", "p", "y")
  }

  /** DataFrame-first form: `probCol` integral permille in 0..1000.
    * Domain enforcement IS the ε-clip: any value outside [1, 999]‰ —
    * including out-of-domain scores below 0 or above 1000 — is
    * clamped to the boundary, i.e. treated as a maximally confident
    * prediction at the clip edge. No input can reach `ln(0)`.
    */
  def logLoss(df: DataFrame, groupCol: String, probCol: String,
              labelCol: String): DataFrame = {
    val p = greatest(lit(1L), least(lit(999L), col(probCol).cast("long")))
    df.select(col(groupCol).as("g"), p.as("p"),
        col(labelCol).cast("boolean").as("y"))
      .select(col("g"), col("y"),
        round(log(when(col("y"), d("p")).otherwise(lit(1000.0) - d("p"))
          / 1000.0) * -1e6).cast("long").as("nll_micro"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), count_if(col("y")).as("n_pos"),
        sum(col("nll_micro")).as("s"))
      .select(col("g"), col("n"), col("n_pos"),
        round(d("s") / 1e6 / d("n"), 6).as("log_loss"))
      .orderBy(col("g"))
  }

  val logLossSql: String =
    """WITH q AS (
      |  SELECT l_linestatus AS g,
      |    greatest(1, least(999, CAST(round(l_discount * 10000) AS BIGINT)))
      |      AS p,
      |    (l_returnflag = 'R') AS y
      |  FROM lineitem),
      |m AS (
      |  SELECT g, y,
      |    CAST(round(ln(
      |      (CASE WHEN y THEN CAST(p AS DOUBLE)
      |            ELSE 1000.0 - CAST(p AS DOUBLE) END) / 1000.0)
      |      * -1e6) AS BIGINT) AS nll_micro
      |  FROM q),
      |a AS (
      |  SELECT g, count(*) AS n,
      |    CAST(count(*) FILTER (y) AS BIGINT) AS n_pos,
      |    CAST(sum(nll_micro) AS BIGINT) AS s
      |  FROM m GROUP BY g)
      |SELECT g, n, n_pos,
      |  round(CAST(s AS DOUBLE) / 1e6 / CAST(n AS DOUBLE), 6) AS log_loss
      |FROM a ORDER BY g""".stripMargin

  // -------------------------------------------- Jensen–Shannon

  /** Jensen–Shannon divergence of each source's category distribution
    * from the corpus-wide distribution — the bounded, symmetric
    * drift measure (0 = identical mix, ln 2 ≈ 0.693 = disjoint).
    * `JSD(P‖Q) = ½KL(P‖M) + ½KL(Q‖M)`, `M = ½(P+Q)`; a category the
    * source never emits contributes only through the Q side
    * (0·ln 0 ≡ 0). Per-category terms micro-round to integers before
    * the per-source sum — see the module doc.
    *
    * Shape: one (source × category) census, margins re-aggregated
    * from it and broadcast back; everything after the census is
    * bounded by |sources|·|categories|.
    */
  def jsDivergence(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("source").as("src"), col("lang").as("cat"))
    jsDivergence(docs, "src", "cat")
  }

  /** DataFrame-first form over any (population, category) frame. */
  def jsDivergence(df: DataFrame, srcCol: String, catCol: String): DataFrame = {
    val cells = df.select(col(srcCol).as("src"), col(catCol).as("cat"))
      .groupBy(col("src"), col("cat")).agg(count(lit(1)).as("c"))
    val bySrc = cells.groupBy(col("src")).agg(sum(col("c")).as("ns"))
    val byCat = cells.groupBy(col("cat")).agg(sum(col("c")).as("nc"))
    val tot = cells.agg(sum(col("c")).as("nt"))
    // P = in-source share, Q = corpus share; both over the corpus's
    // category list (a source-absent category has c = 0 via the
    // right join against the bounded source × category grid)
    val grid = bySrc.crossJoin(broadcast(byCat)).crossJoin(broadcast(tot))
    val terms = grid.join(cells, Seq("src", "cat"), "left")
      .na.fill(0L, Seq("c"))
      .select(col("src"), col("ns"),
        (d("c") / d("ns")).as("p"), (d("nc") / d("nt")).as("q"))
      .select(col("src"), col("ns"),
        round((
          when(col("p") > 0,
            col("p") * log(col("p") / ((col("p") + col("q")) / 2)))
            .otherwise(lit(0.0)) +
          col("q") * log(col("q") / ((col("p") + col("q")) / 2))
        ) / 2 * 1e6).cast("long").as("t_micro"))
    terms.groupBy(col("src"), col("ns"))
      .agg(sum(col("t_micro")).as("s_micro"))
      .select(col("src"), col("ns").as("n_docs"),
        round(d("s_micro") / 1e6, 6).as("jsd"))
      .orderBy(col("src"))
  }

  val jsDivergenceSql: String =
    """WITH cells AS (
      |  SELECT source AS src, lang AS cat, count(*) AS c
      |  FROM documents GROUP BY 1, 2),
      |bs AS (SELECT src, CAST(sum(c) AS BIGINT) AS ns FROM cells GROUP BY src),
      |bc AS (SELECT cat, CAST(sum(c) AS BIGINT) AS nc FROM cells GROUP BY cat),
      |tt AS (SELECT CAST(sum(c) AS BIGINT) AS nt FROM cells),
      |grid AS (SELECT src, ns, cat, nc, nt FROM bs, bc, tt),
      |terms AS (
      |  SELECT g.src, g.ns,
      |    CAST(round((
      |      CASE WHEN coalesce(c, 0) > 0 THEN
      |        (CAST(coalesce(c, 0) AS DOUBLE) / CAST(ns AS DOUBLE))
      |        * ln((CAST(coalesce(c, 0) AS DOUBLE) / CAST(ns AS DOUBLE))
      |          / (((CAST(coalesce(c, 0) AS DOUBLE) / CAST(ns AS DOUBLE))
      |              + CAST(nc AS DOUBLE) / CAST(nt AS DOUBLE)) / 2))
      |      ELSE 0.0 END
      |      + (CAST(nc AS DOUBLE) / CAST(nt AS DOUBLE))
      |        * ln((CAST(nc AS DOUBLE) / CAST(nt AS DOUBLE))
      |          / (((CAST(coalesce(c, 0) AS DOUBLE) / CAST(ns AS DOUBLE))
      |              + CAST(nc AS DOUBLE) / CAST(nt AS DOUBLE)) / 2))
      |    ) / 2 * 1e6) AS BIGINT) AS t_micro
      |  FROM grid g LEFT JOIN cells ON g.src = cells.src AND g.cat = cells.cat)
      |SELECT src, ns AS n_docs,
      |  round(CAST(sum(t_micro) AS DOUBLE) / 1e6, 6) AS jsd
      |FROM terms GROUP BY src, ns
      |ORDER BY src""".stripMargin

  val runsTestSql: String =
    """WITH q AS (
      |  SELECT event_type AS g, ts, event_id,
      |    CAST(round(value * 1000) AS BIGINT) AS v
      |  FROM events),
      |md AS (
      |  SELECT g, CAST(round(quantile_cont(v, 0.5) * 2) AS BIGINT) AS med2
      |  FROM q GROUP BY g),
      |s AS (
      |  SELECT q.g, (2 * v > med2) AS up, ts, event_id
      |  FROM q JOIN md ON q.g = md.g
      |  WHERE 2 * v <> med2),
      |f AS (
      |  SELECT g, up,
      |    (lag(up) OVER (PARTITION BY g ORDER BY ts, event_id) <> up)
      |      AS flip
      |  FROM s),
      |a AS (
      |  SELECT g,
      |    CAST(count(*) FILTER (up) AS BIGINT) AS n1,
      |    CAST(count(*) FILTER (NOT up) AS BIGINT) AS n2,
      |    CAST(count(*) FILTER (flip) + 1 AS BIGINT) AS runs
      |  FROM f GROUP BY g),
      |z AS (
      |  SELECT g, n1, n2, runs,
      |    CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) AS nn,
      |    2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) AS p2
      |  FROM a)
      |SELECT g, n1, n2, runs,
      |  CASE WHEN n1 = 0 OR n2 = 0 OR nn <= 1 OR p2 * (p2 - nn) <= 0
      |    THEN NULL
      |    ELSE round((CAST(runs AS DOUBLE) - (p2 / nn + 1.0))
      |      / sqrt(p2 * (p2 - nn) / (nn * nn * (nn - 1.0))), 4)
      |  END AS z
      |FROM z ORDER BY g""".stripMargin

  /** Stratified average treatment effect — the confounder-adjusted
    * replacement for a naive treated-vs-control mean gap: within each
    * stratum the comparison is apples-to-apples, and the global ATE
    * reweights per-stratum gaps by stratum mass,
    * ATE = Σ_s (n_s/N)(ȳ_t,s − ȳ_c,s) (Cochran 1968 post-
    * stratification; [[Diagnostics.diffInDiff]] adjusts by TIME, this
    * adjusts by COMPOSITION). The driver query reads the high-priority
    * premium on order value stratified by market segment.
    *
    * Determinism: per-stratum sums are exact cents; each stratum's gap
    * is rounded ONCE to milli-cents (BIGINT), the mass-weighted terms
    * are exact integer products, and the global ATE is one truncating
    * DIV — order-free everywhere. One-armed strata (no treated or no
    * control rows) report NULL gaps and are EXCLUDED from the ATE with
    * their mass (the visible-degradation rule); their rows still
    * appear.
    *
    * Scale posture: one stratum×arm aggregate (single shuffle), one
    * bounded per-stratum frame, one 1-row total broadcast.
    */
  def stratifiedAte(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_custkey"),
      col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("treated"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val seg = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment").as("stratum"))
    stratifiedAte(o.join(broadcast(seg), col("o_custkey") === col("c_custkey")),
      "stratum", "treated", "cents")
  }

  /** DataFrame-first form over any (stratum, treated, integral
    * outcome) frame.
    */
  def stratifiedAte(df: DataFrame, stratumCol: String, treatedCol: String,
                    outcomeCol: String): DataFrame = {
    val cells = df.select(col(stratumCol).as("stratum"),
        col(treatedCol).cast("boolean").as("t"),
        col(outcomeCol).cast("long").as("y"))
      .groupBy(col("stratum"))
      .agg(count_if(col("t")).as("n_t"),
        count_if(!col("t")).as("n_c"),
        sum(when(col("t"), col("y"))).as("s_t"),
        sum(when(!col("t"), col("y"))).as("s_c"))
      .withColumn("n_s", col("n_t") + col("n_c"))
      .withColumn("diff_milli",
        when(col("n_t") === 0 || col("n_c") === 0, lit(null))
          .otherwise(round((col("s_t").cast("double") / col("n_t")
            - col("s_c").cast("double") / col("n_c")) * 1000).cast("long")))
    val tot = cells.filter(col("diff_milli").isNotNull)
      .agg(sum(col("n_s")).as("n_used"),
        sum(col("diff_milli") * col("n_s")).as("wsum"))
      .select(
        when(col("n_used").isNull || col("n_used") === 0, lit(null))
          .otherwise(expr("CAST(wsum DIV n_used AS BIGINT)"))
          .as("ate_milli"))
    cells.crossJoin(broadcast(tot))
      .select(col("stratum"), col("n_t"), col("n_c"),
        when(col("n_t") > 0,
          round(col("s_t").cast("double") / col("n_t") / 100.0, 4))
          .as("mean_treated"),
        when(col("n_c") > 0,
          round(col("s_c").cast("double") / col("n_c") / 100.0, 4))
          .as("mean_control"),
        col("diff_milli"), col("ate_milli"))
      .orderBy(col("stratum"))
  }

  /** DuckDB twin of [[stratifiedAte]]: identical cells, milli gaps
    * and truncating mass-weighted DIV.
    */
  val stratifiedAteSql: String =
    """WITH o AS (
      |  SELECT c_mktsegment AS stratum,
      |    o_orderpriority IN ('1-URGENT', '2-HIGH') AS t,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS y
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |cells AS (
      |  SELECT stratum,
      |    CAST(count(*) FILTER (t) AS BIGINT) AS n_t,
      |    CAST(count(*) FILTER (NOT t) AS BIGINT) AS n_c,
      |    CAST(sum(y) FILTER (t) AS BIGINT) AS s_t,
      |    CAST(sum(y) FILTER (NOT t) AS BIGINT) AS s_c
      |  FROM o GROUP BY stratum),
      |d AS (
      |  SELECT *, n_t + n_c AS n_s,
      |    CASE WHEN n_t = 0 OR n_c = 0 THEN NULL
      |      ELSE CAST(round((CAST(s_t AS DOUBLE) / n_t
      |        - CAST(s_c AS DOUBLE) / n_c) * 1000) AS BIGINT) END
      |      AS diff_milli
      |  FROM cells),
      |tot AS (
      |  SELECT CASE WHEN sum(n_s) IS NULL OR sum(n_s) = 0 THEN NULL
      |    ELSE CAST(sum(diff_milli * n_s) // sum(n_s) AS BIGINT) END
      |    AS ate_milli
      |  FROM d WHERE diff_milli IS NOT NULL)
      |SELECT stratum, n_t, n_c,
      |  CASE WHEN n_t > 0
      |    THEN round(CAST(s_t AS DOUBLE) / n_t / 100.0, 4) END
      |    AS mean_treated,
      |  CASE WHEN n_c > 0
      |    THEN round(CAST(s_c AS DOUBLE) / n_c / 100.0, 4) END
      |    AS mean_control,
      |  diff_milli, ate_milli
      |FROM d CROSS JOIN tot
      |ORDER BY stratum""".stripMargin

  /** RRF constant — 60 per the original paper (Cormack, Clarke &amp;
    * Buettcher 2009): large enough that rank 1 vs 2 doesn't dominate,
    * small enough that tail ranks still differentiate.
    */
  val RrfK = 60L

  /** Reciprocal-rank fusion — the standard hybrid-retrieval combiner
    * (the BM25 ⊕ dense-vector merge every RAG stack runs): each item's
    * fused score is Σ_lists 1/(k + rank), which rewards appearing high
    * on ANY list without ever comparing the lists' incomparable raw
    * scores. Here the two "retrievers" rank customers by total revenue
    * and by order count; the fusion surfaces accounts strong on either
    * axis — the same machinery fuses any two rankings of one item set
    * ([[retrievalEval]] scores a single ranking; this MERGES rankings).
    *
    * Exactness: ranks are standard competition ranks (min rank of the
    * tie group) off the [[Ranks.doubledRanks]] census scan —
    * rank = N − lt − cnt + 1 on the descending axis, exact integers
    * with no per-row window; each reciprocal quantizes to nano-units
    * by one truncating DIV (positive operands, both engines truncate
    * identically) BEFORE the cross-list sum. Top-20 by (score, id) via
    * TakeOrdered.
    *
    * Scale posture: one per-customer aggregation, two census scans
    * (bounded windows only), two value-keyed equi-joins back to the
    * per-customer frame, one TakeOrdered. No corpus-sized window, no
    * driver state.
    */
  def rrfFusion(spark: SparkSession, dir: String): DataFrame =
    rrfFusion(
      Tables.orders(spark, dir).groupBy(col("o_custkey").as("id"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .as("rev_cents"),
          count(lit(1)).as("n_orders")),
      "id", "rev_cents", "n_orders", 20)

  /** DataFrame-first form: fuse the descending rankings of `aCol` and
    * `bCol` over any (id, a, b) frame.
    */
  def rrfFusion(df: DataFrame, idCol: String, aCol: String, bCol: String,
                topN: Int): DataFrame = {
    val rows = df.select(col(idCol).as("id"), col(aCol).cast("long").as("a"),
      col(bCol).cast("long").as("b"))
    val n = rows.agg(count(lit(1)).as("n_tot"))
    def descRanks(c: String, width: Long) = Ranks.doubledRanks(
      rows.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
        .withColumn("g", lit(0L)), width)
      .crossJoin(broadcast(n))
      .select(col("v").as(c),
        (col("n_tot") - col("lt") - col("cnt") + 1).as(s"rank_$c"))
    rows
      .join(descRanks("a", 1L << 16), Seq("a"))
      .join(descRanks("b", 16L), Seq("b"))
      .select(col("id"), col("a").as("rev_cents"), col("b").as("n_orders"),
        col("rank_a").as("rank_rev"), col("rank_b").as("rank_cnt"),
        expr(s"1000000000 DIV ($RrfK + rank_a)" +
          s" + 1000000000 DIV ($RrfK + rank_b)").as("rrf_nano"))
      .orderBy(col("rrf_nano").desc, col("id"))
      .limit(topN)
  }

  /** DuckDB twin of [[rrfFusion]]: plain rank() windows (min rank of
    * ties — identical to N − lt − cnt + 1), the same truncating nano
    * reciprocals.
    */
  val rrfFusionSql: String =
    s"""WITH per AS (
       |  SELECT o_custkey AS id,
       |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |      AS rev_cents,
       |    CAST(count(*) AS BIGINT) AS n_orders
       |  FROM orders GROUP BY o_custkey),
       |rk AS (
       |  SELECT id, rev_cents, n_orders,
       |    rank() OVER (ORDER BY rev_cents DESC) AS rank_rev,
       |    rank() OVER (ORDER BY n_orders DESC) AS rank_cnt
       |  FROM per)
       |SELECT id, rev_cents, n_orders,
       |  CAST(rank_rev AS BIGINT) AS rank_rev,
       |  CAST(rank_cnt AS BIGINT) AS rank_cnt,
       |  CAST(1000000000 // ($RrfK + rank_rev)
       |    + 1000000000 // ($RrfK + rank_cnt) AS BIGINT) AS rrf_nano
       |FROM rk
       |ORDER BY rrf_nano DESC, id
       |LIMIT 20""".stripMargin

  /** CUPED — Controlled-experiment Using Pre-Experiment Data (Deng,
    * Xu, Kohavi, Walker, WSDM 2013): the variance-reduction adjustment
    * every experimentation platform applies before reading an A/B
    * test. Each user's experiment-period metric Y is shifted by
    * θ·(X − X̄) where X is the SAME user's pre-period metric and
    * θ = cov(X,Y)/var(X); the adjusted variant means estimate the same
    * treatment effect with variance scaled by 1 − ρ²(X,Y). Reported
    * per variant: users, raw mean, CUPED-adjusted mean, plus the
    * global θ and the variance-reduction percentage — the number that
    * says how much longer the unadjusted experiment would have run.
    *
    * The driver query splits the events month at day 16 (the
    * [[Relational]] mergeUpsert cut): days 1–15 are the pre-period,
    * days 16+ the experiment, and the variant is the deterministic
    * multiplicative-hash parity of user_id ([[Sampling.splitBucket]]
    * — cross-engine reproducible, no RNG).
    *
    * Exactness: per-user sums quantize to milli-units ONCE
    * (row-local), so X/Y are exact BIGINTs; all five moments
    * accumulate order-free (products in DECIMAL(38,0)); θ, ρ², and
    * the adjusted means are ONE shared double expression over those
    * exact integers — bit-identical cross-engine. Users absent from a
    * period carry 0 (a real platform's "no activity" reading, and the
    * only choice that keeps both engines' user sets identical).
    *
    * Scale posture: one per-user aggregation (conditional sums — one
    * shuffle), one 1-row global-moment aggregate broadcast back over
    * the 2-row variant frame. No windows, no driver state.
    */
  def cuped(spark: SparkSession, dir: String): DataFrame =
    cuped(Tables.events(spark, dir), "user_id", "value", "ts",
      "2024-01-16")

  /** DataFrame-first form: `cutDate` (inclusive lower bound of the
    * experiment period, `yyyy-MM-dd`) splits pre/experiment.
    */
  def cuped(events: DataFrame, userCol: String, valCol: String,
            tsCol: String, cutDate: String): DataFrame = {
    def dec(c: Column) = c.cast(DecimalType(38, 0))
    val perUser = events
      .select(col(userCol).as("u"),
        round(col(valCol) * 1000).cast("long").as("vm"),
        (col(tsCol) < to_timestamp(lit(cutDate))).as("pre"))
      .groupBy(col("u"))
      .agg(coalesce(sum(when(col("pre"), col("vm"))), lit(0L)).as("x"),
        coalesce(sum(when(!col("pre"), col("vm"))), lit(0L)).as("y"))
      .withColumn("variant",
        when(pmod(Sampling.splitBucket(col("u")), lit(2L)) === 0, "A")
          .otherwise("B"))
    val g = perUser.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(dec(col("x")) * dec(col("x"))).as("sxx"),
      sum(dec(col("x")) * dec(col("y"))).as("sxy"),
      sum(dec(col("y")) * dec(col("y"))).as("syy"))
    val perVariant = perUser.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("x")).as("gx"), sum(col("y")).as("gy"))
    def d(name: String) = col(name).cast("double")
    val num = d("n") * d("sxy") - d("sx") * d("sy")
    val denx = d("n") * d("sxx") - d("sx") * d("sx")
    val deny = d("n") * d("syy") - d("sy") * d("sy")
    val theta = when(denx === 0d, lit(0.0)).otherwise(num / denx)
    perVariant.crossJoin(broadcast(g))
      .select(col("variant"), col("n_users"),
        round(d("gy") / d("n_users") / 1000.0, 4).as("mean_y"),
        round((d("gy") / d("n_users")
          - theta * (d("gx") / d("n_users") - d("sx") / d("n")))
          / 1000.0, 4).as("mean_y_adj"),
        round(theta, 6).as("theta"),
        when(denx === 0d || deny === 0d, lit(null))
          .otherwise(round(num * num / (denx * deny) * 100.0, 2))
          .as("var_reduction_pct"))
      .orderBy(col("variant"))
  }

  /** DuckDB twin of [[cuped]]: identical milli-quantized per-user
    * sums, HUGEINT moments, the same shared double tail.
    */
  val cupedSql: String =
    """WITH pu AS (
      |  SELECT user_id AS u,
      |    CAST(coalesce(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
      |      THEN CAST(round(value * 1000) AS BIGINT) END), 0) AS BIGINT) AS x,
      |    CAST(coalesce(sum(CASE WHEN NOT (ts < TIMESTAMP '2024-01-16')
      |      THEN CAST(round(value * 1000) AS BIGINT) END), 0) AS BIGINT) AS y,
      |    CASE WHEN ((user_id % 1000000007) * 2654435761) % 1000 % 2 = 0
      |      THEN 'A' ELSE 'B' END AS variant
      |  FROM events GROUP BY user_id),
      |g AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(x AS HUGEINT) * y) AS sxy,
      |    sum(CAST(y AS HUGEINT) * y) AS syy
      |  FROM pu),
      |v AS (
      |  SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
      |    CAST(sum(x) AS BIGINT) AS gx, CAST(sum(y) AS BIGINT) AS gy
      |  FROM pu GROUP BY variant),
      |t AS (
      |  SELECT n, sx,
      |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * sy AS num,
      |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * sx AS denx,
      |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |      - CAST(sy AS DOUBLE) * sy AS deny
      |  FROM g)
      |SELECT variant, n_users,
      |  round(CAST(gy AS DOUBLE) / n_users / 1000.0, 4) AS mean_y,
      |  round((CAST(gy AS DOUBLE) / n_users
      |    - (CASE WHEN denx = 0 THEN 0.0 ELSE num / denx END)
      |      * (CAST(gx AS DOUBLE) / n_users - CAST(sx AS DOUBLE) / n))
      |    / 1000.0, 4) AS mean_y_adj,
      |  round(CASE WHEN denx = 0 THEN 0.0 ELSE num / denx END, 6) AS theta,
      |  CASE WHEN denx = 0 OR deny = 0 THEN NULL
      |    ELSE round(num * num / (denx * deny) * 100.0, 2) END
      |    AS var_reduction_pct
      |FROM v CROSS JOIN t ORDER BY variant""".stripMargin

  /** Empirical-Bayes shrinkage of per-group rates under a
    * method-of-moments beta-binomial prior (Robbins 1956; the
    * "estimate α,β from the ensemble, then shrink each group toward
    * the prior mean" recipe popularized for batting averages / CTRs):
    * a supplier with 3 returns out of 4 lineitems is NOT a 75%-return
    * supplier — its shrunken rate (x+α)/(n+α+β) pools strength from
    * the whole fleet, and the low-n groups move most. The stabilizer
    * every per-group-rate ranking ([[Analytics.topSupplier]]-style
    * dashboards) needs before sorting by rate.
    *
    * Exactness: per-group observed rates are quantized ONCE
    * (x·1e6 DIV n, truncating) so the ensemble moments S1 = Σ rate,
    * S2 = Σ rate² are exact integer sums (DECIMAL(38,0) — rate² ≤
    * 1e12 per group bounds S2 past 1e25 groups); μ, the MoM
    * concentration K = μ(1−μ)/v − 1, α = μK, β = (1−μ)K and each
    * shrunken rate are ONE shared double expression tree rounded at
    * the end. Degenerate ensembles (v ≤ 0, i.e. all rates equal, or
    * K ≤ 0 when the sample variance exceeds the binomial ceiling)
    * yield NULL shrunken rates — loudly unshrinkable, never silently
    * wrong.
    *
    * Scale posture: one keyed aggregate (the corpus shuffle), one
    * 1-row moments broadcast, pure projection after. No windows.
    */
  def ebShrinkage(spark: SparkSession, dir: String): DataFrame =
    ebShrinkage(Tables.lineitem(spark, dir)
        .select(col("l_suppkey").as("grp"),
          (col("l_returnflag") === "R").cast("long").as("hit")),
      "grp", "hit")

  /** DataFrame-first form over any (group, 0/1 outcome) frame. */
  def ebShrinkage(df: DataFrame, grpCol: String, hitCol: String): DataFrame = {
    def dec(c: Column) = c.cast(DecimalType(38, 0))
    val per = df.select(col(grpCol).as("grp"), col(hitCol).cast("long").as("h"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("h")).as("x"))
      .withColumn("rate_micro", expr("x * 1000000 DIV n"))
    val mom = per.agg(count(lit(1)).as("m"),
      sum(dec(col("rate_micro"))).as("s1"),
      sum(dec(col("rate_micro")) * dec(col("rate_micro"))).as("s2"))
    val prior = mom.select(col("m"),
      (col("s1").cast("double") / col("m") / 1e6).as("mu"),
      (col("s2").cast("double") / col("m") / 1e12
        - pow(col("s1").cast("double") / col("m") / 1e6, 2)).as("v"))
      .select(col("m"), col("mu"),
        when(col("v") > 0 && col("mu") > 0 && col("mu") < 1,
          col("mu") * (lit(1.0) - col("mu")) / col("v") - 1.0).as("k0"))
      .select(col("m"), col("mu"),
        when(col("k0") > 0, col("k0")).as("k"))
    per.crossJoin(broadcast(prior))
      .select(col("grp"), col("n"), col("x"), col("rate_micro"),
        round(col("mu") * col("k"), 4).as("alpha"),
        round((lit(1.0) - col("mu")) * col("k"), 4).as("beta"),
        round((col("x").cast("double") + col("mu") * col("k"))
          / (col("n").cast("double") + col("k")), 6).as("shrunk_rate"))
      .orderBy(col("grp"))
  }

  /** DuckDB twin of [[ebShrinkage]] — same one-DIV rate quantization,
    * HUGEINT moments, shared double prior tail.
    */
  val ebShrinkageSql: String =
    """WITH per AS (
      |  SELECT l_suppkey AS grp, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x
      |  FROM lineitem GROUP BY l_suppkey),
      |r AS (SELECT grp, n, x, x * 1000000 // n AS rate_micro FROM per),
      |mom AS (
      |  SELECT CAST(count(*) AS BIGINT) AS m,
      |    sum(CAST(rate_micro AS HUGEINT)) AS s1,
      |    sum(CAST(rate_micro AS HUGEINT) * rate_micro) AS s2
      |  FROM r),
      |pr0 AS (
      |  SELECT m, CAST(s1 AS DOUBLE) / m / 1e6 AS mu,
      |    CAST(s2 AS DOUBLE) / m / 1e12
      |      - pow(CAST(s1 AS DOUBLE) / m / 1e6, 2) AS v
      |  FROM mom),
      |pr1 AS (
      |  SELECT m, mu,
      |    CASE WHEN v > 0 AND mu > 0 AND mu < 1
      |         THEN mu * (1.0 - mu) / v - 1.0 END AS k0
      |  FROM pr0),
      |pr AS (
      |  SELECT m, mu, CASE WHEN k0 > 0 THEN k0 END AS k FROM pr1)
      |SELECT grp, n, x, CAST(rate_micro AS BIGINT) AS rate_micro,
      |  round(mu * k, 4) AS alpha,
      |  round((1.0 - mu) * k, 4) AS beta,
      |  round((CAST(x AS DOUBLE) + mu * k) / (CAST(n AS DOUBLE) + k), 6)
      |    AS shrunk_rate
      |FROM r CROSS JOIN pr
      |ORDER BY grp""".stripMargin

  /** Inverse-propensity-scored off-policy evaluation (Horvitz &
    * Thompson 1952; IPS/SNIPS per Swaminathan & Joachims 2015): "what
    * would mean order value be if we ALWAYS assigned the urgent
    * priority?", answered from logged data where priorities were
    * assigned by some historical policy. Each logged urgent order is
    * re-weighted by the inverse of its empirical propensity within its
    * context cell (market segment); IPS divides by all N, the
    * self-normalized variant (SNIPS) divides by the realized weight
    * mass and is the lower-variance estimator practitioners report.
    * The observational sibling of [[stratifiedAte]] (which contrasts
    * two arms; this scores ONE counterfactual policy), plus the
    * effective-sample-size diagnostic that says how much data the
    * reweighting really kept.
    *
    * Exactness: propensities are never materialized as floats — each
    * cell's weighted outcome Σ y·(n_cell/n_t) = s_t·n_cell/n_t and
    * weight masses Σw = n_cell, Σw² = n_cell²/n_t are quantized ONCE
    * per cell by truncating DIV on DECIMAL(38,0) and summed as exact
    * integers; the final IPS/SNIPS/ESS divisions are the only double
    * steps. Cells with NO urgent orders have zero target support —
    * excluded from every sum WITH their mass reported in
    * `covered_milli`, the overlap-violation diagnostic (silent
    * exclusion is how off-policy numbers lie).
    *
    * Scale posture: one cell-keyed aggregate over orders (the corpus
    * shuffle — cells are the broadcast-joined segment dimension), a
    * |cells|-row frame after, one 1-row final aggregate. No windows.
    */
  def ipsOffPolicy(spark: SparkSession, dir: String): DataFrame =
    ipsOffPolicy(SegOrders(spark, dir)
        .select(col("g").as("cell"),
          (col("o_orderpriority") === "1-URGENT").as("is_target"),
          col("cents").as("y")),
      "cell", "is_target", "y")

  /** DataFrame-first form over any (context cell, target-action flag,
    * integral outcome) frame.
    */
  def ipsOffPolicy(df: DataFrame, cellCol: String, targetCol: String,
                   outcomeCol: String): DataFrame = {
    val cells = df.select(col(cellCol).as("cell"),
        col(targetCol).cast("boolean").as("tgt"),
        col(outcomeCol).cast("long").as("y"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_cell"), count_if(col("tgt")).as("n_t"),
        coalesce(sum(when(col("tgt"), col("y"))), lit(0L)).as("s_t"))
      .withColumn("term_milli", when(col("n_t") > 0, expr(
        "CAST(CAST(s_t AS DECIMAL(38,0)) * n_cell * 1000 DIV n_t" +
          " AS DECIMAL(38,0))")))
      .withColumn("w2_milli", when(col("n_t") > 0, expr(
        "CAST(CAST(n_cell AS DECIMAL(38,0)) * n_cell * 1000 DIV n_t" +
          " AS DECIMAL(38,0))")))
    val tot = cells.agg(sum(col("n_cell")).as("n_all"),
      sum(when(col("n_t") > 0, col("n_cell"))).as("n_sup"),
      sum(col("term_milli")).as("num_milli"),
      sum(col("w2_milli")).as("sw2_milli"))
      .select(
        expr("CAST(num_milli DIV n_all AS BIGINT)").as("ips_milli"),
        expr("CAST(num_milli DIV n_sup AS BIGINT)").as("snips_milli"),
        round(col("n_sup").cast("double") * col("n_sup").cast("double")
          / (col("sw2_milli").cast("double") / 1e3), 2).as("ess"),
        expr("CAST(n_sup * 1000 DIV n_all AS BIGINT)").as("covered_milli"))
    cells.crossJoin(broadcast(tot))
      .select(col("cell"), col("n_cell"), col("n_t"),
        col("term_milli").cast("long").as("term_milli"),
        col("ips_milli"), col("snips_milli"), col("ess"),
        col("covered_milli"))
      .orderBy(col("cell"))
  }

  /** Benjamini–Hochberg false-discovery-rate control (JRSS-B 1995)
    * over the per-brand price battery: each brand's mean lineitem
    * price is Welch-z-tested against the rest of the corpus, and BH
    * decides WHICH of the m simultaneous tests to reject at FDR
    * α = 0.05 — the multiple-testing closure the per-test family
    * ([[Diagnostics.welchTTest]], [[anovaF]], [[cramersV]]) needs
    * before anyone acts on "brand X prices differently": at m = 25
    * tests, one naive α = 0.05 rejection is EXPECTED by chance.
    *
    * Exactness: group and complement moments are exact integer sums
    * (the complement is exact subtraction from the 1-row corpus
    * total); z is one staged double tree rounded ONCE to integer
    * ten-thousandths, so the two-sided normal p — Abramowitz–Stegun
    * 7.1.26 erfc with the five literal coefficients, Horner form,
    * |ε| < 1.5e-7 — is computed from identical double inputs in both
    * engines and immediately quantized to integer e-7. From there BH
    * is pure integer arithmetic: the step-up test p·m ≤ α·k compares
    * p_e7·m against 500000·k exactly, and the monotonized adjusted
    * p is a running min of (p_e7·m) DIV k over the m-bounded grid.
    * Groups with no sample variance on either side have no z — they
    * are EXCLUDED (and shrink m) per the [[Diagnostics.welchTTest]]
    * degenerate-group discipline.
    *
    * Scale posture: one brand-keyed aggregate over the fact join (the
    * corpus shuffle; the part dim projection broadcasts), a 1-row
    * totals broadcast, then everything runs on the m-row test grid —
    * its two unpartitioned windows sit on the bounded post-aggregate
    * frame.
    */
  def fdrBh(spark: SparkSession, dir: String): DataFrame =
    fdrBh(Tables.lineitem(spark, dir)
        .join(broadcast(Tables.part(spark, dir)
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("grp"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v")),
      "grp", "v")

  /** DataFrame-first form over any (group, integral value) frame. */
  def fdrBh(df: DataFrame, grpCol: String, vCol: String): DataFrame = {
    val v = col(vCol).cast("long")
    val vd = v.cast(DecimalType(20, 0))
    val stats = df.select(col(grpCol).as("grp"), v.as("v"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        sum(vd * vd).as("ss"))
    val glob = stats.agg(sum(col("n")).as("nn"), sum(col("s")).as("st"),
      sum(col("ss")).as("sst"))
    def d(name: String) = col(name).cast("double")
    val z = stats.crossJoin(broadcast(glob))
      .filter(col("n") >= 2 && col("nn") - col("n") >= 2)
      .select(col("grp"), col("n"),
        (d("s") / d("n")).as("ma"),
        ((d("st") - d("s")) / (d("nn") - d("n"))).as("mr"),
        ((d("ss") - d("s") * d("s") / d("n")) / (d("n") - lit(1.0)) / d("n"))
          .as("sea"),
        (((d("sst") - d("ss")) - (d("st") - d("s")) * (d("st") - d("s"))
          / (d("nn") - d("n"))) / (d("nn") - d("n") - lit(1.0))
          / (d("nn") - d("n"))).as("seb"))
      .filter(col("sea") + col("seb") > 0d)
      .select(col("grp"), col("n"),
        expr("CAST(round((ma - mr) / sqrt(sea + seb) * 10000) AS BIGINT)")
          .as("z_e4"))
    // Abramowitz–Stegun 7.1.26: p = erfc(|z|/√2), Horner, quantized e-7
    val p = z
      .withColumn("x", abs(col("z_e4")).cast("double") / 1e4 / sqrt(lit(2.0)))
      .withColumn("t", lit(1.0) / (lit(1.0) + lit(0.3275911) * col("x")))
      .withColumn("p_e7", expr(
        """CAST(round(((((1.061405429 * t - 1.453152027) * t
          |  + 1.421413741) * t - 0.284496736) * t + 0.254829592) * t
          |  * exp(-x * x) * 1e7) AS BIGINT)""".stripMargin))
    val mCount = p.agg(count(lit(1)).as("m"))
    val rankW = Window.orderBy(col("p_e7"), col("grp"))
    val adjW = Window.orderBy(col("rk").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = p.crossJoin(broadcast(mCount))
      .withColumn("rk", row_number().over(rankW).cast("long"))
      .withColumn("q", least(lit(10000000L),
        expr("p_e7 * m DIV rk")))
      .withColumn("p_adj_e7", min(col("q")).over(adjW))
    val kMax = ranked
      .agg(coalesce(max(when(col("p_e7") * col("m") <= lit(500000L) * col("rk"),
        col("rk"))), lit(0L)).as("k_max"))
    ranked.crossJoin(broadcast(kMax))
      .select(col("grp"), col("n"),
        round(col("z_e4").cast("double") / 1e4, 4).as("z"),
        col("p_e7"), col("rk"), col("m"), col("p_adj_e7"),
        (col("rk") <= col("k_max")).as("reject"))
      .orderBy(col("grp"))
  }

  /** DuckDB twin of [[fdrBh]] — identical staged moment CTEs, the same
    * Horner erfc literals over the same quantized z, integer BH.
    */
  val fdrBhSql: String =
    """WITH rows_ AS (
      |  SELECT p_brand AS grp,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |stats AS (
      |  SELECT grp, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(v) AS BIGINT) AS s,
      |    sum(CAST(v AS HUGEINT) * v) AS ss
      |  FROM rows_ GROUP BY grp),
      |gtot AS (
      |  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s) AS BIGINT) AS st,
      |    sum(ss) AS sst
      |  FROM stats),
      |se AS (
      |  SELECT grp, n,
      |    CAST(s AS DOUBLE) / n AS ma,
      |    (CAST(st AS DOUBLE) - s) / (CAST(nn AS DOUBLE) - n) AS mr,
      |    (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
      |      / (CAST(n AS DOUBLE) - 1.0) / n AS sea,
      |    ((CAST(sst AS DOUBLE) - CAST(ss AS DOUBLE))
      |      - (CAST(st AS DOUBLE) - s) * (CAST(st AS DOUBLE) - s)
      |        / (CAST(nn AS DOUBLE) - n))
      |      / (CAST(nn AS DOUBLE) - n - 1.0)
      |      / (CAST(nn AS DOUBLE) - n) AS seb
      |  FROM stats CROSS JOIN gtot
      |  WHERE n >= 2 AND nn - n >= 2),
      |z AS (
      |  SELECT grp, n,
      |    CAST(round((ma - mr) / sqrt(sea + seb) * 10000) AS BIGINT) AS z_e4
      |  FROM se WHERE sea + seb > 0),
      |px AS (
      |  SELECT grp, n, z_e4,
      |    CAST(abs(z_e4) AS DOUBLE) / 1e4 / sqrt(2.0) AS x
      |  FROM z),
      |pt AS (
      |  SELECT grp, n, z_e4, x, 1.0 / (1.0 + 0.3275911 * x) AS t FROM px),
      |p AS (
      |  SELECT grp, n, z_e4,
      |    CAST(round(((((1.061405429 * t - 1.453152027) * t
      |      + 1.421413741) * t - 0.284496736) * t + 0.254829592) * t
      |      * exp(-x * x) * 1e7) AS BIGINT) AS p_e7
      |  FROM pt),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM p),
      |rk AS (
      |  SELECT grp, n, z_e4, p_e7, m,
      |    CAST(row_number() OVER (ORDER BY p_e7, grp) AS BIGINT) AS rk
      |  FROM p CROSS JOIN m),
      |adj AS (
      |  SELECT *, least(10000000, (p_e7 * m) // rk) AS q FROM rk),
      |adj2 AS (
      |  SELECT *, min(q) OVER (ORDER BY rk DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_adj_e7
      |  FROM adj),
      |km AS (
      |  SELECT coalesce(max(CASE WHEN p_e7 * m <= 500000 * rk
      |    THEN rk END), 0) AS k_max
      |  FROM adj2)
      |SELECT grp, n, round(CAST(z_e4 AS DOUBLE) / 1e4, 4) AS z,
      |  p_e7, rk, m, CAST(p_adj_e7 AS BIGINT) AS p_adj_e7,
      |  (rk <= k_max) AS reject
      |FROM adj2 CROSS JOIN km
      |ORDER BY grp""".stripMargin

  /** DuckDB twin of [[ipsOffPolicy]] — identical per-cell HUGEINT
    * quantization and exclusion-with-visibility of unsupported cells.
    */
  val ipsOffPolicySql: String =
    """WITH cells AS (
      |  SELECT c_mktsegment AS cell, CAST(count(*) AS BIGINT) AS n_cell,
      |    CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT')
      |      AS BIGINT) AS n_t,
      |    CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))
      |      FILTER (WHERE o_orderpriority = '1-URGENT'), 0) AS BIGINT) AS s_t
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY c_mktsegment),
      |t AS (
      |  SELECT cell, n_cell, n_t,
      |    CASE WHEN n_t > 0
      |      THEN (CAST(s_t AS HUGEINT) * n_cell * 1000) // n_t END
      |      AS term_milli,
      |    CASE WHEN n_t > 0
      |      THEN (CAST(n_cell AS HUGEINT) * n_cell * 1000) // n_t END
      |      AS w2_milli
      |  FROM cells),
      |tot AS (
      |  SELECT CAST(sum(term_milli) // sum(n_cell) AS BIGINT) AS ips_milli,
      |    CAST(sum(term_milli)
      |      // sum(CASE WHEN n_t > 0 THEN n_cell END) AS BIGINT)
      |      AS snips_milli,
      |    round(CAST(sum(CASE WHEN n_t > 0 THEN n_cell END) AS DOUBLE)
      |      * sum(CASE WHEN n_t > 0 THEN n_cell END)
      |      / (CAST(sum(w2_milli) AS DOUBLE) / 1e3), 2) AS ess,
      |    CAST(sum(CASE WHEN n_t > 0 THEN n_cell END) * 1000
      |      // sum(n_cell) AS BIGINT) AS covered_milli
      |  FROM t)
      |SELECT cell, n_cell, n_t, CAST(term_milli AS BIGINT) AS term_milli,
      |  ips_milli, snips_milli, ess, covered_milli
      |FROM t CROSS JOIN tot
      |ORDER BY cell""".stripMargin

  // ------------------------------------------------- Lift / gains curve

  /** Census width for customer-spend cents (domain-bounded, the
    * [[Ranks]] discipline).
    */
  private val LiftBucketWidth = 1L << 22

  /** Cumulative gains / lift curve — the campaign-targeting readout
    * beside [[auc]]'s single number: rank the population by a score,
    * cut it into deciles FROM THE TOP, and report per decile how much
    * of the positive class the top-k deciles capture (gains/recall)
    * and the capture rate relative to random targeting (lift). Here:
    * score = a customer's base-year spend, positive = the customer
    * ordered again the following year — "does spend rank retention?".
    *
    * Exactness: deciles come from the value census'
    * [[Ranks.doubledRanks]] scan — decile = ((n−lt−cnt)·10) DIV n + 1,
    * so tie groups land WHOLE in one decile (the `q_quantile_bins`
    * rule; `ntile` splits ties engine-dependently and is banned);
    * cumulative counts ride a window over the ≤10-row decile frame;
    * recall and lift are exact integer basis points
    * (cum_pos·n·10⁴ DIV (pos_tot·cum_n) in DECIMAL(38,0)). The last
    * row closes at lift = recall = 10000 bp BY CONSTRUCTION — the
    * spec law. NULL bps when the corpus has no positives.
    *
    * Scale posture: two year-pruned keyed aggregates, one left join,
    * one census aggregate, the two-level scan, a ≤10-row fold. No
    * per-row window.
    */
  def liftCurve(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .filter(year(col("o_orderdate")) === Analytics.PriceIndexBaseYear)
      .groupBy(col("o_custkey").as("cust"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("v"))
    val nxt = Tables.orders(spark, dir)
      .filter(year(col("o_orderdate")) === Analytics.PriceIndexCompYear)
      .select(col("o_custkey").as("cust")).distinct()
      .withColumn("pos", lit(1L))
    liftCurve(base.join(nxt, Seq("cust"), "left")
      .na.fill(0L, Seq("pos")), "v", "pos", LiftBucketWidth)
  }

  /** DataFrame-first form over a (score, positive 0/1) frame. */
  def liftCurve(df: DataFrame, scoreCol: String, posCol: String,
                bucketWidth: Long): DataFrame = {
    val census = df
      .select(lit("all").as("g"), col(scoreCol).cast("long").as("v"),
        col(posCol).cast("long").as("p"))
      .groupBy(col("g"), col("v"))
      .agg(count(lit(1)).as("cnt"), sum(col("p")).as("np"))
    val tot = census.groupBy(col("g"))
      .agg(sum(col("cnt")).as("n"), sum(col("np")).as("pos_tot"))
    val byDecile = Ranks.doubledRanks(census.drop("np"), bucketWidth)
      .join(census.select(col("g"), col("v"), col("np")), Seq("g", "v"))
      .join(broadcast(tot), Seq("g"))
      .withColumn("decile",
        expr("(n - lt - cnt) * 10 DIV n + 1"))
      .groupBy(col("decile"), col("n"), col("pos_tot"))
      .agg(sum(col("cnt")).as("n_cust"), sum(col("np")).as("n_pos"))
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDecile
      .withColumn("cum_cust", sum(col("n_cust")).over(w))
      .withColumn("cum_pos", sum(col("n_pos")).over(w))
      .select(col("decile"), col("n_cust"), col("n_pos"),
        col("cum_cust"), col("cum_pos"),
        when(col("pos_tot") <= 0, lit(null)).otherwise(
          expr("CAST(CAST(cum_pos AS DECIMAL(38,0)) * 10000" +
            " DIV pos_tot AS BIGINT)")).as("recall_bp"),
        when(col("pos_tot") <= 0, lit(null)).otherwise(
          expr("CAST(CAST(cum_pos AS DECIMAL(38,0)) * n * 10000" +
            " DIV (CAST(pos_tot AS DECIMAL(38,0)) * cum_cust)" +
            " AS BIGINT)")).as("lift_bp"))
      .orderBy(col("decile"))
  }

  /** DuckDB twin of [[liftCurve]] — same top-down whole-tie deciles
    * and exact bp folds (plain rank windows single-node).
    */
  val liftCurveSql: String =
    s"""WITH base AS (
       |  SELECT o_custkey AS cust,
       |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
       |      AS BIGINT) AS v
       |  FROM orders
       |  WHERE year(o_orderdate) = ${Analytics.PriceIndexBaseYear}
       |  GROUP BY o_custkey),
       |nxt AS (
       |  SELECT DISTINCT o_custkey AS cust FROM orders
       |  WHERE year(o_orderdate) = ${Analytics.PriceIndexCompYear}),
       |s AS (
       |  SELECT v, CASE WHEN nxt.cust IS NULL THEN 0 ELSE 1 END AS p
       |  FROM base LEFT JOIN nxt ON base.cust = nxt.cust),
       |c AS (
       |  SELECT v, CAST(count(*) AS BIGINT) AS cnt,
       |    CAST(sum(p) AS BIGINT) AS np
       |  FROM s GROUP BY v),
       |r AS (
       |  SELECT v, cnt, np,
       |    sum(cnt) OVER (ORDER BY v) - cnt AS lt,
       |    CAST(sum(cnt) OVER () AS BIGINT) AS n,
       |    CAST(sum(np) OVER () AS BIGINT) AS pos_tot
       |  FROM c),
       |d AS (
       |  SELECT CAST(((n - lt - cnt) * 10) // n + 1 AS BIGINT) AS decile,
       |    n, pos_tot, cnt, np
       |  FROM r),
       |g AS (
       |  SELECT decile, n, pos_tot, CAST(sum(cnt) AS BIGINT) AS n_cust,
       |    CAST(sum(np) AS BIGINT) AS n_pos
       |  FROM d GROUP BY decile, n, pos_tot),
       |cu AS (
       |  SELECT *,
       |    CAST(sum(n_cust) OVER (ORDER BY decile) AS BIGINT) AS cum_cust,
       |    CAST(sum(n_pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos
       |  FROM g)
       |SELECT decile, n_cust, n_pos, cum_cust, cum_pos,
       |  CASE WHEN pos_tot <= 0 THEN NULL ELSE
       |    CAST(CAST(cum_pos AS HUGEINT) * 10000 // pos_tot AS BIGINT)
       |  END AS recall_bp,
       |  CASE WHEN pos_tot <= 0 THEN NULL ELSE
       |    CAST(CAST(cum_pos AS HUGEINT) * n * 10000
       |      // (CAST(pos_tot AS HUGEINT) * cum_cust) AS BIGINT)
       |  END AS lift_bp
       |FROM cu ORDER BY decile""".stripMargin

  // ------------------------------------------------ Wilson score interval

  /** z_{α/2} for the 95% [[wilsonCi]] — one parsed literal (the
    * [[AbZSum]] rule).
    */
  private val WilsonZ = 1.959964

  /** Wilson score interval (1927) for each segment's urgent-order
    * share — the binomial interval that behaves at the edges where
    * the naive Wald ±z√(p̂q̂/n) collapses (p̂ near 0/1, small n): the
    * interval the monitoring dashboards around [[ebShrinkage]]'s
    * point shrinkage should draw. Center (p̂ + z²/2n)/(1 + z²/n),
    * half-width z√(p̂q̂/n + z²/4n²)/(1 + z²/n).
    *
    * Exactness: k and n are exact integers; share, lo and hi are ONE
    * shared double expression tree each off (k, n, z) with z a parsed
    * literal, rounded once to 6. Zero-row groups cannot occur (the
    * group key comes from the rows); k = 0 and k = n are exactly the
    * edge cases Wilson handles — spec-pinned to stay inside (0, 1).
    *
    * Scale posture: one segment-keyed count aggregate off the shared
    * [[SegOrders]] fact; a |segments|-bounded tail.
    */
  def wilsonCi(spark: SparkSession, dir: String): DataFrame =
    wilsonCi(SegOrders(spark, dir)
        .select(col("g"), (col("o_orderpriority") === "1-URGENT").as("hit")),
      "g", "hit")

  /** DataFrame-first form over any (group, hit: bool) frame. */
  def wilsonCi(df: DataFrame, grpCol: String, hitCol: String): DataFrame = {
    val z = lit(WilsonZ)
    val m = df.groupBy(col(grpCol).as("g"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(col(hitCol), 1L)), lit(0L)).as("k"))
    // ONE expression tree shared verbatim with the SQL twin — the
    // numerator combines before the single 1+z²/n division (a
    // center/half split divides twice and can drift an ulp)
    val p = d(col("k")) / d(col("n"))
    val halfRaw = z * sqrt(p * (lit(1.0) - p) / d(col("n"))
      + z * z / (lit(4.0) * d(col("n")) * d(col("n"))))
    def bound(sign: Double) = round(
      (p + z * z / d(col("n")) / 2.0 + lit(sign) * halfRaw)
        / (lit(1.0) + z * z / d(col("n"))), 6)
    m.select(col("g"), col("n"), col("k"),
      round(p, 6).as("share"),
      bound(-1.0).as("wilson_lo"),
      bound(1.0).as("wilson_hi"))
      .orderBy(col("g"))
  }

  /** DuckDB twin of [[wilsonCi]] — identical double tree, same parsed
    * z literal.
    */
  val wilsonCiSql: String =
    s"""WITH m AS (
       |  SELECT c_mktsegment AS g, CAST(count(*) AS BIGINT) AS n,
       |    CAST(coalesce(count(*) FILTER (WHERE o_orderpriority =
       |      '1-URGENT'), 0) AS BIGINT) AS k
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  GROUP BY c_mktsegment)
       |SELECT g, n, k,
       |  round(CAST(k AS DOUBLE) / CAST(n AS DOUBLE), 6) AS share,
       |  round((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
       |      + $WilsonZ * $WilsonZ / CAST(n AS DOUBLE) / 2.0
       |    - $WilsonZ * sqrt(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
       |        * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
       |        / CAST(n AS DOUBLE)
       |      + $WilsonZ * $WilsonZ / (4.0 * CAST(n AS DOUBLE)
       |        * CAST(n AS DOUBLE))))
       |    / (1.0 + $WilsonZ * $WilsonZ / CAST(n AS DOUBLE)), 6)
       |    AS wilson_lo,
       |  round((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
       |      + $WilsonZ * $WilsonZ / CAST(n AS DOUBLE) / 2.0
       |    + $WilsonZ * sqrt(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
       |        * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
       |        / CAST(n AS DOUBLE)
       |      + $WilsonZ * $WilsonZ / (4.0 * CAST(n AS DOUBLE)
       |        * CAST(n AS DOUBLE))))
       |    / (1.0 + $WilsonZ * $WilsonZ / CAST(n AS DOUBLE)), 6)
       |    AS wilson_hi
       |FROM m ORDER BY g""".stripMargin

  // ---------------------------------------------------- A/B power / MDE

  /** z_{α/2} + z_β for two-sided α = 0.05 at 80% power — ONE literal
    * (1.959964 + 0.841621), not a runtime sum: both engines parse the
    * same decimal string to the same IEEE double, where a computed
    * sum could differ in the last ulp from a parsed constant.
    */
  private val AbZSum = 2.801585

  /** A/B minimum detectable effect at the CURRENT sample sizes — the
    * experiment-sizing readout that belongs beside [[cuped]] (which
    * shrinks the variance) and [[stratifiedAte]] (which debiases the
    * estimate): with the observed arm sizes and pooled variance, the
    * smallest true difference the standard two-sample z test would
    * detect at α = 0.05 (two-sided) with 80% power is
    * MDE = (z_{α/2} + z_β)·√(s²_pooled·(1/n_a + 1/n_b)). A reported
    * difference below its own MDE is noise until more data arrives —
    * `powered` says which side of that line each segment sits on.
    * Here: URGENT-priority orders vs the rest, per market segment.
    *
    * Exactness: per-arm counts/sums/sum-of-squares fold as exact
    * integers (DECIMAL(38,0) squares); arm means and their difference
    * are milli-quantized by truncating DIVs; the MDE and the powered
    * verdict are ONE shared double expression each (the z quantiles
    * are literals). `mde_cents`/`powered` are NULL when an arm has
    * &lt; 2 rows or the pooled variance is 0; `diff_milli` is NULL
    * when an arm is EMPTY — an explicit guard, not an engine's
    * DIV-by-zero NULL.
    *
    * Scale posture: one segment-keyed aggregate; a |segments|-bounded
    * tail.
    */
  def abPower(spark: SparkSession, dir: String): DataFrame =
    abPower(SegOrders(spark, dir)
        .select(col("g"),
          (col("o_orderpriority") === "1-URGENT").as("treat"),
          col("cents").as("y")),
      "g", "treat", "y")

  /** DataFrame-first form over any (group, treated: bool, integral
    * outcome) frame.
    */
  def abPower(df: DataFrame, grpCol: String, treatCol: String,
              yCol: String): DataFrame = {
    val t = col(treatCol)
    val y = col(yCol).cast("long")
    val yd = y.cast(Dec)
    val m = df.groupBy(col(grpCol).as("g"))
      .agg(coalesce(sum(when(t, 1L)), lit(0L)).as("na"),
        coalesce(sum(when(t, y)), lit(0L)).as("sa"),
        coalesce(sum(when(t, yd * yd)), lit(0L).cast(Dec)).as("ssa"),
        coalesce(sum(when(!t, 1L)), lit(0L)).as("nb"),
        coalesce(sum(when(!t, y)), lit(0L)).as("sb"),
        coalesce(sum(when(!t, yd * yd)), lit(0L).cast(Dec)).as("ssb"))
      .withColumn("diff_milli",
        // explicit empty-arm contract: NULL when either arm has no
        // rows — not an artifact of DIV-by-zero NULL semantics (which
        // happen to agree across engines today but are not a contract)
        when(col("na") === 0 || col("nb") === 0, lit(null))
          .otherwise(expr("sa * 1000 DIV na - sb * 1000 DIV nb")))
      .withColumn("s2p",
        // the same explicit guard: with an arm under 2 rows the pooled
        // variance is undefined — and under ANSI mode the unguarded
        // /na, /nb, /(na+nb−2) would THROW on degenerate arms rather
        // than yield the engine-NULL the old formulation leaned on
        when(col("na") < 2 || col("nb") < 2, lit(null)).otherwise(expr(
          """((CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / na)
            | + (CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / nb))
            | / (na + nb - 2)""".stripMargin)))
    m.select(col("g"), col("na").as("n_treat"), col("nb").as("n_ctrl"),
      col("diff_milli"),
      when(col("na") < 2 || col("nb") < 2 || col("s2p") <= 0, lit(null))
        .otherwise(round(lit(AbZSum)
          * sqrt(col("s2p") * (lit(1.0) / col("na")
            + lit(1.0) / col("nb"))), 2)).as("mde_cents"),
      when(col("na") < 2 || col("nb") < 2 || col("s2p") <= 0, lit(null))
        .otherwise(abs(col("diff_milli").cast("double")) / 1000.0
          >= lit(AbZSum)
          * sqrt(col("s2p") * (lit(1.0) / col("na")
            + lit(1.0) / col("nb")))).as("powered"))
      .orderBy(col("g"))
  }

  /** DuckDB twin of [[abPower]] — same exact moments and shared
    * double MDE (z quantiles are the same literals).
    */
  val abPowerSql: String =
    s"""WITH m AS (
       |  SELECT c_mktsegment AS g,
       |    CAST(coalesce(count(*) FILTER (WHERE o_orderpriority =
       |      '1-URGENT'), 0) AS BIGINT) AS na,
       |    CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))
       |      FILTER (WHERE o_orderpriority = '1-URGENT'), 0) AS BIGINT)
       |      AS sa,
       |    coalesce(sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
       |      AS HUGEINT) * CAST(round(o_totalprice * 100) AS BIGINT))
       |      FILTER (WHERE o_orderpriority = '1-URGENT'), 0) AS ssa,
       |    CAST(coalesce(count(*) FILTER (WHERE o_orderpriority <>
       |      '1-URGENT'), 0) AS BIGINT) AS nb,
       |    CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))
       |      FILTER (WHERE o_orderpriority <> '1-URGENT'), 0) AS BIGINT)
       |      AS sb,
       |    coalesce(sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
       |      AS HUGEINT) * CAST(round(o_totalprice * 100) AS BIGINT))
       |      FILTER (WHERE o_orderpriority <> '1-URGENT'), 0) AS ssb
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  GROUP BY c_mktsegment),
       |t AS (
       |  SELECT g, na, nb,
       |    CASE WHEN na = 0 OR nb = 0 THEN NULL
       |      ELSE CAST(sa * 1000 // na - sb * 1000 // nb AS BIGINT)
       |    END AS diff_milli,
       |    CASE WHEN na < 2 OR nb < 2 THEN NULL
       |      ELSE ((CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / na)
       |        + (CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / nb))
       |        / (na + nb - 2)
       |    END AS s2p
       |  FROM m)
       |SELECT g, na AS n_treat, nb AS n_ctrl, diff_milli,
       |  CASE WHEN na < 2 OR nb < 2 OR s2p <= 0 THEN NULL
       |    ELSE round($AbZSum
       |      * sqrt(s2p * (1.0 / na + 1.0 / nb)), 2) END AS mde_cents,
       |  CASE WHEN na < 2 OR nb < 2 OR s2p <= 0 THEN NULL
       |    ELSE abs(CAST(diff_milli AS DOUBLE)) / 1000.0
       |      >= $AbZSum * sqrt(s2p * (1.0 / na + 1.0 / nb))
       |  END AS powered
       |FROM t ORDER BY g""".stripMargin

  // ------------------------------------------- Cochran–Mantel–Haenszel

  /** Cochran–Mantel–Haenszel test (1959) — "is exposure associated
    * with outcome AFTER controlling for the stratifying variable?":
    * the stratified 2×2 association test plus the Mantel–Haenszel
    * common odds ratio. Per stratum k with cells a,b,c,d
    * (exposed×outcome), row sums n1=a+b, n0=c+d, column sums m1=a+c,
    * m0=b+d and N = n1+n0: E_k = n1·m1/N and
    * V_k = n1·n0·m1·m0 / (N²(N−1)) are each quantized to integer
    * micro-units by ONE truncating DIV on DECIMAL(38,0) BEFORE the
    * cross-stratum sum (order-free integer addition — the
    * [[Diagnostics.logRank]] discipline; log-rank IS this test on the
    * survival grid). χ² = (Σa·10⁶ − ΣE)²/(ΣV·10⁶) and
    * OR_MH = Σ(a·d·10⁶ DIV N) / Σ(b·c·10⁶ DIV N) are each ONE shared
    * double expression. Uncorrected (no Yates ½), documented.
    * n1·n0·m1·m0·10⁶ ≤ N⁴·10⁶ bounds the DECIMAL(38,0) intermediate
    * to N ≲ 1.8e8 rows per stratum — past that, shard strata finer.
    *
    * Here: does URGENT order priority associate with fulfilled status
    * ('F') once the customer's market segment is held fixed?
    *
    * Scale posture: ONE fact-dim broadcast join + one stratum-keyed
    * aggregate (map-side combinable); everything after runs on the
    * |strata|-bounded cell frame. Strata with N ≤ 1 (V undefined) are
    * excluded, documented.
    */
  def cmh(spark: SparkSession, dir: String): DataFrame =
    cmh(SegOrders(spark, dir)
        .select(col("g").as("stratum"),
          (col("o_orderpriority") === "1-URGENT").as("exposed"),
          (col("o_orderstatus") === "F").as("outcome")),
      "stratum", "exposed", "outcome")

  /** DataFrame-first form over any (stratum, exposed: bool,
    * outcome: bool) frame.
    */
  def cmh(df: DataFrame, stratumCol: String, expCol: String,
          outCol: String): DataFrame = {
    val e = col(expCol)
    val o = col(outCol)
    val cells = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(e && o, 1L)), lit(0L)).as("a"),
        coalesce(sum(when(e && !o, 1L)), lit(0L)).as("b"),
        coalesce(sum(when(!e && o, 1L)), lit(0L)).as("c"),
        coalesce(sum(when(!e && !o, 1L)), lit(0L)).as("dd"))
    cells.filter(col("n") > 1)
      .select(col("a"),
        expr("CAST(CAST(a + b AS DECIMAL(38,0)) * (a + c) * 1000000" +
          " DIV n AS DECIMAL(38,0))").as("e_micro"),
        expr("CAST(CAST(a + b AS DECIMAL(38,0)) * (c + dd) * (a + c)" +
          " * (b + dd) * 1000000 DIV (CAST(n AS DECIMAL(38,0)) * n" +
          " * (n - 1)) AS DECIMAL(38,0))").as("v_micro"),
        expr("CAST(CAST(a AS DECIMAL(38,0)) * dd * 1000000 DIV n" +
          " AS DECIMAL(38,0))").as("orn"),
        expr("CAST(CAST(b AS DECIMAL(38,0)) * c * 1000000 DIV n" +
          " AS DECIMAL(38,0))").as("ord"))
      .agg(count(lit(1)).as("n_strata"), sum(col("a")).as("o_a"),
        sum(col("e_micro")).as("em"), sum(col("v_micro")).as("vm"),
        sum(col("orn")).as("sorn"), sum(col("ord")).as("sord"))
      .select(col("n_strata"), col("o_a"),
        col("em").cast("long").as("e_micro"),
        col("vm").cast("long").as("v_micro"),
        when(col("vm") <= 0, lit(null)).otherwise(round(
          pow(d(col("o_a")) * 1e6 - d(col("em")), 2)
            / (d(col("vm")) * 1e6), 4)).as("chi2"),
        when(col("sord") <= 0, lit(null))
          .otherwise(round(d(col("sorn")) / d(col("sord")), 4))
          .as("or_mh"))
  }

  /** DuckDB twin of [[cmh]] — same per-stratum HUGEINT term
    * quantization and shared double tails.
    */
  val cmhSql: String =
    """WITH cells AS (
      |  SELECT c_mktsegment AS stratum, CAST(count(*) AS BIGINT) AS n,
      |    CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT'
      |      AND o_orderstatus = 'F') AS BIGINT) AS a,
      |    CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT'
      |      AND o_orderstatus <> 'F') AS BIGINT) AS b,
      |    CAST(count(*) FILTER (WHERE o_orderpriority <> '1-URGENT'
      |      AND o_orderstatus = 'F') AS BIGINT) AS c,
      |    CAST(count(*) FILTER (WHERE o_orderpriority <> '1-URGENT'
      |      AND o_orderstatus <> 'F') AS BIGINT) AS dd
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY c_mktsegment),
      |t AS (
      |  SELECT a,
      |    (CAST(a + b AS HUGEINT) * (a + c) * 1000000) // n AS e_micro,
      |    (CAST(a + b AS HUGEINT) * (c + dd) * (a + c) * (b + dd)
      |      * 1000000) // (CAST(n AS HUGEINT) * n * (n - 1)) AS v_micro,
      |    (CAST(a AS HUGEINT) * dd * 1000000) // n AS orn,
      |    (CAST(b AS HUGEINT) * c * 1000000) // n AS ord
      |  FROM cells WHERE n > 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_strata,
      |  CAST(sum(a) AS BIGINT) AS o_a,
      |  CAST(sum(e_micro) AS BIGINT) AS e_micro,
      |  CAST(sum(v_micro) AS BIGINT) AS v_micro,
      |  CASE WHEN sum(v_micro) <= 0 THEN NULL ELSE
      |    round(pow(CAST(sum(a) AS DOUBLE) * 1e6
      |        - CAST(sum(e_micro) AS DOUBLE), 2)
      |      / (CAST(sum(v_micro) AS DOUBLE) * 1e6), 4) END AS chi2,
      |  CASE WHEN sum(ord) <= 0 THEN NULL ELSE
      |    round(CAST(sum(orn) AS DOUBLE)
      |      / CAST(sum(ord) AS DOUBLE), 4) END AS or_mh
      |FROM t""".stripMargin

  // ------------------------------------------------------ Fleiss' kappa

  /** Fleiss' kappa (1971) — chance-corrected agreement among a FIXED
    * number m of raters per subject, the multi-rater generalization of
    * [[TextAnalysis.cohenKappa]]'s two-rater form. Exactness: with
    * n_ij the per-subject category census, T = ΣΣ n_ij², S_j = Σ_i
    * n_ij, N subjects and M = N·m ratings,
    * κ = [M²(T − M) − N·m(m−1)·ΣS_j²] / [N·m(m−1)·(M² − ΣS_j²)] —
    * the P̄/P̄e ratio multiplied through so BOTH sides are exact
    * integers and the statistic is ONE shared double division (NULL
    * when the denominator is 0 — a single category, agreement
    * undefined). M²·T bounds the DECIMAL(38,0) intermediate to
    * roughly N ≲ 3e11 subjects at m = 3.
    *
    * Here: each order with EXACTLY three lineitems is a subject and
    * its three return flags are three "raters" classifying the order
    * — do the lines of one order agree on disposition more than
    * chance? (Orders with other line counts are excluded — Fleiss
    * requires constant m; the generic form documents that contract.)
    *
    * Scale posture: one subject-census semi-join + one (subject,
    * category) keyed aggregate (both map-side combinable); the kappa
    * fold is one 1-row aggregate plus a |categories|-bounded frame.
    */
  def fleissKappa(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("subj"), col("l_returnflag").as("cat"))
    val keep = li.groupBy(col("subj")).agg(count(lit(1)).as("k"))
      .filter(col("k") === FleissRaters).select(col("subj"))
    fleissKappa(li.join(keep, Seq("subj"), "left_semi"),
      "subj", "cat", FleissRaters)
  }

  /** Raters per subject for the shipped [[fleissKappa]] query. */
  val FleissRaters = 3

  /** DataFrame-first form over any (subject, category) ratings frame;
    * every subject MUST carry exactly `m` rating rows — the caller's
    * contract (the (spark, dir) form enforces it with a census
    * semi-join). N is recovered as Σn_ij / m, exact under the
    * contract.
    */
  def fleissKappa(df: DataFrame, subjCol: String, catCol: String,
                  m: Int): DataFrame = {
    val nij = df.groupBy(col(subjCol).as("subj"), col(catCol).as("cat"))
      .agg(count(lit(1)).as("c"))
    val tot = nij.agg(sum(col("c")).cast(Dec).as("mm"),
      sum(col("c").cast(Dec) * col("c")).as("t"))
    val cats = nij.groupBy(col("cat")).agg(sum(col("c")).as("s"))
      .agg(count(lit(1)).as("n_cats"),
        sum(col("s").cast(Dec) * col("s")).as("sj2"))
    val mm1 = lit(m.toLong * (m - 1)).cast(Dec)
    tot.crossJoin(broadcast(cats))
      .withColumn("n_subj", expr(s"CAST(mm DIV $m AS DECIMAL(38,0))"))
      .withColumn("den", (col("n_subj") * mm1
        * (col("mm") * col("mm") - col("sj2"))).cast(Dec))
      .select(
        col("n_subj").cast("long").as("n_subjects"),
        lit(m.toLong).as("m"), col("n_cats"),
        col("t").cast("long").as("t_sum"),
        col("sj2").cast("long").as("sum_sj2"),
        expr("CAST(CAST((t - mm) * 1000000 AS DECIMAL(38,0))" +
          s" DIV (n_subj * ${m.toLong * (m - 1)})" +
          " AS BIGINT)").as("pbar_micro"),
        expr("CAST(CAST(sj2 * 1000000 AS DECIMAL(38,0))" +
          " DIV (mm * mm) AS BIGINT)").as("pe_micro"),
        when(col("den") <= 0, lit(null))
          .otherwise(round(
            d((col("mm") * col("mm") * (col("t") - col("mm"))).cast(Dec)
              - (col("n_subj") * mm1 * col("sj2")).cast(Dec))
              / d(col("den")), 6)).as("kappa"))
  }

  /** DuckDB twin of [[fleissKappa]] — same exactly-3 census filter,
    * HUGEINT integer identity and one shared double division.
    */
  val fleissKappaSql: String =
    """WITH keep AS (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey HAVING count(*) = 3),
      |r AS (
      |  SELECT l.l_orderkey AS subj, l.l_returnflag AS cat
      |  FROM lineitem l JOIN keep ON l.l_orderkey = keep.l_orderkey),
      |nij AS (
      |  SELECT subj, cat, CAST(count(*) AS BIGINT) AS c
      |  FROM r GROUP BY subj, cat),
      |tot AS (
      |  SELECT CAST(sum(c) AS HUGEINT) AS mm,
      |    sum(CAST(c AS HUGEINT) * c) AS t
      |  FROM nij),
      |cats AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_cats,
      |    sum(CAST(s AS HUGEINT) * s) AS sj2
      |  FROM (SELECT cat, CAST(sum(c) AS BIGINT) AS s
      |        FROM nij GROUP BY cat))
      |SELECT CAST(mm // 3 AS BIGINT) AS n_subjects,
      |  CAST(3 AS BIGINT) AS m, n_cats,
      |  CAST(t AS BIGINT) AS t_sum, CAST(sj2 AS BIGINT) AS sum_sj2,
      |  CAST((t - mm) * 1000000 // ((mm // 3) * 6) AS BIGINT)
      |    AS pbar_micro,
      |  CAST(sj2 * 1000000 // (mm * mm) AS BIGINT) AS pe_micro,
      |  CASE WHEN (mm // 3) * 6 * (mm * mm - sj2) <= 0 THEN NULL ELSE
      |    round(CAST(mm * mm * (t - mm) - (mm // 3) * 6 * sj2 AS DOUBLE)
      |      / CAST((mm // 3) * 6 * (mm * mm - sj2) AS DOUBLE), 6)
      |  END AS kappa
      |FROM tot CROSS JOIN cats""".stripMargin

  // ------------------------------------------------------- Cochran's Q

  /** Cochran's Q test (1950) — "do the k binary treatments succeed at
    * the same rate on the same subjects?": the k-treatment matched
    * extension of [[TextAnalysis.mcnemar]]'s 2-treatment form (Q on
    * k = 2 reduces to the uncorrected McNemar χ²). With x_ij ∈ {0,1},
    * column totals G_j, row totals L_i and the identity ΣG = ΣL,
    * Q = (k−1)·[k·ΣG_j² − (ΣG)²] / [k·ΣL − ΣL_i²] — every term an
    * exact integer, the statistic ONE shared double division, NULL
    * when the denominator is 0 (every subject hit all-or-none of the
    * treatments: no within-subject contrast, no test). df = k−1.
    *
    * Here: subjects are event-stream users, treatments are the event
    * types, x_ij = "user i's type-j event count runs STRICTLY ABOVE
    * the user's own per-type average" (c_ij·k &gt; Σ_j c_ij — exact
    * integer cross-multiplication, no division) — do the types exceed
    * users' personal baselines equally often? The naive "did ≥ 1
    * event" incidence saturates (all-ones rows carry no contrast and
    * Q degenerates to NULL — its planted spec), and a fixed count
    * threshold would not survive a corpus scale-up; the
    * above-own-average form is scale-invariant by construction.
    * Subjects whose counts are exactly uniform have zero incidences
    * and drop from the frame — all-zero rows contribute 0 to every
    * sum in Q, so the statistic is unchanged (documented; k is the
    * observed type set).
    *
    * Scale posture: one (user, type) keyed census (the only
    * corpus-sized shuffle, map-side combinable), a user-keyed total
    * join on the census, then a |types|-bounded and a user-keyed
    * aggregate folded to 1 row each. ΣG_j² ≤ k·N² bounds DECIMAL(38,0)
    * far past any real corpus.
    */
  def cochranQ(spark: SparkSession, dir: String): DataFrame = {
    val cen = Tables.events(spark, dir)
      .groupBy(col("user_id").as("subj"), col("event_type").as("treat"))
      .agg(count(lit(1)).as("c"))
    val kk = cen.agg(countDistinct(col("treat")).as("kk"))
    val tot = cen.groupBy(col("subj")).agg(sum(col("c")).as("t"))
    cochranQ(cen.join(tot, Seq("subj")).crossJoin(broadcast(kk))
      .filter(col("c") * col("kk") > col("t"))
      .select(col("subj"), col("treat")), "subj", "treat")
  }

  /** DataFrame-first form over any (subject, treatment) incidence
    * frame; duplicate rows collapse (x is binary by definition).
    */
  def cochranQ(df: DataFrame, subjCol: String, treatCol: String): DataFrame = {
    val x = df.select(col(subjCol).as("subj"), col(treatCol).as("treat"))
      .distinct()
    val ga = x.groupBy(col("treat")).agg(count(lit(1)).as("g"))
      .agg(count(lit(1)).as("k"), sum(col("g")).as("sg"),
        sum(col("g").cast(Dec) * col("g")).as("sg2"))
    val la = x.groupBy(col("subj")).agg(count(lit(1)).as("l"))
      .agg(count(lit(1)).as("n_subjects"),
        sum(col("l").cast(Dec) * col("l")).as("sl2"))
    la.crossJoin(broadcast(ga))
      .select(col("n_subjects"), col("k"), col("sg").as("sum_g"),
        col("sg2").cast("long").as("sum_g2"),
        col("sl2").cast("long").as("sum_l2"),
        (col("k") - 1).as("df"),
        when(col("k") * col("sg").cast(Dec) - col("sl2") <= 0, lit(null))
          .otherwise(round(
            d((col("k") - 1).cast(Dec) * (col("k") * col("sg2")
              - col("sg").cast(Dec) * col("sg")))
              / d(col("k") * col("sg").cast(Dec) - col("sl2")), 4))
          .as("q"))
  }

  /** DuckDB twin of [[cochranQ]] — same distinct incidence projection,
    * HUGEINT folds and shared double division.
    */
  val cochranQSql: String =
    """WITH cen AS (
      |  SELECT user_id AS subj, event_type AS treat,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY user_id, event_type),
      |kk AS (SELECT count(DISTINCT treat) AS kk FROM cen),
      |tot AS (SELECT subj, CAST(sum(c) AS BIGINT) AS t
      |        FROM cen GROUP BY subj),
      |x AS (
      |  SELECT DISTINCT cen.subj, cen.treat
      |  FROM cen JOIN tot ON cen.subj = tot.subj CROSS JOIN kk
      |  WHERE cen.c * kk.kk > tot.t),
      |ga AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(g) AS BIGINT) AS sg,
      |    sum(CAST(g AS HUGEINT) * g) AS sg2
      |  FROM (SELECT treat, CAST(count(*) AS BIGINT) AS g
      |        FROM x GROUP BY treat)),
      |la AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_subjects,
      |    sum(CAST(l AS HUGEINT) * l) AS sl2
      |  FROM (SELECT subj, CAST(count(*) AS BIGINT) AS l
      |        FROM x GROUP BY subj))
      |SELECT n_subjects, k, sg AS sum_g, CAST(sg2 AS BIGINT) AS sum_g2,
      |  CAST(sl2 AS BIGINT) AS sum_l2, k - 1 AS df,
      |  CASE WHEN k * CAST(sg AS HUGEINT) - sl2 <= 0 THEN NULL ELSE
      |    round(CAST((k - 1) * (k * sg2 - CAST(sg AS HUGEINT) * sg)
      |        AS DOUBLE)
      |      / CAST(k * CAST(sg AS HUGEINT) - sl2 AS DOUBLE), 4) END AS q
      |FROM la CROSS JOIN ga""".stripMargin
}
