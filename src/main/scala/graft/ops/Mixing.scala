package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus composition & data-mixing operators — the "what goes into the
  * training run" half of a pipeline, next to [[Dedup]]/[[Curation]]'s
  * "is each document good" half. (Driver north star; the reference
  * engine — go-batch-processor `batch_processor.go:1-194` — has no
  * relational surface, so these derive from the training-data-pipeline
  * extension mandate, not a reference operator.)
  *
  * Everything here follows the same scale discipline: per-group
  * metadata frames (|langs|, |sources| rows) are computed with keyed
  * partial+final aggregations, broadcast back onto the corpus, and the
  * per-document decisions are row-local, deterministic, RNG-free
  * arithmetic — reproducible across engines, runs, and partitionings,
  * which is what lets the DuckDB oracle pin them exactly.
  */
object Mixing {

  /** Temperature-scaled language resampling (the standard multilingual
    * data-mixing move): with α = 0.5, a language with share p is
    * sampled at a rate ∝ p^(α−1) = p^(−1/2), normalized so the RAREST
    * language keeps everything — high-resource languages are
    * down-sampled toward the temperature-flattened mix. Per-language
    * keep rates are basis points (floor(√(n_min/n_l) · 10000)), and
    * membership is the overflow-safe multiplicative hash of the doc id
    * ([[Sampling.splitBucket]]'s arithmetic over 10000 buckets) — a
    * row-local deterministic decision, so the mix is reproducible and
    * the oracle exact. One aggregation + one broadcast join + one
    * conditional re-aggregation; nothing corpus-sized shuffles twice.
    */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame =
    temperatureMix(Tables.documents(spark, dir), "doc_id", "lang")

  /** DataFrame-first form over any (id, group) frame. */
  def temperatureMix(docs: DataFrame, idCol: String, langCol: String): DataFrame = {
    val d = docs.select(col(idCol).as("doc_id"), col(langCol).as("lang"))
    val counts = d.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    // n_min via an unpartitioned window OVER THE |langs|-ROW COUNTS
    // FRAME (metadata-sized — the single-partition window is fine
    // there), not counts.agg(min).crossJoin: without a cache the agg
    // branch would re-derive the counts subtree and scan the corpus a
    // third time
    val rates = counts
      .withColumn("n_min",
        min(col("n_docs")).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("rate_bp",
        floor(sqrt(col("n_min") / col("n_docs")) * 10000).cast("long"))
      .select(col("lang"), col("n_docs"), col("rate_bp"))
    d.withColumn("bucket",
        pmod(pmod(col("doc_id"), lit(1000000007L)) * lit(2654435761L), lit(10000L)))
      .join(broadcast(rates), Seq("lang"))
      .groupBy(col("lang"), col("n_docs"), col("rate_bp"))
      .agg(sum(when(col("bucket") < col("rate_bp"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy(col("lang"))
  }

  val temperatureMixSql: String =
    """WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
      |m AS (SELECT min(n_docs) AS n_min FROM c),
      |r AS (SELECT lang, n_docs,
      |        CAST(floor(sqrt(n_min / n_docs) * 10000) AS BIGINT) AS rate_bp
      |      FROM c, m),
      |d AS (SELECT lang,
      |        ((doc_id % 1000000007) * 2654435761) % 10000 AS bucket
      |      FROM documents)
      |SELECT r.lang, r.n_docs, r.rate_bp,
      |  CAST(sum(CASE WHEN bucket < rate_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |FROM d JOIN r ON d.lang = r.lang
      |GROUP BY r.lang, r.n_docs, r.rate_bp
      |ORDER BY r.lang""".stripMargin

  private val TokenBudget = 3000L

  /** Per-language token-budget trimming: rank documents within each
    * language by quality (length proxy here, unique-keyed on doc_id)
    * and keep the prefix whose RUNNING token total stays within the
    * budget — "give me the best B tokens per language". One keyed
    * window (partitioned by language, never global), and the OUTPUT is
    * bounded by budget × |languages| regardless of corpus size — the
    * trim is exactly the operator whose result stays small as the
    * input grows.
    */
  def tokenBudget(spark: SparkSession, dir: String): DataFrame =
    tokenBudget(Tables.documents(spark, dir), "doc_id", "lang", "text",
      "n_chars", TokenBudget)

  /** DataFrame-first form; `qualityCol` orders candidates (descending)
    * inside each language.
    */
  def tokenBudget(docs: DataFrame, idCol: String, langCol: String,
                  textCol: String, qualityCol: String, budget: Long): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"), col(langCol).as("lang"),
      col(qualityCol).as("quality"),
      size(split(col(textCol), " ")).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("quality").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col("lang"), col("doc_id"), col("n_tokens"), col("cum_tokens"))
      .orderBy(col("lang"), col("doc_id"))
  }

  val tokenBudgetSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang, n_chars,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, lang, n_tokens,
       |    CAST(sum(n_tokens) OVER (PARTITION BY lang
       |      ORDER BY n_chars DESC, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |      AS cum_tokens
       |  FROM t)
       |SELECT lang, doc_id, n_tokens, cum_tokens
       |FROM c WHERE cum_tokens <= $TokenBudget
       |ORDER BY lang, doc_id""".stripMargin

  /** Length-outlier detection per language: exact interpolated
    * percentiles (p05/p95 — Spark `percentile` ≡ DuckDB
    * `quantile_cont`) define each language's normal band; documents
    * outside it are counted as outliers. The percentile aggregation is
    * per-language (keyed, partial+final); the |langs|-row band table is
    * broadcast back, so flagging is a row-local comparison at scan
    * speed. The classic pre-training length filter, made explainable:
    * the band bounds ship with the counts.
    */
  def outlierBands(spark: SparkSession, dir: String): DataFrame =
    outlierBands(Tables.documents(spark, dir), "lang", "n_chars")

  /** DataFrame-first form over any (group, measure) frame. */
  def outlierBands(docs: DataFrame, langCol: String, measureCol: String): DataFrame = {
    val d = docs.select(col(langCol).as("lang"), col(measureCol).as("m"))
    val bands = d.groupBy(col("lang")).agg(
      round(percentile(col("m"), lit(0.05)), 2).as("p05"),
      round(percentile(col("m"), lit(0.95)), 2).as("p95"))
    d.join(broadcast(bands), Seq("lang"))
      .groupBy(col("lang"), col("p05"), col("p95"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("m") < col("p05") || col("m") > col("p95"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col("lang"), col("n_docs"), col("n_outliers"), col("p05"), col("p95"))
      .orderBy(col("lang"))
  }

  val outlierBandsSql: String =
    """WITH b AS (
      |  SELECT lang, round(quantile_cont(n_chars, 0.05), 2) AS p05,
      |    round(quantile_cont(n_chars, 0.95), 2) AS p95
      |  FROM documents GROUP BY lang)
      |SELECT d.lang, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN n_chars < p05 OR n_chars > p95 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_outliers,
      |  p05, p95
      |FROM documents d JOIN b ON d.lang = b.lang
      |GROUP BY d.lang, p05, p95
      |ORDER BY d.lang""".stripMargin

  /** Robust outlier detection per event type: median / MAD (median
    * absolute deviation) replace mean / stddev, so a few extreme
    * values cannot inflate the very band that is supposed to catch
    * them — the failure mode of [[outlierBands]]-style z-scores on
    * heavy-tailed data. Flag: |v − median| > 3·MAD. All arithmetic is
    * EXACT cross-engine: values quantize to milli-unit BIGINTs doubled
    * twice (half-milli for the median, quarter-milli for the MAD) so
    * both interpolated medians land on integers and the 3·MAD
    * comparison is pure integer — no float threshold can flip between
    * engines. When MAD = 0 (over half the group identical) any
    * deviation flags, the standard modified-z degenerate case. Two
    * keyed partial+final aggregations over the same scan; the
    * |types|-row stat frames broadcast back; flagging is row-local.
    */
  def madOutliers(spark: SparkSession, dir: String): DataFrame =
    madOutliers(Tables.events(spark, dir), "event_type", "value")

  /** DataFrame-first form over any (group, measure) frame. */
  def madOutliers(events: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val d = events.select(col(groupCol).as("event_type"),
      (round(col(valCol) * 1000).cast("long") * 2L).as("v2"))
    val med = d.groupBy(col("event_type"))
      .agg(percentile(col("v2"), lit(0.5)).cast("long").as("med2"))
    val dev = d.join(broadcast(med), Seq("event_type"))
      .withColumn("dev2", abs(col("v2") - col("med2")) * 2L)
    val mad = dev.groupBy(col("event_type"))
      .agg(percentile(col("dev2"), lit(0.5)).cast("long").as("mad4"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"), col("med2"), col("mad4"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("dev2") > lit(3L) * col("mad4"), 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("event_type"), col("n_events"),
        round(col("med2").cast("double") / 2000.0, 4).as("median_value"),
        round(col("mad4").cast("double") / 4000.0, 4).as("mad_value"),
        col("n_outliers"))
      .orderBy(col("event_type"))
  }

  val madOutliersSql: String =
    """WITH q AS (
      |  SELECT event_type, 2 * CAST(round(value * 1000) AS BIGINT) AS v2
      |  FROM events),
      |m AS (
      |  SELECT event_type, CAST(quantile_cont(v2, 0.5) AS BIGINT) AS med2
      |  FROM q GROUP BY event_type),
      |d AS (
      |  SELECT q.event_type, v2, med2, 2 * abs(v2 - med2) AS dev2
      |  FROM q JOIN m USING (event_type)),
      |a AS (
      |  SELECT event_type, CAST(quantile_cont(dev2, 0.5) AS BIGINT) AS mad4
      |  FROM d GROUP BY event_type)
      |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  round(CAST(med2 AS DOUBLE) / 2000.0, 4) AS median_value,
      |  round(CAST(mad4 AS DOUBLE) / 4000.0, 4) AS mad_value,
      |  CAST(sum(CASE WHEN dev2 > 3 * mad4 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_outliers
      |FROM d JOIN a USING (event_type)
      |GROUP BY d.event_type, med2, mad4
      |ORDER BY d.event_type""".stripMargin

  /** Per-source duplication-rate report: how much of each source's
    * volume is redundant (1 − distinct texts / docs) — the monitoring
    * artifact a pipeline owner watches to decide which crawl sources
    * to throttle. `countDistinct` on the text expands to the standard
    * two-phase distinct aggregation; at 100 TB the text would be
    * pre-hashed to a 128-bit key first (semantics identical — see
    * [[Dedup.dedupExact]]).
    */
  def sourceDupRate(spark: SparkSession, dir: String): DataFrame =
    sourceDupRate(Tables.documents(spark, dir), "source", "text")

  /** DataFrame-first form over any (group, content) frame. */
  def sourceDupRate(docs: DataFrame, sourceCol: String, textCol: String): DataFrame =
    docs.select(col(sourceCol).as("source"), col(textCol).as("text"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_unique"))
      .withColumn("dup_rate",
        round(lit(1.0) - col("n_unique") / col("n_docs"), 4))
      .orderBy(col("source"))

  val sourceDupRateSql: String =
    """SELECT source, count(*) AS n_docs,
      |  count(DISTINCT text) AS n_unique,
      |  round(1.0 - count(DISTINCT text) / count(*), 4) AS dup_rate
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** Duplicate-cluster-size histogram — "HOW duplicated is the
    * corpus": for each cluster size k (documents sharing identical
    * text), how many clusters and how many documents sit at that size.
    * Two stacked hash aggs, both keyed on pre-hashed digests, output
    * bounded by the largest cluster size; the digest keying means the
    * first shuffle carries 32-char keys, never document bodies.
    */
  def dupSizeHistogram(spark: SparkSession, dir: String): DataFrame =
    dupSizeHistogram(Tables.documents(spark, dir), "text")

  /** DataFrame-first form over any content column. */
  def dupSizeHistogram(docs: DataFrame, textCol: String): DataFrame =
    docs.select(md5(col(textCol)).as("tkey"))
      .groupBy(col("tkey")).agg(count(lit(1)).as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("k")).as("n_docs"))
      .orderBy(col("k"))

  val dupSizeHistogramSql: String =
    """WITH c AS (
      |  SELECT md5(text) AS tkey, count(*) AS k
      |  FROM documents GROUP BY md5(text))
      |SELECT k, count(*) AS n_clusters, CAST(sum(k) AS BIGINT) AS n_docs
      |FROM c GROUP BY k
      |ORDER BY k""".stripMargin

  /** Cross-source overlap matrix — corpus provenance QA: for every
    * ordered source pair, how many of the left source's distinct texts
    * also appear in the right source (crawl snapshots re-scraping the
    * same pages, datasets repackaging each other). The self-join is on
    * the md5 digest of (distinct text, source) pairs — |unique texts|
    * rows a side, never doc×doc. The report is the FULL |sources|²
    * matrix with zero-filled cells (the |sources|-row dimension is
    * metadata-sized, its cross join broadcastable by construction), so
    * the artifact is stable — an overlap-free corpus still reports
    * every pair — the same always-emit design as
    * [[Sampling.splitLeakage]].
    */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame =
    sourceOverlap(Tables.documents(spark, dir), "source", "text")

  /** DataFrame-first form over any (group, content) frame.
    *
    * Shape: ONE scan + one digest-keyed shuffle. `collect_set(source)`
    * per digest subsumes the distinct (set semantics dedup within-
    * source copies), each digest's ordered source pairs expand
    * ROW-LOCALLY through array HOFs (bounded by |sources|² per row,
    * and |sources| is metadata-sized), and a final tiny agg counts
    * each pair. The naive digest self-join scans the corpus twice and
    * shuffles it twice; this never rereads the corpus.
    */
  def sourceOverlap(docs: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val counts = docs
      .select(col(sourceCol).as("source"), md5(col(textCol)).as("tkey"))
      .groupBy(col("tkey"))
      .agg(collect_set(col("source")).as("ss"))
      .filter(size(col("ss")) > 1)
      .select(explode(expr(
        "flatten(transform(ss, x -> transform(ss, y -> struct(x AS src_a, y AS src_b))))"))
        .as("p"))
      .select(col("p.src_a"), col("p.src_b"))
      .filter(col("src_a") =!= col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("shared"))
    val srcs = docs.select(col(sourceCol).as("source")).distinct()
    srcs.select(col("source").as("src_a"))
      .crossJoin(broadcast(srcs.select(col("source").as("src_b"))))
      .filter(col("src_a") =!= col("src_b"))
      .join(counts, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("shared"), lit(0L)).as("n_shared"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val sourceOverlapSql: String =
    """WITH d AS (
      |  SELECT DISTINCT source, md5(text) AS tkey FROM documents),
      |counts AS (
      |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared
      |  FROM d a JOIN d b ON a.tkey = b.tkey AND a.source <> b.source
      |  GROUP BY a.source, b.source),
      |srcs AS (SELECT DISTINCT source FROM documents)
      |SELECT x.source AS src_a, y.source AS src_b,
      |  coalesce(shared, 0) AS n_shared
      |FROM srcs x CROSS JOIN srcs y
      |LEFT JOIN counts c ON c.src_a = x.source AND c.src_b = y.source
      |WHERE x.source <> y.source
      |ORDER BY src_a, src_b""".stripMargin

  private val NearOverlapTau = 0.7

  /** Cross-source NEAR-duplicate overlap matrix — [[sourceOverlap]]'s
    * exact-copy census extended to near-dups: the MinHash-LSH verified
    * pairs at Jaccard ≥ [[NearOverlapTau]] (the near-dup threshold the
    * dedup family uses) are attributed to their source pair, counted
    * in both directions, and zero-filled to the full off-diagonal
    * matrix. Exact copies have J = 1 and are included, so this strictly
    * dominates the exact census — a source pair whose near-dup count
    * far exceeds its exact count is bleeding lightly-edited copies
    * (mirrors with boilerplate swapped, timestamp-patched rehosts)
    * that the md5 census can't see.
    *
    * Scale shape: the pair set is the memoized LSH sketch pipeline's
    * output (≪ corpus²); the source attribution is two doc-id-keyed
    * equi-joins; the matrix agg is |sources|²-bounded. xxhash64
    * sketch → rows-only driver check; planted cross-source near-dups
    * pinned in MixingSpec.
    */
  def sourceOverlapNear(spark: SparkSession, dir: String): DataFrame =
    sourceOverlapNear(Tables.documents(spark, dir),
      graft.ops.Dedup.minhashVerifiedPairs(spark, dir), "doc_id", "source",
      NearOverlapTau)

  /** DataFrame-first form: any docs frame with an (id → group) mapping
    * plus a verified-pair frame (doc_a, doc_b, jacc).
    */
  def sourceOverlapNear(docs: DataFrame, pairs: DataFrame, idCol: String,
                        sourceCol: String, tau: Double): DataFrame = {
    val src = docs.select(col(idCol).as("doc_id"), col(sourceCol).as("source"))
    val near = pairs.filter(col("jacc") >= tau)
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("src_a")), Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("src_b")), Seq("doc_b"))
      .filter(col("src_a") =!= col("src_b"))
    // count both directions so the matrix is symmetric like sourceOverlap
    val directed = near.select(col("src_a"), col("src_b"))
      .unionByName(near.select(col("src_b").as("src_a"), col("src_a").as("src_b")))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("shared"))
    val srcs = docs.select(col(sourceCol).as("source")).distinct()
    srcs.select(col("source").as("src_a"))
      .crossJoin(broadcast(srcs.select(col("source").as("src_b"))))
      .filter(col("src_a") =!= col("src_b"))
      .join(directed, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("shared"), lit(0L)).as("n_near_dups"))
      .orderBy(col("src_a"), col("src_b"))
  }

  private val DriftBins = 20

  /** Per-source length-distribution drift: a Kolmogorov–Smirnov-style
    * statistic comparing each source's doc-length ECDF against the
    * whole corpus at a fixed [[DriftBins]]+1-point threshold grid —
    * the monitoring table that catches a source whose crawler broke
    * (suddenly all short snippets) or started ingesting a new document
    * genre, before it skews the mix.
    *
    * Scale shape: the grid endpoints are the global min/max — ONE
    * 2-scalar aggregate touches the driver (scale-independent, like
    * IVF's centroid matrix); then the main job computes every source's
    * |grid| conditional sums in one corpus pass with map-side combine
    * (the shuffle carries |sources| rows × |grid| columns). The global
    * ECDF derives from the per-source sums through AQE's exchange
    * reuse — the runtime plan reads the per-source shuffle twice
    * rather than rescanning the corpus (ReusedExchange pinned in
    * PlanSpec).
    * Every ECDF value is a ratio of exact integers and the grid points
    * are identical IEEE doubles in both engines, so the max-|diff|
    * statistic and its argmax bin are oracle-exact (ties break toward
    * the HIGHER bin on both sides).
    */
  def sourceDrift(spark: SparkSession, dir: String): DataFrame =
    sourceDrift(Tables.documents(spark, dir), "source", "n_chars")

  /** DataFrame-first form over any (group, measure) frame. */
  def sourceDrift(docs: DataFrame, sourceCol: String, lenCol: String): DataFrame = {
    val d = docs.select(col(sourceCol).as("source"),
      col(lenCol).cast("long").as("len"))
    val mm = d.agg(min(col("len")), max(col("len"))).head()
    if (mm.isNullAt(0))
      return d.sparkSession.emptyDataFrame
        .select(lit("").as("source"), lit(0L).as("n_docs"),
          lit(0.0).as("ks_stat"), lit(0).as("ks_bin")).limit(0)
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    // grid point i: identical double arithmetic in the SQL oracle
    def t(i: Int) = lit(lo) + (lit(hi) - lit(lo)) * lit(i) / lit(DriftBins.toDouble)
    val condSums = count(lit(1)).as("n_docs") +: (0 to DriftBins).map(i =>
      sum((col("len").cast("double") <= t(i)).cast("long")).as(s"c_$i"))
    val perSource = d.groupBy(col("source"))
      .agg(condSums.head, condSums.tail: _*)
    // global ECDF from the per-source sums — |sources|-row frame, one
    // 1-row broadcast back; the corpus is not rescanned
    val globalAggs = sum(col("n_docs")).as("n_all") +:
      (0 to DriftBins).map(i => sum(col(s"c_$i")).as(s"g_$i"))
    val global = perSource.agg(globalAggs.head, globalAggs.tail: _*)
    val diffStructs = (0 to DriftBins).map(i => struct(
      abs(col(s"c_$i").cast("double") / col("n_docs")
        - col(s"g_$i").cast("double") / col("n_all")).as("diff"),
      lit(i).as("bin")))
    perSource.crossJoin(broadcast(global))
      .withColumn("best", greatest(diffStructs: _*))
      .select(col("source"), col("n_docs"),
        round(col("best.diff"), 4).as("ks_stat"),
        col("best.bin").as("ks_bin"))
      .orderBy(col("source"))
  }

  /** Reference grid + ECDF for
    * [[graft.streaming.EventTime.ksDriftWithState]]: the
    * [[sourceDrift]] threshold grid ([[DriftBins]]+1 points spanning
    * the reference corpus's [min, max]) and the corpus's exact ECDF at
    * each point — the fixed "historical" side a stream cannot
    * recompute per window. Grid arithmetic and the `len ≤ t` double
    * comparison replicate [[sourceDrift]] bit-for-bit, so a stream
    * scored against a reference built from a window's own slice equals
    * the batch op on that slice (the EventTimeSpec parity law).
    *
    * Driver-bounded: one 2-scalar aggregate (endpoints) + one
    * ([[DriftBins]]+2)-scalar aggregate (cumulative counts) — the IVF
    * centroid-matrix pattern, scale-independent.
    */
  def ksReference(docs: DataFrame, lenCol: String): (Array[Double], Array[Double]) = {
    val d = docs.select(col(lenCol).cast("long").as("len"))
    val mm = d.agg(min(col("len")), max(col("len"))).head()
    require(!mm.isNullAt(0), "ksReference: empty reference frame")
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    // same evaluation order as sourceDrift's t(i): Long (hi−lo)·i, one
    // double divide, one double add
    val grid = (0 to DriftBins)
      .map(i => lo + (hi - lo) * i / DriftBins.toDouble).toArray
    val aggs = count(lit(1)).as("n") +: grid.indices.map(i =>
      sum((col("len").cast("double") <= lit(grid(i))).cast("long")).as(s"g_$i"))
    val g = d.agg(aggs.head, aggs.tail: _*).head()
    val n = g.getLong(0).toDouble
    (grid, grid.indices.map(i => g.getLong(i + 1) / n).toArray)
  }

  val sourceDriftSql: String =
    s"""WITH mm AS (
      |  SELECT CAST(min(n_chars) AS BIGINT) AS lo, CAST(max(n_chars) AS BIGINT) AS hi
      |  FROM documents),
      |grid AS (
      |  SELECT i, lo + (hi - lo) * i / ${DriftBins.toDouble} AS t
      |  FROM mm CROSS JOIN generate_series(0, $DriftBins) AS g(i)),
      |per AS (
      |  SELECT source, i,
      |    CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(CASE WHEN CAST(n_chars AS DOUBLE) <= t THEN 1 ELSE 0 END) AS BIGINT) AS c
      |  FROM documents CROSS JOIN grid GROUP BY source, i),
      |tot AS (
      |  SELECT i, CAST(sum(n_docs) AS BIGINT) AS n_all, CAST(sum(c) AS BIGINT) AS g
      |  FROM per GROUP BY i),
      |diffs AS (
      |  SELECT source, n_docs,
      |    abs(CAST(c AS DOUBLE) / n_docs - CAST(g AS DOUBLE) / n_all) AS diff,
      |    CAST(i AS INT) AS bin
      |  FROM per JOIN tot USING (i)),
      |ranked AS (
      |  SELECT source, n_docs, diff, bin,
      |    row_number() OVER (PARTITION BY source ORDER BY diff DESC, bin DESC) AS rk
      |  FROM diffs)
      |SELECT source, n_docs, round(diff, 4) AS ks_stat, bin AS ks_bin
      |FROM ranked WHERE rk = 1
      |ORDER BY source""".stripMargin

  /** Chi-square independence test on the lang × source contingency
    * table — "is language composition independent of source?", the
    * statistical alarm for a corpus whose sources drifted apart in
    * language mix (a crawl that went monolingual, a source that
    * swallowed another's traffic). Emits one row per cell: observed,
    * expected under independence, the cell's chi-square contribution,
    * and the repeated global statistic.
    *
    * Cross-engine determinism: a global `sum` of double contributions
    * is summation-order-dependent, so each cell's contribution is
    * quantized to integer MICRO-units first and the global statistic
    * is an exact BIGINT sum of those (the micro-unit discipline
    * applied to a test statistic). Expected counts are
    * `(row_total · col_total) / N` computed in double (a BIGINT
    * product overflows past ~3e9 rows; one double multiply and one
    * double divide are the same IEEE ops on both engines).
    *
    * Scale shape: ONE corpus-sized aggregation (the |lang|×|source|
    * cell counts — partial+final, map-side combined); everything
    * downstream (marginals, full grid, N, global sum) operates on
    * that BOUNDED frame — re-aggregations reuse the cell exchange,
    * and the unpartitioned windows follow the pct_of_total
    * discipline (fine on a dozens-of-rows frame, never on the
    * corpus). One scan, one corpus shuffle, no corpus self-join.
    */
  def chiSquare(spark: SparkSession, dir: String): DataFrame =
    chiSquare(Tables.documents(spark, dir), "lang", "source")

  /** DataFrame-first form: independence of any two label columns.
    * Emits the FULL |a|×|b| grid — a cell observed zero times still
    * contributes its expected count to the statistic (dropping zero
    * cells understates dependence exactly where it's strongest). Row
    * totals, column totals, and the grid all derive from the one
    * cell-count aggregate, so its exchange is planned once and
    * reused ([[sourceDrift]]'s ReusedExchange discipline) — the
    * corpus is still scanned exactly once.
    */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df
      .groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
    val aTot = cells.groupBy(col("a")).agg(sum(col("o")).as("ra"))
    val bTot = cells.groupBy(col("b")).agg(sum(col("o")).as("cb"))
    val wAll = Window.partitionBy()
    aTot.crossJoin(bTot)
      .join(cells, Seq("a", "b"), "left")
      .na.fill(0L, Seq("o"))
      .withColumn("n", sum(col("o")).over(wAll))
      .withColumn("expected", col("ra").cast("double") * col("cb") / col("n"))
      .withColumn("contrib_micro",
        round((col("o") - col("expected")) * (col("o") - col("expected"))
          / col("expected") * 1e6).cast("long"))
      .withColumn("chi2_micro", sum(col("contrib_micro")).over(wAll))
      .select(col("a").as("lang"), col("b").as("source"),
        col("o").as("observed"), round(col("expected"), 4).as("expected"),
        col("contrib_micro"), col("chi2_micro"))
      .orderBy(col("lang"), col("source"))
  }

  val chiSquareSql: String =
    """WITH cells AS (
      |  SELECT lang AS a, source AS b, CAST(count(*) AS BIGINT) AS o
      |  FROM documents GROUP BY 1, 2),
      |at AS (SELECT a, CAST(sum(o) AS BIGINT) AS ra FROM cells GROUP BY a),
      |bt AS (SELECT b, CAST(sum(o) AS BIGINT) AS cb FROM cells GROUP BY b),
      |grid AS (
      |  SELECT at.a, bt.b, at.ra, bt.cb, COALESCE(cells.o, 0) AS o
      |  FROM at CROSS JOIN bt
      |  LEFT JOIN cells ON cells.a = at.a AND cells.b = bt.b),
      |e AS (
      |  SELECT a, b, o, ra, cb,
      |    CAST(sum(o) OVER () AS BIGINT) AS n
      |  FROM grid),
      |c AS (
      |  SELECT a, b, o, CAST(ra AS DOUBLE) * cb / n AS expected
      |  FROM e),
      |q AS (
      |  SELECT a, b, o, expected,
      |    CAST(round((o - expected) * (o - expected) / expected * 1e6)
      |         AS BIGINT) AS contrib_micro
      |  FROM c)
      |SELECT a AS lang, b AS source, o AS observed,
      |  round(expected, 4) AS expected, contrib_micro,
      |  CAST(sum(contrib_micro) OVER () AS BIGINT) AS chi2_micro
      |FROM q ORDER BY lang, source""".stripMargin

  /** Mutual information between two categorical columns — the
    * information-theoretic sibling of [[chiSquare]] (chi-square asks
    * "are they dependent?"; MI measures HOW MANY NATS of information
    * one label carries about the other — the feature-relevance score
    * used to rank candidate grouping/stratification columns). Emits
    * one row per OBSERVED cell with its counts, pointwise mutual
    * information, and the repeated global MI.
    *
    * Determinism: PMI = ln(n_xy·N / (n_x·n_y)) is quantized to
    * integer micro-nats per cell; the global MI is the exact BIGINT
    * sum Σ n_xy·pmi_micro divided ONCE by N with truncating integer
    * division — no double accumulates across rows. The PMI ratio is
    * computed in doubles (`CAST(n_xy AS DOUBLE) · N / (CAST(n_x AS
    * DOUBLE) · n_y)`) because the BIGINT cross-products overflow
    * past ~3e9 rows — one shared IEEE expression, identical on both
    * engines ([[chiSquare]]'s expected-count rule). Zero cells are
    * correctly ABSENT here (0·ln 0 = 0 contributes nothing), unlike
    * chi-square's grid where they carry expected mass.
    *
    * Scale shape: ONE corpus-sized aggregation to the |X|×|Y| cell
    * frame (map-side combined); marginals, N, and the global sum all
    * derive from that bounded frame; label cardinalities are bounded
    * (these are categorical columns) so every join below the cell
    * aggregate broadcasts.
    */
  def mutualInfo(spark: SparkSession, dir: String): DataFrame =
    mutualInfo(Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey")),
      "c_mktsegment", "o_orderpriority")

  /** DataFrame-first form: MI between any two label columns. */
  def mutualInfo(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("n_xy"))
    val nx = cells.groupBy(col("x")).agg(sum(col("n_xy")).as("n_x"))
    val ny = cells.groupBy(col("y")).agg(sum(col("n_xy")).as("n_y"))
    val tot = cells.agg(sum(col("n_xy")).as("n"))
    val scored = cells
      .join(broadcast(nx), Seq("x"))
      .join(broadcast(ny), Seq("y"))
      .crossJoin(broadcast(tot))
      .withColumn("pmi_micro",
        round(log(col("n_xy").cast("double") * col("n") /
          (col("n_x").cast("double") * col("n_y"))) * 1e6).cast("long"))
    val mi = scored
      .groupBy(col("n"))
      .agg(sum(col("n_xy") * col("pmi_micro")).as("w"))
      .select(expr("w DIV n").as("mi_total_micro"))
    scored.crossJoin(broadcast(mi))
      .select(col("x").as("segment"), col("y").as("priority"),
        col("n_xy"), col("n_x"), col("n_y"),
        col("pmi_micro"), col("mi_total_micro"))
      .orderBy(col("segment"), col("priority"))
  }

  val mutualInfoSql: String =
    """WITH b AS (
      |  SELECT c_mktsegment AS x, o_orderpriority AS y
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS n_xy
      |          FROM b GROUP BY x, y),
      |nx AS (SELECT x, CAST(sum(n_xy) AS BIGINT) AS n_x FROM cells GROUP BY x),
      |ny AS (SELECT y, CAST(sum(n_xy) AS BIGINT) AS n_y FROM cells GROUP BY y),
      |tot AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n FROM cells),
      |scored AS (
      |  SELECT x, y, n_xy, n_x, n_y, n,
      |    CAST(round(ln(CAST(n_xy AS DOUBLE) * n
      |                  / (CAST(n_x AS DOUBLE) * n_y)) * 1e6) AS BIGINT)
      |      AS pmi_micro
      |  FROM cells JOIN nx USING (x) JOIN ny USING (y) CROSS JOIN tot),
      |mi AS (
      |  SELECT CAST(sum(n_xy * pmi_micro) // any_value(n) AS BIGINT)
      |    AS mi_total_micro
      |  FROM scored)
      |SELECT x AS segment, y AS priority, n_xy, n_x, n_y, pmi_micro,
      |  mi_total_micro
      |FROM scored CROSS JOIN mi
      |ORDER BY segment, priority""".stripMargin

  /** Mann–Whitney U drift test per source — the RANK-based sibling of
    * [[sourceDrift]]'s KS statistic: each source's length distribution
    * against the rest of the corpus, reported as the exact doubled-U
    * statistic and the common-language effect size AUC = U/(n·m) (0.5 =
    * no shift; the probability a random doc from the source is longer
    * than a random doc from the rest — the ROC-AUC reading). Rank
    * statistics resist the heavy tails and outliers that move moment-
    * based drift tests; midranks handle ties exactly.
    *
    * Scale shape: the corpus collapses to a (value, count) grid first —
    * the measure's distinct-value frame — so the ranking window runs
    * over a BOUNDED frame, never the corpus (the [[Curation.
    * quantileNormalize]] discipline); per-source rank sums are one
    * vocabulary-keyed join + aggregate. DOUBLED midranks
    * (2·cum_before + tie + 1) keep every rank an exact BIGINT, so U is
    * integer-exact and the single final division makes AUC
    * cross-engine bit-identical.
    */
  def mannWhitney(spark: SparkSession, dir: String): DataFrame =
    mannWhitney(Tables.documents(spark, dir), "source", "n_chars")

  /** DataFrame-first form over any (group, measure) frame. */
  def mannWhitney(docs: DataFrame, sourceCol: String, valCol: String): DataFrame = {
    val v = docs.select(col(sourceCol).as("source"), col(valCol).as("val"))
    val grid = v.groupBy(col("val")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("val"))
    // doubled midrank over the bounded distinct-value frame
    val ranked = grid.withColumn("dr",
      lit(2) * (sum(col("cnt")).over(w) - col("cnt")) + col("cnt") + 1)
    val perSrcVal = v.groupBy(col("source"), col("val"))
      .agg(count(lit(1)).as("scnt"))
    val rankSums = perSrcVal.join(ranked.select(col("val"), col("dr")), "val")
      .groupBy(col("source"))
      .agg(sum(col("scnt") * col("dr")).as("r2"),
        sum(col("scnt")).as("n"))
    val total = v.agg(count(lit(1)).as("nt"))
    rankSums.crossJoin(broadcast(total))
      .select(col("source"), col("n"),
        (col("r2") - col("n") * (col("n") + 1)).as("u2"),
        round((col("r2") - col("n") * (col("n") + 1)).cast("double") /
          (lit(2.0) * col("n") * (col("nt") - col("n"))), 4).as("auc"))
      .orderBy(col("source"))
  }

  val mannWhitneySql: String =
    """WITH v AS (SELECT source, n_chars AS val FROM documents),
      |g AS (SELECT val, count(*) AS cnt FROM v GROUP BY val),
      |r AS (SELECT val, cnt,
      |  2 * (sum(cnt) OVER (ORDER BY val) - cnt) + cnt + 1 AS dr FROM g),
      |s AS (SELECT source, val, count(*) AS scnt FROM v GROUP BY source, val),
      |rs AS (SELECT source, CAST(sum(scnt * dr) AS BIGINT) AS r2,
      |       CAST(sum(scnt) AS BIGINT) AS n
      |       FROM s JOIN r USING (val) GROUP BY source),
      |tot AS (SELECT count(*) AS nt FROM v)
      |SELECT source, n, CAST(r2 - n * (n + 1) AS BIGINT) AS u2,
      |  round(CAST(r2 - n * (n + 1) AS DOUBLE) / (2.0 * n * (nt - n)), 4) AS auc
      |FROM rs, tot ORDER BY source""".stripMargin
}
