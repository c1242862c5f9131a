package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * Both ops use multiplicative integer hashing on the stable record id
  * instead of an engine RNG (`rand()`/`sampleBy`): the assignment is a
  * pure row-local projection — scan speed, no shuffle, no state — and
  * is reproducible across engines (the DuckDB oracle runs the same
  * arithmetic), across runs, and across repartitioning. That
  * reproducibility is the property a 100 TB training pipeline actually
  * needs from a split: re-running the job, or running it on a
  * different cluster layout, must put every document in the same
  * split. (Knuth's multiplicative method; the two ops use different
  * multipliers so sample membership and split assignment are
  * uncorrelated.) Arithmetic stays in BIGINT and is overflow-safe for
  * ANY 64-bit id: the id is first reduced mod the prime 1e9+7, so the
  * product is < 1e9 × the 32-bit constant ≈ 2.7e18 < 2^63−1 — ANSI
  * mode never overflows. (A bare id × constant would overflow at ids
  * above ~2^31.7.)
  */
object Sampling {

  /** Train/validation/test split, 80/10/10, keyed on doc_id. Output is
    * the full per-document assignment (the pipeline artifact a real
    * run would persist next to the corpus).
    */
  /** The split-assignment column for any id column: 0..999 bucket from
    * overflow-safe multiplicative hashing. Exposed so other operators
    * (e.g. the end-to-end corpus pipeline) assign identical splits.
    */
  def splitBucket(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(pmod(id, lit(1000000007L)) * lit(2654435761L), lit(1000L))

  def splitName(bucket: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(bucket < 800, "train").when(bucket < 900, "val").otherwise("test")

  def trainSplit(spark: SparkSession, dir: String): DataFrame =
    trainSplit(Tables.documents(spark, dir), "doc_id", "lang")

  /** DataFrame-first form. */
  def trainSplit(docs: DataFrame, idCol: String, langCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        splitBucket(col(idCol)).as("bucket"))
      .withColumn("split", splitName(col("bucket")))
      .orderBy(col("doc_id"))

  val trainSplitSql: String =
    """SELECT doc_id, lang,
      |  ((doc_id % 1000000007) * 2654435761) % 1000 AS bucket,
      |  CASE WHEN ((doc_id % 1000000007) * 2654435761) % 1000 < 800 THEN 'train'
      |       WHEN ((doc_id % 1000000007) * 2654435761) % 1000 < 900 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Stratified sample with per-stratum rates (10% of English, 20% of
    * everything else — the downsample-the-majority-language shape).
    * Row-local hash thresholding, NOT `row_number() over (partition by
    * lang)`: a per-stratum window would funnel every document of a
    * language through one task, which is exactly the serialization
    * this engine's window queries avoid (see
    * [[Relational.stringDistance]]'s notes). Rates hold in expectation
    * per stratum; membership is deterministic per document.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    stratifiedSample(Tables.documents(spark, dir), "doc_id", "lang", "n_chars")

  /** DataFrame-first form (rates: 10% for 'en', 20% otherwise). */
  def stratifiedSample(docs: DataFrame, idCol: String, langCol: String,
                       nCharsCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        col(nCharsCol).as("n_chars"),
        pmod(pmod(col(idCol), lit(1000000007L)) * lit(1103515245L) + lit(12345L),
          lit(100L)).as("bucket"))
      .filter(col("bucket") < when(col("lang") === "en", 10).otherwise(20))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  val stratifiedSampleSql: String =
    """SELECT doc_id, lang, n_chars
      |FROM documents
      |WHERE ((doc_id % 1000000007) * 1103515245 + 12345) % 100
      |      < (CASE WHEN lang = 'en' THEN 10 ELSE 20 END)
      |ORDER BY doc_id""".stripMargin

  /** Split-leakage detection — the training-data QA check that a
    * duplicated document does not straddle splits (an eval doc whose
    * text also sits in train invalidates the eval): per split, how many
    * documents' text also appears in ANOTHER split. Documents are keyed
    * by md5(text) (the one hash both engines share), so the two
    * text-keyed shuffles carry a 32-char digest, never the document
    * body — the same pre-hash discipline as [[Curation]]'s
    * decontamination join, and the right shape at 100 TB. Output is
    * one row per split (always 3 rows), so the report is stable even
    * on a leak-free corpus.
    */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame =
    splitLeakage(Tables.documents(spark, dir), "doc_id", "text")

  /** DataFrame-first form over any (id, content) frame.
    *
    * Shape: ONE corpus scan and one digest-keyed shuffle. The
    * (digest, split) aggregation collapses the corpus to at most
    * 3 rows per distinct text; each digest's split-spread then comes
    * from a keyed window over that already-aggregated frame — no
    * second scan, no join back against the corpus.
    */
  def splitLeakage(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val g = docs.select(md5(col(textCol)).as("tkey"),
        splitName(splitBucket(col(idCol))).as("split"))
      .groupBy(col("tkey"), col("split"))
      .agg(count(lit(1)).as("n"))
    g.withColumn("n_splits",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("tkey"))))
      .groupBy(col("split"))
      .agg(sum(col("n")).as("n_docs"),
        sum(when(col("n_splits") > 1, col("n")).otherwise(lit(0L))).as("n_leaked"))
      .orderBy(col("split"))
  }

  /** Deterministic k-examples-per-group sample — the "show me three
    * documents per language" inspection op. Selection is by smallest
    * multiplicative hash of the id (reproducible across engines, runs
    * and partitionings, like every sampler here), and the per-group
    * pick runs through the bounded [[graft.functions.TopKAggregator]]
    * PARTIAL aggregate: each map task reduces its slice to ≤ k rows
    * per group before the shuffle, where a row_number window would
    * shuffle the whole corpus and sort each group just to keep k.
    * The (score desc, id asc) total order makes the result exact and
    * deterministic — pinned value-by-value by the DuckDB window oracle.
    */
  def groupSample(spark: SparkSession, dir: String): DataFrame =
    groupSample(Tables.documents(spark, dir), "doc_id", "lang", 3)

  /** DataFrame-first form over any (id, group) frame. */
  def groupSample(docs: DataFrame, idCol: String, groupCol: String,
                  k: Int): DataFrame =
    docs
      .select(col(groupCol).as("lang"), col(idCol).as("doc_id"),
        pmod(pmod(col(idCol), lit(1000000007L)) * lit(1103515245L),
          lit(1000000007L)).as("h"))
      .groupBy(col("lang"))
      .agg(graft.functions.TopK.topK(k)(-col("h").cast("double"), col("doc_id")).as("top"))
      .select(col("lang"), posexplode(col("top")))
      .select(col("lang"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("doc_id"))
      .orderBy(col("lang"), col("rank"))

  val groupSampleSql: String =
    """WITH h AS (
      |  SELECT lang, doc_id,
      |    ((doc_id % 1000000007) * 1103515245) % 1000000007 AS h
      |  FROM documents),
      |r AS (
      |  SELECT lang, doc_id,
      |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rank
      |  FROM h)
      |SELECT lang, CAST(rank AS INT) AS rank, doc_id
      |FROM r WHERE rank <= 3
      |ORDER BY lang, rank""".stripMargin

  private val WeightedK = 100

  /** Weighted reservoir sample (Efraimidis–Spirakis A-Res): keep the K
    * rows with the largest u^(1/w) — equivalently the largest
    * ln(u)/w — where u is a deterministic hash-uniform in (0,1) and w
    * the row's weight (here `n_chars`: a doc is kept with probability
    * proportional to its weight, the "sample by quality score"
    * curation primitive). No RNG: u derives from the overflow-safe
    * multiplicative id hash, so the sample is reproducible across
    * engines, runs and partitionings, and the key is quantized to
    * integer NANO-units before ranking (doc_id tie-break) so the cut
    * is cross-engine exact — the [[graft.ops.TextAnalysis.unigramLm]]
    * discipline. The top-K is a `TakeOrderedAndProject` heap: ≤ K rows
    * per partition cross the wire, never a global sort.
    */
  def weightedSample(spark: SparkSession, dir: String): DataFrame =
    weightedSample(Tables.documents(spark, dir), "doc_id", "n_chars", WeightedK)

  /** DataFrame-first form over any (id, weight) frame; rows with
    * non-positive weight are excluded (they can never be sampled).
    */
  def weightedSample(docs: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    require(k >= 1, s"weightedSample: bad k=$k")
    docs
      .select(col(idCol).as("doc_id"), col(weightCol).cast("long").as("w"))
      .filter(col("w") > 0)
      .withColumn("h",
        pmod(pmod(col("doc_id"), lit(1000000007L)) * lit(2654435761L),
          lit(1000000007L)))
      .withColumn("key_nano",
        round(log((col("h") + lit(0.5)) / lit(1000000007.0)) / col("w") * lit(1e9))
          .cast("long"))
      .select(col("doc_id"), col("w"), col("key_nano"))
      .orderBy(col("key_nano").desc, col("doc_id"))
      .limit(k)
  }

  val weightedSampleSql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
      |    ((doc_id % 1000000007) * 2654435761) % 1000000007 AS h
      |  FROM documents WHERE n_chars > 0)
      |SELECT doc_id, w,
      |  CAST(round(ln((h + 0.5) / 1000000007.0) / w * 1e9) AS BIGINT) AS key_nano
      |FROM d
      |ORDER BY key_nano DESC, doc_id
      |LIMIT 100""".stripMargin

  /** Leakage-SAFE split — the prevention counterpart to
    * [[splitLeakage]]'s detection: the split key is the CONTENT digest,
    * not the row id, so byte-identical documents co-assign by
    * construction and an eval split can never share text with train.
    * The first 15 hex chars of md5 (60 bits, the one hash both engines
    * share) become the integer fed to the same overflow-safe
    * multiplicative bucketing as [[trainSplit]]; the whole assignment
    * stays a row-local projection — scan speed, reproducible across
    * engines, runs and partitionings.
    */
  def contentSplit(spark: SparkSession, dir: String): DataFrame =
    contentSplit(Tables.documents(spark, dir), "doc_id", "text")

  /** DataFrame-first form over any (id, content) frame. */
  def contentSplit(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        conv(substring(md5(col(textCol)), 1, 15), 16, 10).cast("long").as("ckey"))
      .select(col("doc_id"), splitBucket(col("ckey")).as("bucket"))
      .withColumn("split", splitName(col("bucket")))
      .orderBy(col("doc_id"))

  val contentSplitSql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS ckey
      |  FROM documents)
      |SELECT doc_id,
      |  ((ckey % 1000000007) * 2654435761) % 1000 AS bucket,
      |  CASE WHEN ((ckey % 1000000007) * 2654435761) % 1000 < 800 THEN 'train'
      |       WHEN ((ckey % 1000000007) * 2654435761) % 1000 < 900 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM d
      |ORDER BY doc_id""".stripMargin

  val splitLeakageSql: String =
    """WITH d AS (
      |  SELECT doc_id, md5(text) AS tkey,
      |    CASE WHEN ((doc_id % 1000000007) * 2654435761) % 1000 < 800 THEN 'train'
      |         WHEN ((doc_id % 1000000007) * 2654435761) % 1000 < 900 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents),
      |s AS (
      |  SELECT tkey, count(DISTINCT split) AS n_splits FROM d GROUP BY tkey)
      |SELECT split, count(*) AS n_docs,
      |  count(*) FILTER (WHERE n_splits > 1) AS n_leaked
      |FROM d JOIN s ON d.tkey = s.tkey
      |GROUP BY split
      |ORDER BY split""".stripMargin

  /** Bootstrap replicates for [[bootstrapMean]]. 32 replicates put the
    * band endpoints at the 2nd-smallest / 2nd-largest replicate mean
    * (≈ the 5%/95% order statistics of 32).
    */
  val NBoot = 32

  /** Poisson hash-bootstrap confidence band — the bootstrap that
    * actually runs at 100 TB (Chamandy et al., Google 2012 "Estimating
    * uncertainty for massive data streams"; Kleiner et al.'s BLB is
    * the subsample cousin): classical resampling draws n rows WITH
    * replacement — unshardable — but each row's multiplicity in a
    * replicate converges to Poisson(1), which is ROW-LOCAL. Here even
    * the Poisson draw is derandomized: the multiplicity comes from a
    * multiplicative hash of (row id, replicate) against the Poisson(1)
    * CDF quantized to 1e4 (tail truncated at 4 — P ≈ 0.4%, one more
    * documented quantization, identical in both engines), so the whole
    * band is reproducible run-to-run and engine-to-engine — no RNG,
    * the [[weightedSample]] discipline.
    *
    * Per group: full-sample mean, then [[NBoot]] replicate means
    * (Σ w·v / Σ w — doubles derived from exact integer sums), band =
    * 2nd-smallest..2nd-largest replicate mean.
    *
    * Scale posture: the replicate expansion is row-local (×[[NBoot]]
    * inside the scan, no extra shuffle); the only aggregates are
    * (group × replicate)-keyed — |groups|·32 cells — and the final
    * per-group sort is over a 32-element array. No per-row window, no
    * driver state, no RNG.
    */
  def bootstrapMean(spark: SparkSession, dir: String): DataFrame =
    bootstrapMean(
      Tables.orders(spark, dir)
        .join(broadcast(Tables.customer(spark, dir)
          .select(col("c_custkey"), col("c_mktsegment").as("segment"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("segment"), col("o_orderkey").as("id"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents")),
      "segment", "id", "cents")

  /** DataFrame-first form over any (group, stable id, integral value)
    * frame. Values report divided by 100 (cent convention).
    */
  def bootstrapMean(df: DataFrame, groupCol: String, idCol: String,
                    valCol: String): DataFrame = {
    val rows = df.select(col(groupCol).as("g"), col(idCol).as("id"),
      col(valCol).cast("long").as("v"))
    val base = rows.groupBy(col("g"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sv"))
    val rep = rows
      .select(col("g"), col("id"), col("v"),
        explode(expr(s"sequence(0, ${NBoot - 1})")).as("bb"))
      .withColumn("h", pmod(
        pmod(col("id"), lit(1000000007L)) * lit(2654435761L)
          + col("bb") * lit(97L), lit(10000L)))
      // Poisson(1) CDF at 1e4: 3679 / 7358 / 9197 / 9810, tail → 4
      .withColumn("w", when(col("h") < 3679, 0L).when(col("h") < 7358, 1L)
        .when(col("h") < 9197, 2L).when(col("h") < 9810, 3L).otherwise(4L))
    val bm = rep.groupBy(col("g"), col("bb"))
      .agg((sum(col("w") * col("v")).cast("double")
        / sum(col("w")).cast("double")).as("bm"))
      .filter(col("bm").isNotNull)
    val ci = bm.groupBy(col("g"))
      .agg(sort_array(collect_list(col("bm"))).as("arr"))
      .select(col("g"), element_at(col("arr"), 2).as("blo"),
        element_at(col("arr"), size(col("arr")) - 1).as("bhi"))
    base.join(ci, Seq("g"))
      .select(col("g").as("segment"), col("n_rows"),
        round(col("sv").cast("double") / col("n_rows") / 100.0, 4)
          .as("mean_val"),
        round(col("blo") / 100.0, 4).as("boot_lo"),
        round(col("bhi") / 100.0, 4).as("boot_hi"))
      .orderBy(col("segment"))
  }

  /** DuckDB twin of [[bootstrapMean]]: identical hash multiplicities,
    * replicate means and order-statistic band.
    */
  val bootstrapMeanSql: String =
    s"""WITH r AS (
       |  SELECT c_mktsegment AS g, o_orderkey AS id,
       |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
       |  FROM orders JOIN customer ON o_custkey = c_custkey),
       |base AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(sum(v) AS BIGINT) AS sv
       |  FROM r GROUP BY g),
       |rep AS (
       |  SELECT g, v,
       |    ((id % 1000000007) * 2654435761 + bb * 97) % 10000 AS h, bb
       |  FROM r CROSS JOIN (SELECT unnest(range(0, $NBoot)) AS bb)),
       |wts AS (
       |  SELECT g, bb, v,
       |    CASE WHEN h < 3679 THEN 0 WHEN h < 7358 THEN 1
       |      WHEN h < 9197 THEN 2 WHEN h < 9810 THEN 3 ELSE 4 END AS w
       |  FROM rep),
       |bm AS (
       |  SELECT g, bb,
       |    CAST(sum(w * v) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS bm
       |  FROM wts GROUP BY g, bb
       |  HAVING sum(w) > 0),
       |ci AS (
       |  SELECT g, list_sort(list(bm)) AS arr FROM bm GROUP BY g)
       |SELECT g AS segment, n_rows,
       |  round(CAST(sv AS DOUBLE) / n_rows / 100.0, 4) AS mean_val,
       |  round(arr[2] / 100.0, 4) AS boot_lo,
       |  round(arr[len(arr) - 1] / 100.0, 4) AS boot_hi
       |FROM base JOIN ci USING (g)
       |ORDER BY segment""".stripMargin
}
