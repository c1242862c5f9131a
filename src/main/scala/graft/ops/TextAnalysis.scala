package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the
  * training-data-pipeline surface (driver north star; the reference
  * framework itself is data-agnostic, see SURVEY.md §0).
  *
  * All operators are single-pass, row-local projections (no shuffle
  * until the final small aggregation), built from codegen'd string
  * functions — at 100 TB these run at scan speed, bounded by parquet
  * decode.
  */
object TextAnalysis {

  private def toks: Column = split(col("text"), " ")

  /** Corpus statistics per (lang, source): document counts, char and
    * whitespace-token distributions. Partial aggregation keeps the
    * shuffle at |lang|×|source| rows.
    */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), col("source"), col("n_chars"),
        size(toks).cast("long").as("n_toks"))
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        round(avg(col("n_chars")), 2).as("avg_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        sum(col("n_toks")).as("sum_toks"),
        round(avg(col("n_toks")), 2).as("avg_toks"))
      .orderBy(col("lang"), col("source"))

  val textStatsSql: String =
    """SELECT lang, source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  round(avg(n_chars), 2) AS avg_chars,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_toks,
      |  round(avg(len(string_split(text, ' '))), 2) AS avg_toks
      |FROM documents
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single other chars). Pure projection —
    * scan-speed at any scale.
    */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(toks).cast("long").as("n_ws_tokens"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long").as("n_bpe_tokens"))
      .orderBy(col("doc_id"))

  val tokenCountSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_tokens
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  private val StopWords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Quality scoring: length / punctuation / stopword-ratio heuristics
    * bucketed into low/medium/high. Ratios are rounded before the
    * bucket comparison so the cut is reproducible cross-engine.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val stopArr = StopWords.map(w => s"'$w'").mkString("array(", ",", ")")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"), col("text"),
        size(toks).cast("long").as("n_tokens"),
        length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("long").as("n_punct"),
        expr(s"size(filter(split(text, ' '), t -> array_contains($stopArr, t)))")
          .cast("long").as("n_stop"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("n_punct") / greatest(col("n_chars"), lit(1L)), 4).as("punct_ratio"),
        round(col("n_stop") / greatest(col("n_tokens"), lit(1L)), 4).as("stop_ratio"))
      .withColumn("quality",
        when(col("stop_ratio") >= 0.05 && col("n_tokens") >= 50, "high")
          .when(col("n_tokens") >= 20, "medium")
          .otherwise("low"))
      .orderBy(col("doc_id"))
  }

  val qualityScoreSql: String = {
    val stopList = StopWords.map(w => s"'$w'").mkString("[", ",", "]")
    s"""WITH q AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    round(len(regexp_replace(text, '[a-z0-9 ]', '', 'g'))
       |          / greatest(n_chars, 1), 4) AS punct_ratio,
       |    round(len(list_filter(string_split(text, ' '),
       |                          t -> list_contains($stopList, t)))
       |          / greatest(len(string_split(text, ' ')), 1), 4) AS stop_ratio
       |  FROM documents)
       |SELECT doc_id, n_tokens, punct_ratio, stop_ratio,
       |  CASE WHEN stop_ratio >= 0.05 AND n_tokens >= 50 THEN 'high'
       |       WHEN n_tokens >= 20 THEN 'medium' ELSE 'low' END AS quality
       |FROM q ORDER BY doc_id""".stripMargin
  }

  /** Language identification via stopword-profile scoring plus a CJK
    * codepoint check — the classic cheap n-gram/wordlist heuristic.
    * Emits a (labelled lang × predicted lang) confusion table. Not
    * SQL-oracle-able (heuristic, not relational) → rows-only check.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val profiles = Map(
      "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
      "es" -> Seq("el", "la", "de", "los", "que", "y", "un"),
      "fr" -> Seq("le", "la", "les", "et", "des", "une", "est"))
    def score(words: Seq[String]): Column = {
      val arr = words.map(w => s"'$w'").mkString("array(", ",", ")")
      expr(s"size(filter(split(text, ' '), t -> array_contains($arr, t)))")
    }
    val scored = Tables.documents(spark, dir)
      .withColumn("s_en", score(profiles("en")))
      .withColumn("s_de", score(profiles("de")))
      .withColumn("s_es", score(profiles("es")))
      .withColumn("s_fr", score(profiles("fr")))
      .withColumn("has_cjk", col("text").rlike("[\\u4e00-\\u9fff]"))
    val best = greatest(col("s_en"), col("s_de"), col("s_es"), col("s_fr"))
    scored
      .withColumn("pred_lang",
        when(col("has_cjk"), "zh")
          .when(best === 0, "unknown")
          .when(col("s_en") === best, "en")   // deterministic tie priority
          .when(col("s_de") === best, "de")
          .when(col("s_es") === best, "es")
          .otherwise("fr"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  /** Document fingerprinting: bottom-k sketch over hashed 5-gram word
    * shingles (winnowing-style). Two docs sharing most content get the
    * same fingerprint with high probability. Per-doc output (always
    * |documents| rows). Hash family is Spark's xxhash64 → no SQL oracle.
    */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.documents(spark, dir)
      .select(col("doc_id"), expr("shingle_hash(split(text, ' '), 5)").as("sh"))
      .select(col("doc_id"),
        expr("slice(array_sort(sh), 1, 4)").as("bottomk"))
      .select(col("doc_id"),
        expr("xxhash64(bottomk[0], bottomk[1], bottomk[2], bottomk[3])").as("fingerprint"),
        // scalar, not array<long>: the driver compare sorts rows in pandas,
        // which cannot hash array cells
        array_join(col("bottomk"), ",").as("bottomk_csv"))
      .orderBy(col("doc_id"))
  }
}
