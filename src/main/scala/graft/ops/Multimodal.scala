package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal record: an opaque media payload plus typed metadata.
  * At 100 TB the payload column dominates storage; everything here is
  * careful to project it away except where bytes are actually consumed.
  */
case class MediaRecord(
    doc_id: Long, media_type: String, payload: Array[Byte],
    width: Int, height: Int, n_frames: Int)

/** Output of the (stubbed) decode + feature-extract step. The histogram
  * is emitted as a fixed-format CSV string (scalar, not array<double>)
  * so the driver's pandas-based row sort can hash every cell.
  */
case class MediaFeatures(
    doc_id: Long, media_type: String, n_bytes: Long,
    mean_byte: Double, byte_entropy: Double,
    resized_w: Int, resized_h: Int, histogram: String)

/** Multimodal-column operators (driver north star: image/audio/video
  * as opaque `binary` columns with typed metadata).
  *
  * The real decode libraries (JPEG/PNG/audio codecs) are NOT in this
  * container, so the decode step is a clearly-marked deterministic
  * STUB ([[Multimodal.decodeStub]]) — but the Spark-side plumbing is
  * real and tested: binary payload column, metadata struct derivation,
  * typed `Dataset[MediaRecord]` with `mapPartitions` batched exactly
  * like an Arrow-batched decode would be, frame sampling via explode,
  * and a resize step that only touches metadata until the decoder
  * exists. Swapping `decodeStub` for a real codec changes no schema,
  * partitioning, or query shape.
  */
object Multimodal {

  /** The media catalog: documents' text bytes play the role of the
    * opaque payload; metadata is pure arithmetic on doc_id (so the
    * catalog is DuckDB-oracle-able end-to-end). Single projection — no
    * shuffle, scan speed.
    */
  def catalog(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3).cast("int") + 1).as("media_type"),
        col("text").cast("binary").as("payload"),
        col("text"), col("n_chars"),
        (lit(16) * (col("doc_id") % 64 + 1)).cast("int").as("width"),
        (lit(16) * (col("doc_id") % 48 + 1)).cast("int").as("height"))
      .withColumn("n_frames",
        when(col("media_type") === "video", (col("doc_id") % 24 + 1).cast("int"))
          .otherwise(lit(1)))

  /** Oracle-able catalog summary (payload reduced to its byte length —
    * the driver compare hashes values, and raw blobs stay out of it).
    */
  def mediaCatalog(spark: SparkSession, dir: String): DataFrame =
    catalog(spark, dir)
      .select(col("doc_id"), col("media_type"),
        length(col("payload")).cast("long").as("n_bytes"),
        col("width"), col("height"), col("n_frames"))
      .orderBy(col("doc_id"))

  val mediaCatalogSql: String =
    """SELECT doc_id,
      |  ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(16 * (doc_id % 64 + 1) AS INT) AS width,
      |  CAST(16 * (doc_id % 48 + 1) AS INT) AS height,
      |  CAST(CASE WHEN doc_id % 3 = 2 THEN doc_id % 24 + 1 ELSE 1 END AS INT) AS n_frames
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** STUB decoder. A real implementation would decode the codec
    * (JPEG/PCM/H.264) here; this container has no media libraries, so
    * the stand-in derives deterministic "decoded" statistics from the
    * raw bytes: mean byte value, byte-histogram entropy, a 16-bin
    * normalized byte histogram (the fake "feature vector"), and the
    * resize-to-fit-224 target dimensions (metadata-only resize).
    * Signature and batch shape are exactly what the real decoder needs.
    */
  private[ops] def decodeStub(r: MediaRecord): MediaFeatures = {
    val bytes = r.payload
    val n = math.max(bytes.length, 1)
    val hist = new Array[Double](16)
    var sum = 0L
    bytes.foreach { b => val u = b & 0xff; sum += u; hist(u >> 4) += 1.0 }
    var entropy = 0.0
    var i = 0
    while (i < 16) {
      val p = hist(i) / n
      if (p > 0) entropy -= p * (math.log(p) / math.log(2))
      hist(i) = math.rint(p * 10000) / 10000  // round for reproducibility
      i += 1
    }
    val scale = 224.0 / math.max(r.width, r.height)
    MediaFeatures(
      r.doc_id, r.media_type, bytes.length.toLong,
      mean_byte = math.rint(sum.toDouble / n * 100) / 100,
      byte_entropy = math.rint(entropy * 10000) / 10000,
      resized_w = math.max(1, math.rint(r.width * scale).toInt),
      resized_h = math.max(1, math.rint(r.height * scale).toInt),
      histogram = hist.map(p => String.format(java.util.Locale.ROOT, "%.4f", Double.box(p))).mkString(","))
  }

  /** Decode + feature-extract over the catalog. Typed `mapPartitions`
    * consuming records in batches of 64 — the same batch shape an
    * Arrow/vectorized decode would use, so a real decoder slots in
    * without re-plumbing. The payload column is projected ONLY here;
    * every other query prunes it at the scan. Rows-only driver check
    * (byte-level stub), invariants pinned by MultimodalSpec.
    */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    mediaFeatures(catalog(spark, dir))

  /** DataFrame-first form over any catalog-shaped frame (doc_id,
    * media_type, payload, width, height, n_frames).
    */
  def mediaFeatures(cat: DataFrame): DataFrame = {
    val spark = cat.sparkSession
    import spark.implicits._
    cat
      .select(col("doc_id"), col("media_type"), col("payload"),
        col("width"), col("height"), col("n_frames"))
      .as[MediaRecord]
      .mapPartitions { it =>
        // batched like an Arrow-fed decoder: amortizes codec init per batch
        it.grouped(64).flatMap(_.map(decodeStub))
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Frame sampling for video rows: up to 4 evenly-spaced frames per
    * video, each identified by (offset, length) into the payload and
    * fingerprinted with md5. explode keeps this fully distributed (one
    * output row per frame, no driver loop). Frame slices are taken on
    * the text column (DuckDB 1.0 lacks blob substring) — same bytes,
    * so the md5 oracle is exact.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    frameSample(catalog(spark, dir))

  /** DataFrame-first form over any catalog-shaped frame with text +
    * n_chars columns.
    */
  def frameSample(cat: DataFrame): DataFrame =
    cat
      .filter(col("media_type") === "video")
      .withColumn("k", least(col("n_frames"), lit(4)))
      .withColumn("frame_idx", explode(expr("sequence(0, k - 1)")))
      .withColumn("off", (lit(1) + col("frame_idx") * expr("n_chars div k")).cast("long"))
      .withColumn("flen", least(greatest(expr("n_chars div k"), lit(1)), lit(256)).cast("long"))
      .select(col("doc_id"), col("frame_idx"), col("off"), col("flen"),
        md5(expr("substring(text, CAST(off AS INT), CAST(flen AS INT))")).as("frame_md5"))
      .orderBy(col("doc_id"), col("frame_idx"))

  val frameSampleSql: String =
    """WITH v AS (
      |  SELECT doc_id, text, n_chars, CAST(doc_id % 24 + 1 AS INT) AS n_frames
      |  FROM documents WHERE doc_id % 3 = 2),
      |f AS (
      |  SELECT doc_id, text, n_chars, least(n_frames, 4) AS k,
      |    unnest(generate_series(0, least(n_frames, 4) - 1)) AS frame_idx
      |  FROM v)
      |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
      |  CAST(1 + frame_idx * (n_chars // k) AS BIGINT) AS off,
      |  CAST(least(greatest(n_chars // k, 1), 256) AS BIGINT) AS flen,
      |  md5(substring(text, CAST(1 + frame_idx * (n_chars // k) AS INT),
      |                CAST(least(greatest(n_chars // k, 1), 256) AS INT))) AS frame_md5
      |FROM f
      |ORDER BY doc_id, frame_idx""".stripMargin
}
