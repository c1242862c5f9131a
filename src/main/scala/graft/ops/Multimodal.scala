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

/** Output of the decode + feature-extract step. `detected_format` /
  * `decoded_w` / `decoded_h` come from REAL byte parsing (magic-byte
  * sniff + JPEG/PNG/GIF/BMP header fields); the pixel-level statistics
  * remain byte-derived stand-ins until a codec library exists. The
  * histogram is emitted as a fixed-format CSV string (scalar, not
  * array<double>) so the driver's pandas-based row sort can hash every
  * cell.
  */
case class MediaFeatures(
    doc_id: Long, media_type: String, n_bytes: Long,
    detected_format: String, decoded_w: Int, decoded_h: Int,
    audio_rate: Int, audio_channels: Int, audio_ms: Long,
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

  /** Magic-byte container sniffing — pure public-knowledge byte
    * parsing of the standard file signatures (no codec library
    * involved): JPEG `FF D8 FF`, PNG `89 50 4E 47 0D 0A 1A 0A`,
    * GIF87a/GIF89a, BMP `BM`, RIFF/WAVE and RIFF/AVI containers.
    * Returns "unknown" when no signature matches (e.g. the synthetic
    * text payloads of the demo catalog — the honest answer).
    */
  private[graft] def sniffFormat(b: Array[Byte]): String = {
    @inline def u(i: Int): Int = b(i) & 0xff
    if (b.length >= 3 && u(0) == 0xff && u(1) == 0xd8 && u(2) == 0xff) "jpeg"
    else if (b.length >= 8 && u(0) == 0x89 && u(1) == 'P' && u(2) == 'N' &&
      u(3) == 'G' && u(4) == 0x0d && u(5) == 0x0a && u(6) == 0x1a && u(7) == 0x0a) "png"
    else if (b.length >= 6 && u(0) == 'G' && u(1) == 'I' && u(2) == 'F' &&
      u(3) == '8' && (u(4) == '7' || u(4) == '9') && u(5) == 'a') "gif"
    else if (b.length >= 2 && u(0) == 'B' && u(1) == 'M') "bmp"
    else if (b.length >= 12 && u(0) == 'R' && u(1) == 'I' && u(2) == 'F' && u(3) == 'F') {
      val tag = new String(b, 8, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (tag == "WAVE") "wav" else if (tag == "AVI ") "avi" else "riff"
    } else "unknown"
  }

  /** Header-level width/height extraction for the sniffed formats —
    * again plain public byte-layout parsing, no decode:
    *  - PNG: IHDR is the first chunk after the 8-byte signature; width
    *    and height are big-endian u32 at offsets 16 and 20.
    *  - JPEG: walk the `FF xx` marker stream to the first start-of-
    *    frame marker (SOF0–SOF15, excluding DHT/JPG/DAC C4/C8/CC);
    *    height/width are big-endian u16 at +5/+7 past the marker.
    *  - GIF: logical screen width/height, little-endian u16 at 6/8.
    *  - BMP: BITMAPINFOHEADER signed little-endian i32 at 18/22
    *    (negative height = top-down row order → abs).
    * Returns (0, 0) for non-image or truncated payloads.
    */
  private[graft] def headerDims(b: Array[Byte], fmt: String): (Int, Int) = {
    @inline def u(i: Int): Int = b(i) & 0xff
    def be32(i: Int): Int = (u(i) << 24) | (u(i + 1) << 16) | (u(i + 2) << 8) | u(i + 3)
    def be16(i: Int): Int = (u(i) << 8) | u(i + 1)
    def le16(i: Int): Int = u(i) | (u(i + 1) << 8)
    def le32(i: Int): Int = u(i) | (u(i + 1) << 8) | (u(i + 2) << 16) | (u(i + 3) << 24)
    fmt match {
      case "png" if b.length >= 24 => (be32(16), be32(20))
      case "gif" if b.length >= 10 => (le16(6), le16(8))
      case "bmp" if b.length >= 26 => (le32(18), math.abs(le32(22)))
      case "jpeg" =>
        var i = 2
        var out = (0, 0)
        var done = false
        while (!done && i + 9 < b.length) {
          if (u(i) != 0xff) done = true // desynced marker stream: stop
          else {
            val m = u(i + 1)
            if (m == 0xff) i += 1 // fill bytes before a marker
            else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2 // standalone
            else {
              val len = be16(i + 2)
              if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
                out = (be16(i + 7), be16(i + 5)) // (width, height)
                done = true
              } else if (len < 2) done = true
              else i += 2 + len
            }
          }
        }
        out
      case _ => (0, 0)
    }
  }

  /** RIFF/WAVE `fmt ` + `data` chunk walk — the audio sibling of
    * [[headerDims]], again pure public byte-layout parsing (RIFF
    * chunks are `[4-byte id][u32le size][payload]`, first at offset
    * 12; the PCM `fmt ` chunk carries channels at +2, sample rate at
    * +4, bits per sample at +14). Returns
    * (sampleRate, channels, bitsPerSample, durationMs) with duration
    * derived from the `data` chunk byte length — (0,0,0,0) for
    * non-WAV or truncated payloads.
    */
  private[graft] def wavInfo(b: Array[Byte]): (Int, Int, Int, Long) = {
    @inline def u(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u(i) | (u(i + 1) << 8)
    def le32(i: Int): Long =
      (u(i) | (u(i + 1) << 8) | (u(i + 2) << 16) | (u(i + 3).toLong << 24)) & 0xffffffffL
    if (sniffFormat(b) != "wav") return (0, 0, 0, 0L)
    var i = 12
    var rate = 0; var ch = 0; var bits = 0; var dataLen = 0L
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val sz = le32(i + 4)
      if (id == "fmt " && i + 8 + 16 <= b.length) {
        ch = le16(i + 8 + 2)
        rate = le32(i + 8 + 4).toInt
        bits = le16(i + 8 + 14)
      } else if (id == "data") dataLen = sz
      // chunks are u16-aligned: odd sizes carry one pad byte
      i += 8 + sz.toInt + (sz.toInt & 1)
    }
    val bytesPerSec = rate.toLong * ch * bits / 8
    val ms = if (bytesPerSec > 0) dataLen * 1000L / bytesPerSec else 0L
    (rate, ch, bits, ms)
  }

  /** Decoder front-end. Container sniffing and header dimensions are
    * REAL byte parsing ([[sniffFormat]]/[[headerDims]]); the
    * pixel-level statistics that would need an actual codec library
    * (absent from this container) remain deterministic byte-derived
    * stand-ins: mean byte value, byte-histogram entropy, a 16-bin
    * normalized byte histogram (the stand-in "feature vector"), and
    * the resize-to-fit-224 target dimensions computed on the catalog
    * metadata. Signature and batch shape are exactly what a full
    * decoder needs.
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
    val fmt = sniffFormat(bytes)
    val (dw, dh) = headerDims(bytes, fmt)
    val (rate, ch, _, ms) = wavInfo(bytes)
    MediaFeatures(
      r.doc_id, r.media_type, bytes.length.toLong,
      detected_format = fmt, decoded_w = dw, decoded_h = dh,
      audio_rate = rate, audio_channels = ch, audio_ms = ms,
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
