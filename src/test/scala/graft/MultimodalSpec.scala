package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the multimodal plumbing (stubbed decode — the specs
  * pin the plumbing contract the real decoder will inherit).
  */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val nDocs = Tables.documents(spark, sfDir).count()

  test("catalog: one row per doc; payload bytes == n_chars for ascii-safe rows") {
    val df = ops.Multimodal.mediaCatalog(spark, sfDir).cache()
    assert(df.count() == nDocs)
    assert(df.filter(!col("media_type").isin("image", "audio", "video")).count() == 0)
    assert(df.filter(col("width") <= 0 || col("height") <= 0 || col("n_frames") <= 0).count() == 0)
  }

  test("mediaFeatures: deterministic; one row per doc; stats in range") {
    val a = ops.Multimodal.mediaFeatures(spark, sfDir).cache()
    assert(a.count() == nDocs)
    assert(a.filter(col("mean_byte") < 0 || col("mean_byte") > 255).count() == 0)
    assert(a.filter(col("byte_entropy") < 0 || col("byte_entropy") > 4.0001).count() == 0)
    // resize preserves the fit-in-224 contract
    assert(a.filter(col("resized_w") > 224 || col("resized_h") > 224).count() == 0)
    assert(a.filter(size(split(col("histogram"), ",")) =!= 16).count() == 0)
    // deterministic across runs (stub decode must be pure)
    val b = ops.Multimodal.mediaFeatures(spark, sfDir)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("sniffFormat + headerDims: planted real headers decode to their true formats and dims") {
    import ops.Multimodal.{sniffFormat, headerDims}
    // PNG: signature + IHDR chunk carrying 640×480 big-endian
    val png = Array[Int](
      0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80, // width 640
      0, 0, 0x01, 0xe0, // height 480
      8, 6, 0, 0, 0).map(_.toByte)
    assert(sniffFormat(png) == "png")
    assert(headerDims(png, "png") == ((640, 480)))
    // JPEG: SOI, APP0 (JFIF, 16 bytes), then SOF0 with 320×200
    val jpeg = (Array[Int](0xff, 0xd8) ++
      Array[Int](0xff, 0xe0, 0x00, 0x10) ++ Array.fill(14)(0x4a) ++
      Array[Int](0xff, 0xc0, 0x00, 0x11, 0x08, 0x00, 0xc8, 0x01, 0x40, 0x03) ++
      Array.fill(10)(0)).map(_.toByte)
    assert(sniffFormat(jpeg) == "jpeg")
    assert(headerDims(jpeg, "jpeg") == ((320, 200)))
    // progressive JPEG (SOF2) behind fill bytes
    val jpeg2 = (Array[Int](0xff, 0xd8, 0xff, 0xff) ++
      Array[Int](0xff, 0xc2, 0x00, 0x11, 0x08, 0x00, 0x64, 0x00, 0x32) ++
      Array.fill(12)(0)).map(_.toByte)
    assert(headerDims(jpeg2, "jpeg") == ((50, 100)))
    // GIF89a 12×34 little-endian
    val gif = (Array[Int]('G', 'I', 'F', '8', '9', 'a', 12, 0, 34, 0) ++
      Array.fill(4)(0)).map(_.toByte)
    assert(sniffFormat(gif) == "gif")
    assert(headerDims(gif, "gif") == ((12, 34)))
    // BMP with a top-down (negative height) DIB: 77×-55
    val bmp = (Array[Int]('B', 'M') ++ Array.fill(16)(0) ++
      Array[Int](77, 0, 0, 0) ++ Array[Int](0xc9, 0xff, 0xff, 0xff) ++
      Array.fill(4)(0)).map(_.toByte)
    assert(sniffFormat(bmp) == "bmp")
    assert(headerDims(bmp, "bmp") == ((77, 55)))
    // RIFF/WAVE vs RIFF/AVI discrimination
    val wav = (Array[Int]('R', 'I', 'F', 'F', 0, 0, 0, 0) ++
      "WAVE".map(_.toInt) ++ Array.fill(4)(0)).map(_.toByte)
    assert(sniffFormat(wav) == "wav")
    val avi = (Array[Int]('R', 'I', 'F', 'F', 0, 0, 0, 0) ++
      "AVI ".map(_.toInt) ++ Array.fill(4)(0)).map(_.toByte)
    assert(sniffFormat(avi) == "avi")
    // truncated/garbage payloads answer honestly, never throw
    assert(sniffFormat(Array[Byte]()) == "unknown")
    assert(sniffFormat("just some text".getBytes) == "unknown")
    assert(headerDims(Array[Byte](0xff.toByte, 0xd8.toByte), "jpeg") == ((0, 0)))
    assert(headerDims(png.take(20), "png") == ((0, 0)))
  }

  test("wavInfo: planted PCM fmt/data chunks decode rate, channels, bits and duration") {
    import ops.Multimodal.wavInfo
    def le32(v: Long) = Array[Int]((v & 0xff).toInt, ((v >> 8) & 0xff).toInt,
      ((v >> 16) & 0xff).toInt, ((v >> 24) & 0xff).toInt)
    def le16(v: Int) = Array[Int](v & 0xff, (v >> 8) & 0xff)
    // 44100 Hz stereo 16-bit, 1 s of data = 176400 bytes
    val fmtChunk = "fmt ".map(_.toInt).toArray ++ le32(16) ++
      le16(1) ++ le16(2) ++ le32(44100) ++ le32(176400) ++ le16(4) ++ le16(16)
    val dataChunk = "data".map(_.toInt).toArray ++ le32(176400)
    val wav = ("RIFF".map(_.toInt).toArray ++ le32(36 + 176400) ++
      "WAVE".map(_.toInt).toArray ++ fmtChunk ++ dataChunk).map(_.toByte)
    assert(wavInfo(wav) == ((44100, 2, 16, 1000L)), s"got ${wavInfo(wav)}")
    // an odd-sized junk chunk before fmt must be skipped with its pad byte
    val junk = "JUNK".map(_.toInt).toArray ++ le32(3) ++ Array(1, 2, 3, 0)
    val wav2 = ("RIFF".map(_.toInt).toArray ++ le32(0) ++
      "WAVE".map(_.toInt).toArray ++ junk ++ fmtChunk ++ dataChunk).map(_.toByte)
    assert(wavInfo(wav2) == ((44100, 2, 16, 1000L)))
    // half a second, mono 8-bit 8000 Hz: 4000 bytes
    val fmt8 = "fmt ".map(_.toInt).toArray ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(8000) ++ le32(8000) ++ le16(1) ++ le16(8)
    val wav3 = ("RIFF".map(_.toInt).toArray ++ le32(0) ++
      "WAVE".map(_.toInt).toArray ++ fmt8 ++
      ("data".map(_.toInt).toArray ++ le32(4000))).map(_.toByte)
    assert(wavInfo(wav3) == ((8000, 1, 8, 500L)))
    // non-WAV and truncated payloads answer zeros, never throw
    assert(wavInfo("not audio".getBytes) == ((0, 0, 0, 0L)))
    assert(wavInfo(wav.take(14)) == ((0, 0, 0, 0L)))
  }

  test("mediaFeatures surfaces planted real headers through the full pipeline") {
    import spark.implicits._
    val png = Array[Int](
      0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80, 0, 0, 0x01, 0xe0, 8, 6, 0, 0, 0).map(_.toByte)
    def le32(v: Long) = Array[Int]((v & 0xff).toInt, ((v >> 8) & 0xff).toInt,
      ((v >> 16) & 0xff).toInt, ((v >> 24) & 0xff).toInt)
    def le16(v: Int) = Array[Int](v & 0xff, (v >> 8) & 0xff)
    val wav = ("RIFF".map(_.toInt).toArray ++ le32(0) ++
      "WAVE".map(_.toInt).toArray ++
      ("fmt ".map(_.toInt).toArray ++ le32(16) ++
        le16(1) ++ le16(1) ++ le32(8000) ++ le32(8000) ++ le16(1) ++ le16(8)) ++
      ("data".map(_.toInt).toArray ++ le32(4000))).map(_.toByte)
    val cat = Seq(
      ops.MediaRecord(1L, "image", png, 640, 480, 1),
      ops.MediaRecord(2L, "image", "plain text bytes".getBytes, 64, 64, 1),
      ops.MediaRecord(3L, "audio", wav, 1, 1, 1))
      .toDF()
    val got = ops.Multimodal.mediaFeatures(cat).collect()
    val byId = got.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[String]("detected_format") == "png")
    assert(byId(1L).getAs[Int]("decoded_w") == 640)
    assert(byId(1L).getAs[Int]("decoded_h") == 480)
    assert(byId(2L).getAs[String]("detected_format") == "unknown")
    assert(byId(2L).getAs[Int]("decoded_w") == 0)
    assert(byId(3L).getAs[String]("detected_format") == "wav")
    assert(byId(3L).getAs[Int]("audio_rate") == 8000)
    assert(byId(3L).getAs[Int]("audio_channels") == 1)
    assert(byId(3L).getAs[Long]("audio_ms") == 500L)
    assert(byId(1L).getAs[Int]("audio_rate") == 0, "images carry no audio fields")
  }

  test("frameSample: only videos; <=4 frames each; offsets inside the payload") {
    val df = ops.Multimodal.frameSample(spark, sfDir).cache()
    val videos = ops.Multimodal.mediaCatalog(spark, sfDir)
      .filter(col("media_type") === "video")
    assert(df.select(countDistinct("doc_id")).head().getLong(0) == videos.count())
    val perDoc = df.groupBy("doc_id").count()
    assert(perDoc.filter(col("count") > 4).count() == 0)
    assert(df.filter(col("off") < 1).count() == 0)
    assert(df.filter(length(col("frame_md5")) =!= 32).count() == 0)
  }
}
