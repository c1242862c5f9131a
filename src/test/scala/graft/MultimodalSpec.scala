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

  test("wavParse: crafted/oversized chunk sizes terminate with zeros, never hang or throw") {
    import ops.Multimodal.{wavInfo, wavSampleStats}
    def le32(v: Long) = Array[Int]((v & 0xff).toInt, ((v >> 8) & 0xff).toInt,
      ((v >> 16) & 0xff).toInt, ((v >> 24) & 0xff).toInt)
    // sz = 0xFFFFFFF8 once truncated to Int gave a 0 advance (infinite
    // loop); the Long-arithmetic walk must stop and answer zeros
    val evil = ("RIFF".map(_.toInt).toArray ++ le32(0) ++
      "WAVE".map(_.toInt).toArray ++
      "JUNK".map(_.toInt).toArray ++ le32(0xFFFFFFF8L) ++ Array.fill(8)(0)).map(_.toByte)
    assert(wavInfo(evil) == ((0, 0, 0, 0L)))
    // a large-but-not-wrapping size that would drive the Int cursor
    // negative must also stop cleanly
    val evil2 = ("RIFF".map(_.toInt).toArray ++ le32(0) ++
      "WAVE".map(_.toInt).toArray ++
      "JUNK".map(_.toInt).toArray ++ le32(0x7FFFFFF0L) ++ Array.fill(8)(0)).map(_.toByte)
    assert(wavInfo(evil2) == ((0, 0, 0, 0L)))
    // chunks already read before the bad one survive
    def le16(v: Int) = Array[Int](v & 0xff, (v >> 8) & 0xff)
    val fmtChunk = "fmt ".map(_.toInt).toArray ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(8000) ++ le32(8000) ++ le16(1) ++ le16(8)
    val half = ("RIFF".map(_.toInt).toArray ++ le32(0) ++
      "WAVE".map(_.toInt).toArray ++ fmtChunk ++
      "data".map(_.toInt).toArray ++ le32(0xFFFFFFF8L)).map(_.toByte)
    val (rate, ch, bits, _) = wavInfo(half)
    assert((rate, ch, bits) == ((8000, 1, 8)))
    assert(wavSampleStats(half).isEmpty, "declared-huge but absent data has no samples")
  }

  test("wavSampleStats: planted 8-bit square wave pins RMS, peak and zero-crossing rate") {
    import ops.Multimodal.wavSampleStats
    def le32(v: Long) = Array[Int]((v & 0xff).toInt, ((v >> 8) & 0xff).toInt,
      ((v >> 16) & 0xff).toInt, ((v >> 24) & 0xff).toInt)
    def le16(v: Int) = Array[Int](v & 0xff, (v >> 8) & 0xff)
    // 8 kHz mono 8-bit, 8 samples alternating 255/0:
    //   s = +0.9921875 / -1.0, every consecutive pair crosses zero
    val samples = Array(255, 0, 255, 0, 255, 0, 255, 0)
    val wav = ("RIFF".map(_.toInt).toArray ++ le32(0) ++
      "WAVE".map(_.toInt).toArray ++
      ("fmt ".map(_.toInt).toArray ++ le32(16) ++
        le16(1) ++ le16(1) ++ le32(8000) ++ le32(8000) ++ le16(1) ++ le16(8)) ++
      ("data".map(_.toInt).toArray ++ le32(8)) ++ samples).map(_.toByte)
    val Some((rms, peak, zcr)) = wavSampleStats(wav)
    val hi = 127.0 / 128.0
    val expRms = math.rint(math.sqrt((hi * hi + 1.0) / 2.0) * 1e6) / 1e6
    assert(rms == expRms, s"rms $rms != $expRms")
    assert(peak == 1.0)
    assert(zcr == 1.0, "7 sign changes over 7 consecutive pairs")
    // 16-bit stereo: channel-0 full-scale DC, channel-1 noise — stats
    // must read channel 0 only: rms = peak = 0.25, zcr = 0
    val s16 = Array(8192, 31111, 8192, -17, 8192, 999, 8192, -30000)
      .flatMap(v => le16(v & 0xffff))
    val wav2 = ("RIFF".map(_.toInt).toArray ++ le32(0) ++
      "WAVE".map(_.toInt).toArray ++
      ("fmt ".map(_.toInt).toArray ++ le32(16) ++
        le16(1) ++ le16(2) ++ le32(8000) ++ le32(32000) ++ le16(4) ++ le16(16)) ++
      ("data".map(_.toInt).toArray ++ le32(16)) ++ s16).map(_.toByte)
    assert(wavSampleStats(wav2).contains((0.25, 0.25, 0.0)))
  }

  test("imageStats: planted 2x2 PNG decodes to exact channel means, luminance and edge density") {
    import ops.Multimodal.{imageStats, sniffFormat}
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val bytes = bos.toByteArray
    assert(sniffFormat(bytes) == "png")
    val Some((luma, r, g, b, edge)) = imageStats(bytes, "png")
    assert(r == 127.5 && g == 127.5 && b == 127.5)
    // per-pixel luma: 76.245, 149.685, 29.07, 255 → mean 127.5
    assert(luma == 127.5)
    // 4 adjacent pairs: |149.685-76.245| + |255-29.07| + |29.07-76.245|
    // + |255-149.685| = 451.86; / (255*4) = 0.443
    assert(edge == 0.443, s"edge $edge")
    // non-decodable payloads answer None, never throw
    assert(imageStats("not an image".getBytes, "png").isEmpty)
    assert(imageStats(bytes.take(12), "png").isEmpty)
    assert(imageStats(bytes, "wav").isEmpty, "only image formats are attempted")
  }

  test("imageStats: JPEG decodes through the JDK codec too — uniform gray survives the lossy round-trip") {
    import ops.Multimodal.{imageStats, sniffFormat}
    val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 4; y <- 0 until 4) img.setRGB(x, y, 0x808080)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    assert(sniffFormat(bytes) == "jpeg")
    val Some((luma, r, g, b, edge)) = imageStats(bytes, "jpeg")
    // a uniform image is pure DC: every channel decodes to ~128 and the
    // gradient proxy stays ~0 (JPEG may shift the constant by ±2)
    Seq(luma, r, g, b).foreach(v => assert(math.abs(v - 128.0) <= 2.0, s"uniform gray drifted: $v"))
    assert(edge <= 0.01, s"uniform image has no edges: $edge")
  }

  test("mediaFeatures carries real pixel/sample statistics end-to-end; non-decodable stay null") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    def le32(v: Long) = Array[Int]((v & 0xff).toInt, ((v >> 8) & 0xff).toInt,
      ((v >> 16) & 0xff).toInt, ((v >> 24) & 0xff).toInt)
    def le16(v: Int) = Array[Int](v & 0xff, (v >> 8) & 0xff)
    val wav = ("RIFF".map(_.toInt).toArray ++ le32(0) ++
      "WAVE".map(_.toInt).toArray ++
      ("fmt ".map(_.toInt).toArray ++ le32(16) ++
        le16(1) ++ le16(1) ++ le32(8000) ++ le32(8000) ++ le16(1) ++ le16(8)) ++
      ("data".map(_.toInt).toArray ++ le32(4)) ++ Array(255, 0, 255, 0)).map(_.toByte)
    val cat = Seq(
      ops.MediaRecord(1L, "image", bos.toByteArray, 2, 2, 1),
      ops.MediaRecord(2L, "audio", wav, 1, 1, 1),
      ops.MediaRecord(3L, "image", "plain text".getBytes, 64, 64, 1)).toDF()
    val byId = ops.Multimodal.mediaFeatures(cat).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Double]("mean_luma") == 127.5)
    assert(byId(1L).getAs[Double]("edge_density") == 0.443)
    assert(byId(1L).getAs[Int]("decoded_w") == 2, "header dims agree with the decode")
    assert(byId(1L).isNullAt(byId(1L).fieldIndex("audio_rms")), "images carry no sample stats")
    assert(byId(2L).getAs[Double]("audio_peak") == 1.0)
    assert(byId(2L).getAs[Double]("audio_zcr") == 1.0)
    assert(byId(2L).isNullAt(byId(2L).fieldIndex("mean_luma")))
    assert(byId(3L).isNullAt(byId(3L).fieldIndex("mean_luma")), "undecodable stays null")
    assert(byId(3L).isNullAt(byId(3L).fieldIndex("audio_rms")))
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

  /** Independent driver-side model of the 64-bit gradient hash: same
    * astral strip, integer cell bounds, cross-multiplied comparisons.
    */
  private def phashModel(text: String): Option[Long] = {
    val cp = text.codePoints().toArray.filter(_ < 0x10000).map(_.toLong)
    val g = 72
    if (cp.length < g) return None
    val n = cp.length.toLong
    val sums = (0 until g).map { k =>
      val lo = (k * n / g).toInt; val hi = ((k + 1) * n / g).toInt
      (cp.slice(lo, hi).sum, (hi - lo).toLong)
    }
    var h = 0L
    for (i <- 0 until 64) {
      val base = (i / 8) * 9 + i % 8
      val (sl, cl) = sums(base); val (sr, cr) = sums(base + 1)
      if (sl * cr > sr * cl) h |= 1L << i
    }
    Some(h)
  }

  test("mediaPhash: exact dup at hamming 0; local edit flips the modeled bits") {
    import spark.implicits._
    val base = ('a' to 'z').mkString * 6 // 156 chars, well over the grid floor
    val edited = base.updated(10, 'Z').updated(11, 'Z') // one region bumped
    val docs = Seq((1L, base), (2L, base), (3L, edited), (4L, "short"))
      .toDF("doc_id", "text")
    val rows = ops.Multimodal.mediaPhash(docs, "doc_id", "text", 50).collect()
    val got = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
      (r.getAs[Int]("hamming"), r.getAs[Boolean]("is_near"))).toMap
    assert(got((1L, 2L)) == (0, true))
    // the edit's exact bit damage, from the independent model
    val wantH = java.lang.Long.bitCount(
      phashModel(base).get ^ phashModel(edited).get)
    assert(wantH > 0 && wantH <= 6, s"edit should flip a few bits, got $wantH")
    assert(got((1L, 3L)) == (wantH, true))
    assert(got((2L, 3L)) == (wantH, true))
    // sub-grid docs have no defined hash and never pair
    assert(!got.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("mediaPhash: astral code points are stripped before hashing") {
    import spark.implicits._
    val base = ('a' to 'z').mkString * 6
    val withEmoji = new StringBuilder(base).insert(40, "😀").toString
    val docs = Seq((1L, base), (2L, withEmoji)).toDF("doc_id", "text")
    val rows = ops.Multimodal.mediaPhash(docs, "doc_id", "text", 10).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Int]("hamming") == 0) // strip makes them equal
  }

  test("pixelDHash: planted gradients hit the exact all-ones/all-zeros hashes") {
    import ops.Multimodal.pixelDHash
    def png(f: Int => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(18, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 18) {
        val v = f(x); img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // strictly darkening left→right: every left cell out-shines its
    // right neighbor → all 64 bits set (hash -1); brightening → none
    assert(pixelDHash(png(x => 255 - x * 14), "png").contains(-1L))
    assert(pixelDHash(png(x => x * 14), "png").contains(0L))
    // identical content → identical hash through a real encode cycle
    assert(pixelDHash(png(x => (x * 37) % 256), "png") ==
      pixelDHash(png(x => (x * 37) % 256), "png"))
    // sub-grid images and non-images have no hash
    val tiny = new java.awt.image.BufferedImage(5, 5,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(tiny, "png", bos)
    assert(pixelDHash(bos.toByteArray, "png").isEmpty)
    assert(pixelDHash("not an image".getBytes, "unknown").isEmpty)
  }

  test("q_media_phash: bounded, ascending hamming, is_near consistent") {
    val rows = ops.Multimodal.mediaPhash(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val hs = rows.map(_.getAs[Int]("hamming"))
    assert(hs.toSeq == hs.sorted.toSeq)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Boolean]("is_near") == (r.getAs[Int]("hamming") <= 6))
    }
  }
}
