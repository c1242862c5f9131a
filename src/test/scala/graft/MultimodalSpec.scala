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
