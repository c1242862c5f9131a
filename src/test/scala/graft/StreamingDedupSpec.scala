package graft

import graft.streaming.{StreamingDedup, TimedText}
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming near-dup ingest: batch parity across a micro-batch split,
  * cross-batch index hits, bucket-cap saturation semantics.
  */
class StreamingDedupSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  // 30 tokens; variants differ in the last token only → 3-gram Jaccard
  // 25/31 ≈ 0.806, above the 0.7 threshold
  private val base = (1 to 29).map(i => s"w$i").mkString(" ")
  private val d1 = s"$base endA"
  private val d2 = (100 to 129).map(i => s"x$i").mkString(" ") // unrelated
  private val d3 = s"$base endB"
  private val d4 = s"$base endC" // arrives in batch 2; near-dup of 1 and 3
  private val d5 = (200 to 229).map(i => s"y$i").mkString(" ") // unrelated

  test("stream/batch parity holds across a micro-batch split; cross-batch dups hit the index") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[TimedText]
    val q = StreamingDedup.nearDupIngest(in.toDF(), "doc_id", "text", tau = 0.7)
      .writeStream.format("memory").queryName("neardup").outputMode("append").start()
    in.addData(TimedText(1, ts(0), d1), TimedText(2, ts(1), d2), TimedText(3, ts(2), d3))
    q.processAllAvailable()
    in.addData(TimedText(4, ts(10), d4), TimedText(5, ts(11), d5))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("neardup").distinct()
      .select(col("matched_id").as("doc_a"), col("doc_id").as("doc_b"), col("jacc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // matched_id always arrived first → (a, b) is id-ordered
    assert(got.forall { case (a, b, _) => a < b }, s"hit direction broken: $got")
    // cross-batch: doc 4 (batch 2) must match docs 1 and 3 (batch 1)
    assert(got.exists { case (a, b, _) => a == 1L && b == 4L }, s"cross-batch hit missing: $got")
    // exact parity with the batch near-dup pair generator on the union corpus
    val corpus = Seq((1L, d1), (2L, d2), (3L, d3), (4L, d4), (5L, d5)).toDF("doc_id", "text")
    val batch = ops.Dedup.minhashVerifiedPairs(corpus, "doc_id", "text", materialize = true)
      .filter(col("jacc") >= 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == batch,
      s"stream hits != batch pairs\n stream: $got\n batch:  $batch")
  }

  test("saturated bucket stops indexing but keeps probing (cap semantics)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[TimedText]
    val q = StreamingDedup.nearDupIngest(in.toDF(), "doc_id", "text",
        tau = 0.7, maxBucket = 1)
      .writeStream.format("memory").queryName("neardup_cap").outputMode("append").start()
    in.addData(TimedText(1, ts(0), d1), TimedText(2, ts(1), d1), TimedText(3, ts(2), d1))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("neardup_cap").distinct()
      .select(col("matched_id"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // only doc 1 fits the capped bucket: 2 and 3 each match 1, but 3
    // can never match the unindexed 2
    assert(pairs == Set((1L, 2L), (1L, 3L)), s"cap semantics broken: $pairs")
  }

  test("checkpointed restart: bucket state recovers from the state store; pair set equals the uninterrupted run") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val cp = java.nio.file.Files.createTempDirectory("graft-ndi-cp").toString
    val out = java.nio.file.Files.createTempDirectory("graft-ndi-out").toString
    val in = MemoryStream[TimedText]
    def start() = StreamingDedup.nearDupIngest(in.toDF(), "doc_id", "text",
        tau = 0.7)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .outputMode("append").start()
    val q1 = start()
    in.addData(TimedText(1, ts(0), d1), TimedText(2, ts(1), d2), TimedText(3, ts(2), d3))
    q1.processAllAvailable()
    q1.stop() // kill between micro-batches
    // batch 2 arrives while the query is DOWN; the restarted query must
    // verify it against bucket state RECOVERED from the checkpoint
    in.addData(TimedText(4, ts(10), d4), TimedText(5, ts(11), d5))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out).distinct()
      .select(col("matched_id"), col("doc_id"), col("jacc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the cross-RESTART hits are the state-recovery proof: doc 4 must
    // match docs 1 and 3, which live only in pre-restart bucket state
    assert(got.exists { case (a, b, _) => a == 1L && b == 4L },
      s"cross-restart hit (1,4) missing — state not recovered: $got")
    assert(got.exists { case (a, b, _) => a == 3L && b == 4L },
      s"cross-restart hit (3,4) missing — state not recovered: $got")
    // exact parity with the batch pair generator = parity with the
    // uninterrupted stream (the first test pins stream==batch)
    val corpus = Seq((1L, d1), (2L, d2), (3L, d3), (4L, d4), (5L, d5)).toDF("doc_id", "text")
    val batch = ops.Dedup.minhashVerifiedPairs(corpus, "doc_id", "text", materialize = true)
      .filter(col("jacc") >= 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == batch,
      s"restarted stream != batch pairs\n stream: $got\n batch:  $batch")
  }

  test("checkpointed restart with idle eviction: segment semantics survive the restart") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val cp = java.nio.file.Files.createTempDirectory("graft-ndiev-cp").toString
    val out = java.nio.file.Files.createTempDirectory("graft-ndiev-out").toString
    val dz1 = (300 to 329).map(i => s"z$i").mkString(" ")
    val dz2 = (400 to 429).map(i => s"q$i").mkString(" ")
    val in = MemoryStream[TimedText]
    def start() = StreamingDedup.nearDupIngest(in.toDF(), "doc_id", "text",
        "ts", "1 minute", idleRetentionMs = 10L * 60000L,
        tau = 0.7, maxBucket = 100)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .outputMode("append").start()
    val q1 = start()
    in.addData(TimedText(1, ts(0), d1))    // indexes d1's buckets
    q1.processAllAvailable()
    q1.stop() // restart in the middle of the retention horizon
    in.addData(TimedText(80, ts(30), dz1)) // wm -> past d1's horizon
    val q2 = start()
    q2.processAllAvailable()
    in.addData(TimedText(81, ts(31), dz2)) // fires d1's recovered timeout
    q2.processAllAvailable()
    in.addData(TimedText(4, ts(32), d4))   // post-gap: new first member
    q2.processAllAvailable()
    in.addData(TimedText(5, ts(33), d3))   // near-dup of both 1 and 4
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out).distinct()
      .select(col("matched_id"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical to the uninterrupted eviction test: pre-gap state was
    // recovered AND then evicted on schedule; post-gap segment matches
    // within itself only
    assert(got == Set((4L, 5L)),
      s"restarted eviction semantics diverged, got $got")
  }

  test("idle-retention eviction forgets quiet buckets; the index restarts per segment") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dz1 = (300 to 329).map(i => s"z$i").mkString(" ") // watermark traffic
    val dz2 = (400 to 429).map(i => s"q$i").mkString(" ")
    val in = MemoryStream[TimedText]
    // 1-minute watermark delay, 10-minute retention horizon
    val q = StreamingDedup.nearDupIngest(in.toDF(), "doc_id", "text",
        "ts", "1 minute", idleRetentionMs = 10L * 60000L,
        tau = 0.7, maxBucket = 100)
      .writeStream.format("memory").queryName("neardup_evict")
      .outputMode("append").start()
    in.addData(TimedText(1, ts(0), d1))      // indexes d1's buckets
    q.processAllAvailable()
    in.addData(TimedText(80, ts(30), dz1))   // wm -> 10:29 (> 10:00+10min)
    q.processAllAvailable()
    in.addData(TimedText(81, ts(31), dz2))   // trigger fires d1's timeout
    q.processAllAvailable()
    // doc 1 is forgotten: its near-dup arriving after the quiet gap is
    // NOT flagged and becomes the segment's new first member
    in.addData(TimedText(4, ts(32), d4))
    q.processAllAvailable()
    in.addData(TimedText(5, ts(33), d3))     // near-dup of both 1 and 4
    q.processAllAvailable()
    q.stop()
    val got = spark.table("neardup_evict").distinct()
      .select(col("matched_id"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!got.exists(_._1 == 1L),
      s"evicted doc 1 must be forgotten, got $got")
    assert(got == Set((4L, 5L)),
      s"post-gap segment must match within itself only, got $got")
  }
}
