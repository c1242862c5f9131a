package graft

import graft.streaming.MicroBatch
import java.util.concurrent.atomic.AtomicInteger
import scala.concurrent.duration._
import scala.util.{Failure, Success}
import org.scalatest.funsuite.AnyFunSuite

/** Streaming half of the reference mapping: micro-batches arrive at
  * the processor, failures reach the finalizer without killing the
  * query, and stop() drains gracefully.
  */
class MicroBatchSpec extends AnyFunSuite {
  import SparkTestSession._

  test("rate stream: batches process, finalizer fires, graceful stop drains") {
    val batches = new AtomicInteger(0)
    val rows = new AtomicInteger(0)
    val q = MicroBatch.start(
      spark.readStream.format("rate").option("rowsPerSecond", "50").load(),
      processor = (_, df) => Success(df.selectExpr("value * 2 AS doubled")),
      finalizer = (p, e) => {
        assert(e.isEmpty)
        p.foreach(df => rows.addAndGet(df.count().toInt))
        batches.incrementAndGet()
      },
      pollInterval = 100.millis)
    val deadline = System.currentTimeMillis() + 15000
    while (batches.get() < 2 && System.currentTimeMillis() < deadline) Thread.sleep(50)
    MicroBatch.stopGracefully(q)
    assert(batches.get() >= 2, "expected at least two micro-batches")
    assert(!q.isActive)
  }

  test("curation quality filter composes into the streaming bridge: per-batch == whole-batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sq = spark.sqlContext
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val seen = new AtomicInteger(0)
    val kept = new AtomicInteger(0)
    val q = MicroBatch.start(
      in.toDF().toDF("doc_id", "text"),
      // the batch-mode curation op runs unchanged on each micro-batch
      // (foreachBatch hands the processor a plain batch DataFrame)
      processor = (_, df) => Success(ops.Curation.qualityFilter(df, "doc_id", "text")),
      finalizer = (p, e) => {
        assert(e.isEmpty, s"quality filter failed in-stream: $e")
        p.foreach { df =>
          // ONE action per batch, and `seen` updated last: the test
          // stops the query once seen reaches the corpus size, so any
          // work after the seen update would race the shutdown
          val agg = df.agg(
            org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
            org.apache.spark.sql.functions.sum(col("keep"))).head()
          kept.addAndGet(agg.getLong(1).toInt)
          seen.addAndGet(agg.getLong(0).toInt)
        }
      },
      pollInterval = 100.millis)
    in.addData(docs.take(docs.size / 2))
    in.addData(docs.drop(docs.size / 2))
    val deadline = System.currentTimeMillis() + 30000
    while (seen.get() < docs.size && System.currentTimeMillis() < deadline) Thread.sleep(50)
    MicroBatch.stopGracefully(q)
    assert(seen.get() == docs.size, s"streamed ${seen.get()} of ${docs.size} docs")
    // row-local op ⇒ splitting the corpus across micro-batches cannot
    // change any verdict: streamed keep-count equals the batch run's
    val batchKept = ops.Curation.qualityFilter(spark, sfDir)
      .filter(col("keep") === 1).count()
    assert(kept.get() == batchKept)
  }

  test("processor failure reaches the finalizer and the stream continues") {
    val errs = new AtomicInteger(0)
    val oks = new AtomicInteger(0)
    val n = new AtomicInteger(0)
    val q = MicroBatch.start(
      spark.readStream.format("rate").option("rowsPerSecond", "50").load(),
      processor = (_, df) =>
        if (n.getAndIncrement() == 0) Failure(new RuntimeException("batch boom"))
        else Success(df),
      finalizer = (_, e) => if (e.isDefined) errs.incrementAndGet() else oks.incrementAndGet(),
      pollInterval = 100.millis)
    val deadline = System.currentTimeMillis() + 15000
    while ((errs.get() < 1 || oks.get() < 1) && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    MicroBatch.stopGracefully(q)
    assert(errs.get() >= 1, "processor failure never reached the finalizer")
    assert(oks.get() >= 1, "stream did not continue after a batch failure")
  }
}
