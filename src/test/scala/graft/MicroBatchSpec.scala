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
