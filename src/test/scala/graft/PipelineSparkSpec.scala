package graft

import graft.pipeline.Pipeline
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.mutable
import scala.concurrent.duration._
import scala.util.{Success, Try}
import org.scalatest.funsuite.AnyFunSuite

/** Integration: the pipeline facade driving real Spark jobs per batch —
  * the supplier yields key ranges, the processor runs a distributed
  * DataFrame aggregation for each, the finalizer collects results.
  * This is the reference's intended usage pattern with Spark as the
  * per-batch execution engine.
  */
class PipelineSparkSpec extends AnyFunSuite {
  import SparkTestSession._

  test("facade batches drive distributed DataFrame jobs to completion") {
    val orders = Tables.orders(spark, sfDir).cache()
    orders.count()
    val ranges = Iterator(Seq(0L), Seq(1L), Seq(2L)) ++ Iterator.continually(Seq.empty[Long])
    val results = mutable.Map.empty[Long, Long]
    val done = new AtomicInteger(0)
    val p = Pipeline[Long](2,
      () => Try(ranges.synchronized(ranges.next())),
      (_, batch) => Success(batch.map { bucket =>
        // a genuine distributed job per batch
        orders.filter(orders("o_custkey") % 3 === bucket).count()
      }))
      .withFinalizer((res, err) => {
        assert(err.isEmpty)
        res.foreach(counts => results.synchronized {
          counts.foreach(c => results(done.get().toLong) = c)
        })
        done.incrementAndGet()
      })
      .withNoBatchSleep(10.millis)
    p.start()
    val deadline = System.currentTimeMillis() + 30000
    while (done.get() < 3 && System.currentTimeMillis() < deadline) Thread.sleep(20)
    p.stop()
    assert(done.get() >= 3, s"only ${done.get()} batches finalized")
    // the three modulo buckets partition the table
    val total = orders.count()
    val sum = (0L until 3L).map(b =>
      orders.filter(orders("o_custkey") % 3 === b).count()).sum
    assert(sum == total)
  }
}
