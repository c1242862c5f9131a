package graft.streaming

import graft.pipeline.{BatchContext, Pipeline}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import java.util.concurrent.TimeoutException
import scala.concurrent.duration._
import scala.util.control.NonFatal
import scala.util.{Failure, Success, Try}

/** Structured-Streaming realization of the reference's polling pipeline
  * (SURVEY.md §2.1): the micro-batch engine IS the dispatcher loop —
  * `Trigger.ProcessingTime` is the poll clock (`FetchNextBatch` +
  * empty-fetch backoff, `batch_processor.go:104-112,131-136`),
  * `foreachBatch` is the processor+finalizer seam, and
  * `query.stop()` + `awaitTermination` is the graceful drain
  * (`batch_processor.go:86-97`).
  *
  * Error policy matches the reference (at-most-once): a processor
  * failure is reported to the finalizer and the STREAM CONTINUES with
  * the next trigger — the batch is not retried, the query is not
  * failed. Timeout is elapsed-substitution, identical to
  * [[graft.pipeline.Pipeline]].
  */
object MicroBatch {

  /** Start a micro-batch pipeline over a streaming DataFrame.
    *
    * @param stream    a streaming DataFrame (`spark.readStream...`)
    * @param processor per-batch transform; runs on the driver, free to
    *                  use the full DataFrame API (distributed execution)
    * @param finalizer receives (processed batch, error) per trigger —
    *                  the `OnBatchProcessed` hook (`batch_processor.go:26-28`)
    * @param pollInterval trigger period ↔ `noBatchSleepInterval`
    * @param processorTimeout per-batch deadline; non-positive → default
    * @param availableNow drain-the-source-then-stop mode (the
    *                     reference's "source exhausted" shutdown path)
    * @param checkpoint  checkpoint directory for restartable pipelines:
    *                    a restarted query resumes from the write-ahead
    *                    log and never re-delivers a COMMITTED batch —
    *                    recovery the reference's at-most-once loop
    *                    cannot offer (it drops in-flight work on stop,
    *                    `batch_processor.go:137-140`). An UNCOMMITTED
    *                    in-flight batch (failure after the finalizer's
    *                    side effects, before the commit log write) IS
    *                    re-executed on restart, so finalizer side
    *                    effects are at-least-once and should be
    *                    idempotent (keyed upsert / overwrite-by-batch),
    *                    not blind appends
    */
  def start(
      stream: DataFrame,
      processor: (BatchContext, DataFrame) => Try[DataFrame],
      finalizer: (Option[DataFrame], Option[Throwable]) => Unit = (_, _) => (),
      pollInterval: FiniteDuration = 1.second,
      processorTimeout: Duration = Pipeline.DefaultTimeout,
      availableNow: Boolean = false,
      checkpoint: Option[String] = None): StreamingQuery = {
    require(processor != null, "invalid processor")
    val timeout = processorTimeout match {
      case f: FiniteDuration if f > Duration.Zero => f
      case _ => Pipeline.DefaultTimeout
    }
    val trigger =
      if (availableNow) Trigger.AvailableNow()
      else Trigger.ProcessingTime(pollInterval.toMillis)
    val base = stream.writeStream
      .queryName("graft-micro-batch")
      .trigger(trigger)
    checkpoint.foreach(base.option("checkpointLocation", _))
    base
      .foreachBatch { (df: DataFrame, _: Long) =>
        val deadline = System.nanoTime() + timeout.toNanos
        val ctx = new BatchContext {
          def isExpired: Boolean = System.nanoTime() > deadline
          def deadlineNanos: Long = deadline
        }
        val result =
          try processor(ctx, df)
          catch { case NonFatal(e) => Failure(e) }
        result match {
          case Success(out) if ctx.isExpired =>
            safeFinalize(finalizer, Some(out), Some(new TimeoutException("context canceled")))
          case Success(out) => safeFinalize(finalizer, Some(out), None)
          case Failure(e)   => safeFinalize(finalizer, None, Some(e))
        }
      }
      .start()
  }

  private def safeFinalize(
      f: (Option[DataFrame], Option[Throwable]) => Unit,
      p: Option[DataFrame], e: Option[Throwable]): Unit =
    try f(p, e) catch { case NonFatal(_) => () }

  /** Graceful drain: the in-flight micro-batch completes before stop
    * returns (`Stop()`'s busy-wait join, `batch_processor.go:86-97`).
    */
  def stopGracefully(query: StreamingQuery): Unit = {
    query.stop()
    query.awaitTermination()
  }
}
