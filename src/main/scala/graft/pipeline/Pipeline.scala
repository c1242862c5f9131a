package graft.pipeline

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}
import java.util.concurrent.{Executors, ThreadFactory, TimeoutException}
import scala.concurrent.duration._
import scala.util.control.NonFatal
import scala.util.{Failure, Success, Try}

/** Cooperative per-batch cancellation signal handed to the processor —
  * the Scala analogue of the `context.Context` the reference passes to
  * `ProcessBatch` (`batch_processor.go:21-23,157-159`). Like Go's, it
  * is advisory: a processor that ignores it simply runs long, and the
  * timeout error is substituted after it returns.
  */
trait BatchContext {
  /** True once the per-batch deadline has passed. */
  def isExpired: Boolean
  /** Nanotime deadline for this batch. */
  def deadlineNanos: Long
}

object Pipeline {
  /** `DefaultTimeout` = 2147483647 ms ≈ 24.8 days — "effectively no
    * timeout" (`batch_processor.go:30`).
    */
  val DefaultTimeout: FiniteDuration = Int.MaxValue.toLong.millis

  def apply[T](maxConcurrentBatches: Int,
               supplier: () => Try[Seq[T]],
               processor: (BatchContext, Seq[T]) => Try[Seq[T]]): Pipeline[T] =
    new Pipeline[T](maxConcurrentBatches, supplier, processor,
      (_, _) => (), 1.second, DefaultTimeout)
}

/** Batch-pipeline facade reproducing the reference framework's entire
  * public surface and error policy (`batch_processor.go:1-194`; SURVEY.md
  * §2.1 rows 1-16, §2.2 error matrix, §7.4):
  *
  *  - poll a supplier for batches; a supplier error skips the batch
  *    with no retry (`:127-130`); an empty batch sleeps
  *    `noBatchSleep` and continues (`:131-136`)
  *  - fan non-empty batches to at most `maxConcurrentBatches`
  *    concurrent workers (`:115-145`); at-most-once: a failed batch is
  *    reported, never retried
  *  - per-batch timeout is cooperative: if the deadline passed and the
  *    processor still returned success, the timeout error is
  *    substituted before finalize (`:157-164`)
  *  - any throwable from the processor is caught (`recover()`,
  *    `:169-180`) and handed to the finalizer as `(None, Some(e))`
  *  - `stop()` blocks until in-flight workers drain (10 ms poll,
  *    `:86-97`); a batch fetched during shutdown is dropped
  *    unprocessed (`:137-140`); `start()` after `stop()` is a no-op
  *    (`:100-102`)
  *
  * Deliberate non-ports: the reference's 50 ms post-spawn sleep
  * (`:142-143`) patched a counter race — here the in-flight counter is
  * incremented synchronously before submit, so the race doesn't exist;
  * and the dispatcher parks 1 ms between sweeps instead of busy-
  * spinning when the pool is full.
  *
  * Spark usage: the processor closure runs on the driver and is free
  * to submit Spark jobs (`spark.read...` / DataFrame actions) per
  * batch; concurrent pipelines interleave via Spark's scheduler. Spark
  * task retries do NOT apply to the facade path — the processor runs
  * once per batch, preserving the reference's at-most-once policy
  * (SURVEY.md §2.1 row 14).
  */
final class Pipeline[T] private (
    val maxConcurrentBatches: Int,
    supplier: () => Try[Seq[T]],
    processor: (BatchContext, Seq[T]) => Try[Seq[T]],
    finalizer: (Option[Seq[T]], Option[Throwable]) => Unit,
    noBatchSleep: FiniteDuration,
    processorTimeout: FiniteDuration) {

  require(supplier != null, "invalid supplier")     // panic, batch_processor.go:45-47
  require(processor != null, "invalid processor")   // panic, batch_processor.go:48-50
  require(maxConcurrentBatches > 0, "maxConcurrentBatches must be positive")

  private val inFlight = new AtomicInteger(0)
  private val stopRequested = new AtomicBoolean(false)
  private val started = new AtomicBoolean(false)

  private lazy val workers = Executors.newCachedThreadPool(new ThreadFactory {
    def newThread(r: Runnable): Thread = {
      val t = new Thread(r, "graft-pipeline-worker"); t.setDaemon(true); t
    }
  })

  /** Fluent config, mirroring `WithFinalizer` (`batch_processor.go:63-66`). */
  def withFinalizer(f: (Option[Seq[T]], Option[Throwable]) => Unit): Pipeline[T] =
    new Pipeline(maxConcurrentBatches, supplier, processor, f, noBatchSleep, processorTimeout)

  /** Mirrors `WithNoBatchSleepIntervalInMilliseconds` (`batch_processor.go:69-72`). */
  def withNoBatchSleep(d: FiniteDuration): Pipeline[T] =
    new Pipeline(maxConcurrentBatches, supplier, processor, finalizer, d, processorTimeout)

  /** Mirrors `WithProcessorTimeout`: non-positive values reset to the
    * default (`batch_processor.go:74-83`).
    */
  def withProcessorTimeout(d: Duration): Pipeline[T] = {
    val eff = d match {
      case f: FiniteDuration if f > Duration.Zero => f
      case _ => Pipeline.DefaultTimeout
    }
    new Pipeline(maxConcurrentBatches, supplier, processor, finalizer, noBatchSleep, eff)
  }

  /** One dispatch sweep: fetch and dispatch up to the number of free
    * worker slots (`tryProcessBatch`, `batch_processor.go:115-145`).
    * Package-visible so behavioral tests can drive sweeps directly,
    * exactly as the reference's tests do.
    */
  private[graft] def tryProcessBatch(): Unit = {
    val available = maxConcurrentBatches - inFlight.get()
    var i = 0
    while (i < available) {
      if (stopRequested.get()) return
      supplier() match {
        case Failure(_) =>
          // supplier error: skip, no retry, keep sweeping (:127-130)
          ()
        case Success(batch) if batch == null || batch.isEmpty =>
          // empty source: back off, keep sweeping (:131-136)
          if (noBatchSleep > Duration.Zero) Thread.sleep(noBatchSleep.toMillis)
        case Success(batch) =>
          if (stopRequested.get()) return // fetched during shutdown → dropped (:137-140)
          inFlight.incrementAndGet()
          try workers.submit(new Runnable { def run(): Unit = runBatch(batch) })
          catch { case NonFatal(_) => inFlight.decrementAndGet() }
      }
      i += 1
    }
  }

  /** Worker body (`processBatchAsync` + `recoverIfNeeded`,
    * `batch_processor.go:147-180`).
    */
  private def runBatch(batch: Seq[T]): Unit = {
    val deadline = System.nanoTime() + processorTimeout.toNanos
    val ctx = new BatchContext {
      def isExpired: Boolean = System.nanoTime() > deadline
      def deadlineNanos: Long = deadline
    }
    try {
      val result =
        try processor(ctx, batch)
        catch { case NonFatal(e) => Failure(e) } // recover(): panic → error (:169-180)
      result match {
        case Success(processed) if ctx.isExpired =>
          // deadline passed but processor returned no error → substitute (:162-164)
          finalizeIfConfigured(Some(processed), Some(new TimeoutException("context canceled")))
        case Success(processed) =>
          finalizeIfConfigured(Some(processed), None)
        case Failure(e) =>
          finalizeIfConfigured(None, Some(e))
      }
    } finally inFlight.decrementAndGet()
  }

  private def finalizeIfConfigured(p: Option[Seq[T]], e: Option[Throwable]): Unit =
    if (finalizer != null) {
      try finalizer(p, e) catch { case NonFatal(_) => () }
    }

  /** Spawn the dispatcher loop (`Start`, `batch_processor.go:99-113`).
    * No-op once `stop()` has been requested (`:100-102`).
    */
  def start(): Unit = {
    if (stopRequested.get() || !started.compareAndSet(false, true)) return
    val dispatcher = new Thread("graft-pipeline-dispatcher") {
      override def run(): Unit =
        while (!stopRequested.get()) {
          tryProcessBatch()
          Thread.sleep(1) // park instead of the reference's hot spin
        }
    }
    dispatcher.setDaemon(true)
    dispatcher.start()
  }

  /** Graceful stop: no new dispatches; blocks until in-flight batches
    * finish (10 ms drain poll, `batch_processor.go:86-97`).
    */
  def stop(): Unit = {
    stopRequested.set(true)
    while (inFlight.get() > 0) Thread.sleep(10)
  }
}
