package graft

import graft.sources.SupplierRegistry
import java.util.concurrent.atomic.AtomicInteger
import scala.util.{Failure, Success, Try}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 Supplier source must deliver every fetched batch exactly
  * once, skip supplier errors without advancing, and idle on empty
  * fetches — the reference's dispatcher semantics as a Spark source.
  */
class SupplierSourceSpec extends AnyFunSuite {
  import SparkTestSession._

  test("supplier batches flow through a distributed transform exactly once") {
    val n = new AtomicInteger(0)
    SupplierRegistry.register("s1", () => {
      val i = n.getAndIncrement()
      if (i < 3) Success(Seq(s"batch$i-a", s"batch$i-b"))
      else if (i == 3) Failure(new RuntimeException("fetch boom")) // skipped
      else Success(Seq.empty) // drained
    })
    val q = spark.readStream.format("graft.sources.SupplierSource")
      .option("supplierId", "s1").load()
      .select(upper(col("value")).as("v")) // distributed transform
      .writeStream.format("memory").queryName("supplier_out")
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 20000
      while (spark.table("supplier_out").count() < 6 &&
             System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        Thread.sleep(50)
      }
    } finally {
      q.stop()
      SupplierRegistry.unregister("s1")
    }
    val got = spark.table("supplier_out").collect().map(_.getString(0)).sorted
    assert(got.sameElements((0 until 3).flatMap(i =>
      Seq(s"BATCH$i-A", s"BATCH$i-B")).sorted), s"got: ${got.mkString(",")}")
  }

  test("unknown supplier id fails loudly") {
    val df = spark.readStream.format("graft.sources.SupplierSource")
      .option("supplierId", "nope").load()
    val e = intercept[Exception] {
      val q = df.writeStream.format("memory").queryName("nope_out").start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(e.getMessage.contains("invalid supplier") ||
      Option(e.getCause).exists(_.getMessage.contains("invalid supplier")))
  }
}
