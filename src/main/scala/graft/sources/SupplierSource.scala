package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.collection.concurrent.TrieMap
import scala.collection.mutable
import scala.util.{Failure, Success, Try}

/** Driver-side registry binding supplier ids to pull closures — the
  * DSv2 analogue of handing a `Supplier[T]` to the constructor
  * (`batch_processor.go:16-18,43-47`). Closures live on the driver
  * only; fetched rows are shipped to executors inside the planned
  * input partitions.
  */
object SupplierRegistry {
  private val suppliers = TrieMap.empty[String, () => Try[Seq[String]]]
  def register(id: String, s: () => Try[Seq[String]]): Unit = suppliers.put(id, s)
  def unregister(id: String): Unit = suppliers.remove(id)
  private[sources] def get(id: String): () => Try[Seq[String]] =
    suppliers.getOrElse(id, throw new IllegalArgumentException(s"invalid supplier: $id"))
}

/** A pull-`Supplier`-backed Structured Streaming source (DataSource
  * V2 `MicroBatchStream`) — the reference's ingestion primitive as a
  * first-class Spark source, completing the mapping in SURVEY.md §2.1
  * row 2.
  *
  * Semantics preserved from the reference's dispatcher loop:
  *  - the supplier is polled serially ON THE DRIVER (`latestOffset`),
  *    exactly like `FetchNextBatch` on the dispatcher thread
  *    (`batch_processor.go:126`); downstream processing of the batch
  *    is distributed
  *  - a supplier error skips that poll — the offset does not advance,
  *    no retry, the stream continues (`batch_processor.go:127-130`)
  *  - an empty fetch does not advance the offset, so the trigger
  *    idles — the `noBatchSleepInterval` backoff (`:131-136`) is the
  *    trigger interval
  *  - committed batches are evicted from the driver buffer (`commit`)
  *
  * Usage:
  * {{{
  *   SupplierRegistry.register("mysrc", () => Try(nextRows()))
  *   spark.readStream.format("graft.sources.SupplierSource")
  *     .option("supplierId", "mysrc").load()   // schema: value STRING
  * }}}
  */
class SupplierSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SupplierSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SupplierTable(properties.get("supplierId"))
}

object SupplierSource {
  val schema: StructType = StructType(Seq(StructField("value", StringType)))
}

private class SupplierTable(supplierId: String) extends Table with SupportsRead {
  require(supplierId != null, "option supplierId is required")
  override def name(): String = s"supplier($supplierId)"
  override def schema(): StructType = SupplierSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new SupplierScan(supplierId)
    }
}

private class SupplierScan(supplierId: String) extends Scan {
  override def readSchema(): StructType = SupplierSource.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SupplierMicroBatchStream(supplierId)
}

/** Offset = count of batches fetched so far. */
private case class CounterOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private class SupplierMicroBatchStream(supplierId: String) extends MicroBatchStream {
  private val supplier = SupplierRegistry.get(supplierId)
  // batch index -> rows, buffered on the driver until committed
  private val buffered = mutable.LinkedHashMap.empty[Long, Seq[String]]
  private var fetched = 0L

  override def initialOffset(): Offset = CounterOffset(0L)

  override def latestOffset(): Offset = synchronized {
    supplier() match {
      case Success(batch) if batch != null && batch.nonEmpty =>
        buffered.put(fetched, batch)
        fetched += 1
      case Success(_) => () // empty: offset unchanged, trigger idles (:131-136)
      case Failure(_) => () // supplier error: skip, no retry (:127-130)
    }
    CounterOffset(fetched)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    synchronized {
      val s = start.asInstanceOf[CounterOffset].n
      val e = end.asInstanceOf[CounterOffset].n
      (s until e).flatMap(buffered.get).map(rows =>
        SupplierPartition(rows.toArray): InputPartition).toArray
    }

  override def createReaderFactory(): PartitionReaderFactory = SupplierReaderFactory

  /** Called on recovery with offsets from the checkpoint log. The
    * supplier is a non-replayable pull source (like the reference's,
    * which drops unprocessed batches on shutdown —
    * `batch_processor.go:137-140`), so batches fetched before a crash
    * but not committed are lost: at-most-once across restarts. What
    * this MUST do is advance the fetch counter past the recovered
    * offset — otherwise post-restart offsets would regress below the
    * committed watermark and every new batch would be evicted
    * unplanned.
    */
  override def deserializeOffset(json: String): Offset = synchronized {
    val n = json.toLong
    if (n > fetched) fetched = n
    CounterOffset(n)
  }

  override def commit(end: Offset): Unit = synchronized {
    val upTo = end.asInstanceOf[CounterOffset].n
    buffered.keys.filter(_ < upTo).toSeq.foreach(buffered.remove)
  }

  override def stop(): Unit = ()
}

/** Rows travel inside the partition descriptor (driver → executor). */
private case class SupplierPartition(rows: Array[String]) extends InputPartition

private object SupplierReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[SupplierPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(rows(i)))
      override def close(): Unit = ()
    }
  }
}
