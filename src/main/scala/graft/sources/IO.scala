package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** Source/sink surface of the engine.
  *
  * The reference framework's only ingestion/output primitives are the
  * abstract `Supplier`/`Finalizer` interfaces
  * (`batch_processor.go:16-18,26-28`) — it has no formats. This module
  * is the engine's concrete format surface, with 100 TB defaults baked
  * in:
  *
  *  - **Schemas are always explicit** for text formats. Inference
  *    (`inferSchema`) reads the data twice and samples nondeterministically
  *    — at scale that's both slow and wrong. Parquet/ORC carry their
  *    own schema.
  *  - **Readers are plain `spark.read`** → vectorized scans, predicate
  *    pushdown and column pruning arrive via Catalyst for free.
  *  - **Writers default to snappy/zstd splittable compression**,
  *    support `partitionBy` (partition pruning on read) and
  *    `maxRecordsPerFile` (bounds file size so a 1000-executor read
  *    parallelizes; one giant file is a scan bottleneck).
  */
object IO {

  // ---- readers ---------------------------------------------------------

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** CSV with an explicit schema — no inference pass. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .option("mode", "FAILFAST") // corrupt rows fail loudly, not silently null
      .csv(path)

  /** JSON-lines with an explicit schema — no inference pass. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .option("mode", "FAILFAST")
      .json(path)

  /** JSON-lines with a QUARANTINE channel. A 100 TB crawl ingest can
    * neither FAILFAST on one bad shard nor silently null-fill corrupt
    * lines; this reader returns (good, quarantined): every line parses
    * through `from_json` with an appended `_corrupt_record` column
    * (corrupt lines carry their raw text there, valid lines leave it
    * NULL), the good frame drops the marker, the quarantine frame
    * keeps the raw line for forensics, and its count is the ingest
    * alert metric. Built on `text` + `from_json` rather than the json
    * reader's PERMISSIVE mode because a frame selecting ONLY the
    * corrupt column is disallowed on raw json scans (the documented
    * restriction) — the text-source formulation has no such limit and
    * both branches stay scan-speed projections.
    */
  def readJsonlQuarantine(spark: SparkSession, path: String,
                          schema: StructType): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions._
    val withCorrupt = schema.add("_corrupt_record", StringType)
    val parsed = spark.read.text(path)
      .withColumn("parsed", from_json(col("value"), withCorrupt,
        Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
          "columnNameOfCorruptRecord" -> "_corrupt_record")))
    val good = parsed
      .filter(col("parsed._corrupt_record").isNull)
      .select(col("parsed.*")).drop("_corrupt_record")
    val quarantined = parsed
      .filter(col("parsed._corrupt_record").isNotNull)
      .select(col("value").as("raw_line"))
    (good, quarantined)
  }

  // ---- writers ---------------------------------------------------------

  /** Write configuration; defaults chosen for large-scale layouts. */
  final case class WriteConfig(
      format: String = "parquet",            // parquet | orc | csv | json
      compression: String = "snappy",        // splittable-friendly default
      partitionBy: Seq[String] = Nil,        // hive-style partition dirs
      maxRecordsPerFile: Long = 5000000L,    // bound file sizes for parallel reads
      mode: SaveMode = SaveMode.Overwrite,
      dynamicPartitionOverwrite: Boolean = false) // replace only touched partitions

  def write(df: DataFrame, path: String, cfg: WriteConfig = WriteConfig()): Unit = {
    var w = df.write
      .mode(cfg.mode)
      .option("compression", cfg.compression)
      .option("maxRecordsPerFile", cfg.maxRecordsPerFile)
    if (cfg.dynamicPartitionOverwrite)
      w = w.option("partitionOverwriteMode", "dynamic")
    if (cfg.partitionBy.nonEmpty) w = w.partitionBy(cfg.partitionBy: _*)
    if (cfg.format == "csv") w = w.option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    if (cfg.format == "json") w = w
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    w.format(cfg.format).save(path)
  }

  /** Streaming sink: write each micro-batch into a partitioned parquet
    * layout via `foreachBatch`, IDEMPOTENTLY — data is additionally
    * partitioned by `_batch_id` and written with dynamic partition
    * overwrite, so a replayed batch (crash between the write and the
    * checkpoint commit) overwrites its own partitions instead of
    * appending an indistinguishable duplicate copy. Delegates to
    * [[write]], inheriting the size-bounded files and compression the
    * batch writer guarantees; batch and streaming readers share one
    * table layout.
    */
  def streamToPartitioned(stream: DataFrame, path: String,
                          partitionBy: Seq[String],
                          checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        write(
          df.withColumn("_batch_id", org.apache.spark.sql.functions.lit(batchId)),
          path,
          WriteConfig(
            partitionBy = partitionBy :+ "_batch_id",
            mode = SaveMode.Overwrite,
            dynamicPartitionOverwrite = true))
      }
      .start()

  /** Z-order (Morton-curve) clustered parquet layout — the multi-column
    * analogue of a sorted layout (Delta/Iceberg `OPTIMIZE ZORDER BY`):
    * rows close in EVERY clustering dimension land in the same files,
    * so a multi-dimensional range predicate touches a handful of files
    * instead of all of them (parquet row-group min/max stats prune the
    * rest). A single-column sort clusters only its leading column; the
    * interleaved-bit curve gives every dimension locality.
    *
    * Mechanics: each clustering column is normalized to `bits`
    * equal-width buckets over its [min, max] (the 2-value-per-column
    * stats row is the only driver touch — fixed-size at any scale,
    * same pattern as the IVF centroid matrix), the bucket ids are
    * bit-interleaved into one z-value with pure codegen'd shift/mask
    * arithmetic, and the frame is range-partitioned + sorted on the
    * z-value. The helper column is dropped before the write; at 100 TB
    * the one range-exchange is paid once at layout time and amortized
    * over every downstream scan.
    */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                    targetPartitions: Int,
                    cfg: WriteConfig = WriteConfig()): Unit = {
    import org.apache.spark.sql.functions._
    require(zCols.size >= 2 && zCols.size <= 3,
      "z-ordering needs 2 or 3 clustering columns")
    require(targetPartitions >= 1, "targetPartitions must be positive")
    val n = zCols.size
    val bits = if (n == 2) 16 else 10
    val nBuckets = 1L << bits
    val aggs = zCols.map(c => min(col(c)).cast("double")) ++
      zCols.map(c => max(col(c)).cast("double"))
    val statsRow = df.agg(aggs.head, aggs.tail: _*).head()
    if (statsRow.anyNull) { write(df, path, cfg); return } // empty input: nothing to cluster
    val bounds: Map[String, (Double, Double)] = zCols.zipWithIndex.map {
      case (c, i) => c -> (statsRow.getDouble(i), statsRow.getDouble(i + n))
    }.toMap
    val normed = zCols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      val (lo, hi) = bounds(c)
      val bucket =
        if (hi > lo)
          expr(s"least(${nBuckets - 1}L, greatest(0L, " +
            s"width_bucket(CAST(`$c` AS DOUBLE), $lo, $hi, $nBuckets) - 1))")
        else lit(0L)
      d.withColumn(s"__zn$i", bucket)
    }
    val z = (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      (0 until n).foldLeft(acc) { (a, d) =>
        a.bitwiseOR(shiftleft(
          shiftright(col(s"__zn$d"), b).bitwiseAND(lit(1L)), b * n + d))
      }
    }
    val clustered = normed.withColumn("__z", z)
      .repartitionByRange(targetPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop((0 until n).map(i => s"__zn$i") :+ "__z": _*)
    write(clustered, path, cfg)
  }

  /** Small-file compaction — the operational fix for THE classic
    * degradation of long-lived table roots: thousands of tiny files
    * from incremental appends/streaming sinks turn every scan into a
    * task-scheduling storm and kill parquet footer caching. Rewrites
    * the layout into `ceil(bytes / targetFileBytes)` files via one
    * round-robin repartition (no key assumed, no skew possible) and
    * reports (files_before, files_after, bytes) so the caller can
    * alert on fragmentation. The rewrite lands in `outPath` — never
    * in place, so a failed compaction can't destroy the source.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetFileBytes: Long = 128L << 20,
              cfg: WriteConfig = WriteConfig()): (Long, Long, Long) = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    require(new java.net.URI(outPath).getPath != new java.net.URI(inPath).getPath,
      "compact: outPath must differ from inPath (never compact in place)")
    def dataFiles(p: String): Seq[java.io.File] = {
      val d = new java.io.File(new java.net.URI(p).getPath match {
        case "" => p
        case q  => q
      })
      Option(d.listFiles()).fold(Seq.empty[java.io.File])(_.toSeq)
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
    }
    val before = dataFiles(inPath)
    if (before.isEmpty) return (0L, 0L, 0L) // nothing to compact; no write
    val bytes = before.map(_.length()).sum
    val nOut = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.format(cfg.format).load(inPath)
    write(df.repartition(nOut), outPath, cfg)
    (before.length.toLong, dataFiles(outPath).length.toLong, bytes)
  }

  /** Bucketed + sorted managed table: rows co-located by key so
    * subsequent equi-joins and aggregations on the bucket key read
    * shuffle-free (`SortMergeJoin` with no `Exchange`). This is the
    * canonical 100 TB fact-table layout: pay one shuffle at write
    * time, amortize it over every downstream join.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    var w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.format("parquet").saveAsTable(table)
  }
}
