package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated test tables
  * (schemas documented in /root/repo/FIXTURES.md §2).
  *
  * All engine queries read through here so scan behavior is uniform:
  * plain `spark.read.parquet` gives vectorized reads with predicate
  * pushdown and column pruning for free. At 100 TB these would be
  * partitioned/bucketed table roots; the API is path-based so the
  * same code serves both.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  /** events.ts has shipped as parquet TIMESTAMP(NANOS) in some data
    * drops (which Spark's reader rejects by default —
    * PARQUET_TYPE_ILLEGAL) and as plain TIMESTAMP(MICROS) in others, so
    * normalize whatever is on disk to one caller-visible µs
    * TimestampType column:
    *  - NANOS: read as epoch-nano longs (`nanosAsLong`) and rebuild via
    *    floor division — matches DuckDB's ns→µs truncation;
    *  - MICROS without UTC adjustment: Spark infers TIMESTAMP_NTZ; the
    *    session runs in UTC (GraftSession), so the cast to TimestampType
    *    re-labels the same wall-clock instant losslessly.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(
            org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
