package graft

import graft.sources.IO
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip + layout invariants for the source/sink surface. */
class IOSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-io-$name").resolve("data").toString

  private lazy val orders = Tables.orders(spark, sfDir)

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.exceptAll(b).count() == 0)
    assert(b.exceptAll(a).count() == 0)
  }

  test("parquet round-trip preserves rows") {
    val p = tmp("parquet")
    IO.write(orders, p)
    assertSameRows(orders, IO.readParquet(spark, p))
  }

  test("orc round-trip preserves rows") {
    val p = tmp("orc")
    IO.write(orders, p, IO.WriteConfig(format = "orc"))
    assertSameRows(orders, IO.readOrc(spark, p))
  }

  test("csv round-trip with explicit schema preserves rows incl. timestamps") {
    val p = tmp("csv")
    IO.write(orders, p, IO.WriteConfig(format = "csv", compression = "none"))
    assertSameRows(orders, IO.readCsv(spark, p, orders.schema))
  }

  test("jsonl round-trip with explicit schema preserves rows") {
    val p = tmp("json")
    IO.write(orders, p, IO.WriteConfig(format = "json", compression = "none"))
    assertSameRows(orders, IO.readJsonl(spark, p, orders.schema))
  }

  test("jsonl quarantine splits corrupt lines without dropping or nulling") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-io-quarantine")
    val f = dir.resolve("in.jsonl")
    Files.write(f, java.util.Arrays.asList(
      """{"id": 1, "name": "ok-one"}""",
      """{"id": 2 "name": "missing-comma"}""",
      """{"id": 3, "name": "ok-two"}""",
      """not json at all""",
      """{"id": 5, "name": null}"""))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val (good, bad) = IO.readJsonlQuarantine(spark, f.toString, schema)
    val g = good.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(g == Map(1L -> "ok-one", 3L -> "ok-two", 5L -> null),
      s"good side wrong: $g — a legit null field must NOT quarantine")
    assert(good.columns.toSeq == Seq("id", "name"), "marker column must not leak")
    val q = bad.collect().map(_.getString(0)).toSet
    assert(q == Set("""{"id": 2 "name": "missing-comma"}""", "not json at all"),
      s"quarantine wrong: $q")
  }

  test("partitioned write lays out hive-style dirs and reads back whole") {
    val p = tmp("part")
    val df = orders.withColumn("o_year", year(col("o_orderdate")))
    IO.write(df, p, IO.WriteConfig(partitionBy = Seq("o_year")))
    val dirs = new java.io.File(p).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("o_year=")))
    // partition filter prunes at planning: only one partition dir scanned
    val back = IO.readParquet(spark, p)
    assert(back.count() == orders.count())
    val pruned = back.filter(col("o_year") === 1995)
    assert(pruned.count() == df.filter(col("o_year") === 1995).count())
    // the filter must become a PARTITION filter (directory-level pruning —
    // at 100 TB the difference between listing one partition and reading
    // the table), not a post-scan data filter
    val plan = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("PartitionFilters: \\[[^\\]]*o_year[^\\]]*1995".r.findFirstIn(plan).isDefined,
      s"o_year=1995 did not prune partitions:\n$plan")
  }

  test("streaming sink writes partitioned parquet a batch reader can consume") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val out = tmp("streamsink")
    val ckpt = tmp("streamckpt")
    val q = IO.streamToPartitioned(
      in.toDF().toDF("k", "v"), out, Seq("k"), ckpt)
    in.addData(("a", 1L), ("b", 2L))
    q.processAllAvailable()
    in.addData(("a", 3L))
    q.processAllAvailable()
    q.stop()
    val back = IO.readParquet(spark, out)
    assert(back.count() == 3)
    // hive-style partition dirs by k; batch ids recorded
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.sameElements(Array("k=a", "k=b")))
    assert(back.select("_batch_id").distinct().count() == 2)
  }

  test("compaction collapses a fragmented layout without changing the data") {
    val in = tmp("compact-in"); val out = tmp("compact-out")
    val df = Tables.lineitem(spark, sfDir)
    df.repartition(40).write.parquet(in) // fragmented: 40 tiny files
    val (before, after, bytes) = IO.compact(spark, in, out,
      targetFileBytes = 512L << 20)
    assert(before >= 40 && after == 1 && bytes > 0,
      s"expected 40+ -> 1 files, got $before -> $after")
    assert(spark.read.parquet(out).count() == df.count())
    // identical content, not just identical counts
    assert(spark.read.parquet(out).exceptAll(df).isEmpty &&
      df.exceptAll(spark.read.parquet(out)).isEmpty)
    // in-place compaction is refused
    intercept[IllegalArgumentException] { IO.compact(spark, in, in) }
  }

  test("bucketed tables join without any shuffle exchange") {
    Seq("orders_b", "customer_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    IO.writeBucketed(orders, "orders_b", 4, Seq("o_custkey"), Seq("o_custkey"))
    IO.writeBucketed(Tables.customer(spark, sfDir), "customer_b", 4, Seq("c_custkey"), Seq("c_custkey"))
    val joined = spark.sql(
      """SELECT /*+ MERGE(orders_b) */ o_orderkey, c_mktsegment
        |FROM orders_b JOIN customer_b ON o_custkey = c_custkey""".stripMargin)
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
  }

  test("persisted ANN index: stored-index reads are byte-identical; memo hydrates from it") {
    for (t <- Seq("annx_sig", "annx_ivf", "annx_ivf_centroids")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    ops.Similarity.writeAnnIndex(spark, sfDir, "annx")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    // LSH: stored signatures feed the same plan -> identical rows
    val lshMem = rows(ops.Similarity.annLsh(spark, sfDir))
    val lshIdx = rows(ops.Similarity.annLshFromIndex(spark, "annx",
      col("vec_id") < 10, 5))
    assert(lshIdx == lshMem, "annLsh from stored index diverged")
    // IVF: stored centroids + assignments reproduce the in-session op
    val ivfMem = rows(ops.Similarity.annIvf(spark, sfDir))
    val ivfIdx = rows(ops.Similarity.annIvfFromIndex(spark, "annx",
      col("vec_id") < 10))
    assert(ivfIdx == ivfMem, "annIvf from stored index diverged")
    // the stored assignment table IS bucketed (the probe join's key)
    val scan = spark.table("annx_ivf").queryExecution.sparkPlan.toString
    assert(scan.contains("Bucketed: true")
      || spark.sql("DESCRIBE EXTENDED annx_ivf").collect()
          .exists(_.toString.contains("Bucket")),
      s"index table not bucketed:\n$scan")
    // memo hydration: releases then re-serves from the stored table
    ops.Similarity.releaseSigned(spark, sfDir)
    assert(ops.Similarity.signedMemoRddIds(spark, sfDir).isEmpty)
    ops.Similarity.hydrateSigned(spark, sfDir, "annx")
    assert(ops.Similarity.signedMemoRddIds(spark, sfDir).nonEmpty,
      "hydration must populate the signed-corpus memo")
    assert(rows(ops.Similarity.annLsh(spark, sfDir)) == lshMem,
      "annLsh over the hydrated memo diverged")
    ops.Similarity.releaseSigned(spark, sfDir)
  }

  test("ann index staleness guard: rewritten corpus fails loudly; rebuilt index serves again") {
    import java.nio.file.{Files => JFiles, Paths, StandardCopyOption}
    for (t <- Seq("stale_sig", "stale_ivf", "stale_ivf_centroids", "stale_meta"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
    // a corpus we are allowed to rewrite: copy the fixture parquet
    val dir = Files.createTempDirectory("graft-stale").toString
    JFiles.copy(Paths.get(s"$sfDir/embeddings.parquet"),
      Paths.get(s"$dir/embeddings.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    ops.Similarity.writeAnnIndex(spark, dir, "stale")
    // fresh index: checked readers serve, byte-identical to unchecked
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val unchecked = rows(ops.Similarity.annLshFromIndex(spark, "stale",
      col("vec_id") < 10, 5))
    assert(rows(ops.Similarity.annLshFromIndex(spark, dir, "stale",
      col("vec_id") < 10, 5)) == unchecked)
    assert(rows(ops.Similarity.annIvfFromIndex(spark, dir, "stale",
      col("vec_id") < 10, 4, 5)) ==
      rows(ops.Similarity.annIvfFromIndex(spark, "stale", col("vec_id") < 10)))
    // REWRITE the corpus (new part file -> new data version)
    Tables.embeddings(spark, sfDir).limit(100)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def stale(body: => Any): Unit = {
      val e = intercept[IllegalArgumentException](body)
      assert(e.getMessage.contains("STALE")
        && e.getMessage.contains("writeAnnIndex"), e.getMessage)
    }
    stale(ops.Similarity.annLshFromIndex(spark, dir, "stale",
      col("vec_id") < 10, 5))
    stale(ops.Similarity.annIvfFromIndex(spark, dir, "stale",
      col("vec_id") < 10, 4, 5))
    stale(ops.Similarity.hydrateSigned(spark, dir, "stale"))
    // the force escape still serves the frozen bytes
    assert(rows(ops.Similarity.annLshFromIndex(spark, "stale",
      col("vec_id") < 10, 5)) == unchecked)
    ops.Similarity.hydrateSigned(spark, dir, "stale", force = true)
    ops.Similarity.releaseSigned(spark, dir)
    // a missing stamp is its own loud failure
    spark.sql("DROP TABLE stale_meta")
    val miss = intercept[IllegalArgumentException] {
      ops.Similarity.annLshFromIndex(spark, dir, "stale", col("vec_id") < 10, 5)
    }
    assert(miss.getMessage.contains("no freshness stamp"), miss.getMessage)
    // rebuild against the rewritten corpus: checked read serves again
    ops.Similarity.writeAnnIndex(spark, dir, "stale")
    val rebuilt = rows(ops.Similarity.annLshFromIndex(spark, dir, "stale",
      col("vec_id") < 10, 5))
    assert(rebuilt.nonEmpty)
  }

  test("annLshIndexed: builds the dir-keyed index once, serves rows byte-identical to annLsh") {
    val hex = java.lang.Integer.toHexString(sfDir.hashCode)
    for (suffix <- Seq("sig", "ivf", "ivf_centroids", "meta"))
      spark.sql(s"DROP TABLE IF EXISTS graft_annidx_${hex}_$suffix")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val viaIndex = rows(ops.Similarity.annLshIndexed(spark, sfDir))
    assert(viaIndex == rows(ops.Similarity.annLsh(spark, sfDir)),
      "indexed path diverged from annLsh")
    // second call reuses the stored index (stamp fresh, no rebuild):
    // the meta table's write time must not change
    val metaT = s"graft_annidx_${hex}_meta"
    val v1 = spark.table(metaT).head().getString(1)
    assert(rows(ops.Similarity.annLshIndexed(spark, sfDir)) == viaIndex)
    assert(spark.table(metaT).head().getString(1) == v1)
  }

  test("z-ordered layout clusters 2-D range predicates into fewer files") {
    val events = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "value")
    val plain = tmp("zplain"); val zed = tmp("zorder")
    events.repartition(8).write.parquet(plain) // hash-scattered control layout
    IO.writeZOrdered(events, zed, Seq("user_id", "value"), 8)
    assertSameRows(events, IO.readParquet(spark, zed)) // clustering loses nothing
    // 2-D range selection: matching rows should live in few z-files but
    // be scattered across (nearly) all control files
    def touched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("user_id").between(2, 4) && col("value") < 40.0)
        .select(input_file_name()).distinct().count()
    val (tz, tp) = (touched(zed), touched(plain))
    info(s"files touched: z-ordered $tz vs plain $tp")
    assert(tz * 2 <= tp, s"z-order layout gave no file locality: $tz vs $tp")
    // empty input degrades to a plain write, not a failure
    val emptyPath = tmp("zempty")
    IO.writeZOrdered(events.limit(0), emptyPath, Seq("user_id", "value"), 4)
    assert(IO.readParquet(spark, emptyPath).count() == 0)
  }
}
