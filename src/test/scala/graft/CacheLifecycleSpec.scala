package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cache-lifecycle contract: ops that persist intermediates internally
  * must release them before returning — a user chaining dedup/ANN ops
  * over a 100 TB corpus must not leak executor storage memory one
  * op at a time (round-1 bench showed `CacheManager` re-cache warnings
  * from exactly this).
  */
class CacheLifecycleSpec extends AnyFunSuite {
  import SparkTestSession._

  test("dedup + similarity ops leave no retained SQL caches behind") {
    spark.catalog.clearCache()
    Seq[org.apache.spark.sql.DataFrame](
      ops.Dedup.dedupMinhash(spark, sfDir),
      ops.Dedup.nearDupClusters(spark, sfDir),
      ops.Dedup.dedupSimhash(spark, sfDir),
      ops.Dedup.dedupNgramJaccard(spark, sfDir),
      ops.Dedup.dedupEmbedding(spark, sfDir),
      ops.Similarity.knnBrute(spark, sfDir),
      ops.Similarity.annLsh(spark, sfDir),
      ops.Similarity.annIvf(spark, sfDir)
    ).foreach(_.write.format("noop").mode("overwrite").save())
    assert(spark.sharedState.cacheManager.isEmpty,
      "an op returned without unpersisting its internal cache")
  }

  test("releasePairs frees the memoized MinHash checkpoint blocks") {
    // materialize (and memoize) the shared verified-pair set
    ops.Dedup.dedupMinhash(spark, sfDir).write.format("noop").mode("overwrite").save()
    val ids = ops.Dedup.memoRddIds(spark, sfDir)
    assert(ids.nonEmpty, "memo recorded no checkpointed RDDs")
    val persisted = spark.sparkContext.getPersistentRDDs.keySet
    // intermediates among the tracked ids may already be gone — the
    // ContextCleaner frees checkpoints whose frames got GC'd; the
    // memoized final pair set itself MUST still be resident
    assert(ids.intersect(persisted).nonEmpty,
      s"no memo id among persisted RDDs $persisted — memo holds nothing")
    ops.Dedup.releasePairs(spark, sfDir)
    assert(ops.Dedup.memoRddIds(spark, sfDir).isEmpty, "memo entry not evicted")
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(ids.intersect(after).isEmpty,
      s"released RDD blocks still retained: ${ids.intersect(after)}")
  }
}
