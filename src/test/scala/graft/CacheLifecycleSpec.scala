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
}
