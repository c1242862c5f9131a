package graft.ops

import graft.Tables
import graft.functions.TopK
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Operational diagnostics for running this engine at scale. The
  * reference (`/root/reference/batch_processor.go:1-194`) has no
  * observability beyond the finalizer callback; a 100 TB deployment
  * needs to SEE the properties that decide plan strategy — key skew
  * first among them — before a job burns a day discovering them.
  */
object Diagnostics {

  private val TopKeys = 10

  /** Join-key skew profile: the top-N heaviest keys of a column plus
    * the global shape numbers a skew decision needs (row count, key
    * cardinality, max key weight, per-key skew ratio vs the uniform
    * mean). This is the measurement that decides between a plain
    * shuffle join, [[graft.functions.Skew]] salting, and AQE skew
    * splitting.
    *
    * Shape: one keyed partial+final count (the only corpus-sized
    * shuffle), then ONE global aggregation computes sum/count/max AND
    * the top-N keys through the bounded [[TopK]] partial aggregate in
    * the same pass — each map task ships ≤ N candidate keys, so the
    * profile costs one scan + one bounded fold at any corpus size.
    * Never a window: ranking the key-count frame with `row_number()`
    * would funnel every distinct key through one partition.
    */
  def skewProfile(spark: SparkSession, dir: String): DataFrame =
    skewProfile(Tables.lineitem(spark, dir), "l_suppkey", TopKeys)

  /** DataFrame-first form: profile any integral key column. */
  def skewProfile(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    require(topN >= 1, s"skewProfile: bad topN=$topN")
    val counts = df
      .groupBy(col(keyCol).cast("long").as("key"))
      .agg(count(lit(1)).as("cnt"))
    counts
      .agg(
        sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_cnt"),
        TopK.topK(topN)(col("cnt").cast("double"), col("key")).as("top"))
      .select(col("n_rows"), col("n_keys"), col("max_cnt"),
        posexplode(col("top")).as(Seq("pos", "t")))
      .select(
        (col("pos") + 1).as("rank"),
        col("t.id").as("key"),
        col("t.score").cast("long").as("cnt"),
        col("n_rows"), col("n_keys"), col("max_cnt"),
        round(col("t.score") * col("n_keys") / col("n_rows"), 4).as("skew"))
      .orderBy(col("rank"))
  }

  val skewProfileSql: String =
    """WITH c AS (
      |  SELECT CAST(l_suppkey AS BIGINT) AS key, count(*) AS cnt
      |  FROM lineitem GROUP BY 1),
      |g AS (
      |  SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
      |    CAST(count(*) AS BIGINT) AS n_keys,
      |    CAST(max(cnt) AS BIGINT) AS max_cnt
      |  FROM c),
      |t AS (
      |  SELECT key, CAST(cnt AS BIGINT) AS cnt,
      |    CAST(row_number() OVER (ORDER BY cnt DESC, key) AS INT) AS rank
      |  FROM c ORDER BY rank LIMIT 10)
      |SELECT rank, key, cnt, n_rows, n_keys, max_cnt,
      |  round(CAST(cnt AS DOUBLE) * n_keys / n_rows, 4) AS skew
      |FROM t CROSS JOIN g
      |ORDER BY rank""".stripMargin
}
