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

  private val ProfileCols = Seq("l_orderkey", "l_quantity", "l_returnflag",
    "l_shipdate", "l_discount")

  /** One-pass table profile — the data-validation summary every
    * ingestion step should gate on (null fractions, exact
    * cardinalities, value bounds per column) before a 100 TB job
    * consumes the table. All five columns profile in ONE aggregate
    * over ONE scan: the multi-column `count(distinct …)` family
    * compiles to a single Expand (the [[graft.ops.Relational]]
    * multiDistinct shape — rows multiply by |columns| BEFORE the
    * partial agg, which combines map-side), and the unpivot to one
    * row per column is a `stack` over the single 1-row aggregate.
    * Min/max are emitted as strings for a uniform schema: DOUBLE
    * columns go through DECIMAL(18,2) first, because double→string
    * formatting is engine-specific while decimal rendering is not.
    */
  def tableProfile(spark: SparkSession, dir: String): DataFrame =
    tableProfile(Tables.lineitem(spark, dir), ProfileCols)

  /** DataFrame-first form: profile the named columns of any frame. */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableProfile: no columns")
    def minMax(c: String) = {
      val isFloating = df.schema(c).dataType match {
        case org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType => true
        case _ => false
      }
      if (isFloating)
        (min(col(c)).cast("decimal(18,2)").cast("string"),
          max(col(c)).cast("decimal(18,2)").cast("string"))
      else (min(col(c)).cast("string"), max(col(c)).cast("string"))
    }
    val aggs = count(lit(1)).as("n_rows") +: cols.zipWithIndex.flatMap {
      case (c, i) =>
        val (mn, mx) = minMax(c)
        Seq(count(col(c)).as(s"c_$i"), countDistinct(col(c)).as(s"d_$i"),
          mn.as(s"mn_$i"), mx.as(s"mx_$i"))
    }
    val stackArgs = cols.zipWithIndex.map { case (c, i) =>
      s"'$c', n_rows - c_$i, d_$i, mn_$i, mx_$i"
    }.mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("n_rows"),
        expr(s"stack(${cols.length}, $stackArgs) AS (col_name, n_null, n_distinct, min_s, max_s)"))
      .select(col("col_name"), col("n_rows"), col("n_null"), col("n_distinct"),
        col("min_s"), col("max_s"))
      .orderBy(col("col_name"))
  }

  val tableProfileSql: String = {
    val selects = ProfileCols.map { c =>
      val isFloating = c == "l_quantity" || c == "l_discount"
      val mn = if (isFloating) s"CAST(CAST(min($c) AS DECIMAL(18,2)) AS VARCHAR)"
        else s"CAST(min($c) AS VARCHAR)"
      val mx = if (isFloating) s"CAST(CAST(max($c) AS DECIMAL(18,2)) AS VARCHAR)"
        else s"CAST(max($c) AS VARCHAR)"
      s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
      |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
      |  $mn AS min_s, $mx AS max_s
      |FROM lineitem"""
    }
    selects.mkString("", "\n      |UNION ALL\n      |", "\n      |ORDER BY col_name")
      .stripMargin
  }
}
