package graft.ops

import graft.Tables
import graft.functions.TopK
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float
  * vectors; driver north star: ANN for a training-data pipeline).
  *
  * Two paths:
  *  - [[knnBrute]]: exact brute-force cosine top-k — the baseline and
  *    the oracle-able query. The query set is broadcast, the corpus
  *    streams: one scan, no shuffle of the corpus side.
  *  - [[annLsh]]: random-hyperplane LSH (sign-random-projection)
  *    bucketing — the 100 TB path. Candidates come from equality joins
  *    on band buckets (never a cross join), are verified with exact
  *    cosine, and per-query top-k uses [[graft.functions.TopKAggregator]]
  *    (a partial aggregate: each map task emits ≤ k rows, unlike a
  *    window top-k which shuffles every candidate).
  *
  * All arithmetic is double (floats cast up front, left-to-right
  * summation) so results are bit-comparable with the DuckDB oracle's
  * `list_dot_product` over `DOUBLE[]`.
  */
object Similarity {

  /** Corpus with double-cast vectors and precomputed L2 norms. Norms
    * and dot products use the native codegen'd [[graft.functions.VecDot]]
    * (`vec_dot`) — one fused loop instead of interpreted
    * `zip_with`/`aggregate` lambdas, same left-to-right double
    * summation so DuckDB oracles still match bit-exact.
    */
  private def withNorm(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      .withColumn("nrm", expr("sqrt(vec_dot(emb, emb))"))
  }

  private val dot = "vec_dot(qe, emb)"

  private val NQueries = 10
  private val K = 5

  /** Exact k-NN: cosine top-5 for the first 10 vectors against the
    * whole corpus. Ranking uses round(sim, 6) with vec_id tie-break so
    * the cut is reproducible cross-engine.
    */
  def knnBrute(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(spark, dir)
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("emb").as("qe"), col("nrm").as("qn"))
    val sims = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("sim", expr(dot) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("sim"), 6).desc, col("vec_id").asc)
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"),
        col("vec_id").as("neighbor_id"), round(col("sim"), 4).as("sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  val knnBruteSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |n AS (
       |  SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e),
       |q AS (
       |  SELECT vec_id AS qid, emb AS qe, nrm AS qn FROM n WHERE vec_id < $NQueries),
       |s AS (
       |  SELECT qid, n.vec_id AS nid, list_dot_product(qe, emb) / (qn * nrm) AS sim
       |  FROM q, n WHERE n.vec_id <> qid),
       |r AS (
       |  SELECT qid, nid, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY round(sim, 6) DESC, nid) AS rank
       |  FROM s)
       |SELECT qid AS query_id, rank, nid AS neighbor_id, round(sim, 4) AS sim
       |FROM r WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin

  private val NPlanes = 32 // 8 bands × 4 bits
  private val NBands = 8
  private val RowsPerBand = 4

  /** The fixed hyperplane family: component (p, d) is an XXH64-derived
    * pseudo-random value in [-500, 500] — deterministic, computed ONCE
    * on the driver and shipped as literals (the previous formulation
    * recomputed 32×64 hashes per row in interpreted lambdas).
    */
  private lazy val planes: IndexedSeq[Seq[Double]] =
    (0 until NPlanes).map { p =>
      (0 until 64).map { d =>
        (org.apache.spark.sql.catalyst.expressions.XXH64
          .hashInt(p * 64 + d, 42L) % 1001).toDouble
      }
    }

  /** Sign-random-projection signatures: bit p = sign(v · h_p), each
    * projection a codegen'd `vec_dot` against a literal plane. Pure
    * projection — computed at scan speed, no shuffle.
    */
  private def withSig(e: DataFrame): DataFrame =
    e.withColumn("sig", array(
      (0 until NPlanes).map { p =>
        when(call_function("vec_dot", col("emb"), typedlit(planes(p))) > 0, 1).otherwise(0)
      }: _*))

  private val NCells = 16
  private val NProbe = 4

  /** Approximate k-NN via IVF (inverted-file) coarse quantization —
    * the alternative scale path to [[annLsh]]. A fixed set of
    * `NCells` coarse centroids partitions the corpus: every vector is
    * assigned to its nearest centroid (one "cell"); a query probes its
    * `NProbe` nearest cells and ranks only vectors in them. The
    * centroids here are the first `NCells` corpus vectors (collected
    * once — a fixed-size driver broadcast, exactly how production IVF
    * ships its k-means centroids); swapping in trained k-means
    * centroids changes nothing structural. Cell assignment is a pure
    * projection (`NCells` codegen'd `vec_dot`s per row); candidate
    * selection is an equi-join on the cell id — never a cross join.
    * Rows-only driver check; recall vs [[knnBrute]] pinned by
    * SimilaritySpec.
    */
  /** Per-row nearest-centroid similarity structs for a centroid set. */
  private def centroidSims(cents: IndexedSeq[Seq[Double]]) =
    cents.zipWithIndex.map { case (cn, cid) =>
      struct(call_function("vec_dot", col("emb"), typedlit(cn)).as("sim"),
        lit(cid).as("cid"))
    }

  /** Lloyd's k-means on the unit sphere (spherical k-means): assign
    * every vector to its max-cosine centroid (NCells codegen'd
    * `vec_dot`s, one distributed pass), recompute centroids as the
    * normalized elementwise mean of their members, repeat. The only
    * driver-side data is the centroid matrix itself (NCells × dim —
    * fixed size regardless of corpus scale, exactly what production
    * IVF broadcasts). Init: first NCells corpus vectors.
    */
  private def trainCentroids(e: DataFrame, iters: Int): IndexedSeq[Seq[Double]] = {
    var cents: IndexedSeq[Seq[Double]] = e.filter(col("vec_id") < NCells)
      .orderBy(col("vec_id")).select(col("emb"), col("nrm")).collect()
      .toIndexedSeq.map { row =>
        val v = row.getSeq[Double](0); val n = row.getDouble(1)
        v.map(_ / n)
      }
    for (_ <- 1 to iters) {
      val assigned = e.withColumn("cell",
        element_at(array_sort(array(centroidSims(cents): _*)), -1).getField("cid"))
      // spherical k-means: centroid = normalized mean of UNIT members —
      // averaging raw vectors would let large-norm members dominate
      val means = assigned
        .select(col("cell"), posexplode(expr("transform(emb, x -> x / nrm)")))
        .groupBy(col("cell"), col("pos")).agg(avg(col("col")).as("m"))
        .collect()
      val byCell = means.groupBy(_.getInt(0))
      cents = cents.indices.map { cid =>
        byCell.get(cid) match {
          case Some(rows) =>
            val dim = rows.map(_.getInt(1)).max + 1
            val v = new Array[Double](dim)
            rows.foreach(r => v(r.getInt(1)) = r.getDouble(2))
            val n = math.sqrt(v.map(x => x * x).sum)
            if (n > 0) v.toSeq.map(_ / n) else cents(cid)
          case None => cents(cid) // empty cell keeps its centroid
        }
      }
    }
    cents
  }

  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(spark, dir).cache()
    val simStructs = centroidSims(trainCentroids(e, iters = 3))
    // corpus side: nearest cell only
    val assigned = e.withColumn("cell",
      element_at(array_sort(array(simStructs: _*)), -1).getField("cid"))
    // query side: probe the NProbe nearest cells
    val probed = e.filter(col("vec_id") < NQueries)
      .withColumn("cells",
        slice(reverse(array_sort(array(simStructs: _*))), 1, NProbe))
      .select(col("vec_id").as("query_id"), col("emb").as("qe"), col("nrm").as("qn"),
        explode(expr("transform(cells, c -> c.cid)")).as("cell"))
    val verified = assigned
      .join(broadcast(probed), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", expr(dot) / (col("qn") * col("nrm")))
    verified.groupBy(col("query_id"))
      .agg(TopK.topK(K)(col("sim"), col("vec_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"), round(col("col.score"), 4).as("sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** All-pairs near-duplicate candidates over the whole corpus:
    * self-join on LSH band buckets (id_a < id_b), bucket-size cap
    * against degenerate keys, exact cosine verification via the
    * codegen'd `vec_dot`. Feeds [[Dedup.dedupEmbedding]]. Output:
    * (id_a, id_b, sim).
    */
  def cosineCandidatePairs(spark: SparkSession, dir: String): DataFrame = {
    val e = withSig(withNorm(spark, dir)).cache()
    // same capped-bucket self-join machinery as the text dedup path
    // (Dedup.lshCandidates) — shared so fixes (e.g. its self-join
    // cache) apply to both
    val buckets = bandBuckets(e, "doc_id")
      .withColumnRenamed("band", "bucket_id")
      .withColumnRenamed("bkt", "bucket_hash")
    val pairs = Dedup.lshCandidates(buckets, maxBucket = 200)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"))
    pairs
      .join(e.select(col("vec_id").as("id_a"), col("emb").as("qe"), col("nrm").as("qn")), Seq("id_a"))
      .join(e.select(col("vec_id").as("id_b"), col("emb"), col("nrm")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), (expr(dot) / (col("qn") * col("nrm"))).as("sim"))
  }

  /** Approximate k-NN via LSH banding. Each vector lands in
    * $NBands buckets; a query's candidates are corpus vectors sharing
    * at least one (band, bucket-key). Collision probability per band is
    * (1 - θ/π)^$RowsPerBand — near-duplicates collide with high
    * probability, random pairs rarely. Candidates are verified with
    * exact cosine; per-query top-k via the bounded TopK partial
    * aggregate. Not SQL-oracle-able (depends on the xxhash64 plane
    * family) → rows-only check; recall vs [[knnBrute]] is pinned by
    * SimilaritySpec.
    */
  /** (id, band, bkt) LSH band-bucket assignments for a signed corpus. */
  private def bandBuckets(e: DataFrame, idAs: String): DataFrame =
    e.select(
      col("vec_id").as(idAs),
      posexplode(expr(
        s"""transform(sequence(0, ${NBands - 1}), b ->
           |  xxhash64(b, ${(0 until RowsPerBand).map(r => s"sig[$RowsPerBand * b + $r]").mkString(", ")}))""".stripMargin)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bkt")

  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = withSig(withNorm(spark, dir)).cache()
    val qb = bandBuckets(e.filter(col("vec_id") < NQueries), "query_id")
    val cand = bandBuckets(e, "nid")
      .join(broadcast(qb), Seq("band", "bkt"))
      .filter(col("nid") =!= col("query_id"))
      .select(col("query_id"), col("nid"))
      .distinct()
    val verified = cand
      .join(e.select(col("vec_id").as("query_id"), col("emb").as("qe"), col("nrm").as("qn")), Seq("query_id"))
      .join(e.select(col("vec_id").as("nid"), col("emb"), col("nrm")), Seq("nid"))
      .withColumn("sim", expr(dot) / (col("qn") * col("nrm")))
    verified.groupBy(col("query_id"))
      .agg(TopK.topK(K)(col("sim"), col("nid")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"), round(col("col.score"), 4).as("sim"))
      .orderBy(col("query_id"), col("rank"))
  }
}
