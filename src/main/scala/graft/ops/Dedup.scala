package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table (driver north
  * star: training-data pipeline at 100 TB).
  *
  * Shape shared by the approximate variants (MinHash-LSH, SimHash,
  * n-gram Jaccard): per-document *sketches* are computed in a single
  * scan-speed projection; candidate pairs come from equality joins on
  * LSH bucket keys (never an O(n²) cross join); candidates are then
  * verified with the exact measure. Bucket-size caps guard against
  * degenerate keys (the classic LSH skew failure at scale).
  *
  * Each operator emits a per-document summary (`|documents|` rows,
  * never empty) rather than bare pairs, so the result is stable on
  * corpora with few or no duplicates.
  */
object Dedup {

  /** Exact dedup: hash-aggregate on the full text. One shuffle on the
    * text hash; at 100 TB you'd pre-hash to a 128-bit key — semantics
    * identical, so the oracle stays exact.
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"))
      .orderBy(col("doc_id"))

  val dedupExactSql: String =
    """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
      |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin

  /** doc_id + distinct hashed word-3-gram shingles (array<long>).
    * Hashing shingles to longs up front keeps every downstream join and
    * set operation on fixed-width values instead of strings.
    */
  private def shingleSets(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.documents(spark, dir)
      // native one-pass shingling (ShingleHashes) — same hashes as the
      // array_distinct(transform(..., xxhash64(concat_ws(...)))) built-in
      // composition, without an interpreted lambda per shingle
      .select(col("doc_id"), expr("shingle_hash(split(text, ' '), 3)").as("shset"))
  }

  /** Exact Jaccard on hashed shingle sets for a candidate pair. */
  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Candidate pairs from equality self-join on (bucketCol id, hash),
    * with a bucket-size cap dropping degenerate buckets (boilerplate
    * content at scale would otherwise make one bucket quadratic).
    */
  private[ops] def lshCandidates(buckets: DataFrame, maxBucket: Int): DataFrame = {
    // cache the (bucket, doc) assignments: the self-join below reads
    // them TWICE, and without the cache each side re-runs the whole
    // upstream sketch pipeline (at scale: persist/checkpoint here)
    val capped = buckets
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bucket_id"), col("bucket_hash"))))
      .filter(col("bsz") <= maxBucket)
      .select(col("bucket_id"), col("bucket_hash"), col("doc_id"))
      .cache()
    capped.as("x").join(capped.as("y"),
        col("x.bucket_id") === col("y.bucket_id") &&
        col("x.bucket_hash") === col("y.bucket_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** Left-join a per-doc pair summary back onto the full doc list so the
    * output always has one row per document.
    */
  private def perDocSummary(docs: DataFrame, pairs: DataFrame, simCol: String,
                            threshold: Double): DataFrame = {
    val directed = pairs.select(col("doc_a").as("doc_id"), col(simCol))
      .unionByName(pairs.select(col("doc_b").as("doc_id"), col(simCol)))
    val agg = directed.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_candidates"),
      sum(when(col(simCol) >= threshold, 1L).otherwise(0L)).as("n_dups"),
      round(max(col(simCol)), 4).as("max_sim"))
    docs.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_candidates", "n_dups"))
      .na.fill(0.0, Seq("max_sim"))
      .orderBy(col("doc_id"))
  }

  /** MinHash + LSH near-dup: 64 minhashes from the seeded xxhash64
    * family → 16 bands × 4 rows → band-bucket join → exact Jaccard
    * verification at 0.7. Only candidate pairs (≪ n²) ever touch the
    * verify join. No SQL oracle: the sketch depends on Spark's xxhash64
    * hash family → rows-only check; correctness is pinned by DedupSpec.
    */
  /** MinHash-LSH candidate pairs with exact-Jaccard scores — shared by
    * the per-doc summary ([[dedupMinhash]]) and the cluster builder
    * ([[nearDupClusters]]).
    */
  private[ops] def minhashVerifiedPairs(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val sets = shingleSets(spark, dir).cache()
    // native codegen'd MinHash (one fused shingles×64 loop) vs the
    // transform/array_min built-in composition's interpreted lambdas
    val sig = sets.withColumn("sig", expr("minhash_sig(shset, 64)"))
    val buckets = sig.select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, 15), b -> xxhash64(b, sig[4*b], sig[4*b+1], sig[4*b+2], sig[4*b+3]))")))
      .withColumnRenamed("pos", "bucket_id")
      .withColumnRenamed("col", "bucket_hash")
    val cand = lshCandidates(buckets, maxBucket = 100)
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("shset").as("sa")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("shset").as("sb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), jaccard(col("sa"), col("sb")).as("jacc"))
  }

  def dedupMinhash(spark: SparkSession, dir: String): DataFrame =
    perDocSummary(Tables.documents(spark, dir).select(col("doc_id")),
      minhashVerifiedPairs(spark, dir), "jacc", 0.7)

  /** Canonical-document selection for exact duplicates: keep the
    * lowest doc_id of every identical-text group. One window pass —
    * this is the "filter the corpus" half of dedup (the summaries
    * above are the "report" half).
    */
  /** DataFrame-level canonicalization: keep the min-id row per
    * duplicate group. Idempotent by construction (DedupSpec pins it):
    * once each text appears once, every row is its own group minimum.
    */
  def canonicalize(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(textCol))
    docs
      .withColumn("__keep", min(col(idCol)).over(w))
      .filter(col(idCol) === col("__keep"))
      .drop("__keep")
  }

  def dedupCanonical(spark: SparkSession, dir: String): DataFrame =
    canonicalize(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  val dedupCanonicalSql: String =
    """SELECT doc_id, lang, source, n_chars FROM documents
      |WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
      |ORDER BY doc_id""".stripMargin

  /** Near-duplicate cluster formation: connected components over the
    * MinHash-verified similarity graph (Jaccard ≥ 0.7), via iterative
    * min-label propagation — each round, every doc takes the minimum
    * label among itself and its neighbors; fixpoint = each cluster
    * labeled by its smallest doc_id. Distributed throughout: per round
    * one join + one aggregation; the only driver-side value is the
    * converged? counter. Rounds are bounded by the graph diameter
    * (near-dup clusters are tiny; the 20-round cap is a safety net,
    * convergence is checked each round). Output: (doc_id, cluster,
    * is_canonical) for every document.
    */
  def nearDupClusters(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val pairs = minhashVerifiedPairs(spark, dir)
      .filter(col("jacc") >= 0.7)
      .select(col("doc_a"), col("doc_b"))
    // only docs with at least one edge enter the iteration — isolated
    // docs (the vast majority of a real corpus) are appended as
    // singleton clusters afterwards, so per-round work scales with the
    // duplicate-graph size, not the corpus size
    val adj = pairs
      .unionByName(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .unionByName(pairs.select(col("doc_a"), col("doc_a").as("doc_b"))) // self-loops
      .unionByName(pairs.select(col("doc_b").as("doc_a"), col("doc_b"))) // (both ends)
      .distinct()
      .cache()
    val connected = adj.select(col("doc_a").as("doc_id")).distinct()
    var labels = connected.select(col("doc_id"), col("doc_id").as("cluster")).cache()
    var prevCached = labels // the DataFrame actually holding the cache
    var converged = false
    var round = 0
    while (!converged && round < 20) {
      // one action per round: the filtered count scans every row of
      // every partition of `next`, fully populating its cache before
      // the parent cache is dropped (a partial check like isEmpty
      // would leave cache holes that recompute the whole sketch
      // pipeline through the unpersisted parent)
      val next = adj
        .join(labels.select(col("doc_id").as("doc_b"), col("cluster")), Seq("doc_b"))
        .groupBy(col("doc_a")).agg(min(col("cluster")).as("cluster"))
        .select(col("doc_a").as("doc_id"), col("cluster"))
        .join(labels.withColumnRenamed("cluster", "old"), Seq("doc_id"))
        .cache()
      val changed = next.filter(col("cluster") =!= col("old")).count()
      prevCached.unpersist()
      prevCached = next
      labels = next.select(col("doc_id"), col("cluster"))
      converged = changed == 0
      round += 1
    }
    adj.unpersist()
    if (!converged)
      // a silent partial result would violate the operator's contract
      // (labels = smallest cluster member); diameter-20 components mean
      // chained near-dups — surface it instead of truncating quietly
      throw new IllegalStateException(
        s"nearDupClusters: label propagation did not converge within $round rounds " +
          "(similarity graph has a component of diameter > 20); raise the round cap")
    labels
      .unionByName(docs.join(labels.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("doc_id").as("cluster")))
      .withColumn("is_canonical", (col("doc_id") === col("cluster")).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** SimHash near-dup: 64-bit weighted-bit signature over token hashes;
    * pigeonhole blocking on 4×16-bit chunks (any pair at Hamming
    * distance ≤ 3 must agree on ≥ 1 chunk); verification = bit_count of
    * XOR. Rows-only check (hash-family dependent), pinned by DedupSpec.
    */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr("transform(split(text, ' '), t -> xxhash64(t))").as("hs"))
      // native codegen'd signature: one fused tokens×64 loop
      .withColumn("simhash", expr("simhash64(hs)"))
      .select(col("doc_id"), col("simhash"))
      .cache()
    val buckets = docs.select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, 3), c -> shiftright(simhash, 16*c) & 65535)")))
      .withColumnRenamed("pos", "bucket_id")
      .withColumnRenamed("col", "bucket_hash")
    val cand = lshCandidates(buckets, maxBucket = 100)
    val verified = cand
      .join(docs.select(col("doc_id").as("doc_a"), col("simhash").as("ha")), Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("simhash").as("hb")), Seq("doc_b"))
      // similarity in [0,1]: 1 − hamming/64, so the shared ≥-threshold
      // summary logic applies (hamming ≤ 3 ⇔ sim ≥ 0.953)
      .select(col("doc_a"), col("doc_b"),
        (lit(1.0) - expr("bit_count(ha ^ hb)") / lit(64.0)).as("sim"))
    perDocSummary(docs, verified, "sim", 1.0 - 3.0 / 64)
  }

  /** Embedding-cosine near-dup: documents whose embedding vectors are
    * nearly parallel (cosine ≥ 0.95) are duplicate candidates. The
    * candidate set comes from the same sign-random-projection LSH
    * banding as the ANN path ([[Similarity]]) — equality join on band
    * buckets, never an O(n²) cross join — then exact cosine verification
    * with the codegen'd `vec_dot`. Per-document summary like the other
    * variants. Rows-only check (hyperplane family is engine-side);
    * invariants pinned by DedupSpec.
    */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val pairs = Similarity.cosineCandidatePairs(spark, dir)
    perDocSummary(docs,
      pairs.select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("sim")),
      "sim", 0.95)
  }

  /** Exact n-gram Jaccard dedup with cheap blocking: candidates share
    * (lang, length bucket); each block is bounded by the cap. This is
    * the "small corpus / exact answer" path; MinHash is the scale path.
    */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sets = shingleSets(spark, dir)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), (col("n_chars") / 50).cast("int").as("lenb"))
      .join(sets, Seq("doc_id"))
    val buckets = docs.select(
      hash(col("lang")).as("bucket_id"),
      col("lenb").cast("long").as("bucket_hash"),
      col("doc_id"))
    val cand = lshCandidates(buckets, maxBucket = 1000)
    val verified = cand
      .join(sets.select(col("doc_id").as("doc_a"), col("shset").as("sa")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("shset").as("sb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), jaccard(col("sa"), col("sb")).as("jacc"))
    perDocSummary(docs, verified, "jacc", 0.7)
  }
}
