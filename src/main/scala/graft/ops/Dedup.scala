package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  * Cache lifecycle: sketch frames are persisted only while the SMALL
  * verified-pair set is eagerly `localCheckpoint`ed, then unpersisted —
  * chaining dedup ops never accumulates SQL caches, and the checkpoint
  * cuts lineage for downstream iteration. Ops take a private
  * `materialize = false` variant returning the full lazy plan so the
  * plan contracts (PlanSpec) can still see the join shapes.
  *
  * Each operator emits a per-document summary (`|documents|` rows,
  * never empty) rather than bare pairs, so the result is stable on
  * corpora with few or no duplicates.
  *
  * Library API: every operator has a DataFrame-first form taking the
  * corpus and its id/text column names (outputs use the canonical
  * `doc_id` name); the `(spark, dir)` forms are thin wrappers binding
  * the driver-contract `documents` table.
  */
object Dedup {

  /** Exact dedup: hash-aggregate on a 128-bit digest of the text, NOT
    * the text itself — the shuffle key weighs 16 bytes per row instead
    * of the whole document, so at 100 TB the exchange moves ~the id
    * column, not the corpus. (Partial aggregation also collapses
    * within-partition duplicates before the exchange either way; the
    * digest key is what fixes the worst case where duplicates are
    * spread across partitions.) The DuckDB oracle groups by the RAW
    * text, so the green row is also a cross-engine proof that
    * digest-keying preserves the exact grouping.
    */
  def dedupExact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"))
      .orderBy(col("doc_id"))

  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    dedupExact(Tables.documents(spark, dir), "doc_id", "text")

  val dedupExactSql: String =
    """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
      |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin

  /** Record linkage (entity resolution) by blocked fuzzy join: find
    * DISTINCT entity names that are edit-distance-near, with the
    * record count each name carries — "blue bolt" ↔ "blue rod" is a
    * probable data-entry variant; the counts say which spelling is
    * canonical. Three scale disciplines stack: (1) the quadratic
    * match runs at the VOCABULARY level — records collapse to
    * (name, count) first, so 100 TB of rows become |names| candidates;
    * (2) candidates come from a blocking-key equi-join (first token),
    * never a cross join; (3) blocks above `maxBlock` are dropped from
    * pairing with the [[lshCandidates]] cap discipline — a degenerate
    * block ("inc" in every company name) would otherwise re-create the
    * quadratic blow-up blocking exists to prevent. Levenshtein runs
    * only inside surviving blocks, on name pairs, and both engines
    * share its unit-cost semantics.
    */
  def recordLinkage(spark: SparkSession, dir: String): DataFrame =
    recordLinkage(Tables.part(spark, dir), "p_name", maxDist = 3, maxBlock = 1000)

  /** DataFrame-first form over any named-record frame. */
  def recordLinkage(records: DataFrame, nameCol: String, maxDist: Int,
                    maxBlock: Int): DataFrame = {
    val names = records.groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n_records"))
      .withColumn("block", split(col("name"), " ").getItem(0))
    val sizes = names.groupBy(col("block"))
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBlock)
    val blocked = names.join(sizes.select("block"), Seq("block"))
    val a = blocked.select(col("block"), col("name").as("name_a"),
      col("n_records").as("n_a"))
    val b = blocked.select(col("block"), col("name").as("name_b"),
      col("n_records").as("n_b"))
    a.join(b, Seq("block"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist").between(1, maxDist))
      .select(col("name_a"), col("name_b"), col("dist").cast("long"),
        col("n_a"), col("n_b"))
      .orderBy(col("dist"), col("name_a"), col("name_b"))
  }

  val recordLinkageSql: String =
    """WITH names AS (
      |  SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n_records,
      |    split_part(p_name, ' ', 1) AS block
      |  FROM part GROUP BY 1),
      |ok AS (
      |  SELECT block FROM names GROUP BY block HAVING count(*) <= 1000)
      |SELECT a.name AS name_a, b.name AS name_b,
      |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
      |  a.n_records AS n_a, b.n_records AS n_b
      |FROM names a
      |JOIN ok USING (block)
      |JOIN names b ON a.block = b.block AND a.name < b.name
      |WHERE levenshtein(a.name, b.name) BETWEEN 1 AND 3
      |ORDER BY dist, name_a, name_b""".stripMargin

  /** Assumed per-field match probability for [[fellegiSunter]] — the
    * classical unsupervised default (m ≈ 0.95: true duplicate pairs
    * agree on a well-kept field 95% of the time). Without labeled
    * pairs m cannot be estimated from data (that's the EM extension);
    * u CAN be, and u is where the discriminative power lives.
    */
  val FsM = 0.95

  /** Fellegi–Sunter probabilistic record linkage (JASA 1969) — the
    * principled scoring layer above [[recordLinkage]]'s edit-distance
    * pairing: each candidate pair gets a log-likelihood-ratio weight
    * Σ_fields ln(m/u) [agree] / ln((1−m)/(1−u)) [disagree], where the
    * u-probability (chance agreement between two RANDOM records) is
    * estimated EXACTLY from the field's value census:
    * u = Σ_v n_v(n_v−1) / (N(N−1)). A rare-value agreement (brand
    * shared by 2 records) thus outweighs a common-value one (container
    * shared by half the table) — the thing plain field-count scoring
    * cannot do.
    *
    * Determinism: per-field agree/disagree weights are TWO micro-nat
    * integers rounded once from exact integer ratios (1-row frames,
    * DECIMAL(38,0) censuses); a pair's score is an order-free integer
    * sum of bounded field terms. Degenerate fields carry weight 0 on
    * both branches: u = 1 (constant field) and u = 0 (all-distinct
    * field) are non-informative rather than ±∞. Top-20 by
    * (score, keys) via TakeOrdered.
    *
    * Scale shape: u estimation is one census aggregate per field
    * (bounded field list); candidate pairs come from the
    * [[recordLinkage]] blocking — capped blocks, never a cross join —
    * and the comparison vector is row-local codegen.
    */
  def fellegiSunter(spark: SparkSession, dir: String): DataFrame =
    fellegiSunter(Tables.part(spark, dir), "p_partkey", "p_name",
      Seq("p_brand", "p_type", "p_size"),
      maxBlock = 1000, topN = 20)

  /** DataFrame-first form: `fields` are the comparison columns
    * (stringified; NULL-safe equality), blocking on `nameCol`'s first
    * TWO tokens — record-level pairing needs a finer key than
    * [[recordLinkage]]'s name-level first token (8 first-token blocks
    * here would pass `maxBlock` and silently zero the candidate set
    * one SF up; two tokens give 64 blocks that stay under the cap
    * through the driver's largest SF).
    */
  def fellegiSunter(records: DataFrame, keyCol: String, nameCol: String,
                    fields: Seq[String], maxBlock: Int,
                    topN: Int): DataFrame = {
    require(fields.nonEmpty, "fellegiSunter: need at least one field")
    val recs = records
      .select(col(keyCol).as("k") +: col(nameCol).as("nm") +:
        fields.map(f => col(f).cast("string").as(f)): _*)
      .withColumn("block", concat_ws(" ",
        split(col("nm"), " ").getItem(0), split(col("nm"), " ").getItem(1)))
    // per-field agree/disagree micro-weights off ONE shared census
    // pass: the (field, value) explode is row-local and the censuses
    // for every field ride a single aggregate + 1-row pivot — the
    // per-field-job form paid |fields| scheduler round-trips for the
    // same exact integers (measured: job overhead, not data, dominated)
    val wRows = recs
      .select(explode(array(fields.map(f =>
        struct(lit(f).as("f"), col(f).as("v"))): _*)).as("x"))
      .groupBy(col("x.f").as("f"), col("x.v").as("v"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("f"))
      .agg(sum(col("c").cast("decimal(38,0)")
        * (col("c") - 1).cast("decimal(38,0)")).as("nu"),
        sum(col("c")).as("nr"))
      .select(col("f"),
        expr("CASE WHEN nu <= 0 OR nu >= CAST(nr AS DECIMAL(38,0)) * (nr - 1)" +
          " THEN CAST(0 AS BIGINT)" +
          s" ELSE CAST(round(ln($FsM * (CAST(nr AS DOUBLE) * (nr - 1))" +
          " / CAST(nu AS DOUBLE)) * 1e6) AS BIGINT) END").as("wa"),
        expr("CASE WHEN nu <= 0 OR nu >= CAST(nr AS DECIMAL(38,0)) * (nr - 1)" +
          " THEN CAST(0 AS BIGINT)" +
          s" ELSE CAST(round(ln(${1 - FsM} * (CAST(nr AS DOUBLE) * (nr - 1))" +
          " / (CAST(nr AS DOUBLE) * (nr - 1) - CAST(nu AS DOUBLE))) * 1e6)" +
          " AS BIGINT) END").as("wd"))
    val weights = wRows.groupBy()
      .agg(max(when(col("f") === fields.head, col("wa")))
          .as(s"wa_${fields.head}"),
        fields.tail.flatMap(f => Seq(
          max(when(col("f") === f, col("wa"))).as(s"wa_$f"),
          max(when(col("f") === f, col("wd"))).as(s"wd_$f"))) :+
          max(when(col("f") === fields.head, col("wd")))
            .as(s"wd_${fields.head}"): _*)
    val sizes = recs.groupBy(col("block"))
      .agg(count(lit(1)).as("bsz")).filter(col("bsz") <= maxBlock)
    val blocked = recs.join(sizes.select("block"), Seq("block"))
    val a = blocked.select(col("block") +: col("k").as("k_a") +:
      fields.map(f => col(f).as(s"${f}_a")): _*)
    val b = blocked.select(col("block") +: col("k").as("k_b") +:
      fields.map(f => col(f).as(s"${f}_b")): _*)
    val agreeCols = fields.map(f =>
      col(s"${f}_a") <=> col(s"${f}_b") as s"agree_$f")
    val scoreCol = fields.map(f => when(col(s"${f}_a") <=> col(s"${f}_b"),
        col(s"wa_$f")).otherwise(col(s"wd_$f")))
      .reduce(_ + _).as("score_micro")
    a.join(b, Seq("block")).filter(col("k_a") < col("k_b"))
      .crossJoin(broadcast(weights))
      .select(Seq(col("k_a"), col("k_b")) ++ agreeCols :+ scoreCol: _*)
      .orderBy(col("score_micro").desc, col("k_a"), col("k_b"))
      .limit(topN)
  }

  /** DuckDB twin of [[fellegiSunter]]: identical censuses, micro
    * weights and blocking cut.
    */
  val fellegiSunterSql: String = {
    val fields = Seq("p_brand", "p_type", "p_size")
    val wCtes = fields.map { f =>
      s"""w_$f AS (
         |  SELECT CASE WHEN nu <= 0 OR nu >= CAST(nr AS HUGEINT) * (nr - 1)
         |      THEN CAST(0 AS BIGINT)
         |    ELSE CAST(round(ln(0.95 * (CAST(nr AS DOUBLE) * (nr - 1))
         |      / CAST(nu AS DOUBLE)) * 1e6) AS BIGINT) END AS wa,
         |    CASE WHEN nu <= 0 OR nu >= CAST(nr AS HUGEINT) * (nr - 1)
         |      THEN CAST(0 AS BIGINT)
         |    ELSE CAST(round(ln(0.05 * (CAST(nr AS DOUBLE) * (nr - 1))
         |      / (CAST(nr AS DOUBLE) * (nr - 1) - CAST(nu AS DOUBLE))) * 1e6)
         |      AS BIGINT) END AS wd
         |  FROM (SELECT sum(CAST(c AS HUGEINT) * (c - 1)) AS nu,
         |          CAST(sum(c) AS BIGINT) AS nr
         |        FROM (SELECT CAST($f AS VARCHAR) AS v, count(*) AS c
         |              FROM part GROUP BY 1)))""".stripMargin
    }.mkString(",\n")
    val agrees = fields.map(f =>
      s"a.$f IS NOT DISTINCT FROM b.$f AS agree_$f").mkString(",\n  ")
    val score = fields.map(f =>
      s"(CASE WHEN a.$f IS NOT DISTINCT FROM b.$f THEN w_$f.wa ELSE w_$f.wd END)")
      .mkString(" + ")
    val wJoin = fields.map(f => s"CROSS JOIN w_$f").mkString(" ")
    s"""WITH recs AS (
       |  SELECT p_partkey AS k,
       |    trim(split_part(p_name, ' ', 1) || ' '
       |      || split_part(p_name, ' ', 2)) AS block,
       |    CAST(p_brand AS VARCHAR) AS p_brand,
       |    CAST(p_type AS VARCHAR) AS p_type,
       |    CAST(p_size AS VARCHAR) AS p_size
       |  FROM part),
       |$wCtes,
       |ok AS (SELECT block FROM recs GROUP BY block
       |       HAVING count(*) <= 1000)
       |SELECT a.k AS k_a, b.k AS k_b,
       |  $agrees,
       |  CAST($score AS BIGINT) AS score_micro
       |FROM recs a JOIN ok USING (block)
       |JOIN recs b ON a.block = b.block AND a.k < b.k
       |$wJoin
       |ORDER BY score_micro DESC, k_a, k_b
       |LIMIT 20""".stripMargin
  }

  /** Scale-risk profile of the linkage family's BLOCKING — the
    * [[editJoinProfile]] pre-flight, for [[recordLinkage]] /
    * [[fellegiSunter]]: those ops DROP blocks above `maxBlock` (the
    * right posture — a degenerate block re-creates the quadratic
    * blow-up blocking exists to prevent), but a dropped block's
    * records silently leave the candidate set, and when the default
    * key saturates at scale the op returns an empty pair set that
    * reads as "no duplicates". This census makes that failure mode a
    * NUMBER, from one cheap aggregate over the same blocked frame the
    * join would build. One row, all exact integers:
    *
    *  - `n_records` / `n_blocks` / `max_block` — the blocked frame's
    *    shape (`mean_block_milli` = records per block ×1000,
    *    truncating DIV; NULL on an empty frame);
    *  - `dropped_blocks` — blocks above `maxBlock` (each drops ALL
    *    its records from pairing);
    *  - `covered_records` and `coverage_milli` — records that still
    *    participate, absolute and ×1000 share (NULL when no records).
    *    Coverage ≈ 1000 is healthy; a collapsing value means the key
    *    is too coarse for this corpus — re-key finer (the
    *    [[fellegiSunter]] two-token vs one-token move) BEFORE trusting
    *    an empty linkage result;
    *  - `cand_pairs` — Σ bsz·(bsz−1)/2 over surviving blocks: the
    *    exact number of levenshtein/score comparisons the join will
    *    pay, readable before paying any of them.
    *
    * Scale posture: one block-keyed count + one global aggregate —
    * the same first stage the linkage join itself runs; nothing here
    * adds a pass the join would not pay. The guarded overloads of
    * [[recordLinkage]]/[[fellegiSunter]] run exactly this census and
    * refuse loudly when coverage falls below an opt-in floor.
    */
  def blockingProfile(spark: SparkSession, dir: String): DataFrame =
    blockingProfile(
      fsBlocked(Tables.part(spark, dir), "p_name"), "block", maxBlock = 1000)

  /** DataFrame-first form: profiles `blockCol` as a blocking key over
    * `records` (pass the DISTINCT-names frame to profile
    * [[recordLinkage]]'s name-level blocking; the raw record frame
    * with the two-token key for [[fellegiSunter]]'s).
    */
  def blockingProfile(records: DataFrame, blockCol: String,
                      maxBlock: Int): DataFrame = {
    require(maxBlock >= 1, s"blockingProfile: maxBlock must be >= 1, got $maxBlock")
    records.groupBy(col(blockCol).as("block"))
      .agg(count(lit(1)).as("bsz"))
      .agg(coalesce(sum(col("bsz")), lit(0L)).as("n_records"),
        count(lit(1)).as("n_blocks"),
        coalesce(max(col("bsz")), lit(0L)).as("max_block"),
        coalesce(sum(when(col("bsz") > maxBlock, lit(1L)).otherwise(lit(0L))),
          lit(0L)).as("dropped_blocks"),
        coalesce(sum(when(col("bsz") <= maxBlock, col("bsz")).otherwise(lit(0L))),
          lit(0L)).as("covered_records"),
        coalesce(sum(when(col("bsz") <= maxBlock,
          expr("bsz * (bsz - 1) DIV 2")).otherwise(lit(0L))), lit(0L))
          .as("cand_pairs"))
      .select(col("n_records"), col("n_blocks"), col("max_block"),
        when(col("n_blocks") > 0, expr("n_records * 1000 DIV n_blocks"))
          .as("mean_block_milli"),
        col("dropped_blocks"), col("covered_records"),
        when(col("n_records") > 0, expr("covered_records * 1000 DIV n_records"))
          .as("coverage_milli"),
        col("cand_pairs"))
  }

  /** The [[fellegiSunter]] blocked record frame (two-token name key)
    * — shared with [[blockingProfile]] so the profile measures
    * EXACTLY the blocking the scorer pairs on.
    */
  private def fsBlocked(records: DataFrame, nameCol: String): DataFrame =
    records.withColumn("block", concat_ws(" ",
      split(col(nameCol), " ").getItem(0), split(col(nameCol), " ").getItem(1)))

  /** DuckDB twin of [[blockingProfile]] — same two-token key, same
    * truncating-DIV milli ratios.
    */
  val blockingProfileSql: String =
    """WITH recs AS (
      |  SELECT trim(split_part(p_name, ' ', 1) || ' '
      |    || split_part(p_name, ' ', 2)) AS block
      |  FROM part),
      |s AS (SELECT block, CAST(count(*) AS BIGINT) AS bsz FROM recs GROUP BY 1)
      |SELECT CAST(coalesce(sum(bsz), 0) AS BIGINT) AS n_records,
      |  CAST(count(*) AS BIGINT) AS n_blocks,
      |  CAST(coalesce(max(bsz), 0) AS BIGINT) AS max_block,
      |  CASE WHEN count(*) > 0
      |    THEN CAST(sum(bsz) * 1000 // count(*) AS BIGINT) END AS mean_block_milli,
      |  CAST(coalesce(sum(CASE WHEN bsz > 1000 THEN 1 ELSE 0 END), 0) AS BIGINT)
      |    AS dropped_blocks,
      |  CAST(coalesce(sum(CASE WHEN bsz <= 1000 THEN bsz ELSE 0 END), 0) AS BIGINT)
      |    AS covered_records,
      |  CASE WHEN coalesce(sum(bsz), 0) > 0
      |    THEN CAST(sum(CASE WHEN bsz <= 1000 THEN bsz ELSE 0 END) * 1000
      |      // sum(bsz) AS BIGINT) END AS coverage_milli,
      |  CAST(coalesce(sum(CASE WHEN bsz <= 1000 THEN bsz * (bsz - 1) // 2
      |    ELSE 0 END), 0) AS BIGINT) AS cand_pairs
      |FROM s""".stripMargin

  /** The loud-saturation census behind the guarded linkage overloads:
    * runs [[blockingProfile]]'s coverage aggregate over the frame the
    * op will pair on and REFUSES (the [[editJoin]] `maxHotSegDocs`
    * discipline: fail the whole job rather than silently emit an
    * empty result) when fewer than `floorMilli` ‰ of records sit in
    * surviving blocks. An EMPTY frame passes (coverage of nothing is
    * vacuously whole).
    */
  private def requireBlockingCoverage(blocked: DataFrame, maxBlock: Int,
                                      floorMilli: Long, op: String): Unit = {
    val r = blocked.groupBy(col("block")).agg(count(lit(1)).as("bsz"))
      .agg(coalesce(sum(col("bsz")), lit(0L)),
        coalesce(sum(when(col("bsz") <= maxBlock, col("bsz"))
          .otherwise(lit(0L))), lit(0L)),
        coalesce(max(col("bsz")), lit(0L)))
      .head()
    val (n, cov, mx) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val covMilli = if (n > 0) cov * 1000 / n else 1000L
    require(covMilli >= floorMilli,
      s"$op: blocking coverage collapsed — only $cov of $n records " +
        s"($covMilli‰) sit in blocks <= maxBlock=$maxBlock (largest " +
        s"block: $mx records); an empty pair set from this run would be " +
        "SATURATION, not absence of duplicates. Run blockingProfile for " +
        "the full census, re-key with a finer blocking key, or lower " +
        "minCoverageMilli deliberately")
  }

  /** [[recordLinkage]] with an OPT-IN coverage guard: the blocking
    * census (one cheap aggregate over the distinct-names frame the op
    * pairs on) runs FIRST and the op fails loudly when fewer than
    * `minCoverageMilli` ‰ of names survive the `maxBlock` cut —
    * instead of returning an empty result that reads as "no
    * duplicates". Pass 0 for the unguarded form.
    */
  def recordLinkage(records: DataFrame, nameCol: String, maxDist: Int,
                    maxBlock: Int, minCoverageMilli: Long): DataFrame = {
    if (minCoverageMilli > 0L)
      requireBlockingCoverage(
        records.select(col(nameCol).as("name")).distinct()
          .withColumn("block", split(col("name"), " ").getItem(0)),
        maxBlock, minCoverageMilli, "recordLinkage")
    recordLinkage(records, nameCol, maxDist, maxBlock)
  }

  /** [[fellegiSunter]] with the same OPT-IN coverage guard, over the
    * two-token record-level blocking the scorer pairs on.
    */
  def fellegiSunter(records: DataFrame, keyCol: String, nameCol: String,
                    fields: Seq[String], maxBlock: Int, topN: Int,
                    minCoverageMilli: Long): DataFrame = {
    if (minCoverageMilli > 0L)
      requireBlockingCoverage(fsBlocked(records, nameCol), maxBlock,
        minCoverageMilli, "fellegiSunter")
    fellegiSunter(records, keyCol, nameCol, fields, maxBlock, topN)
  }

  /** Incremental exact dedup — the daily-ingest production shape:
    * dedup a NEW increment against the digest INDEX of the
    * already-ingested corpus, without ever re-reading the old corpus
    * text (at 100 TB the index is a persisted digest table; here it is
    * derived on the fly). Every increment row is classified:
    * `dup_of_index` (already ingested), `dup_in_increment` (another
    * increment row with the same digest has the smaller id — the
    * canonical one survives), or `new`.
    *
    * Shape: the index side is one digest-distinct aggregate; the
    * increment census is one digest-keyed `min` aggregate (the
    * [[graft.ops.Curation.spanDedup]] canonical-pick — partial-agg,
    * never a window); classification is a digest equi-join against
    * both — all shuffles are digest-keyed, nothing quadratic, and md5
    * keeps the oracle exact cross-engine.
    */
  def dedupIncremental(oldDocs: DataFrame, newDocs: DataFrame,
                       idCol: String, textCol: String): DataFrame = {
    val oldD = oldDocs.select(md5(col(textCol)).as("digest")).distinct()
      .withColumn("in_index", lit(1))
    val newD = newDocs.select(col(idCol).as("doc_id"), md5(col(textCol)).as("digest"))
    val census = newD.groupBy(col("digest")).agg(min(col("doc_id")).as("canon"))
    newD
      .join(census, Seq("digest"))
      .join(oldD, Seq("digest"), "left")
      .select(col("doc_id"), col("digest"),
        when(col("in_index").isNotNull, "dup_of_index")
          .when(col("doc_id") =!= col("canon"), "dup_in_increment")
          .otherwise("new").as("status"))
      .orderBy(col("doc_id"))
  }

  /** Driver form: even doc_ids play the ingested corpus, odd ones the
    * arriving increment.
    */
  def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    dedupIncremental(docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
  }

  val dedupIncrementalSql: String =
    """WITH oldd AS (
      |  SELECT DISTINCT md5(text) AS digest FROM documents WHERE doc_id % 2 = 0),
      |newd AS (
      |  SELECT doc_id, md5(text) AS digest FROM documents WHERE doc_id % 2 = 1),
      |c AS (SELECT digest, min(doc_id) AS canon FROM newd GROUP BY digest)
      |SELECT doc_id, n.digest,
      |  CASE WHEN o.digest IS NOT NULL THEN 'dup_of_index'
      |       WHEN doc_id <> canon THEN 'dup_in_increment'
      |       ELSE 'new' END AS status
      |FROM newd n JOIN c USING (digest) LEFT JOIN oldd o ON n.digest = o.digest
      |ORDER BY doc_id""".stripMargin

  /** doc_id + distinct hashed word-3-gram shingles (array<long>).
    * Hashing shingles to longs up front keeps every downstream join and
    * set operation on fixed-width values instead of strings.
    */
  private def shingleSets(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      // native one-pass shingling (ShingleHashes) — same hashes as the
      // array_distinct(transform(..., xxhash64(concat_ws(...)))) built-in
      // composition, without an interpreted lambda per shingle
      .select(col(idCol).as("doc_id"),
        expr(s"shingle_hash(split($textCol, ' '), 3)").as("shset"))
  }

  /** Exact Jaccard on hashed shingle sets for a candidate pair, from
    * the single fused intersection count (elements are distinct, so
    * |A∪B| = |A|+|B|−|A∩B|) — no intersection/union arrays are ever
    * materialized ([[graft.functions.SetIntersectCount]]).
    */
  private def jaccard(a: Column, b: Column): Column = {
    val c = call_function("set_intersect_count", a, b)
    c.cast("double") / (size(a) + size(b) - c)
  }

  /** Candidate pairs from equality self-join on (bucketCol id, hash),
    * with a bucket-size cap dropping degenerate buckets (boilerplate
    * content at scale would otherwise make one bucket quadratic).
    *
    * When materializing: the (bucket, doc) assignments are persisted —
    * the self-join reads them twice, and without that each side would
    * re-run the whole upstream sketch pipeline — the distinct pair set
    * (small) is checkpointed eagerly, and the assignment cache is
    * dropped before returning.
    */
  private[ops] def lshCandidates(buckets: DataFrame, maxBucket: Int,
                                 materialize: Boolean = true): DataFrame =
    lshCandidatesImpl(buckets, maxBucket, materialize, withDropped = false)._1

  /** As [[lshCandidates]], but ALSO returns the docs whose buckets were
    * dropped by the cap — bucket sizes are computed once and shared by
    * the cap filter and the dropped-doc detection.
    */
  private[ops] def lshCandidatesWithDropped(buckets: DataFrame, maxBucket: Int,
                                            materialize: Boolean): (DataFrame, DataFrame) =
    lshCandidatesImpl(buckets, maxBucket, materialize, withDropped = true)

  private def lshCandidatesImpl(buckets: DataFrame, maxBucket: Int,
                                materialize: Boolean,
                                withDropped: Boolean): (DataFrame, DataFrame) = {
    // bucket sizes via partial+final hash agg + equi-join, NOT a window
    // count over the bucket key: some blocking schemes (e.g. n-gram
    // Jaccard's lang × length-bucket) have FEW, HUGE buckets, and a
    // window would funnel each whole bucket through one task — the agg
    // combines map-side and the join back is keyed and AQE-skew-safe
    val sizes0 = buckets.groupBy(col("bucket_id"), col("bucket_hash"))
      .agg(count(lit(1)).as("bsz"))
    // persisted only when read twice (cap filter + dropped detection);
    // small: one row per bucket
    val sizes = if (materialize && withDropped) sizes0.persist() else sizes0
    try {
      val keep = sizes.filter(col("bsz") <= maxBucket)
        .select(col("bucket_id"), col("bucket_hash"))
      val capped0 = buckets
        .join(keep, Seq("bucket_id", "bucket_hash"))
        .select(col("bucket_id"), col("bucket_hash"), col("doc_id"))
      val capped = if (materialize) capped0.persist() else capped0
      val pairs = try {
        val p = capped.as("x").join(capped.as("y"),
            col("x.bucket_id") === col("y.bucket_id") &&
            col("x.bucket_hash") === col("y.bucket_hash") &&
            col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
        if (materialize) p.localCheckpoint(true) else p
      } finally if (materialize) capped.unpersist()
      val dropped = if (!withDropped) null else {
        val over = sizes.filter(col("bsz") > maxBucket)
          .select(col("bucket_id"), col("bucket_hash"))
        val d = buckets.join(over, Seq("bucket_id", "bucket_hash"))
          .select(col("doc_id")).distinct()
        if (materialize) d.localCheckpoint(true) else d
      }
      (pairs, dropped)
    } finally if (materialize && withDropped) sizes.unpersist()
  }

  /** Left-join a per-doc pair summary back onto the full doc list so the
    * output always has one row per document.
    */
  private def perDocSummaryUnsorted(docs: DataFrame, pairs: DataFrame, simCol: String,
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
  }

  private def perDocSummary(docs: DataFrame, pairs: DataFrame, simCol: String,
                            threshold: Double): DataFrame =
    perDocSummaryUnsorted(docs, pairs, simCol, threshold).orderBy(col("doc_id"))

  /** MinHash-LSH candidate pairs with exact-Jaccard scores — computed
    * ONCE per (session, dataset) and shared by the per-doc summary
    * ([[dedupMinhash]]) and the cluster builder ([[nearDupClusters]]):
    * the result is an eagerly checkpointed small pair set, so the
    * second consumer pays a block read, not a sketch-pipeline rerun.
    */
  private val pairsMemo = new DatasetMemo("documents.parquet")

  private[ops] def minhashVerifiedPairs(spark: SparkSession, dir: String): DataFrame =
    pairsMemo.getOrCompute(spark, dir)(
      minhashVerifiedPairs(Tables.documents(spark, dir), "doc_id", "text",
        materialize = true))

  /** Release the memoized verified-pair set for (session, dir):
    * unpersists its checkpointed RDD blocks and drops the memo entry.
    * Call when done with a dataset in a long-lived session. (Data
    * CHANGES are handled automatically — the memo tracks a file-level
    * data version and recomputes on mismatch — so this is purely a
    * storage-release API.)
    */
  def releasePairs(spark: SparkSession, dir: String): Unit =
    pairsMemo.release(spark, dir)

  /** Drop every memoized pair set across all sessions/datasets. */
  def clearPairsMemo(): Unit = pairsMemo.clear()

  /** Checkpointed-RDD ids retained by the memo for (session, dir) —
    * exposed for the cache-lifecycle contract tests.
    */
  private[graft] def memoRddIds(spark: SparkSession, dir: String): Set[Int] =
    pairsMemo.rddIds(spark, dir)

  private[graft] def minhashVerifiedPairs(spark: SparkSession, dir: String,
                                          materialize: Boolean): DataFrame =
    minhashVerifiedPairs(Tables.documents(spark, dir), "doc_id", "text", materialize)

  /** 16-band × 4-row LSH buckets from the 64-minhash signature of each
    * doc's shingle set — the shared candidate generator for
    * [[minhashVerifiedPairs]] and [[containmentPairs]]. Native
    * codegen'd MinHash (one fused shingles×64 loop) vs the
    * transform/array_min built-in composition's interpreted lambdas.
    */
  private def minhashBandBuckets(sets: DataFrame): DataFrame =
    sets.withColumn("sig", expr("minhash_sig(shset, 64)"))
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, 15), b -> xxhash64(b, sig[4*b], sig[4*b+1], sig[4*b+2], sig[4*b+3]))")))
      .withColumnRenamed("pos", "bucket_id")
      .withColumnRenamed("col", "bucket_hash")

  /** MinHash + LSH near-dup pair generation: 64 minhashes from the
    * seeded xxhash64 family → 16 bands × 4 rows → band-bucket join →
    * exact Jaccard verification. Only candidate pairs (≪ n²) ever touch
    * the verify join. Output: (doc_a, doc_b, jacc). No SQL oracle: the
    * sketch depends on Spark's xxhash64 hash family → rows-only check;
    * correctness is pinned by DedupSpec.
    */
  def minhashVerifiedPairs(docs: DataFrame, idCol: String, textCol: String,
                           materialize: Boolean): DataFrame = {
    val sets0 = shingleSets(docs, idCol, textCol)
    val sets = if (materialize) sets0.persist() else sets0
    try {
      val cand = lshCandidates(minhashBandBuckets(sets), maxBucket = 100, materialize)
      val verified = cand
        .join(sets.select(col("doc_id").as("doc_a"), col("shset").as("sa")), Seq("doc_a"))
        .join(sets.select(col("doc_id").as("doc_b"), col("shset").as("sb")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"), jaccard(col("sa"), col("sb")).as("jacc"))
      if (materialize) verified.localCheckpoint(true) else verified
    } finally if (materialize) sets.unpersist()
  }

  /** MinHash calibration report — the near-dup family's analogue of
    * the ANN recall report: for every LSH candidate pair, compare the
    * SKETCH's Jaccard estimate (matching signature slots / 64) against
    * the EXACT shingle Jaccard, bucketed by exact-similarity decile.
    * This is the measurement that justifies (or indicts) the 16×4
    * banding and 64-hash signature in production: estimator bias and
    * spread per similarity band, plus how many candidates each band
    * contributes. All scores are integer basis points (slot counts and
    * set sizes are exact ints; one floor division per figure) so the
    * report is deterministic and layout-invariant.
    *
    * Scale shape: candidates come from the same capped band-bucket
    * equi-join as [[minhashVerifiedPairs]] (never all pairs); the
    * signature is computed once per doc; the output is a ≤ 10-row
    * grid. xxhash64-seeded sketch → rows-only driver check; planted
    * identical/disjoint calibration pinned in DedupSpec.
    */
  def nearDupEval(spark: SparkSession, dir: String): DataFrame =
    nearDupEval(Tables.documents(spark, dir), "doc_id", "text")

  /** DataFrame-first form. */
  def nearDupEval(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sets = shingleSets(docs, idCol, textCol)
      .withColumn("sig", expr("minhash_sig(shset, 64)"))
      .persist()
    try {
      val buckets = sets.select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, 15), b -> xxhash64(b, sig[4*b], sig[4*b+1], sig[4*b+2], sig[4*b+3]))")))
        .withColumnRenamed("pos", "bucket_id")
        .withColumnRenamed("col", "bucket_hash")
      val cand = lshCandidates(buckets, maxBucket = 100, materialize = true)
      val scored = cand
        .join(sets.select(col("doc_id").as("doc_a"), col("shset").as("sa"),
          col("sig").as("siga")), Seq("doc_a"))
        .join(sets.select(col("doc_id").as("doc_b"), col("shset").as("sb"),
          col("sig").as("sigb")), Seq("doc_b"))
        .select(
          expr("size(filter(zip_with(siga, sigb, (x, y) -> x = y), v -> v)) * 10000L div 64")
            .as("est_bp"),
          (floor(jaccard(col("sa"), col("sb")) * 10000).cast("long")).as("exact_bp"))
        .select(col("est_bp"), col("exact_bp"),
          least(expr("exact_bp div 1000"), lit(9L)).as("decile"),
          abs(col("est_bp") - col("exact_bp")).as("abs_err"))
      scored.groupBy(col("decile"))
        .agg(count(lit(1)).as("n_pairs"),
          expr("sum(est_bp) div count(1)").as("avg_est_bp"),
          expr("sum(exact_bp) div count(1)").as("avg_exact_bp"),
          expr("sum(abs_err) div count(1)").as("avg_abs_err_bp"))
        .orderBy(col("decile"))
        // ≤10-row grid: materialize while `sets` is still cached, or the
        // unpersist below silently turns the cache into a double recompute
        .localCheckpoint(true)
    } finally sets.unpersist()
  }

  /** Per-document MinHash near-dup summary over any corpus frame. */
  def dedupMinhash(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.7): DataFrame =
    perDocSummary(docs.select(col(idCol).as("doc_id")),
      minhashVerifiedPairs(docs, idCol, textCol, materialize = true),
      "jacc", threshold)

  def dedupMinhash(spark: SparkSession, dir: String): DataFrame =
    perDocSummary(Tables.documents(spark, dir).select(col("doc_id")),
      minhashVerifiedPairs(spark, dir), "jacc", 0.7)

  /** Full lazy plan (no memo, no checkpoint) for plan contracts. */
  private[graft] def dedupMinhashPlan(spark: SparkSession, dir: String): DataFrame =
    perDocSummary(Tables.documents(spark, dir).select(col("doc_id")),
      minhashVerifiedPairs(spark, dir, materialize = false), "jacc", 0.7)

  private val IncNearTau = 0.7

  /** Incremental NEAR-duplicate classification — [[dedupIncremental]]'s
    * daily-ingest flow upgraded from exact digests to MinHash near-dups:
    * each arriving document is classified `near_dup_of_index` (a
    * verified Jaccard ≥ `tau` match in the already-ingested corpus),
    * `near_dup_in_increment` (greedy keep-first within the increment —
    * a SMALLER-id near-dup arrived in the same batch), or `new`. This
    * is the production shape for crawl ingestion: the index side is
    * sketched once (band buckets are exactly what a persisted LSH index
    * table stores), and the increment probes it with equi-joins — the
    * old corpus text is never re-shingled per ingest in a real
    * deployment (here both sides sketch from text for self-containment;
    * the join topology is the deployment's).
    *
    * Scale shape: BOTH sides of the vs-index probe join are
    * bucket-capped exactly like [[lshCandidates]] — a degenerate
    * boilerplate bucket on EITHER side would otherwise fan the join
    * out |new-in-bucket| × |old-in-bucket| (the same quadratic hazard
    * the self-join path caps); new-vs-index and new-vs-new candidates
    * both flow through (bucket, hash) equi-joins; verification is
    * exact Jaccard on the candidates only. The shingle sets AND the
    * band-bucket frames are persisted — each is read by 2+ downstream
    * joins, and without the memo every read would re-run the minhash
    * signature pass (the expensive part of the sketch). xxhash64
    * sketch → rows-only driver check; planted cross-batch near-dups
    * pinned in DedupSpec.
    */
  def dedupIncrementalNear(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    dedupIncrementalNear(docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", IncNearTau)
  }

  /** DataFrame-first form over any (id, text) index/increment frames. */
  def dedupIncrementalNear(oldDocs: DataFrame, newDocs: DataFrame,
                           idCol: String, textCol: String,
                           tau: Double): DataFrame = {
    require(tau > 0 && tau <= 1, s"dedupIncrementalNear: bad tau=$tau")
    val oldSets = shingleSets(oldDocs, idCol, textCol).persist()
    val newSets = shingleSets(newDocs, idCol, textCol).persist()
    val oldB = minhashBandBuckets(oldSets).persist()
    val newB = minhashBandBuckets(newSets).persist()
    try {
      // bucket caps on BOTH probe sides, computed like lshCandidates':
      // agg + keyed join, never a window over the bucket key
      def keepSmall(b: DataFrame): DataFrame =
        b.groupBy(col("bucket_id"), col("bucket_hash"))
          .agg(count(lit(1)).as("bsz")).filter(col("bsz") <= 100)
          .select(col("bucket_id"), col("bucket_hash"))
      val candOld = newB
        .join(keepSmall(newB), Seq("bucket_id", "bucket_hash"))
        .join(keepSmall(oldB), Seq("bucket_id", "bucket_hash"))
        .join(oldB.select(col("bucket_id"), col("bucket_hash"),
          col("doc_id").as("old_id")), Seq("bucket_id", "bucket_hash"))
        .select(col("doc_id"), col("old_id")).distinct()
      val vsIndex = candOld
        .join(newSets.select(col("doc_id"), col("shset").as("sn")), Seq("doc_id"))
        .join(oldSets.select(col("doc_id").as("old_id"), col("shset").as("so")), Seq("old_id"))
        .filter(jaccard(col("sn"), col("so")) >= tau)
        .select(col("doc_id")).distinct()
        .withColumn("of_index", lit(true))
      // within-increment: standard capped self-join candidates, greedy
      // keep-first (a smaller-id near-dup marks the larger id)
      val candNew = lshCandidates(newB, maxBucket = 100, materialize = true)
      val vsIncrement = candNew
        .join(newSets.select(col("doc_id").as("doc_a"), col("shset").as("sa")), Seq("doc_a"))
        .join(newSets.select(col("doc_id").as("doc_b"), col("shset").as("sb")), Seq("doc_b"))
        .filter(jaccard(col("sa"), col("sb")) >= tau)
        .select(col("doc_b").as("doc_id")).distinct()
        .withColumn("in_increment", lit(true))
      newSets.select(col("doc_id"))
        .join(vsIndex, Seq("doc_id"), "left")
        .join(vsIncrement, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("of_index"), "near_dup_of_index")
            .when(col("in_increment"), "near_dup_in_increment")
            .otherwise("new").as("status"))
        .orderBy(col("doc_id"))
        .localCheckpoint(true) // small: one (id, status) row per new doc
    } finally {
      oldB.unpersist(); newB.unpersist()
      oldSets.unpersist(); newSets.unpersist()
    }
  }

  private val ContainTau = 0.8

  /** Asymmetric containment detection: pairs where the SMALLER shingle
    * set is mostly inside the larger — C = |A∩B| / min(|A|,|B|) — the
    * quote/excerpt/boilerplate-wrapper case symmetric Jaccard dedup
    * structurally misses (a doc embedded verbatim in one 3× its length
    * has J ≈ 0.33, far under any dedup threshold, but C = 1.0).
    *
    * Candidates come from a CONTAINMENT-ORIENTED scheme, not Jaccard
    * banding: every document probes with its bottom-k smallest hashed
    * shingles (a deterministic uniform k-sample of its set, since the
    * hashes are uniform) against an inverted shingle→doc index. If
    * C = |A∩B|/|A| then each probe of A independently lands in B with
    * probability ≈ C, so a true pair at tau = 0.8 is missed with
    * probability (1−tau)^k ≈ 3e-6 at k = 8 — INDEPENDENT of the size
    * ratio. This is exactly the case Jaccard-tuned 16×4 banding is
    * structurally blind to: a tweet verbatim inside a book has J → 0
    * (no band can agree) but C = 1.0, and its bottom-k probes all hit.
    * Quadratic guard: posting lists with document frequency above a
    * cap are dropped from the index (an ultra-common boilerplate
    * shingle is no evidence of containment anyway — the same
    * stopword-key discipline as the LSH bucket caps). Index size is
    * O(total shingles) — linear, the same order as the shingle sets
    * themselves; the probe side is k rows per document. Containment is
    * then verified EXACTLY on each candidate's hashed shingle sets via
    * the fused `set_intersect_count`. Output: verified pairs at
    * C ≥ `tau`, one row per (id-ordered) pair. xxhash64 sketch →
    * rows-only driver check; planted subset recovery — including the
    * extreme tweet-inside-book ratio — pinned in DedupSpec.
    */
  def containmentPairs(spark: SparkSession, dir: String): DataFrame =
    containmentPairs(Tables.documents(spark, dir), "doc_id", "text", ContainTau)

  /** DataFrame-first form over any (id, text) frame. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       tau: Double): DataFrame =
    containmentPairsImpl(docs, idCol, textCol, tau, materialize = true)

  /** Full lazy plan (no persist, no checkpoint) for plan contracts. */
  private[graft] def containmentPairsPlan(spark: SparkSession, dir: String): DataFrame =
    containmentPairsImpl(Tables.documents(spark, dir), "doc_id", "text",
      ContainTau, materialize = false)

  private val ContainBottomK = 8
  private val ContainPostingCap = 100

  private def containmentPairsImpl(docs: DataFrame, idCol: String, textCol: String,
                                   tau: Double, materialize: Boolean): DataFrame = {
    require(tau > 0 && tau <= 1, s"containmentPairs: bad tau=$tau")
    val sets0 = shingleSets(docs, idCol, textCol)
    val sets = if (materialize) sets0.persist() else sets0
    try {
      // probe side: bottom-k smallest shingle hashes per doc (k rows/doc)
      val probes = sets.select(col("doc_id"),
        explode(slice(array_sort(col("shset")), 1, ContainBottomK)).as("sh"))
      // index side: inverted shingle→doc index, boilerplate posting
      // lists capped by document frequency (agg + keyed join — the
      // lshCandidates cap discipline, never a window)
      val inv = sets.select(col("doc_id").as("doc_o"), explode(col("shset")).as("sh"))
      val keep = inv.groupBy(col("sh"))
        .agg(count(lit(1)).as("df")).filter(col("df") <= ContainPostingCap)
        .select(col("sh"))
      val cand = probes
        .join(keep, Seq("sh"))
        .join(inv, Seq("sh"))
        .filter(col("doc_id") =!= col("doc_o"))
        .select(least(col("doc_id"), col("doc_o")).as("doc_a"),
          greatest(col("doc_id"), col("doc_o")).as("doc_b"))
        .distinct()
      val out = cand
        .join(sets.select(col("doc_id").as("doc_a"), col("shset").as("sa")), Seq("doc_a"))
        .join(sets.select(col("doc_id").as("doc_b"), col("shset").as("sb")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          call_function("set_intersect_count", col("sa"), col("sb")).as("n_common"),
          size(col("sa")).cast("long").as("n_a"),
          size(col("sb")).cast("long").as("n_b"))
        .withColumn("containment",
          round(col("n_common").cast("double") / least(col("n_a"), col("n_b")), 4))
        .withColumn("jacc", round(col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")), 4))
        .filter(col("containment") >= tau)
        .orderBy(col("doc_a"), col("doc_b"))
      // small: flagged pairs only — frees the sets cache
      if (materialize) out.localCheckpoint(true) else out
    } finally if (materialize) sets.unpersist()
  }

  /** Canonical-document selection for exact duplicates: keep the
    * lowest doc_id of every identical-text group — the "filter the
    * corpus" half of dedup (the summaries above are the "report"
    * half). Shape: a digest-keyed `groupBy(md5(text)).agg(min(id))`
    * census plus a LEFT SEMI join back on the id. Deliberately NOT a
    * window over the text column: a window shuffles the full document
    * text as the partition key AND sorts within groups; the census is
    * partial-aggregable (map-side combine collapses duplicates before
    * the exchange) and its shuffle key is a 16-byte digest. The
    * semi-join shuffles on the narrow id column only. PlanSpec pins
    * the no-window contract. Idempotent by construction (DedupSpec
    * pins it): once each text appears once, every row is its own
    * group minimum.
    */
  def canonicalize(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val keep = docs
      .groupBy(md5(col(textCol)).as("__digest"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  def dedupCanonical(spark: SparkSession, dir: String): DataFrame =
    canonicalize(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  val dedupCanonicalSql: String =
    """SELECT doc_id, lang, source, n_chars FROM documents
      |WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
      |ORDER BY doc_id""".stripMargin

  /** Duplicate-aware training weights — the SOFT alternative to hard
    * dedup (keep every copy, downweight each by its cluster size so a
    * document duplicated a thousand times contributes one document's
    * worth of gradient). Weight = 1e6/n_copies in integer PPM (floor),
    * so the report is cross-engine exact; a cluster's total weight is
    * within (n_copies−1) ppm of exactly 1.0.
    *
    * Scale shape: the same digest discipline as [[dedupExact]] /
    * [[canonicalize]] — one census aggregate keyed on the 16-byte
    * md5 digest, one digest-keyed equi-join back; no window, nothing
    * text-keyed crosses an exchange.
    */
  def dedupWeight(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val census = docs
      .groupBy(md5(col(textCol)).as("__digest"))
      .agg(count(lit(1)).as("n_copies"))
    docs.select(col(idCol).as("doc_id"), md5(col(textCol)).as("__digest"))
      .join(census, "__digest")
      .select(col("doc_id"), col("n_copies"),
        expr("1000000L div n_copies").as("weight_ppm"))
      .orderBy(col("doc_id"))
  }

  def dedupWeight(spark: SparkSession, dir: String): DataFrame =
    dedupWeight(Tables.documents(spark, dir), "doc_id", "text")

  val dedupWeightSql: String =
    """WITH c AS (SELECT text, count(*) AS n FROM documents GROUP BY text)
      |SELECT doc_id, CAST(n AS BIGINT) AS n_copies,
      |  CAST(1000000 // n AS BIGINT) AS weight_ppm
      |FROM documents JOIN c USING (text)
      |ORDER BY doc_id""".stripMargin

  /** Near-duplicate cluster formation: connected components over the
    * MinHash-verified similarity graph (Jaccard ≥ 0.7), via iterative
    * min-label propagation — each round, every doc takes the minimum
    * label among itself and its neighbors; fixpoint = each cluster
    * labeled by its smallest doc_id. Distributed throughout: per round
    * one join + one aggregation; the only driver-side value is the
    * converged? counter. Rounds are bounded by the graph diameter
    * (near-dup clusters are tiny; the 20-round cap is a safety net,
    * convergence is checked each round). Every round's label frame is
    * eagerly `localCheckpoint`ed: the checkpoint both materializes the
    * round (one action) and CUTS THE LINEAGE — without it, round N's
    * plan contains N copies of the join/agg and the whole sketch
    * pipeline, which is what kills iterative algorithms at scale.
    * The pair graph comes from the shared memoized
    * [[minhashVerifiedPairs]] — already checkpointed, so this op never
    * recomputes the sketch pipeline when [[dedupMinhash]] ran first.
    * Output: (doc_id, cluster, is_canonical) for every document.
    */
  def nearDupClusters(spark: SparkSession, dir: String): DataFrame =
    clusterPairs(
      minhashVerifiedPairs(spark, dir).filter(col("jacc") >= 0.7),
      Tables.documents(spark, dir).select(col("doc_id")))

  /** DataFrame-first form over any (id, text) corpus (no memoization —
    * caller owns the frame's lifecycle).
    */
  def nearDupClusters(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.7): DataFrame =
    clusterPairs(
      minhashVerifiedPairs(docs, idCol, textCol, materialize = true)
        .filter(col("jacc") >= threshold),
      docs.select(col(idCol).as("doc_id")))

  /** Connected components over ANY duplicate-pair frame — the cluster
    * builder is independent of which sketch produced the edges. `pairs`
    * needs (doc_a, doc_b) columns; `docs` needs doc_id (the universe,
    * for singleton clusters).
    */
  def clusterPairs(pairFrame: DataFrame, docs: DataFrame): DataFrame = {
    val pairs = pairFrame.select(col("doc_a"), col("doc_b"))
    // only docs with at least one edge enter the iteration — isolated
    // docs (the vast majority of a real corpus) are appended as
    // singleton clusters afterwards, so per-round work scales with the
    // duplicate-graph size, not the corpus size
    val adj = pairs
      .unionByName(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .unionByName(pairs.select(col("doc_a"), col("doc_a").as("doc_b"))) // self-loops
      .unionByName(pairs.select(col("doc_b").as("doc_a"), col("doc_b"))) // (both ends)
      .distinct()
      .localCheckpoint(true)
    var labels = adj.select(col("doc_a").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("cluster"))
      .localCheckpoint(true)
    var converged = false
    var round = 0
    while (!converged && round < 20) {
      val next = adj
        .join(labels.select(col("doc_id").as("doc_b"), col("cluster")), Seq("doc_b"))
        .groupBy(col("doc_a")).agg(min(col("cluster")).as("cluster"))
        .select(col("doc_a").as("doc_id"), col("cluster"))
        .join(labels.withColumnRenamed("cluster", "old"), Seq("doc_id"))
        .localCheckpoint(true) // materializes the round + cuts lineage
      val changed = next.filter(col("cluster") =!= col("old")).count()
      labels = next.select(col("doc_id"), col("cluster"))
      converged = changed == 0
      round += 1
    }
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
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    dedupSimhash(spark, dir, materialize = true)

  private[graft] def dedupSimhash(spark: SparkSession, dir: String,
                                  materialize: Boolean): DataFrame =
    dedupSimhash(Tables.documents(spark, dir), "doc_id", "text", materialize)

  def dedupSimhash(docs: DataFrame, idCol: String, textCol: String,
                   materialize: Boolean): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val sk0 = docs
      .select(col(idCol).as("doc_id"),
        expr(s"transform(split($textCol, ' '), t -> xxhash64(t))").as("hs"))
      // native codegen'd signature: one fused tokens×64 loop
      .withColumn("simhash", expr("simhash64(hs)"))
      .select(col("doc_id"), col("simhash"))
    val sk = if (materialize) sk0.persist() else sk0
    try {
      val buckets = sk.select(col("doc_id"),
          posexplode(expr(
            "transform(sequence(0, 3), c -> shiftright(simhash, 16*c) & 65535)")))
        .withColumnRenamed("pos", "bucket_id")
        .withColumnRenamed("col", "bucket_hash")
      val cand = lshCandidates(buckets, maxBucket = 100, materialize)
      val verified0 = cand
        .join(sk.select(col("doc_id").as("doc_a"), col("simhash").as("ha")), Seq("doc_a"))
        .join(sk.select(col("doc_id").as("doc_b"), col("simhash").as("hb")), Seq("doc_b"))
        // similarity in [0,1]: 1 − hamming/64, so the shared ≥-threshold
        // summary logic applies (hamming ≤ 3 ⇔ sim ≥ 0.953)
        .select(col("doc_a"), col("doc_b"),
          (lit(1.0) - expr("bit_count(ha ^ hb)") / lit(64.0)).as("sim"))
      val verified = if (materialize) verified0.localCheckpoint(true) else verified0
      // doc list from the raw corpus (column-pruned), NOT the signature
      // frame — the per-doc summary must not recompute signatures after
      // the cache is dropped
      perDocSummary(docs.select(col(idCol).as("doc_id")),
        verified, "sim", 1.0 - 3.0 / 64)
    } finally if (materialize) sk.unpersist()
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

  /** DataFrame-first form over any (id, vector) corpus. */
  def dedupEmbedding(corpus: DataFrame, idCol: String, vecCol: String,
                     threshold: Double = 0.95): DataFrame = {
    val pairs = Similarity.cosineCandidatePairs(corpus, idCol, vecCol,
      materialize = true)
    perDocSummary(corpus.select(col(idCol).as("doc_id")),
      pairs.select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("sim")),
      "sim", threshold)
  }

  /** Exact n-gram Jaccard dedup with content-banded blocking:
    * candidates share (lang, length bucket, one of their 3 smallest
    * shingle hashes). The content band is the scale-safety fix over
    * plain (lang, length) blocking: lang × length has FIXED cardinality,
    * so at 100× corpus scale every bucket blows past the cap and gets
    * dropped — recall silently collapses to zero. Banding on the
    * min-shingles makes bucket count grow with corpus content (MinHash
    * principle: docs with Jaccard ≥ J share their min shingle w.p. ≈ J,
    * and ≥1 of bottom-3 with much higher probability; exact duplicates
    * share all three), so buckets stay bounded as the corpus grows.
    *
    * Degradation is VISIBLE, not silent: the output carries a per-doc
    * `in_dropped_bucket` flag marking membership in any over-cap
    * (discarded) bucket — a monitoring query over the flag tells a
    * pipeline owner exactly how much recall the cap cost.
    */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    dedupNgramJaccard(spark, dir, materialize = true)

  private[graft] def dedupNgramJaccard(spark: SparkSession, dir: String,
                                       materialize: Boolean): DataFrame =
    dedupNgramJaccard(Tables.documents(spark, dir), "doc_id", "text",
      "lang", "n_chars", materialize)

  /** DataFrame-first form: `blockCol` and `sizeCol` define the blocking
    * key (candidates must share block, length bucket, and a content
    * band).
    */
  def dedupNgramJaccard(docs: DataFrame, idCol: String, textCol: String,
                        blockCol: String, sizeCol: String,
                        materialize: Boolean): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // one scan-speed projection carrying sketch + blocking metadata —
    // NOT shingleSets ⋈ meta, which would shuffle the corpus on doc_id
    val sets0 = docs.select(col(idCol).as("doc_id"),
      expr(s"shingle_hash(split($textCol, ' '), 3)").as("shset"),
      col(blockCol).as("lang"),
      (col(sizeCol) / 50).cast("int").as("lenb"))
    val sets = if (materialize) sets0.persist() else sets0
    try {
      val meta = sets.select(col("doc_id"))
      // one bucket per bottom-3 shingle hash: content grows the key
      // space; lang+length still restrict candidates to plausible pairs
      val buckets = sets.select(
        hash(col("lang")).as("bucket_id"),
        explode(expr("transform(slice(array_sort(shset), 1, 3), " +
          "b -> xxhash64(lenb, b))")).as("bucket_hash"),
        col("doc_id"))
      val (cand, droppedDocs) =
        lshCandidatesWithDropped(buckets, maxBucket = 1000, materialize)
      val verified0 = cand
        .join(sets.select(col("doc_id").as("doc_a"), col("shset").as("sa")), Seq("doc_a"))
        .join(sets.select(col("doc_id").as("doc_b"), col("shset").as("sb")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"), jaccard(col("sa"), col("sb")).as("jacc"))
      val verified = if (materialize) verified0.localCheckpoint(true) else verified0
      // visibility half of the bucket cap: a capped LSH scheme that
      // silently discards huge buckets reports zero duplicates for
      // their members — flag them instead of letting recall collapse
      // invisibly at scale
      val dropped = droppedDocs.withColumn("in_dropped_bucket", lit(1))
      perDocSummaryUnsorted(meta, verified, "jacc", 0.7)
        .join(dropped, Seq("doc_id"), "left")
        .na.fill(0, Seq("in_dropped_bucket"))
        .orderBy(col("doc_id"))
    } finally if (materialize) sets.unpersist()
  }

  private val SnmWindow = 4      // each doc vs its 3 sort predecessors
  private val SnmKeyLen = 16     // sort-key prefix of the normalized text
  private val SnmBlockLen = 2    // rank-stitching block prefix

  /** Sorted-neighborhood near-dup blocking (Hernández & Stolfo 1995):
    * sort the corpus by a normalized-prefix key and compare each
    * document only against its `window−1` sort predecessors — the
    * classic deterministic alternative to hash-banded LSH blocking,
    * and the only near-dup family member with an EXACT relational
    * definition (so this one is DuckDB-oracle-checked, where the
    * minhash/simhash entries are rows-only by sketch nature). A pair
    * is a duplicate when token-set Jaccard ≥ 1/2, tested in exact
    * integer arithmetic (`3·|∩| ≥ |A|+|B|` ⟺ J ≥ 1/2 — no doubles).
    *
    * Scale shape: the global sort rank is TWO-LEVEL — a bounded
    * block census (prefix of the sort key, ≤ ~1.3k blocks) carries
    * cumulative offsets, and `row_number` runs only WITHIN blocks, so
    * no single-partition global window ever materializes (the
    * documented ban — see `canonicalize`). Candidate generation is an
    * EQUI-join on rank (each doc explodes into `window−1` probe
    * ranks); pair volume is exactly `(window−1)·n`, independent of
    * skew. Lexicographic consistency: ordering by (block, key, id)
    * equals ordering by (key, id) because the block is a key prefix.
    */
  def sortedNeighborhood(spark: SparkSession, dir: String): DataFrame =
    sortedNeighborhood(Tables.documents(spark, dir), "doc_id", "text",
      SnmWindow, SnmKeyLen, SnmBlockLen, 1, 2)

  /** Normalized (doc_id, norm, toks) projection shared by the SNM
    * passes.
    */
  private def snmBase(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        trim(regexp_replace(regexp_replace(lower(col(textCol)),
          "[^a-z0-9 ]", ""), " +", " ")).as("norm"))
      .select(col("doc_id"), col("norm"),
        array_distinct(filter(split(col("norm"), " "),
          t => length(t) > 0)).as("toks"))

  /** One SNM pass: rank by `key` (two-level — bounded block-offset
    * frame + in-block row_number, the window's partition key is the
    * key's `blockLen` prefix), then emit each window candidate pair
    * with its exact token-intersection counts. Returns
    * (a_id, b_id, inter, stot) with a ranked strictly before b.
    */
  private def snmPairs(base: DataFrame, key: Column, window: Int,
                       blockLen: Int): DataFrame = {
    val keyed = base.select(col("doc_id"), col("toks"), key.as("key"))
      .withColumn("blk", substring(col("key"), 1, blockLen))
    val offsets = keyed.groupBy(col("blk")).agg(count(lit(1)).as("bc"))
      .withColumn("off",
        sum(col("bc")).over(Window.orderBy(col("blk"))) - col("bc"))
      .select(col("blk"), col("off"))
    val ranked = keyed.join(broadcast(offsets), Seq("blk"))
      .withColumn("rk",
        row_number().over(
          Window.partitionBy(col("blk")).orderBy(col("key"), col("doc_id")))
          .cast("long") + col("off"))
      .select(col("doc_id"), col("rk"), col("toks"))
    val probes = ranked.select(
      col("doc_id").as("a_id"), col("toks").as("a_toks"),
      explode(sequence(col("rk") + 1, col("rk") + (window - 1))).as("nr"))
    probes.join(
        ranked.select(col("rk").as("nr"), col("doc_id").as("b_id"),
          col("toks").as("b_toks")), Seq("nr"))
      .select(col("a_id"), col("b_id"),
        size(array_intersect(col("a_toks"), col("b_toks"))).as("inter"),
        (size(col("a_toks")) + size(col("b_toks"))).as("stot"))
  }

  /** DataFrame-first form; `thrNum/thrDen` is the exact rational
    * Jaccard threshold.
    */
  def sortedNeighborhood(docs: DataFrame, idCol: String, textCol: String,
                         window: Int, keyLen: Int, blockLen: Int,
                         thrNum: Int, thrDen: Int): DataFrame = {
    require(window >= 2, s"sortedNeighborhood: window=$window")
    require(blockLen >= 1 && blockLen <= keyLen,
      s"sortedNeighborhood: blockLen=$blockLen vs keyLen=$keyLen")
    require(thrNum >= 0 && thrDen >= 1,
      s"sortedNeighborhood: threshold $thrNum/$thrDen")
    val base = snmBase(docs, idCol, textCol)
    val pairs = snmPairs(base, substring(col("norm"), 1, keyLen),
      window, blockLen)
    val perDoc = pairs.groupBy(col("b_id"))
      .agg(count(lit(1)).as("n_cand"),
        min(when(col("inter") * (thrNum + thrDen) >= col("stot") * thrNum,
          col("a_id"))).as("dup_of"))
    base.select(col("doc_id"))
      .join(perDoc, col("doc_id") === col("b_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        col("dup_of"), col("dup_of").isNull.as("kept"))
      .orderBy(col("doc_id"))
  }

  val sortedNeighborhoodSql: String =
    """WITH b AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(regexp_replace(lower(text),
      |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
      |  FROM documents),
      |t AS (
      |  SELECT doc_id, substring(norm, 1, 16) AS key,
      |    list_distinct(list_filter(string_split(norm, ' '),
      |      x -> x <> '')) AS toks
      |  FROM b),
      |r AS (
      |  SELECT doc_id, toks,
      |    row_number() OVER (ORDER BY key, doc_id) AS rk
      |  FROM t),
      |p AS (
      |  SELECT a.doc_id AS a_id, bb.doc_id AS b_id,
      |    len(list_intersect(a.toks, bb.toks)) AS inter,
      |    len(a.toks) + len(bb.toks) AS stot
      |  FROM r a JOIN r bb ON bb.rk - a.rk BETWEEN 1 AND 3),
      |g AS (
      |  SELECT b_id, count(*) AS n_cand,
      |    min(CASE WHEN 3 * inter >= stot THEN a_id END) AS dup_of
      |  FROM p GROUP BY b_id)
      |SELECT t.doc_id,
      |  CAST(coalesce(n_cand, 0) AS BIGINT) AS n_cand,
      |  dup_of, (dup_of IS NULL) AS kept
      |FROM t LEFT JOIN g ON t.doc_id = g.b_id
      |ORDER BY t.doc_id""".stripMargin

  /** MULTI-PASS sorted-neighborhood — the production form (Hernández
    * & Stolfo run several passes with different sort keys precisely
    * because one key's sort can separate a true duplicate pair): a
    * second pass keyed on the NEXT `keyLen` characters catches pairs
    * whose prefixes diverge (a prepended header, a corrupted first
    * line) but whose bodies agree. Candidate pairs from all passes
    * are oriented by doc id (keeper = smaller id — pass-independent,
    * so the verdict cannot depend on which pass found the pair),
    * deduplicated exactly, and judged by the same integer Jaccard
    * test. Still fully oracle-checked; pair volume stays ≤
    * `passes·(window−1)·n` at any skew.
    */
  def snmMultipass(spark: SparkSession, dir: String): DataFrame =
    snmMultipass(Tables.documents(spark, dir), "doc_id", "text",
      SnmWindow, SnmKeyLen, SnmBlockLen, 1, 2)

  /** DataFrame-first form; pass 1 keys on `norm[1..keyLen]`, pass 2
    * on `norm[keyLen+1..2·keyLen]`.
    */
  def snmMultipass(docs: DataFrame, idCol: String, textCol: String,
                   window: Int, keyLen: Int, blockLen: Int,
                   thrNum: Int, thrDen: Int): DataFrame = {
    require(window >= 2, s"snmMultipass: window=$window")
    require(thrNum >= 0 && thrDen >= 1,
      s"snmMultipass: threshold $thrNum/$thrDen")
    val base = snmBase(docs, idCol, textCol)
    val p1 = snmPairs(base, substring(col("norm"), 1, keyLen),
      window, blockLen)
    val p2 = snmPairs(base, substring(col("norm"), keyLen + 1, keyLen),
      window, blockLen)
    val cand = p1.union(p2)
      .select(least(col("a_id"), col("b_id")).as("lo"),
        greatest(col("a_id"), col("b_id")).as("hi"),
        col("inter"), col("stot"))
      .distinct()
    val perDoc = cand.groupBy(col("hi"))
      .agg(count(lit(1)).as("n_cand"),
        min(when(col("inter") * (thrNum + thrDen) >= col("stot") * thrNum,
          col("lo"))).as("dup_of"))
    base.select(col("doc_id"))
      .join(perDoc, col("doc_id") === col("hi"), "left")
      .select(col("doc_id"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        col("dup_of"), col("dup_of").isNull.as("kept"))
      .orderBy(col("doc_id"))
  }

  val snmMultipassSql: String =
    """WITH b AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(regexp_replace(lower(text),
      |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
      |  FROM documents),
      |t AS (
      |  SELECT doc_id, substring(norm, 1, 16) AS k1,
      |    substring(norm, 17, 16) AS k2,
      |    list_distinct(list_filter(string_split(norm, ' '),
      |      x -> x <> '')) AS toks
      |  FROM b),
      |r1 AS (
      |  SELECT doc_id, toks,
      |    row_number() OVER (ORDER BY k1, doc_id) AS rk
      |  FROM t),
      |p1 AS (
      |  SELECT a.doc_id AS a_id, bb.doc_id AS b_id,
      |    len(list_intersect(a.toks, bb.toks)) AS inter,
      |    len(a.toks) + len(bb.toks) AS stot
      |  FROM r1 a JOIN r1 bb ON bb.rk - a.rk BETWEEN 1 AND 3),
      |r2 AS (
      |  SELECT doc_id, toks,
      |    row_number() OVER (ORDER BY k2, doc_id) AS rk
      |  FROM t),
      |p2 AS (
      |  SELECT a.doc_id AS a_id, bb.doc_id AS b_id,
      |    len(list_intersect(a.toks, bb.toks)) AS inter,
      |    len(a.toks) + len(bb.toks) AS stot
      |  FROM r2 a JOIN r2 bb ON bb.rk - a.rk BETWEEN 1 AND 3),
      |u AS (
      |  SELECT DISTINCT least(a_id, b_id) AS lo,
      |    greatest(a_id, b_id) AS hi, inter, stot
      |  FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)),
      |g AS (
      |  SELECT hi, count(*) AS n_cand,
      |    min(CASE WHEN 3 * inter >= stot THEN lo END) AS dup_of
      |  FROM u GROUP BY hi)
      |SELECT t.doc_id,
      |  CAST(coalesce(n_cand, 0) AS BIGINT) AS n_cand,
      |  dup_of, (dup_of IS NULL) AS kept
      |FROM t LEFT JOIN g ON t.doc_id = g.hi
      |ORDER BY t.doc_id""".stripMargin

  /** Jaccard threshold for [[similarityJoin]], in micro-units. */
  val SimJoinTauMicro = 500000L

  /** Exact-threshold set-similarity self-join via PREFIX FILTERING —
    * AllPairs (Bayardo, Ma & Srikant, WWW 2007), the exact complement
    * of the banded near-dup family: where [[dedupMinhash]] /
    * [[dedupNgramJaccard]] trade recall for candidate volume, this
    * op returns EVERY pair of documents whose 5-gram shingle Jaccard
    * meets the threshold — no sketches, no misses — and is therefore
    * the first fully ORACLE-CHECKED member of the near-dup family
    * (string shingles, not hashed: both engines build identical sets).
    *
    * Why it scales: J(A,B) ≥ t implies |A∩B| ≥ t·|A| (from
    * o/(|A|+|B|−o) ≥ t and |B| ≥ o), so ordering every document's
    * shingles by GLOBAL RARITY (df asc, shingle asc — one shared total
    * order) and keeping only the first |x| − ⌈t·|x|⌉ + 1 as its
    * PREFIX guarantees any qualifying pair collides on a prefix
    * element. Candidates come from an equality join of prefixes with
    * themselves — and because prefixes hold each document's RAREST
    * shingles, posting lists in that join are short by construction
    * (df-ascending order IS the skew protection; a popular shingle
    * can only enter a prefix if a document has nothing rarer, and a
    * corpus where that happens at volume is one where near-every pair
    * truly qualifies, so no exact algorithm can emit less). Exact
    * verification then counts true intersections for candidates only.
    *
    * Exactness: intersections/unions are exact integers;
    * j_micro = inter·1e6 DIV union truncates once. The ⌈t·n⌉ prefix
    * arithmetic is the exact integer form (n·τ + 999999) DIV 1e6.
    *
    * Scale posture: shingle explode is row-local; df census and the
    * prefix build are shingle-/doc-keyed shuffles (per-doc sort is
    * row-local over a doc-length-bounded set); the candidate join is
    * keyed on rare shingles; verification is candidate-keyed. No
    * cross join, no window, no driver state.
    */
  def similarityJoin(spark: SparkSession, dir: String): DataFrame =
    similarityJoin(Tables.documents(spark, dir), "doc_id", "text", 5,
      SimJoinTauMicro)

  /** DataFrame-first form: pairs with `ngram`-shingle Jaccard ≥
    * `tauMicro`/1e6 over any (id, text) frame.
    */
  def similarityJoin(docs: DataFrame, idCol: String, textCol: String,
                     ngram: Int, tauMicro: Long): DataFrame = {
    val sh = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("tk"))
      .select(col("doc_id"), explode(expr(
        s"""array_distinct(CASE WHEN size(tk) >= $ngram
           |  THEN transform(sequence(1, size(tk) - $ngram + 1),
           |                 i -> array_join(slice(tk, i, $ngram), ' '))
           |  ELSE array() END)""".stripMargin)).as("s"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val dfreq = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val prefix = sh.join(dfreq, Seq("s"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("arr"))
      .select(col("doc_id"), explode(expr(
        s"""slice(transform(arr, x -> x.s), 1,
           |  CAST(size(arr) - ((size(arr) * $tauMicro + 999999) DIV 1000000)
           |       + 1 AS INT))""".stripMargin)).as("s"))
    val cand = prefix.select(col("doc_id").as("da"), col("s"))
      .join(prefix.select(col("doc_id").as("db"), col("s")), Seq("s"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db")).distinct()
    val inter = cand
      .join(sh.select(col("doc_id").as("da"), col("s")), Seq("da"))
      .join(sh.select(col("doc_id").as("db"), col("s")), Seq("db", "s"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), Seq("da"))
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), Seq("db"))
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .withColumn("j_micro", expr("inter * 1000000 DIV uni"))
      .filter(col("j_micro") >= tauMicro)
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        col("inter"), col("uni"), col("j_micro"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** DuckDB twin of [[similarityJoin]] — an independent derivation:
    * shared-shingle blocking (exact, since J > 0 requires a common
    * shingle) instead of prefix filtering, then the same exact
    * intersection counts and one-DIV quantization.
    */
  val similarityJoinSql: String =
    s"""WITH tk AS (
       |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id,
       |      unnest([array_to_string(tk[i:i+4], ' ')
       |              FOR i IN generate_series(1, len(tk) - 4)]) AS s
       |    FROM tk)),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |cand AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(count(*) AS BIGINT) AS inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, inter,
       |  CAST(sa.n + sb.n - inter AS BIGINT) AS uni,
       |  CAST(inter * 1000000 // (sa.n + sb.n - inter) AS BIGINT) AS j_micro
       |FROM cand
       |JOIN sizes sa ON sa.doc_id = doc_a
       |JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE inter * 1000000 // (sa.n + sb.n - inter) >= $SimJoinTauMicro
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Prefix-key length / edit threshold for [[editJoin]]: pairs
    * within Levenshtein distance [[EditTau]] on the lowercased
    * first-[[EditKeyLen]]-chars key. Documents shorter than the key
    * are excluded (they are [[exactDedup]] territory — padding would
    * corrupt edit-distance semantics at the boundary), so every key
    * has EXACTLY this length and the equal-length PassJoin pigeonhole
    * applies.
    */
  val EditKeyLen = 48
  val EditTau = 2

  /** Exact edit-distance similarity self-join (Li, Deng & Feng's
    * PassJoin partition scheme, VLDB 2011) — the character-level
    * near-dup complement of [[similarityJoin]]'s token-level Jaccard:
    * every pair of documents whose lowercased 48-char prefixes are
    * within Levenshtein distance 2, found WITHOUT the O(n²) cross
    * join. Pigeonhole: partition one key into τ+1 = 3 disjoint
    * 16-char segments; any ≤ τ-edit pair must contain one segment of
    * the smaller-id key VERBATIM in the larger-id key at a position
    * shifted by at most τ — so candidates come from an equi-join of
    * indexed segments against ±τ-shifted probe windows (15 windows
    * per doc), and exact `levenshtein` verification (same unit-cost
    * semantics in both engines) removes false positives. The ORACLE
    * is the brute-force all-pairs form — an INDEPENDENT derivation
    * that re-proves the blocking's completeness on every corpus run
    * (feasible single-node at the gate SF; the Spark side never
    * materializes n²).
    *
    * Scale posture: segment/window explode is row-local (3 + 15 rows
    * per doc); the candidate join is keyed on (segment-index,
    * 16-gram); verification is candidate-keyed. No window, no driver
    * state. WORST CASE, stated honestly: a 16-gram segment shared by
    * k documents with DIVERSE suffixes generates k²/2 candidates that
    * all fail verification — exact edit joins are inherently
    * output-insensitive to such hot segments (any complete candidate
    * scheme is), and a cap would break the completeness the oracle
    * certifies. On boilerplate-heavy corpora run [[editJoinProfile]]
    * FIRST — its `hot_seg_docs` census costs one cheap scan and
    * predicts the blow-up before any candidate is paid for — and
    * prefer the capped family members
    * ([[similarityJoin]]'s rarity-ordered prefixes, or
    * [[sortedNeighborhood]]'s exactly-(w−1)·n pairs) when prefixes
    * repeat at scale. The 6-arg overload's `maxHotSegDocs` turns that
    * advice into an ENFORCED pre-flight: the census runs first and
    * the join refuses loudly instead of paying the blow-up.
    */
  def editJoin(spark: SparkSession, dir: String): DataFrame =
    editJoin(Tables.documents(spark, dir)
        .filter(length(col("text")) >= EditKeyLen)
        .select(col("doc_id"),
          lower(substring(col("text"), 1, EditKeyLen)).as("k")),
      "doc_id", "k", EditKeyLen, EditTau)

  /** DataFrame-first form over an (id, key) frame whose keys ALL have
    * exactly `keyLen` characters (the caller's contract — the
    * pigeonhole below is the equal-length form); `keyLen` must divide
    * into τ+1 equal segments.
    */
  def editJoin(df: DataFrame, idCol: String, kCol: String, keyLen: Int,
               tau: Int): DataFrame =
    editJoin(df, idCol, kCol, keyLen, tau, maxHotSegDocs = 0L)

  /** As above with an OPT-IN hot-segment guard: when `maxHotSegDocs`
    * > 0, the [[editJoinProfile]] `hot_seg_docs` census (one cheap
    * 3-rows/doc aggregate) runs FIRST and the join fails loudly — the
    * [[graft.ops.Curation.tCloseness]] domain-check discipline —
    * before any of the up-to-k²/2 doomed candidates is paid for. The
    * default (0 = unguarded) stays uncapped because a silent cap
    * would break the completeness the brute-force oracle certifies;
    * the guard refuses the whole job instead of corrupting its
    * output. On refusal, switch to [[similarityJoin]] or
    * [[sortedNeighborhood]], or raise the budget deliberately.
    */
  def editJoin(df: DataFrame, idCol: String, kCol: String, keyLen: Int,
               tau: Int, maxHotSegDocs: Long): DataFrame = {
    if (maxHotSegDocs > 0L) {
      val hot = df.select(col(idCol).as("id"), col(kCol).as("k"))
        .select(explode(array(editSegStructs(keyLen, tau): _*)).as("s"))
        .groupBy(col("s.si"), col("s.seg")).agg(count(lit(1)).as("c"))
        .agg(coalesce(max(col("c")), lit(0L)).as("hot"))
        .head().getLong(0)
      require(hot <= maxHotSegDocs,
        s"editJoin: hottest (segment-index, ${keyLen / (tau + 1)}-gram) " +
          s"bucket holds " +
          s"$hot docs > maxHotSegDocs=$maxHotSegDocs — up to " +
          s"${hot * (hot - 1) / 2} candidate pairs from one segment alone. " +
          "Run editJoinProfile for the full census; prefer similarityJoin " +
          "or sortedNeighborhood on boilerplate-heavy corpora, or raise " +
          "the budget deliberately")
    }
    editCandidates(df, idCol, kCol, keyLen, tau)
      .withColumn("dist", levenshtein(col("ka"), col("kb")).cast("long"))
      .filter(col("dist") <= tau)
      .select(col("a_id"), col("b_id"), col("dist"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** The PassJoin candidate set — distinct (a_id, b_id, ka, kb) pairs
    * whose keys share a (segment-index, exact-16-gram) blocking key —
    * shared by [[editJoin]] (which verifies with `levenshtein`) and
    * [[editJoinProfile]] (which COUNTS it against the verified set).
    */
  private def editCandidates(df: DataFrame, idCol: String, kCol: String,
                             keyLen: Int, tau: Int): DataFrame = {
    val nSeg = tau + 1
    require(keyLen % nSeg == 0, s"editJoin: $keyLen not divisible by $nSeg")
    val segLen = keyLen / nSeg
    val keys = df.select(col(idCol).as("id"), col(kCol).as("k"))
    val winStructs = for {
      i <- 1 to nSeg
      d <- -tau to tau
      p = (i - 1) * segLen + 1 + d
      if p >= 1 && p <= keyLen - segLen + 1
    } yield struct(lit(i).as("si"),
      expr(s"substring(k, $p, $segLen)").as("seg"))
    val segs = keys
      .select(col("id").as("a_id"), col("k").as("ka"),
        explode(array(editSegStructs(keyLen, tau): _*)).as("s"))
      .select(col("a_id"), col("ka"), col("s.si").as("si"),
        col("s.seg").as("seg"))
    val wins = keys
      .select(col("id").as("b_id"), col("k").as("kb"),
        explode(array(winStructs: _*)).as("w"))
      .select(col("b_id"), col("kb"), col("w.si").as("si"),
        col("w.seg").as("seg")).distinct()
    segs.join(wins, Seq("si", "seg"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("ka"), col("kb")).distinct()
  }

  /** The τ+1 fixed non-overlapping segments of a `keyLen`-char key as
    * (si, seg) structs — the probe side of the PassJoin block and the
    * unit of the hot-segment census.
    */
  private def editSegStructs(keyLen: Int, tau: Int) = {
    val nSeg = tau + 1
    val segLen = keyLen / nSeg
    (1 to nSeg).map(i =>
      struct(lit(i).as("si"), expr(
        s"substring(k, ${(i - 1) * segLen + 1}, $segLen)").as("seg")))
  }

  /** Scale-risk profile of [[editJoin]]'s blocking — the measurement
    * the scaladoc above tells 100 TB operators to take BEFORE running
    * the join on a boilerplate-heavy corpus. One row:
    *
    *  - `n_docs` — keys long enough to enter the join;
    *  - `n_cand` — distinct candidate pairs the segment/window block
    *    emits (the cost driver: every one pays a `levenshtein`);
    *  - `n_match` — pairs that verify at distance ≤ τ (the output);
    *  - `cand_per_match_milli` — the waste ratio ×1000 (truncating
    *    DIV; NULL when nothing matches). A healthy corpus sits near
    *    1000; boilerplate keys push it orders of magnitude higher —
    *    the signal to switch to the capped family members
    *    ([[similarityJoin]], [[sortedNeighborhood]]) instead;
    *  - `hot_seg_docs` — the largest (segment-index, exact 16-gram)
    *    bucket: k docs sharing one hot segment contribute up to
    *    k·(k−1)/2 candidates on their own, so this is the blow-up's
    *    leading indicator and is readable from a CHEAP census (one
    *    groupBy over 3 rows/doc) even when the join itself is not
    *    affordable.
    *
    * Scale posture: the census and the match count are keyed
    * aggregates over the same frames the join itself builds; nothing
    * here adds a pass the join would not pay. The DuckDB twin
    * recomputes `n_match` from the BRUTE-FORCE all-pairs definition
    * (not the blocked plan), so the profile also re-certifies
    * blocking completeness every run.
    */
  def editJoinProfile(spark: SparkSession, dir: String): DataFrame =
    editJoinProfile(Tables.documents(spark, dir)
        .filter(length(col("text")) >= EditKeyLen)
        .select(col("doc_id"),
          lower(substring(col("text"), 1, EditKeyLen)).as("k")),
      "doc_id", "k", EditKeyLen, EditTau)

  /** DataFrame-first form; same key contract as [[editJoin]]. */
  def editJoinProfile(df: DataFrame, idCol: String, kCol: String,
                      keyLen: Int, tau: Int): DataFrame = {
    val keys = df.select(col(idCol).as("id"), col(kCol).as("k"))
    val nDocs = keys.agg(count(lit(1)).as("n_docs"))
    val cand = editCandidates(df, idCol, kCol, keyLen, tau)
      .withColumn("ok",
        when(levenshtein(col("ka"), col("kb")) <= tau, 1L).otherwise(0L))
      .agg(count(lit(1)).as("n_cand"), coalesce(sum(col("ok")), lit(0L))
        .as("n_match"))
    val hot = keys
      .select(explode(array(editSegStructs(keyLen, tau): _*)).as("s"))
      .groupBy(col("s.si"), col("s.seg")).agg(count(lit(1)).as("c"))
      .agg(coalesce(max(col("c")), lit(0L)).as("hot_seg_docs"))
    nDocs.crossJoin(broadcast(cand)).crossJoin(broadcast(hot))
      .select(col("n_docs"), col("n_cand"), col("n_match"),
        when(col("n_match") === 0, lit(null))
          .otherwise(expr("n_cand * 1000 DIV n_match"))
          .as("cand_per_match_milli"),
        col("hot_seg_docs"))
  }

  /** DuckDB twin of [[editJoin]]: the brute-force all-pairs
    * definition itself — deliberately NOT the blocked plan, so the
    * oracle independently certifies the PassJoin candidate set is
    * complete.
    */
  val editJoinSql: String =
    s"""WITH k AS (
       |  SELECT doc_id, lower(substring(text, 1, $EditKeyLen)) AS k
       |  FROM documents WHERE length(text) >= $EditKeyLen)
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |  CAST(levenshtein(a.k, b.k) AS BIGINT) AS dist
       |FROM k a JOIN k b ON a.doc_id < b.doc_id
       |WHERE levenshtein(a.k, b.k) <= $EditTau
       |ORDER BY a_id, b_id""".stripMargin

  /** DuckDB twin of [[editJoinProfile]]: `n_cand`/`hot_seg_docs`
    * replicate the blocking (they are properties OF the scheme), but
    * `n_match` is the brute-force all-pairs count — independent of
    * the blocked plan, so a profile run re-certifies candidate
    * completeness (blocked verified count = true pair count) as a
    * side effect.
    */
  val editJoinProfileSql: String = {
    val nSeg = EditTau + 1
    val segLen = EditKeyLen / nSeg
    val maxP = EditKeyLen - segLen + 1
    s"""WITH k AS (
       |  SELECT doc_id, lower(substring(text, 1, $EditKeyLen)) AS k
       |  FROM documents WHERE length(text) >= $EditKeyLen),
       |segs AS (
       |  SELECT doc_id AS a_id, i AS si,
       |    substring(k, CAST((i-1)*$segLen+1 AS INT), $segLen) AS seg
       |  FROM k, generate_series(1, $nSeg) g(i)),
       |wins AS (
       |  SELECT DISTINCT doc_id AS b_id, i AS si,
       |    substring(k, CAST((i-1)*$segLen+1+d AS INT), $segLen) AS seg
       |  FROM k, generate_series(1, $nSeg) g(i),
       |    generate_series(-$EditTau, $EditTau) h(d)
       |  WHERE (i-1)*$segLen+1+d BETWEEN 1 AND $maxP),
       |cand AS (
       |  SELECT count(*) AS n_cand FROM (
       |    SELECT DISTINCT a_id, b_id FROM segs JOIN wins USING (si, seg)
       |    WHERE a_id < b_id) t),
       |mtch AS (
       |  SELECT count(*) AS n_match
       |  FROM k a JOIN k b ON a.doc_id < b.doc_id
       |  WHERE levenshtein(a.k, b.k) <= $EditTau),
       |hot AS (
       |  SELECT coalesce(max(c), 0) AS hot_seg_docs FROM (
       |    SELECT si, seg, count(*) AS c FROM segs GROUP BY 1, 2) t)
       |SELECT (SELECT CAST(count(*) AS BIGINT) FROM k) AS n_docs,
       |  CAST(n_cand AS BIGINT) AS n_cand,
       |  CAST(n_match AS BIGINT) AS n_match,
       |  CASE WHEN n_match = 0 THEN NULL
       |    ELSE CAST(n_cand * 1000 // n_match AS BIGINT)
       |  END AS cand_per_match_milli,
       |  CAST(hot_seg_docs AS BIGINT) AS hot_seg_docs
       |FROM cand, mtch, hot""".stripMargin
  }
}
