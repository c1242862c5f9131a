package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One (band-bucket, document) probe row: the unit of work of the
  * streaming near-dup index. `shset` rides along so verification needs
  * no second lookup (see [[StreamingDedup.nearDupIngest]] on the trade).
  */
case class BandProbe(bucket_id: Int, bucket_hash: Long, doc_id: Long,
                     shset: Seq[Long])

/** Per-bucket state: the capped member list (parallel id/set seqs). */
case class BucketState(ids: Seq[Long], sets: Seq[Seq[Long]])

/** A [[BandProbe]] carrying its event time — the evicting overload's
  * probe row (the timestamp anchors the bucket's retention timeout).
  */
case class TimedBandProbe(bucket_id: Int, bucket_hash: Long, doc_id: Long,
                          shset: Seq[Long], ts: java.sql.Timestamp)

/** A verified streaming near-dup hit: `doc_id` arrived after (or in the
  * same micro-batch as, with a larger id than) `matched_id`.
  */
case class NearDupHit(doc_id: Long, matched_id: Long, jacc: Double)

/** Streaming near-duplicate ingestion — the state-store twin of
  * [[graft.ops.Dedup.dedupIncrementalNear]]: a continuously arriving
  * document stream is checked against everything that arrived before
  * it, via the SAME MinHash band-bucket index the batch path joins on
  * (identical `shingle_hash`/`minhash_sig`/band-key expressions, so
  * stream and batch compute identical sketches — the batch-parity spec
  * pins it).
  *
  * Topology: each document fans out to its 16 band keys; the state
  * store keys groups by (bucket_id, bucket_hash) — at scale that is
  * the SAME partitioning the batch equi-join shuffles on, distributed
  * across executors by the state store. Each bucket group carries a
  * CAPPED member list (`maxBucket`, default 100 — the
  * [[graft.ops.Dedup]] bucket-cap discipline: a degenerate boilerplate
  * bucket saturates and stops indexing instead of going quadratic);
  * an arriving probe verifies exact Jaccard against the members in
  * plain row-local Scala (same |A∩B| / (|A|+|B|−|A∩B|) formula in the
  * same IEEE double arithmetic as the batch verifier) and then joins
  * the list. Greedy keep-first falls out of arrival order: a hit's
  * `matched_id` always arrived first (ties within a micro-batch break
  * by doc_id, the batch op's order).
  *
  * State weight, stated honestly: members carry their full hashed
  * shingle set, so a bucket holds ≤ maxBucket × |set| longs. That is
  * the streaming price of single-pass verification — the batch twin
  * reads the sets from the corpus at verify time; a production
  * deployment that can afford a second hop would hold only doc ids in
  * bucket state and verify against a doc→set side store. The base
  * overload uses NoTimeout — the index persists for the stream's life
  * (the batch twin's persisted index table); the timestamped overload
  * bounds retention with watermark-driven EVENT-time eviction (quiet
  * buckets forgotten past `idleRetentionMs`, the crawl-freshness
  * posture).
  *
  * A pair sharing several bands can be emitted once per shared band —
  * `distinct()` downstream, exactly like the batch candidate
  * `distinct()`. Output mode: Append.
  */
object StreamingDedup {

  /** Band-probe fan-out: one row per (doc, band) with the doc's hashed
    * shingle set — built from the SAME native expressions as the batch
    * sketch pipeline (`graft.ops.Dedup`), which is what makes
    * stream/batch parity exact rather than approximate.
    */
  private def bandProbes(docs: DataFrame, idCol: String, textCol: String): Dataset[BandProbe] = {
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    docs
      .select(col(idCol).as("doc_id"),
        expr(s"shingle_hash(split($textCol, ' '), 3)").as("shset"))
      .withColumn("sig", expr("minhash_sig(shset, 64)"))
      .select(col("doc_id"), col("shset"),
        posexplode(expr(
          "transform(sequence(0, 15), b -> xxhash64(b, sig[4*b], sig[4*b+1], sig[4*b+2], sig[4*b+3]))")))
      .select(col("pos").cast("int").as("bucket_id"),
        col("col").as("bucket_hash"), col("doc_id"), col("shset"))
      .as[BandProbe]
  }

  /** Row-local exact intersection count — the Scala twin of the
    * codegen'd [[graft.functions.SetIntersectCount]] (hash-set the
    * smaller side, probe with the larger).
    */
  private def intersectCount(a: Seq[Long], b: Seq[Long]): Long = {
    val (small, large) = if (a.length <= b.length) (a, b) else (b, a)
    if (small.isEmpty) 0L
    else {
      val set = new java.util.HashSet[java.lang.Long](small.length * 2)
      small.foreach(set.add(_))
      var c = 0L
      large.foreach(x => if (set.contains(x)) c += 1L)
      c
    }
  }

  /** The streaming near-dup operator. Works identically over a
    * streaming or batch `docs` frame (the parity spec runs both).
    */
  def nearDupIngest(docs: DataFrame, idCol: String, textCol: String,
                    tau: Double, maxBucket: Int = 100): Dataset[NearDupHit] = {
    require(tau > 0 && tau <= 1, s"nearDupIngest: bad tau=$tau")
    val spark = docs.sparkSession
    import spark.implicits._
    bandProbes(docs, idCol, textCol)
      .groupByKey(p => (p.bucket_id, p.bucket_hash))
      .flatMapGroupsWithState[BucketState, NearDupHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, rows: Iterator[BandProbe], state: GroupState[BucketState]) =>
          var st = state.getOption.getOrElse(BucketState(Vector.empty, Vector.empty))
          val out = Seq.newBuilder[NearDupHit]
          rows.toSeq.sortBy(_.doc_id).foreach { p =>
            var i = 0
            while (i < st.ids.length) {
              if (st.ids(i) != p.doc_id) {
                val b = st.sets(i)
                val c = intersectCount(p.shset, b)
                val j = c.toDouble / (p.shset.length + b.length - c)
                if (j >= tau) out += NearDupHit(p.doc_id, st.ids(i), j)
              }
              i += 1
            }
            if (st.ids.length < maxBucket && !st.ids.contains(p.doc_id))
              st = BucketState(st.ids :+ p.doc_id, st.sets :+ p.shset)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Bounded-retention overload — the NoTimeout form above keeps the
    * index for the stream's life (the persisted-index contract); this
    * one EVICTS a band bucket once the watermark advances
    * `idleRetentionMs` of event time past the bucket's last probe —
    * the crawl-ingest posture where near-dups only matter within a
    * freshness horizon and state must stay bounded by the horizon's
    * traffic, not the stream's history. Contract after eviction: the
    * bucket restarts EMPTY, so a duplicate arriving after the quiet
    * gap is NOT flagged against pre-gap members (they are forgotten —
    * the point of the horizon) and becomes the bucket's new first
    * member; stream/batch parity therefore holds per
    * quiet-gap-delimited segment, the
    * [[graft.streaming.EventTime.pageHinkleyWithState]] idle-retention
    * contract verbatim. The timeout is EVENT-time anchored
    * (`last probe ts + idleRetentionMs`, never the epoch-0 initial
    * watermark), so first-batch buckets are not evicted spuriously.
    */
  def nearDupIngest(docs: DataFrame, idCol: String, textCol: String,
                    tsCol: String, watermark: String, idleRetentionMs: Long,
                    tau: Double, maxBucket: Int): Dataset[NearDupHit] = {
    require(tau > 0 && tau <= 1, s"nearDupIngest: bad tau=$tau")
    require(idleRetentionMs > 0,
      s"nearDupIngest: idleRetentionMs must be positive, got $idleRetentionMs" +
        " (use the overload without a timestamp for an unbounded index)")
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    docs
      .withWatermark(tsCol, watermark)
      .select(col(idCol).as("doc_id"), col(tsCol).as("ts"),
        expr(s"shingle_hash(split($textCol, ' '), 3)").as("shset"))
      .withColumn("sig", expr("minhash_sig(shset, 64)"))
      .select(col("doc_id"), col("ts"), col("shset"),
        posexplode(expr(
          "transform(sequence(0, 15), b -> xxhash64(b, sig[4*b], sig[4*b+1], sig[4*b+2], sig[4*b+3]))")))
      .select(col("pos").cast("int").as("bucket_id"),
        col("col").as("bucket_hash"), col("doc_id"), col("shset"), col("ts"))
      .as[TimedBandProbe]
      .groupByKey(p => (p.bucket_id, p.bucket_hash))
      .flatMapGroupsWithState[BucketState, NearDupHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_, rows: Iterator[TimedBandProbe], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            // quiet past the horizon: forget the bucket entirely
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(
              BucketState(Vector.empty, Vector.empty))
            val out = Seq.newBuilder[NearDupHit]
            val batch = rows.toSeq
            batch.sortBy(_.doc_id).foreach { p =>
              var i = 0
              while (i < st.ids.length) {
                if (st.ids(i) != p.doc_id) {
                  val b = st.sets(i)
                  val c = intersectCount(p.shset, b)
                  val j = c.toDouble / (p.shset.length + b.length - c)
                  if (j >= tau) out += NearDupHit(p.doc_id, st.ids(i), j)
                }
                i += 1
              }
              if (st.ids.length < maxBucket && !st.ids.contains(p.doc_id))
                st = BucketState(st.ids :+ p.doc_id, st.sets :+ p.shset)
            }
            state.update(st)
            // re-armed only when the bucket sees traffic; anchored to
            // the probes' own event time (the initial watermark is 0 —
            // an epoch-0-relative timeout would evict every first-batch
            // bucket on the next trigger)
            val lastTs = batch.iterator.map(_.ts.getTime).max
            state.setTimeoutTimestamp(
              math.max(lastTs + idleRetentionMs,
                state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }
}
