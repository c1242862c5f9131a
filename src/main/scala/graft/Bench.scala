package graft

/** Benchmark main: times every `SparkEntry.queries` entry on
  * SPARK_GRAFT_SF_DIR over ITERS full rounds (default 5), preceded by
  * ONE untimed warmup round, and prints ONE JSON line. Per-query value
  * is the MEDIAN across timed rounds (min/max recorded alongside) —
  * single-shot numbers on a shared box cannot support per-query
  * regression calls — and `tmin` (sum of per-query minima over
  * warmed-up runs) is the contention-robust headline the gate reads
  * when `spread` says the box was loaded (see BASELINE.md "Gate
  * basis"). Queries run round-robin (every query once per round) so
  * machine-load noise spreads across the set instead of hitting one
  * query's consecutive runs. A failing query is caught per-query and
  * recorded (median −1, error message) so the driver still gets every
  * other timing; the process exits non-zero AFTER writing results.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // 5 rounds (was 3): a box-load spike during one round now leaves the
    // median supported by 4 clean samples instead of 2 — r5's driver run
    // had per-query max/min spreads up to 72× purely from contention
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "5").toInt.max(1)
    val spark = GraftSession.local(cpus.toInt, "graft-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.quietBoundedWindowWarnings()
    // Warm the JVM + parquet footer caches ON THE BENCHMARKED DATASET
    // so the first timed query doesn't absorb one-time session costs.
    graft.ops.Relational.pricingSummary(spark, sfDir).count()

    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b — time a subset while iterating on
    // an operator (the driver never sets it; default is every query)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val times = scala.collection.mutable.LinkedHashMap(
      names.map { case (n, _) => n -> scala.collection.mutable.ArrayBuffer.empty[Double] }: _*)
    val errs = scala.collection.mutable.Map.empty[String, String]
    // One UNTIMED warmup round before the timed rounds (disable with
    // SPARK_GRAFT_BENCH_WARMUP=0 while iterating): the first execution
    // of each query pays one-time costs no later run sees — codegen
    // compilation of its generated classes, JIT warmup of those paths,
    // parquet footer reads. Round-robin already spreads that across
    // rounds, but on a contended box the median of 5 keeps one
    // first-run sample; with the warmup round every TIMED sample is a
    // steady-state run, so tmin (the headline alongside the median sum
    // — see BASELINE.md "Gate basis") estimates the uncontended total,
    // not the uncontended-minus-warmup total.
    val warmup = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1").toInt > 0
    val rounds = (if (warmup) Seq(0) else Seq.empty) ++ (1 to iters)
    for (round <- rounds) {
      // the memoized MinHash pair set AND signed embedding corpus are
      // cleared once per ROUND: within a round q_dedup_clusters
      // legitimately reuses q_dedup_minhash's checkpointed pairs and
      // q_dedup_embedding/q_ann_lsh share the signed corpus (the
      // operators' documented design); across rounds each round re-pays
      // the full sketch pipeline, so medians time the real work, not a
      // warm checkpoint read
      graft.ops.Dedup.clearPairsMemo()
      graft.ops.Similarity.clearSignedMemo()
      // same discipline for the shared purchase-graph frames: within a
      // round the seven structural queries legitimately share one edge
      // frame and one pair census; across rounds each round re-pays them
      graft.ops.Graph.clearGraphMemo()
      // ditto the segment-labeled order fact shared by the per-segment
      // statistics: within a round the first pays the join, across
      // rounds each round re-pays it
      graft.ops.SegOrders.clear()
      names.foreach { case (name, fn) =>
        if (!errs.contains(name)) {
          val t0 = System.nanoTime()
          try {
            // Noop sink: consumes every output row/column, so projection
            // batteries time the full plan, not a pruned row count.
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            if (round > 0) times(name) += (System.nanoTime() - t0) / 1e9
          } catch {
            case scala.util.control.NonFatal(e) =>
              // Only TIMED rounds latch a failure: a transient error in
              // the untimed warmup round would otherwise skip the query
              // for every timed round, erasing all its timing signal
              // while still reporting it failed.
              if (round > 0)
                errs(name) = e.toString.replaceAll("[\"\\\\\n\r\t]", " ").take(300)
          }
        }
      }
    }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    def f(d: Double) = "%.4f".format(d)
    val failed = errs.keys.map(n => s"\"$n\"").mkString("[", ",", "]")
    val total = times.collect {
      case (n, ts) if !errs.contains(n) && ts.nonEmpty => median(ts.toSeq)
    }.sum
    // Contention-at-a-glance for the stdout line (per-query min/max
    // live in BENCH_LAST.json; repeating them per query would blow the
    // 1940-char budget): "tmin" is the sum of per-query MINIMA — the
    // total an uncontended box would post — and "spread" is the worst
    // per-query max/median ratio. A contended round shows as
    // total >> tmin or spread >> 2.
    val totalMin = times.collect {
      case (n, ts) if !errs.contains(n) && ts.nonEmpty => ts.min
    }.sum
    val spread = times.collect {
      case (n, ts) if !errs.contains(n) && ts.nonEmpty && median(ts.toSeq) > 0 =>
        ts.max / median(ts.toSeq)
    }.foldLeft(1.0)(math.max)
    // Full per-query stats (median/min/max, n_ok = rounds that completed —
    // distinguishes "failed round 3 of 3" from "never ran") go to the side
    // file ONLY. The stdout line must stay compact: the harness that reads
    // it keeps a bounded tail of output, and a stats-laden line gets its
    // head truncated past ~2000 chars, making the JSON unparseable.
    val stats = times.map { case (name, ts) =>
      val base = s"""\"n_ok\":${ts.length}"""
      val body = errs.get(name) match {
        case Some(e) => s"""$base,\"error\":\"$e\"""" + (
          if (ts.nonEmpty) s""",\"median\":${f(median(ts.toSeq))}""" else "")
        case None =>
          s"""$base,\"median\":${f(median(ts.toSeq))},\"min\":${f(ts.min)},\"max\":${f(ts.max)}"""
      }
      s"\"$name\":{$body}"
    }.mkString("{", ",", "}")
    // Compact stdout line: per-query MEDIANS at reduced precision with
    // trailing zeros trimmed ("1.2", not "1.200"). The ~1650 chars of
    // query NAMES dominate the line, so every byte of value formatting
    // counts: "sf" is the directory BASENAME (the full path lives in
    // BENCH_LAST.json), and precision is magnitude-aware — a 45-second
    // query doesn't need centisecond digits. If the query set ever
    // grows the line past the tail window, degrade (2→1→0 decimals)
    // before dropping the per-query map entirely — partial precision
    // beats an unparseable line, and an empty map is the very last
    // resort.
    def trim(d: Double, dp: Int): String = {
      val s = s"%.${dp}f".format(d)
      if (!s.contains('.')) s
      else s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
    }
    val sfBase = new java.io.File(sfDir).getName
    // The uniform "q_" key prefix is stripped in the stdout map only —
    // 2 chars × ~90 queries is the difference between centisecond and
    // whole-second medians in the tail window. The line carries
    // "prefix":"q_" so the renaming is self-describing; BENCH_LAST.json
    // keeps full names.
    def compactLine(dp: Int, withQueries: Boolean): String = {
      val qs =
        if (!withQueries) "{}"
        else times.map { case (name, ts) =>
          val m = if (errs.contains(name) || ts.isEmpty) -1.0 else median(ts.toSeq)
          // magnitude-aware: sub-10s values keep dp decimals, 10s+ one
          // fewer — resolution stays ~1% of the value either way
          val useDp = if (math.abs(m) >= 10) (dp - 1).max(0) else dp
          s"\"${name.stripPrefix("q_")}\":${trim(m, useDp)}"
        }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${f(total)},"tmin":${trim(totalMin, 2)},""" +
        s""""spread":${trim(spread, 1)},"unit":"sec","prefix":"q_",""" +
        s""""queries":$qs,"iters":$iters,"failed":$failed,"sf":"$sfBase"}"""
    }
    // Past ~110 queries even the 0-decimal full map overflows the tail
    // window (the ~1500 bytes of names are irreducible), so the next
    // rung keeps the MOST EXPENSIVE queries — the ones a plan audit
    // needs — and says how many cheap ones were cut ("omitted":k).
    // BENCH_LAST.json always has the full set.
    def topLine(dp: Int): String = {
      val medians = times.map { case (name, ts) =>
        name -> (if (errs.contains(name) || ts.isEmpty) -1.0 else median(ts.toSeq))
      }.toSeq.sortBy { case (_, m) => -m }
      val budget = 1940 -
        compactLine(dp, false).length - ""","omitted":000""".length
      val (entries, _) = medians.foldLeft((List.empty[String], 0)) {
        case ((acc, used), (name, m)) =>
          val useDp = if (math.abs(m) >= 10) (dp - 1).max(0) else dp
          val e = s"\"${name.stripPrefix("q_")}\":${trim(m, useDp)}"
          if (used + e.length + 1 <= budget) (e :: acc, used + e.length + 1)
          else (acc, used)
      }
      val omitted = medians.length - entries.length
      s"""{"metric":"total","value":${f(total)},"tmin":${trim(totalMin, 2)},""" +
        s""""spread":${trim(spread, 1)},"unit":"sec","prefix":"q_",""" +
        s""""queries":${entries.reverse.mkString("{", ",", "}")},""" +
        s""""omitted":$omitted,"iters":$iters,"failed":$failed,"sf":"$sfBase"}"""
    }
    // 1940, not 2000: the tail window also has to hold the build tool's
    // "[success] Total time: …" footer (~80 chars), so leave headroom
    // for exactly that and spend the rest on per-query precision.
    // last-resort fallback can never be absent: even if the query-less
    // line overflows (e.g. a huge failed-query list), emit it anyway —
    // an over-long metric line beats no metric line at all
    val line = (Seq(2, 1, 0).map(compactLine(_, true)) ++ Seq(topLine(2), topLine(1)) :+
      compactLine(2, false))
      .find(_.length <= 1940).getOrElse(compactLine(2, false))
    val full = s"""{"metric":"total","value":${f(total)},"tmin":${f(totalMin)},""" +
      s""""spread":${f(spread)},"unit":"sec","warmup":${if (warmup) 1 else 0},""" +
      s""""iters":$iters,"stats":$stats,"failed":$failed,"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LAST.json"),
      (full + "\n").getBytes("UTF-8"))
    // Stop Spark BEFORE printing so the compact line is the LAST stdout
    // write of the process — nothing may land after it in the tail window.
    try spark.stop() catch { case scala.util.control.NonFatal(_) => () }
    println(line)
    if (errs.nonEmpty) sys.exit(1)
  }
}
