package graft

import org.apache.spark.sql.SparkSession

/** Production `SparkSession` factory — the one place the engine's
  * 100 TB posture is spelled out as configuration rather than prose.
  * Every knob here is Spark-public; callers get a plain `Builder` back
  * and can override anything before `getOrCreate()`.
  *
  * What it pins and why:
  *  - `graft.functions.GraftExtensions` — the native codegen expression family
  *    (vec_dot / simhash64 / minhash_sig / …) resolves in `spark.sql`
  *    and `expr(...)` without a per-session `register` call.
  *  - AQE + skew-join + partition coalescing — runtime re-planning is
  *    the first line of defense at scale: skewed fact joins split hot
  *    partitions, tiny post-shuffle partitions merge, and join
  *    strategies demote/promote on real sizes, not estimates.
  *  - UTC session timezone — timestamp determinism; every oracle and
  *    every test in this repo assumes it.
  *  - 256 MiB scan partitions — big enough that a 1000-executor read
  *    is not task-launch-bound, small enough to fit executor memory
  *    next to shuffle buffers.
  *  - Shuffle partitions are a REQUIRED caller decision, not a magic
  *    default: the right number is data-volume-dependent (a good rule:
  *    total shuffle bytes / 200 MiB), and AQE coalescing makes
  *    overshooting cheap — so size for the biggest stage.
  */
object GraftSession {

  /** Cluster-posture builder. `shufflePartitions`: size for the largest
    * shuffle stage (AQE coalesces the rest down).
    */
  def builder(appName: String, shufflePartitions: Int): SparkSession.Builder = {
    require(shufflePartitions >= 1, "shufflePartitions must be positive")
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", s"${256L * 1024 * 1024}")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // Static conf: the generated-class cache defaults to 100 entries,
      // sized for a handful of hot queries. An analytics service running
      // hundreds of distinct query shapes (this library registers 230+)
      // thrashes it and pays Janino recompilation on every re-run; a
      // 10k-entry cache keeps every compiled projection/predicate/
      // WholeStageCodegen unit resident for the life of the session at
      // a bounded metaspace cost (classes are small; eviction is LRU).
      .config("spark.sql.codegen.cache.maxEntries", "10000")
  }

  /** Single-process variant for tools and tests: same posture, local
    * master, shuffle width matched to the core count (matching the
    * driver contract's `local[n]` environment).
    */
  /** Silence WindowExec's "No Partition Defined" WARN in local tool
    * and test runs. The library's ~20 unpartitioned windows are all
    * over aggregated censuses whose row counts are bounded by
    * construction (audited; PlanSpec pins the shapes), but WindowExec
    * WARNs on every one — hundreds of identical lines per run that
    * bury real warnings. Call AFTER `getOrCreate()` (SparkContext
    * startup re-initializes the log4j2 configuration, wiping levels
    * set earlier). Deliberately NOT wired into the cluster builder:
    * a genuinely unbounded global window still warns in production.
    */
  def quietBoundedWindowWarnings(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

  def local(cores: Int, appName: String = "graft"): SparkSession.Builder = {
    builder(appName, shufflePartitions = cores)
      .master(s"local[$cores]")
      .config("spark.ui.enabled", "false")
      // Local-process IO posture ONLY (cluster builds above keep the
      // defaults): a single-host shuffle moves blocks through the OS
      // page cache, never a NIC, so lz4 on the shuffle path is pure
      // CPU overhead with no bandwidth to buy back — measured ~8% off
      // the shuffle-heavy suite at sf0.1. On a real cluster shuffle
      // compression trades CPU for network and stays ON.
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.broadcast.compress", "false")
  }
}
