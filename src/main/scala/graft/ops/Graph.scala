package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over relationship graphs derived from the
  * fact tables. The reference (`/root/reference/batch_processor.go:1-194`)
  * has no graph surface; this implements the driver north star's
  * "iterative compute done Spark-first" requirement with an operator
  * whose RESULT is still oracle-checkable: a fixed-iteration PageRank
  * carried out entirely in scaled BIGINT arithmetic, so DuckDB can
  * replay the identical computation and hash-match every rank value —
  * most iterative operators (k-means, BPE, label propagation) are
  * rows-only by nature; this one is deliberately designed not to be.
  *
  * Determinism design: ranks are BIGINTs at a fixed 1e12 scale; every
  * per-edge contribution is one integer division (`pr DIV outdeg`),
  * the damping multiply is `(85 * sum) DIV 100`, and BIGINT sums are
  * order-independent — so there is no floating-point accumulation
  * anywhere and both engines floor the same positive quotients.
  * (Spark's `DIV` truncates toward zero and DuckDB's `//` floors;
  * every operand here is positive, where the two agree.)
  *
  * Scale posture (100 TB): this is textbook distributed PageRank — the
  * edge list is the big frame and it is touched once per iteration by
  * an equi-join on `src` followed by an aggregation on `dst` (two
  * shuffles per round, both on graph keys, never a collect). The
  * edge+degree frame is persisted ONCE and reused by all rounds; each
  * round's rank frame (|V| rows, far smaller than |E|) is eagerly
  * `localCheckpoint`ed to cut lineage — without the cut, round N's
  * plan embeds N copies of the join/agg cascade, which is what kills
  * iterative jobs at scale (same discipline as
  * [[Dedup.clusterPairs]]). Iteration count is FIXED (not
  * convergence-tested) so the job graph is statically known and the
  * oracle can unroll it.
  */
object Graph {

  /** Rank fixed-point scale: ranks sum to ~1e12 across the graph. */
  val Scale = 1000000000000L
  /** Fixed iteration count — unrolled identically in the oracle SQL. */
  val Iterations = 5

  /** PageRank over the bipartite customer↔supplier purchase graph:
    * an (undirected) edge per distinct (customer, supplier) pair that
    * appears on an order line. Node encoding keeps the two key spaces
    * disjoint without strings: customer c → node 2c, supplier s →
    * node 2s+1. Returns the top 20 nodes by final rank
    * (node_type, entity_id, rank_scaled), tie-broken by type then id.
    */
  def pageRank(spark: SparkSession, dir: String): DataFrame = {
    val edges = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    pageRank(edges, Iterations)
      .select(
        when(col("node") % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("node_type"),
        expr("node DIV 2").as("entity_id"),
        col("pr").as("rank_scaled"))
      .orderBy(col("rank_scaled").desc, col("node_type"), col("entity_id"))
      .limit(20)
  }

  /** DataFrame-first form over any directed (src, dst) edge frame; the
    * graph is symmetrized before iterating (PageRank on the undirected
    * graph). Returns (node, pr) for every node with ≥ 1 edge —
    * isolated vertices never enter (they'd hold exactly the teleport
    * mass and contribute nothing; a caller that wants them appends
    * them afterwards, the [[Dedup.clusterPairs]] singleton pattern).
    *
    * `checkpointEvery` sets the lineage-cut cadence: rounds between
    * cuts chain lazily into ONE job (AQE plans the whole segment, no
    * per-round materialization of the rank frame), and every K-th
    * round `localCheckpoint`s to stop the plan growing without bound.
    * The default cuts once at the end — right for a handful of rounds;
    * a long walk (say 50 rounds) should cut every ~5.
    */
  def pageRank(directedEdges: DataFrame, iterations: Int,
               checkpointEvery: Int = Int.MaxValue): DataFrame = {
    // ONE pass builds the whole iteration input: symmetrize with a
    // row-local explode (a union of a frame with its own swap would
    // scan the caller's edge derivation — a fact-fact join + distinct —
    // once per branch), then attach out-degrees with a window on the
    // same src shuffle. The persisted frame keeps that hash
    // partitioning, so every round's rank join reuses it and only the
    // |V|-row rank side moves.
    val adj = directedEdges
      .select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("ed"))
      .select(col("ed.src").as("src"), col("ed.dst").as("dst"))
      .withColumn("outdeg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .persist()
    try {
      val nodes = adj.select(col("src")).distinct()
      val n = nodes.count()
      require(n > 0, "pageRank: empty edge frame")
      // teleport mass per node, floored once — both constants are
      // driver-side Scala Long arithmetic (exact, positive)
      val teleport = Scale * 15L / (100L * n)
      var ranks = nodes.select(col("src").as("node"), lit(Scale / n).as("pr"))
      for (i <- 1 to iterations) {
        ranks = adj
          .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
          .select(col("dst"), expr("pr DIV outdeg").as("c"))
          .groupBy(col("dst"))
          .agg(sum(col("c")).as("s"))
          .select(col("dst").as("node"),
            (lit(teleport) + expr("(85 * s) DIV 100")).as("pr"))
        if (i % checkpointEvery == 0 || i == iterations)
          ranks = ranks.localCheckpoint(true) // materialize + cut lineage
      }
      ranks
    } finally adj.unpersist()
  }

  /** DuckDB twin: the 5 iterations unrolled as chained CTEs, every
    * arithmetic step (`//` floor-division, BIGINT sums) mirroring the
    * Spark plan bit-for-bit.
    */
  val pageRankSql: String = {
    def round(k: Int) =
      s"""r$k AS (
         |  SELECT e.dst AS node,
         |         CAST((SELECT (1000000000000 * 15) // (100 * n) FROM nn)
         |           + (85 * sum(r${k - 1}.pr // deg.outdeg)) // 100
         |           AS BIGINT) AS pr
         |  FROM e
         |  JOIN r${k - 1} ON e.src = r${k - 1}.node
         |  JOIN deg ON deg.src = e.src
         |  GROUP BY e.dst
         |)""".stripMargin
    s"""WITH e0 AS (
       |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |),
       |e AS (
       |  SELECT src, dst FROM e0
       |  UNION ALL
       |  SELECT dst AS src, src AS dst FROM e0
       |),
       |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
       |nn AS (SELECT count(*) AS n FROM deg),
       |r0 AS (
       |  SELECT deg.src AS node, (SELECT 1000000000000 // n FROM nn) AS pr
       |  FROM deg
       |),
       |${(1 to Iterations).map(round).mkString(",\n")}
       |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
       |         AS node_type,
       |       node // 2 AS entity_id,
       |       pr AS rank_scaled
       |FROM r$Iterations
       |ORDER BY rank_scaled DESC, node_type ASC, entity_id ASC
       |LIMIT 20""".stripMargin
  }
}
