package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Independent driver-side model of the exact scaled-integer
    * PageRank recurrence: same floor divisions, same damping fold,
    * computed over plain Scala Maps. Any drift between this and the
    * distributed implementation is a bug in one of them.
    */
  private def model(directed: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val und = directed ++ directed.map { case (a, b) => (b, a) }
    val outdeg = und.groupBy(_._1).map { case (k, es) => k -> es.size.toLong }
    val nodes = outdeg.keySet
    val n = nodes.size.toLong
    val teleport = ops.Graph.Scale * 15L / (100L * n)
    var pr = nodes.map(_ -> ops.Graph.Scale / n).toMap
    for (_ <- 1 to iters) {
      val inbox = und.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => pr(u) / outdeg(u) }.sum
      }
      pr = nodes.map(v => v -> (teleport + 85L * inbox(v) / 100L)).toMap
    }
    pr
  }

  test("pageRank matches the exact integer model on a planted graph") {
    import spark.implicits._
    // two customers share supplier 1; customer 2 also uses supplier 2 —
    // asymmetric degrees exercise the outdeg division
    val edges = Seq((2L, 3L), (4L, 3L), (4L, 5L))
    val got = ops.Graph.pageRank(edges.toDF("src", "dst"), 5)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr")).toMap
    val want = model(edges, 5)
    assert(got == want)
    // rank mass: each round loses only floor-truncation dust relative
    // to the damped total, so the sum stays within |V| units + damping
    // identity of Scale — a coarse but implementation-independent bound
    assert(got.values.sum > ops.Graph.Scale * 9 / 10)
    assert(got.values.forall(_ > 0))
  }

  test("pageRank on a symmetric pair splits rank equally") {
    import spark.implicits._
    val got = ops.Graph.pageRank(Seq((2L, 3L)).toDF("src", "dst"), 5)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr")).toMap
    assert(got(2L) == got(3L)) // symmetric graph → identical ranks
  }

  test("q_pagerank: 20 rows, suppliers dominate, lineage cut by checkpoint") {
    val df = ops.Graph.pageRank(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 20)
    // bipartite purchase graph: far fewer suppliers than customers
    // with the same total edge mass → suppliers out-rank customers, so
    // every supplier node precedes every customer node in the top-20
    val firstCust = rows.indexWhere(_.getAs[String]("node_type") == "customer")
    assert(rows.head.getAs[String]("node_type") == "supplier")
    if (firstCust >= 0)
      assert(rows.drop(firstCust)
        .forall(_.getAs[String]("node_type") == "customer"))
    val ranks = rows.map(_.getAs[Long]("rank_scaled"))
    assert(ranks.toSeq == ranks.sortBy(-_).toSeq)
    assert(ranks.forall(_ > 0))
    // the returned frame reads the final checkpointed round — its plan
    // must NOT re-embed the per-round join/agg cascade
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"lineage not cut:\n$plan")
  }

  test("coPurchase: planted shared-customer pairs score exact Jaccard/cosine") {
    import spark.implicits._
    // items 10,20 share customers 1..5 (J = 5/(6+5-5) = 5/6: item 10
    // also sells to customer 6); items 10,30 share only customers 1,2
    // (below minShared=5) and must not appear
    val edges = (
      (1L to 5L).flatMap(c => Seq((c, 10L), (c, 20L))) ++
        Seq((6L, 10L), (1L, 30L), (2L, 30L))).toDF("c", "s")
    val got = ops.Graph.coPurchase(edges, "c", "s", maxBasket = 128,
      minShared = 5, k = 20).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("s_a") == 10L && r.getAs[Long]("s_b") == 20L)
    assert(r.getAs[Long]("shared_cust") == 5L)
    assert(r.getAs[Long]("deg_a") == 6L && r.getAs[Long]("deg_b") == 5L)
    assert(r.getAs[Double]("jaccard") == math.rint(5.0 / 6.0 * 1e6) / 1e6)
    assert(r.getAs[Double]("cosine") == math.rint(5.0 / math.sqrt(30.0) * 1e6) / 1e6)
    // whale cap: a customer over the basket cap contributes no pairs
    val whale = (1L to 10L).map(s => (99L, s)) ++
      (1L to 5L).flatMap(c => Seq((c, 1L), (c, 2L)))
    val capped = ops.Graph.coPurchase(whale.toDF("c", "s"), "c", "s",
      maxBasket = 8, minShared = 5, k = 20).collect()
    assert(capped.length == 1 && capped.head.getAs[Long]("shared_cust") == 5L)
  }

  test("degreeProfile: planted degrees land in exact power-of-two buckets") {
    import spark.implicits._
    // reuse the table-bound op's planted shape through the corpus
    // query is overkill here; check the bucket CASE via the corpus run:
    val rows = ops.Graph.degreeProfile(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b, n, s) = (r.getAs[Int]("bucket_lo"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("sum_degree"))
      assert((b & (b - 1)) == 0 && b >= 1, s"bucket $b not a power of two")
      // every member degree lies in [b, 2b): n*b <= sum < n*2b
      assert(s >= n * b && s < n * 2L * b,
        s"bucket $b: sum_degree $s outside [${n * b}, ${n * 2 * b})")
    }
    // customers and suppliers both present, and both more numerous
    // than their bucket count (a histogram, not a node dump)
    assert(rows.map(_.getAs[String]("node_type")).toSet ==
      Set("customer", "supplier"))
    assert(rows.map(_.getAs[Long]("n_nodes")).sum > rows.length)
  }

  test("textRank: the planted hub word out-ranks the spokes; floor drops rare pairs") {
    import spark.implicits._
    // 'hub' co-occurs with four distinct spokes (each pair 3×, at the
    // floor); 'rare noise' appears twice (below the floor → no edge)
    val docs = (
      Seq.fill(3)("hub alpha hub beta hub gamma hub delta") ++
        Seq.fill(2)("rare noise")).toDF("text")
    val got = ops.Graph.textRank(docs, "text").collect()
    val terms = got.map(_.getAs[String]("term"))
    assert(terms.head == "hub", s"hub not first: ${terms.toSeq}")
    assert(terms.toSet == Set("hub", "alpha", "beta", "gamma", "delta"))
    // degree-1 spokes are rank-symmetric
    val spokes = got.filter(_.getAs[String]("term") != "hub")
      .map(_.getAs[Long]("rank_scaled")).toSet
    assert(spokes.size == 1, s"spokes not symmetric: $spokes")
    // corpus: bounded output, positive descending ranks
    val corpus = ops.Graph.textRank(spark, sfDir).collect()
    assert(corpus.nonEmpty && corpus.length <= 20)
    val rs = corpus.map(_.getAs[Long]("rank_scaled"))
    assert(rs.forall(_ > 0) && rs.toSeq == rs.sortBy(-(_: Long)).toSeq)
  }

  test("entityComponents: transitive chain collapses to one entity; rounds stable") {
    import spark.implicits._
    // chain: aaaa—aabb (dist 2), aabb—bbbb (dist 2), aaaa—bbbb dist 4 —
    // only transitivity links the ends; unrelated singleton keeps itself
    val names = Seq("zz aaaa", "zz aabb", "zz bbbb", "yy solo").toDF("nm")
    val got = ops.Graph.entityComponents(names, "nm", maxDist = 3,
      maxBlock = 1000, rounds = 8).collect()
    val ent = got.map(r => r.getAs[String]("name") -> r.getAs[String]("entity")).toMap
    assert(ent("zz aaaa") == "zz aaaa" && ent("zz aabb") == "zz aaaa" &&
      ent("zz bbbb") == "zz aaaa")
    assert(ent("yy solo") == "yy solo")
    assert(got.count(_.getAs[Boolean]("is_canonical")) == 2)
    // corpus: the fixed round count has converged — one more round
    // changes nothing (the documented rounds >= diameter condition)
    val parts = Tables.part(spark, sfDir)
    val r8 = ops.Graph.entityComponents(parts, "p_name", 3, 1000, 8)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val r9 = ops.Graph.entityComponents(parts, "p_name", 3, 1000, 9)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(r8.sameElements(r9), "round 8 labeling not yet stable")
    // every entity label is a member name and the minimum of its group
    val byEnt = r8.groupBy(_._2)
    byEnt.foreach { case (e, ms) => assert(ms.map(_._1).min == e) }
  }

  test("entityComponents: a chain longer than the round budget fails LOUDLY") {
    import spark.implicits._
    // diameter-2 chain (aaaa—aabb—bbbb) with rounds = 1: after one
    // round bbbb carries aabb's label, and the guard's extra round
    // still changes it to aaaa — a silent entity split at scale. The
    // convergence guard must turn that into an exception naming the
    // round budget, not return a split labeling.
    val names = Seq("zz aaaa", "zz aabb", "zz bbbb").toDF("nm")
    val e = intercept[IllegalArgumentException] {
      ops.Graph.entityComponents(names, "nm", maxDist = 3,
        maxBlock = 1000, rounds = 1).collect()
    }
    assert(e.getMessage.contains("not converged"))
    // same chain with enough rounds passes the guard and unifies
    val ok = ops.Graph.entityComponents(names, "nm", maxDist = 3,
      maxBlock = 1000, rounds = 3).collect()
    assert(ok.map(_.getAs[String]("entity")).distinct.toSeq == Seq("zz aaaa"))
  }

  test("q_copurchase: bounded output, consistent degrees, descending similarity") {
    val rows = ops.Graph.coPurchase(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (sh, da, db) = (r.getAs[Long]("shared_cust"),
        r.getAs[Long]("deg_a"), r.getAs[Long]("deg_b"))
      assert(sh >= 5 && sh <= math.min(da, db))
      assert(r.getAs[Long]("s_a") < r.getAs[Long]("s_b"))
      assert(r.getAs[Double]("jaccard") <= r.getAs[Double]("cosine") + 1e-9)
    }
    val js = rows.map(_.getAs[Double]("jaccard"))
    assert(js.toSeq == js.sortBy(-(_: Double)).toSeq)
  }

  test("bfsReach: planted path walks hop-by-hop from the smallest max-degree node") {
    import spark.implicits._
    // path 1-2-3-4-5: degree-2 tie between 2,3,4 breaks to seed 2;
    // hops reach {1,3}, then {4}, then {5}, then nothing at hop 4
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val got = ops.Graph.bfsReach(edges, 4).collect()
      .map(r => (r.getAs[Int]("hop"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("n_customers"), r.getAs[Long]("n_suppliers")))
    assert(got.toSeq == Seq((0, 1L, 1L, 0L), (1, 2L, 0L, 2L),
      (2, 1L, 1L, 0L), (3, 1L, 0L, 1L)))
  }

  test("q_bfs_reach: hop 0 is the seed alone, levels alternate bipartite sides") {
    val rows = ops.Graph.bfsReach(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= ops.Graph.BfsHops + 1)
    assert(rows.head.getAs[Int]("hop") == 0 &&
      rows.head.getAs[Long]("n_nodes") == 1L)
    rows.foreach { r =>
      val (n, c, s) = (r.getAs[Long]("n_nodes"),
        r.getAs[Long]("n_customers"), r.getAs[Long]("n_suppliers"))
      assert(c + s == n)
      // purchase graph is bipartite: every level is pure one side
      assert(c == 0L || s == 0L, s"mixed level: $r")
    }
    // consecutive levels sit on opposite sides
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert((a.getAs[Long]("n_customers") == 0L) !=
          (b.getAs[Long]("n_customers") == 0L))
      case _ =>
    }
  }

  test("triangles: planted K4-minus-an-edge counts each triangle once") {
    import spark.implicits._
    // one customer per supplier pair → supplier graph edges
    // (1,2)(1,3)(2,3)(2,4)(3,4): triangles (1,2,3) and (2,3,4) only
    val inc = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 3L),
      (12L, 2L), (12L, 3L), (13L, 2L), (13L, 4L), (14L, 3L), (14L, 4L))
    val got = ops.Graph.triangles(inc.toDF("c", "s"), "c", "s",
      maxBasket = 128, minShared = 1, k = 20)
      .collect()
      .map(r => (r.getAs[Long]("s"), r.getAs[Long]("degree"),
        r.getAs[Long]("triangles"), r.getAs[Double]("clustering")))
    // ordered by triangles desc then id; both middle nodes sit on both
    // triangles, the outer nodes on one each with a fully-connected
    // (coefficient 1.0) neighborhood
    val third = math.rint(2.0 * 2 / (3 * 2) * 1e6) / 1e6
    assert(got.toSeq == Seq(
      (2L, 3L, 2L, third), (3L, 3L, 2L, third),
      (1L, 2L, 1L, 1.0), (4L, 2L, 1L, 1.0)))
  }

  test("triangles: the backbone cap keeps the strongest ties and drops the rest") {
    import spark.implicits._
    // shared counts: (1,2)=3, (2,3)=2, (1,3)=1 — a triangle uncapped;
    // edgeCap=2 keeps only the two strongest edges, destroying it
    val inc =
      (1L to 3L).flatMap(c => Seq((c, 1L), (c, 2L))) ++ // (1,2) ×3
        (4L to 5L).flatMap(c => Seq((c, 2L), (c, 3L))) ++ // (2,3) ×2
        Seq((6L, 1L), (6L, 3L)) // (1,3) ×1
    val full = ops.Graph.triangles(inc.toDF("c", "s"), "c", "s",
      maxBasket = 128, minShared = 1, edgeCap = 5000, k = 20).collect()
    assert(full.map(_.getAs[Long]("triangles")).toSeq == Seq(1L, 1L, 1L))
    val capped = ops.Graph.triangles(inc.toDF("c", "s"), "c", "s",
      maxBasket = 128, minShared = 1, edgeCap = 2, k = 20)
      .collect()
      .map(r => (r.getAs[Long]("s"), r.getAs[Long]("degree"),
        r.getAs[Long]("triangles")))
    // degrees now reflect the kept subgraph only; zero triangles tie
    // the ordering back to node id
    assert(capped.toSeq == Seq((1L, 1L, 0L), (2L, 2L, 0L), (3L, 1L, 0L)))
  }

  test("triangles: star graph has zero triangles; leaves carry NULL coefficient") {
    import spark.implicits._
    // hub supplier 1 shares one customer with each spoke 2..6 — no
    // spoke pair shares a customer, so the graph is a star
    val inc = (2L to 6L).flatMap(s => Seq((s * 100, 1L), (s * 100, s)))
    val rows = ops.Graph.triangles(inc.toDF("c", "s"), "c", "s",
      maxBasket = 128, minShared = 1, k = 20).collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getAs[Long]("triangles") == 0L))
    val hub = rows.find(_.getAs[Long]("s") == 1L).get
    assert(hub.getAs[Long]("degree") == 5L)
    assert(hub.getAs[Double]("clustering") == 0.0)
    rows.filter(_.getAs[Long]("s") != 1L)
      .foreach(r => assert(r.isNullAt(r.fieldIndex("clustering"))))
  }

  test("q_triangles: bounded output, internally consistent coefficients, lineage cut") {
    val df = ops.Graph.triangles(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (d, t) = (r.getAs[Long]("degree"), r.getAs[Long]("triangles"))
      assert(d >= 1)
      // a node on t triangles has ≥ t neighbor pairs: t ≤ C(d,2)
      assert(t >= 0 && 2 * t <= d * (d - 1))
      if (d >= 2) {
        val cc = r.getAs[Double]("clustering")
        assert(cc >= 0.0 && cc <= 1.0)
        assert(cc == math.rint(2.0 * t / (d * (d - 1)) * 1e6) / 1e6)
      } else assert(r.isNullAt(r.fieldIndex("clustering")))
    }
    val ts = rows.map(_.getAs[Long]("triangles"))
    assert(ts.toSeq == ts.sortBy(-(_: Long)).toSeq)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"lineage not cut:\n$plan")
  }

  /** Independent driver-side model of the exact L1-rescaled integer
    * HITS recurrence (BigInt — truncating division on positive
    * operands matches the decimal DIV both engines run).
    */
  private def hitsModel(edges: Seq[(Long, Long)],
                        iters: Int): (Map[Long, Long], Map[Long, Long]) = {
    val s = BigInt(ops.Graph.Scale)
    val custs = edges.map(_._1).distinct
    var h: Map[Long, BigInt] =
      custs.map(_ -> BigInt(ops.Graph.Scale / custs.size)).toMap
    var a: Map[Long, BigInt] = Map.empty
    for (_ <- 1 to iters) {
      val araw = edges.groupBy(_._2)
        .map { case (k, es) => k -> es.map(e => h(e._1)).sum }
      val at = araw.values.sum
      a = araw.map { case (k, v) => k -> v * s / at }
      val hraw = edges.groupBy(_._1)
        .map { case (k, es) => k -> es.map(e => a(e._2)).sum }
      val ht = hraw.values.sum
      h = hraw.map { case (k, v) => k -> v * s / ht }
    }
    (h.map { case (k, v) => k -> v.toLong },
      a.map { case (k, v) => k -> v.toLong })
  }

  test("hits matches the exact integer model on a planted bipartite graph") {
    import spark.implicits._
    // supplier 10 is bought by every customer, 20/30 by one each —
    // asymmetric enough that hub and authority orders both move
    val edges = Seq((1L, 10L), (1L, 20L), (2L, 10L), (3L, 10L), (3L, 30L))
    val (h, a) = hitsModel(edges, ops.Graph.HitsIterations)
    val rows = ops.Graph.hits(edges.toDF("c", "s"), ops.Graph.HitsIterations)
      .collect()
      .map(r => (r.getAs[String]("role"), r.getAs[Long]("entity_id"),
        r.getAs[Long]("score_scaled")))
    val gotA = rows.filter(_._1 == "authority").map(t => t._2 -> t._3).toMap
    val gotH = rows.filter(_._1 == "hub").map(t => t._2 -> t._3).toMap
    assert(gotA == a)
    assert(gotH == h)
    // the broad supplier is the top authority; the 2-basket customers
    // out-hub the 1-basket customer
    assert(a.maxBy(_._2)._1 == 10L)
    assert(h(1L) > h(2L) && h(3L) > h(2L))
  }

  test("hits: symmetric customers and symmetric suppliers tie exactly") {
    import spark.implicits._
    val edges = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L))
    val rows = ops.Graph.hits(edges.toDF("c", "s"), 3).collect()
    val byRole = rows.groupBy(_.getAs[String]("role"))
    byRole.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("score_scaled")).distinct.length == 1)
    }
  }

  test("q_hits: 10 per role, descending within role, positive scaled scores") {
    val rows = ops.Graph.hits(spark, sfDir).collect()
    assert(rows.length == 20)
    Seq("authority", "hub").foreach { role =>
      val scores = rows.filter(_.getAs[String]("role") == role)
        .map(_.getAs[Long]("score_scaled"))
      assert(scores.length == 10)
      assert(scores.toSeq == scores.sortBy(-(_: Long)).toSeq)
      assert(scores.forall(_ > 0))
      // L1 normalization: no single node may exceed the whole mass
      assert(scores.forall(_ <= ops.Graph.Scale))
    }
  }

  test("kCore: pendant customer peels in round 1, the 3-core survives") {
    import spark.implicits._
    // complete bipartite K(3,3) on even customers {0,2,4} × odd
    // suppliers {1,3,5} (degree 3 everywhere) + pendant customer 6 on
    // supplier 1 — with k=3 the pendant peels immediately and the core
    // is stable thereafter
    val core = for (c <- Seq(0L, 2L, 4L); s <- Seq(1L, 3L, 5L)) yield (c, s)
    val edges = (core :+ (6L, 1L)).toDF("src", "dst")
    val rows = ops.Graph.kCore(edges, 3, 2).collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("n_customers"), r.getAs[Long]("n_suppliers"),
        r.getAs[Long]("n_edges"), r.getAs[Boolean]("converged")))
    // converged flags: round 0 is the input (false by definition),
    // round 1's peel removed the pendant (false), round 2 removed
    // nothing — the flag that says "this IS the true 3-core"
    assert(rows.toSeq == Seq((0, 7L, 4L, 3L, 10L, false),
      (1, 6L, 3L, 3L, 9L, false), (2, 6L, 3L, 3L, 9L, true)))
  }

  test("kCore: a star collapses to the empty graph and stays empty") {
    import spark.implicits._
    // hub customer 0 on suppliers {1,3,5}: every supplier has degree 1
    // < k, so round 1 drops them all and with them every edge
    val edges = Seq((0L, 1L), (0L, 3L), (0L, 5L)).toDF("src", "dst")
    val rows = ops.Graph.kCore(edges, 2, 2).collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("n_edges"), r.getAs[Boolean]("converged")))
    assert(rows.toSeq == Seq((0, 4L, 3L, false), (1, 0L, 0L, false),
      (2, 0L, 0L, true)))
  }

  test("q_kcore: rounds+1 rows, monotone shrink, side split adds up") {
    val rows = ops.Graph.kCore(spark, sfDir).collect()
    assert(rows.length == ops.Graph.KCoreRounds + 1)
    val census = rows.map(r => (r.getAs[Long]("n_nodes"),
      r.getAs[Long]("n_customers"), r.getAs[Long]("n_suppliers"),
      r.getAs[Long]("n_edges")))
    census.foreach { case (n, c, s, _) => assert(n == c + s) }
    // peeling only removes: both censuses are non-increasing
    assert(census.map(_._1).toSeq == census.map(_._1).sortBy(-(_: Long)).toSeq)
    assert(census.map(_._4).toSeq == census.map(_._4).sortBy(-(_: Long)).toSeq)
    // the converged flag is exactly "census equals the previous round":
    // recompute it independently from the census rows and compare —
    // and at test scale the 6-round budget suffices, so the final row
    // must carry converged=true (the truncated-peel visibility guard)
    val conv = rows.map(_.getAs[Boolean]("converged"))
    val expect = census.indices.map(i =>
      i > 0 && census(i)._1 == census(i - 1)._1 &&
        census(i)._4 == census(i - 1)._4)
    assert(conv.toSeq == expect)
    assert(conv.last, "corpus peel did not converge within KCoreRounds")
  }

  test("adamicAdar: planted baskets score the exact micro-unit sum") {
    import spark.implicits._
    // customer 1 buys {10,20} (w = round(1e6/ln 2) = 1442695);
    // customer 2 buys {10,20,30} (w = round(1e6/ln 3) = 910239)
    val edges = Seq((1L, 10L), (1L, 20L),
      (2L, 10L), (2L, 20L), (2L, 30L))
    val rows = ops.Graph.adamicAdar(edges.toDF("c", "s"), "c", "s",
      maxBasket = 128, minShared = 1, k = 20).collect()
      .map(r => (r.getAs[Long]("s_a"), r.getAs[Long]("s_b"),
        r.getAs[Long]("common_customers"), r.getAs[Long]("aa_micro")))
    assert(rows.toSeq == Seq((10L, 20L, 2L, 1442695L + 910239L),
      (10L, 30L, 1L, 910239L), (20L, 30L, 1L, 910239L)))
  }

  test("adamicAdar: hub-heavy overlap ranks below selective overlap") {
    import spark.implicits._
    // pair (10,20): 2 shared customers, both promiscuous (basket 6);
    // pair (30,40): 2 shared customers, both selective (basket 2) —
    // raw co-purchase counts tie, Adamic–Adar must prefer (30,40)
    val hubs = Seq(1L, 2L).flatMap(c =>
      Seq(10L, 20L, 50L, 60L, 70L, 80L).map(s => (c, s)))
    val sel = Seq(3L, 4L).flatMap(c => Seq(30L, 40L).map(s => (c, s)))
    val rows = ops.Graph.adamicAdar((hubs ++ sel).toDF("c", "s"), "c", "s",
      maxBasket = 128, minShared = 2, k = 20).collect()
    val score = rows.map(r => (r.getAs[Long]("s_a"), r.getAs[Long]("s_b")) ->
      r.getAs[Long]("aa_micro")).toMap
    assert(score((30L, 40L)) > score((10L, 20L)))
    assert(rows.head.getAs[Long]("s_a") == 30L)
  }

  test("q_adamic_adar: bounded, canonical pairs, floors respected, descending") {
    val rows = ops.Graph.adamicAdar(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("s_a") < r.getAs[Long]("s_b"))
      assert(r.getAs[Long]("common_customers") >= ops.Graph.CoPurchaseMinShared)
      assert(r.getAs[Long]("aa_micro") > 0)
    }
    val aa = rows.map(_.getAs[Long]("aa_micro"))
    assert(aa.toSeq == aa.sortBy(-(_: Long)).toSeq)
  }

  test("modularity: two clean cliques score exactly 1/2; scrambled labels score negative") {
    import spark.implicits._
    // K3 ∪ K3 with matching labels: m = 6, each community has
    // e_c = 3, d_c = 6 → Q = 2·(3/6 − (6/12)²) = 1/2 exactly
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L)).toDF("s_a", "s_b")
    val goodLbl = Seq((1L, 0L), (2L, 0L), (3L, 0L),
      (4L, 1L), (5L, 1L), (6L, 1L)).toDF("node", "community")
    val good = ops.Graph.modularity(edges, goodLbl).collect()
    assert(good.length == 2)
    assert(good.forall(_.getAs[Long]("q_micro") == 500000L))
    assert(good.forall(_.getAs[Long]("q_contrib_micro") == 250000L))
    assert(good.forall(_.getAs[Long]("e_within") == 3L))
    assert(good.forall(_.getAs[Long]("d_total") == 6L))
    assert(good.forall(_.getAs[Long]("n_nodes") == 3L))
    // labels orthogonal to the cliques: one node of each clique per
    // label never beats the null model — Q < 0, and communities with
    // ZERO within-edges still appear (grid fill)
    val badLbl = Seq((1L, 0L), (4L, 0L), (2L, 1L), (5L, 1L),
      (3L, 2L), (6L, 2L)).toDF("node", "community")
    val bad = ops.Graph.modularity(edges, badLbl).collect()
    assert(bad.length == 3)
    assert(bad.forall(_.getAs[Long]("q_micro") < 0L))
    assert(bad.forall(_.getAs[Long]("e_within") == 0L))
    // corpus: one row per touched nation, global Q repeated, masses
    // conserved: Σ e_within ≤ m = Σ d_total / 2
    val corpus = ops.Graph.modularity(spark, sfDir).collect()
    assert(corpus.nonEmpty)
    assert(corpus.map(_.getAs[Long]("q_micro")).distinct.length == 1)
    assert(corpus.map(_.getAs[Long]("e_within")).sum <=
      corpus.map(_.getAs[Long]("d_total")).sum / 2)
  }
}
