package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The library's determinism claim, tested head-on: operators whose
  * docs promise "reproducible across runs and partitionings" must
  * return IDENTICAL rows when the same input arrives in a different
  * physical layout. A partitioning-sensitive sampler or ranking
  * silently breaks train/eval reproducibility at scale, where input
  * layout is never under the caller's control.
  */
class DeterminismSpec extends AnyFunSuite {
  import SparkTestSession._

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq

  private def assertLayoutInvariant(f: DataFrame => DataFrame): Unit = {
    val docs = Tables.documents(spark, sfDir)
    val a = rowsOf(f(docs.repartition(3)))
    val b = rowsOf(f(docs.repartition(17)))
    val c = rowsOf(f(docs.coalesce(1)))
    assert(a == b && b == c, "result depends on the input partitioning")
  }

  test("weighted sample is invariant to input layout") {
    assertLayoutInvariant(d =>
      ops.Sampling.weightedSample(d, "doc_id", "n_chars", 50))
  }

  test("group sample is invariant to input layout") {
    assertLayoutInvariant(d => ops.Sampling.groupSample(d, "doc_id", "lang", 3))
  }

  test("exact dedup + canonical pick are invariant to input layout") {
    assertLayoutInvariant(d => ops.Dedup.dedupExact(d, "doc_id", "text"))
  }

  test("bm25 ranking is invariant to input layout") {
    assertLayoutInvariant(d =>
      ops.TextAnalysis.bm25(d, "doc_id", "text", Seq("spark", "join"), 20))
  }

  test("threshold sweep is invariant to input layout") {
    assertLayoutInvariant(d =>
      ops.Curation.thresholdSweep(d, "doc_id", "text", Seq(0.3, 0.6, 0.9)))
  }

  test("incremental dedup classification is invariant to input layout") {
    val docs = Tables.documents(spark, sfDir)
    import org.apache.spark.sql.functions.col
    def run(parts: Int): Seq[String] = rowsOf(ops.Dedup.dedupIncremental(
      docs.filter(col("doc_id") % 2 === 0).repartition(parts),
      docs.filter(col("doc_id") % 2 === 1).repartition(parts),
      "doc_id", "text"))
    assert(run(2) == run(13), "classification depends on the input partitioning")
  }

  test("boilerplate report is invariant to input layout") {
    assertLayoutInvariant(d => ops.TextAnalysis.boilerplate(d, "doc_id", "text"))
  }

  test("vocab coverage is invariant to input layout") {
    assertLayoutInvariant(d => ops.TextAnalysis.vocabCoverage(d, "lang", "text"))
  }

  test("source drift is invariant to input layout") {
    assertLayoutInvariant(d => ops.Mixing.sourceDrift(d, "source", "n_chars"))
  }

  test("pmi collocations are invariant to input layout") {
    assertLayoutInvariant(d => ops.TextAnalysis.pmiCollocations(d, "lang", "text"))
  }

  test("bpe pair counts are invariant to input layout") {
    assertLayoutInvariant(d => ops.TextAnalysis.bpePairs(d, "lang", "text"))
  }

  test("zipf fit is invariant to input layout") {
    assertLayoutInvariant(d => ops.TextAnalysis.zipfFit(d, "lang", "text"))
  }

  test("anomaly flags are invariant to input layout") {
    val events = Tables.events(spark, sfDir)
    def run(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Advanced.anomaly(f(events), "event_id", "user_id", "ts", "value"))
    val a = run(_.repartition(3))
    val b = run(_.repartition(17))
    val c = run(_.coalesce(1))
    assert(a == b && b == c, "flags depend on the input partitioning")
  }

  test("sparse knn ranking is invariant to input layout") {
    assertLayoutInvariant(d => ops.TextAnalysis.sparseKnn(d, "doc_id", "text", 10, 5))
  }

  test("streaks are invariant to input layout") {
    val events = Tables.events(spark, sfDir)
    def run(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Advanced.streaks(f(events), "user_id", "ts"))
    val a = run(_.repartition(3))
    val b = run(_.repartition(17))
    val c = run(_.coalesce(1))
    assert(a == b && b == c, "streaks depend on the input partitioning")
  }

  test("pca projection is invariant to input layout") {
    val embs = Tables.embeddings(spark, sfDir)
    def run(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Similarity.pcaProject(f(embs), "vec_id", "embedding", 3))
    val a = run(_.repartition(3))
    val b = run(_.repartition(17))
    val c = run(_.coalesce(1))
    assert(a == b && b == c, "pca projection depends on the input partitioning")
  }

  test("round-6 event diagnostics are invariant to input layout") {
    val events = Tables.events(spark, sfDir)
    val runs: Seq[DataFrame => DataFrame] = Seq(
      e => ops.Mixing.madOutliers(e, "event_type", "value"),
      e => ops.Advanced.cusum(e, "event_type", "ts", "value"),
      e => ops.Advanced.rfm(e, "user_id", "ts", "value"),
      e => ops.Advanced.rollingDistinct(e, "user_id", "ts", 7),
      e => ops.Advanced.seasonality(e, "event_type", "ts"))
    runs.zipWithIndex.foreach { case (op, i) =>
      val a = rowsOf(op(events.repartition(3)))
      val b = rowsOf(op(events.repartition(17)))
      val c = rowsOf(op(events.coalesce(1)))
      assert(a == b && b == c, s"event op #$i depends on the input partitioning")
    }
  }

  test("record linkage is invariant to input layout") {
    val parts = Tables.part(spark, sfDir)
    def run(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Dedup.recordLinkage(f(parts), "p_name", 3, 1000))
    val a = run(_.repartition(3))
    val b = run(_.repartition(17))
    val c = run(_.coalesce(1))
    assert(a == b && b == c, "record linkage depends on the input partitioning")
  }

  test("round-6 second-leg document ops are invariant to input layout") {
    // hllSketch is NOT in this list: its per-source rows are invariant
    // (pinned in RelationalSpec) but the union row's low digits follow
    // HLL merge order — inherent to the sketch, documented on the op
    val runs: Seq[DataFrame => DataFrame] = Seq(
      d => ops.TextAnalysis.heavyHitters(d, "text", 200),
      d => ops.TextAnalysis.scriptMix(d, "lang", "text"),
      d => ops.Dedup.dedupWeight(d, "doc_id", "text"),
      d => ops.TextAnalysis.bpeApply(d, "doc_id", "text", 4))
    runs.zipWithIndex.foreach { case (op, i) =>
      assertLayoutInvariant(op)
      assert(true, s"doc op #$i")
    }
  }

  test("frequent itemsets and cohort matrix are invariant to input layout") {
    val lines = Tables.lineitem(spark, sfDir)
    def runI(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Analytics.freqItemsets(f(lines), "l_orderkey", "l_partkey"))
    val ia = runI(_.repartition(3)); val ib = runI(_.repartition(17))
    assert(ia == ib, "freq itemsets depend on the input partitioning")
    val events = Tables.events(spark, sfDir)
    def runC(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Advanced.cohortMatrix(f(events), "user_id", "ts"))
    val ca = runC(_.repartition(3)); val cb = runC(_.coalesce(1))
    assert(ca == cb, "cohort matrix depends on the input partitioning")
  }

  test("round-7 graph and statistics ops are invariant to input layout") {
    // exact-integer disciplines all: any layout sensitivity is a bug
    val orders = Tables.orders(spark, sfDir)
    def runH(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Analytics.holtForecast(f(orders), "o_orderdate", "o_totalprice"))
    assert(runH(_.repartition(7)) == runH(_.coalesce(1)),
      "holt forecast depends on the input partitioning")
    def runK(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Diagnostics.kaplanMeier(f(orders), "o_custkey", "o_orderdate", 90))
    assert(runK(_.repartition(7)) == runK(_.coalesce(1)),
      "kaplan-meier depends on the input partitioning")
    import spark.implicits._
    val edges = Tables.lineitem(spark, sfDir)
      .join(orders, org.apache.spark.sql.functions.col("l_orderkey") ===
        org.apache.spark.sql.functions.col("o_orderkey"))
      .selectExpr("o_custkey * 2 AS src", "l_suppkey * 2 + 1 AS dst")
      .distinct()
    // the generic form returns the rank frame unordered (callers sort);
    // determinism here means the VALUES are layout-invariant
    def runP(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Graph.pageRank(f(edges), 5).orderBy("node"))
    assert(runP(_.repartition(7)) == runP(_.coalesce(1)),
      "pagerank depends on the input partitioning")
    def runCp(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Graph.coPurchase(f(edges.selectExpr("src AS c", "dst AS s")),
        "c", "s"))
    assert(runCp(_.repartition(7)) == runCp(_.coalesce(1)),
      "co-purchase depends on the input partitioning")
    val docs = Tables.documents(spark, sfDir)
    def runT(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Graph.textRank(f(docs), "text"))
    assert(runT(_.repartition(7)) == runT(_.coalesce(1)),
      "textrank depends on the input partitioning")
  }

  test("round-7 third-leg ops are invariant to input layout") {
    val orders = Tables.orders(spark, sfDir)
    val inc = Tables.lineitem(spark, sfDir)
      .join(orders, org.apache.spark.sql.functions.col("l_orderkey") ===
        org.apache.spark.sql.functions.col("o_orderkey"))
      .selectExpr("o_custkey AS c", "l_suppkey AS s")
    def runTri(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Graph.triangles(f(inc), "c", "s"))
    assert(runTri(_.repartition(7)) == runTri(_.coalesce(1)),
      "triangles depends on the input partitioning")
    val edges = inc.selectExpr("c * 2 AS src", "s * 2 + 1 AS dst").distinct()
    def runB(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Graph.bfsReach(f(edges), 4))
    assert(runB(_.repartition(7)) == runB(_.coalesce(1)),
      "bfs reach depends on the input partitioning")
    val docs = Tables.documents(spark, sfDir)
    def runPpl(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.TextAnalysis.pplFilter(f(docs), "doc_id", "text"))
    assert(runPpl(_.repartition(7)) == runPpl(_.coalesce(1)),
      "ppl filter depends on the input partitioning")
    val oc = orders.join(Tables.customer(spark, sfDir),
      org.apache.spark.sql.functions.col("o_custkey") ===
        org.apache.spark.sql.functions.col("c_custkey"))
    def runMi(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Mixing.mutualInfo(f(oc), "c_mktsegment", "o_orderpriority"))
    assert(runMi(_.repartition(7)) == runMi(_.coalesce(1)),
      "mutual info depends on the input partitioning")
  }

  test("round-7 fourth/fifth-leg ops are invariant to input layout") {
    import org.apache.spark.sql.functions.col
    val orders = Tables.orders(spark, sfDir)
    val inc = Tables.lineitem(spark, sfDir)
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .selectExpr("o_custkey AS c", "l_suppkey AS s")
    def runH(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Graph.hits(f(inc.selectExpr("c", "s").distinct()), 2))
    assert(runH(_.repartition(7)) == runH(_.coalesce(1)),
      "hits depends on the input partitioning")
    val enc = inc.selectExpr("c * 2 AS src", "s * 2 + 1 AS dst").distinct()
    def runKc(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Graph.kCore(f(enc), 8, 3))
    assert(runKc(_.repartition(7)) == runKc(_.coalesce(1)),
      "k-core depends on the input partitioning")
    def runAa(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Graph.adamicAdar(f(inc), "c", "s"))
    assert(runAa(_.repartition(7)) == runAa(_.coalesce(1)),
      "adamic-adar depends on the input partitioning")
    val series = orders.selectExpr("o_orderpriority AS g",
        "CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS x",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS v")
      .groupBy("g", "x")
      .agg(org.apache.spark.sql.functions.sum("v").as("y"))
    def runTs(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Diagnostics.theilSen(f(series), "g", "x", "y"))
    assert(runTs(_.repartition(7)) == runTs(_.coalesce(1)),
      "theil-sen depends on the input partitioning")
    def runKt(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Diagnostics.kendallTau(f(series), "g", "x", "y"))
    assert(runKt(_.repartition(7)) == runKt(_.coalesce(1)),
      "kendall tau depends on the input partitioning")
    val pricedays = orders.selectExpr("o_orderpriority AS g",
      "CAST(round(o_totalprice * 100) AS BIGINT) AS x",
      "CAST(day(o_orderdate) AS BIGINT) AS y")
    def runSp(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Ranks.spearman(f(pricedays), "g", "x", "y", 1L << 16))
    assert(runSp(_.repartition(7)) == runSp(_.coalesce(1)),
      "spearman depends on the input partitioning")
    def runG(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Ranks.gini(f(pricedays), "g", "x", 1L << 16))
    assert(runG(_.repartition(7)) == runG(_.coalesce(1)),
      "gini depends on the input partitioning")
    val docs = Tables.documents(spark, sfDir)
    def runKn(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.TextAnalysis.knBigram(f(docs), "doc_id", "text"))
    assert(runKn(_.repartition(7)) == runKn(_.coalesce(1)),
      "kneser-ney depends on the input partitioning")
    val emb = Tables.embeddings(spark, sfDir)
    def runCtr(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Similarity.kCenter(f(emb), "vec_id", "embedding", 5))
    assert(runCtr(_.repartition(7)) == runCtr(_.coalesce(1)),
      "k-center depends on the input partitioning")
  }

  test("round-9 ops are invariant to input layout") {
    import org.apache.spark.sql.functions.{col, expr, lit, sum, count}
    val orders = Tables.orders(spark, sfDir)
    val priced = orders.selectExpr("o_orderpriority AS grp",
      "CAST(round(o_totalprice) AS BIGINT) AS v")
    def runKw(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Ranks.kruskalWallis(f(priced), "grp", "v", 1L << 10))
    assert(runKw(_.repartition(7)) == runKw(_.coalesce(1)),
      "kruskal-wallis depends on the input partitioning")
    val per = orders.groupBy(col("o_custkey").as("id"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev"),
        count(lit(1)).as("cnt"))
    def runRrf(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Evaluation.rrfFusion(f(per), "id", "rev", "cnt", 20))
    assert(runRrf(_.repartition(7)) == runRrf(_.coalesce(1)),
      "rrf depends on the input partitioning")
    val docs = Tables.documents(spark, sfDir)
    def runCms(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Diagnostics.countMin(f(docs), "text", 20))
    assert(runCms(_.repartition(7)) == runCms(_.coalesce(1)),
      "count-min depends on the input partitioning")
    def runDsir(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.TextAnalysis.dsir(
        f(docs.withColumn("tgt", col("lang") === "en")),
        "doc_id", "text", "tgt", 20))
    assert(runDsir(_.repartition(7)) == runDsir(_.coalesce(1)),
      "dsir depends on the input partitioning")
    val parts = Tables.part(spark, sfDir)
    def runFs(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Dedup.fellegiSunter(f(parts), "p_partkey", "p_name",
        Seq("p_brand", "p_type", "p_size"), 1000, 20))
    assert(runFs(_.repartition(7)) == runFs(_.coalesce(1)),
      "fellegi-sunter depends on the input partitioning")
    val keyed = orders.selectExpr("'all' AS g", "o_orderkey AS id",
      "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
    def runBs(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Sampling.bootstrapMean(f(keyed), "g", "id", "cents"))
    assert(runBs(_.repartition(7)) == runBs(_.coalesce(1)),
      "hash bootstrap depends on the input partitioning")
  }

  test("round-9 back-half ops are invariant to input layout") {
    import org.apache.spark.sql.functions.col
    val orders = Tables.orders(spark, sfDir)
    val events = Tables.events(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
    // recurrence folds: the sort lives inside the fold's sorted array,
    // not the input layout
    def runPh(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Sequence.pageHinkley(f(orders), "o_orderdate",
        "o_totalprice"))
    assert(runPh(_.repartition(7)) == runPh(_.coalesce(1)),
      "pageHinkley depends on the input partitioning")
    def runMk(f: DataFrame => DataFrame): Seq[String] = {
      val cell = f(orders).groupBy(
        org.apache.spark.sql.functions.date_trunc("month",
          col("o_orderdate")).as("m"))
        .agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.expr(
            "CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
        .selectExpr("'all' AS g", "m", "x")
      rowsOf(ops.Diagnostics.mkTrend(cell, "g", "m", "x"))
    }
    assert(runMk(_.repartition(7)) == runMk(_.coalesce(1)),
      "mkTrend depends on the input partitioning")
    // markov chain: census + fold, layout-free
    def runMs(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Sequence.markovStationary(f(events), "event_id",
        "user_id", "ts", "event_type"))
    assert(runMs(_.repartition(7)) == runMs(_.coalesce(1)),
      "markovStationary depends on the input partitioning")
    // editJoin: candidate generation + exact verify, layout-free
    def runEj(f: DataFrame => DataFrame): Seq[String] = {
      import org.apache.spark.sql.functions.{length, lower, substring}
      val keys = f(docs).filter(length(col("text")) >= 48)
        .select(col("doc_id"), lower(substring(col("text"), 1, 48)).as("k"))
      rowsOf(ops.Dedup.editJoin(keys, "doc_id", "k", 48, 2))
    }
    assert(runEj(_.repartition(7)) == runEj(_.coalesce(1)),
      "editJoin depends on the input partitioning")
  }

  test("round-10 operators are invariant to input layout") {
    // substringDedup: CDC chunking is row-local, census + keyed windows
    assertLayoutInvariant(d =>
      ops.Curation.substringDedup(d, "doc_id", "text"))
    // sentenceDedup: position-indexed sentence census, layout-free
    assertLayoutInvariant(d =>
      ops.Curation.sentenceDedup(d, "doc_id", "text"))
    // heapsLaw: value-grid deciles + first-carrier census, layout-free
    assertLayoutInvariant(d =>
      ops.TextAnalysis.heapsLaw(d, "doc_id", "text"))
    // editJoinProfile: same candidate frame as editJoin + censuses
    assertLayoutInvariant { d =>
      import org.apache.spark.sql.functions.{col, length, lower, substring}
      val keys = d.filter(length(col("text")) >= 48)
        .select(col("doc_id"), lower(substring(col("text"), 1, 48)).as("k"))
      ops.Dedup.editJoinProfile(keys, "doc_id", "k", 48, 2)
    }
    // burstEpisodes / dowSeasonality: (type, day|dow) censuses + keyed
    // windows over the bounded daily frame
    val events = Tables.events(spark, sfDir)
    def runB(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Sequence.burstEpisodes(f(events), "event_type", "ts"))
    assert(runB(_.repartition(7)) == runB(_.coalesce(1)),
      "burstEpisodes depends on the input partitioning")
    def runD(f: DataFrame => DataFrame): Seq[String] =
      rowsOf(ops.Sequence.dowSeasonality(f(events), "event_type", "ts"))
    assert(runD(_.repartition(7)) == runD(_.coalesce(1)),
      "dowSeasonality depends on the input partitioning")
  }
}
