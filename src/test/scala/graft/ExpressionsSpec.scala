package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native codegen expressions must agree with the built-in
  * compositions they replace (same math, fused loop).
  */
class ExpressionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("vec_dot matches the zip_with/aggregate composition bit-exactly") {
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("a"))
      .withColumn("b", reverse(col("a")))
    val diff = e.select(
      expr("vec_dot(a, b)").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)").as("builtin"))
      .filter(col("native") =!= col("builtin"))
    assert(diff.count() == 0)
  }

  test("simhash64 matches the nested-aggregate formulation") {
    GraftFunctions.register(spark)
    val d = Tables.documents(spark, sfDir).limit(50)
      .select(expr("transform(split(text, ' '), t -> xxhash64(t))").as("hs"))
    val diff = d.select(
      expr("simhash64(hs)").as("native"),
      expr("""aggregate(sequence(0, 63), CAST(0 AS BIGINT), (acc, j) ->
             |  acc + CASE WHEN aggregate(hs, 0, (a, h) ->
             |      a + IF((shiftright(h, j) & 1) = 1, 1, -1)) > 0
             |    THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END)""".stripMargin)
        .as("builtin"))
      .filter(col("native") =!= col("builtin"))
    assert(diff.count() == 0)
  }

  test("minhash_sig: 64 slots, deterministic, identical sets collide fully") {
    GraftFunctions.register(spark)
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), expr("array_distinct(transform(split(text, ' '), t -> xxhash64(t)))").as("s"))
    val sigs = d.select(col("doc_id"), expr("minhash_sig(s, 64)").as("sig")).cache()
    assert(sigs.filter(size(col("sig")) =!= 64).count() == 0)
    val again = d.select(col("doc_id"), expr("minhash_sig(s, 64)").as("sig"))
    assert(sigs.exceptAll(again).count() == 0)
  }

  test("shingle_hash matches the transform/concat_ws/xxhash64 composition exactly") {
    GraftFunctions.register(spark)
    val d = Tables.documents(spark, sfDir)
      .select(split(col("text"), " ").as("t"))
    val diff = d.select(
      expr("shingle_hash(t, 3)").as("native"),
      expr("""array_distinct(CASE WHEN size(t) >= 3 THEN
             |  transform(sequence(0, size(t)-3),
             |    i -> xxhash64(concat_ws(' ', t[i], t[i+1], t[i+2])))
             |ELSE array(xxhash64(concat_ws(' ', t))) END)""".stripMargin).as("builtin"))
      .filter(!(col("native") <=> col("builtin"))) // null-safe compare
    assert(diff.count() == 0)
  }

  test("shingle_hash of a NULL token array matches the composition's empty-string hash") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT shingle_hash(CAST(NULL AS ARRAY<STRING>), 3) AS native,
        |       array(xxhash64(concat_ws(' ', CAST(NULL AS ARRAY<STRING>)))) AS builtin""".stripMargin)
      .head()
    assert(row.getSeq[Long](0) == row.getSeq[Long](1))
  }

  test("md5_shingles matches the transform/array_distinct/md5 composition exactly") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // corpus (5-gram, the docFingerprint geometry) plus the edges:
    // short docs (< n tokens → one whole-join shingle) and empty text
    val d = Tables.documents(spark, sfDir).select(col("text"))
      .unionByName(Seq("a b", "", "one two three four").toDF("text"))
      .select(split(col("text"), " ").as("t"))
    val diff = d.select(
      expr("md5_shingles(t, 5)").as("native"),
      expr("""transform(
             |  array_distinct(CASE WHEN size(t) >= 5 THEN
             |    transform(sequence(0, size(t) - 5),
             |      i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]))
             |  ELSE array(concat_ws(' ', t)) END),
             |  s -> substring(md5(s), 1, 16))""".stripMargin).as("builtin"))
      .filter(!(col("native") <=> col("builtin")))
    assert(diff.count() == 0)
    // NULL token array behaves like the composition's empty concat_ws
    val row = spark.sql(
      """SELECT md5_shingles(CAST(NULL AS ARRAY<STRING>), 5) AS native,
        |  array(substring(md5(concat_ws(' ', CAST(NULL AS ARRAY<STRING>))), 1, 16))
        |    AS builtin""".stripMargin).head()
    assert(row.getSeq[String](0) == row.getSeq[String](1))
  }

  test("top_token_count and ngram_distinct_count match their higher-order compositions") {
    GraftFunctions.register(spark)
    val d = Tables.documents(spark, sfDir)
      .select(split(col("text"), " ").as("tk"))
    val diff = d.select(
      expr("top_token_count(tk)").as("top_native"),
      expr("CAST(array_max(transform(array_distinct(tk), w -> size(filter(tk, t -> t = w)))) AS BIGINT)")
        .as("top_builtin"),
      expr("ngram_distinct_count(tk, 1)").as("d1_native"),
      expr("CAST(size(array_distinct(tk)) AS BIGINT)").as("d1_builtin"),
      expr("ngram_distinct_count(tk, 2)").as("d2_native"),
      expr("CAST(size(array_distinct(transform(sequence(0, size(tk) - 2), " +
        "i -> concat_ws(' ', tk[i], tk[i+1])))) AS BIGINT)").as("d2_builtin"))
      .filter(col("top_native") =!= col("top_builtin") ||
        col("d1_native") =!= col("d1_builtin") ||
        col("d2_native") =!= col("d2_builtin"))
    assert(diff.count() == 0)
  }

  test("set_intersect_count matches size(array_intersect) on corpus shingle pairs") {
    GraftFunctions.register(spark)
    // adjacent-doc shingle-set pairs: includes identical sets (planted
    // duplicates), disjoint sets, and partial overlaps
    val sets = Tables.documents(spark, sfDir)
      .select(col("doc_id"), expr("shingle_hash(split(text, ' '), 3)").as("sh"))
    val pairs = sets.as("a").join(sets.as("b"),
        col("a.doc_id") + 1 === col("b.doc_id"))
      .select(col("a.sh").as("x"), col("b.sh").as("y"))
    val diff = pairs.select(
        expr("set_intersect_count(x, y)").as("native"),
        expr("CAST(size(array_intersect(x, y)) AS BIGINT)").as("builtin"))
      .filter(col("native") =!= col("builtin"))
    assert(diff.count() == 0)
    // degenerate shapes: empty vs non-empty, both empty, self
    val edge = spark.sql(
      """SELECT set_intersect_count(array(1L, 2L), array(3L)) AS disjoint,
        |       set_intersect_count(CAST(array() AS ARRAY<BIGINT>), array(1L)) AS emptyLeft,
        |       set_intersect_count(array(1L, 2L, 3L), array(1L, 2L, 3L)) AS self""".stripMargin)
      .head()
    assert(edge.getLong(0) == 0L && edge.getLong(1) == 0L && edge.getLong(2) == 3L)
  }

  test("deflate_len orders redundancy correctly and is deterministic") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rep = ("spam " * 200).trim            // maximally repetitive
    val div = (0 until 200).map(i => s"w${i * 7919}").mkString(" ") // diverse
    val df = Seq((1L, rep), (2L, div), (3L, "")).toDF("doc_id", "text")
      .withColumn("dl", expr("deflate_len(text)"))
      .withColumn("nb", octet_length(col("text")).cast("long"))
    val m = df.collect().map(r => r.getLong(0) -> (r.getAs[Long]("dl"),
      r.getAs[Long]("nb"))).toMap
    // repetitive text compresses far harder than diverse text of
    // similar raw size; both compress below raw; empty stays tiny
    assert(m(1L)._1 * 10 < m(1L)._2, s"repetitive barely compressed: $m")
    assert(m(2L)._1 > m(1L)._1, "diverse text must compress worse")
    assert(m(3L)._1 > 0 && m(3L)._1 < 16)
    // determinism row-to-row and run-to-run
    val twice = Seq((1L, rep)).toDF("doc_id", "text")
      .withColumn("dl", expr("deflate_len(text)")).head().getAs[Long]("dl")
    assert(twice == m(1L)._1)
    // the corpus query: ratio in (0, ~1.5], null only for empty docs
    val corpus = ops.TextAnalysis.compressRatio(spark, sfDir).cache()
    assert(corpus.count() == Tables.documents(spark, sfDir).count())
    assert(corpus.filter(col("n_bytes") > 0 &&
      (col("compress_ratio") <= 0 || col("compress_ratio") > 1.5)).count() == 0)
  }

  test("GraftExtensions injects all function specs") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext) // must not throw
  }
}
