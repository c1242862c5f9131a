package graft

import graft.functions.{MinHashSig, NgramDistinctCount, ScoredId, ScoredTerm, SimHash64, TopKAggregator, TopKTermAggregator, TopTokenCount, VecDot}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Algebraic laws for the engine's native primitives (SURVEY.md §5.2
  * item 3). Pure expression-level properties — no Spark session, so
  * hundreds of cases run in milliseconds.
  */
object GraftLaws extends Properties("graft") {

  private val finiteD: Gen[Double] = Gen.choose(-1e6, 1e6)
  private val vec: Gen[Array[Double]] =
    Gen.chooseNum(1, 64).flatMap(n => Gen.listOfN(n, finiteD).map(_.toArray))
  // one shared length: VecDot rejects mismatched arity by design
  private val vecPair: Gen[(Array[Double], Array[Double])] =
    Gen.chooseNum(1, 64).flatMap { n =>
      Gen.zip(Gen.listOfN(n, finiteD).map(_.toArray), Gen.listOfN(n, finiteD).map(_.toArray))
    }
  private val longs: Gen[Array[Long]] =
    Gen.chooseNum(0, 200).flatMap(n => Gen.listOfN(n, Gen.long).map(_.toArray))

  private def dot(a: Array[Double], b: Array[Double]): Double =
    VecDot(Literal(1), Literal(1))
      .nullSafeEval(new GenericArrayData(a), new GenericArrayData(b))
      .asInstanceOf[Double]

  property("vec_dot is symmetric") = forAll(vecPair) { case (a, b) =>
    dot(a, b) == dot(b, a)
  }

  property("cosine similarity lies in [-1, 1]") = forAll(vec) { a =>
    val b = a.map(x => -x * 0.5 + 1.0)
    val na = math.sqrt(dot(a, a)); val nb = math.sqrt(dot(b, b))
    (na == 0 || nb == 0) || {
      val c = dot(a, b) / (na * nb)
      c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9
    }
  }

  private def simhash(xs: Array[Long]): Long =
    SimHash64(Literal(1L)).nullSafeEval(new GenericArrayData(xs)).asInstanceOf[Long]

  property("simhash64 is order-invariant (multiset function)") =
    forAll(longs, Gen.long) { (xs, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(xs.toSeq).toArray
      simhash(xs) == simhash(shuffled)
    }

  private def minhash(xs: Array[Long], k: Int): Seq[Long] = {
    val r = MinHashSig(Literal(1L), k).nullSafeEval(new GenericArrayData(xs))
    r.asInstanceOf[GenericArrayData].toLongArray().toSeq
  }

  property("minhash(A ++ B) is the elementwise min of minhash(A), minhash(B)") =
    forAll(longs, longs) { (a, b) =>
      a.isEmpty || b.isEmpty || {
        val k = 16
        val u = minhash(a ++ b, k)
        val expect = minhash(a, k).zip(minhash(b, k)).map { case (x, y) => math.min(x, y) }
        u == expect
      }
    }

  private val scoredIds: Gen[List[ScoredId]] =
    Gen.listOf(Gen.zip(finiteD, Gen.chooseNum(0L, 1000L)).map { case (s, i) => ScoredId(s, i) })

  property("topK equals global sort-take-k under arbitrary partitioning and merge order") =
    forAll(scoredIds, Gen.chooseNum(1, 10), Gen.long) { (xs, k, seed) =>
      val agg = new TopKAggregator(k)
      val rnd = new scala.util.Random(seed)
      // split into random chunks, reduce each, merge in random order —
      // models Spark's partial aggregation with nondeterministic merges
      val chunks =
        if (xs.isEmpty) Seq(agg.zero)
        else xs.grouped(math.max(1, rnd.nextInt(5) + 1)).toSeq
          .map(c => c.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(chunks).reduce(agg.merge)
      val expect = xs.sortBy(s => (-s.score, s.id)).take(k)
      agg.finish(merged) == expect
    }

  private val scoredTerms: Gen[List[ScoredTerm]] =
    Gen.listOf(Gen.zip(finiteD, Gen.alphaStr.map(_.take(8)))
      .map { case (s, t) => ScoredTerm(s, t) })

  property("topKTerms equals global sort-take-k under arbitrary partitioning and merge order") =
    forAll(scoredTerms, Gen.chooseNum(1, 10), Gen.long) { (xs, k, seed) =>
      val agg = new TopKTermAggregator(k)
      val rnd = new scala.util.Random(seed)
      val chunks =
        if (xs.isEmpty) Seq(agg.zero)
        else xs.grouped(math.max(1, rnd.nextInt(5) + 1)).toSeq
          .map(c => c.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(chunks).reduce(agg.merge)
      val expect = xs.sortBy(s => (-s.score, s.term)).take(k)
      agg.finish(merged) == expect
    }

  private val tokens: Gen[Array[UTF8String]] =
    Gen.listOf(Gen.oneOf("a", "b", "c", "dog", "cat", "x1"))
      .map(_.map(UTF8String.fromString).toArray)

  private def topCount(tk: Array[UTF8String]): Long =
    TopTokenCount(Literal(1)).nullSafeEval(new GenericArrayData(tk.map(_.asInstanceOf[Any])))
      .asInstanceOf[Long]

  private def distinctN(tk: Array[UTF8String], n: Int): Long =
    NgramDistinctCount(Literal(1), n)
      .nullSafeEval(new GenericArrayData(tk.map(_.asInstanceOf[Any])))
      .asInstanceOf[Long]

  property("top_token_count equals the max groupBy count; order-invariant") =
    forAll(tokens, Gen.long) { (tk, seed) =>
      val expect =
        if (tk.isEmpty) 0L
        else tk.groupBy(_.toString).values.map(_.length).max.toLong
      val shuffled = new scala.util.Random(seed).shuffle(tk.toSeq).toArray
      topCount(tk) == expect && topCount(shuffled) == expect
    }

  property("ngram_distinct_count matches a sliding-window set; n=1 is distinct tokens") =
    forAll(tokens, Gen.chooseNum(1, 4)) { (tk, n) =>
      val expect =
        if (tk.length < n) 0L
        else tk.map(_.toString).sliding(n).map(_.mkString(" ")).toSet.size.toLong
      distinctN(tk, n) == expect &&
        distinctN(tk, 1) == tk.map(_.toString).distinct.length.toLong
    }

  private def interCount(a: Array[Long], b: Array[Long]): Long =
    graft.functions.SetIntersectCount(Literal(1L), Literal(1L))
      .nullSafeEval(new GenericArrayData(a), new GenericArrayData(b))
      .asInstanceOf[Long]

  // distinct-element arrays — the hashed-shingle representation the
  // kernel is specified over
  private val longSet: Gen[Array[Long]] =
    Gen.chooseNum(0, 100).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-50L, 50L)).map(_.distinct.toArray))

  property("set_intersect_count is symmetric and matches the Set model") =
    forAll(longSet, longSet) { (a, b) =>
      val model = (a.toSet intersect b.toSet).size.toLong
      interCount(a, b) == model && interCount(b, a) == model
    }

  property("set_intersect_count: self is size; bounded by min; derived Jaccard in [0,1]") =
    forAll(longSet, longSet) { (a, b) =>
      val c = interCount(a, b)
      val selfOk = interCount(a, a) == a.length.toLong
      val boundOk = c <= math.min(a.length, b.length)
      val jaccOk = a.isEmpty && b.isEmpty || {
        val j = c.toDouble / (a.length + b.length - c)
        j >= 0.0 && j <= 1.0
      }
      selfOk && boundOk && jaccOk
    }

  // random symmetric matrices for the Jacobi eigensolver laws
  private val symMat: Gen[Array[Array[Double]]] =
    Gen.chooseNum(2, 8).flatMap { n =>
      Gen.listOfN(n * n, Gen.choose(-10.0, 10.0)).map { xs =>
        val m = Array.ofDim[Double](n, n)
        var k = 0
        for (i <- 0 until n; j <- 0 until n) { m(i)(j) = xs(k); k += 1 }
        // symmetrize: (M + Mᵀ) / 2
        Array.tabulate(n, n)((i, j) => (m(i)(j) + m(j)(i)) / 2.0)
      }
    }

  property("jacobi: eigenvalue sum equals the trace; values descend") =
    forAll(symMat) { a =>
      val vals = graft.functions.Jacobi.eigenvaluesDesc(a)
      val trace = a.indices.map(i => a(i)(i)).sum
      val scaleTol = 1e-9 * math.max(1.0, a.flatten.map(math.abs).max) * a.length
      math.abs(vals.sum - trace) < scaleTol &&
        vals.zip(vals.tail).forall { case (x, y) => x >= y - 1e-12 }
    }

  property("jacobi: A·v = λ·v for every returned pair; eigenvectors orthonormal") =
    forAll(symMat) { a =>
      val n = a.length
      val (vals, vecs) = graft.functions.Jacobi.eigenDesc(a)
      val scale = math.max(1.0, a.flatten.map(math.abs).max)
      val residOk = (0 until n).forall { k =>
        val v = vecs(k)
        val av = Array.tabulate(n)(i => (0 until n).map(j => a(i)(j) * v(j)).sum)
        (0 until n).forall(i => math.abs(av(i) - vals(k) * v(i)) < 1e-7 * scale)
      }
      val orthoOk = (0 until n).forall { k =>
        (k until n).forall { l =>
          val d = vecs(k).zip(vecs(l)).map { case (x, y) => x * y }.sum
          math.abs(d - (if (k == l) 1.0 else 0.0)) < 1e-8
        }
      }
      residOk && orthoOk
    }

  // bloom_might_contain: the sketch's defining one-sided guarantee —
  // a key that was inserted can NEVER probe false, whatever the
  // sizing. (False positives are allowed and bounded by fpp; the
  // exact join above the probe removes them.)
  property("bloom filter has no false negatives") =
    forAll(Gen.nonEmptyListOf(Gen.long), Gen.chooseNum(1, 64)) { (ks, slack) =>
      val bf = org.apache.spark.util.sketch.BloomFilter.create(
        ks.size.toLong + slack, 0.03)
      ks.foreach(bf.putLong)
      val out = new java.io.ByteArrayOutputStream()
      bf.writeTo(out)
      val probe = graft.functions.BloomMightContain(
        Literal(1L), out.toByteArray)
      ks.forall(k => probe.nullSafeEval(k).asInstanceOf[Boolean])
    }
}
