package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `vec_dot(a, b)`: dot product of two array<double> columns.
  *
  * The `zip_with` + `aggregate` built-in formulation evaluates an
  * interpreted lambda per element — ~2 allocations + virtual calls per
  * multiply-add. This native expression runs the loop inside
  * whole-stage codegen: one fused Java loop over the two ArrayData
  * buffers, no lambda, no allocation. Summation is sequential
  * left-to-right in double, bit-identical to the built-in composition
  * (and to DuckDB's `list_dot_product` on DOUBLE[]), so DuckDB oracles
  * keep matching.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // fail loudly on dimension mismatch — a silent partial dot product
    // is plausible-looking data corruption
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"vec_dot: array length mismatch ($n vs ${y.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "vec_dot: array length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** `cell_sims(vec, centroids)`: dot products of one array<double>
  * vector against EVERY row of a literal centroid matrix
  * (array<array<double>>), returned as array<double> — the
  * assignment primitive of the IVF/k-means/SemDeDup family.
  *
  * Why a kernel: the previous formulation built `greatest(struct(
  * vec_dot(emb, lit(c0)), 0), ..., struct(vec_dot(emb, lit(cN)), N))`
  * — N separate literal+dot+struct subtrees. Catalyst ANALYSIS and
  * codegen costs grow with that tree on every job (Lloyd training
  * pays it per iteration), and the r12 auto-sizing of SemDeDup cells
  * (8 → up to 256) turned it into the dominant cost: the stock sf1
  * run regressed 7 → 29 s with ~7 s per 16k-row training iteration —
  * pure plan overhead, not data. This node carries the whole matrix
  * as ONE reference object: tree size O(1) in cell count, one fused
  * loop per row in codegen.
  *
  * Arithmetic is bit-identical to per-centroid [[VecDot]]: the same
  * sequential left-to-right double summation per cell, cells in
  * matrix order — so every trained trajectory, assignment, and
  * stored index is unchanged (SimilaritySpec's planted recoveries and
  * IOSpec's byte-identity pin it).
  */
case class CellSims(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"cell_sims requires array<double>, got ${dt.simpleString}")
    }
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val out = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      val cn = cents(c)
      // fail loudly on dimension mismatch — the VecDot contract
      if (cn.length != dim)
        throw new IllegalArgumentException(
          s"cell_sims: array length mismatch ($dim vs ${cn.length})")
      var s = 0.0
      var i = 0
      while (i < dim) { s += v.getDouble(i) * cn(i); i += 1 }
      out(c) = s
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val m = ctx.addReferenceObj("cents", cents, "double[][]")
      val dim = ctx.freshName("dim")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val cn = ctx.freshName("cn")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $dim = $x.numElements();
         |double[] $out = new double[$m.length];
         |for (int $c = 0; $c < $m.length; $c++) {
         |  double[] $cn = $m[$c];
         |  if ($cn.length != $dim) {
         |    throw new IllegalArgumentException(
         |      "cell_sims: array length mismatch (" + $dim + " vs " + $cn.length + ")");
         |  }
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $s += $x.getDouble($i) * $cn[$i];
         |  }
         |  $out[$c] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CellSims =
    copy(child = newChild)
}

/** `simhash64(hashes)`: 64-bit SimHash signature of an array<long> of
  * token hashes — for each bit position, count tokens voting +1/-1 and
  * keep the sign. One fused loop (tokens × 64 bit-tests) in codegen vs
  * the nested `aggregate(sequence(0,63), aggregate(hs, ...))` built-in
  * composition, which is O(64·T) *interpreted lambda calls*.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $votes = new int[64];
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($h >>> $j) & 1L) == 1L) $votes[$j]++; else $votes[$j]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($votes[$j] > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `minhash_sig(shingles, k)`: k MinHash values of an array<long>
  * shingle set. Hash family: XXH64(shingle, seed = slot index) via
  * Spark's own XXH64 implementation. One fused loop (shingles × k)
  * replacing `transform(sequence(0,k-1), j -> array_min(transform(...)))`
  * — again O(S·k) interpreted lambdas → one codegen loop.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(Long.MaxValue)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val m = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(h, j)
        if (m < sig(j)) sig(j) = m
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sig = ctx.freshName("sig")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val m = ctx.freshName("m")
      s"""
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $m = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($h, (long) $j);
         |    if ($m < $sig[$j]) $sig[$j] = $m;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `shingle_hash(tokens, n)`: distinct xxhash64 values of all word
  * n-gram shingles of an array<string> of tokens — one native pass
  * replacing `array_distinct(transform(sequence(...), i ->
  * xxhash64(concat_ws(' ', t[i], ...))))`, which evaluates an
  * interpreted lambda (with per-shingle string allocation through the
  * generic path) for every shingle. Semantics are IDENTICAL to that
  * composition: same `concat_ws(' ', ...)` byte layout, same
  * `xxhash64` (seed 42), first-occurrence order of distinct values,
  * and the whole-text fallback when fewer than n tokens exist.
  * Codegen fallback (the loop is already a single native call per
  * row; nothing to fuse).
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val space = UTF8String.fromString(" ")
  private val Seed = 42L // the xxhash64 SQL function's seed

  override def nullable: Boolean = false

  // NULL token array (split of NULL text) behaves like the composition
  // it replaces: concat_ws over nothing → "" → one hash of the empty
  // string — NOT a null result, so null-text docs still pair with
  // empty-text docs downstream.
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array(XXH64.hashUTF8String(UTF8String.fromString(""), Seed)))
    else nullSafeEval(v)
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val len = toks.numElements()
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (len >= n) {
      val window = new Array[UTF8String](n)
      var i = 0
      while (i <= len - n) {
        var j = 0
        while (j < n) { window(j) = toks.getUTF8String(i + j); j += 1 }
        out.add(XXH64.hashUTF8String(UTF8String.concatWs(space, window: _*), Seed))
        i += 1
      }
    } else {
      val all = new Array[UTF8String](len)
      var j = 0
      while (j < len) { all(j) = toks.getUTF8String(j); j += 1 }
      out.add(XXH64.hashUTF8String(UTF8String.concatWs(space, all: _*), Seed))
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `md5_shingles(tokens, n)`: 16-hex-char (64-bit) md5 prefixes of all
  * DISTINCT word n-gram shingles of an array<string> — the
  * engine-neutral hash family behind `docFingerprint` (md5-hex is
  * recomputable everywhere, which is what makes the fingerprint a
  * stable identity AND DuckDB-oracle-able). One fused native pass with
  * a thread-local MessageDigest vs the
  * `transform(array_distinct(transform(...concat_ws...)), s ->
  * substring(md5(s), 1, 16))` built-in composition, whose per-shingle
  * INTERPRETED lambda calls (plus a MessageDigest instantiation per
  * call) made the fingerprint the slowest-growing query of the r11
  * sf1 scale-proof (15.4× on 10× data; the kernel restores ~linear).
  * Short-array edge (len < n): ONE shingle of the whole joined array —
  * the [[ShingleHashes]] contract; null input behaves like the
  * composition (concat_ws over nothing → "" → one md5("") prefix).
  * Codegen fallback (single native call per row; nothing to fuse).
  */
case class Md5ShinglePrefixes(child: Expression, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val space = UTF8String.fromString(" ")

  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](Md5ShinglePrefixes.hex16(UTF8String.fromString(""))))
    else nullSafeEval(v)
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val len = toks.numElements()
    // distinct SHINGLES (pre-hash, insertion order) — the builtin
    // composition's array_distinct runs on the shingle strings, so a
    // (vanishingly unlikely) prefix collision of two distinct shingles
    // must stay visible downstream exactly as it would there
    val shingles = new java.util.LinkedHashSet[UTF8String]()
    if (len >= n) {
      val window = new Array[UTF8String](n)
      var i = 0
      while (i <= len - n) {
        var j = 0
        while (j < n) { window(j) = toks.getUTF8String(i + j); j += 1 }
        shingles.add(UTF8String.concatWs(space, window: _*))
        i += 1
      }
    } else {
      val all = new Array[UTF8String](len)
      var j = 0
      while (j < len) { all(j) = toks.getUTF8String(j); j += 1 }
      shingles.add(UTF8String.concatWs(space, all: _*))
    }
    val arr = new Array[Any](shingles.size)
    val it = shingles.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = Md5ShinglePrefixes.hex16(it.next()); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): Md5ShinglePrefixes =
    copy(child = newChild)
}

object Md5ShinglePrefixes {
  import org.apache.spark.unsafe.types.UTF8String

  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
  private val HexChars = "0123456789abcdef".toCharArray

  /** Lowercase hex of the first 8 md5 bytes (= the 16-hex-char prefix
    * of the full 32-char digest, bitwise what `substring(md5(s), 1,
    * 16)` returns in Spark and DuckDB alike).
    */
  private[functions] def hex16(s: UTF8String): UTF8String = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val out = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** `top_token_count(tokens)`: highest frequency of any single token in
  * an array<string> — one hash-count pass, O(tokens). The higher-order
  * built-in formulation `array_max(transform(array_distinct(tk), w ->
  * size(filter(tk, t -> t = w))))` is O(distinct × tokens)
  * *interpreted lambda calls* per row — quadratic-ish per document and
  * the dominant cost of the repetition/quality-filter curation ops.
  * Codegen fallback (single native call per row; nothing to fuse).
  */
case class TopTokenCount(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val counts = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Int](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      val c = counts.merge(t, 1, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    best.toLong
  }

  override protected def withNewChildInternal(newChild: Expression): TopTokenCount =
    copy(child = newChild)
}

/** `ngram_distinct_count(tokens, n)`: number of distinct word n-gram
  * strings (space-joined sliding windows) in an array<string> — the
  * native replacement for `size(array_distinct(transform(sequence(...),
  * i -> concat_ws(' ', ...))))`, which allocates and interprets a
  * lambda per n-gram. Same semantics: n = 1 counts distinct tokens;
  * fewer than n tokens → 0. Codegen fallback (single native call).
  */
case class NgramDistinctCount(child: Expression, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType = LongType

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val len = toks.numElements()
    if (len < n) 0L
    else {
      val seen = new java.util.HashSet[UTF8String]((len - n + 1) * 2)
      if (n == 1) {
        var i = 0
        while (i < len) { seen.add(toks.getUTF8String(i)); i += 1 }
      } else {
        val window = new Array[UTF8String](n)
        var i = 0
        while (i <= len - n) {
          var j = 0
          while (j < n) { window(j) = toks.getUTF8String(i + j); j += 1 }
          seen.add(UTF8String.concatWs(space, window: _*))
          i += 1
        }
      }
      seen.size.toLong
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NgramDistinctCount =
    copy(child = newChild)
}

/** `deflate_len(s)`: byte length of the DEFLATE-compressed UTF-8 text.
  * `deflate_len(text) / octet_length(text)` is the classic redundancy
  * quality signal (CCNet/Gopher-family filters): highly repetitive
  * text compresses far better than diverse prose, and the signal sees
  * repetition that token-level ratios miss (sub-token and phrase
  * structure). Fixed compression level 6; one native call per row
  * (codegen fallback, like the other per-row text kernels). Not
  * SQL-expressible in the oracle engine → rows-only driver check;
  * planted orderings pinned in ExpressionsSpec.
  */
case class DeflateLen(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val d = new java.util.zip.Deflater(6)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

/** `set_intersect_count(a, b)`: |A ∩ B| over two array<long> columns
  * treated as sets (the hashed-shingle representation — elements
  * already distinct). The `size(array_intersect(a, b))` built-in
  * materializes the intersection ARRAY (hash structure + output buffer
  * per row) only to take its length, and the Jaccard formulation pays
  * that twice (`array_union` too). This native kernel hash-sets the
  * SMALLER side once and probes with the larger — one pass, one
  * allocation, no output array — and every downstream similarity
  * derives from the one count: jacc = c/(|A|+|B|−c),
  * containment = c/min(|A|,|B|). Codegen fallback (single native call
  * per row, like the other set kernels). Set semantics on distinct
  * inputs match the built-ins bit-for-bit (ExpressionsSpec pins the
  * equivalence on corpus pairs). Input typing is enforced at ANALYSIS
  * time (`checkInputDataTypes` requires array<bigint> on both sides;
  * `ExpectsInputTypes` would be the idiomatic spelling but its
  * `AbstractDataType` vocabulary is `private[sql]`): a generally-
  * registered SQL function must reject a wrongly-typed call with an
  * AnalysisException, not a runtime ClassCastException deep in an
  * executor. Null ELEMENTS are skipped on both sides (a null hash is
  * no shingle), so they can never be silently counted as value 0.
  */
case class SetIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"set_intersect_count requires (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[ArrayData]
    var y = b.asInstanceOf[ArrayData]
    if (x.numElements() > y.numElements()) { val t = x; x = y; y = t }
    val nx = x.numElements()
    val ny = y.numElements()
    if (nx == 0) 0L
    else {
      val set = new java.util.HashSet[java.lang.Long](nx * 2)
      var i = 0
      while (i < nx) { if (!x.isNullAt(i)) set.add(x.getLong(i)); i += 1 }
      var c = 0L
      var j = 0
      while (j < ny) {
        if (!y.isNullAt(j) && set.contains(y.getLong(j))) c += 1L
        j += 1
      }
      c
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SetIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Registration for the native expressions.
  *
  * Two paths:
  *  - [[GraftFunctions.register]]: imperative, idempotent per-session
  *    registration — works on any SparkSession handed to the library
  *    (the driver's session included).
  *  - [[GraftExtensions]]: `spark.sql.extensions=graft.GraftExtensions`
  *    for cluster deployments where the session is built once from
  *    config.
  */
object GraftFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private[graft] val specs: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (es => VecDot(es(0), es(1))),
    "cell_sims" -> (es => {
      if (es.length != 2 || !es(1).foldable)
        throw new IllegalArgumentException(
          "cell_sims(vec, centroids) requires exactly 2 arguments with a " +
            "literal array<array<double>> centroid matrix")
      val m = es(1).eval(null) match {
        case a: ArrayData =>
          Array.tabulate(a.numElements()) { c =>
            val row = a.getArray(c)
            Array.tabulate(row.numElements())(row.getDouble)
          }
        case other => throw new IllegalArgumentException(
          s"cell_sims: centroids must be a literal matrix, got $other")
      }
      require(m.nonEmpty, "cell_sims: centroid matrix must be non-empty")
      CellSims(es(0), m)
    }),
    "simhash64" -> (es => SimHash64(es(0))),
    "shingle_hash" -> (es => {
      if (es.length != 2 || !es(1).foldable)
        throw new IllegalArgumentException(
          "shingle_hash(tokens, n) requires exactly 2 arguments with a literal integer n")
      ShingleHashes(es(0), es(1).eval(null) match {
        case n: Number if n.intValue() >= 1 => n.intValue()
        case other => throw new IllegalArgumentException(
          s"shingle_hash: n must be a literal integer >= 1, got $other")
      })
    }),
    "top_token_count" -> (es => TopTokenCount(es(0))),
    "md5_shingles" -> (es => {
      if (es.length != 2 || !es(1).foldable)
        throw new IllegalArgumentException(
          "md5_shingles(tokens, n) requires exactly 2 arguments with a literal integer n")
      Md5ShinglePrefixes(es(0), es(1).eval(null) match {
        case n: Number if n.intValue() >= 1 => n.intValue()
        case other => throw new IllegalArgumentException(
          s"md5_shingles: n must be a literal integer >= 1, got $other")
      })
    }),
    "bloom_might_contain" -> (es => {
      if (es.length != 2 || !es(1).foldable)
        throw new IllegalArgumentException(
          "bloom_might_contain(key, filterBytes) requires exactly 2 arguments " +
            "with a literal binary filter")
      BloomMightContain(es(0), es(1).eval(null) match {
        case b: Array[Byte] => b
        case other => throw new IllegalArgumentException(
          s"bloom_might_contain: filterBytes must be a binary literal, got $other")
      })
    }),
    "set_intersect_count" -> (es => SetIntersectCount(es(0), es(1))),
    "deflate_len" -> (es => DeflateLen(es(0))),
    "ngram_distinct_count" -> (es => {
      if (es.length != 2 || !es(1).foldable)
        throw new IllegalArgumentException(
          "ngram_distinct_count(tokens, n) requires exactly 2 arguments with a literal integer n")
      NgramDistinctCount(es(0), es(1).eval(null) match {
        case n: Number if n.intValue() >= 1 => n.intValue()
        case other => throw new IllegalArgumentException(
          s"ngram_distinct_count: n must be a literal integer >= 1, got $other")
      })
    }),
    "minhash_sig" -> (es => {
      if (es.length != 2 || !es(1).foldable)
        throw new IllegalArgumentException(
          "minhash_sig(hashes, k) requires exactly 2 arguments with a literal integer k")
      MinHashSig(es(0), es(1).eval(null) match {
        case n: Number => n.intValue()
        case other => throw new IllegalArgumentException(
          s"minhash_sig: k must be a literal integer, got $other")
      })
    }),
  )

  /** Idempotent: safe to call at the top of every operator. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    specs.foreach { case (name, builder) =>
      if (!registry.functionExists(FunctionIdentifier(name))) {
        registry.registerFunction(
          FunctionIdentifier(name),
          new ExpressionInfo("graft.functions", name),
          builder)
      }
    }
  }
}

/** Entry point for `spark.sql.extensions=graft.GraftExtensions`. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.specs.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
}
