package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact covariance moments of a vector column in ONE partial
  * aggregate: buffer = [n, Σv (dim slots), upper-triangle Σ v_i·v_j
  * (dim·(dim+1)/2 slots)] — fixed-size (O(dim²)) regardless of corpus
  * size, so each map task reduces its whole slice to one ~2k-double
  * buffer before the shuffle and the driver only ever sees the merged
  * matrix. This is the scale-correct shape for covariance/PCA over
  * 100 TB of embeddings: the alternative (explode (i,j) pairs and
  * groupBy position) multiplies the corpus by dim² rows in the
  * exchange.
  *
  * Input vectors must all have length `dim` — dimension drift is data
  * corruption and fails loudly (the [[VecDot]] discipline).
  */
class CovMomentsAggregator(dim: Int)
    extends Aggregator[Seq[Double], Array[Double], Array[Double]] {
  private val tri = dim * (dim + 1) / 2

  def zero: Array[Double] = new Array[Double](1 + dim + tri)

  def reduce(b: Array[Double], v: Seq[Double]): Array[Double] = {
    require(v.length == dim,
      s"CovMomentsAggregator: vector of length ${v.length}, expected $dim")
    val a = v.toArray
    b(0) += 1.0
    var i = 0
    while (i < dim) { b(1 + i) += a(i); i += 1 }
    var k = 1 + dim
    i = 0
    while (i < dim) {
      var j = i
      val ai = a(i)
      while (j < dim) { b(k) += ai * a(j); j += 1; k += 1 }
      i += 1
    }
    b
  }

  def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  def finish(r: Array[Double]): Array[Double] = r

  def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

/** Driver-side dense symmetric eigensolver (classical cyclic Jacobi
  * rotations — the textbook method; public knowledge). Sized for the
  * bounded matrices this engine ever brings to the driver (dim ≤ a few
  * hundred): O(dim³) per sweep, converges in a handful of sweeps.
  * Returns eigenvalues sorted descending.
  */
object Jacobi {
  private def offDiagNorm(a: Array[Array[Double]]): Double = {
    val n = a.length
    var s = 0.0
    var p = 0
    while (p < n) {
      var q = p + 1
      while (q < n) { s += a(p)(q) * a(p)(q); q += 1 }
      p += 1
    }
    s
  }

  def eigenvaluesDesc(sym: Array[Array[Double]]): Array[Double] =
    eigenDesc(sym)._1

  /** Eigenvalues (descending) AND the matching unit eigenvectors (one
    * per row of the returned matrix, aligned with the value order).
    */
  def eigenDesc(sym: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = sym.length
    val a = sym.map(_.clone())
    // accumulated rotations: columns of v converge to the eigenvectors
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < 64 && offDiagNorm(a) > 1e-18 * math.max(1.0, n.toDouble)) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(1.0 + theta * theta))
              else -1.0 / (-theta + math.sqrt(1.0 + theta * theta))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = t * c
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < n) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { j =>
      val col = Array.tabulate(n)(i => v(i)(j))
      // deterministic sign: largest-|component| entry is positive
      val m = col.indices.maxBy(i => (math.abs(col(i)), -i))
      if (col(m) < 0) col.map(x => -x) else col
    }.toArray
    (vals, vecs)
  }
}
