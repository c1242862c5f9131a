package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** A (score, id) pair flowing into the top-k aggregate. */
case class ScoredId(score: Double, id: Long)

/** Aggregation buffer: at most ~4k candidates, compacted lazily. */
case class TopKBuffer(items: Seq[ScoredId])

/** Bounded top-k aggregate: keeps the k highest-scoring ids per group.
  *
  * This is the scale path for "top-k per key" (e.g. k nearest
  * neighbors per query vector). A window-function top-k shuffles every
  * input row to the key's partition before ranking; this Aggregator is
  * a partial aggregate — each map task reduces its slice to ≤ k rows
  * before the shuffle, so a 100 TB input ships only
  * |keys| × k × |partitions| rows. Ordering is total (score desc, id
  * asc), so results are deterministic under Spark's unordered merge.
  */
class TopKAggregator(k: Int) extends Aggregator[ScoredId, TopKBuffer, Seq[ScoredId]] {
  private val maxSlack = math.max(4 * k, 64)

  // score desc, id asc — a total order, so merge order can't matter
  private def sorted(xs: Seq[ScoredId]): Seq[ScoredId] =
    xs.sortBy(s => (-s.score, s.id))

  private def compact(xs: Seq[ScoredId]): Seq[ScoredId] =
    if (xs.length <= maxSlack) xs else sorted(xs).take(k)

  def zero: TopKBuffer = TopKBuffer(Vector.empty)
  def reduce(b: TopKBuffer, a: ScoredId): TopKBuffer =
    TopKBuffer(compact(b.items :+ a))
  def merge(b1: TopKBuffer, b2: TopKBuffer): TopKBuffer =
    TopKBuffer(compact(b1.items ++ b2.items))
  def finish(r: TopKBuffer): Seq[ScoredId] = sorted(r.items).take(k)

  def bufferEncoder: Encoder[TopKBuffer] = Encoders.product[TopKBuffer]
  def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}

object TopK {
  /** `topK(5)(col("sim"), col("id"))` → array<struct<score,id>> of the
    * k best per group, usable inside `groupBy(...).agg(...)`.
    */
  def topK(k: Int): (Column, Column) => Column = {
    val f = udaf(new TopKAggregator(k), Encoders.product[ScoredId])
    (score, id) => f(score, id)
  }
}
