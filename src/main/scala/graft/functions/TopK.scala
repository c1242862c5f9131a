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

/** A (score, term) pair for string-keyed top-k (e.g. tf·idf terms). */
case class ScoredTerm(score: Double, term: String)

case class TopKTermBuffer(items: Seq[ScoredTerm])

/** String-keyed variant of [[TopKAggregator]]: top-k terms per group by
  * (score desc, term asc) — the same bounded partial aggregate, for key
  * domains that are strings rather than numeric ids. Each map task
  * emits ≤ k rows per group before the shuffle, so "top terms per
  * language" never funnels a language's whole vocabulary through one
  * window task.
  */
class TopKTermAggregator(k: Int) extends Aggregator[ScoredTerm, TopKTermBuffer, Seq[ScoredTerm]] {
  private val maxSlack = math.max(4 * k, 64)

  private def sorted(xs: Seq[ScoredTerm]): Seq[ScoredTerm] =
    xs.sortBy(s => (-s.score, s.term))

  private def compact(xs: Seq[ScoredTerm]): Seq[ScoredTerm] =
    if (xs.length <= maxSlack) xs else sorted(xs).take(k)

  def zero: TopKTermBuffer = TopKTermBuffer(Vector.empty)
  def reduce(b: TopKTermBuffer, a: ScoredTerm): TopKTermBuffer =
    TopKTermBuffer(compact(b.items :+ a))
  def merge(b1: TopKTermBuffer, b2: TopKTermBuffer): TopKTermBuffer =
    TopKTermBuffer(compact(b1.items ++ b2.items))
  def finish(r: TopKTermBuffer): Seq[ScoredTerm] = sorted(r.items).take(k)

  def bufferEncoder: Encoder[TopKTermBuffer] = Encoders.product[TopKTermBuffer]
  def outputEncoder: Encoder[Seq[ScoredTerm]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredTerm]]()
}

object TopK {
  /** `topK(5)(col("sim"), col("id"))` → array<struct<score,id>> of the
    * k best per group, usable inside `groupBy(...).agg(...)`.
    */
  def topK(k: Int): (Column, Column) => Column = {
    val f = udaf(new TopKAggregator(k), Encoders.product[ScoredId])
    (score, id) => f(score, id)
  }

  /** `topKTerms(5)(col("score"), col("term"))` → array<struct<score,term>>. */
  def topKTerms(k: Int): (Column, Column) => Column = {
    val f = udaf(new TopKTermAggregator(k), Encoders.product[ScoredTerm])
    (score, term) => f(score, term)
  }
}
