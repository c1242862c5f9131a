package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-memory Misra–Gries frequent-items summary (the classic
  * deterministic heavy-hitters sketch; Misra & Gries 1982, mergeable
  * form per Agrawal et al., "Mergeable Summaries", PODS 2012).
  *
  * The buffer holds at most `width` counters regardless of how many
  * distinct terms stream through it — the property that makes corpus
  * frequent-term mining feasible at 100 TB, where the full term
  * vocabulary is far too large for an exact per-term aggregation
  * state. Guarantee: any term whose true count exceeds N/(width+1)
  * (N = total stream length) is PRESENT in the final summary; counts
  * in the buffer are underestimates by at most N/(width+1). Merge
  * (partial aggregation across partitions) preserves the guarantee.
  *
  * Used as the CANDIDATE-PRUNING phase of
  * [[graft.ops.TextAnalysis.heavyHitters]]: the sketch bounds the
  * candidate set, then an exact counting pass over just those
  * candidates restores exactness — the output carries no sketch error
  * at all.
  */
case class MGBuffer(counts: Map[String, Long])

class MisraGriesAggregator(width: Int)
    extends Aggregator[String, MGBuffer, Seq[String]] {

  def zero: MGBuffer = MGBuffer(Map.empty)

  def reduce(b: MGBuffer, term: String): MGBuffer = {
    val m = b.counts
    m.get(term) match {
      case Some(c) => MGBuffer(m.updated(term, c + 1L))
      case None if m.size < width => MGBuffer(m.updated(term, 1L))
      case None =>
        // Decrement-all step: removes width+1 units of total count, so
        // it fires at most N/(width+1) times — O(N·width/(width+1))
        // amortized overall.
        MGBuffer(m.flatMap { case (t, c) =>
          if (c > 1L) Some(t -> (c - 1L)) else None
        })
    }
  }

  def merge(b1: MGBuffer, b2: MGBuffer): MGBuffer = {
    val summed = b2.counts.foldLeft(b1.counts) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (summed.size <= width) MGBuffer(summed)
    else {
      // Keep the width largest; subtract the (width+1)-th largest count
      // from every survivor — the mergeable-summaries offset that
      // preserves the underestimate bound.
      val cut = summed.values.toSeq.sorted(Ordering.Long.reverse).apply(width)
      MGBuffer(summed.flatMap { case (t, c) =>
        if (c > cut) Some(t -> (c - cut)) else None
      })
    }
  }

  def finish(b: MGBuffer): Seq[String] = b.counts.keys.toSeq.sorted

  def bufferEncoder: Encoder[MGBuffer] = Encoders.product[MGBuffer]
  def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object MisraGries {
  /** `misraGries(200)(col("term"))` → array&lt;string&gt; of at most
    * 200 candidate terms, guaranteed to contain every term with true
    * frequency &gt; N/201.
    */
  def misraGries(width: Int): Column => Column = {
    val f = udaf(new MisraGriesAggregator(width), Encoders.STRING)
    term => f(term)
  }
}
