package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items summary as a typed `Aggregator` (the
  * mergeable-summaries form of Agarwal et al., PODS 2012): capacity-`m`
  * counter map over a token stream, guaranteeing that every item whose
  * true frequency exceeds `N/m` is present in the final summary — the
  * CANDIDATE phase of the two-pass heavy-hitters operator
  * (`TextAnalysis.heavyHitters`), whose second pass recounts candidates
  * exactly.
  *
  * Spark runs it with the usual partial/merge split: `reduce` builds a
  * per-partition summary, `merge` combines summaries across partitions
  * by adding counters and, when the union overflows `m`, subtracting
  * the (m+1)-th largest counter value from every counter and dropping
  * the non-positive ones — the merge rule under which the ε = 1/m error
  * bound composes (each summary's counts under-estimate truth by at
  * most εN of its own stream, and the subtraction adds at most the
  * removed offset, which telescopes across merges). State is O(m) per
  * group no matter how many rows flow through; only O(P·m) rows ever
  * shuffle.
  *
  * The buffer is an immutable Map updated with structural sharing —
  * `ScalaAggregator` keeps it as a live object within a partition
  * (serialization happens only at the shuffle boundary), so per-row
  * cost is the persistent-map update, and the O(m) decrement step is
  * amortized: every decrement destroys counts that were each paid for
  * by one increment. */
class MisraGriesAggregator(m: Int)
    extends Aggregator[String, Map[String, Long], Array[String]] {
  require(m >= 1, s"Misra-Gries needs capacity >= 1, got $m")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1L)
      case None if buf.size < m => buf.updated(item, 1L)
      case None =>
        // full and item absent: decrement all, drop zeros (the new item's
        // single count cancels against the decrement and is never stored)
        buf.flatMap { case (k, c) => if (c > 1L) Some(k -> (c - 1L)) else None }
    }

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val sum = b2.foldLeft(b1) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (sum.size <= m) sum
    else {
      // subtract the (m+1)-th largest count from everything, keep positives
      val offset = sum.valuesIterator.toArray.sortBy(-_).apply(m)
      sum.flatMap { case (k, c) => if (c > offset) Some(k -> (c - offset)) else None }
    }
  }

  /** Candidates only — MG counts are lower-bound estimates; the exact
    * recount pass supplies the true frequencies. Sorted for a
    * deterministic output regardless of map iteration order. */
  override def finish(buf: Map[String, Long]): Array[String] =
    buf.keysIterator.toArray.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}
