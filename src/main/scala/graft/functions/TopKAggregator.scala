package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A scored item entering the top-k aggregation. */
final case class Scored(id: Long, score: Double)

/** Custom typed aggregate (the `Aggregator[IN, BUF, OUT]` surface —
  * SURVEY.md §2.2 "UDF/UDAF"): bounded top-k by (score DESC, id ASC).
  *
  * The buffer is a size-capped sorted list, so aggregation state is
  * O(k) per group no matter how many rows flow through — the bounded
  * alternative to rank-window top-k when the consumer wants the result
  * as ONE row per group (windows keep k rows). Spark runs it with the
  * usual partial/merge split: `reduce` on each partition, `merge`
  * across partitions, both capped at k. */
class TopKAggregator(k: Int)
    extends Aggregator[Scored, List[Scored], List[Scored]] {
  require(k >= 1, s"top-k needs k >= 1, got $k")

  private def order(s: Scored): (Double, Long) = (-s.score, s.id)
  private val ord = Ordering.Tuple2[Double, Long]

  override def zero: List[Scored] = Nil

  /** Bounded insertion into the (always-sorted) k-list: the common case —
    * a row that doesn't beat the current k-th — is one comparison against
    * the tail, O(1); an improving row is a single O(k) splice. No per-row
    * re-sort: `reduce` is the aggregator's hot loop (once per input row),
    * so O(k log k) work there multiplies by the corpus size. */
  override def reduce(buf: List[Scored], a: Scored): List[Scored] =
    if (buf.lengthCompare(k) >= 0 && ord.lteq(order(buf.last), order(a))) buf
    else {
      val (better, rest) = buf.span(s => ord.lt(order(s), order(a)))
      (better ::: a :: rest).take(k)
    }

  /** Linear merge of two sorted k-lists (runs once per partition pair,
    * not per row). */
  override def merge(b1: List[Scored], b2: List[Scored]): List[Scored] = {
    @annotation.tailrec
    def go(x: List[Scored], y: List[Scored], n: Int, acc: List[Scored]): List[Scored] =
      if (n == 0) acc.reverse
      else (x, y) match {
        case (Nil, Nil)         => acc.reverse
        case (hx :: tx, Nil)    => go(tx, Nil, n - 1, hx :: acc)
        case (Nil, hy :: ty)    => go(Nil, ty, n - 1, hy :: acc)
        case (hx :: tx, hy :: ty) =>
          if (ord.lteq(order(hx), order(hy))) go(tx, y, n - 1, hx :: acc)
          else go(x, ty, n - 1, hy :: acc)
      }
    go(b1, b2, k, Nil)
  }

  override def finish(reduction: List[Scored]): List[Scored] = reduction

  override def bufferEncoder: Encoder[List[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
  override def outputEncoder: Encoder[List[Scored]] =
    bufferEncoder
}
