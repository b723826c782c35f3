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

  private def order(s: Scored): (Double, Long) = (-s.score, s.id)

  override def zero: List[Scored] = Nil

  override def reduce(buf: List[Scored], a: Scored): List[Scored] =
    ((a :: buf).sortBy(order)).take(k)

  override def merge(b1: List[Scored], b2: List[Scored]): List[Scored] =
    (b1 ++ b2).sortBy(order).take(k)

  override def finish(reduction: List[Scored]): List[Scored] = reduction

  override def bufferEncoder: Encoder[List[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
  override def outputEncoder: Encoder[List[Scored]] =
    bufferEncoder
}
