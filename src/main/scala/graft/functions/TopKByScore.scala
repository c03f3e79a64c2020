package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k aggregator: keeps the k highest-scoring
  * `(id, score)` pairs per group (score desc, id asc tie-break).
  *
  * Scale rationale: planned as partial+final aggregation, so each map
  * partition ships AT MOST k rows per group across the shuffle — versus
  * the window-function top-k idiom which shuffles and sorts every row of
  * the group. At 100 TB with hot groups this is the difference between a
  * k-sized buffer and a spill-heavy sort.
  *
  * Input rows are `(group, id, score)`; the group key is handled by
  * `groupByKey` outside, the aggregator only sees the full tuple.
  */
case class TopKByScore(k: Int)
    extends Aggregator[(Int, Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  require(k > 0)

  override def zero: Seq[(Long, Double)] = Vector.empty

  private def insert(b: Seq[(Long, Double)], e: (Long, Double)): Seq[(Long, Double)] = {
    // k is small: sorted-vector insert beats heap constant-factor here and
    // keeps the buffer a plain encodable Seq
    val merged = (b :+ e).sortBy { case (id, s) => (-s, id) }
    if (merged.length > k) merged.take(k) else merged
  }

  override def reduce(b: Seq[(Long, Double)], a: (Int, Long, Double)): Seq[(Long, Double)] =
    insert(b, (a._2, a._3))

  override def merge(b1: Seq[(Long, Double)], b2: Seq[(Long, Double)]): Seq[(Long, Double)] =
    b2.foldLeft(b1)(insert)

  override def finish(b: Seq[(Long, Double)]): Seq[(Long, Double)] = b

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
}
