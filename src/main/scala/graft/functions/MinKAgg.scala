package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded KMV buffer: the k smallest DISTINCT hash values seen.
  * Duplicates need no distinct-tracking beyond the buffer itself - a
  * repeat of a value outside the current k minima is discarded anyway,
  * and a repeat inside them is already present - so exact KMV
  * maintenance under duplicates costs O(k) state, which is what makes
  * the streaming face's state bounded regardless of stream length.
  * The buffer is kept sorted; reduce is a dedup-insert + trim.
  */
final case class MinKAgg(k: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {

  override def zero: Seq[Long] = Seq.empty

  override def reduce(buf: Seq[Long], h: Long): Seq[Long] =
    // fast path: the buffer is sorted, so a full buffer rejects
    // anything >= its maximum without a dedup scan or re-sort - the
    // overwhelmingly common case once the stream warms up
    if (buf.length >= k && h >= buf.last) buf
    else if (buf.contains(h)) buf
    else ((buf :+ h).sorted: Seq[Long]).take(k)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(r: Seq[Long]): Seq[Long] = r

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
