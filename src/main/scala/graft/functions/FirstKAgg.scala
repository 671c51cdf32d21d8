package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded earliest-K buffer over (tus, event_id, tag) rows,
  * keeping the K earliest by (tus asc, event_id asc). The streaming
  * path face's state: a user's journey PREFIX is exactly the k
  * earliest events seen so far, no matter how the stream interleaves —
  * so the state is O(k) per key and the merge is associative, which is
  * what lets the prefix survive out-of-order and multi-batch arrival
  * (same bounded-buffer scheme as MinKAgg / TopFreqAgg).
  */
final case class FirstKAgg(k: Int)
    extends Aggregator[(Long, Long, String), Seq[(Long, Long, String)],
                       Seq[(Long, Long, String)]] {

  private def key(r: (Long, Long, String)): (Long, Long) = (r._1, r._2)

  private def trim(s: Seq[(Long, Long, String)]): Seq[(Long, Long, String)] =
    s.sortBy(key).take(k)

  override def zero: Seq[(Long, Long, String)] = Seq.empty

  override def reduce(buf: Seq[(Long, Long, String)],
                      row: (Long, Long, String)): Seq[(Long, Long, String)] =
    // fast path: a full sorted buffer rejects anything at or past its
    // maximum without re-sorting - the common case once warmed up
    if (buf.length >= k &&
        Ordering[(Long, Long)].compare(key(row), key(buf.last)) >= 0) buf
    else trim(buf :+ row)

  override def merge(a: Seq[(Long, Long, String)],
                     b: Seq[(Long, Long, String)]): Seq[(Long, Long, String)] =
    trim(a ++ b)

  override def finish(r: Seq[(Long, Long, String)]): Seq[(Long, Long, String)] =
    trim(r)

  override def bufferEncoder: Encoder[Seq[(Long, Long, String)]] =
    ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Long, Long, String)]] =
    ExpressionEncoder()
}
