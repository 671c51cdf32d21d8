package graft.functions

import graft.streaming.StreamSum
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed last-N ring-buffer aggregator ≙ LastNCache
  * (/root/reference/src-clj/streamsum/caches.clj:55) for typed
  * `Dataset.groupByKey(...).agg(...)` use. Input/buffer rows are
  * (t, seq, v); the buffer is kept bounded at N during partial
  * aggregation, so map-side combine ships at most N rows per key -
  * the property that makes last-N shuffle-cheap at 100 TB.
  */
final case class LastNAgg(n: Int)
    extends Aggregator[(Long, Long, Long), Seq[(Long, Long, Long)],
                       Seq[(Long, Long, Long)]] {

  override def zero: Seq[(Long, Long, Long)] = Seq.empty

  override def reduce(buf: Seq[(Long, Long, Long)],
                      row: (Long, Long, Long)): Seq[(Long, Long, Long)] =
    StreamSum.ringPut(buf, row, n)

  override def merge(a: Seq[(Long, Long, Long)],
                     b: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] =
    (a ++ b).sortBy(r => (-r._1, -r._2)).take(n)

  override def finish(r: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Long, Long, Long)]] =
    ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Long, Long, Long)]] =
    ExpressionEncoder()
}
