package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-K aggregator for the weighted-sample family:
  * rows are (doc_id, weight, skey) and the buffer keeps the K best by
  * (skey desc, doc_id asc) - the same ordering the batch
  * `pipe_sample_weighted` ranks by, so a streaming shard's state is
  * exactly a partial of the batch top-K. The buffer is trimmed during
  * partial aggregation (amortized: append, re-trim at 2K), so
  * map-side combine ships at most 2K rows per shard and the streaming
  * state is bounded at shards x K regardless of stream length.
  */
final case class TopKSampleAgg(k: Int)
    extends Aggregator[(Long, Long, Double), Seq[(Long, Long, Double)],
                       Seq[(Long, Long, Double)]] {

  private def trim(
      s: Seq[(Long, Long, Double)]): Seq[(Long, Long, Double)] =
    s.sortBy(r => (-r._3, r._1)).take(k)

  override def zero: Seq[(Long, Long, Double)] = Seq.empty

  override def reduce(buf: Seq[(Long, Long, Double)],
                      row: (Long, Long, Double)): Seq[(Long, Long, Double)] = {
    val b = buf :+ row
    if (b.length >= 2 * k) trim(b) else b
  }

  override def merge(a: Seq[(Long, Long, Double)],
                     b: Seq[(Long, Long, Double)]): Seq[(Long, Long, Double)] =
    trim(a ++ b)

  override def finish(r: Seq[(Long, Long, Double)]): Seq[(Long, Long, Double)] =
    trim(r)

  override def bufferEncoder: Encoder[Seq[(Long, Long, Double)]] =
    ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Long, Long, Double)]] =
    ExpressionEncoder()
}
