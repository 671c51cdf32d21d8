package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-K aggregator over (term, cnt) vocabulary rows,
  * keeping the K most frequent by (cnt desc, term asc) - the Zipf
  * report's rank order. Same bounded-buffer scheme as TopKSampleAgg:
  * partial buffers trim at 2K, so map-side combine ships at most 2K
  * rows per partition and the vocab relation is ranked in the SAME
  * pass that computes its totals - one corpus scan, one vocab agg,
  * never a second traversal.
  */
final case class TopFreqAgg(k: Int)
    extends Aggregator[(String, Long), Seq[(String, Long)],
                       Seq[(String, Long)]] {

  private def trim(s: Seq[(String, Long)]): Seq[(String, Long)] =
    s.sortBy(r => (-r._2, r._1)).take(k)

  override def zero: Seq[(String, Long)] = Seq.empty

  override def reduce(buf: Seq[(String, Long)],
                      row: (String, Long)): Seq[(String, Long)] = {
    val b = buf :+ row
    if (b.length >= 2 * k) trim(b) else b
  }

  override def merge(a: Seq[(String, Long)],
                     b: Seq[(String, Long)]): Seq[(String, Long)] =
    trim(a ++ b)

  override def finish(r: Seq[(String, Long)]): Seq[(String, Long)] =
    trim(r)

  override def bufferEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder()
}
