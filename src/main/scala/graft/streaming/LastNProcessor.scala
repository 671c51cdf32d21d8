package graft.streaming

import graft.streaming.StreamSum.{LastNOut, XfRow}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, ValueState}

/** Last-N ring buffer on the Spark 4 `transformWithState` API
  * (StatefulProcessor + typed ValueState, RocksDB-backed) - the modern
  * successor to flatMapGroupsWithState, with the same semantics as
  * `StreamSum.lastnHandler` / the reference's LastNCache. Kept as a
  * second implementation so the engine tracks the current stateful
  * API; parity with the batch state is asserted in StreamingSpec.
  */
class LastNProcessor(n: Int)
    extends StatefulProcessor[(String, Long), XfRow, LastNOut] {

  @transient private var buf: ValueState[Seq[(Long, Long, Long)]] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    buf = getHandle.getValueState[Seq[(Long, Long, Long)]](
      "buf", Encoders.kryo[Seq[(Long, Long, Long)]],
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(
      key: (String, Long), rows: Iterator[XfRow],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[LastNOut] = {
    val updated = rows.foldLeft(
      Option(buf.get()).getOrElse(Seq.empty[(Long, Long, Long)])) {
      (b, r) => StreamSum.ringPut(b, (r.t, r.seq, r.v), n)
    }
    buf.update(updated)
    updated.iterator.zipWithIndex.map { case ((t, _, v), i) =>
      LastNOut(key._1, key._2, v, t, i + 1L)
    }
  }
}
