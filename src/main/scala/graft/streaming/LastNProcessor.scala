package graft.streaming

import graft.streaming.StreamSum.{LastNSnap, XfRow}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, ValueState}

/** Last-N ring buffer on the Spark 4 `transformWithState` API
  * (StatefulProcessor + typed ValueState, RocksDB-backed) - the modern
  * successor to flatMapGroupsWithState, with the same semantics as
  * `StreamSum.lastnHandler` / the reference's LastNCache. Kept as a
  * second implementation so the engine tracks the current stateful
  * API; parity with the batch state is asserted in StreamingSpec.
  * Emits each snapshot with the key's monotone op count so Update-mode
  * consumers can select the latest one under multi-batch delivery.
  */
class LastNProcessor(n: Int)
    extends StatefulProcessor[(String, Long), XfRow, LastNSnap] {

  @transient private var buf: ValueState[(Long, Seq[(Long, Long, Long)])] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    buf = getHandle.getValueState[(Long, Seq[(Long, Long, Long)])](
      "buf", Encoders.kryo[(Long, Seq[(Long, Long, Long)])],
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(
      key: (String, Long), rows: Iterator[XfRow],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[LastNSnap] = {
    val (ops0, buf0) =
      Option(buf.get()).getOrElse((0L, Seq.empty[(Long, Long, Long)]))
    var ops = ops0
    val updated = rows.foldLeft(buf0) { (b, r) =>
      ops += 1L
      StreamSum.ringPut(b, (r.t, r.seq, r.v), n)
    }
    buf.update((ops, updated))
    updated.iterator.zipWithIndex.map { case ((t, _, v), i) =>
      LastNSnap(key._1, key._2, v, t, i + 1L, ops)
    }
  }
}
