package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

final case class SessEvent(s: Long, t: Long, seq: Long)
final case class SessionOut(s: Long, start_t: Long, end_t: Long,
                            n_events: Long)

/** Session expiry on `transformWithState` event-time timers: each key
  * holds one open session (start, last, count); every batch re-arms a
  * single timer at last-event-time + gap, and when the watermark passes
  * it, `handleExpiredTimer` emits the closed session and clears the
  * state - the state-eviction pattern the reference's in-memory caches
  * never needed but an unbounded stream does. Within-batch gap splits
  * close eagerly in `handleInputRows`.
  *
  * Complements `StreamSum.streamSessionWindows` (declarative
  * session_window): same session semantics, but with explicit state +
  * timers so custom expiry actions (emit-and-clear, TTL audit) have a
  * place to live. Times are epoch-µs like every graft tuple; timers
  * are registered in ms (the API's unit).
  */
class SessionTtlProcessor(gapMicros: Long)
    extends StatefulProcessor[Long, SessEvent, SessionOut] {

  @transient private var sess: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sess = getHandle.getValueState[(Long, Long, Long)]("sess",
      Encoders.kryo[(Long, Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[SessEvent],
      timerValues: TimerValues): Iterator[SessionOut] = {
    val sorted = rows.toSeq.sortBy(e => (e.t, e.seq))
    val closed = Seq.newBuilder[SessionOut]
    var cur = Option(sess.get())
    sorted.foreach { e =>
      cur = cur match {
        case Some((st, lt, n)) if e.t - lt <= gapMicros =>
          Some((st, math.max(lt, e.t), n + 1))
        case Some((st, lt, n)) =>
          closed += SessionOut(key, st, lt + gapMicros, n)
          Some((e.t, e.t, 1L))
        case None => Some((e.t, e.t, 1L))
      }
    }
    cur.foreach { c =>
      sess.update(c)
      // exactly one live timer per key: re-arm at the new session end
      getHandle.listTimers().foreach(ts => getHandle.deleteTimer(ts))
      getHandle.registerTimer((c._2 + gapMicros) / 1000L)
    }
    closed.result().iterator
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] =
    Option(sess.get()) match {
      case Some((st, lt, n)) =>
        sess.clear()
        Iterator.single(SessionOut(key, st, lt + gapMicros, n))
      case None => Iterator.empty
    }
}
