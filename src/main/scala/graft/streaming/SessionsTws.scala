package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}
import graft.streaming.EventStreams.{Ev, SessionOut, SessionState}

/** Gap sessionization on Spark 4's arbitrary-state API
  * (`transformWithState` + `StatefulProcessor`) — the successor to
  * flatMapGroupsWithState, with state and timers as separate explicit
  * primitives instead of GroupState's conflated timeout.
  *
  * Same contract as [[EventStreams.statefulSessions]]: a session
  * breaks after > gapUs of event-time silence, and an open session
  * emits once the watermark passes its last event + gap —
  * SessionsTwsSpec pins output parity between the two
  * implementations batch-by-batch on one MemoryStream feed.
  *
  * State shape per key: ONE ValueState[SessionState] plus one armed
  * event-time timer (stale timers deleted on every input batch), so
  * store size is O(live users) regardless of event volume — the same
  * bound the FMGWS path has, here enforced against the RocksDB store
  * the new API targets (no analogue in the reference, which is batch
  * only — /root/reference/src/pipeline_calculator_v3.py:849-899).
  */
object SessionsTws {

  class SessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, Ev, SessionOut] {

    @transient private var session: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[SessionState](
        "session", Encoders.product[SessionState], TTLConfig.NONE)

    private def close(u: Long, s: SessionState): SessionOut =
      SessionOut(u, s.startUs, s.lastUs, s.n, s.sumC)

    override def handleInputRows(user: Long, rows: Iterator[Ev],
        tv: TimerValues): Iterator[SessionOut] = {
      // Spark gives no intra-group order — restore event time order
      // (value_c tiebreak matches the FMGWS path bit-for-bit)
      val sorted = rows.toSeq.sortBy(e => (e.us, e.value_c))
      // Contract allows an empty batch iterator for a key; without this
      // guard `cur` stays null and update/registerTimer below NPE (the
      // FMGWS path guards the same case with !it.hasNext).
      if (sorted.isEmpty) return Iterator.empty
      var cur = if (session.exists()) session.get() else null
      val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
      sorted.foreach { e =>
        if (cur == null) cur = SessionState(e.us, e.us, 1, e.value_c)
        else if (e.us - cur.lastUs > gapUs) {
          out += close(user, cur)
          cur = SessionState(e.us, e.us, 1, e.value_c)
        } else cur = cur.copy(
          lastUs = math.max(cur.lastUs, e.us), n = cur.n + 1,
          sumC = cur.sumC + e.value_c)
      }
      session.update(cur)
      // one live timer per key: re-arm at last event + gap (ms domain)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(cur.lastUs / 1000 + gapUs / 1000 + 1)
      out.iterator
    }

    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessionOut] =
      if (session.exists()) {
        val out = close(user, session.get())
        session.clear()
        Iterator.single(out)
      } else Iterator.empty
  }

  /** Streaming sessionizer; input must carry a watermark on `ts`.
    * Requires the RocksDB state store provider (the API's native
    * store) — set `spark.sql.streaming.stateStore.providerClass`
    * before starting the query. */
  def sessions(events: Dataset[Ev],
      gapUs: Long = 1800000000L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapUs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
