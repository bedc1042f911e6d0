package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch gap sessionizer (w2_sessionize) — the 6th
  * streaming≡batch pair, and the canonical stateful-streaming operator:
  * per-user state is (sessions so far, last event time, open-session
  * count/start) — four longs per user regardless of history length.
  *
  * Each trigger emits the refreshed row for every session touched in the
  * batch; the latest row per (user, session) is the final answer, so a
  * consumer reduces with keepLast exactly as with the other twins.
  *
  * Contract: [[sessions]] (the eager form) requires events to arrive
  * time-ordered PER USER across triggers (within a trigger they are
  * sorted here) and matches the batch operator exactly under that
  * contract (spec-pinned). The in-order contract is OPT-IN: for
  * late/out-of-order streams use [[sessionsEventTime]], which buffers
  * under a watermark and emits FINAL rows once no earlier event can
  * arrive — exact for lateness strictly below the delay, at the
  * standard event-time cost of emitting sessions only after the
  * watermark passes. */
object StreamingSessionize {

  case class Ev(user_id: Long, event_id: Long, ts_us: Long)
  case class SessionRow(user_id: Long, session_id: Long, n_events: Long,
                        start_us: Long, end_us: Long)
  /** (closed sessions, last ts, open-session count, open-session start) */
  private type St = (Long, Long, Long, Long)

  def sessions(ds: Dataset[Ev], gapUs: Long = 1800L * 1000000L): Dataset[SessionRow] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[St, SessionRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Ev], state: GroupState[St]) =>
          var (closed, lastTs, openN, openStart) =
            state.getOption.getOrElse((0L, Long.MinValue, 0L, 0L))
          val touched = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
          it.toArray.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            if (openN == 0L) { openN = 1L; openStart = e.ts_us }
            else if (e.ts_us - lastTs > gapUs) {
              touched += SessionRow(uid, closed + 1L, openN, openStart, lastTs)
              closed += 1L; openN = 1L; openStart = e.ts_us
            } else openN += 1L
            lastTs = e.ts_us
          }
          state.update((closed, lastTs, openN, openStart))
          if (openN > 0L)
            touched += SessionRow(uid, closed + 1L, openN, openStart, lastTs)
          touched.iterator
      }
  }

  /** `Ev` with the event-time column the watermark rides on. */
  case class EvW(user_id: Long, event_id: Long, ts_us: Long,
                 ts: java.sql.Timestamp)

  /** (closed, lastTs, openN, openStart, popped-frontier µs, pending) —
    * pending = events newer than the watermark, buffered until it
    * passes them; bounded by each user's event volume within one
    * watermark delay, by construction. */
  private type StW = (Long, Long, Long, Long, Long, List[(Long, Long)])

  /** EVENT-TIME variant of [[sessions]]: tolerates late/out-of-order
    * arrival up to `delay` — the watermark contract replaces the eager
    * twin's in-order contract (which is now opt-in, not load-bearing).
    *
    * Mechanism: arrivals buffer in state; each trigger pops the prefix
    * with `ts < watermark` in (ts, event_id) order and runs the exact
    * in-order kernel over it — nothing is emitted for an event until
    * the watermark guarantees no earlier event can still arrive, so the
    * emitted rows are FINAL per pop (an event-time timeout re-wakes the
    * group when the watermark passes its oldest pending event, so quiet
    * users still flush without new data). Consequences, spec-pinned:
    *  - lateness STRICTLY below the delay: latest row per (user,
    *    session) == batch sessionization of the same events, exactly;
    *  - lateness ≥ delay: the event is dropped — Spark's watermark
    *    filter removes arrivals with ts ≤ watermark (pinned AT the
    *    boundary: a ts == watermark event one trigger late never
    *    reaches the operator); a `frontier` guard in state keeps the
    *    kernel exact even if one slips through — the documented
    *    divergence;
    *  - a session is emitted only once the watermark passes its events:
    *    at stream end, events inside the final watermark window are
    *    still pending (send a heartbeat/flush to close out — standard
    *    event-time semantics, same as windowed aggregation). */
  def sessionsEventTime(ds: Dataset[Ev], gapUs: Long = 1800L * 1000000L,
                        delay: String = "30 minutes"): Dataset[SessionRow] = {
    val sp = ds.sparkSession
    import sp.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    ds.withColumn("ts", timestamp_micros(col("ts_us"))).as[EvW]
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[StW, SessionRow](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[EvW], state: GroupState[StW]) =>
          var (closed, lastTs, openN, openStart, frontier, pending) =
            state.getOption.getOrElse(
              (0L, Long.MinValue, 0L, 0L, Long.MinValue, List.empty[(Long, Long)]))
          val wUs = state.getCurrentWatermarkMs() * 1000L
          // pop STRICTLY below the watermark. Spark's late filter drops
          // arrivals with ts <= watermark (spec-pinned: an event AT the
          // watermark one trigger late never reaches the operator), so
          // the exactness contract is lateness STRICTLY below the delay.
          // The strict pop is the conservative kernel under either
          // filter convention: it never consumes an instant a late twin
          // could in principle still be delivered at, at the cost of one
          // trigger of latency for boundary instants. Arrivals at the
          // frontier are correspondingly admitted (>=).
          val incoming = it.map(e => (e.ts_us, e.event_id)).filter(_._1 >= frontier)
          val (ready, still) = (pending ++ incoming).sorted.partition(_._1 < wUs)
          val touched = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
          ready.foreach { case (tsUs, _) =>
            if (openN == 0L) { openN = 1L; openStart = tsUs }
            else if (tsUs - lastTs > gapUs) {
              touched += SessionRow(uid, closed + 1L, openN, openStart, lastTs)
              closed += 1L; openN = 1L; openStart = tsUs
            } else openN += 1L
            lastTs = tsUs
          }
          if (ready.nonEmpty && openN > 0L)
            touched += SessionRow(uid, closed + 1L, openN, openStart, lastTs)
          state.update((closed, lastTs, openN, openStart,
            math.max(frontier, wUs), still))
          // re-wake when the watermark passes the oldest pending event
          // (+1 ms: the timeout timestamp must exceed the current
          // watermark, and the µs→ms floor could otherwise tie it)
          if (still.nonEmpty)
            state.setTimeoutTimestamp(still.head._1 / 1000L + 1L)
          touched.iterator
      }
  }
}
