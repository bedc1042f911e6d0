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
  * Contract: events must arrive time-ordered PER USER across triggers
  * (within a trigger they are sorted here). Out-of-order arrival across
  * a session boundary would need watermark-delayed session closing —
  * the [[PriceStream]] watermark pattern — at the cost of emitting
  * sessions only after the watermark passes; the eager form matches the
  * batch operator exactly under the in-order contract (spec-pinned). */
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
}
