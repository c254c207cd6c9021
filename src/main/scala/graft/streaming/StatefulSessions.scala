package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming sessionization via
  * `KeyValueGroupedDataset.flatMapGroupsWithState` — the stateful-operator
  * tier the built-in windowed aggregations can't express: a session is
  * open-ended (no fixed window), closes only after a 30-minute event-time
  * silence, and must survive across micro-batches.
  *
  * State per user = the open session; events extend or close it; an
  * event-time timeout (watermark passing session end + gap) flushes the
  * final session. Emitted sessions match [[Events.sessions]]' batch
  * formulation on the same data (asserted in StatefulSessionsSpec).
  *
  * 100 TB design: state is one tiny record per ACTIVE user (bounded by
  * concurrent users, not event volume), partitioned by the group key;
  * the watermark bounds state lifetime so the store cannot grow without
  * limit.
  */
object StatefulSessions {

  val GapMinutes = 30
  private val GapUs = GapMinutes.toLong * 60L * 1000000L

  final case class Evt(user_id: Long, ts: Timestamp, value: Double)

  final case class OpenSession(
      startUs: Long, endUs: Long, n: Long, total: Double)

  final case class SessionOut(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      total_value: Double)

  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L

  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  private def emit(user: Long, s: OpenSession): SessionOut =
    SessionOut(user, toTs(s.startUs), toTs(s.endUs), s.n, s.total)

  /** The state-transition function: fold this batch's events (event-time
    * order) into the open session; a gap closes it; the survivor stays in
    * state with a timeout at (end + gap). */
  def update(
      user: Long,
      events: Iterator[Evt],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val closed = state.getOption.map(emit(user, _))
      state.remove()
      closed.iterator
    } else {
      val sorted = events.toSeq.sortBy(e => micros(e.ts))
      val closed = ListBuffer.empty[SessionOut]
      var cur = state.getOption
      sorted.foreach { e =>
        val us = micros(e.ts)
        cur match {
          case Some(s) if us - s.endUs > GapUs =>
            closed += emit(user, s)
            cur = Some(OpenSession(us, us, 1, e.value))
          case Some(s) =>
            cur = Some(OpenSession(s.startUs, math.max(s.endUs, us),
              s.n + 1, s.total + e.value))
          case None =>
            cur = Some(OpenSession(us, us, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // flush when the watermark passes the gap after the last event
        state.setTimeoutTimestamp((s.endUs + GapUs) / 1000L + 1L)
      }
      closed.iterator
    }
  }

  /** Streaming sessionization. `events` must carry a watermark on `ts`
    * (EventTimeTimeout requires it). */
  def sessionize(events: Dataset[Evt]): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.product[OpenSession]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
