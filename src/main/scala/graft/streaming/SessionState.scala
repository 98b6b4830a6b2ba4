package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: gap-based sessionization via
  * `flatMapGroupsWithState` — the arbitrary-state API for semantics the
  * built-in windows can't express (the batch twin is `Ext.sessionize`).
  *
  * State per user = the open session (start, last-seen, count). An
  * incoming batch's events extend the open session or close it and open a
  * new one; CLOSED sessions are emitted downstream (append semantics).
  * Event-time timeout closes idle sessions.
  *
  * Scale: state is O(active users), partitioned by the group key across
  * executors by the state store; each microbatch touches only keys present
  * in the batch plus timed-out ones.
  */
object SessionState {

  /** Carries the raw `ts` alongside the derived micros: the watermark is
    * tracked on the `ts` attribute and must survive into the stateful
    * operator's input (projecting it away breaks event-time timeout).
    */
  case class Event(user_id: Long, ts: java.sql.Timestamp, ts_us: Long)
  case class OpenSession(start_us: Long, last_us: Long, n: Long)
  case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
    n_events: Long)

  val GapUs: Long = 1800L * 1000000L // 30 min

  /** Transition function: fold the batch's (sorted) events into the open
    * session, emitting every session closed along the way.
    */
  def updateSessions(userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    val sorted = events.toSeq.sortBy(_.ts_us)
    var open = state.getOption
    val closed = Seq.newBuilder[ClosedSession]
    if (state.hasTimedOut) {
      open.foreach(s =>
        closed += ClosedSession(userId, s.start_us, s.last_us, s.n))
      open = None
      state.remove()
    }
    sorted.foreach { e =>
      open match {
        case Some(s) if e.ts_us - s.last_us <= GapUs =>
          // min/max guards: a late (out-of-order but within-watermark)
          // event from a later microbatch must never regress the span
          open = Some(OpenSession(math.min(s.start_us, e.ts_us),
            math.max(s.last_us, e.ts_us), s.n + 1))
        case Some(s) =>
          closed += ClosedSession(userId, s.start_us, s.last_us, s.n)
          open = Some(OpenSession(e.ts_us, e.ts_us, 1))
        case None =>
          open = Some(OpenSession(e.ts_us, e.ts_us, 1))
      }
    }
    open.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.last_us / 1000 + GapUs / 1000)
    }
    closed.result().iterator
  }

  /** Wire the stateful operator over a streaming (or batch-test) events
    * DataFrame with event-time semantics.
    */
  def sessionStream(spark: SparkSession,
      events: org.apache.spark.sql.DataFrame): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .withWatermark("ts", "2 hours")
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(updateSessions)
  }

  /** Run against the finite fixture replay; returns closed sessions
    * collected through a memory sink.
    */
  def runToMemory(spark: SparkSession, dir: String,
      tableName: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val q = sessionStream(spark, EventStream.readEvents(spark, dir))
      .writeStream.format("memory").queryName(tableName)
      .outputMode("append").start()
    q.processAllAvailable()
    q
  }
}
