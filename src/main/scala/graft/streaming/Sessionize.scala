package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — custom per-key state via
  * flatMapGroupsWithState (the KeyValueGroupedDataset state API the
  * built-in windowed aggregates can't express).
  *
  * A session = consecutive events of one user with gaps below
  * `gapSeconds`; a session closes when the event-time watermark passes
  * its last event + gap (EventTimeTimeout — state cannot outlive the
  * watermark horizon, so memory is bounded per active user).
  *
  * Scale notes: state is hash-partitioned by user_id across executors;
  * per-key state is O(1) (running aggregates, not buffered events).
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, lastTs: Long, nEvents: Long,
      sumValue: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_value: Double,
      duration_seconds: Double)

  /** Streaming sessionize: emits one row per CLOSED session. */
  def sessions(events: Dataset[Event], gapSeconds: Long)(
      implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event],
         state: GroupState[SessionState]) =>
          val gapMs = gapSeconds * 1000L
          if (state.hasTimedOut) {
            // watermark passed last event + gap → close the session
            val s = state.get
            state.remove()
            Iterator(finish(userId, s))
          } else {
            val events = batch.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            events.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= gapMs =>
                  cur = Some(s.copy(lastTs = math.max(s.lastTs, t),
                    nEvents = s.nEvents + 1, sumValue = s.sumValue + e.value))
                case Some(s) => // gap exceeded inside the batch
                  closed ::= finish(userId, s)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  private def finish(userId: Long, s: SessionState): Session =
    Session(userId, new Timestamp(s.start), new Timestamp(s.lastTs),
      s.nEvents, s.sumValue, (s.lastTs - s.start) / 1000.0)

  /** Batch sessionization of the same semantics (window lag + running
    * session id) — for backfill over historical data; one shuffle on
    * user_id.
    */
  def sessionsBatch(events: Dataset[Event], gapSeconds: Long)(
      implicit spark: SparkSession): Dataset[Session] = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val w = Window.partitionBy("user_id").orderBy("ts")
    events.toDF()
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        (col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSeconds)
          .cast("long"))
      .withColumn("session_idx",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"),
        ((unix_timestamp(col("session_end")) - unix_timestamp(col("session_start")))
          .cast("double")).as("duration_seconds"))
      .as[Session]
  }
}
