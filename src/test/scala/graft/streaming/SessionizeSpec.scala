package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import Sessionize.Event

class SessionizeSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("batch sessionization splits on gaps and aggregates per session") {
    implicit val s = spark
    import spark.implicits._
    val events = Seq(
      Event(1L, ts("2025-01-01 10:00:00"), 1.0),
      Event(1L, ts("2025-01-01 10:04:00"), 2.0),   // same session (4 min gap)
      Event(1L, ts("2025-01-01 11:00:00"), 4.0),   // new session (56 min gap)
      Event(2L, ts("2025-01-01 10:30:00"), 8.0)
    ).toDS()
    val out = Sessionize.sessionsBatch(events, gapSeconds = 600)
      .orderBy("user_id", "session_start").collect()
    assert(out.length === 3)
    assert(out(0).n_events === 2 && out(0).sum_value === 3.0)
    assert(out(0).duration_seconds === 240.0)
    assert(out(1).n_events === 1 && out(1).sum_value === 4.0)
    assert(out(2).user_id === 2L)
  }

  test("streaming sessionization closes sessions via event-time timeout") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = Sessionize.sessions(input.toDS(), gapSeconds = 600)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1L, ts("2025-01-01 10:00:00"), 1.0),
        Event(1L, ts("2025-01-01 10:04:00"), 2.0))
      q.processAllAvailable()
      // nothing closed yet — watermark hasn't passed start+gap
      assert(spark.table("sessions_out").count() === 0)
      // an event far in the future advances the watermark; user 1's
      // session times out and closes
      input.addData(Event(2L, ts("2025-01-01 12:00:00"), 5.0))
      q.processAllAvailable()
      input.addData(Event(2L, ts("2025-01-01 14:00:00"), 6.0))
      q.processAllAvailable()
      val closed = spark.table("sessions_out")
        .orderBy("user_id", "session_start").collect()
      assert(closed.exists(r => r.getAs[Long]("user_id") == 1L &&
        r.getAs[Long]("n_events") == 2L &&
        r.getAs[Double]("sum_value") == 3.0))
    } finally q.stop()
  }
}
