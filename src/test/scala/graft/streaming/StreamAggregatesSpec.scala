package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec

class StreamAggregatesSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowed stats aggregate per tumbling window and drop late rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = StreamAggregates.windowedStats(
      input.toDF().toDF("ts", "event_type", "value"),
      "ts", "event_type", "value",
      windowDur = "10 minutes", watermarkDelay = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("win_stats")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (ts("2025-01-01 10:01:00"), "click", 1.0),
        (ts("2025-01-01 10:04:00"), "click", 3.0),
        (ts("2025-01-01 10:02:00"), "view", 5.0))
      q.processAllAvailable()
      // advance the watermark past the first window (10:00-10:10):
      // event at 10:21 → watermark 10:16 → first window closes
      input.addData((ts("2025-01-01 10:21:00"), "click", 7.0))
      q.processAllAvailable()
      // a late event for the closed window must be dropped
      input.addData((ts("2025-01-01 10:03:00"), "click", 100.0))
      // and another advance to flush
      input.addData((ts("2025-01-01 10:40:00"), "click", 9.0))
      q.processAllAvailable()

      val out = spark.table("win_stats")
        .orderBy("window_start", "event_type").collect()
      val first = out.filter(_.getAs[String]("event_type") == "click")
        .head
      assert(first.getAs[Timestamp]("window_start") === ts("2025-01-01 10:00:00"))
      assert(first.getAs[Long]("n_events") === 2L)       // late 100.0 dropped
      assert(first.getAs[Double]("sum_value") === 4.0)
      val view = out.filter(_.getAs[String]("event_type") == "view").head
      assert(view.getAs[Long]("n_events") === 1L)
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks within the window only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val imps = MemoryStream[(Timestamp, Long)]
    val clicks = MemoryStream[(Timestamp, Long)]
    val joined = StreamAggregates.intervalJoin(
      imps.toDF().toDF("imp_ts", "ad_id"),
      clicks.toDF().toDF("click_ts", "click_ad_id"),
      "imp_ts", "click_ts", "ad_id", "click_ad_id",
      maxDelay = "10 minutes", watermarkDelay = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()
    try {
      imps.addData(
        (ts("2025-01-01 10:00:00"), 1L),
        (ts("2025-01-01 10:00:00"), 2L))
      clicks.addData(
        (ts("2025-01-01 10:04:00"), 1L),  // within 10 min -> joins
        (ts("2025-01-01 10:30:00"), 2L),  // 30 min later -> outside window
        (ts("2025-01-01 09:59:00"), 1L))  // before impression -> no join
      q.processAllAvailable()
      val out = spark.table("attrib").collect()
      assert(out.length === 1)
      assert(out.head.getAs[Long]("ad_id") === 1L)
      assert(out.head.getAs[Timestamp]("click_ts") === ts("2025-01-01 10:04:00"))
    } finally q.stop()
  }

  test("streaming dedup drops re-delivered ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, Long, String)]
    val dedup = StreamAggregates.dedupById(
      input.toDF().toDF("ts", "event_id", "payload"),
      "ts", "event_id", watermarkDelay = "10 minutes")
    val q = dedup.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (ts("2025-01-01 10:00:00"), 1L, "a"),
        (ts("2025-01-01 10:00:30"), 1L, "a-dup"),
        (ts("2025-01-01 10:01:00"), 2L, "b"))
      q.processAllAvailable()
      input.addData((ts("2025-01-01 10:02:00"), 1L, "a-dup-2"),
        (ts("2025-01-01 10:03:00"), 3L, "c"))
      q.processAllAvailable()
      val out = spark.table("dedup_out").collect()
      assert(out.length === 3)
      assert(out.map(_.getAs[Long]("event_id")).sorted.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }
}
