package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec

object StreamJoinSpec {
  case class View(user_id: Long, ts: Timestamp, page: String)
  case class Click(user_id: Long, ts: Timestamp, target: String)
}

class StreamJoinSpec extends SparkSpec {
  import StreamJoinSpec._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("interval join: in-horizon pairs emitted, out-of-horizon dropped") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[View]
    val clicks = MemoryStream[Click]
    val q = StreamJoin.intervalJoin(views.toDF(), clicks.toDF(),
        "user_id", "ts", "30 seconds", "10 seconds")
      .writeStream.format("memory").queryName("sj_inner")
      .outputMode(OutputMode.Append()).start()
    try {
      views.addData(
        View(1L, ts("2025-01-01 10:00:00"), "home"),
        View(2L, ts("2025-01-01 10:00:00"), "home"))
      clicks.addData(
        Click(1L, ts("2025-01-01 10:00:20"), "buy"),   // in horizon
        Click(1L, ts("2025-01-01 10:01:00"), "late"),  // past horizon
        Click(2L, ts("2025-01-01 09:59:59"), "before"), // precedes view
        Click(3L, ts("2025-01-01 10:00:05"), "nokey")) // no view
      q.processAllAvailable()
      val got = spark.table("sj_inner")
        .select("l_user_id", "l_page", "r_target").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got === Set((1L, "home", "buy")))
    } finally q.stop()
  }

  test("join state is evicted once the watermark clears the horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[View]
    val clicks = MemoryStream[Click]
    val q = StreamJoin.intervalJoin(views.toDF(), clicks.toDF(),
        "user_id", "ts", "30 seconds", "10 seconds")
      .writeStream.format("memory").queryName("sj_state")
      .outputMode(OutputMode.Append()).start()
    try {
      views.addData((1 to 20).map(i =>
        View(i.toLong, ts("2025-01-01 10:00:00"), "home")): _*)
      clicks.addData(Click(1L, ts("2025-01-01 10:00:01"), "c"))
      q.processAllAvailable()
      val before = q.lastProgress.stateOperators.asInstanceOf[Array[_]]
        .map(_.asInstanceOf[org.apache.spark.sql.streaming.StateOperatorProgress]
          .numRowsTotal).sum
      assert(before >= 20L, s"expected buffered view state, saw $before")
      // advance BOTH watermarks far past every view's horizon — the
      // buffered views can never match an in-time click again, so the
      // store must drop them
      views.addData(View(99L, ts("2025-01-01 11:00:00"), "adv"))
      clicks.addData(Click(98L, ts("2025-01-01 11:00:00"), "adv"))
      q.processAllAvailable()
      // one more microbatch so eviction metrics land
      views.addData(View(97L, ts("2025-01-01 11:00:01"), "adv2"))
      q.processAllAvailable()
      val after = q.lastProgress.stateOperators.asInstanceOf[Array[_]]
        .map(_.asInstanceOf[org.apache.spark.sql.streaming.StateOperatorProgress]
          .numRowsTotal).sum
      assert(after < before,
        s"watermark must bound join state: before=$before after=$after")
    } finally q.stop()
  }

  test("leftOuter emits unmatched causes null-padded after the horizon closes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[View]
    val clicks = MemoryStream[Click]
    val q = StreamJoin.intervalJoin(views.toDF(), clicks.toDF(),
        "user_id", "ts", "30 seconds", "10 seconds", "leftOuter")
      .writeStream.format("memory").queryName("sj_outer")
      .outputMode(OutputMode.Append()).start()
    try {
      views.addData(
        View(1L, ts("2025-01-01 10:00:00"), "converts"),
        View(2L, ts("2025-01-01 10:00:00"), "bounces"))
      clicks.addData(Click(1L, ts("2025-01-01 10:00:10"), "buy"))
      q.processAllAvailable()
      // the unmatched view must NOT be emitted while a click could
      // still arrive
      assert(spark.table("sj_outer")
        .filter($"l_user_id" === 2L).isEmpty)
      // push both watermarks past view2.ts + horizon → null-padded row
      views.addData(View(99L, ts("2025-01-01 11:00:00"), "adv"))
      clicks.addData(Click(98L, ts("2025-01-01 11:00:00"), "adv"))
      q.processAllAvailable()
      views.addData(View(97L, ts("2025-01-01 11:00:01"), "adv2"))
      q.processAllAvailable()
      val bounced = spark.table("sj_outer")
        .filter($"l_user_id" === 2L)
        .select("l_page", "r_target").collect()
      assert(bounced.length === 1)
      assert(bounced.head.getString(0) === "bounces" &&
        bounced.head.isNullAt(1),
        "unmatched cause must surface exactly once, null-padded")
    } finally q.stop()
  }

  test("bounded in-time replay equals the batch join (pair-for-pair)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // deterministic little corpus: 8 users, several views/clicks each,
    // every event in-time (watermark never drops anything)
    val vs = for (u <- 1 to 8; i <- 0 to 2) yield
      View(u.toLong, ts(f"2025-01-01 10:0$i:${(u * 7) % 60}%02d"), s"p$i")
    val cs = for (u <- 1 to 8; i <- 0 to 3) yield
      Click(u.toLong, ts(f"2025-01-01 10:0${i % 3}:${(u * 13 + i * 11) % 60}%02d"), s"t$i")
    val views = MemoryStream[View]
    val clicks = MemoryStream[Click]
    val q = StreamJoin.intervalJoin(views.toDF(), clicks.toDF(),
        "user_id", "ts", "45 seconds", "10 minutes")
      .writeStream.format("memory").queryName("sj_batch_eq")
      .outputMode(OutputMode.Append()).start()
    try {
      views.addData(vs: _*)
      clicks.addData(cs: _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getTimestamp(1).getTime, r.getString(2),
          r.getTimestamp(3).getTime, r.getString(4))
      val streamed = spark.table("sj_batch_eq")
        .select("l_user_id", "l_ts", "l_page", "r_ts", "r_target")
        .collect().map(key).sorted.toSeq
      val batch = StreamJoin.intervalJoin(
          vs.toDF(), cs.toDF(), "user_id", "ts", "45 seconds", "10 minutes")
        .select("l_user_id", "l_ts", "l_page", "r_ts", "r_target")
        .collect().map(key).sorted.toSeq
      assert(streamed === batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("stream-static enrich: broadcast dim, null-padded unknowns, no join state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events = MemoryStream[View]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment")
    val q = StreamJoin.enrich(events.toDF(), dim, Seq("user_id"))
      .writeStream.format("memory").queryName("sj_enrich")
      .outputMode(OutputMode.Append()).start()
    try {
      events.addData(
        View(1L, ts("2025-01-01 10:00:00"), "home"),
        View(2L, ts("2025-01-01 10:00:01"), "search"),
        View(9L, ts("2025-01-01 10:00:02"), "home")) // unknown user
      q.processAllAvailable()
      val got = spark.table("sj_enrich")
        .select("user_id", "page", "segment").collect()
        .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
        .toSet
      assert(got === Set(
        (1L, "home", Some("gold")),
        (2L, "search", Some("silver")),
        (9L, "home", None)))
      // a second batch enriches too, and the query holds NO join
      // state (the static side is not buffered — that's the point)
      events.addData(View(2L, ts("2025-01-01 10:05:00"), "cart"))
      q.processAllAvailable()
      assert(spark.table("sj_enrich").count() === 4)
      val progress = q.lastProgress
      assert(progress.stateOperators.isEmpty ||
        progress.stateOperators.forall(_.numRowsTotal == 0L),
        "stream-static enrich must not accrue join state")
    } finally q.stop()
  }
}
