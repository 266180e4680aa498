package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec

object StreamDedupSpec {
  case class Ev(doc_id: Long, ts: Timestamp, payload: String)
}

class StreamDedupSpec extends SparkSpec {
  import StreamDedupSpec.Ev

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("repeats within the watermark horizon are dropped; state evicts after") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val q = StreamDedup.dedupWithinWatermark(
        input.toDF(), Seq("doc_id"), "ts", "10 seconds")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: key 1 twice (in-batch dup), key 2 once
      input.addData(
        Ev(1L, ts("2025-01-01 10:00:00"), "a"),
        Ev(1L, ts("2025-01-01 10:00:01"), "a-redelivered"),
        Ev(2L, ts("2025-01-01 10:00:02"), "b"))
      q.processAllAvailable()
      // batch 2: key 1 again within horizon → still a duplicate
      input.addData(Ev(1L, ts("2025-01-01 10:00:05"), "a-again"))
      q.processAllAvailable()
      assert(spark.table("dedup_out").groupBy("doc_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        === Map(1L -> 1L, 2L -> 1L))
      // advance the watermark far past key 1's horizon, then redeliver:
      // state was evicted, so the late repeat is treated as NEW —
      // the documented contract boundary (cross-horizon dups are batch
      // dedup's job)
      input.addData(Ev(9L, ts("2025-01-01 10:05:00"), "advance"))
      q.processAllAvailable()
      // strictly above the watermark (10:05:00 − 10s): AT the watermark
      // the row would be dropped as late data, not deduplicated
      input.addData(Ev(1L, ts("2025-01-01 10:04:55"), "a-much-later"))
      q.processAllAvailable()
      val byKey = spark.table("dedup_out").groupBy("doc_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byKey(1L) === 2L,
        "evicted key must be accepted again after the horizon")
      assert(byKey(2L) === 1L && byKey(9L) === 1L)
    } finally q.stop()
  }

  test("first-arriving payload wins for a duplicated key") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val q = StreamDedup.dedupWithinWatermark(
        input.toDF(), Seq("doc_id"), "ts", "1 minute")
      .writeStream.format("memory").queryName("dedup_first")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Ev(7L, ts("2025-01-01 09:00:00"), "original"))
      q.processAllAvailable()
      input.addData(Ev(7L, ts("2025-01-01 09:00:30"), "redelivery"))
      q.processAllAvailable()
      val rows = spark.table("dedup_first").as[Ev].collect()
      assert(rows.length === 1 && rows.head.payload === "original")
    } finally q.stop()
  }
}
