package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import StreamFrequentItems.{FrequentItem, Item}

class StreamFrequentItemsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("window closes via watermark; MG bounds contain the true counts") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Item]
    val q = StreamFrequentItems.frequentItems(input.toDS(),
        windowSeconds = 60, watermarkDelay = "10 seconds", k = 3, shards = 2)
      .writeStream.format("memory").queryName("freq_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // window [10:00:00, 10:01:00): "hot" ×6, "warm" ×3, noise ×1 each
      val base = "2025-01-01 10:00:"
      val w1 = Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++
        Seq("n1", "n2", "n3", "n4")
      input.addData(w1.zipWithIndex.map { case (it, i) =>
        Item(ts(f"$base${i % 50}%02d"), it)
      }: _*)
      q.processAllAvailable()
      assert(spark.table("freq_out").count() === 0) // window still open
      // advance the watermark past the window end
      input.addData(Item(ts("2025-01-01 10:02:30"), "later"))
      q.processAllAvailable()
      val rows = spark.table("freq_out").as[FrequentItem].collect()
      assert(rows.nonEmpty)
      val trueCounts = w1.groupBy(identity).view.mapValues(_.size.toLong).toMap
      rows.foreach { r =>
        val f = trueCounts(r.item)
        assert(r.count_min <= f && f <= r.count_max,
          s"${r.item}: true $f outside [${r.count_min}, ${r.count_max}]")
      }
      // MG survival: any item with f > shard_total/(k+1) must be present.
      // "hot"'s shard saw at most all 13 items → slack ≤ 13/4 = 3 < 6
      assert(rows.exists(_.item == "hot"))
      // shard totals account for every window-1 event exactly once
      assert(rows.groupBy(_.shard).values
        .map(_.head.shard_total).sum === w1.size.toLong)
    } finally q.stop()
  }

  test("items route to one shard; state emits per window independently") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Item]
    val q = StreamFrequentItems.frequentItems(input.toDS(),
        windowSeconds = 60, watermarkDelay = "5 seconds", k = 5, shards = 4)
      .writeStream.format("memory").queryName("freq_out2")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Item(ts("2025-01-01 09:00:01"), "a"), // window 1
        Item(ts("2025-01-01 09:00:02"), "a"),
        Item(ts("2025-01-01 09:01:10"), "a"), // window 2
        Item(ts("2025-01-01 09:01:11"), "b"))
      q.processAllAvailable()
      input.addData(Item(ts("2025-01-01 09:05:00"), "later"))
      q.processAllAvailable()
      val rows = spark.table("freq_out2").as[FrequentItem].collect()
      // "a" appears once per window (never split across shards)
      val aRows = rows.filter(_.item == "a")
      assert(aRows.map(_.window_start.getTime).distinct.length === aRows.length)
      assert(aRows.exists(r => r.count_min == 2L)) // window-1 exact (k not hit)
      assert(aRows.exists(r => r.count_min == 1L)) // window-2
      assert(aRows.map(_.shard).distinct.length === 1)
    } finally q.stop()
  }
}
