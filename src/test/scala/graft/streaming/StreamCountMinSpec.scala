package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.operators.CountMin
import StreamCountMin.{CounterRow, Hashed}

class StreamCountMinSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streamed window counters are bit-identical to the batch sketch") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val D = 3
    val W = 16
    val input = MemoryStream[Hashed]
    // delay > the window span so the second (reversed) trigger's
    // events are still inside the watermark tolerance — this spec
    // tests order-invariance, not late-drop policy
    val q = StreamCountMin.counters(input.toDS(), windowSeconds = 60,
        watermarkDelay = "90 seconds", d = D, w = W)
      .writeStream.format("memory").queryName("cms_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // one window of zipf-ish hashes, delivered across TWO triggers
      // in interleaved order — CMS counters must not care
      var lcg = 0xDEADBEEFL
      def next(bound: Int): Int = {
        lcg = lcg * 6364136223846793005L + 1442695040888963407L
        (((lcg >>> 33) % bound + bound) % bound).toInt
      }
      val hs = (0 until 300).map(_ => (next(25) * 7919L) % 1000003L)
      val base = "2025-01-01 10:00:"
      val items = hs.zipWithIndex.map { case (h, i) =>
        Hashed(ts(f"$base${i % 60}%02d"), h)
      }
      val (a, b) = items.splitAt(150)
      input.addData(a: _*)
      q.processAllAvailable()
      input.addData(b.reverse: _*)
      q.processAllAvailable()
      assert(spark.table("cms_out").count() === 0, "window still open")
      input.addData(Hashed(ts("2025-01-01 10:05:30"), 1L))
      q.processAllAvailable()
      val streamed = spark.table("cms_out").as[CounterRow].collect()
        .map(r => (r.row, r.bucket) -> r.cnt).toMap
      // batch twin over the same window's rows
      val batchCtrs = CountMin
        .counters(hs.toDF("h"), "h", D, W)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed === batchCtrs, "stream ≢ batch counters")
      // and estimates off the streamed sketch never undercount
      val ctrsDf = spark.table("cms_out")
        .select(col("row"), col("bucket"), col("cnt"))
      val exact = hs.toDF("h").groupBy("h").agg(count(lit(1)).as("tf"))
      val est = CountMin.estimate(ctrsDf, exact, "h", D, W)
        .collect()
        .map(r => (r.getAs[Long]("tf"), r.getAs[Long]("cms_est")))
      assert(est.nonEmpty && est.forall { case (tf, e) => e >= tf })
    } finally q.stop()
  }
}
