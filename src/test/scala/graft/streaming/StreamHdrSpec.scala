package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.HdrSketch
import StreamHdr.{BucketRow, Keyed}

class StreamHdrSpec extends SparkSpec {
  import spark.implicits._

  private val B = 5

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streamed per-window HDR buckets are bit-identical to batch") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Keyed]
    val q = StreamHdr.buckets(input.toDS(), bits = B, windowSeconds = 60,
        watermarkDelay = "90 seconds")
      .writeStream.format("memory").queryName("hdr_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // Zipf-ish values across two keys, out-of-order delivery
      var lcg = 0xCAFEL
      def next(): Long = {
        lcg = lcg * 6364136223846793005L + 1442695040888963407L
        lcg >>> 16
      }
      val aV = (0 until 400).map(_ => next() % 1000000L)
      val bV = (0 until 90).map(_ => next() % 64L)
      val base = "2025-01-01 10:00:"
      val items =
        aV.zipWithIndex.map { case (v, i) =>
          Keyed(ts(f"$base${i % 60}%02d"), "a", v) } ++
        bV.zipWithIndex.map { case (v, i) =>
          Keyed(ts(f"$base${(i * 7) % 60}%02d"), "b", v) }
      val (x, y) = items.splitAt(300)
      input.addData(x: _*)
      q.processAllAvailable()
      input.addData(y.reverse: _*)
      q.processAllAvailable()
      assert(spark.table("hdr_out").count() === 0, "window still open")
      input.addData(Keyed(ts("2025-01-01 10:05:30"), "z", 1L))
      q.processAllAvailable()
      val streamed = spark.table("hdr_out").as[BucketRow].collect()
        .map(r => (r.key, r.idx, r.cnt)).sorted.toSeq
      val batch = HdrSketch.sketch(
          (aV.map(("a", _)) ++ bV.map(("b", _))).toDF("src", "v"),
          Seq("src"), "v", B)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      assert(streamed === batch, "stream ≢ batch HDR sketch")
      // emitted rows feed the batch quantile extractor unchanged
      val qs = HdrSketch.quantiles(
        spark.table("hdr_out").selectExpr("key", "idx", "cnt"),
        Seq("key"), Seq((50, 1L, 2L), (99, 99L, 100L)), B)
        .collect()
      assert(qs.length === 4)
      // rank containment vs the exact driver-side quantile
      val exact = Map("a" -> aV.sorted, "b" -> bV.sorted)
      qs.foreach { r =>
        val (key, pct) = (r.getString(0), r.getInt(r.fieldIndex("pct")))
        val (low, w) = (r.getLong(r.fieldIndex("est_low")),
          r.getLong(r.fieldIndex("width")))
        val sorted = exact(key)
        val rank = if (pct == 50) (sorted.length - 1) / 2
          else 99L * (sorted.length - 1) / 100
        val ev = sorted(rank.toInt)
        assert(ev >= low && ev < low + w, s"$key p$pct: $ev not in [$low,${low + w})")
      }
    } finally q.stop()
  }

  test("bucket JVM twin matches the Column walk exactly") {
    val vs = Seq(0L, 1L, 31L, 32L, 63L, 64L, 65L, 127L, 128L, 1000000L,
      (1L << 40) + 12345L, Long.MaxValue)
    val got = vs.toDF("v")
      .select(col("v"), HdrSketch.bucketIdx(col("v"), B).as("idx"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(1) === StreamHdr.bucketOf(r.getLong(0), B),
        s"v=${r.getLong(0)}")
    }
  }
}
