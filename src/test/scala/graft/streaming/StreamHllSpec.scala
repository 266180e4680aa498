package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Hll
import StreamHll.{Keyed, RegRow}

class StreamHllSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streamed per-window HLL registers are bit-identical to batch") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Keyed]
    val q = StreamHll.registers(input.toDS(), windowSeconds = 60,
        watermarkDelay = "90 seconds")
      .writeStream.format("memory").queryName("hll_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // slotWide-domain hashes with heavy duplicates across two keys
      var lcg = 0xBEEFL
      def next(): Long = {
        lcg = lcg * 6364136223846793005L + 1442695040888963407L
        (lcg >>> 24) % 999985999949L
      }
      val aH = (0 until 400).map(_ => next() % 100000L * 7919L)
      val bH = (0 until 80).map(_ => next() % 64L * 104729L)
      val base = "2025-01-01 10:00:"
      val items =
        aH.zipWithIndex.map { case (h, i) =>
          Keyed(ts(f"$base${i % 60}%02d"), "a", h) } ++
        bH.zipWithIndex.map { case (h, i) =>
          Keyed(ts(f"$base${(i * 13) % 60}%02d"), "b", h) }
      val (x, y) = items.splitAt(250)
      input.addData(x: _*)
      q.processAllAvailable()
      input.addData(y.reverse: _*)
      q.processAllAvailable()
      assert(spark.table("hll_out").count() === 0, "window still open")
      input.addData(Keyed(ts("2025-01-01 10:05:30"), "z", 1L))
      q.processAllAvailable()
      val streamed = spark.table("hll_out").as[RegRow].collect()
        .map(r => (r.key, r.bucket, r.r)).sorted.toSeq
      val batch = Hll.registers(
          (aH.map(("a", _)) ++ bH.map(("b", _))).toDF("src", "h"),
          "src", "h")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
        .sorted.toSeq
      assert(streamed === batch, "stream ≢ batch HLL registers")
      // and the emitted registers feed the batch estimator unchanged
      val est = Hll.estimate(
        spark.table("hll_out").selectExpr("key", "bucket", "r"),
        "key").orderBy("key").collect()
      assert(est.length === 2)
      val estB = est(1).getAs[Double]("est")
      // key b has ≤ 64 distinct hashes: linear counting regime, close
      val exactB = bH.distinct.size.toDouble
      assert(math.abs(estB - exactB) / exactB < 0.25,
        s"HLL est $estB vs exact $exactB")
    } finally q.stop()
  }

  test("rho/bucket JVM twins match the Column walk exactly") {
    val hs = Seq(0L, 1L, 255L, 256L, 257L, 512L, 999985999948L,
      123456789L, 1L << 40)
    val got = hs.toDF("h")
      .select(col("h"),
        (col("h") % Hll.M).as("bucket"),
        least(expr(s"bit_count(((h div ${Hll.M}) & -(h div ${Hll.M})) - 1)")
          .cast("int") + lit(1), lit(Hll.RHO_CAP)).as("rho"))
      .collect()
    got.foreach { r =>
      val h = r.getLong(0)
      assert(r.getLong(1) === StreamHll.bucketOf(h).toLong, s"bucket h=$h")
      assert(r.getInt(2) === StreamHll.rhoOf(h), s"rho h=$h")
    }
  }
}
