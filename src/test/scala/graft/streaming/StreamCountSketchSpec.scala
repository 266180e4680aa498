package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.operators.CountSketch
import StreamCountSketch.{CounterRow, Hashed}

class StreamCountSketchSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streamed signed counters are bit-identical to the batch sketch") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val D = 5
    val W = 16
    val input = MemoryStream[Hashed]
    val q = StreamCountSketch.counters(input.toDS(), windowSeconds = 60,
        watermarkDelay = "90 seconds", d = D, w = W)
      .writeStream.format("memory").queryName("cs_out")
      .outputMode(OutputMode.Append()).start()
    try {
      var lcg = 0xFEEDFACEL
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
      assert(spark.table("cs_out").count() === 0, "window still open")
      input.addData(Hashed(ts("2025-01-01 10:05:30"), 1L))
      q.processAllAvailable()
      val streamed = spark.table("cs_out").as[CounterRow].collect()
        .map(r => (r.row, r.bucket) -> r.cnt).toMap
      val batchCtrs = CountSketch
        .counters(hs.toDF("h"), "h", D, W)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed === batchCtrs, "stream ≢ batch signed counters")
      // signed counters genuinely cancel: some counter must be < its
      // bucket's item count (else the sign hash degenerated to +1)
      assert(batchCtrs.values.exists(_ < 0) ||
        batchCtrs.values.sum < hs.length * D,
        "no cancellation — sign hash looks degenerate")
      // estimates off the streamed sketch flow through the batch
      // estimator unchanged
      val ctrsDf = spark.table("cs_out")
        .select(col("row"), col("bucket"), col("cnt"))
      val exact = hs.toDF("h").groupBy("h").agg(count(lit(1)).as("tf"))
      val est = CountSketch.estimate(ctrsDf, exact, "h", D, W)
        .collect()
        .map(r => (r.getAs[Long]("tf"), r.getAs[Long]("cs_est")))
      assert(est.nonEmpty)
      // unbiased two-sided regime at this density: mean |err| bounded
      // by the counter mass (sanity, not a proof)
      val errs = est.map { case (tf, e) => math.abs(e - tf) }
      assert(errs.max <= hs.length, "error blew past the total mass")
    } finally q.stop()
  }
}
