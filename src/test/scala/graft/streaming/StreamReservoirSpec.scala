package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.operators.Sampling
import StreamReservoir.{Pick, PickRow}

final case class ResRaw(ts: Timestamp, stratum: String, key: Long,
    w: Double)

class StreamReservoirSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private type Raw = ResRaw
  private def Raw(ts: Timestamp, stratum: String, key: Long, w: Double) =
    ResRaw(ts, stratum, key, w)

  test("streamed per-window A-ES sample is bit-identical to the batch reservoir") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val K = 5
    val input = MemoryStream[Raw]
    // es_key computed by the SAME column expression the batch uses
    val picks = input.toDS()
      .withColumn("esKey", Sampling.esKey(col("key"), col("w")))
      .select(col("ts"), col("stratum"), col("key"), col("esKey"))
      .as[Pick]
    val q = StreamReservoir.sample(picks, windowSeconds = 60,
        watermarkDelay = "90 seconds", k = K)
      .writeStream.format("memory").queryName("res_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // two strata in one window: "a" has 40 rows (> k), "b" has 3
      // (< k ⇒ sample IS the stratum); skewed weights so selection is
      // weight-driven; delivered across two out-of-order triggers
      val base = "2025-01-01 10:00:"
      val items =
        (1 to 40).map(i => Raw(ts(f"$base${i % 60}%02d"), "a", i * 13L,
          if (i % 5 == 0) 9.0 else 0.5)) ++
        (1 to 3).map(i => Raw(ts(f"$base${(i * 7) % 60}%02d"), "b",
          1000L + i, i.toDouble))
      val (x, y) = items.splitAt(20)
      input.addData(y.reverse: _*)
      q.processAllAvailable()
      input.addData(x: _*)
      q.processAllAvailable()
      assert(spark.table("res_out").count() === 0, "window still open")
      input.addData(Raw(ts("2025-01-01 10:05:30"), "z", 1L, 1.0))
      q.processAllAvailable()
      val streamed = spark.table("res_out").as[PickRow].collect()
        .map(r => (r.stratum, r.key, r.es_key)).sorted.toSeq
      // batch twin over the same window's rows
      val batchDf = items.toDF()
      val batch = Sampling.weightedReservoirPerStratum(
          batchDf, "key", "stratum", col("w"), K)
        .select(col("stratum"), col("key"), col("es_key"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .sorted.toSeq
      assert(streamed === batch, "stream ≢ batch sample")
      assert(streamed.count(_._1 == "a") === K)
      assert(streamed.count(_._1 == "b") === 3)
    } finally q.stop()
  }

  test("state is bounded at k pairs per open (window, stratum)") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Raw]
    val picks = input.toDS()
      .withColumn("esKey", Sampling.esKey(col("key"), col("w")))
      .select(col("ts"), col("stratum"), col("key"), col("esKey"))
      .as[Pick]
    val q = StreamReservoir.sample(picks, windowSeconds = 60,
        watermarkDelay = "90 seconds", k = 3)
      .writeStream.format("memory").queryName("res_bound")
      .outputMode(OutputMode.Append()).start()
    try {
      // 400 rows into one stratum: the merge truncates to 3 every
      // micro-batch; the close emits exactly the batch top-3
      val rows = (1 to 400).map(i =>
        Raw(ts("2025-01-01 10:00:30"), "big", i.toLong, 1.0 + (i % 7)))
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData(Raw(ts("2025-01-01 10:05:30"), "z", 1L, 1.0))
      q.processAllAvailable()
      val got = spark.table("res_bound").as[PickRow].collect()
        .filter(_.stratum == "big").map(r => (r.es_key, r.key)).sorted.toSeq
      val want = Sampling.weightedReservoirPerStratum(rows.toDF(), "key",
          "stratum", col("w"), 3)
        .collect().map(r => (r.getAs[Double]("es_key"), r.getAs[Long]("key")))
        .sorted.toSeq
      assert(got === want)
    } finally q.stop()
  }
}
