package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.operators.Kmv
import StreamKmv.{Keyed, SketchRow}

class StreamKmvSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streamed per-window bottom-k sketches are bit-identical to the batch sketch") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val K = 8
    val input = MemoryStream[Keyed]
    val q = StreamKmv.sketches(input.toDS(), windowSeconds = 60,
        watermarkDelay = "90 seconds", k = K)
      .writeStream.format("memory").queryName("kmv_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // two keys, one window, heavy DUPLICATES (the distinct-set
      // semantics must hold) and more distinct hashes than k for
      // key "a" but fewer than k for key "b" (small set ⇒ sketch IS
      // the set), delivered across two interleaved triggers
      var lcg = 0xC0FFEEL
      def next(bound: Int): Int = {
        lcg = lcg * 6364136223846793005L + 1442695040888963407L
        (((lcg >>> 33) % bound + bound) % bound).toInt
      }
      val aHashes = (0 until 200).map(_ => (next(40) * 7919L) % 1000003L)
      val bHashes = (0 until 50).map(_ => (next(5) * 104729L) % 1000003L)
      val base = "2025-01-01 10:00:"
      val items =
        aHashes.zipWithIndex.map { case (h, i) =>
          Keyed(ts(f"$base${i % 60}%02d"), "a", h) } ++
        bHashes.zipWithIndex.map { case (h, i) =>
          Keyed(ts(f"$base${(i * 7) % 60}%02d"), "b", h) }
      val (x, y) = items.splitAt(125)
      input.addData(x: _*)
      q.processAllAvailable()
      input.addData(y.reverse: _*)
      q.processAllAvailable()
      assert(spark.table("kmv_out").count() === 0, "window still open")
      input.addData(Keyed(ts("2025-01-01 10:05:30"), "z", 1L))
      q.processAllAvailable()
      val streamed = spark.table("kmv_out").as[SketchRow].collect()
        .map(r => (r.key, r.h)).sorted.toSeq
      // batch twin: DISTINCT (key, hash) rows of the same window
      val rows = (aHashes.map(("a", _)) ++ bHashes.map(("b", _)))
        .distinct.toDF("src", "h")
      val batch = Kmv.sketches(rows, "src", "h", K)
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(streamed === batch, "stream ≢ batch sketch contents")
      // key b has < k distinct hashes: the sketch is the whole set
      assert(streamed.count(_._1 == "b") === bHashes.distinct.size)
      assert(streamed.count(_._1 == "a") === K)
      // and the emitted sketches feed the batch pair estimator
      val jac = Kmv.pairJaccard(
        spark.table("kmv_out").selectExpr("key AS src", "h"),
        "src", "h", K).collect()
      assert(jac.length === 1 && jac.head.getAs[Long]("k_eff") === K)
    } finally q.stop()
  }

  test("state is bounded at k longs per open (window, key)") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Keyed]
    val q = StreamKmv.sketches(input.toDS(), windowSeconds = 60,
        watermarkDelay = "90 seconds", k = 4)
      .writeStream.format("memory").queryName("kmv_bound")
      .outputMode(OutputMode.Append()).start()
    try {
      // 500 distinct hashes into one key: state must stay 4 longs —
      // proven via the emitted sketch (exactly the 4 smallest), since
      // the merge truncates every micro-batch, not at close
      input.addData((1 to 500).map(i =>
        Keyed(ts("2025-01-01 10:00:30"), "big", i * 37L % 99991L)): _*)
      q.processAllAvailable()
      input.addData(Keyed(ts("2025-01-01 10:05:30"), "z", 1L))
      q.processAllAvailable()
      val got = spark.table("kmv_bound").as[SketchRow].collect()
        .filter(_.key == "big").map(_.h).sorted.toSeq
      val want = (1 to 500).map(i => i * 37L % 99991L)
        .distinct.sorted.take(4)
      assert(got === want)
    } finally q.stop()
  }
}
