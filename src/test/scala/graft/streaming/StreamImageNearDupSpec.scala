package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.operators.{Dedup, Multimodal}

object StreamImageNearDupSpec {
  case class Img(media_id: Long, ts: Timestamp, content: Array[Byte])
}

class StreamImageNearDupSpec extends SparkSpec {
  import StreamImageNearDupSpec.Img

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** 64×64 grayscale step PNG (q152's analytic fixture). */
  private def stepPng(px: Int, py: Int): Array[Byte] = {
    val N = 64
    val pxl = Array.tabulate(N * N * 3) { i =>
      val p = i / 3; val x = p % N; val y = p / N
      (16 + (if (x >= 2 * px) 96 else 0) + (if (y >= 2 * py) 96 else 0)).toByte
    }
    Multimodal.pngEncode(Multimodal.PngImage(N, N, 3, pxl), _ % 5,
      new java.util.zip.Deflater())
  }

  test("in-horizon image near-dups surface; far images and late arrivals don't") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Img]
    val q = StreamImageNearDup.matches(input.toDF(), "media_id", "ts",
        "content", maxHamming = 3, delaySeconds = 60)
      .writeStream.format("memory").queryName("sind_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // analytic patterns: px=1 and px=3 share the all-zero x-pattern
      // (exact dup); px=5 is 1 bit away, px=7 is 3 bits from zero and
      // 2 from px=5 — all within hamming 3; (21,25) is far from all
      input.addData(
        Img(1L, ts("2025-01-01 10:00:00"), stepPng(1, 3)),
        Img(2L, ts("2025-01-01 10:00:05"), stepPng(3, 3)),
        Img(3L, ts("2025-01-01 10:00:10"), stepPng(5, 3)),
        Img(4L, ts("2025-01-01 10:00:15"), stepPng(21, 25)),
        Img(5L, ts("2025-01-01 10:00:20"), "not an image".getBytes))
      input.addData(Img(6L, ts("2025-01-01 10:00:25"), stepPng(7, 3)))
      q.processAllAvailable()
      val pairs = spark.table("sind_out")
        .select("media_id", "dup_of", "hamming").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(pairs === Set((2L, 1L, 0), (3L, 1L, 1), (3L, 2L, 1),
        (6L, 1L, 3), (6L, 2L, 3), (6L, 3L, 2)),
        s"unexpected pair set: $pairs")

      // advance past the horizon, then send an exact twin of image 1:
      // its bucket state was evicted, so nothing fires (batch's job)
      input.addData(Img(90L, ts("2025-01-01 11:00:00"), stepPng(29, 9)))
      q.processAllAvailable()
      input.addData(Img(91L, ts("2025-01-01 10:59:30"), stepPng(1, 3)))
      q.processAllAvailable()
      val after = spark.table("sind_out")
        .filter($"media_id" === 91L).count()
      assert(after === 0L, "cross-horizon image dup must NOT fire")
    } finally q.stop()
  }

  test("bounded in-horizon replay agrees with the batch banded join") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val imgs = (0 until 24).map { i =>
      Img(i.toLong, ts(f"2025-01-01 10:00:${i * 2}%02d"),
        stepPng(2 * (i % 6) + 1, 2 * ((i / 6) % 4) + 3))
    }
    val input = MemoryStream[Img]
    val q = StreamImageNearDup.matches(input.toDF(), "media_id", "ts",
        "content", maxHamming = 3, delaySeconds = 3600)
      .writeStream.format("memory").queryName("sind_eq")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(imgs: _*)
      q.processAllAvailable()
      // stream emits (later, earlier); batch emits d1 < d2 — ids here
      // arrive in id order, so (dup_of, media_id) ≡ (d1, d2)
      val streamed = spark.table("sind_eq")
        .select("dup_of", "media_id", "hamming").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val media = imgs.toDF().withColumnRenamed("content", "content")
        .select(col("media_id"), col("content"))
      val batch = Dedup.imageNearDupPairs(media, maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(streamed === batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }
}
