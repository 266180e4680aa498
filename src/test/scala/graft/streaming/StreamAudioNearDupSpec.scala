package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.operators.Dedup

object StreamAudioNearDupSpec {
  case class Clip(media_id: Long, ts: Timestamp, content: Array[Byte])
}

class StreamAudioNearDupSpec extends SparkSpec {
  import StreamAudioNearDupSpec.Clip

  private val COEFFS =
    Seq(1.9, 1.5, 1.0, 0.5, 0.0, -0.5, -1.0, -1.5, -1.9)
  private val FRAME = 16
  private val HOP = 6

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def wav(samples: Array[Int]): Array[Byte] = {
    val n = samples.length
    val out = new Array[Byte](44 + 2 * n)
    def put(o: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(out, o)
    def le32(o: Int, x: Int): Unit = {
      out(o) = x.toByte; out(o + 1) = (x >> 8).toByte
      out(o + 2) = (x >> 16).toByte; out(o + 3) = (x >> 24).toByte
    }
    def le16(o: Int, x: Int): Unit = {
      out(o) = x.toByte; out(o + 1) = (x >> 8).toByte
    }
    put(0, "RIFF"); le32(4, 36 + 2 * n); put(8, "WAVE"); put(12, "fmt ")
    le32(16, 16); le16(20, 1); le16(22, 1); le32(24, 8000)
    le32(28, 16000); le16(32, 2); le16(34, 16)
    put(36, "data"); le32(40, 2 * n)
    samples.indices.foreach(i => le16(44 + 2 * i, samples(i) & 0xFFFF))
    out
  }

  private def hkWav(doc: Long): Array[Byte] = {
    val k = doc / 8
    val v = doc % 8
    wav(Array.tabulate(64)(t =>
      ((k * 53 + (17 + 3 * (k % 29)) * t) % 2003 - 1001 +
        (if (t == 40) 8 * v else 0)).toInt))
  }

  test("in-horizon audio near-dups surface; cross-horizon twins don't") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Clip]
    val q = StreamAudioNearDup.matches(input.toDF(), "media_id", "ts",
        "content", COEFFS, FRAME, HOP, maxHamming = 3, delaySeconds = 60)
      .writeStream.format("memory").queryName("sand_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // docs 0 and 8·k share nothing; 0 vs 0-twin (id 100, same class
      // and variant) is an exact dup; undecodable payload drops
      input.addData(
        Clip(0L, ts("2025-01-01 10:00:00"), hkWav(0L)),
        Clip(55L, ts("2025-01-01 10:00:05"), hkWav(55L)),
        Clip(99L, ts("2025-01-01 10:00:08"), "static".getBytes))
      input.addData(Clip(100L, ts("2025-01-01 10:00:10"), hkWav(0L)))
      q.processAllAvailable()
      val pairs = spark.table("sand_out")
        .select("media_id", "dup_of", "hamming").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(pairs.contains((100L, 0L, 0)),
        s"exact in-horizon twin must fire: $pairs")
      assert(!pairs.exists(p => p._1 == 99L || p._2 == 99L))

      // past the horizon, a fresh exact twin of 0 must NOT fire
      input.addData(Clip(90L, ts("2025-01-01 11:00:00"), hkWav(90L)))
      q.processAllAvailable()
      input.addData(Clip(101L, ts("2025-01-01 10:59:30"), hkWav(0L)))
      q.processAllAvailable()
      assert(spark.table("sand_out")
        .filter($"media_id" === 101L).count() === 0L,
        "cross-horizon audio dup must NOT fire")
    } finally q.stop()
  }

  test("bounded in-horizon replay agrees with the batch banded join") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clips = (0L until 32L).map(d =>
      Clip(d, ts(f"2025-01-01 10:00:${d}%02d"), hkWav(d)))
    val input = MemoryStream[Clip]
    val q = StreamAudioNearDup.matches(input.toDF(), "media_id", "ts",
        "content", COEFFS, FRAME, HOP, maxHamming = 3,
        delaySeconds = 3600)
      .writeStream.format("memory").queryName("sand_eq")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(clips: _*)
      q.processAllAvailable()
      // stream emits (later, earlier); batch emits d1 < d2 — ids
      // arrive in id order, so (dup_of, media_id) ≡ (d1, d2)
      val streamed = spark.table("sand_eq")
        .select("dup_of", "media_id", "hamming").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val batch = Dedup.audioNearDupPairs(
          clips.map(c => (c.media_id, c.content))
            .toDF("media_id", "content"),
          COEFFS, FRAME, HOP, maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(streamed === batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }
}
