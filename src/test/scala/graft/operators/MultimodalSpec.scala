package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Seq(
    (1L, "hello world, this is a binary payload", "image/png"),
    (2L, "x", "audio/wav"),
    (3L, null.asInstanceOf[String], "video/mp4")
  ).toDF("media_id", "text", "mime")
    .select(col("media_id"), encode(col("text"), "UTF-8").as("content"), col("mime"))

  test("decodeFeatures: per-partition stub decode with stable schema") {
    val out = Multimodal.decodeFeatures(media).orderBy("media_id").collect()
    assert(out.length === 3)
    assert(out(0).getInt(out(0).fieldIndex("byte_len")) === 37)
    val (w, h, c) = (out(0).getInt(3), out(0).getInt(4), out(0).getInt(5))
    assert(w >= 64 && w < 64 + 1024 && h >= 64 && h < 64 + 1024 && c === 3)
    // determinism: same bytes → same fake dims
    val again = Multimodal.decodeFeatures(media).orderBy("media_id").collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
    // null payload → zeroed features
    assert(out(2).getInt(out(2).fieldIndex("byte_len")) === 0)
  }

  test("frameSample slices fixed-stride binary frames") {
    val frames = media.filter(col("media_id") === 1L)
      .select(Multimodal.frameSample(col("content"), frameSize = 10,
        stride = 16, n = 3).as("frames"))
      .head().getSeq[Array[Byte]](0)
    assert(frames.length === 3)
    assert(new String(frames(0), "UTF-8") === "hello worl")
    assert(new String(frames(1), "UTF-8") === "s is a bin")
    // past-the-end slice is shorter
    assert(new String(frames(2), "UTF-8") === "yload")
  }
}
