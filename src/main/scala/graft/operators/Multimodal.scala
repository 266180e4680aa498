package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata structs; decode /
  * feature-extraction runs per-partition so a real decoder could
  * amortize per-batch initialization (model load, JNI handles) the way
  * a Pandas-UDF batch would.
  *
  * The DECODE STEP IS A STUB — this container ships no image/audio
  * codecs. `decodeStub` derives deterministic fake dimensions from the
  * byte content; everything around it (schema, batching shape,
  * partitioning, frame slicing) is real and tested, so swapping in an
  * actual decoder is a one-function change.
  *
  * Scale notes: payload bytes stay columnar parquet binary; frame
  * sampling is a narrow per-row expression; the mapPartitions decode
  * pipelines inside the scan stage. Nothing here shuffles.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("content", BinaryType),
    StructField("mime", StringType)))

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("mime", StringType),
    StructField("byte_len", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType)))

  /** STUB decoder: deterministic pseudo-dimensions from content bytes.
    * Replace with a real codec (e.g. javax.imageio / ffmpeg JNI) —
    * same signature, same per-partition call pattern.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
    (64 + (h % 1024).toInt, 64 + ((h / 1024) % 1024).toInt, 3)
  }

  /** Per-partition decode: DataFrame(media_id, content, mime) →
    * decodedSchema rows. A real decoder initializes once per
    * partition, before the row loop.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val enc = Encoders.row(decodedSchema)
    media.select(col("media_id"), col("content"), col("mime"))
      .mapPartitions { rows =>
        // per-partition init for a real codec would go here
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val mime = r.getString(2)
          val (w, h, c) =
            if (bytes == null) (0, 0, 0) else decodeStub(bytes)
          Row(id, mime, if (bytes == null) 0 else bytes.length, w, h, c)
        }
      }(enc)
  }

  /** Fixed-stride frame sampling over a binary payload: n slices of
    * `frameSize` bytes starting every `stride` bytes (video
    * frame-extraction shape; slices past the end come back empty).
    */
  def frameSample(content: Column, frameSize: Int, stride: Int,
      n: Int): Column =
    transform(sequence(lit(0), lit(n - 1)),
      i => content.substr(i * lit(stride) + lit(1), lit(frameSize)))
}
