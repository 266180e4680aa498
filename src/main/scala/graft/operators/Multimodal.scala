package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata structs; decode /
  * feature-extraction runs per-partition so a heavyweight decoder can
  * amortize per-batch initialization (model load, JNI handles) the way
  * a Pandas-UDF batch would.
  *
  * The decode step is a REAL pure-JVM container-header parser for the
  * public PNG / BMP / WAV formats (published specs: PNG RFC 2083 §3.1
  * IHDR; BITMAPINFOHEADER; RIFF/WAVE fmt chunk) — it recovers
  * width/height/channels (sample-rate/bit-depth/channels for audio)
  * from the leading bytes without any codec library. Full pixel/sample
  * decode of compressed payloads would need an actual codec (libpng,
  * ffmpeg) this container doesn't ship; the header path exercises the
  * same plumbing — schema, batch shape, per-partition init point —
  * that a full decoder plugs into.
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

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def le32(b: Array[Byte], o: Int): Int =
    ((b(o + 3) & 0xff) << 24) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
  private def le16(b: Array[Byte], o: Int): Int =
    ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)

  private val pngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Header decoder for public container formats, pure JVM byte reads:
    *  - PNG  → (width, height, channels-from-color-type) via the IHDR
    *    chunk (always first, fixed offsets 16/20/25);
    *  - BMP  → (width, |height|, bit-count/8) from BITMAPINFOHEADER
    *    (height may be negative = top-down rows);
    *  - WAV  → (sample_rate, bits_per_sample, num_channels) from the
    *    canonical RIFF/WAVE fmt chunk;
    *  - anything else / truncated → (0, 0, 0).
    */
  def decodeHeader(bytes: Array[Byte]): (Int, Int, Int) = {
    if (bytes == null) (0, 0, 0)
    else if (bytes.length >= 26 && bytes.take(8).sameElements(pngSig)) {
      val channels = bytes(25) match {
        case 0 => 1 // greyscale
        case 2 => 3 // truecolor
        case 3 => 1 // palette index
        case 4 => 2 // grey + alpha
        case 6 => 4 // truecolor + alpha
        case _ => 0
      }
      (be32(bytes, 16), be32(bytes, 20), channels)
    } else if (bytes.length >= 30 && bytes(0) == 'B' && bytes(1) == 'M')
      (le32(bytes, 18), math.abs(le32(bytes, 22)), le16(bytes, 28) / 8)
    else if (bytes.length >= 36 &&
        new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
        new String(bytes, 8, 4, "US-ASCII") == "WAVE" &&
        new String(bytes, 12, 4, "US-ASCII") == "fmt ")
      (le32(bytes, 24), le16(bytes, 34), le16(bytes, 22))
    else (0, 0, 0)
  }

  /** Per-partition decode: DataFrame(media_id, content, mime) →
    * decodedSchema rows. A real decoder initializes once per
    * partition, before the row loop.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val enc = Encoders.row(decodedSchema)
    media.select(col("media_id"), col("content"), col("mime"))
      .mapPartitions { rows =>
        // per-partition init point: a compressed-payload codec (libpng
        // / ffmpeg JNI handle) would be constructed ONCE here, before
        // the row loop — the header parser needs no state
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val mime = r.getString(2)
          val (w, h, c) = decodeHeader(bytes)
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
