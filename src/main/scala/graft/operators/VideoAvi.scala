package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** AVI (RIFF) video container codec — the video half of the
  * multimodal surface next to [[Jpeg]] and [[Multimodal]]'s
  * PNG/BMP/WAV: a training pipeline treats video as "container →
  * sampled frames → the image path", and THIS operator is that first
  * hop, pure JVM (RIFF chunk walk, BITMAPINFOHEADER validation,
  * bottom-up padded-row BGR frame extraction — the same DIB layout as
  * the BMP codec). Two stream formats decode: uncompressed BI_RGB
  * 24bpp DIB frames, and MJPEG ('MJPG' biCompression — each '00dc'
  * chunk a complete JFIF stream handed to the in-repo baseline
  * [[Jpeg]] decoder). Other compressed codecs (H.264 etc.) still need
  * a codec library; the per-frame decode dispatch here is where one
  * drops in, and any other `biCompression` is rejected to null rather
  * than misread (the [[Multimodal.pngDecode]] corrupt-input contract).
  *
  * Scale shape: decode is row-parallel and stride sampling happens
  * INSIDE the decode loop — unsampled frames are skipped by seeking
  * (chunk sizes), never materialized or (for MJPEG) entropy-decoded,
  * so per-row memory is O(sampled frames), the property that matters
  * when a row is a multi-GB clip and the pipeline wants 1 frame per
  * second of it.
  */
object VideoAvi {

  /** 'MJPG' fourcc as the little-endian BITMAPINFOHEADER
    * biCompression int.
    */
  val MJPG: Int = 0x47504A4D

  /** Decoded clip: frames as top-down interleaved RGB. */
  final case class AviClip(width: Int, height: Int, nFrames: Int,
      frames: Array[Array[Byte]])

  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def rdLe32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 3) & 0xff) << 24)
  private def rdLe16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  private def rowBytes(width: Int): Int = ((width * 3 + 3) / 4) * 4

  /** Encode a spec-conformant uncompressed AVI: RIFF(AVI ) with hdrl
    * (avih + one 'vids'/'DIB ' stream, BITMAPINFOHEADER BI_RGB 24bpp)
    * and movi '00db' frames as bottom-up 4-byte-padded BGR rows (the
    * DIB convention). `pixel(f, x, y)` returns (r, g, b) for the
    * TOP-DOWN logical image.
    */
  def aviEncode(width: Int, height: Int, nFrames: Int,
      pixel: (Int, Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rb = rowBytes(width)
    val frameSize = rb * height
    val payloads = (0 until nFrames).map { f =>
      val data = new Array[Byte](frameSize)
      var y = 0
      while (y < height) {
        val srcY = height - 1 - y // bottom-up storage
        var x = 0
        while (x < width) {
          val (r, g, bl) = pixel(f, x, srcY)
          val o = y * rb + x * 3
          data(o) = bl.toByte; data(o + 1) = g.toByte; data(o + 2) = r.toByte
          x += 1
        }
        y += 1
      }
      data
    }
    assembleAvi(width, height, "DIB ", 0, "00db", payloads)
  }

  /** Encode an MJPEG AVI: the same RIFF skeleton as [[aviEncode]],
    * but 'MJPG' handler/biCompression and each frame a '00dc' chunk
    * holding a complete baseline JFIF stream (the MJPEG-in-AVI
    * convention — no inter-frame state, every frame independently
    * decodable, which is exactly what makes stride seek-skipping
    * possible on the decode side).
    */
  def aviEncodeMjpeg(width: Int, height: Int,
      jpegFrames: Seq[Array[Byte]]): Array[Byte] =
    assembleAvi(width, height, "MJPG", MJPG, "00dc", jpegFrames)

  private def assembleAvi(width: Int, height: Int, handler: String,
      biCompression: Int, chunkId: String,
      framePayloads: Seq[Array[Byte]]): Array[Byte] = {
    val nFrames = framePayloads.length
    val frameSize =
      if (framePayloads.isEmpty) 0 else framePayloads.map(_.length).max
    val out = new java.io.ByteArrayOutputStream()
    def w(b: Array[Byte]): Unit = out.write(b)
    def cc(s: String): Unit = w(s.getBytes("US-ASCII"))

    val strf = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(le32(40)); b.write(le32(width)); b.write(le32(height))
      b.write(le16(1)); b.write(le16(24)) // planes, bpp
      b.write(le32(biCompression))
      b.write(le32(frameSize))
      b.write(le32(0)); b.write(le32(0)); b.write(le32(0)); b.write(le32(0))
      b.toByteArray
    }
    val strh = {
      val b = new java.io.ByteArrayOutputStream()
      b.write("vids".getBytes); b.write(handler.getBytes)
      b.write(le32(0)); b.write(le16(0)); b.write(le16(0)) // flags, prio, lang
      b.write(le32(0)) // initial frames
      b.write(le32(1)); b.write(le32(25)) // scale, rate (25 fps)
      b.write(le32(0)); b.write(le32(nFrames))
      b.write(le32(frameSize)); b.write(le32(-1)) // bufSize, quality
      b.write(le32(0)) // sampleSize
      b.write(le16(0)); b.write(le16(0)); b.write(le16(width)); b.write(le16(height))
      b.toByteArray
    }
    val avih = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(le32(40000)) // µs per frame
      b.write(le32(frameSize * 25)); b.write(le32(0)); b.write(le32(0))
      b.write(le32(nFrames)); b.write(le32(0)); b.write(le32(1)) // streams
      b.write(le32(frameSize)); b.write(le32(width)); b.write(le32(height))
      b.write(le32(0)); b.write(le32(0)); b.write(le32(0)); b.write(le32(0))
      b.toByteArray
    }
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(id.getBytes); b.write(le32(data.length)); b.write(data)
      if (data.length % 2 == 1) b.write(0) // RIFF word alignment
      b.toByteArray
    }
    def list(kind: String, payload: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write("LIST".getBytes); b.write(le32(4 + payload.length))
      b.write(kind.getBytes); b.write(payload)
      b.toByteArray
    }
    val strl = list("strl", chunk("strh", strh) ++ chunk("strf", strf))
    val hdrl = list("hdrl", chunk("avih", avih) ++ strl)
    val moviPayload = new java.io.ByteArrayOutputStream()
    framePayloads.foreach(p => moviPayload.write(chunk(chunkId, p)))
    val movi = list("movi", moviPayload.toByteArray)
    val body = hdrl ++ movi
    cc("RIFF"); w(le32(4 + body.length)); cc("AVI ")
    w(body)
    out.toByteArray
  }

  /** Decode frames `f` with `f % stride == 0` (stride 1 = all).
    * Handles BI_RGB DIB and 'MJPG' streams. Null on
    * corrupt/unsupported input: bad RIFF/AVI magic, missing headers,
    * any other biCompression, non-24bpp, truncated movi data,
    * frame-size mismatch, or an MJPEG frame that fails JPEG decode or
    * disagrees with the declared stream dims. Unsampled frames are
    * SKIPPED by chunk-size seek, never copied or entropy-decoded.
    */
  def aviDecode(bytes: Array[Byte], stride: Int = 1): AviClip = {
    try decodeOrThrow(bytes, stride)
    catch { case _: Exception => null }
  }

  private def decodeOrThrow(b: Array[Byte], stride: Int): AviClip = {
    require(stride >= 1)
    if (b == null || b.length < 24 || fourcc(b, 0) != "RIFF" ||
      fourcc(b, 8) != "AVI ") return null
    var width = 0; var height = 0; var declaredFrames = -1
    var bpp = 0; var compression = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var frameIdx = 0

    def walk(from: Int, to: Int): Unit = {
      var p = from
      while (p + 8 <= to) {
        val id = fourcc(b, p)
        val sz = rdLe32(b, p + 4)
        if (sz < 0 || p + 8 + sz > to)
          throw new IllegalArgumentException("truncated chunk")
        if (id == "LIST") {
          walk(p + 12, p + 8 + sz) // skip the list-kind fourcc
        } else if (id == "avih") {
          declaredFrames = rdLe32(b, p + 8 + 16)
        } else if (id == "strf") {
          width = rdLe32(b, p + 8 + 4)
          height = rdLe32(b, p + 8 + 8)
          bpp = rdLe16(b, p + 8 + 14)
          compression = rdLe32(b, p + 8 + 16)
        } else if (id == "00db" || id == "00dc") {
          if ((compression != 0 && compression != MJPG) || bpp != 24)
            throw new IllegalArgumentException("unsupported stream format")
          // decompression-bomb guard: strf carries full 32-bit dims —
          // cap pixels before any dim-driven allocation (an OOM is an
          // Error, not an Exception: it would kill the task, not null
          // the row)
          if (width <= 0 || height <= 0 ||
              width.toLong * height > (1L << 26))
            throw new IllegalArgumentException("implausible dimensions")
          if (frameIdx % stride == 0) {
            if (compression == MJPG) {
              // MJPEG: the chunk is a complete JFIF stream; decode
              // with the in-repo baseline codec and pin the frame to
              // the declared stream dims — a frame that decodes to
              // different dims (or grayscale) is a lying container
              val img = Jpeg.jpegDecode(
                java.util.Arrays.copyOfRange(b, p + 8, p + 8 + sz))
              if (img == null || img.channels != 3 ||
                  img.width != width || img.height != height)
                throw new IllegalArgumentException("bad MJPEG frame")
              frames += img.pixels
            } else {
              val rb2 = rowBytes(width)
              if (sz != rb2 * height)
                throw new IllegalArgumentException("frame size mismatch")
              val px = new Array[Byte](width * height * 3)
              var y = 0
              while (y < height) {
                val srcRow = p + 8 + (height - 1 - y) * rb2 // un-flip
                var x = 0
                while (x < width) {
                  val o = (y * width + x) * 3
                  px(o) = b(srcRow + x * 3 + 2)     // R
                  px(o + 1) = b(srcRow + x * 3 + 1) // G
                  px(o + 2) = b(srcRow + x * 3)     // B
                  x += 1
                }
                y += 1
              }
              frames += px
            }
          }
          frameIdx += 1
        }
        p += 8 + sz + (sz & 1) // word alignment
      }
    }
    walk(12, b.length)
    if (width <= 0 || height <= 0 ||
      (compression != 0 && compression != MJPG) || bpp != 24)
      return null
    if (declaredFrames >= 0 && frameIdx != declaredFrames)
      throw new IllegalArgumentException("frame count mismatch")
    AviClip(width, height, frameIdx, frames.toArray)
  }

  val videoSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("n_sampled", IntegerType),
    StructField("f_first_r", IntegerType),
    StructField("f_first_g", IntegerType),
    StructField("f_first_b", IntegerType),
    StructField("l_last_r", IntegerType),
    StructField("l_last_g", IntegerType),
    StructField("l_last_b", IntegerType),
    StructField("pix_sum", LongType)))

  /** Distributed container decode + stride frame sampling:
    * dimensions, frame counts, first sampled frame's top-left and
    * last sampled frame's bottom-right RGB, and Σ over every channel
    * of every SAMPLED frame. Undecodable payloads yield a null-stats
    * row.
    */
  def videoFeatures(media: DataFrame, stride: Int): DataFrame = {
    val enc = Encoders.row(videoSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val clip = aviDecode(r.getAs[Array[Byte]](1), stride)
          if (clip == null || clip.frames.isEmpty)
            Row(r.getLong(0), null, null, null, null, null, null, null,
              null, null, null, null)
          else {
            var sum = 0L
            clip.frames.foreach { f =>
              var i = 0
              while (i < f.length) { sum += f(i) & 0xff; i += 1 }
            }
            val first = clip.frames.head
            val last = clip.frames.last
            val lo = (clip.height * clip.width - 1) * 3
            Row(r.getLong(0), clip.width, clip.height, clip.nFrames,
              clip.frames.length,
              first(0) & 0xff, first(1) & 0xff, first(2) & 0xff,
              last(lo) & 0xff, last(lo + 1) & 0xff, last(lo + 2) & 0xff,
              sum)
          }
        }
      }(enc)
  }
}
