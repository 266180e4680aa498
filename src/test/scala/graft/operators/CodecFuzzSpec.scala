package graft.operators

import graft.SparkSpec

/** Decoder robustness net: every pure-JVM codec must satisfy the
  * corrupt-input contract (return null/empty, NEVER throw) on
  * arbitrary mutations of valid files — the property that lets the
  * per-partition decode loops run over untrusted 100 TB media columns
  * without a poison byte killing a task. Deterministic seeded fuzz:
  * every truncation length and a fixed LCG sample of byte flips and
  * byte-value corruptions per codec.
  */
class CodecFuzzSpec extends SparkSpec {

  private def fixtures: Seq[(String, Array[Byte], Array[Byte] => Any)] = {
    val png = {
      val pix = Array.tabulate(4 * 3 * 3)(i => (i * 7 % 256).toByte)
      Multimodal.pngEncode(Multimodal.PngImage(4, 3, 3, pix), _ % 5,
        new java.util.zip.Deflater())
    }
    val jpgB = Jpeg.jpegEncode(8, 8, Seq((1, 1)),
      Seq(Array.fill(64)(1)), (_, _, _) => Array.fill(64)(3))
    val jpgP = Jpeg.jpegEncodeProgressive(8, 8, Seq((1, 1)),
      Seq(Array.fill(64)(1)), (_, _, _) => Array.fill(64)(3))
    val gif = Gif.gifEncode(4, 4, Array(0x000000, 0xffffff, 0xff0000,
      0x00ff00), Seq((Array.tabulate(16)(_ % 4), false)))
    val avi = VideoAvi.aviEncode(4, 2, 2,
      (f, x, y) => (f * 50 % 256, x * 80 % 256, y * 90 % 256))
    val aviMjpeg = VideoAvi.aviEncodeMjpeg(8, 8, (0 until 2).map(f =>
      Jpeg.jpegEncode(8, 8, Seq((1, 1), (1, 1), (1, 1)),
        Seq(Array.fill(64)(8), Array.fill(64)(8), Array.fill(64)(8)),
        (c, _, _) => { val a = new Array[Int](64); a(0) = c + f; a })))
    val mp4 = VideoMp4.mp4Encode(4, 2, 3, 10,
      (f, x, y) => (f * 50 % 256, x * 80 % 256, y * 90 % 256))
    Seq(
      ("png", png,
        b => Multimodal.pngDecode(b, new java.util.zip.Inflater())),
      ("jpeg_baseline", jpgB, b => Jpeg.jpegDecode(b)),
      ("jpeg_progressive", jpgP, b => Jpeg.jpegDecode(b)),
      ("gif", gif, b => Gif.gifDecode(b)),
      ("avi", avi, b => VideoAvi.aviDecode(b, 1)),
      ("avi_mjpeg", aviMjpeg, b => VideoAvi.aviDecode(b, 1)),
      ("mp4", mp4, b => VideoMp4.mp4Decode(b, 1)),
      ("wav_header", avi, b => Multimodal.wavSamples(b)),
      ("adpcm", Multimodal.adpcmEncodeWav(
        Array.tabulate(150)(i => (i * 37 % 2003) - 1001), 8000, 36),
        b => Multimodal.anyWavSamples(b)),
      ("g711", {
        val n = 64
        val bb = java.nio.ByteBuffer.allocate(12 + 8 + 16 + 8 + n)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + 24 + 8 + n)
          .put("WAVE".getBytes("US-ASCII"))
        bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(0x0007).putShort(1).putInt(8000)
          .putInt(8000).putShort(1).putShort(8)
        bb.put("data".getBytes("US-ASCII")).putInt(n)
        for (j <- 0 until n) bb.put(((j * 13 + 7) % 256).toByte)
        bb.array()
      }, b => Multimodal.anyWavSamples(b)),
      ("tiff", Tiff.encode(Tiff.TiffImage(5, 4, 3,
        Array.tabulate(60)(i => (i * 37 % 256).toByte)), 2, packBits = true),
        b => Tiff.decode(b)),
      ("header", png, b => Multimodal.decodeHeader(b)))
  }

  test("every truncation of every valid file decodes without throwing") {
    for ((name, bytes, dec) <- fixtures; len <- 0 to bytes.length) {
      try dec(bytes.take(len))
      catch { case e: Exception =>
        fail(s"$name threw on truncation to $len: $e")
      }
    }
  }

  test("seeded byte corruptions decode without throwing") {
    var lcg = 0x2545F4914F6CDD1DL
    def next(bound: Int): Int = {
      lcg = lcg * 6364136223846793005L + 1442695040888963407L
      (((lcg >>> 33) % bound + bound) % bound).toInt
    }
    for ((name, bytes, dec) <- fixtures; trial <- 0 until 400) {
      val s = bytes.clone()
      // corrupt 1-4 positions per trial
      val hits = 1 + next(4)
      for (_ <- 0 until hits) s(next(s.length)) = next(256).toByte
      try dec(s)
      catch { case e: Exception =>
        fail(s"$name threw on corruption trial $trial: $e")
      }
    }
  }

  test("size-field bombs: every 4-byte window maxed out decodes without ballooning") {
    // sliding 0xFFFFFFFF over the whole file hits every length /
    // dimension / count field with its maximum value — without the
    // decoders' decompression-bomb caps this test dies on a
    // multi-GB allocation (OutOfMemoryError aborts the suite; it is
    // an Error, so the null-on-corrupt catch can't save it)
    for ((name, bytes, dec) <- fixtures; off <- 0 until bytes.length) {
      val s = bytes.clone()
      var i = 0
      while (i < 4 && off + i < s.length) { s(off + i) = 0xFF.toByte; i += 1 }
      try dec(s)
      catch { case e: Exception =>
        fail(s"$name threw with max bytes at $off: $e")
      }
    }
  }
}
