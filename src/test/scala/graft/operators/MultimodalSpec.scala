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

  test("decodeFeatures: unknown payloads zero out, schema stable") {
    val out = Multimodal.decodeFeatures(media).orderBy("media_id").collect()
    assert(out.length === 3)
    assert(out(0).getInt(out(0).fieldIndex("byte_len")) === 37)
    // text bytes are no known container — all dims zero
    assert((3 to 5).forall(i => out(0).getInt(i) === 0))
    // null payload → zeroed features
    assert(out(2).getInt(out(2).fieldIndex("byte_len")) === 0)
  }

  private def hexBytes(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("decodeHeader parses PNG / BMP / WAV headers from real bytes") {
    // PNG 640x480 RGBA (color type 6 -> 4 channels), big-endian dims
    val png = hexBytes("89504E470D0A1A0A" + "0000000D" + "49484452" +
      "00000280" + "000001E0" + "0806000000" + "00000000")
    assert(Multimodal.decodeHeader(png) === ((640, 480, 4)))
    // BMP 800x600 24bpp, little-endian dims; negative height = top-down
    val bmp = hexBytes("424D" + "36000000" + "00000000" + "36000000" +
      "28000000" + "20030000" + "58020000" + "0100" + "1800" + "00" * 24)
    assert(Multimodal.decodeHeader(bmp) === ((800, 600, 3)))
    val bmpTopDown = bmp.clone()
    // height -600 LE at offset 22
    val neg = Array(0xA8, 0xFD, 0xFF, 0xFF).map(_.toByte)
    System.arraycopy(neg, 0, bmpTopDown, 22, 4)
    assert(Multimodal.decodeHeader(bmpTopDown) === ((800, 600, 3)))
    // WAV stereo 44100 Hz 16-bit: (rate, bits, channels)
    val wav = hexBytes("52494646" + "24000000" + "57415645" + "666D7420" +
      "10000000" + "0100" + "0200" + "44AC0000" + "10B10200" + "0400" +
      "1000" + "64617461" + "00000000")
    assert(Multimodal.decodeHeader(wav) === ((44100, 16, 2)))
    // truncated / garbage / null
    assert(Multimodal.decodeHeader(png.take(10)) === ((0, 0, 0)))
    assert(Multimodal.decodeHeader("not media".getBytes) === ((0, 0, 0)))
    assert(Multimodal.decodeHeader(null) === ((0, 0, 0)))
  }

  test("resizeBmp24: nearest-neighbor with odd-width row padding") {
    // 4x2 gradient BMP, rows padded 12 -> 12 (no pad); pixel r = 10x+y
    def px(x: Int, y: Int) = (10 * x + y, 100 + x, 200 + y)
    val w = 4; val h = 2
    val rowSize = ((3 * w + 3) / 4) * 4
    val src = new Array[Byte](54 + rowSize * h)
    src(0) = 'B'; src(1) = 'M'
    def putLe32(o: Int, v: Int): Unit = (0 until 4).foreach(i =>
      src(o + i) = (v >> (8 * i)).toByte)
    putLe32(2, src.length); putLe32(10, 54); putLe32(14, 40)
    putLe32(18, w); putLe32(22, h); src(26) = 1; src(28) = 24
    for (y <- 0 until h; x <- 0 until w) {
      val p = 54 + (h - 1 - y) * rowSize + x * 3
      val (r, g, b) = px(x, y)
      src(p) = b.toByte; src(p + 1) = g.toByte; src(p + 2) = r.toByte
    }
    // identity resize round-trips every pixel
    val same = Multimodal.resizeBmp24(src, w, h)
    for (y <- 0 until h; x <- 0 until w)
      assert(Multimodal.bmpPixel(same, x, y) === px(x, y))
    // odd output width (3): rows pad 9 -> 12; src x = x*4/3 = 0,1,2
    val odd = Multimodal.resizeBmp24(src, 3, 1)
    assert(Multimodal.decodeHeader(odd) === ((3, 1, 3)))
    for (x <- 0 until 3)
      assert(Multimodal.bmpPixel(odd, x, 0) === px(x * 4 / 3, 0))
    // upscale 8x4 repeats source pixels
    val up = Multimodal.resizeBmp24(src, 8, 4)
    assert(Multimodal.bmpPixel(up, 7, 3) === px(3, 1))
    assert(Multimodal.bmpPixel(up, 1, 1) === px(0, 0))
  }

  test("wavSamples decodes signed 16-bit PCM; rejects non-canonical input") {
    // mono 16-bit wav with samples [1, -1, 300, -32768]
    val wav = hexBytes("52494646" + "2C000000" + "57415645" + "666D7420" +
      "10000000" + "0100" + "0100" + "401F0000" + "803E0000" + "0200" +
      "1000" + "64617461" + "08000000" +
      "0100" + "FFFF" + "2C01" + "0080")
    assert(Multimodal.wavSamples(wav).toSeq === Seq(1, -1, 300, -32768))
    assert(Multimodal.wavSamples(null).isEmpty)
    assert(Multimodal.wavSamples("RIFFjunk".getBytes).isEmpty)
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
