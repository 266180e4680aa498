package graft.operators

import graft.SparkSpec

class GifSpec extends SparkSpec {

  private def noise(n: Int, mod: Int, seed: Long): Array[Int] =
    Array.tabulate(n)(i => (((i + 1) * (seed * 2 + 1) + i / 7) % mod).toInt)

  private def pal(n: Int): Array[Int] =
    Array.tabulate(n)(i => ((i * 37 % 256) << 16) | ((i * 59 % 256) << 8)
      | (i * 83 % 256))

  test("LZW round-trips with dictionary growth across width boundaries") {
    // 16k symbols over a 256-symbol alphabet: the dictionary crosses
    // every width 9→12 and hits the 4096 clear at least once
    val data = noise(16384, 256, 42L)
    val enc = Gif.lzwEncode(data, 8)
    assert(enc.length < data.length) // it actually compresses
    assert(Gif.lzwDecode(enc, 8, data.length).toSeq === data.toSeq)
    // small alphabet too (minCodeSize 2)
    val d2 = noise(5000, 4, 7L)
    assert(Gif.lzwDecode(Gif.lzwEncode(d2, 2), 2, d2.length).toSeq
      === d2.toSeq)
  }

  test("LZW rejects truncation and garbage instead of inventing pixels") {
    val data = noise(500, 16, 3L)
    val enc = Gif.lzwEncode(data, 4)
    for (cut <- Seq(0, 1, enc.length / 2, enc.length - 1))
      assert(Gif.lzwDecode(enc.take(cut), 4, data.length) == null, s"cut=$cut")
    // wrong expected length
    assert(Gif.lzwDecode(enc, 4, data.length - 1) == null)
    assert(Gif.lzwDecode(enc, 4, data.length + 1) == null)
  }

  test("gif round-trips pixels, non-interlaced and interlaced") {
    val (w, h) = (11, 9) // non-multiples of the pass steps
    val idx = noise(w * h, 16, 5L)
    for (interlaced <- Seq(false, true)) {
      val bytes = Gif.gifEncode(w, h, pal(16), Seq((idx, interlaced)))
      val img = Gif.gifDecode(bytes)
      assert(img != null, s"interlaced=$interlaced")
      assert(img.width === w && img.height === h && img.nFrames === 1)
      val expected = idx.flatMap { i =>
        val c = pal(16)(i)
        Seq((c >> 16).toByte, (c >> 8).toByte, c.toByte)
      }
      assert(img.pixels.toSeq === expected.toSeq, s"interlaced=$interlaced")
    }
  }

  test("multi-frame streams decode frame 1 and count the rest") {
    val (w, h) = (6, 4)
    val f1 = noise(w * h, 8, 1L)
    val f2 = noise(w * h, 8, 2L)
    val f3 = noise(w * h, 8, 3L)
    val img = Gif.gifDecode(Gif.gifEncode(w, h, pal(8),
      Seq((f1, false), (f2, true), (f3, false))))
    assert(img != null && img.nFrames === 3)
    val c0 = pal(8)(f1(0))
    assert((img.pixels(0) & 0xff) === (c0 >> 16))
  }

  test("truncation at every byte prefix yields null, never garbage") {
    val bytes = Gif.gifEncode(5, 3, pal(4), Seq((noise(15, 4, 9L), false)))
    for (cut <- 0 until bytes.length)
      assert(Gif.gifDecode(bytes.take(cut)) == null, s"cut=$cut")
    assert(Gif.gifDecode(bytes) != null)
  }

  test("structural corruption rejects: signature, color table, indices") {
    val ok = Gif.gifEncode(4, 4, pal(4), Seq((noise(16, 4, 11L), false)))
    val badSig = ok.clone(); badSig(0) = 'X'.toByte
    assert(Gif.gifDecode(badSig) == null)
    // drop the GCT flag: first frame then has no palette at all
    val noGct = ok.clone()
    noGct(10) = (noGct(10) & 0x7f).toByte
    // (table bytes are still in the stream, so the parse desyncs or
    // the frame sees pal==null — either way: null, not garbage)
    assert(Gif.gifDecode(noGct) == null)
  }

  test("gifFeatures yields null row for corrupt payloads") {
    import spark.implicits._
    import org.apache.spark.sql.{Encoders, Row}
    val good = Gif.gifEncode(3, 2, pal(4), Seq((noise(6, 4, 13L), false)))
    val rows = Seq(Row(1L, good, "image/gif"),
      Row(2L, Array[Byte](1, 2, 3), "image/gif"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      Multimodal.mediaSchema)
    val out = Gif.gifFeatures(df).collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out === Map(1L -> false, 2L -> true))
  }
}
