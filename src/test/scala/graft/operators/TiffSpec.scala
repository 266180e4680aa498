package graft.operators

import graft.SparkSpec
import graft.operators.Tiff.TiffImage

/** Baseline-TIFF codec contract: lossless round-trips across
  * channels × compression × strip layouts, PackBits hand vectors,
  * big-endian reads, and loud-null on everything outside the subset.
  */
class TiffSpec extends SparkSpec {

  private def img(w: Int, h: Int, c: Int): TiffImage = {
    val px = Array.tabulate(w * h * c)(i => ((i * 37 + 11) % 256).toByte)
    TiffImage(w, h, c, px)
  }

  test("round-trip: gray/RGB x none/PackBits x strip layouts") {
    for {
      c <- Seq(1, 3)
      pb <- Seq(false, true)
      rps <- Seq(2, 5, 100) // divides h, doesn't, single-strip
    } {
      val im = img(7, 6, c)
      val got = Tiff.decode(Tiff.encode(im, rps, pb))
      assert(got != null, s"c=$c pb=$pb rps=$rps decoded null")
      assert(got.width === 7 && got.height === 6 && got.channels === c)
      assert(got.pixels.toSeq === im.pixels.toSeq,
        s"pixels diverged at c=$c pb=$pb rps=$rps")
    }
  }

  test("PackBits hand vectors: runs, literals, cap, -128 no-op") {
    // run of 4 'A'
    assert(Tiff.packBitsEncode(Array.fill(4)('A'.toByte)).toSeq ===
      Seq((-3).toByte, 'A'.toByte))
    // pure literal
    assert(Tiff.packBitsEncode(Array[Byte](1, 2, 3)).toSeq ===
      Seq(2.toByte, 1.toByte, 2.toByte, 3.toByte))
    // 130-byte run splits at 128
    val long = Array.fill(130)(7.toByte)
    val enc = Tiff.packBitsEncode(long)
    assert(Tiff.packBitsDecode(enc, 0, enc.length, 130).toSeq === long.toSeq)
    // decoder skips the reserved -128
    val withNoop = Array[Byte](-128, 0, 'x')
    assert(Tiff.packBitsDecode(withNoop, 0, 3, 1).toSeq === Seq('x'.toByte))
    // truncated stream -> null, never partial garbage
    assert(Tiff.packBitsDecode(Array[Byte](3, 1, 2), 0, 3, 4) == null)
  }

  test("big-endian (MM) files decode identically") {
    // hand-build a 2x1 gray MM file, single strip, uncompressed
    val px = Array[Byte](10, 20)
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def w32(v: Int): Unit = { w8(v >> 24); w8(v >> 16); w8(v >> 8); w8(v) }
    w8('M'); w8('M'); w16(42); w32(12) // IFD at 12
    out.write(px); w16(0)              // pixels at 8-9, pad 10-11
    // IFD at 12
    w16(8)
    def e(tag: Int, typ: Int, cnt: Int, v: Int): Unit = {
      w16(tag); w16(typ); w32(cnt)
      if (typ == 3) { w16(v); w16(0) } else w32(v)
    }
    e(256, 4, 1, 2); e(257, 4, 1, 1); e(258, 3, 1, 8)
    e(259, 3, 1, 1); e(262, 3, 1, 1)
    e(273, 4, 1, 8); e(277, 3, 1, 1); e(279, 4, 1, 2)
    w32(0)
    val got = Tiff.decode(out.toByteArray)
    assert(got != null && got.width === 2 && got.height === 1)
    assert(got.pixels.toSeq === px.toSeq)
  }

  test("loud null outside the subset: bad magic, LZW, bomb dims, truncation") {
    val good = Tiff.encode(img(4, 4, 1), 2, packBits = false)
    assert(Tiff.decode("nota tiff".getBytes) == null)
    assert(Tiff.decode(good.dropRight(6)) == null)
    // flip compression tag to LZW (5): find the 259 entry and patch
    val lzw = good.clone()
    var off = -1
    val ifd = (lzw(4) & 0xff) | ((lzw(5) & 0xff) << 8)
    val n = (lzw(ifd) & 0xff) | ((lzw(ifd + 1) & 0xff) << 8)
    for (k <- 0 until n) {
      val o = ifd + 2 + k * 12
      if (((lzw(o) & 0xff) | ((lzw(o + 1) & 0xff) << 8)) == 259) off = o
    }
    assert(off > 0)
    lzw(off + 8) = 5
    assert(Tiff.decode(lzw) == null)
    // bomb: claim 2^20 x 2^20
    val bomb = good.clone()
    for (k <- 0 until n) {
      val o = ifd + 2 + k * 12
      val tag = (bomb(o) & 0xff) | ((bomb(o + 1) & 0xff) << 8)
      if (tag == 256 || tag == 257) {
        bomb(o + 8) = 0; bomb(o + 9) = 0; bomb(o + 10) = 16; bomb(o + 11) = 0
      }
    }
    assert(Tiff.decode(bomb) == null)
    // WhiteIsZero (photometric 0): samples mean the INVERSE of what
    // this decoder emits — must loud-skip to null, never return a
    // semantically inverted image.
    val wiz = good.clone()
    for (k <- 0 until n) {
      val o = ifd + 2 + k * 12
      if (((wiz(o) & 0xff) | ((wiz(o + 1) & 0xff) << 8)) == 262)
        wiz(o + 8) = 0
    }
    assert(Tiff.decode(wiz) == null, "WhiteIsZero decoded instead of null")
    // palette (3) likewise
    val pal = good.clone()
    for (k <- 0 until n) {
      val o = ifd + 2 + k * 12
      if (((pal(o) & 0xff) | ((pal(o + 1) & 0xff) << 8)) == 262)
        pal(o + 8) = 3
    }
    assert(Tiff.decode(pal) == null, "palette decoded instead of null")
  }

  test("tiffFeatures: exact first/last/sum over a DataFrame of media rows") {
    import org.apache.spark.sql.{Encoders, Row}
    val im = img(5, 4, 3)
    val bytes = Tiff.encode(im, 3, packBits = true)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("media_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, bytes), Row(2L, "junk".getBytes)),
      schema)
    val got = Tiff.tiffFeatures(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    val ok = got(1L)
    assert(ok.getInt(1) === 5 && ok.getInt(2) === 4 && ok.getInt(3) === 3)
    assert(ok.getInt(4) === (im.pixels(0) & 0xff))
    assert(ok.getInt(5) === (im.pixels.last & 0xff))
    assert(ok.getLong(6) === im.pixels.map(_ & 0xff).map(_.toLong).sum)
    assert(got(2L).isNullAt(1))
  }
}
