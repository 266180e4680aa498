package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Baseline TIFF 6.0 codec — the archival sibling of the PNG/JPEG/GIF
  * lane: 8-bit grayscale and RGB, strip-organized, Compression 1
  * (none) and 32773 (PackBits), both byte orders on read ("II" and
  * "MM"), "II" on write. Pure JVM, zero dependencies — the per-row
  * decode shape multimodal pipelines run inside a partition map.
  *
  * Scope is the honest baseline-TIFF subset (the FIXTURES.md codec
  * discipline): single image (first IFD), 8 bits/sample, no planar
  * separation, no tiles, no predictor. Anything outside — including
  * LZW/JPEG-in-TIFF — decodes to null (loud skip), never a wrong
  * image.
  *
  * Bomb guard: dimensions are capped before any allocation — a forged
  * IFD claiming 2³⁰ pixels fails the cap, it does not OOM an
  * executor.
  */
object Tiff {

  final case class TiffImage(width: Int, height: Int, channels: Int,
      pixels: Array[Byte])

  val MAX_DIM = 1 << 14
  val MAX_PIXELS = 1 << 24 // bytes, post-cap allocation bound

  private val T_WIDTH = 256
  private val T_HEIGHT = 257
  private val T_BPS = 258
  private val T_COMPRESSION = 259
  private val T_PHOTOMETRIC = 262
  private val T_STRIP_OFFSETS = 273
  private val T_SPP = 277
  private val T_ROWS_PER_STRIP = 278
  private val T_STRIP_COUNTS = 279

  // ---------------------------------------------------------------- encode

  /** Little-endian baseline TIFF: grayscale (channels 1) or RGB (3),
    * `rowsPerStrip` rows per strip (last strip short), PackBits when
    * `packBits`. Layout: 8-byte header | strip data | overflow value
    * arrays | IFD.
    */
  def encode(img: TiffImage, rowsPerStrip: Int, packBits: Boolean)
      : Array[Byte] = {
    require(img.channels == 1 || img.channels == 3,
      s"channels ${img.channels} not in {1, 3}")
    require(img.pixels.length == img.width * img.height * img.channels,
      "pixel buffer does not match dimensions")
    require(rowsPerStrip >= 1)
    val rowBytes = img.width * img.channels
    val nStrips = (img.height + rowsPerStrip - 1) / rowsPerStrip
    val strips = (0 until nStrips).map { s =>
      val r0 = s * rowsPerStrip
      val rows = math.min(rowsPerStrip, img.height - r0)
      val raw = java.util.Arrays.copyOfRange(img.pixels,
        r0 * rowBytes, (r0 + rows) * rowBytes)
      if (packBits) packBitsEncode(raw) else raw
    }
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def w32(v: Long): Unit = { w8(v.toInt); w8((v >> 8).toInt)
      w8((v >> 16).toInt); w8((v >> 24).toInt) }
    // header
    w8('I'); w8('I'); w16(42)
    val dataStart = 8L
    val stripOffsets = strips.scanLeft(dataStart)(_ + _.length).init
    val afterData = dataStart + strips.map(_.length.toLong).sum
    // overflow arrays: bps (RGB only), strip offsets/counts if > 1
    var cursor = afterData
    val bpsOff = if (img.channels == 3) { val o = cursor; cursor += 6; o }
      else 0L
    val soOff = if (nStrips > 1) { val o = cursor; cursor += 4L * nStrips; o }
      else 0L
    val scOff = if (nStrips > 1) { val o = cursor; cursor += 4L * nStrips; o }
      else 0L
    val ifdOff = cursor
    w32(ifdOff)
    strips.foreach(out.write)
    if (img.channels == 3) { w16(8); w16(8); w16(8) }
    if (nStrips > 1) { stripOffsets.foreach(w32); strips.foreach(s => w32(s.length.toLong)) }
    // IFD: 9 entries, ascending tag order (TIFF requirement)
    w16(9)
    def entry(tag: Int, typ: Int, count: Long, value: Long): Unit = {
      w16(tag); w16(typ); w32(count); w32(value)
    }
    entry(T_WIDTH, 4, 1, img.width.toLong)
    entry(T_HEIGHT, 4, 1, img.height.toLong)
    if (img.channels == 3) entry(T_BPS, 3, 3, bpsOff)
    else entry(T_BPS, 3, 1, 8)
    entry(T_COMPRESSION, 3, 1, if (packBits) 32773 else 1)
    entry(T_PHOTOMETRIC, 3, 1, if (img.channels == 3) 2 else 1)
    if (nStrips > 1) entry(T_STRIP_OFFSETS, 4, nStrips.toLong, soOff)
    else entry(T_STRIP_OFFSETS, 4, 1, stripOffsets.head)
    entry(T_SPP, 3, 1, img.channels.toLong)
    entry(T_ROWS_PER_STRIP, 4, 1, rowsPerStrip.toLong)
    if (nStrips > 1) entry(T_STRIP_COUNTS, 4, nStrips.toLong, scOff)
    else entry(T_STRIP_COUNTS, 4, 1, strips.head.length.toLong)
    w32(0) // no next IFD
    out.toByteArray
  }

  /** PackBits (pinned algorithm): runs of ≥ 3 identical bytes become
    * run packets, everything else literal packets, both capped at
    * 128. Never emits the reserved −128 no-op. */
  def packBitsEncode(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < raw.length) {
      var run = 1
      while (i + run < raw.length && raw(i + run) == raw(i) && run < 128)
        run += 1
      if (run >= 3) {
        out.write(1 - run) // -(run-1)
        out.write(raw(i))
        i += run
      } else {
        // literal: extend until a ≥3 run starts or 128 reached
        var j = i + 1
        var lit = 1
        var break = false
        while (!break && j < raw.length && lit < 128) {
          var r = 1
          while (j + r < raw.length && raw(j + r) == raw(j) && r < 3) r += 1
          if (r >= 3) break = true
          else { j += 1; lit += 1 }
        }
        out.write(lit - 1)
        out.write(raw, i, lit)
        i += lit
      }
    }
    out.toByteArray
  }

  def packBitsDecode(data: Array[Byte], from: Int, len: Int,
      expect: Int): Array[Byte] = {
    val out = new Array[Byte](expect)
    var i = from; var o = 0
    val end = from + len
    while (i < end && o < expect) {
      val n = data(i); i += 1
      if (n >= 0) {
        val c = n + 1
        if (i + c > end || o + c > expect) return null
        System.arraycopy(data, i, out, o, c); i += c; o += c
      } else if (n != -128) {
        val c = 1 - n
        if (i >= end || o + c > expect) return null
        java.util.Arrays.fill(out, o, o + c, data(i)); i += 1; o += c
      } // -128: no-op
    }
    if (o != expect) null else out
  }

  // ---------------------------------------------------------------- decode

  /** Decodes baseline 8-bit gray/RGB strip TIFF (either byte order);
    * null on anything outside the supported subset or any structural
    * inconsistency. */
  def decode(bytes: Array[Byte]): TiffImage = {
    try decodeOrThrow(bytes)
    catch { case _: Exception => null }
  }

  private def decodeOrThrow(bytes: Array[Byte]): TiffImage = {
    if (bytes == null || bytes.length < 8) return null
    val le = (bytes(0), bytes(1)) match {
      case ('I', 'I') => true
      case ('M', 'M') => false
      case _ => return null
    }
    def u16(off: Int): Int =
      if (le) (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
      else ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
    def u32(off: Int): Long =
      if (le) (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
      else ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
    if (u16(2) != 42) return null
    val ifd = u32(4).toInt
    if (ifd < 8 || ifd + 2 > bytes.length) return null
    val n = u16(ifd)
    // tag -> (type, count, valueOffsetPos)
    var width = -1L; var height = -1L; var comp = 1L; var spp = 1L
    var rps = Long.MaxValue; var bpsOk = true; var photo = -1L
    var soType = 0; var soCount = 0L; var soPos = 0
    var scType = 0; var scCount = 0L; var scPos = 0
    var e = 0
    while (e < n) {
      val off = ifd + 2 + e * 12
      if (off + 12 > bytes.length) return null
      val tag = u16(off); val typ = u16(off + 2)
      val count = u32(off + 4); val vpos = off + 8
      def inlineVal: Long =
        if (typ == 3) u16(vpos).toLong else u32(vpos)
      tag match {
        case T_WIDTH => width = inlineVal
        case T_HEIGHT => height = inlineVal
        case T_COMPRESSION => comp = inlineVal
        case T_SPP => spp = inlineVal
        case T_ROWS_PER_STRIP => rps = inlineVal
        case T_BPS =>
          // every sample must be 8 bits
          if (count == 1) bpsOk = inlineVal == 8
          else {
            val sz = if (typ == 3) 2 else 4
            val arrOff =
              if (count * sz <= 4) vpos else u32(vpos).toInt
            var k = 0L
            while (k < count && bpsOk) {
              val v = if (typ == 3) u16((arrOff + k * sz).toInt).toLong
                else u32((arrOff + k * sz).toInt)
              bpsOk = v == 8
              k += 1
            }
          }
        case T_STRIP_OFFSETS => soType = typ; soCount = count; soPos = vpos
        case T_STRIP_COUNTS => scType = typ; scCount = count; scPos = vpos
        case T_PHOTOMETRIC => photo = inlineVal
        case _ => () // remaining tags don't affect the pixel bytes
      }
      e += 1
    }
    if (width <= 0 || height <= 0 || width > MAX_DIM || height > MAX_DIM)
      return null
    if (spp != 1 && spp != 3) return null
    // Only min-is-black gray (1) and RGB (2) have the raw-sample
    // semantics this decoder emits; a WhiteIsZero (0) or palette (3)
    // file would decode to a semantically inverted/wrong image, so it
    // must loud-skip to null, never return wrong pixels. The tag is
    // required by the spec and photometric must agree with spp.
    if (spp == 1 && photo != 1L) return null
    if (spp == 3 && photo != 2L) return null
    if (!bpsOk) return null
    if (comp != 1 && comp != 32773) return null
    if (width * height * spp > MAX_PIXELS) return null
    if (soCount <= 0 || soCount != scCount) return null
    def arr(typ: Int, count: Long, vpos: Int): Array[Long] = {
      val sz = if (typ == 3) 2 else 4
      val base = if (count * sz <= 4) vpos else u32(vpos).toInt
      Array.tabulate(count.toInt) { k =>
        if (typ == 3) u16(base + k * sz).toLong else u32(base + k * sz)
      }
    }
    val offs = arr(soType, soCount, soPos)
    val cnts = arr(scType, scCount, scPos)
    val w = width.toInt; val h = height.toInt; val c = spp.toInt
    val rowBytes = w * c
    val rpsI = if (rps > h) h else rps.toInt
    if (rpsI < 1) return null
    val expStrips = (h + rpsI - 1) / rpsI
    if (expStrips != offs.length) return null
    val pixels = new Array[Byte](w * h * c)
    var s = 0
    while (s < offs.length) {
      val rows = math.min(rpsI, h - s * rpsI)
      val expect = rows * rowBytes
      val from = offs(s).toInt; val len = cnts(s).toInt
      if (from < 0 || len < 0 || from + len > bytes.length) return null
      val raw =
        if (comp == 1) {
          if (len != expect) return null
          java.util.Arrays.copyOfRange(bytes, from, from + len)
        } else packBitsDecode(bytes, from, len, expect)
      if (raw == null) return null
      System.arraycopy(raw, 0, pixels, s * rpsI * rowBytes, expect)
      s += 1
    }
    TiffImage(w, h, c, pixels)
  }

  // ---------------------------------------------------------------- features

  val tiffSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("p_first", IntegerType),
    StructField("p_last", IntegerType),
    StructField("psum", LongType)))

  /** Per-row decode + pixel features (q89's shape): first/last sample
    * and the exact byte sum — null row on any unsupported/corrupt
    * input. */
  def tiffFeatures(media: DataFrame): DataFrame = {
    val enc = Encoders.row(tiffSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val img = decode(r.getAs[Array[Byte]](1))
          if (img == null) Row(r.getLong(0), null, null, null, null, null, null)
          else {
            var sum = 0L
            var i = 0
            while (i < img.pixels.length) { sum += img.pixels(i) & 0xff; i += 1 }
            Row(r.getLong(0), img.width, img.height, img.channels,
              img.pixels(0) & 0xff, img.pixels(img.pixels.length - 1) & 0xff,
              sum)
          }
        }
      }(enc)
  }
}
