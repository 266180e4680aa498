package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** Baseline JFIF (JPEG) codec — the remaining real-corpus media
  * format next to Multimodal's PNG/BMP/WAV (SCALE.md documented the
  * gap). Pure JVM, no codec libraries: marker parse → canonical
  * huffman decode (with 0xFF00 byte-stuffing and RSTn restarts) →
  * dequantization → separable double-precision IDCT → level shift →
  * chroma upsampling (pixel replication, the baseline rule for
  * h/v factors 1 and 2) → JFIF YCbCr→RGB.
  *
  * Supported: SOF0 baseline sequential DCT and SOF2 PROGRESSIVE
  * (all four Annex-G scan classes: DC/AC first + successive-
  * approximation refinement, EOB runs, non-interleaved AC scan
  * geometry, tables redefinable between scans), 8-bit precision,
  * 1 or 3 components, sampling factors 1–2 (4:4:4, 4:2:2, 4:2:0),
  * DRI/RSTn. Rejected with a null decode (the
  * [[Multimodal.pngDecode]] convention — corrupted payloads yield a
  * null-stats row, never garbage pixels): extended/lossless SOFs,
  * 12-bit, arithmetic coding, truncated streams, huffman overruns,
  * bad marker structure.
  *
  * Cross-engine exactness: every arithmetic step after the IDCT is
  * integer or literal-double IEEE ops (multiply/add/floor — no libm),
  * so an oracle can reproduce decoded pixels closed-form when the
  * DCT itself is exact. q118 synthesizes DC-only blocks under a flat
  * quant table (Q=8), where IDCT(dc·8)/8 = dc to 1 ulp and the
  * half-up rounding absorbs it: pixel = 128 + dc exactly, and the
  * YCbCr→RGB doubles match DuckDB literal-for-literal. JpegSpec
  * exercises the general paths (AC coefficients, 4:2:0, restarts)
  * in-JVM against a naive direct-IDCT reference.
  *
  * Scale shape: decode is embarrassingly row-parallel; the encoder/
  * decoder pair is instantiated per PARTITION (zero shared state —
  * the codec objects are just tables), the same codec-init
  * discipline as the PNG Inflater/Deflater reuse.
  */
object Jpeg {

  final case class JpegImage(width: Int, height: Int, channels: Int,
      pixels: Array[Byte])

  /** Zigzag index → natural (row-major) index, generated from the
    * diagonal-walk rule (even diagonals run bottom-left→top-right).
    */
  val ZIGZAG: Array[Int] = {
    val out = new Array[Int](64)
    var i = 0
    for (s <- 0 until 15) {
      val diag = (0 to s).flatMap { a =>
        val (row, col) = (a, s - a)
        if (row < 8 && col < 8) Some((row, col)) else None
      }
      val walk = if (s % 2 == 0) diag.reverse else diag
      for ((row, col) <- walk) { out(i) = row * 8 + col; i += 1 }
    }
    out
  }

  // ------------------------------------------------------------------
  // Canonical huffman tables
  // ------------------------------------------------------------------

  /** Canonical huffman table: JPEG DHT layout (count of codes per
    * length 1..16 + symbol values in code order) with the derived
    * per-length first-code/first-index arrays for O(1)-per-length
    * decoding and a symbol→(code,len) map for encoding.
    */
  final class HuffTable(val bits: Array[Int], val vals: Array[Int]) {
    require(bits.length == 16 && bits.sum == vals.length)
    // canonical assignment: ascending length, then DHT value order
    val (minCode, maxCode, valPtr) = {
      val mn = new Array[Int](17); val mx = new Array[Int](17)
      val vp = new Array[Int](17)
      var code = 0; var k = 0
      for (l <- 1 to 16) {
        mn(l) = code; vp(l) = k
        code += bits(l - 1); k += bits(l - 1)
        mx(l) = code - 1 // -1 when no codes at this length
        code <<= 1
      }
      (mn, mx, vp)
    }
    val encodeMap: Map[Int, (Int, Int)] = {
      var code = 0; var k = 0
      val m = Map.newBuilder[Int, (Int, Int)]
      for (l <- 1 to 16) {
        for (_ <- 0 until bits(l - 1)) { m += vals(k) -> (code, l); code += 1; k += 1 }
        code <<= 1
      }
      m.result()
    }
  }

  /** The codec's own tables (emitted in DHT, so any conformant
    * decoder reads them): 12 DC categories at 5 bits, the full
    * baseline AC alphabet (EOB, ZRL, 16 runs × 10 sizes = 162
    * symbols) at 9 bits — canonical, prefix-free, max-length
    * all-ones code unused.
    */
  val DC_TABLE: HuffTable = {
    val bits = new Array[Int](16); bits(4) = 12
    new HuffTable(bits, (0 until 12).toArray)
  }
  val AC_TABLE: HuffTable = {
    val bits = new Array[Int](16); bits(8) = 162
    val syms = (0x00 +: 0xF0 +: (for {
      r <- 0 until 16; sz <- 1 to 10
    } yield (r << 4) | sz)).toArray.sorted
    new HuffTable(bits, syms)
  }

  // ------------------------------------------------------------------
  // IDCT (separable, double)
  // ------------------------------------------------------------------

  private val COS = Array.tabulate(8, 8)((x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16))
  private val ALPHA = Array.tabulate(8)(u =>
    if (u == 0) math.sqrt(0.125) else 0.5)

  /** coef: 64 DEQUANTIZED values in natural order (row = vertical
    * frequency). Output: 64 clamped 0..255 samples after +128 level
    * shift, half-up rounded (floor(x+0.5) — the same rounding the
    * oracles use everywhere).
    */
  def idctBlock(coef: Array[Double]): Array[Int] = {
    val tmp = new Array[Double](64) // t(v, x) = Σ_u α(u) F(v,u) cos_x(u)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0; var u = 0
        while (u < 8) { s += ALPHA(u) * coef(v * 8 + u) * COS(x)(u); u += 1 }
        tmp(v * 8 + x) = s; x += 1
      }
      v += 1
    }
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0; var vv = 0
        while (vv < 8) { s += ALPHA(vv) * tmp(vv * 8 + x) * COS(y)(vv); vv += 1 }
        val p = math.floor(s + 128.0 + 0.5).toInt
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // Encoder
  // ------------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0; private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1); nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { // pad with 1s per spec
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      out.write(acc)
      if (acc == 0xFF) out.write(0x00)
      acc = 0; nbits = 0
    }
  }

  private def bitLength(v: Int): Int = 32 - Integer.numberOfLeadingZeros(v)

  /** Encode a baseline JFIF stream from QUANTIZED coefficients.
    *
    * @param sampling per-component (h, v) factors (1 or 3 entries)
    * @param quant    per-component quant table, 64 NATURAL-order values
    *                 (emitted as DQT table id = component index)
    * @param coeffs   (compIdx, blockY, blockX) → 64 NATURAL-order
    *                 quantized coefficients; block coords run over the
    *                 component's padded block grid (mcusY·v × mcusX·h)
    */
  def jpegEncode(width: Int, height: Int, sampling: Seq[(Int, Int)],
      quant: Seq[Array[Int]],
      coeffs: (Int, Int, Int) => Array[Int]): Array[Byte] = {
    val ncomp = sampling.size
    require(ncomp == 1 || ncomp == 3, "1 or 3 components")
    require(quant.size == ncomp)
    val maxH = sampling.map(_._1).max; val maxV = sampling.map(_._2).max
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    marker(0xD8) // SOI
    marker(0xE0); be16(16) // APP0 JFIF
    out.write("JFIF".getBytes); out.write(0)
    out.write(1); out.write(1); out.write(0); be16(1); be16(1)
    out.write(0); out.write(0)
    for (c <- 0 until ncomp) { // DQT, one table per component
      marker(0xDB); be16(2 + 1 + 64)
      out.write(c) // pq=0 (8-bit), tq=c
      for (z <- 0 until 64) out.write(quant(c)(ZIGZAG(z)))
    }
    marker(0xC0); be16(8 + 3 * ncomp) // SOF0
    out.write(8); be16(height); be16(width); out.write(ncomp)
    for (c <- 0 until ncomp) {
      out.write(c + 1) // component id
      out.write((sampling(c)._1 << 4) | sampling(c)._2)
      out.write(c)
    }
    def dht(cls: Int, id: Int, t: HuffTable): Unit = {
      marker(0xC4); be16(2 + 1 + 16 + t.vals.length)
      out.write((cls << 4) | id)
      t.bits.foreach(out.write)
      t.vals.foreach(out.write)
    }
    dht(0, 0, DC_TABLE); dht(1, 0, AC_TABLE)
    if (ncomp == 3) { dht(0, 1, DC_TABLE); dht(1, 1, AC_TABLE) }
    marker(0xDA); be16(6 + 2 * ncomp) // SOS
    out.write(ncomp)
    for (c <- 0 until ncomp) {
      out.write(c + 1)
      val t = if (c == 0) 0 else 1
      out.write((t << 4) | t)
    }
    out.write(0); out.write(63); out.write(0)

    val bw = new BitWriter(out)
    def putSym(t: HuffTable, sym: Int): Unit = {
      val (code, len) = t.encodeMap(sym); bw.put(code, len)
    }
    def putExtend(v: Int, s: Int): Unit =
      if (s > 0) bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
    val pred = new Array[Int](ncomp)
    for (my <- 0 until mcusY; mx <- 0 until mcusX; c <- 0 until ncomp) {
      val (h, v) = sampling(c)
      val (dcT, acT) = (DC_TABLE, AC_TABLE)
      for (by <- 0 until v; bx <- 0 until h) {
        val blk = coeffs(c, my * v + by, mx * h + bx)
        require(blk.length == 64)
        val diff = blk(0) - pred(c); pred(c) = blk(0)
        val s = if (diff == 0) 0 else bitLength(math.abs(diff))
        putSym(dcT, s); putExtend(diff, s)
        // AC run-length over zigzag order
        var k = 1; var run = 0
        while (k < 64) {
          val v0 = blk(ZIGZAG(k))
          if (v0 == 0) run += 1
          else {
            while (run > 15) { putSym(acT, 0xF0); run -= 16 }
            val sz = bitLength(math.abs(v0))
            putSym(acT, (run << 4) | sz); putExtend(v0, sz)
            run = 0
          }
          k += 1
        }
        if (run > 0) putSym(acT, 0x00) // EOB
      }
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Decoder
  // ------------------------------------------------------------------

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0; private var nbits = 0
    var hitMarker = false
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= data.length) { hitMarker = true; return 0 }
        var b = data(pos) & 0xff; pos += 1
        if (b == 0xFF) {
          val next = if (pos < data.length) data(pos) & 0xff else -1
          if (next == 0x00) pos += 1 // stuffed
          else { hitMarker = true; pos -= 1; return 0 }
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Align to the next RSTn marker and consume it; resets state. */
    def restart(): Boolean = {
      nbits = 0
      while (pos + 1 < data.length &&
        !((data(pos) & 0xff) == 0xFF && (data(pos + 1) & 0xff) >= 0xD0 &&
          (data(pos + 1) & 0xff) <= 0xD7)) pos += 1
      if (pos + 1 >= data.length) false
      else { pos += 2; hitMarker = false; true }
    }
  }

  private def decodeHuff(br: BitReader, t: HuffTable): Int = {
    var code = 0; var l = 0
    while (l < 16) {
      code = (code << 1) | br.bit(); l += 1
      if (br.hitMarker) return -1
      if (t.bits(l - 1) > 0 && code <= t.maxCode(l))
        return t.vals(t.valPtr(l) + (code - t.minCode(l)))
    }
    -1
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Full baseline decode; null on any unsupported or corrupt input
    * (the pngDecode contract). Output pixels: interleaved RGB for 3
    * components, single-channel for grayscale.
    */
  def jpegDecode(bytes: Array[Byte]): JpegImage = {
    try decodeOrThrow(bytes)
    catch { case _: Exception => null }
  }

  private def decodeOrThrow(b: Array[Byte]): JpegImage = {
    def u8(p: Int) = b(p) & 0xff
    def u16(p: Int) = (u8(p) << 8) | u8(p + 1)
    if (b.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return null
    var pos = 2
    val qt = new Array[Array[Int]](4)
    val dcTab = new Array[HuffTable](4); val acTab = new Array[HuffTable](4)
    var width = 0; var height = 0
    var compId: Array[Int] = null; var compH: Array[Int] = null
    var compV: Array[Int] = null; var compQ: Array[Int] = null
    var restartInterval = 0
    var scanStart = -1
    var compDc: Array[Int] = null; var compAc: Array[Int] = null
    while (scanStart < 0) {
      if (pos + 4 > b.length || u8(pos) != 0xFF) return null
      val m = u8(pos + 1); pos += 2
      m match {
        case 0xD8 => // stray SOI
        case 0xDB =>
          val len = u16(pos); val end = pos + len; var p = pos + 2
          while (p < end) {
            val pq = u8(p) >> 4; val tq = u8(p) & 0x0f; p += 1
            if (pq != 0) return null // 16-bit tables unsupported
            val t = new Array[Int](64)
            for (z <- 0 until 64) { t(ZIGZAG(z)) = u8(p); p += 1 }
            qt(tq) = t
          }
          pos = end
        case 0xC0 =>
          val len = u16(pos)
          if (u8(pos + 2) != 8) return null // 8-bit precision only
          height = u16(pos + 3); width = u16(pos + 5)
          val nc = u8(pos + 7)
          if (nc != 1 && nc != 3) return null
          compId = new Array(nc); compH = new Array(nc)
          compV = new Array(nc); compQ = new Array(nc)
          for (c <- 0 until nc) {
            val o = pos + 8 + 3 * c
            compId(c) = u8(o); compH(c) = u8(o + 1) >> 4
            compV(c) = u8(o + 1) & 0x0f; compQ(c) = u8(o + 2)
            if (compH(c) < 1 || compH(c) > 2 || compV(c) < 1 || compV(c) > 2)
              return null
          }
          pos += len
        case 0xC4 =>
          val len = u16(pos); val end = pos + len; var p = pos + 2
          while (p < end) {
            val cls = u8(p) >> 4; val id = u8(p) & 0x0f; p += 1
            val bits = Array.tabulate(16)(i => u8(p + i)); p += 16
            val n = bits.sum
            val vals = Array.tabulate(n)(i => u8(p + i)); p += n
            val t = new HuffTable(bits, vals)
            if (cls == 0) dcTab(id) = t else acTab(id) = t
          }
          pos = end
        case 0xDD =>
          restartInterval = u16(pos + 2); pos += u16(pos)
        case 0xDA =>
          val len = u16(pos)
          val nc = u8(pos + 2)
          if (compId == null || nc != compId.length) return null
          compDc = new Array(nc); compAc = new Array(nc)
          for (c <- 0 until nc) {
            val o = pos + 3 + 2 * c
            if (u8(o) != compId(c)) return null // non-SOF scan order
            compDc(c) = u8(o + 1) >> 4; compAc(c) = u8(o + 1) & 0x0f
          }
          scanStart = pos + len
        case 0xD9 => return null // EOI before any scan
        case 0xC2 => return decodeProgressiveOrThrow(b) // SOF2: reparse
        case x if x >= 0xC1 && x <= 0xCF && x != 0xC4 && x != 0xC8 =>
          return null // extended / lossless / arithmetic
        case _ => pos += u16(pos) // APPn, COM, anything skippable
      }
    }
    // decompression-bomb guard alongside the validity check: SOF dims
    // are attacker bytes, and the plane allocations below are
    // dim-driven — an OutOfMemoryError is an Error, not an Exception,
    // so without the cap a corrupt header kills the task instead of
    // nulling the row
    if (width <= 0 || height <= 0 ||
      width.toLong * height > (1L << 26)) return null
    val nc = compId.length
    val maxH = compH.max; val maxV = compV.max
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    // per-component sample planes at the component's own resolution
    val planeW = Array.tabulate(nc)(c => mcusX * compH(c) * 8)
    val planeH = Array.tabulate(nc)(c => mcusY * compV(c) * 8)
    for (c <- 0 until nc)
      if (planeW(c).toLong * planeH(c) > (1L << 27)) return null
    val planes = Array.tabulate(nc)(c => new Array[Byte](planeW(c) * planeH(c)))
    for (c <- 0 until nc) {
      if (qt(compQ(c)) == null || dcTab(compDc(c)) == null ||
        acTab(compAc(c)) == null) return null
    }
    val br = new BitReader(b, scanStart)
    val pred = new Array[Int](nc)
    val coef = new Array[Double](64)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.restart()) throw new IllegalArgumentException("missing RST")
        java.util.Arrays.fill(pred, 0)
      }
      val my = mcu / mcusX; val mx = mcu % mcusX
      var c = 0
      while (c < nc) {
        val q = qt(compQ(c))
        val dt = dcTab(compDc(c)); val at = acTab(compAc(c))
        var by = 0
        while (by < compV(c)) {
          var bx = 0
          while (bx < compH(c)) {
            java.util.Arrays.fill(coef, 0.0)
            val s = decodeHuff(br, dt)
            if (s < 0 || s > 11) throw new IllegalArgumentException("bad DC")
            pred(c) += extend(br.bits(s), s)
            coef(0) = pred(c).toDouble * q(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = decodeHuff(br, at)
              if (rs < 0) throw new IllegalArgumentException("bad AC")
              val r = rs >> 4; val sz = rs & 0x0f
              if (sz == 0) {
                if (r == 15) k += 16 else eob = true
              } else {
                k += r
                if (k > 63) throw new IllegalArgumentException("AC overrun")
                coef(ZIGZAG(k)) = extend(br.bits(sz), sz).toDouble * q(ZIGZAG(k))
                k += 1
              }
            }
            if (br.hitMarker && mcu < totalMcus - 1 && restartInterval == 0)
              throw new IllegalArgumentException("truncated entropy data")
            val px = idctBlock(coef)
            val ox = (mx * compH(c) + bx) * 8; val oy = (my * compV(c) + by) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                planes(c)((oy + yy) * planeW(c) + ox + xx) =
                  px(yy * 8 + xx).toByte
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        c += 1
      }
      mcu += 1
    }
    assemble(planes, planeW, nc, compH, compV, maxH, maxV, width, height)
  }

  /** Shared decode tail: replication upsampling, then JFIF YCbCr→RGB.
    * The double expressions below are mirrored term-for-term by the
    * q118/q127 oracles — literal constants, left-assoc adds,
    * floor(x+0.5).
    */
  private def assemble(planes: Array[Array[Byte]], planeW: Array[Int],
      nc: Int, compH: Array[Int], compV: Array[Int], maxH: Int, maxV: Int,
      width: Int, height: Int): JpegImage = {
    val chans = if (nc == 3) 3 else 1
    val outPx = new Array[Byte](width * height * chans)
    def clamp(d: Double): Int = {
      val v = math.floor(d + 0.5).toInt
      if (v < 0) 0 else if (v > 255) 255 else v
    }
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        if (nc == 1) {
          outPx(y * width + x) = planes(0)(y * planeW(0) + x)
        } else {
          def samp(c: Int): Int = {
            val sx = x * compH(c) / maxH; val sy = y * compV(c) / maxV
            planes(c)(sy * planeW(c) + sx) & 0xff
          }
          val yv = samp(0).toDouble
          val cb = samp(1) - 128; val cr = samp(2) - 128
          val o = (y * width + x) * 3
          outPx(o) = clamp(yv + 1.402 * cr).toByte
          outPx(o + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr).toByte
          outPx(o + 2) = clamp(yv + 1.772 * cb).toByte
        }
        x += 1
      }
      y += 1
    }
    JpegImage(width, height, chans, outPx)
  }

  // ------------------------------------------------------------------
  // Progressive (SOF2) decoder
  // ------------------------------------------------------------------

  /** Full progressive decode: all four scan classes of Annex G —
    * DC first (interleaved or not), DC successive-approximation
    * refinement, AC first with EOB runs, and AC refinement with
    * correction bits. Coefficients accumulate across scans in
    * per-component natural-order arrays; dequant + IDCT + the shared
    * [[assemble]] tail run once after EOI. Tables may be redefined
    * between scans (the marker loop processes segments in stream
    * order). Corrupt/overrunning scans throw → null via [[jpegDecode]].
    */
  private def decodeProgressiveOrThrow(b: Array[Byte]): JpegImage = {
    def u8(p: Int) = b(p) & 0xff
    def u16(p: Int) = (u8(p) << 8) | u8(p + 1)
    if (b.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return null
    var pos = 2
    val qt = new Array[Array[Int]](4)
    val dcTab = new Array[HuffTable](4); val acTab = new Array[HuffTable](4)
    var width = 0; var height = 0; var nc = 0
    var compId: Array[Int] = null; var compH: Array[Int] = null
    var compV: Array[Int] = null; var compQ: Array[Int] = null
    var restartInterval = 0
    var maxH = 1; var maxV = 1; var mcusX = 0; var mcusY = 0
    var coefs: Array[Array[Int]] = null // per comp: padded blocks × 64, NATURAL
    var bwPad: Array[Int] = null; var bhPad: Array[Int] = null
    var bwComp: Array[Int] = null; var bhComp: Array[Int] = null
    var sawEoi = false; var anyScan = false

    def runScan(scomp: Array[Int], sdc: Array[Int], sac: Array[Int],
        ss: Int, se: Int, ah: Int, al: Int, entryPos: Int): Int = {
      val br = new BitReader(b, entryPos)
      var eobrun = 0
      val pred = new Array[Int](nc)
      var unit = 0 // restart counter: MCUs (interleaved) or blocks
      def maybeRestart(): Unit =
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          if (!br.restart()) throw new IllegalArgumentException("missing RST")
          java.util.Arrays.fill(pred, 0); eobrun = 0
        }
      def huff(t: HuffTable): Int = {
        val s = decodeHuff(br, t)
        if (s < 0) throw new IllegalArgumentException("bad huffman")
        s
      }
      def dcBlock(i: Int, c: Int, base: Int): Unit =
        if (ah == 0) {
          val t = dcTab(sdc(i))
          if (t == null) throw new IllegalArgumentException("no DC table")
          val s = huff(t)
          if (s > 11) throw new IllegalArgumentException("bad DC size")
          pred(c) += extend(br.bits(s), s)
          coefs(c)(base) = pred(c) << al
        } else if (br.bit() == 1) coefs(c)(base) |= 1 << al
      if (ss == 0) { // DC scan
        if (se != 0) throw new IllegalArgumentException("bad DC band")
        if (scomp.length > 1) { // interleaved over MCUs
          var mcu = 0; val total = mcusX * mcusY
          while (mcu < total) {
            maybeRestart(); unit += 1
            val my = mcu / mcusX; val mx = mcu % mcusX
            var i = 0
            while (i < scomp.length) {
              val c = scomp(i)
              var by = 0
              while (by < compV(c)) {
                var bx = 0
                while (bx < compH(c)) {
                  dcBlock(i, c, (((my * compV(c) + by) * bwPad(c))
                    + (mx * compH(c) + bx)) * 64)
                  bx += 1
                }
                by += 1
              }
              i += 1
            }
            mcu += 1
          }
        } else { // non-interleaved: the component's own block grid
          val c = scomp(0)
          var bi = 0; val total = bwComp(c) * bhComp(c)
          while (bi < total) {
            maybeRestart(); unit += 1
            val bY = bi / bwComp(c); val bX = bi % bwComp(c)
            dcBlock(0, c, (bY * bwPad(c) + bX) * 64)
            bi += 1
          }
        }
      } else { // AC scan: exactly one component, never interleaved
        if (scomp.length != 1) throw new IllegalArgumentException(
          "interleaved AC scan")
        if (se > 63 || ss > se) throw new IllegalArgumentException("bad band")
        val c = scomp(0)
        val at = acTab(sac(0))
        if (at == null) throw new IllegalArgumentException("no AC table")
        val arr = coefs(c)
        val p1 = 1 << al; val m1 = -(1 << al)
        def acFirst(base: Int): Unit = {
          if (eobrun > 0) { eobrun -= 1; return }
          var k = ss
          while (k <= se) {
            val rs = huff(at); val r = rs >> 4; val s = rs & 15
            if (s == 0) {
              if (r == 15) k += 16
              else {
                eobrun = (1 << r) - 1 + (if (r > 0) br.bits(r) else 0)
                k = se + 1
              }
            } else {
              if (s > 10) throw new IllegalArgumentException("bad AC size")
              k += r
              if (k > se) throw new IllegalArgumentException("AC overrun")
              arr(base + ZIGZAG(k)) = extend(br.bits(s), s) << al
              k += 1
            }
          }
        }
        def refineBit(idx: Int): Unit =
          if (br.bit() == 1 && (arr(idx) & p1) == 0)
            arr(idx) += (if (arr(idx) >= 0) p1 else m1)
        def acRefine(base: Int): Unit = {
          var k = ss
          if (eobrun == 0) {
            var break0 = false
            while (k <= se && !break0) {
              val rs = huff(at); var r = rs >> 4; val s0 = rs & 15
              var newval = 0
              if (s0 == 0) {
                if (r < 15) {
                  // EOBRUN includes THIS block; the tail consumes one
                  eobrun = (1 << r) + (if (r > 0) br.bits(r) else 0)
                  break0 = true
                } // r == 15: ZRL — pass 16 zero-history coefficients
              } else {
                if (s0 != 1) throw new IllegalArgumentException(
                  "refinement size != 1")
                newval = if (br.bit() == 1) p1 else m1
              }
              if (!break0) {
                var placed = false
                while (k <= se && !placed) {
                  val idx = base + ZIGZAG(k)
                  if (arr(idx) != 0) refineBit(idx)
                  else if (r == 0) {
                    if (newval != 0) { arr(idx) = newval; newval = 0 }
                    placed = true
                  } else r -= 1
                  k += 1
                }
                if (!placed && newval != 0)
                  throw new IllegalArgumentException("refine overrun")
              }
            }
          }
          if (eobrun > 0) {
            while (k <= se) {
              val idx = base + ZIGZAG(k)
              if (arr(idx) != 0) refineBit(idx)
              k += 1
            }
            eobrun -= 1
          }
        }
        var bi = 0; val total = bwComp(c) * bhComp(c)
        while (bi < total) {
          maybeRestart(); unit += 1
          val bY = bi / bwComp(c); val bX = bi % bwComp(c)
          val base = (bY * bwPad(c) + bX) * 64
          if (ah == 0) acFirst(base) else acRefine(base)
          bi += 1
        }
      }
      if (br.hitMarker) throw new IllegalArgumentException(
        "truncated entropy data")
      // resync: next true marker (skip stuffed 0xFF00 and stray RSTn)
      var p = br.pos
      while (p + 1 < b.length && !(u8(p) == 0xFF && u8(p + 1) != 0x00 &&
        !(u8(p + 1) >= 0xD0 && u8(p + 1) <= 0xD7))) p += 1
      if (p + 1 >= b.length)
        throw new IllegalArgumentException("no marker after scan")
      p
    }

    while (!sawEoi) {
      if (pos + 2 > b.length || u8(pos) != 0xFF) return null
      val m = u8(pos + 1); pos += 2
      m match {
        case 0xD8 => // stray SOI
        case 0xDB =>
          val len = u16(pos); val end = pos + len; var p = pos + 2
          while (p < end) {
            val pq = u8(p) >> 4; val tq = u8(p) & 0x0f; p += 1
            if (pq != 0) return null
            val t = new Array[Int](64)
            for (z <- 0 until 64) { t(ZIGZAG(z)) = u8(p); p += 1 }
            qt(tq) = t
          }
          pos = end
        case 0xC4 =>
          val len = u16(pos); val end = pos + len; var p = pos + 2
          while (p < end) {
            val cls = u8(p) >> 4; val id = u8(p) & 0x0f; p += 1
            val bits = Array.tabulate(16)(i => u8(p + i)); p += 16
            val n = bits.sum
            val vals = Array.tabulate(n)(i => u8(p + i)); p += n
            val t = new HuffTable(bits, vals)
            if (cls == 0) dcTab(id) = t else acTab(id) = t
          }
          pos = end
        case 0xDD =>
          restartInterval = u16(pos + 2); pos += u16(pos)
        case 0xC2 =>
          if (coefs != null) return null // one frame only
          val len = u16(pos)
          if (u8(pos + 2) != 8) return null
          height = u16(pos + 3); width = u16(pos + 5)
          nc = u8(pos + 7)
          if (nc != 1 && nc != 3 || width <= 0 || height <= 0) return null
          compId = new Array(nc); compH = new Array(nc)
          compV = new Array(nc); compQ = new Array(nc)
          for (c <- 0 until nc) {
            val o = pos + 8 + 3 * c
            compId(c) = u8(o); compH(c) = u8(o + 1) >> 4
            compV(c) = u8(o + 1) & 0x0f; compQ(c) = u8(o + 2)
            if (compH(c) < 1 || compH(c) > 2 || compV(c) < 1 || compV(c) > 2)
              return null
          }
          pos += len
          maxH = compH.max; maxV = compV.max
          mcusX = (width + 8 * maxH - 1) / (8 * maxH)
          mcusY = (height + 8 * maxV - 1) / (8 * maxV)
          bwPad = Array.tabulate(nc)(c => mcusX * compH(c))
          bhPad = Array.tabulate(nc)(c => mcusY * compV(c))
          bwComp = Array.tabulate(nc)(c =>
            (((width * compH(c) + maxH - 1) / maxH) + 7) / 8)
          bhComp = Array.tabulate(nc)(c =>
            (((height * compV(c) + maxV - 1) / maxV) + 7) / 8)
          coefs = Array.tabulate(nc)(c =>
            new Array[Int](bwPad(c) * bhPad(c) * 64))
        case 0xDA =>
          if (coefs == null) return null
          val len = u16(pos)
          val ns = u8(pos + 2)
          if (ns < 1 || ns > nc) return null
          val scomp = new Array[Int](ns)
          val sdc = new Array[Int](ns); val sac = new Array[Int](ns)
          for (i <- 0 until ns) {
            val o = pos + 3 + 2 * i
            val c = compId.indexOf(u8(o))
            if (c < 0) return null
            scomp(i) = c; sdc(i) = u8(o + 1) >> 4; sac(i) = u8(o + 1) & 0x0f
          }
          val ss = u8(pos + 3 + 2 * ns); val se = u8(pos + 4 + 2 * ns)
          val ahal = u8(pos + 5 + 2 * ns)
          pos = runScan(scomp, sdc, sac, ss, se, ahal >> 4, ahal & 0x0f,
            pos + len)
          anyScan = true
        case 0xD9 => sawEoi = true
        case 0xFF => pos -= 1 // fill byte before a marker
        case x if x >= 0xD0 && x <= 0xD7 => // stray RSTn, no length
        case x if x >= 0xC0 && x <= 0xCF && x != 0xC4 && x != 0xC8 =>
          return null // a second, non-progressive frame type
        case _ =>
          if (pos + 2 > b.length) return null
          pos += u16(pos)
      }
    }
    if (coefs == null || !anyScan) return null
    // all scans in: dequantize + IDCT every (padded) block into planes
    val planeW = Array.tabulate(nc)(c => bwPad(c) * 8)
    val planes = Array.tabulate(nc)(c =>
      new Array[Byte](planeW(c) * bhPad(c) * 8))
    val coefD = new Array[Double](64)
    var c = 0
    while (c < nc) {
      val q = qt(compQ(c))
      if (q == null) return null
      var bY = 0
      while (bY < bhPad(c)) {
        var bX = 0
        while (bX < bwPad(c)) {
          val base = (bY * bwPad(c) + bX) * 64
          var i = 0
          while (i < 64) { coefD(i) = coefs(c)(base + i).toDouble * q(i); i += 1 }
          val px = idctBlock(coefD)
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              planes(c)((bY * 8 + yy) * planeW(c) + bX * 8 + xx) =
                px(yy * 8 + xx).toByte
              xx += 1
            }
            yy += 1
          }
          bX += 1
        }
        bY += 1
      }
      c += 1
    }
    assemble(planes, planeW, nc, compH, compV, maxH, maxV, width, height)
  }

  // ------------------------------------------------------------------
  // Progressive encoder (spectral selection + DC successive approx)
  // ------------------------------------------------------------------

  /** AC table for progressive scans: the standard sequential AC table
    * has no EOBn symbols (it never needs runs > 1 block), so the
    * progressive encoder ships its own flat 8-bit canonical table
    * covering EOBn (r = 0–14, s = 0), ZRL, and every (run, size)
    * pair — 176 symbols ≤ 2⁸, a valid canonical code.
    */
  private lazy val PROG_AC_TABLE: HuffTable = {
    val syms = ((0 to 14).map(_ << 4)) ++ Seq(0xF0) ++
      (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)
    val bits = new Array[Int](16)
    bits(7) = syms.size // all codes 8 bits long (index 7 = length 8)
    new HuffTable(bits, syms.toArray)
  }

  /** Progressive (SOF2) encode from QUANTIZED coefficients — the
    * spectral-selection + DC-successive-approximation progression:
    * scan 1 = interleaved DC first at Al=dcAl, then one DC refinement
    * scan per bit down to 0, then one full-band AC first scan per
    * component (Ss=1..63, Ah=Al=0) with real EOB runs. Exercises the
    * decoder's multi-scan, DC-SA, and EOBRUN paths; AC refinement is
    * covered by the ImageIO interop spec (libjpeg's default
    * progression emits it).
    */
  def jpegEncodeProgressive(width: Int, height: Int,
      sampling: Seq[(Int, Int)], quant: Seq[Array[Int]],
      coeffs: (Int, Int, Int) => Array[Int], dcAl: Int = 1): Array[Byte] = {
    val ncomp = sampling.size
    require(ncomp == 1 || ncomp == 3, "1 or 3 components")
    require(quant.size == ncomp && dcAl >= 0 && dcAl <= 13)
    val maxH = sampling.map(_._1).max; val maxV = sampling.map(_._2).max
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    marker(0xD8)
    for (c <- 0 until ncomp) {
      marker(0xDB); be16(2 + 1 + 64)
      out.write(c)
      for (z <- 0 until 64) out.write(quant(c)(ZIGZAG(z)))
    }
    marker(0xC2); be16(8 + 3 * ncomp) // SOF2
    out.write(8); be16(height); be16(width); out.write(ncomp)
    for (c <- 0 until ncomp) {
      out.write(c + 1)
      out.write((sampling(c)._1 << 4) | sampling(c)._2)
      out.write(c)
    }
    def dht(cls: Int, id: Int, t: HuffTable): Unit = {
      marker(0xC4); be16(2 + 1 + 16 + t.vals.length)
      out.write((cls << 4) | id)
      t.bits.foreach(out.write)
      t.vals.foreach(out.write)
    }
    dht(0, 0, DC_TABLE); dht(1, 0, PROG_AC_TABLE)
    def sos(comps: Seq[Int], dcId: Int, acId: Int, ss: Int, se: Int,
        ah: Int, al: Int): Unit = {
      marker(0xDA); be16(6 + 2 * comps.size)
      out.write(comps.size)
      comps.foreach { c => out.write(c + 1); out.write((dcId << 4) | acId) }
      out.write(ss); out.write(se); out.write((ah << 4) | al)
    }
    def blockOf(c: Int, by: Int, bx: Int): Array[Int] = {
      val blk = coeffs(c, by, bx); require(blk.length == 64); blk
    }
    // --- scan 1: DC first, interleaved, Al = dcAl -------------------
    sos(0 until ncomp, 0, 0, 0, 0, 0, dcAl)
    locally {
      val bw = new BitWriter(out)
      def putSym(t: HuffTable, sym: Int): Unit = {
        val (code, len) = t.encodeMap(sym); bw.put(code, len)
      }
      val pred = new Array[Int](ncomp)
      for (my <- 0 until mcusY; mx <- 0 until mcusX; c <- 0 until ncomp) {
        val (h, v) = sampling(c)
        for (by <- 0 until v; bx <- 0 until h) {
          val dc = blockOf(c, my * v + by, mx * h + bx)(0) >> dcAl
          val diff = dc - pred(c); pred(c) = dc
          val s = if (diff == 0) 0 else bitLength(math.abs(diff))
          putSym(DC_TABLE, s)
          if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
        }
      }
      bw.flush()
    }
    // --- DC refinement scans, one bit at a time down to Al = 0 ------
    for (al <- (0 until dcAl).reverse) {
      sos(0 until ncomp, 0, 0, 0, 0, al + 1, al)
      val bw = new BitWriter(out)
      for (my <- 0 until mcusY; mx <- 0 until mcusX; c <- 0 until ncomp) {
        val (h, v) = sampling(c)
        for (by <- 0 until v; bx <- 0 until h)
          bw.put((blockOf(c, my * v + by, mx * h + bx)(0) >> al) & 1, 1)
      }
      bw.flush()
    }
    // --- AC first scans: one per component, full band, EOB runs -----
    for (c <- 0 until ncomp) {
      sos(Seq(c), 0, 0, 1, 63, 0, 0)
      val bw = new BitWriter(out)
      def putSym(sym: Int): Unit = {
        val (code, len) = PROG_AC_TABLE.encodeMap(sym); bw.put(code, len)
      }
      var eobrun = 0
      def flushEob(): Unit = if (eobrun > 0) {
        val r = 31 - Integer.numberOfLeadingZeros(eobrun)
        putSym(r << 4)
        if (r > 0) bw.put(eobrun - (1 << r), r)
        eobrun = 0
      }
      val (h, v) = sampling(c)
      // non-interleaved scan covers the COMPONENT grid, not the pad
      val cw = (((width * h + maxH - 1) / maxH) + 7) / 8
      val ch = (((height * v + maxV - 1) / maxV) + 7) / 8
      for (by <- 0 until ch; bx <- 0 until cw) {
        val blk = blockOf(c, by, bx)
        var lastNz = 0
        for (k <- 1 to 63) if (blk(ZIGZAG(k)) != 0) lastNz = k
        if (lastNz == 0) {
          eobrun += 1
          if (eobrun == 32767) flushEob()
        } else {
          flushEob()
          var k = 1; var run = 0
          while (k <= lastNz) {
            val v0 = blk(ZIGZAG(k))
            if (v0 == 0) run += 1
            else {
              while (run > 15) { putSym(0xF0); run -= 16 }
              val sz = bitLength(math.abs(v0))
              putSym((run << 4) | sz)
              bw.put(if (v0 < 0) v0 + (1 << sz) - 1 else v0, sz)
              run = 0
            }
            k += 1
          }
          if (lastNz < 63) eobrun += 1 // EOB for this block's tail
        }
      }
      flushEob()
      bw.flush()
    }
    marker(0xD9)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // DataFrame surface
  // ------------------------------------------------------------------

  /** Distributed full-pixel JPEG decode — the [[Multimodal.pngFeatures]]
    * shape and schema: dimensions, first/last pixel RGB, Σ over every
    * channel sample. Undecodable payloads yield a null-stats row.
    * Grayscale reports its single channel as r=g=b.
    */
  def jpegFeatures(media: DataFrame): DataFrame = {
    val enc = Encoders.row(Multimodal.pngSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val img = jpegDecode(r.getAs[Array[Byte]](1))
          if (img == null)
            Row(r.getLong(0), null, null, null, null, null, null,
              null, null, null, null)
          else {
            val c = img.channels
            var sum = 0L
            var i = 0
            while (i < img.pixels.length) { sum += img.pixels(i) & 0xff; i += 1 }
            val last = (img.height * img.width - 1) * c
            def px(o: Int, ch: Int) = img.pixels(o + (ch min (c - 1))) & 0xff
            Row(r.getLong(0), img.width, img.height, c,
              px(0, 0), px(0, 1), px(0, 2),
              px(last, 0), px(last, 1), px(last, 2), sum)
          }
        }
      }(enc)
  }
}
