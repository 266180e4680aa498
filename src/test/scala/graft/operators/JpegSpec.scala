package graft.operators

import graft.SparkSpec
import graft.operators.Jpeg._

class JpegSpec extends SparkSpec {

  private def dcOnly(dc: Int): Array[Int] = {
    val a = new Array[Int](64); a(0) = dc; a
  }
  private val flat8: Array[Int] = Array.fill(64)(8)

  /** Independent direct 2-D IDCT (textbook quadruple loop — a second
    * implementation, so a transposition bug in the separable one
    * cannot self-confirm).
    */
  private def directIdct(coef: Array[Double]): Array[Int] = {
    val out = new Array[Int](64)
    for (y <- 0 until 8; x <- 0 until 8) {
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8) {
        val av = if (v == 0) math.sqrt(0.125) else 0.5
        val au = if (u == 0) math.sqrt(0.125) else 0.5
        s += av * au * coef(v * 8 + u) *
          math.cos((2 * y + 1) * v * math.Pi / 16) *
          math.cos((2 * x + 1) * u * math.Pi / 16)
      }
      val p = math.floor(s + 128.0 + 0.5).toInt
      out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
    }
    out
  }

  test("zigzag is the spec walk (spot indices) and a permutation") {
    assert(ZIGZAG.take(10).toSeq === Seq(0, 1, 8, 16, 9, 2, 3, 10, 17, 24))
    assert(ZIGZAG(63) === 63)
    assert(ZIGZAG.toSet === (0 until 64).toSet)
  }

  test("separable IDCT matches the direct textbook IDCT on random blocks") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 20) {
      val coef = Array.fill(64)((rnd.nextInt(401) - 200).toDouble)
      assert(idctBlock(coef).toSeq === directIdct(coef).toSeq)
    }
  }

  test("DC-only color round trip: pixels are closed-form 128+dc through YCbCr") {
    val d = 37L
    def dcY(bx: Int, by: Int) = ((d * 5 + bx * 7 + by * 11) % 200).toInt - 100
    def dcCb(bx: Int, by: Int) = ((d * 3 + bx + 2 * by) % 100).toInt - 50
    def dcCr(bx: Int, by: Int) = ((d * 7 + 2 * bx + by) % 100).toInt - 50
    val bytes = jpegEncode(16, 16, Seq((1, 1), (1, 1), (1, 1)),
      Seq(flat8, flat8, flat8),
      (c, by, bx) => dcOnly(c match {
        case 0 => dcY(bx, by); case 1 => dcCb(bx, by); case _ => dcCr(bx, by)
      }))
    val img = jpegDecode(bytes)
    assert(img != null && img.width === 16 && img.height === 16 &&
      img.channels === 3)
    def clamp(x: Double) = {
      val v = math.floor(x + 0.5).toInt
      if (v < 0) 0 else if (v > 255) 255 else v
    }
    for (y <- 0 until 16; x <- 0 until 16) {
      val (bx, by) = (x / 8, y / 8)
      val yv = (128 + dcY(bx, by)).toDouble
      val cb = dcCb(bx, by); val cr = dcCr(bx, by)
      val o = (y * 16 + x) * 3
      assert((img.pixels(o) & 0xff) === clamp(yv + 1.402 * cr))
      assert((img.pixels(o + 1) & 0xff) ===
        clamp(yv - 0.344136 * cb - 0.714136 * cr))
      assert((img.pixels(o + 2) & 0xff) === clamp(yv + 1.772 * cb))
    }
  }

  test("AC coefficients round-trip the huffman layer exactly (4:4:4)") {
    // general quant + a spread of AC values (runs, ZRL-length gaps,
    // max-category sizes) — decode must equal a direct dequant+IDCT
    val quant = Array.tabulate(64)(i => 1 + (i % 7) * 3)
    val rnd = new scala.util.Random(11)
    val blocks = Array.fill(3, 1, 1) {
      val b = new Array[Int](64)
      b(0) = rnd.nextInt(201) - 100
      for (_ <- 0 until 6) b(rnd.nextInt(63) + 1) = rnd.nextInt(1023) - 511
      b(63) = 5 // forces a long zero run (ZRL path)
      b
    }
    val bytes = jpegEncode(8, 8, Seq((1, 1), (1, 1), (1, 1)),
      Seq(quant, quant, quant), (c, by, bx) => blocks(c)(by)(bx))
    val img = jpegDecode(bytes)
    assert(img != null)
    // reference: dequant + shared IDCT + the conversion formula
    val planes = blocks.map(b => idctBlock(
      Array.tabulate(64)(i => b(0)(0)(i).toDouble * quant(i))))
    def clamp(x: Double) = {
      val v = math.floor(x + 0.5).toInt
      if (v < 0) 0 else if (v > 255) 255 else v
    }
    for (i <- 0 until 64) {
      val yv = planes(0)(i).toDouble
      val cb = planes(1)(i) - 128; val cr = planes(2)(i) - 128
      assert((img.pixels(i * 3) & 0xff) === clamp(yv + 1.402 * cr))
      assert((img.pixels(i * 3 + 1) & 0xff) ===
        clamp(yv - 0.344136 * cb - 0.714136 * cr))
      assert((img.pixels(i * 3 + 2) & 0xff) === clamp(yv + 1.772 * cb))
    }
  }

  test("grayscale decode: single channel, no color conversion") {
    val bytes = jpegEncode(8, 8, Seq((1, 1)), Seq(flat8),
      (_, _, _) => dcOnly(42))
    val img = jpegDecode(bytes)
    assert(img != null && img.channels === 1)
    assert(img.pixels.forall(p => (p & 0xff) === 128 + 42))
  }

  test("4:2:0 chroma subsampling: replication upsampling indexes correctly") {
    // luma 2x2 blocks (16x16), chroma 1 block (8x8) WITH an AC pattern
    // so a wrong upsample index produces a different chroma sample
    val quant = Array.fill(64)(2)
    val cbBlock = { val b = new Array[Int](64); b(0) = 10; b(1) = 30; b }
    val crBlock = { val b = new Array[Int](64); b(0) = -20; b(8) = 25; b }
    def lumaDc(by: Int, bx: Int) = 20 * (by * 2 + bx) - 30
    val bytes = jpegEncode(16, 16, Seq((2, 2), (1, 1), (1, 1)),
      Seq(quant, quant, quant),
      (c, by, bx) => c match {
        case 0 => dcOnly(lumaDc(by, bx))
        case 1 => cbBlock
        case _ => crBlock
      })
    val img = jpegDecode(bytes)
    assert(img != null && img.width === 16 && img.height === 16)
    val cbPlane = idctBlock(Array.tabulate(64)(i => cbBlock(i).toDouble * 2))
    val crPlane = idctBlock(Array.tabulate(64)(i => crBlock(i).toDouble * 2))
    def clamp(x: Double) = {
      val v = math.floor(x + 0.5).toInt
      if (v < 0) 0 else if (v > 255) 255 else v
    }
    for (y <- 0 until 16; x <- 0 until 16) {
      val yv = idctBlock(Array.tabulate(64)(i =>
        (if (i == 0) lumaDc(y / 8, x / 8) else 0).toDouble * 2))(0)
      val cb = cbPlane((y / 2) * 8 + x / 2) - 128
      val cr = crPlane((y / 2) * 8 + x / 2) - 128
      val o = (y * 16 + x) * 3
      assert((img.pixels(o) & 0xff) === clamp(yv.toDouble + 1.402 * cr),
        s"at ($x,$y)")
      assert((img.pixels(o + 2) & 0xff) === clamp(yv.toDouble + 1.772 * cb),
        s"at ($x,$y)")
    }
  }

  test("corrupt and unsupported inputs decode to null, never garbage") {
    val good = jpegEncode(8, 8, Seq((1, 1)), Seq(flat8), (_, _, _) => dcOnly(5))
    assert(jpegDecode(good) != null)
    assert(jpegDecode(null) === null)
    assert(jpegDecode(Array[Byte](1, 2, 3)) === null)
    assert(jpegDecode("not a jpeg at all".getBytes) === null)
    // truncation at every prefix must be null or the full image — never
    // a throw escaping, never wrong dimensions
    for (cut <- 2 until good.length - 1) {
      val img = jpegDecode(good.take(cut))
      assert(img == null || (img.width === 8 && img.height === 8))
    }
    // progressive SOF (C0 → C2) is rejected
    val prog = good.clone()
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xFF && (prog(i + 1) & 0xff) == 0xC0).get
    prog(sofAt + 1) = 0xC2.toByte
    assert(jpegDecode(prog) === null)
    // 16-bit quant tables (pq=1) are rejected
    val hiq = good.clone()
    val dqtAt = (0 until hiq.length - 1).find(i =>
      (hiq(i) & 0xff) == 0xFF && (hiq(i + 1) & 0xff) == 0xDB).get
    hiq(dqtAt + 4) = 0x10.toByte
    assert(jpegDecode(hiq) === null)
  }
}
