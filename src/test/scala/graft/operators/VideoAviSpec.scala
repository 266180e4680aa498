package graft.operators

import graft.SparkSpec
import graft.operators.VideoAvi._

class VideoAviSpec extends SparkSpec {

  // width 6 → 18 data bytes/row → padded to 20: padding always on
  private val W = 6
  private val H = 4
  private def px(f: Int, x: Int, y: Int): (Int, Int, Int) =
    ((f + x) % 256, (10 + f + 2 * x + y) % 256, (100 + 3 * y + x) % 256)

  test("encode/decode round trip: top-down RGB recovered from bottom-up padded BGR") {
    val clip = aviDecode(aviEncode(W, H, 3, px))
    assert(clip != null && clip.width === W && clip.height === H &&
      clip.nFrames === 3 && clip.frames.length === 3)
    for (f <- 0 until 3; y <- 0 until H; x <- 0 until W) {
      val (r, g, b) = px(f, x, y)
      val o = (y * W + x) * 3
      assert((clip.frames(f)(o) & 0xff) === r, s"R at f$f ($x,$y)")
      assert((clip.frames(f)(o + 1) & 0xff) === g, s"G at f$f ($x,$y)")
      assert((clip.frames(f)(o + 2) & 0xff) === b, s"B at f$f ($x,$y)")
    }
  }

  test("stride sampling decodes every k-th frame and counts all of them") {
    val clip = aviDecode(aviEncode(W, H, 5, px), stride = 2)
    assert(clip.nFrames === 5)        // container count: all frames seen
    assert(clip.frames.length === 3)  // 0, 2, 4 materialized
    // sampled frames are the RIGHT ones, not just the right count
    for ((fIdx, i) <- Seq(0, 2, 4).zipWithIndex; y <- 0 until H; x <- 0 until W) {
      val o = (y * W + x) * 3
      assert((clip.frames(i)(o) & 0xff) === px(fIdx, x, y)._1,
        s"frame slot $i must hold container frame $fIdx")
    }
  }

  // -- MJPEG-in-AVI ----------------------------------------------------
  private val flat8 = Array.fill(64)(8)
  private def dcOnly(dc: Int) = { val a = new Array[Int](64); a(0) = dc; a }
  // one 16x16 4:4:4 DC-only JFIF per frame — the integer-exact IDCT
  // regime (q118), so every decoded pixel is closed-form
  private def mjpegFrame(f: Int): Array[Byte] =
    Jpeg.jpegEncode(16, 16, Seq((1, 1), (1, 1), (1, 1)),
      Seq(flat8, flat8, flat8),
      (c, by, bx) => dcOnly(c match {
        case 0 => (f * 31 + bx * 7 + by * 11) % 200 - 100
        case 1 => (f * 13 + bx + 2 * by) % 100 - 50
        case _ => (f * 19 + 2 * bx + by) % 100 - 50
      }))
  private def clampJ(d: Double): Int =
    math.max(0, math.min(255, math.floor(d + 0.5).toInt))
  private def mjpegRgb(f: Int, bx: Int, by: Int): (Int, Int, Int) = {
    val yv = 128 + (f * 31 + bx * 7 + by * 11) % 200 - 100
    val cb = (f * 13 + bx + 2 * by) % 100 - 50
    val cr = (f * 19 + 2 * bx + by) % 100 - 50
    (clampJ(yv + 1.402 * cr),
      clampJ(yv - 0.344136 * cb - 0.714136 * cr),
      clampJ(yv + 1.772 * cb))
  }

  test("MJPEG-in-AVI round trip: DC-only frames decode to closed-form pixels") {
    val clip = aviDecode(aviEncodeMjpeg(16, 16, (0 until 3).map(mjpegFrame)))
    assert(clip != null && clip.width === 16 && clip.height === 16 &&
      clip.nFrames === 3 && clip.frames.length === 3)
    for (f <- 0 until 3; y <- 0 until 16; x <- 0 until 16) {
      val (r, g, b) = mjpegRgb(f, x / 8, y / 8)
      val o = (y * 16 + x) * 3
      assert((clip.frames(f)(o) & 0xff) === r, s"R at f$f ($x,$y)")
      assert((clip.frames(f)(o + 1) & 0xff) === g, s"G at f$f ($x,$y)")
      assert((clip.frames(f)(o + 2) & 0xff) === b, s"B at f$f ($x,$y)")
    }
  }

  test("MJPEG stride: unsampled frames are seek-skipped, never entropy-decoded") {
    val avi = aviEncodeMjpeg(16, 16, (0 until 3).map(mjpegFrame))
    // corrupt entropy bytes INSIDE frame 1's chunk payload: with
    // stride 2 that frame is never handed to the JPEG decoder, so the
    // clip must still decode and frames 0/2 must be untouched
    val dcAt = Iterator.iterate(avi.indexOfSlice("00dc".getBytes) + 1)(i =>
      avi.indexOfSlice("00dc".getBytes, i) + 1).drop(1).next() - 1
    val bad = avi.clone()
    for (i <- 0 until 8) bad(dcAt + 8 + 40 + i) = 0xAA.toByte
    val clip = aviDecode(bad, stride = 2)
    assert(clip != null && clip.nFrames === 3 && clip.frames.length === 2)
    for ((f, i) <- Seq(0, 2).zipWithIndex) {
      val (r, _, _) = mjpegRgb(f, 1, 1)
      val o = ((15 * 16) + 15) * 3
      assert((clip.frames(i)(o) & 0xff) === r, s"slot $i = container frame $f")
    }
    // ...but the SAME corruption at stride 1 must reach the JPEG
    // decoder and fail closed (either null clip, or the entropy
    // corruption decodes to different-but-valid pixels; a dim or
    // marker corruption nulls). Corrupt the SOI marker to force it:
    val soiBad = avi.clone()
    soiBad(dcAt + 8) = 0
    assert(aviDecode(soiBad, 1) === null)
  }

  test("MJPEG rejects dim-mismatched frames and foreign biCompression") {
    // strf declares 8x8 but frames are 16x16
    assert(aviDecode(aviEncodeMjpeg(8, 8, (0 until 2).map(mjpegFrame))) === null)
    // any biCompression other than 0 / MJPG still rejects
    val good = aviEncodeMjpeg(16, 16, (0 until 2).map(mjpegFrame))
    val strfAt = good.indexOfSlice("strf".getBytes)
    val foreign = good.clone()
    foreign(strfAt + 8 + 16) = 'H'.toByte // 'HJPG' — not a codec we own
    assert(aviDecode(foreign) === null)
    assert(aviDecode(good) != null)
  }

  test("MJPEG frames agree with JDK ImageIO decode of the same JPEG bytes") {
    // frames written by an INDEPENDENT encoder (ImageIO, libjpeg
    // lineage, baseline 4:2:0): our container walk + JPEG decode must
    // reproduce ImageIO's own read of the identical bytes up to the
    // documented chroma-upsampling difference (replication vs fancy
    // bilinear — the JpegProgressiveSpec color bound)
    import java.awt.image.BufferedImage
    val w = 32; val h = 16
    val jpegs = (0 until 2).map { f =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val r = 50 + f * 20 + x * 3; val g = 70 + y * 4; val b = 90 + x + y
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpeg", bos)
      bos.toByteArray
    }
    val clip = aviDecode(aviEncodeMjpeg(w, h, jpegs))
    assert(clip != null && clip.width === w && clip.height === h &&
      clip.frames.length === 2)
    var maxDiff = 0
    for (f <- 0 until 2) {
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jpegs(f)))
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = ref.getRGB(x, y)
        val o = (y * w + x) * 3
        maxDiff = math.max(maxDiff, math.max(
          math.abs(((rgb >> 16) & 0xff) - (clip.frames(f)(o) & 0xff)),
          math.max(
            math.abs(((rgb >> 8) & 0xff) - (clip.frames(f)(o + 1) & 0xff)),
            math.abs((rgb & 0xff) - (clip.frames(f)(o + 2) & 0xff)))))
      }
    }
    info(s"max per-sample diff vs ImageIO: $maxDiff")
    assert(maxDiff <= 12,
      s"MJPEG decode diverged from ImageIO by $maxDiff")
  }

  test("corrupt and unsupported containers decode to null") {
    val good = aviEncode(W, H, 2, px)
    assert(aviDecode(good) != null)
    assert(aviDecode(null) === null)
    assert(aviDecode("RIFFnot an avi".getBytes) === null)
    // truncation at every prefix: null, never a throw or wrong clip
    for (cut <- 0 until good.length - 1 by 7)
      assert(aviDecode(good.take(cut)) === null)
    // compressed stream (biCompression != 0) is rejected
    val comp = good.clone()
    val strfAt = (0 until comp.length - 4)
      .find(i => new String(comp, i, 4, "US-ASCII") == "strf").get
    comp(strfAt + 8 + 16) = 1 // biCompression = BI_RLE8
    assert(aviDecode(comp) === null)
    // declared-vs-actual frame-count mismatch is rejected
    val short = aviEncode(W, H, 3, px)
    val avihAt = (0 until short.length - 4)
      .find(i => new String(short, i, 4, "US-ASCII") == "avih").get
    short(avihAt + 8 + 16) = 9 // claim 9 frames, carry 3
    assert(aviDecode(short) === null)
  }
}
