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
