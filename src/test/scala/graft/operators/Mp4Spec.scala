package graft.operators

import graft.SparkSpec

/** Pure-JVM ISO-BMFF codec contract (no Spark needed beyond the
  * harness): box-tree round trip, general stsc chunk-run expansion,
  * stride sampling, and the corrupt-input null contract.
  */
class Mp4Spec extends SparkSpec {

  private def px(f: Int, x: Int, y: Int): (Int, Int, Int) =
    ((f + 3 * x + y) % 256, (2 * f + x) % 256, (5 * f + y + 7 * x) % 256)

  test("round trip: dimensions, timing, every sampled pixel") {
    val b = VideoMp4.mp4Encode(5, 3, 4, 30, px)
    val c = VideoMp4.mp4Decode(b, 1)
    assert(c != null)
    assert((c.width, c.height, c.timescale, c.duration, c.nSamples)
      === ((5, 3, 30L, 4L, 4)))
    assert(c.frames.length === 4)
    for (f <- 0 until 4; y <- 0 until 3; x <- 0 until 5) {
      val i = (y * 5 + x) * 3
      val (r, g, bl) = px(f, x, y)
      assert((c.frames(f)(i) & 0xff) === r, s"r f=$f x=$x y=$y")
      assert((c.frames(f)(i + 1) & 0xff) === g)
      assert((c.frames(f)(i + 2) & 0xff) === bl)
    }
  }

  test("general stsc: multi-sample chunks incl. ragged tail decode identically") {
    val ref = VideoMp4.mp4Decode(VideoMp4.mp4Encode(4, 2, 5, 10, px), 1)
    for (spc <- Seq(2, 3, 5, 7)) {
      val c = VideoMp4.mp4Decode(
        VideoMp4.mp4Encode(4, 2, 5, 10, px, samplesPerChunk = spc), 1)
      assert(c != null, s"spc=$spc")
      assert(c.frames.length === ref.frames.length)
      c.frames.zip(ref.frames).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a.toSeq === b.toSeq, s"spc=$spc frame $i")
      }
    }
  }

  test("stride sampling keeps every stride-th frame") {
    val b = VideoMp4.mp4Encode(4, 2, 7, 10, px)
    val c = VideoMp4.mp4Decode(b, 3)
    assert(c.nSamples === 7)
    assert(c.frames.length === 3) // frames 0, 3, 6
    val full = VideoMp4.mp4Decode(b, 1)
    assert(c.frames(1).toSeq === full.frames(3).toSeq)
    assert(c.frames(2).toSeq === full.frames(6).toSeq)
  }

  test("corrupt and foreign inputs decode to null, never a misread") {
    val good = VideoMp4.mp4Encode(4, 2, 3, 10, px)
    assert(VideoMp4.mp4Decode(good.take(40), 1) === null)
    assert(VideoMp4.mp4Decode(Array[Byte](1, 2, 3), 1) === null)
    val avi = VideoAvi.aviEncode(4, 2, 2, (f, x, y) => (f, x, y))
    assert(VideoMp4.mp4Decode(avi, 1) === null)
    // compressed codec tag: flip the LAST 'raw ' (the stsd entry —
    // moov sits after mdat) to 'avc1' and expect the no-codec null
    val s = good.clone()
    val pat = "raw ".getBytes("US-ASCII")
    val at = s.indices.reverse.find(i => i + 4 <= s.length &&
      s.slice(i, i + 4).sameElements(pat)).get
    System.arraycopy("avc1".getBytes("US-ASCII"), 0, s, at, 4)
    assert(VideoMp4.mp4Decode(s, 1) === null)
  }

  test("crafted stsc tables null out instead of spinning the expansion") {
    def be32(v: Long): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def patched(base: Array[Byte], entryOff: Int, v: Long): Array[Byte] = {
      val b = base.clone()
      val pat = "stsc".getBytes("US-ASCII")
      val at = b.indices.find(i => i + 4 <= b.length &&
        b.slice(i, i + 4).sameElements(pat)).get
      // content = version/flags(4) count(4) then 12-byte entries
      System.arraycopy(be32(v), 0, b, at + 4 + 8 + entryOff, 4)
      b
    }
    // one run, samples_per_chunk = 0: the sample cursor never advances
    val single = VideoMp4.mp4Encode(4, 2, 3, 10, px)
    assert(VideoMp4.mp4Decode(patched(single, 4, 0L), 1) === null)
    // two runs (spc=3 then ragged): zero out BOTH spc fields and pin
    // run 2's first_chunk at Int.MaxValue — pre-fix, `chunk` wraps
    // through Int overflow while `run` stays on the last run
    val multi = VideoMp4.mp4Encode(4, 2, 10, 10, px, samplesPerChunk = 3)
    val bomb = patched(patched(patched(multi, 4, 0L), 16, 0L),
      12, Int.MaxValue.toLong)
    assert(VideoMp4.mp4Decode(bomb, 1) === null)
    // non-increasing first_chunk with positive spc also nulls
    assert(VideoMp4.mp4Decode(patched(multi, 12, 1L), 1) === null)
    // and the untouched two-run encode still decodes (guards are not
    // over-eager)
    assert(VideoMp4.mp4Decode(multi, 1) != null)
  }
}
