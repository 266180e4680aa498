package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoders, Row}
import graft.SparkSpec

/** Perceptual-hash image near-dup: analytic fingerprint signs on step
  * images (q152's closed form), PNG/BMP codec agreement, the banded
  * join's lossless pigeonhole vs brute-force hamming, and the
  * undecodable-payload contract.
  */
class PhashSpec extends SparkSpec {

  private val N = 64

  /** Step-image luma: 16 + 96·[x ≥ 2px] + 96·[y ≥ 2py]. */
  private def stepVal(px: Int, py: Int)(x: Int, y: Int): Int =
    16 + (if (x >= 2 * px) 96 else 0) + (if (y >= 2 * py) 96 else 0)

  /** q152's closed-form fingerprint for a step image. */
  private def analytic(px: Int, py: Int): Long = {
    var h = 1L
    for (u <- 1 to 7) if ((u * px) % 64 > 32) h |= 1L << u
    for (v <- 1 to 7) if ((v * py) % 64 > 32) h |= 1L << (8 * v)
    h
  }

  private def pngOf(v: (Int, Int) => Int): Array[Byte] = {
    val px = Array.tabulate(N * N * 3) { i =>
      val p = i / 3
      v(p % N, p / N).toByte
    }
    Multimodal.pngEncode(Multimodal.PngImage(N, N, 3, px), _ % 5,
      new java.util.zip.Deflater())
  }

  private def bmpOf(v: (Int, Int) => Int): Array[Byte] = {
    val rowSize = ((3 * N + 3) / 4) * 4
    val out = new Array[Byte](54 + rowSize * N)
    def putLe32(o: Int, x: Int): Unit = {
      out(o) = x.toByte; out(o + 1) = (x >> 8).toByte
      out(o + 2) = (x >> 16).toByte; out(o + 3) = (x >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putLe32(2, out.length); putLe32(10, 54); putLe32(14, 40)
    putLe32(18, N); putLe32(22, N); out(26) = 1; out(28) = 24
    for (y <- 0 until N; x <- 0 until N) {
      val p = 54 + (N - 1 - y) * rowSize + x * 3
      val vv = v(x, y).toByte
      out(p) = vv; out(p + 1) = vv; out(p + 2) = vv
    }
    out
  }

  private def hashOf(bytes: Array[Byte]): Long = {
    val dec = Multimodal.grayDecode(bytes, new java.util.zip.Inflater())
    assert(dec != null)
    Multimodal.phash64(dec._1, dec._2, dec._3, Multimodal.phashBasis())
  }

  test("step-image fingerprints match the closed form, PNG ≡ BMP") {
    for (px <- Seq(1, 7, 15, 21, 31); py <- Seq(3, 9, 25)) {
      val expected = analytic(px, py)
      assert(hashOf(pngOf(stepVal(px, py))) === expected,
        s"PNG phash diverged at px=$px py=$py")
      assert(hashOf(bmpOf(stepVal(px, py))) === expected,
        s"BMP phash diverged at px=$px py=$py")
    }
  }

  test("non-32 source sizes resize through the same kernel") {
    // 128×96 source, steps at 4px/3py so nearest-neighbor (⌊x·w/32⌋)
    // lands back on the 32-grid steps — same closed form
    val w = 128; val h = 96
    val px = 9; val py = 19
    val pxl = Array.tabulate(w * h * 3) { i =>
      val p = i / 3; val x = p % w; val y = p / w
      (16 + (if (x >= 4 * px) 96 else 0) + (if (y >= 3 * py) 96 else 0)).toByte
    }
    val bytes = Multimodal.pngEncode(Multimodal.PngImage(w, h, 3, pxl),
      _ % 5, new java.util.zip.Deflater())
    assert(hashOf(bytes) === analytic(px, py))
  }

  test("banded pair join is lossless vs brute-force hamming (pigeonhole)") {
    import spark.implicits._
    // 40 images across 8 step classes + undecodable payloads
    val mediaEnc = Encoders.row(Multimodal.mediaSchema)
    val rows = (0 until 40).map { i =>
      val px = 2 * (i % 4) + 5
      val py = 2 * (i % 5) + 7
      val bytes =
        if (i % 7 == 6) "not an image".getBytes("UTF-8")
        else if (i % 2 == 0) pngOf(stepVal(px, py))
        else bmpOf(stepVal(px, py))
      Row(i.toLong, bytes, "image/*")
    }
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), Multimodal.mediaSchema)
    val banded = Dedup.imageNearDupPairs(media, maxHamming = 3)
      .orderBy("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // brute force over the surviving fingerprints
    val fps = Multimodal.phashFeatures(media)
      .filter(col("phash").isNotNull)
      .select("media_id", "phash")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fps.length === 40 - 5, "undecodable payloads must drop out")
    val brute = (for {
      (i1, h1) <- fps; (i2, h2) <- fps
      if i1 < i2
      h = java.lang.Long.bitCount(h1 ^ h2)
      if h <= 3
    } yield (i1, i2, h)).sortBy(p => (p._1, p._2))
    assert(banded.toSeq === brute.toSeq)
    assert(brute.nonEmpty, "crafted near-dups must surface")
    assert(brute.exists(_._3 == 0) && brute.exists(_._3 > 0),
      "both exact collisions and true near-dups expected")
    assert(brute.length < fps.length * (fps.length - 1) / 2,
      "unrelated images must NOT pair")
  }

  test("phash is partition-invariant (pure function of the bytes)") {
    val bytes = pngOf(stepVal(11, 13))
    val mediaEnc = Encoders.row(Multimodal.mediaSchema)
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0 until 8).map(i => Row(i.toLong, bytes, "image/png")), 8),
      Multimodal.mediaSchema)
    val hs = Multimodal.phashFeatures(media).select("phash")
      .collect().map(_.getLong(0)).distinct
    assert(hs.length === 1 && hs.head === analytic(11, 13))
  }
}
