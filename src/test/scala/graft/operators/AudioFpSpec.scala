package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Haitsma–Kalker audio fingerprint lanes: gain invariance (the HK
  * robustness claim, exact for power-of-two gain in IEEE), the banded
  * join's lossless pigeonhole vs brute-force hamming, frame-count
  * accounting, and the undecodable/too-short payload contract.
  */
class AudioFpSpec extends SparkSpec {

  private val COEFFS =
    Seq(1.9, 1.5, 1.0, 0.5, 0.0, -0.5, -1.0, -1.5, -1.9)
  private val FRAME = 16
  private val HOP = 6

  /** 16-bit mono PCM WAV with the given samples. */
  private def wav(samples: Array[Int]): Array[Byte] = {
    val n = samples.length
    val out = new Array[Byte](44 + 2 * n)
    def put(o: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(out, o)
    def le32(o: Int, x: Int): Unit = {
      out(o) = x.toByte; out(o + 1) = (x >> 8).toByte
      out(o + 2) = (x >> 16).toByte; out(o + 3) = (x >> 24).toByte
    }
    def le16(o: Int, x: Int): Unit = {
      out(o) = x.toByte; out(o + 1) = (x >> 8).toByte
    }
    put(0, "RIFF"); le32(4, 36 + 2 * n); put(8, "WAVE"); put(12, "fmt ")
    le32(16, 16); le16(20, 1); le16(22, 1); le32(24, 8000)
    le32(28, 16000); le16(32, 2); le16(34, 16)
    put(36, "data"); le32(40, 2 * n)
    samples.indices.foreach(i => le16(44 + 2 * i, samples(i) & 0xFFFF))
    out
  }

  /** q308's planted-structure synth: class k = doc div 8 picks offset
    * and slope, variant v = doc mod 8 adds a spike at t = 40.
    */
  private def hkSamples(doc: Long): Array[Int] = {
    val k = doc / 8
    val v = doc % 8
    Array.tabulate(64)(t =>
      ((k * 53 + (17 + 3 * (k % 29)) * t) % 2003 - 1001 +
        (if (t == 40) 8 * v else 0)).toInt)
  }

  private def fpsOf(rows: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    Multimodal.audioFingerprints(
        rows.toDF("media_id", "content"), COEFFS, FRAME, HOP)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
  }

  test("64 samples at frame 16 / hop 6 give 9 frames and 64 real bits") {
    val m = fpsOf(Seq(7L -> wav(hkSamples(7L))))
    assert(m(7L)._1 === 9)
    assert(m(7L)._2.isDefined)
  }

  test("power-of-two gain leaves the fingerprint unchanged") {
    // doubling every sample scales every Goertzel state by exactly 2
    // (multiplication by 2 is exact in IEEE, the recurrence is
    // linear), so every energy scales by exactly 4 and every
    // sign-of-delta bit is preserved — the HK gain-robustness claim,
    // made exact
    val base = hkSamples(3L)
    val m = fpsOf(Seq(1L -> wav(base), 2L -> wav(base.map(_ * 2))))
    assert(m(1L)._2 === m(2L)._2)
  }

  test("too-short and undecodable payloads yield null afp") {
    val m = fpsOf(Seq(
      1L -> wav(Array.tabulate(8)(_ * 3)),
      2L -> "not audio at all".getBytes("US-ASCII"),
      3L -> wav(hkSamples(3L))))
    assert(m(1L)._2 === None)
    assert(m(2L)._2 === None)
    assert(m(3L)._2.isDefined)
  }

  test("banded pair join is lossless vs brute-force hamming (no cap)") {
    import spark.implicits._
    val media = (0L until 40L).map(d => d -> wav(hkSamples(d)))
    val fps = fpsOf(media).collect { case (id, (_, Some(f))) => id -> f }
    val brute = (for {
      (a, fa) <- fps.toSeq; (b, fb) <- fps.toSeq if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (a, b, h)).toSet
    val banded = Dedup.audioNearDupPairs(media.toDF("media_id", "content"),
        COEFFS, FRAME, HOP, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded === brute)
    assert(brute.nonEmpty, "fixture must contain real near-dups")
    // and the planted structure is non-trivial: some in-class pairs
    // exceed the cutoff (the filter bites)
    val all = for {
      (a, fa) <- fps.toSeq; (b, fb) <- fps.toSeq if a < b && a / 8 == b / 8
    } yield java.lang.Long.bitCount(fa ^ fb)
    assert(all.exists(_ > 3), "every in-class pair under the cutoff")
  }

  test("fingerprint is partition-invariant (pure function of bytes)") {
    import spark.implicits._
    val media = (0L until 24L).map(d => d -> wav(hkSamples(d)))
    val one = Multimodal.audioFingerprints(
      media.toDF("media_id", "content").repartition(1),
      COEFFS, FRAME, HOP).collect().map(r => (r.getLong(0), r.getLong(2)))
      .toSet
    val many = Multimodal.audioFingerprints(
      media.toDF("media_id", "content").repartition(13),
      COEFFS, FRAME, HOP).collect().map(r => (r.getLong(0), r.getLong(2)))
      .toSet
    assert(one === many)
  }
}
