package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom skipping contract: NO false negatives ever (every truly-
  * containing file passes its probe), bounded filter size, and
  * partition-count invariance of the filter contents.
  */
class BloomSkipSpec extends SparkSpec {
  import spark.implicits._

  private val M = 256
  private val K = 3

  // 3 files × disjoint key ranges
  private def data = (0L until 300L).map(k => (k / 100L, k))
    .toDF("f", "key")

  test("no false negatives: every containing (probe, file) pair passes") {
    val fb = BloomSkip.fileBits(data, "f", "key", M, K)
    val probes = (0L until 300L by 17L).toDF("probe")
    val pass = BloomSkip.probePass(fb, probes, M, K)
      .select(col("probe"), col("f")).as[(Long, Long)].collect().toSet
    val truly = (0L until 300L by 17L).map(k => (k, k / 100L)).toSet
    assert(truly.subsetOf(pass), s"missed: ${truly -- pass}")
  }

  test("absent keys pass only as bounded false positives") {
    val fb = BloomSkip.fileBits(data, "f", "key", M, K)
    val absent = (1000L until 1040L).toDF("probe")
    val nPass = BloomSkip.probePass(fb, absent, M, K).count()
    // 100 keys × ≤3 bits in a 256-bit filter → fill ≤ 0.69,
    // fp ≤ 0.34 per (probe, file); 120 pairs → generous ceiling
    assert(nPass < 60, s"fp pairs $nPass out of 120 — hash is broken")
  }

  test("duplicate probe rows each pass — no merged-bit false negative") {
    val fb = BloomSkip.fileBits(data, "f", "key", M, K)
    // the same probe value TWICE (identical carry columns): without a
    // per-row probe id the exploded bits merge, nm = 2·nb ≠ nb, and
    // BOTH copies silently vanish — a false negative.
    val dup = Seq(42L, 42L).toDF("probe")
    val pass = BloomSkip.probePass(fb, dup, M, K)
      .filter(col("f") === 0L).count()
    assert(pass === 2L, s"expected both duplicate probes to pass, got $pass")
  }

  test("filter contents bounded by mBits and partition invariant") {
    val fb = BloomSkip.fileBits(data, "f", "key", M, K)
    val perFile = fb.groupBy("f").count().as[(Long, Long)].collect().toMap
    assert(perFile.values.forall(_ <= M))
    val a = fb.collect().map(_.toString).sorted.toSeq
    val b = BloomSkip.fileBits(data.repartition(7), "f", "key", M, K)
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }

  test("bits: k positions in range, stride never zero") {
    val got = spark.range(1, 500)
      .select(BloomSkip.bits(col("id"), M, K).as("b"))
      .as[Seq[Long]].collect()
    assert(got.forall(_.forall(p => p >= 0 && p < M)))
    // distinct keys should not all collapse to one bit pattern
    assert(got.map(_.toSet).distinct.length > 100)
  }
}
