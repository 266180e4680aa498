package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-Min sketch over integer-hashed items — point-frequency
  * estimates at FIXED memory (d rows × w buckets of long counters),
  * the frequency-sketch companion to [[Kmv]]'s set sketch: like KMV
  * and unlike HLL, the sketch CONTENTS are a deterministic function
  * of the input (pure integer counting), so estimates oracle
  * bit-exact and the CMS guarantee (estimate ≥ true count, overcount
  * ≤ εN with probability 1−δ at w = e/ε, d = ln 1/δ) is VISIBLE in
  * the output instead of asserted.
  *
  * Scale shape: building the counters is one hash-agg whose key
  * space is d·w REGARDLESS of corpus size (vs the vocab-sized state
  * exact counting needs); counters are mergeable by addition, so
  * shard-level sketches fold without re-reading rows — the streaming
  * / distributed frequency-monitoring primitive.
  */
object CountMin {

  /** Deterministic row-hash constants (odd multipliers + offsets,
    * mixed through the 1000003 prime before the bucket mod — the
    * [[Similarity.planeComponent]] recipe).
    */
  private val HashA = Seq(31L, 131L, 1031L, 10007L)
  private val HashB = Seq(7L, 77L, 777L, 7777L)

  def maxDepth: Int = HashA.length

  private def bucket(h: org.apache.spark.sql.Column, i: Int, w: Int) =
    pmod(pmod(h * lit(HashA(i)) + lit(HashB(i)), lit(1000003L)), lit(w.toLong))

  /** SQL text of the same bucket function (for oracles). */
  def bucketSql(hExpr: String, i: Int, w: Int): String =
    s"((($hExpr) * ${HashA(i)} + ${HashB(i)}) % 1000003) % $w"

  /** The same bucket function on the JVM (for the streaming twin's
    * per-row state updates). floorMod on both reductions matches the
    * Column path's pmod even when `h * HashA(i)` overflows Long and
    * goes negative (e.g. a masked xxhash64 input ≥ ~9.2e14), so the
    * stream stays bit-identical to the batch counters on the full
    * Long domain, not just rollingHash's < 1e9+7 range.
    * StreamCountMinSpec pins the stream ≡ batch counter equality.
    */
  def bucketOf(h: Long, i: Int, w: Int): Long =
    Math.floorMod(Math.floorMod(h * HashA(i) + HashB(i), 1000003L), w.toLong)

  /** d×w counter table from item rows: output (row, bucket, cnt) —
    * one hash agg with a d·w-bounded key space.
    */
  def counters(items: DataFrame, hashCol: String, d: Int, w: Int)
      : DataFrame = {
    require(d >= 1 && d <= maxDepth && w >= 2)
    val rows = (0 until d).map { i =>
      items.select(lit(i).as("row"), bucket(col(hashCol), i, w).as("bucket"))
    }.reduce(_ unionByName _)
    rows.groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for probe keys: min over the d counters each key
    * hashes into (0 for an untouched bucket). Probes must carry the
    * same integer hash column the sketch ingested.
    */
  def estimate(ctrs: DataFrame, probes: DataFrame, hashCol: String,
      d: Int, w: Int): DataFrame = {
    require(d >= 1 && d <= maxDepth && w >= 2)
    val probed = (0 until d).map { i =>
      probes.select(col("*"),
        lit(i).as("row"), bucket(col(hashCol), i, w).as("bucket"))
    }.reduce(_ unionByName _)
    val keyCols = probes.columns.toSeq
    probed.join(ctrs, Seq("row", "bucket"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy(keyCols.map(col): _*)
      .agg(min(col("cnt")).as("cms_est"))
  }
}
