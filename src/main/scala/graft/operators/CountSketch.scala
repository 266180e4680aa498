package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-Sketch (Charikar–Chen–Farach-Colton) over integer-hashed
  * items — the SIGNED sibling of [[CountMin]]: each of d rows hashes
  * an item to a bucket AND a ±1 sign; counters accumulate signs, and
  * a point estimate is the MEDIAN over rows of sign·counter. Where
  * CMS only ever overcounts (estimate ≥ truth, bias +εN), Count-
  * Sketch is UNBIASED: colliding keys cancel in expectation, errors
  * run both directions with |error| ≤ ‖f‖₂/√w per row w.h.p. — the
  * right sketch when under-estimates are acceptable but bias isn't
  * (frequency-difference monitoring, heavy-hitter deltas). d is odd
  * so the median is a plain middle element: pure integer counting +
  * one exact sort of d longs — contents oracle bit-exact, the
  * [[Kmv]]/[[CountMin]] deterministic-sketch discipline.
  *
  * Scale shape: identical to CMS — one hash-agg with a d·w-bounded
  * key space regardless of corpus size, counters mergeable by
  * addition (signs are fixed per key), so shard sketches fold without
  * re-reading rows, and the streaming twin ([[graft.streaming
  * .StreamCountSketch]]) is bit-identical by construction.
  */
object CountSketch {

  /** Independent row-hash constants (disjoint from CMS's so the two
    * sketches on the same corpus don't share collision patterns);
    * 5 rows — an odd depth keeps the median exact.
    */
  private val HashA = Seq(37L, 137L, 1033L, 10009L, 100003L)
  private val HashB = Seq(11L, 111L, 1111L, 11111L, 111111L)
  private val SignA = Seq(61L, 163L, 1063L, 10061L, 100069L)
  private val SignB = Seq(5L, 55L, 555L, 5555L, 55555L)

  def maxDepth: Int = HashA.length

  private def bucket(h: org.apache.spark.sql.Column, i: Int, w: Int) =
    pmod(pmod(h * lit(HashA(i)) + lit(HashB(i)), lit(1000003L)), lit(w.toLong))

  /** ±1 sign: parity of an independent congruential hash. */
  private def sign(h: org.apache.spark.sql.Column, i: Int) =
    lit(1L) - lit(2L) *
      pmod(pmod(h * lit(SignA(i)) + lit(SignB(i)), lit(1000003L)), lit(2L))

  /** SQL text of the bucket / sign functions (for oracles). */
  def bucketSql(hExpr: String, i: Int, w: Int): String =
    s"((($hExpr) * ${HashA(i)} + ${HashB(i)}) % 1000003) % $w"
  def signSql(hExpr: String, i: Int): String =
    s"1 - 2 * (((($hExpr) * ${SignA(i)} + ${SignB(i)}) % 1000003) % 2)"

  /** JVM twins for the streaming state path — floorMod everywhere so
    * Long-overflowing inputs still match the Column pmod
    * (the [[CountMin.bucketOf]] rationale).
    */
  def bucketOf(h: Long, i: Int, w: Int): Long =
    Math.floorMod(Math.floorMod(h * HashA(i) + HashB(i), 1000003L), w.toLong)
  def signOf(h: Long, i: Int): Long =
    1L - 2L * Math.floorMod(
      Math.floorMod(h * SignA(i) + SignB(i), 1000003L), 2L)

  /** d×w signed-counter table: (row, bucket, cnt = Σ sign). */
  def counters(items: DataFrame, hashCol: String, d: Int, w: Int)
      : DataFrame = {
    require(d >= 1 && d <= maxDepth && d % 2 == 1 && w >= 2,
      "need odd d <= maxDepth, w >= 2")
    val rows = (0 until d).map { i =>
      items.select(lit(i).as("row"), bucket(col(hashCol), i, w).as("bucket"),
        sign(col(hashCol), i).as("sgn"))
    }.reduce(_ unionByName _)
    rows.groupBy(col("row"), col("bucket"))
      .agg(sum(col("sgn")).as("cnt"))
  }

  /** Point estimates: median over the d rows of sign·counter (0 for
    * an untouched bucket) — the exact middle element of the sorted d
    * values, bit-reproducible in any engine.
    */
  def estimate(ctrs: DataFrame, probes: DataFrame, hashCol: String,
      d: Int, w: Int): DataFrame = {
    require(d >= 1 && d <= maxDepth && d % 2 == 1 && w >= 2)
    val probed = (0 until d).map { i =>
      probes.select(col("*"),
        lit(i).as("row"), bucket(col(hashCol), i, w).as("bucket"),
        sign(col(hashCol), i).as("sgn"))
    }.reduce(_ unionByName _)
    val keyCols = probes.columns.toSeq
    probed.join(ctrs, Seq("row", "bucket"), "left")
      .na.fill(0L, Seq("cnt"))
      .select((keyCols.map(col) :+ (col("sgn") * col("cnt")).as("est")): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(element_at(array_sort(collect_list(col("est"))), (d + 1) / 2)
        .as("cs_est"))
  }
}
