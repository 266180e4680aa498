package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT frequent-items ("heavy hitters") without a full-cardinality
  * shuffle — the operator that finds the frequent tokens/n-grams of a
  * 100 TB corpus where a plain `groupBy(token).count` must shuffle
  * every distinct token (billions of keys) just to discard almost all
  * of them.
  *
  * Two passes, both bounded:
  *   1. per-partition MISRA-GRIES summaries of capacity k (classic
  *      decrement-on-overflow; O(k) memory per task). The merged
  *      candidate union has the MG guarantee: any item with global
  *      count > n/(k+1) survives in at least one partition summary —
  *      so with k ≥ margin/minFreq (margin ≥ 1), every item at or
  *      above the minFreq·n support threshold is a candidate. The
  *      collected candidate set is ≤ P·k rows (KBs), NOT the vocab.
  *   2. exact recount of ONLY the candidates (broadcast semi join on
  *      the token scan) and threshold filter — so the output is
  *      EXACT, not approximate: the sketch only prunes the shuffle
  *      key space, never the answer. (The candidate pass runs over
  *      native shingle HASHES — see frequentText.)
  *
  * The support threshold is a FRACTION (minFreq) rather than an
  * absolute count so the guarantee `n/(k+1) < minFreq·n` is
  * scale-free: the same parameters hold at sf0.01 and at 100 TB.
  */
object HeavyHitters {

  /** Tokens occurring in ≥ ceil(minFreq·n) of the n total token
    * occurrences of `textCol`, with exact counts.
    * Output: token, cnt — ordered by token.
    */
  def frequentTokens(docs: DataFrame, textCol: String, minFreq: Double,
      margin: Double = 2.0): DataFrame =
    frequentText(docs, textCol, 1, minFreq, margin)
      .select(col("item").as("token"), col("cnt"))

  /** Word n-gram shingles above the support threshold — the
    * boilerplate / stop-shingle detector: SCALE.md's Jaccard scale
    * note names "stop-shingle capping" as the knob when a shingle's
    * document frequency explodes, and this is the operator that finds
    * those shingles without shuffling the full shingle vocabulary.
    * Output: shingle, cnt — ordered by shingle.
    */
  def frequentShingles(docs: DataFrame, textCol: String, n: Int,
      minFreq: Double, margin: Double = 2.0): DataFrame =
    frequentText(docs, textCol, n, minFreq, margin)
      .select(col("item").as("shingle"), col("cnt"))

  /** Text fast path: the Misra-Gries candidate pass runs over the
    * NATIVE codegen shingle-hash arrays (no string materialization,
    * LongMap counters); only the recount pass materializes shingle
    * strings, and it joins them to the candidate hashes via the same
    * rolling hash. A hash collision can only ADD a false candidate —
    * the exact string-level recount still decides — so exactness is
    * unaffected. Halves the operator's cost (strings built once).
    */
  private def frequentText(docs: DataFrame, textCol: String, n: Int,
      minFreq: Double, margin: Double = 2.0): DataFrame = {
    require(minFreq > 0 && minFreq < 1, "minFreq must be in (0,1)")
    require(margin >= 1.0, "margin must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val k = math.ceil(margin / minFreq).toInt
    // the operator's whole shape is per-PARTITION summaries — restore
    // scan splits when the source is a single local file (no-op on a
    // real multi-file dataset)
    val d = graft.core.Scan.fanOut(docs)

    // pass 1 over hashes: (0, candidateHash, mgCount) rows + one
    // (1, 0, np) occurrence-count marker per partition
    val summaries: Array[(Long, Long, Long)] = d
      .select(explode(graft.functions.TextFns
        .shingleHashes(col(textCol), n)).as("h"))
      .as[Long]
      .mapPartitions { it =>
        val counters = scala.collection.mutable.LongMap.empty[Long]
        var np = 0L
        it.foreach { h =>
          np += 1L
          if (counters.contains(h)) counters(h) += 1L
          else if (counters.size < k) counters(h) = 1L
          else counters.keys.toArray.foreach { key =>
            if (counters(key) == 1L) counters.remove(key)
            else counters(key) -= 1L
          }
        }
        counters.iterator.map { case (h, c) => (0L, h, c) } ++
          Iterator.single((1L, 0L, np))
      }(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
      .collect()

    val n0 = summaries.collect { case (1L, _, np) => np }.sum
    val threshold = math.ceil(minFreq * n0).toLong
    require(n0 == 0 || n0.toDouble / (k + 1) < threshold,
      s"capacity k=$k too small for minFreq=$minFreq at n=$n0")
    // MERGE the per-partition summaries into one capacity-k summary
    // (Agarwal et al., Mergeable Summaries: sum counts per key, then
    // subtract the (k+1)-th largest and keep the positive remainder).
    // The merged summary keeps the MG error bound n/(k+1), so every
    // true heavy hitter survives — and pass 2's candidate set stays
    // ≤ k rows no matter how many partitions pass 1 ran on (P·k
    // candidates would multiply the recount's join work for nothing).
    val merged = scala.collection.mutable.LongMap.empty[Long]
    summaries.foreach { case (tag, h, c) =>
      if (tag == 0L) merged(h) = merged.getOrElse(h, 0L) + c
    }
    val capped =
      if (merged.size <= k) merged.keys.toSeq
      else {
        val kth = merged.values.toArray.sorted(Ordering[Long].reverse)(k)
        merged.iterator.collect { case (h, c) if c > kth => h }.toSeq
      }
    // pass 2: the native filter expression re-hashes each window and
    // materializes the string ONLY when its hash is a candidate — no
    // broadcast join, no strings for the ~95%+ of windows that can't
    // win. (The earlier semi-join shape built every shingle string and
    // hashed it a second time just to discard it.) Collisions only ADD
    // false survivors, whose exact string counts the threshold filter
    // still judges.
    d.select(explode(graft.functions.TextFns
        .shingleFilter(col(textCol), n, capped.toArray)).as("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .orderBy(col("item"))
  }

}
