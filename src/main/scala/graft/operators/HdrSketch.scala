package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-pass, shard-mergeable quantile sketch over non-negative longs —
  * log-linear buckets in the HdrHistogram shape (Tene's design; also
  * the bucketing idea behind DDSketch, Masson et al. VLDB 2019), made
  * fully deterministic and integer-exact so a DuckDB oracle can replay
  * it bit-for-bit.
  *
  * With `b` sub-bucket bits the bucket of a value v ≥ 0 is
  *
  *   shift = max(0, floorLog2(v) − b)
  *   idx   = shift·2^b + (v >> shift)
  *
  * floorLog2 rides `length(bin(v)) − 1` — an exact integer in both
  * engines (neither `bin` pads). The index is monotone in v, the
  * bucket [vLow, vLow + 2^shift) has relative width ≤ 2^−b, and —
  * unlike a range-fitted histogram (q239) — the mapping is
  * data-INDEPENDENT: no min/max pre-pass, so the sketch is one scan,
  * and two sketches built on different shards/corpora/days merge by
  * ADDING counts per idx. That mergeability is the 100 TB property:
  * per-shard sketches fold to a global quantile without re-scanning,
  * where exact percentiles are a global sort. Bucket count is bounded
  * by (64−b)·2^b + 2^(b+1) regardless of data volume (bounded-state
  * discipline: the sketch is always broadcastable).
  *
  * Quantile extraction is rank selection over the bucket counts: the
  * rank-r value lies INSIDE the selected bucket, so the audit
  * invariant `exact ∈ [est_low, est_low + width)` is exact, not
  * approximate — specs and oracles check it as a boolean.
  */
object HdrSketch {

  /** Bucket index column for a non-negative long column. The dynamic
    * shift amount rides `call_function` (public API since Spark 3.5)
    * instead of an `expr` SQL splice — the Hll.registers lesson.
    */
  def bucketIdx(v: Column, bits: Int): Column = {
    val flog = (length(bin(v)) - 1).cast("long")
    val shift = greatest(lit(0L), flog - bits)
    shift * (1L << bits) +
      call_function("shiftright", v, shift.cast("int"))
  }

  private def shiftOutOf(idx: Column, bits: Int): Column =
    greatest(lit(0L),
      call_function("div", idx.cast("long"), lit(1L << bits)) - 1)

  /** Inclusive lower edge of bucket `idx`. */
  def bucketLow(idx: Column, bits: Int): Column = {
    val so = shiftOutOf(idx, bits)
    val rem = idx - so * (1L << bits)
    call_function("shiftleft", rem, so.cast("int"))
  }

  /** Exclusive width of bucket `idx` (1 in the exact region). */
  def bucketWidth(idx: Column, bits: Int): Column =
    call_function("shiftleft", lit(1L), shiftOutOf(idx, bits).cast("int"))

  /** Build the sketch: one hash agg to (groupCols*, idx, cnt). */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      bits: Int): DataFrame =
    df.select(groupCols.map(col) :+
        bucketIdx(col(valueCol).cast("long"), bits).as("idx"): _*)
      .groupBy(groupCols.map(col) :+ col("idx"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge sketches that share the bucketing: add counts per bucket —
    * the shard-fold path. To collapse groups (e.g. all sources → one
    * corpus row-set), pre-rename the group columns on the input
    * (q310 does `withColumn("source", lit("__all__"))`) before
    * merging.
    */
  def merge(sketch: DataFrame, groupCols: Seq[String]): DataFrame =
    sketch.groupBy(groupCols.map(col) :+ col("idx"): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Rank-select quantiles from a sketch. `ps` are exact rationals
    * (pct label, numerator, denominator); rank = num·(n−1) div den + 1
    * (1-based lower quantile) — integer arithmetic end to end, so both
    * engines compute the identical rank. Returns one row per
    * (group, pct): n, est_low, width, n_buckets.
    */
  def quantiles(sketch: DataFrame, groupCols: Seq[String],
      ps: Seq[(Int, Long, Long)], bits: Int): DataFrame = {
    val gcols = groupCols.map(col)
    val w = Window.partitionBy(gcols: _*).orderBy(col("idx"))
    val cum = sketch
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(gcols: _*)))
      .withColumn("nb", count(lit(1)).over(Window.partitionBy(gcols: _*)))
    val perP = ps.map { case (pct, num, den) =>
      val rank =
        call_function("div", lit(num) * (col("n") - 1), lit(den)) + 1
      cum.filter(col("cum") >= rank)
        .groupBy(gcols: _*)
        .agg(min(col("idx")).as("sel_idx"),
          any_value(col("n")).as("n"),
          any_value(col("nb")).as("n_buckets"))
        .withColumn("pct", lit(pct))
    }
    perP.reduce(_ union _)
      .select(gcols ++ Seq(col("pct"), col("n"),
        bucketLow(col("sel_idx"), bits).as("est_low"),
        bucketWidth(col("sel_idx"), bits).as("width"),
        col("n_buckets")): _*)
  }
}
