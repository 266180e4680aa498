package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** File-level Bloom-filter data skipping — the point-lookup
  * counterpart of min/max pruning (ZOrder / Hilbert): when the probe
  * column is NOT the layout key, every file's [min,max] straddles the
  * probe value and zone maps prune nothing; a small per-file Bloom
  * filter over that column prunes all files whose filter lacks any of
  * the key's bits (no false negatives, tunable false-positive rate).
  * This is the index shape lakehouse formats attach to parquet files.
  *
  * Determinism: bit positions come from double hashing with fixed
  * integer constants mod 1e9+7 — h_i(key) = (h1 + i·h2) mod m — pure
  * BIGINT arithmetic reproducible in ANSI SQL, so the filter contents
  * (and therefore every skip decision) are bit-identical cross-engine
  * and partition-count invariant.
  *
  * Shape at scale: the filter "build" is distinct (file, bit) rows —
  * bounded by files × mBits regardless of row count, with the
  * distinct's partial aggregation collapsing duplicate bits map-side.
  * The probe is an equi-join keyed on bit position against the probe
  * set's exploded bits: no per-file scan of data, no driver state.
  */
object BloomSkip {

  private val P = 1000000007L

  /** The k bit positions (array<long>, possibly with duplicates) a
    * key sets in an m-bit filter: double hashing h1 + i·h2 mod m with
    * h2 ∈ [1, m-1] so stride 0 is impossible. Key must be
    * non-negative (audited domains here are synthetic surrogate keys).
    */
  def bits(key: Column, mBits: Int, k: Int): Column = {
    require(mBits > 1 && k >= 1)
    val kp = key.cast("long") % P
    val h1 = (kp * lit(2654435761L)) % P % mBits
    val h2 = (kp * lit(40503L) + lit(2147483647L)) % P % (mBits - 1) + lit(1L)
    array((0 until k).map(i => (h1 + lit(i.toLong) * h2) % mBits): _*)
  }

  /** Per-file Bloom contents as distinct (file, bit) rows. */
  def fileBits(df: DataFrame, fileCol: String, keyCol: String,
      mBits: Int, k: Int): DataFrame =
    df.select(col(fileCol).as("f"),
        explode(array_distinct(bits(col(keyCol), mBits, k))).as("bit"))
      .distinct()

  /** (probe, file) pairs the filters PASS: every distinct bit of the
    * probe key is present in the file's filter. `probes` must carry a
    * `probe` key column; extra columns are preserved.
    */
  def probePass(fBits: DataFrame, probes: DataFrame,
      mBits: Int, k: Int): DataFrame = {
    val carry = probes.columns.map(col).toSeq
    // Per-row probe id BEFORE the explode: duplicate probe rows
    // (identical carry values) must each match independently — without
    // it their exploded bits merge in the groupBy and nm = 2·nb never
    // equals nb, silently dropping BOTH copies (a false negative).
    // The id is ephemeral (grouping only, dropped from the output), so
    // its partition-dependence never reaches a result.
    val pb = probes
      .withColumn("__pid", monotonically_increasing_id())
      .withColumn("pbits", array_distinct(bits(col("probe"), mBits, k)))
      .select(carry :+ col("__pid") :+ size(col("pbits")).as("nb")
        :+ explode(col("pbits")).as("bit"): _*)
    pb.join(fBits, Seq("bit"))
      .groupBy(carry :+ col("__pid") :+ col("f") :+ col("nb"): _*)
      .agg(count(lit(1)).as("nm"))
      .filter(col("nm") === col("nb"))
      .select(carry :+ col("f"): _*)
  }
}
