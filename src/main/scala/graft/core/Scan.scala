package graft.core

import org.apache.spark.sql.DataFrame

/** Scan-parallelism helpers. */
object Scan {

  /** Restore scan-stage parallelism ahead of compute-heavy narrow
    * work when the source collapses to fewer splits than cores.
    *
    * Why it exists: a parquet scan parallelizes by file/row-group
    * splits. The local bench tables are single-file single-row-group
    * (TESTDATA.md), so Spark's split planner yields ONE task and the
    * per-row work that follows — JSON parsing, shingle hashing,
    * sketch building, all-pairs scoring — runs serial no matter how
    * many cores the session has. On a real dataset the file count
    * provides the splits and this helper is a NO-OP (guarded by the
    * partition count, not a blind repartition), so cluster plans are
    * unchanged. When it does fire it costs one round-robin shuffle of
    * the raw rows — only worth paying ahead of genuinely expensive
    * per-row pipelines, never ahead of a plain aggregate scan.
    *
    * The guard fires only below HALF the core count (2× hysteresis,
    * deliberate): at ≥ cores/2 splits the scan already keeps most of
    * the machine busy, while an explicit repartition would pin the
    * partition count and disable AQE's downstream coalescing — the
    * measured regression case (q25/q45, round 5) that motivated the
    * margin.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= want) df
    else df.repartition(want)
  }
}
