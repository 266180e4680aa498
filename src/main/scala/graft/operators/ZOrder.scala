package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) multi-column clustering for data skipping —
  * the layout optimization behind lakehouse OPTIMIZE ZORDER BY: rows
  * close in the z-curve are close in EVERY clustered dimension, so
  * per-file min/max statistics prune files for predicates on any of
  * the clustered columns, not just the leading sort key.
  *
  * Pipeline: quantile-bucket each column into 2^bits ranks (boundary
  * list comes from one approxQuantile pass and folds into the scan as
  * a literal comparison chain — no per-row lookup join), interleave
  * the rank bits into the z-value, range-partition + sort by it, drop
  * it on write. Cost at 100 TB: one stats pass + one range shuffle —
  * identical shape to a plain global sort.
  */
object ZOrder {

  /** Interleave the low `bitsPerCol` bits of each (already bucketed)
    * column: bit b of column i lands at position b·ncols + i.
    */
  def interleave(ranks: Seq[Column], bitsPerCol: Int): Column = {
    require(ranks.size * bitsPerCol <= 63, "z-value must fit a long")
    val terms = for {
      b <- 0 until bitsPerCol
      (c, i) <- ranks.zipWithIndex
    } yield shiftleft(
      shiftright(c.cast("long"), b).bitwiseAND(lit(1L)),
      b * ranks.size + i)
    terms.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Bucket each numeric column into [0, 2^bits) by its approximate
    * quantiles, as literal comparison chains (codegen-friendly; the
    * boundary arrays are tiny and ride the plan, not a join). ONE
    * multi-column approxQuantile pass computes every column's
    * boundaries — one stats scan total, not one per clustered column.
    */
  def quantileRanks(df: DataFrame, cols: Seq[String], bits: Int): Seq[Column] = {
    val n = (1 << bits) - 1
    val probs = (1 to n).map(_.toDouble / (n + 1)).toArray
    val bounds = df.stat.approxQuantile(cols.toArray, probs, 0.001)
    cols.zip(bounds).map { case (c, bs) =>
      bs.distinct.toSeq.map(b => when(col(c) > b, 1L).otherwise(0L))
        .reduceOption(_ + _).getOrElse(lit(0L))
    }
  }

  /** Single-column convenience over [[quantileRanks]]. */
  def quantileRank(df: DataFrame, colName: String, bits: Int): Column =
    quantileRanks(df, Seq(colName), bits).head

  /** Cluster `df` along `cols` into `numPartitions` z-ordered ranges.
    * Written out 1 file per partition, each file's min/max envelope in
    * every clustered column is tight — the property file-skipping
    * needs.
    */
  def cluster(df: DataFrame, cols: Seq[String], bitsPerCol: Int,
      numPartitions: Int): DataFrame = {
    val z = interleave(quantileRanks(df, cols, bitsPerCol), bitsPerCol)
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Per-partition min/max of each column — the skipping statistics a
    * lakehouse writer persists per file (partitions map 1:1 to files
    * on write). Row: (partition_id, <col>_min, <col>_max, ...).
    */
  def partitionStats(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(spark_partition_id().as("pid") +: cols.map(col): _*)
      .groupBy(col("pid"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c =>
          Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))): _*)

  /** Count the partitions whose [min,max] envelope intersects a range
    * predicate lo <= c <= hi — i.e. how many files a reader must scan.
    */
  def partitionsHit(stats: DataFrame, colName: String, lo: Long,
      hi: Long): Long =
    stats.filter(col(s"${colName}_max") >= lo && col(s"${colName}_min") <= hi)
      .count()
}
