package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles via window ranks — same semantics as
  * Spark's `percentile` / DuckDB's `quantile_cont`
  * (pos = p·(n−1), result = v_lo + frac·(v_hi − v_lo)) but computed
  * with ONE sort shuffle and O(1) memory per group.
  *
  * Spark's built-in exact `percentile` is an aggregate that buffers
  * every value of a group in memory — a giant skewed group at 100 TB
  * is an executor OOM. Here the values are sorted by the shuffle
  * (range-partitioned window), each row checks whether its rank is a
  * percentile boundary, and the aggregation only combines the ≤2
  * selected rows per percentile.
  */
object Percentiles {

  /** One row per group: `outNames(i)` = exact p(i)-percentile of
    * `valCol` (nulls excluded, like the built-ins).
    */
  def groupedExact(df: DataFrame, groupCol: String, valCol: String,
      ps: Seq[Double], outNames: Seq[String]): DataFrame = {
    require(ps.nonEmpty && ps.size == outNames.size)
    val byGroup = Window.partitionBy(col(groupCol))
    val ranked = df
      .filter(col(valCol).isNotNull)
      .select(col(groupCol), col(valCol).cast("double").as("__v"))
      .withColumn("__rn", row_number().over(byGroup.orderBy(col("__v"))))
      .withColumn("__n", count(lit(1)).over(byGroup))
    val aggs = ps.zip(outNames).map { case (p, name) =>
      // 1-based boundary ranks for pos = 1 + p·(n−1)
      val pos = lit(1.0) + lit(p) * (col("__n") - lit(1)).cast("double")
      val lo = floor(pos)
      val hi = ceil(pos)
      val frac = pos - lo
      val vLo = sum(when(col("__rn") === lo, col("__v")).otherwise(lit(0.0)))
      val vHi = sum(when(col("__rn") === hi, col("__v")).otherwise(lit(0.0)))
      // v_lo + frac·(v_hi − v_lo); frac is group-constant, recover
      // with max. lo==hi ⇒ frac=0 ⇒ exactly v_lo.
      (vLo + max(frac) * (vHi - vLo)).as(name)
    }
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
