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
    * `valCol` (nulls excluded, like the built-ins). Single-column
    * convenience over [[groupedExactMulti]].
    */
  def groupedExact(df: DataFrame, groupCol: String, valCol: String,
      ps: Seq[Double], outNames: Seq[String]): DataFrame =
    groupedExactMulti(df, groupCol, Seq((valCol, ps, outNames)))

  /** Exact percentiles of SEVERAL value columns in ONE sort pass.
    * `specs` = (valueCol, percentiles, outputNames) per column. The
    * value columns are stacked into (column-tag, value) rows, ranked
    * by a single window partitioned on (group, tag) — one shuffle and
    * one sort regardless of how many columns/percentiles are asked —
    * then recombined by a final hash aggregation on the group key.
    * A column whose group has no non-null values yields null (the
    * SQL quantile-of-empty answer).
    */
  def groupedExactMulti(df: DataFrame, groupCol: String,
      specs: Seq[(String, Seq[Double], Seq[String])]): DataFrame = {
    require(specs.nonEmpty &&
      specs.forall { case (_, ps, ns) => ps.nonEmpty && ps.size == ns.size })
    val stacked = df
      .select(col(groupCol),
        explode(array(specs.map { case (vc, _, _) =>
          struct(lit(vc).as("__vc"), col(vc).cast("double").as("__v"))
        }: _*)).as("__s"))
      .select(col(groupCol), col("__s.__vc").as("__vc"), col("__s.__v").as("__v"))
      .filter(col("__v").isNotNull)
    val byGroupCol = Window.partitionBy(col(groupCol), col("__vc"))
    val ranked = stacked
      .withColumn("__rn", row_number().over(byGroupCol.orderBy(col("__v"))))
      .withColumn("__n", count(lit(1)).over(byGroupCol))
    val aggs = specs.flatMap { case (vc, ps, names) =>
      ps.zip(names).map { case (p, name) =>
        val inCol = col("__vc") === lit(vc)
        // 1-based boundary ranks for pos = 1 + p·(n−1)
        val pos = lit(1.0) + lit(p) * (col("__n") - lit(1)).cast("double")
        val lo = floor(pos)
        val hi = ceil(pos)
        val frac = pos - lo
        val vLo = sum(when(inCol && col("__rn") === lo, col("__v")).otherwise(lit(0.0)))
        val vHi = sum(when(inCol && col("__rn") === hi, col("__v")).otherwise(lit(0.0)))
        // v_lo + frac·(v_hi − v_lo); frac is constant within (group,
        // column), recover with max over the column's rows (null —
        // hence a null percentile — when the column has no rows).
        // lo==hi ⇒ frac=0 ⇒ exactly v_lo.
        (vLo + max(when(inCol, frac)) * (vHi - vLo)).as(name)
      }
    }
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Exact percentiles of ONE value column plus arbitrary extra
    * aggregates in the SAME pass: one scan, one sort shuffle, and a
    * final hash aggregation that reuses the window's hash partitioning
    * on `groupCol` (no second exchange for the non-distinct
    * aggregates). The input's other columns flow through the ranked
    * rows, so `extra` may aggregate any of them — this is how
    * profiling queries fuse sketches with exact percentiles instead of
    * scanning the table twice and joining.
    *
    * Null `valCol` rows still reach `extra` (so count(*)/countDistinct
    * see every row) but are excluded from ranking: they sort last, the
    * boundary ranks only cover the non-null prefix, and a group with
    * no non-null values yields null percentiles (the quantile-of-empty
    * answer), exactly like [[groupedExactMulti]].
    */
  def groupedExactWithAggs(df: DataFrame, groupCol: String, valCol: String,
      ps: Seq[Double], outNames: Seq[String],
      extra: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(ps.nonEmpty && ps.size == outNames.size)
    val byGroup = Window.partitionBy(col(groupCol))
    val ranked = df
      .withColumn("__v", col(valCol).cast("double"))
      .withColumn("__rn",
        row_number().over(byGroup.orderBy(col("__v").asc_nulls_last)))
      .withColumn("__n", count(col("__v")).over(byGroup))
    val pAggs = ps.zip(outNames).map { case (p, name) =>
      val pos = lit(1.0) + lit(p) * (col("__n") - lit(1)).cast("double")
      val lo = floor(pos)
      val hi = ceil(pos)
      val frac = pos - lo
      val vLo = sum(when(col("__rn") === lo, col("__v")).otherwise(lit(0.0)))
      val vHi = sum(when(col("__rn") === hi, col("__v")).otherwise(lit(0.0)))
      (vLo + max(when(col("__v").isNotNull, frac)) * (vHi - vLo)).as(name)
    }
    val aggs = pAggs ++ extra
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
