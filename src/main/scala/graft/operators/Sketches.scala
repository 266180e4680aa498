package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate sketch aggregations — the 100 TB substitutes for exact
  * distinct/quantile/heavy-hitter answers: bounded memory, one pass,
  * mergeable across partitions (each is an algebraic aggregate with
  * map-side partial sketches).
  *
  * Accuracy bounds are tested against exact answers in SketchesSpec;
  * there is no DuckDB oracle for these (sketch internals differ
  * between engines by construction) — the query surface gets the
  * driver's rows-only check.
  */
object Sketches {

  /** HyperLogLog++ distinct count, relative standard deviation `rsd`
    * (Spark default 0.05). Memory O(1/rsd²) per group, independent of
    * cardinality.
    */
  def approxDistinct(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)

  /** One-pass approximate percentiles with bounded error: rank error
    * ≤ 1/accuracy of the total count.
    */
  def approxPercentiles(c: Column, percentiles: Seq[Double],
      accuracy: Int = 10000): Column =
    percentile_approx(c,
      array(percentiles.map(lit): _*), lit(accuracy))

  /** Per-group cardinality + quantile profile in one pass. */
  def cardinalityProfile(df: DataFrame, groupCol: String, distinctCol: String,
      quantileCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        approxDistinct(col(distinctCol)).as("approx_distinct"),
        approxPercentiles(col(quantileCol), Seq(0.5, 0.95, 0.99))
          .as("approx_p50_p95_p99"))
}
