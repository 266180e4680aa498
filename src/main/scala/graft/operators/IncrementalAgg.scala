package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of pre-aggregated marts: fold a batch of
  * new fact rows into an existing aggregate WITHOUT rescanning the
  * fact table. Works for additive statistics (counts and sums; means
  * and ratios derive from them at read time — the reason the gold
  * marts store sums and counts rather than averages).
  *
  * Scale (100 TB): the delta batch aggregates first (it is the small
  * side — one day of facts against years of mart), then merges into
  * the mart with a full-outer join on the group keys. The mart is the
  * only large input and it shuffles once on its own key — or not at
  * all if it is stored bucketed by the group keys.
  */
object IncrementalAgg {

  /** Aggregate `delta` by `keys` with count + sums over `sumCols`,
    * producing mart-shaped columns: n_rows, sum_<col>.
    */
  def aggregate(facts: DataFrame, keys: Seq[String],
      sumCols: Seq[String]): DataFrame =
    facts.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sumCols.map(c => sum(col(c)).as(s"sum_$c")): _*)

  /** Merge a delta aggregate into the mart: groups present on both
    * sides add component-wise; groups on one side pass through. The
    * result is identical to re-aggregating the union of the inputs.
    */
  def refresh(mart: DataFrame, deltaFacts: DataFrame, keys: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    val addCols = "n_rows" +: sumCols.map(c => s"sum_$c")
    val dAgg = addCols.foldLeft(aggregate(deltaFacts, keys, sumCols)) {
      (df, c) => df.withColumnRenamed(c, s"__d_$c")
    }
    val merged = mart.join(dAgg, keys, "full_outer")
    val summed = addCols.map { c =>
      (coalesce(col(c), lit(0)) + coalesce(col(s"__d_$c"), lit(0))).as(c)
    }
    merged.select(keys.map(col) ++ summed: _*)
  }
}
