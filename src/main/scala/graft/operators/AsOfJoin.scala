package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the LATEST right row of the
  * same key with right.ts ≤ left.ts (inclusive) — the time-series
  * "most recent fact as of this moment" join Spark has no native
  * operator for (DuckDB/Pandas call it ASOF JOIN).
  *
  * Spark-first composition (custom-operator ladder step (a) — no
  * custom plan node needed): tag and union both sides, sort each key's
  * timeline once (right rows win ties so ≤ is inclusive), and carry
  * the last-seen right values forward with last(_, ignoreNulls) over
  * the running window. Cost: ONE shuffle on the key + one sort —
  * identical shape to a window aggregate, no range-explosion, no
  * per-row probe. At 100 TB the timeline sort is the same
  * hash-partitioned sort any windowed op pays.
  *
  * Right rows must be unique per (key, ts) — pre-dedup with
  * Dedup.keepLatest otherwise (ties inside the right side would be
  * nondeterministic in any engine).
  */
object AsOfJoin {

  /** `rightCols`: right-side columns to carry (emitted as
    * `asof_<name>`, null when no right row precedes the left row).
    * `tsCol` must be orderable (timestamp or numeric epoch).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTag = left
      .withColumn("__r", lit(0))
      .select(Seq(col(keyCol), col(tsCol), col("__r")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col) ++
        rightCols.map(c => lit(null).cast(
          right.schema(c).dataType).as(s"asof_$c")): _*)
    val rTag = right
      .withColumn("__r", lit(1))
      .select(Seq(col(keyCol), col(tsCol), col("__r")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c).as(s"asof_$c")): _*)
    // right rows sort BEFORE left rows at equal ts ⇒ inclusive ≤
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(lTag.unionByName(rTag)) { (df, c) =>
      df.withColumn(s"asof_$c",
        last(when(col("__r") === 1, col(s"asof_$c")), ignoreNulls = true).over(w))
    }
    carried.filter(col("__r") === 0)
      .select(leftCols.map(col) ++ rightCols.map(c => col(s"asof_$c")): _*)
  }
}
