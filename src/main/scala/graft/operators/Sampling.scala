package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling. Membership is a pure function of
  * the row's key — no RNG state — so samples are reproducible across
  * runs and engines, stable under repartitioning, and consistent
  * between tables sharing the key. That is the property a training
  * pipeline needs for train/eval splits: `sample(seed)` in Spark is
  * per-partition positional and changes when the input re-splits;
  * hash-of-key membership never does.
  *
  * Scale (100 TB): every operator here is a narrow per-row predicate
  * inside the scan — no shuffle, no sort, composes with parquet column
  * pruning like any filter.
  */
object Sampling {

  /** Congruential slot in [0, den): ((key+1)·A mod P) mod den with the
    * engine's standard portable constants (A = 2654435761 Knuth
    * multiplier, P = 1000003 prime). Integer-only, expressible in any
    * SQL dialect.
    */
  def slot(key: Column, den: Int): Column =
    (((key.cast("long") + lit(1L)) * lit(2654435761L)) % lit(1000003L)) % lit(den)
  def slotSql(x: String, den: Int): String =
    s"(((CAST($x AS BIGINT) + 1) * 2654435761) % 1000003) % $den"

  /** Keep ~num/den of rows, decided by the key hash. */
  def hashSample(df: DataFrame, keyCol: String, num: Int, den: Int): DataFrame =
    df.filter(slot(col(keyCol), den) < num)

  /** Per-stratum sampling rates (num out of den), with a default rate
    * for strata not listed. One CASE chain — still a scan-time filter.
    */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Int], defaultNum: Int, den: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultNum): Column) {
      case (acc, (stratum, num)) =>
        when(col(strataCol) === stratum, lit(num)).otherwise(acc)
    }
    df.filter(slot(col(keyCol), den) < rate)
  }

  /** Disjoint deterministic split: rows with slot < evalPerMille are
    * "eval", the rest "train". The same key always lands on the same
    * side, on any engine, at any partitioning.
    */
  def trainEvalSplit(df: DataFrame, keyCol: String,
      evalPerMille: Int): DataFrame =
    df.withColumn("split",
      when(slot(col(keyCol), 1000) < evalPerMille, lit("eval"))
        .otherwise(lit("train")))
}
