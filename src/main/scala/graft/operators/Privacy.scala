package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity / l-diversity release audit.
  *
  * Before a curated dataset ships, the release gate asks: can any row
  * be re-identified from its quasi-identifiers (QIs — attributes an
  * adversary can look up elsewhere: region, segment, coarse dates)?
  * The unit of risk is the EQUIVALENCE CLASS — all records sharing one
  * QI tuple. A dataset is k-anonymous when every class has ≥ k rows,
  * and l-diverse when every class carries ≥ l distinct values of the
  * sensitive attribute (k alone is defeated by a class whose sensitive
  * value is constant — the homogeneity attack).
  *
  * Shape at scale: two hash aggregations, records → classes → report
  * rows, each with map-side partial aggregation; class count is
  * bounded by the QI domain (≪ record count at 100 TB), report keys
  * by the report dimension. Nothing collects to the driver and no
  * per-record state survives the first aggregation.
  */
object Privacy {

  /** Equivalence classes of the QI tuple: one row per observed QI
    * combination with its size and sensitive-value diversity. The
    * distinct count is exact (two-phase partial_count(distinct) under
    * the hood) — an audit must not approximate the l it reports.
    */
  def classProfile(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String): DataFrame = {
    require(qiCols.nonEmpty, "k-anonymity needs at least one QI column")
    df.groupBy(qiCols.map(col): _*)
      .agg(
        count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("class_l"))
  }

  /** Per-report-key audit over the class profile.
    *
    * `reportCols` must be a subset of `qiCols` so each class rolls up
    * into exactly one report row. Emits, per report key:
    *  - n_records / n_classes
    *  - k_anonymity  = min class size (the k the release achieves)
    *  - l_diversity  = min distinct sensitive values in any class
    *  - n_risky_records = records in classes smaller than `k`
    *  - pct_risky    = that mass as a fraction (6-dp portable round)
    */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, k: Long, reportCols: Seq[String]): DataFrame = {
    require(reportCols.nonEmpty && reportCols.forall(qiCols.contains),
      s"report columns $reportCols must be a subset of QI columns $qiCols")
    val p = 1e6
    classProfile(df, qiCols, sensitiveCol)
      .groupBy(reportCols.map(col): _*)
      .agg(
        sum(col("class_size")).as("n_records"),
        count(lit(1)).as("n_classes"),
        min(col("class_size")).as("k_anonymity"),
        min(col("class_l")).as("l_diversity"),
        sum(when(col("class_size") < k, col("class_size")).otherwise(0L))
          .as("n_risky_records"))
      .withColumn("pct_risky",
        floor(col("n_risky_records").cast("double") / col("n_records")
          * lit(p) + lit(0.5)).cast("double") / lit(p))
  }
}
