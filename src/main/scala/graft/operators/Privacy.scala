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

  /** t-closeness audit (Li et al. 2007) for an ORDINAL sensitive
    * attribute — the third rung of the release-privacy ladder:
    * k-anonymity bounds class size, l-diversity bounds within-class
    * value variety, and t-closeness bounds how much a class's
    * sensitive-value DISTRIBUTION deviates from the global one (an
    * l-diverse class can still leak: 9 low + 1 high salary in a class
    * whose population is 50/50 tells the adversary plenty).
    *
    * Distance is the ordered-value Earth Mover's Distance
    *   EMD(p, q) = (1/(m−1)) Σ_i |P_i − Q_i|
    * over cumulative distributions on the m ordered sensitive values.
    * Computed exactly: with class cumulative counts C_i (class size s)
    * and global cumulative counts G_i (total N),
    *   |P_i − Q_i| = |C_i·N − G_i·s| / (s·N)
    * so the numerator is an exact BIGINT sum; one double division at
    * the end keeps the audit bit-exact under any partitioning.
    *
    * Shape at scale: cell counts are bounded by QI×sensitive domain;
    * the dense grid is a broadcast cross join with the m-row value
    * domain; per-class cumulatives are windows over m rows. No
    * per-record state survives the first aggregation.
    *
    * When `normalized` is set the violation gate compares the
    * noise-normalized deviation emd·√class_size against `t` instead of
    * raw emd: sampling noise makes a size-s class drift from the global
    * CDF by Θ(1/√s) even when its population distribution IS the global
    * one, so a fixed raw-t gate flags everything at small corpora and
    * nothing at large ones. The normalized statistic is scale-free
    * (measured stable within 10% from sf0.001 to sf0.1 on the testdata)
    * — the right default for an audit that must mean the same thing as
    * the corpus grows 100×. sqrt is a correctly-rounded IEEE op, so the
    * gate stays bit-portable.
    */
  def tClosenessAudit(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, t: Double, reportCols: Seq[String],
      normalized: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qiCols.nonEmpty, "t-closeness needs at least one QI column")
    require(reportCols.nonEmpty && reportCols.forall(qiCols.contains),
      s"report columns $reportCols must be a subset of QI columns $qiCols")
    val s = col(sensitiveCol)
    val cells = df.groupBy((qiCols.map(col) :+ s): _*)
      .agg(count(lit(1)).as("cnt"))
    // Global distribution: m cumulative counts + N + m, all tiny.
    val wg = Window.orderBy(s)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val glob = df.groupBy(s).agg(count(lit(1)).as("gcnt"))
      .select(s, sum(col("gcnt")).over(wg).as("gcum"))
    val tot = df.agg(count(lit(1)).as("n_total"))
    val mrow = glob.agg(count(lit(1)).as("m_vals"))
    val classes = cells.groupBy(qiCols.map(col): _*)
      .agg(sum(col("cnt")).as("class_size"))
    // Dense class × value grid so absent cells still advance the |P−Q|
    // sum (a missing value keeps C flat while G moves).
    val grid = classes
      .crossJoin(broadcast(glob.select(s))) // m rows per class
      .join(cells, qiCols :+ sensitiveCol, "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val wc = Window.partitionBy(qiCols.map(col): _*).orderBy(s)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val emd = grid
      .withColumn("ccum", sum(col("cnt")).over(wc))
      .join(broadcast(glob), Seq(sensitiveCol))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(mrow))
      .groupBy((qiCols.map(col) :+ col("class_size") :+ col("n_total")
        :+ col("m_vals")): _*)
      .agg(sum(abs(col("ccum") * col("n_total")
        - col("gcum") * col("class_size"))).as("emd_num"))
      .withColumn("emd",
        // m = 1 distinct sensitive value ⇒ EMD is trivially 0 (P = Q
        // always); the raw formula would divide by (m-1) = 0 and emit
        // NaN, which Spark orders ABOVE every threshold — flagging
        // every class as violating, the opposite of correct.
        when(col("m_vals") <= 1L, lit(0.0))
          .otherwise(col("emd_num").cast("double")
            / (col("class_size") * col("n_total")
              * (col("m_vals") - lit(1L))).cast("double")))
    val p = 1e6
    val stat =
      if (normalized) col("emd") * sqrt(col("class_size").cast("double"))
      else col("emd")
    emd.groupBy(reportCols.map(col): _*)
      .agg(
        sum(col("class_size")).as("n_records"),
        count(lit(1)).as("n_classes"),
        (floor(max(col("emd")) * lit(p) + lit(0.5)).cast("double")
          / lit(p)).as("t_max"),
        sum(when(stat > t, 1L).otherwise(0L)).as("n_violating"),
        sum(when(stat > t, col("class_size")).otherwise(0L))
          .as("n_exposed_records"))
      .withColumn("pct_exposed",
        floor(col("n_exposed_records").cast("double") / col("n_records")
          * lit(p) + lit(0.5)).cast("double") / lit(p))
  }
}
