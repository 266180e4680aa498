package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Snapshot diff between two corpus versions — the data-versioning
  * primitive behind "what changed between crawl N and crawl N+1":
  * release notes, incremental re-embedding (only `added`/`changed`
  * docs need new vectors), and cache invalidation all start here.
  *
  * Verdicts per id: `added` (only in the new version), `removed`
  * (only in the old), `changed` (present in both, content hash
  * differs), `unchanged`.
  *
  * Scale shape: ONE full-outer join keyed on id — and the join
  * carries (id, 8-byte content hash), never the document text, so
  * shuffle volume is rows·16B regardless of document size. The hash
  * is the portable rolling hash (mod 1e9+7, DuckDB-mirrorable);
  * at 100 TB swap in a 128-bit hash via the same column slot if the
  * birthday bound on `unchanged` false-positives matters — the
  * dataflow is unchanged.
  */
object CorpusDiff {

  /** Per-id verdicts: (idCol, status). */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).cast("long").as("__old_id"),
      TextFns.rollingHash(col(textCol)).as("__oh"))
    val n = newDf.select(col(idCol).cast("long").as("__new_id"),
      TextFns.rollingHash(col(textCol)).as("__nh"))
    o.join(n, col("__old_id") === col("__new_id"), "full_outer")
      .select(
        coalesce(col("__old_id"), col("__new_id")).as(idCol),
        when(col("__old_id").isNull, lit("added"))
          .when(col("__new_id").isNull, lit("removed"))
          .when(col("__oh") === col("__nh"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Release-notes rollup: per status, count + id range. */
  def summary(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame =
    diff(oldDf, newDf, idCol, textCol)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"),
        min(col(idCol)).as("lo"), max(col(idCol)).as("hi"))
      .orderBy(col("status"))
}
