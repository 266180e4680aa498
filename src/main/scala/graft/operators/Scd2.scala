package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) operators: the lakehouse
  * dimension-history primitives the reference's Delta configuration
  * implies but never exercises (its dims are full overwrites with
  * `created_at`/`updated_at` audit columns — `dim_airline.py:10-11` —
  * i.e. SCD Type 1). Two shapes:
  *
  *  - [[compressHistory]] turns per-key ORDERED SNAPSHOTS (one row per
  *    key × observation point) into effective ranges — the read-side
  *    gaps-and-islands compression, oracle-gated as q78;
  *  - [[applyBatch]] folds a CDC batch into a live SCD2 dimension
  *    (close changed rows, open new versions) — the write-side MERGE,
  *    composed with `core.VersionedTable.commit` for the snapshot
  *    protocol (spec-verified).
  *
  * Scale: compressHistory is one window shuffle on the key (state per
  * row: one lag). applyBatch joins the CURRENT slice against the
  * batch — the batch is the small side in any CDC cadence and
  * broadcasts; history rows are untouched (append-only), so cost is
  * O(|current| + |batch|) per fold, not O(|history|).
  */
object Scd2 {

  /** Compress per-key ordered snapshots into contiguous runs of
    * identical `valCols` values. Output: keyCol, run_id (1-based per
    * key), effective_from / effective_to (first/last `orderCol` of the
    * run), the value columns, n_snapshots (observations in the run).
    *
    * A run breaks when ANY value column changes (null-safe compare) —
    * re-observing the same values extends the run. Gaps in `orderCol`
    * do NOT break runs: "no snapshot" is "no information", not a
    * change (LOCF semantics, same stance as q70's gap fill).
    */
  def compressHistory(snapshots: DataFrame, keyCol: String,
      orderCol: String, valCols: Seq[String]): DataFrame = {
    require(valCols.nonEmpty)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val valueChanged = valCols
      .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _)
    val isNew = when(
      lag(col(orderCol), 1).over(w).isNull || valueChanged, lit(1L))
      .otherwise(lit(0L))
    val aggs =
      Seq(min(col(orderCol)).as("effective_from"),
        max(col(orderCol)).as("effective_to")) ++
        // constant within a run by construction
        valCols.map(c => any_value(col(c)).as(c)) :+
        count(lit(1)).as("n_snapshots")
    snapshots
      .withColumn("run_id", sum(isNew).over(running))
      .groupBy(col(keyCol), col("run_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Fold one CDC batch into an SCD2 dimension. `dim` schema: keys ++
    * attrs ++ (effective_from: long, effective_to: long nullable,
    * is_current: boolean); `updates` carries keys ++ attrs, one row
    * per key. `asOf` stamps the batch. Semantics per update row:
    * new key → insert open row; changed attrs (null-safe) → close the
    * current row at `asOf` and insert a new open row; unchanged →
    * no-op. Keys must be non-null (the usual dimension contract).
    */
  def applyBatch(dim: DataFrame, updates: DataFrame, keys: Seq[String],
      attrs: Seq[String], asOf: Long): DataFrame = {
    require(keys.nonEmpty && attrs.nonEmpty)
    val outCols = (keys ++ attrs ++
      Seq("effective_from", "effective_to", "is_current")).map(col)
    val hist = dim.filter(!col("is_current"))
    val cur = dim.filter(col("is_current"))
    val u = updates.select((keys ++ attrs).map(col): _*)
    // enforce the one-row-per-key contract EAGERLY: a double-keyed
    // batch would open two is_current rows and the corruption
    // compounds silently across every later fold. The check is one
    // small job over the batch (the small side by CDC construction).
    val Array(nRows, nKeys) = u
      .agg(count(lit(1)), count_distinct(struct(keys.map(col): _*)))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    require(nRows == nKeys,
      s"scd2 applyBatch: updates carry $nRows rows for $nKeys distinct keys " +
        "— dedupe the CDC batch to one row per key first")

    val attrsDiffer = attrs
      .map(a => !(col(s"c.$a") <=> col(s"u.$a")))
      .reduce(_ || _)
    val keyEq = keys.map(k => col(s"c.$k") === col(s"u.$k")).reduce(_ && _)
    // keys whose attrs changed this batch (small: ⊆ batch)
    val changedKeys = cur.as("c").join(broadcast(u.as("u")), keyEq)
      .filter(attrsDiffer)
      .select(keys.map(k => col(s"c.$k")): _*)

    val closed = cur.join(broadcast(changedKeys), keys, "left_semi")
      .withColumn("effective_to", lit(asOf))
      .withColumn("is_current", lit(false))
    val untouched = cur.join(broadcast(changedKeys), keys, "left_anti")
    val opened = u
      .join(broadcast(changedKeys), keys, "left_semi")
      .unionByName(u.join(cur, keys, "left_anti")) // brand-new keys
      .withColumn("effective_from", lit(asOf))
      .withColumn("effective_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))

    hist.select(outCols: _*)
      .unionByName(untouched.select(outCols: _*))
      .unionByName(closed.select(outCols: _*))
      .unionByName(opened.select(outCols: _*))
  }

  /** Empty SCD2 dimension with the right schema, for bootstrapping. */
  def emptyDim(spark: org.apache.spark.sql.SparkSession,
      template: DataFrame, keys: Seq[String], attrs: Seq[String]): DataFrame =
    template.select((keys ++ attrs).map(col): _*)
      .withColumn("effective_from", lit(0L))
      .withColumn("effective_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))
      .limit(0)
}
