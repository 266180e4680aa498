package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** DSIR-style data selection: importance weighting of a candidate pool
  * toward a target distribution over hashed n-gram features (Xie et
  * al., "Data Selection for Language Models via Importance
  * Resampling", NeurIPS 2023 — the hashed bag-of-ngrams importance
  * estimator, re-expressed Spark-first).
  *
  * Per-feature model: unigram+bigram shingle hashes bucketed mod
  * `nBuckets`; add-one-smoothed bucket probabilities under the target
  * and the candidate (raw) pools; per-document importance weight
  *
  *   w(x) = Π_positions  p_target(b) / p_raw(b)
  *
  * The paper works in log space (Σ n_f·log ratio); log() differs in
  * the last ulp across libm implementations, so — the BM25/TF-IDF
  * stance — we keep the MONOTONE-equivalent product form and fold it
  * over the document's features in SORTED BUCKET ORDER: every factor
  * is an exactly-rounded IEEE division of exact integer-valued
  * doubles, and a sequential left-fold in a pinned order is
  * bit-identical across engines. (Magnitude: ratios are O(1); a
  * document of t features spans e^O(√t) in practice — far inside
  * double range for real document lengths.)
  *
  * Scale shape (100 TB): this is exactly why DSIR hashes features —
  * the model is BOUNDED by `nBuckets` regardless of corpus size. The
  * bucket-count aggregation is one map-side-combined shuffle of ≤
  * nBuckets×2 longs per partition; the ratio table collapses to a
  * 1-row broadcast MAP, and scoring is a pure narrow map over the
  * candidate scan (zero shuffles, zero joins per document). Selection
  * is a bounded top-M.
  */
object Dsir {

  /** Hashed feature ids (unigram + bigram shingle hashes mod
    * nBuckets) — one narrow codegen pass per n.
    */
  def featureIds(text: Column, nBuckets: Int): Column =
    concat(
      transform(TextFns.shingleHashes(text, 1), h => h % nBuckets),
      transform(TextFns.shingleHashes(text, 2), h => h % nBuckets))

  /** DuckDB SQL for the same feature-id list. */
  def featureIdsSql(x: String, nBuckets: Int): String =
    s"""list_concat(
       | list_transform(${TextFns.shingleHashesSql(x, 1)}, h -> h % $nBuckets),
       | list_transform(${TextFns.shingleHashesSql(x, 2)}, h -> h % $nBuckets))""".stripMargin

  /** Per-bucket smoothed probability ratio table:
    * (bucket, ratio = p_target/p_raw). Bounded by nBuckets rows.
    */
  def featureRatios(docs: DataFrame, textCol: String, isTarget: Column,
      nBuckets: Int): DataFrame = {
    val occ = docs
      .select(isTarget.as("__t"), explode(featureIds(col(textCol), nBuckets)).as("bucket"))
    val cnt = occ.groupBy(col("bucket")).agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("ct"),
      sum(when(!col("__t"), 1L).otherwise(0L)).as("cr"))
    // totals + observed-vocab size: one scalar row, broadcast
    val tot = cnt.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"),
      count(lit(1)).as("v"))
    cnt.crossJoin(broadcast(tot))
      .select(col("bucket"),
        (((col("ct") + 1).cast("double") / (col("nt") + col("v")).cast("double"))
          / ((col("cr") + 1).cast("double") / (col("nr") + col("v")).cast("double")))
          .as("ratio"))
  }

  /** Importance weight per CANDIDATE (non-target) document: the
    * sorted-order product fold of its features' ratios. Output:
    * idCol, n_feats, weight.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, nBuckets: Int): DataFrame = {
    require(nBuckets > 0)
    val ratios = featureRatios(docs, textCol, isTarget, nBuckets)
    // 1-row broadcast map (≤ nBuckets entries) → scoring is row-local
    val rmap = ratios.agg(
      map_from_entries(collect_list(struct(col("bucket"), col("ratio"))))
        .as("__rmap"))
    val feats = featureIds(col(textCol), nBuckets)
    docs.filter(!isTarget)
      .crossJoin(broadcast(rmap))
      .withColumn("n_feats", size(feats))
      .withColumn("weight",
        aggregate(sort_array(feats), lit(1.0),
          (acc, b) => acc * element_at(col("__rmap"), b)))
      .drop("__rmap")
  }

  /** Top-M selection by importance weight (desc, id asc) — the
    * deterministic-selection form of DSIR's resampling step. Output
    * adds rank; bounded single-partition window over ≤ m rows.
    */
  def selectTop(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, nBuckets: Int, m: Int): DataFrame = {
    require(m > 0)
    importanceWeights(docs, idCol, textCol, isTarget, nBuckets)
      .orderBy(col("weight").desc, col(idCol).asc)
      .limit(m)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("weight").desc, col(idCol).asc)))
  }
}
