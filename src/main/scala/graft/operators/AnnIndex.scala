package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.VersionedTable

/** Persisted ANN model artifacts — the vector-search sibling of the
  * q112 stored dedup index ([[Dedup.crossNearDupsFromIndex]]).
  *
  * All four artifacts are pure functions of the corpus, so a
  * deployment writes them once per model generation and every
  * subsequent query/append pays only lookup/delta work:
  *
  *   - `codebooks`  — [[Similarity.pqCodebooks]] output (m·ncw tiny
  *     subvector rows). VersionedTable: a model GENERATION is an
  *     immutable snapshot; retraining commits the next version.
  *   - `centroids`  — [[Similarity.seedCentroids]] /
  *     [[Similarity.refineCentroids]] output (nlist rows). Versioned
  *     with the codebooks (the two halves of one model generation).
  *   - `codes`      — [[Similarity.pqEncode]] output for the whole
  *     corpus (n·m small-int rows). Plain append-only parquet, like
  *     q112's bands/sets tables: an append writes ONLY the delta's
  *     files — O(delta) I/O, no snapshot rewrite.
  *   - `cells`      — (id, cell) from [[Similarity.ivfAssign]].
  *     Append-only alongside `codes`.
  *
  * The append contract is the production one: new vectors are encoded
  * with the FROZEN latest model (codebook/centroids do not drift per
  * batch), so appended codes are bit-identical to what a full
  * re-encode of the grown corpus under the same model would produce —
  * AnnIndexSpec proves exactly that, plus that a parquet round trip
  * reproduces the in-memory [[Similarity.ivfPqTopK]] answer bit-exact.
  * Retraining the model on the grown corpus is a NEW generation:
  * rebuild() commits fresh codebook/centroid versions and rewrites the
  * encoded tables (the same copy-on-write cost any quantized index
  * pays when its codebook changes).
  *
  * At 100 TB: codebooks/centroids are KB–MB (broadcast-sized by
  * contract); codes are the heavy table but
  * compressed ~dim·4bytes → m small ints per vector, partitioned like
  * any fact table. Steady-state ingest cost is O(batch): encode the
  * batch against the broadcast model, append files.
  */
object AnnIndex {

  final case class Model(codebooks: DataFrame, centroids: DataFrame,
      codes: DataFrame, cells: DataFrame)

  private def cbPath(dir: String) = s"$dir/codebooks"
  private def ctPath(dir: String) = s"$dir/centroids"
  private def codesPath(dir: String) = s"$dir/codes"
  private def cellsPath(dir: String) = s"$dir/cells"

  /** Train + encode + persist a fresh model generation over `corpus`.
    * Codebook/centroid snapshots are versioned commits; codes/cells
    * start new append-only tables (overwritten if present — a new
    * generation invalidates old encodings by definition).
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String, m: Int,
      pqSeedMod: Int, ivfSeedMod: Int, dir: String): Unit = {
    val cb = Similarity.pqCodebooks(corpus, idCol, vecCol, m, pqSeedMod)
    // seedMod ≤ 0 → the measured √n default, same rule as pqCodebooks
    // (seedCentroids itself takes the raw mod — oracles pin it)
    val seeds = Similarity.seedCentroids(corpus, idCol, vecCol,
      Similarity.resolveSeedMod(corpus, ivfSeedMod))
    VersionedTable.commit(cb, cbPath(dir))
    VersionedTable.commit(seeds, ctPath(dir))
    Similarity.pqEncode(corpus, idCol, vecCol, m, cb)
      .write.mode("overwrite").parquet(codesPath(dir))
    Similarity.ivfAssign(corpus, idCol, vecCol, seeds)
      .select(col(idCol), col("cell"))
      .write.mode("overwrite").parquet(cellsPath(dir))
  }

  /** Latest model generation + the full encoded corpus. */
  def load(spark: SparkSession, dir: String): Model =
    Model(
      VersionedTable.read(spark, cbPath(dir)),
      VersionedTable.read(spark, ctPath(dir)),
      spark.read.parquet(codesPath(dir)),
      spark.read.parquet(cellsPath(dir)))

  /** Encode a new batch with the FROZEN latest model and append only
    * the delta files — O(batch) compute and I/O, the steady-state
    * ingest path. The caller owns id uniqueness (same contract as
    * q112's index append).
    */
  def appendEncode(batch: DataFrame, idCol: String, vecCol: String,
      m: Int, dir: String): Unit = {
    val spark = batch.sparkSession
    val cb = VersionedTable.read(spark, cbPath(dir))
    val seeds = VersionedTable.read(spark, ctPath(dir))
    Similarity.pqEncode(batch, idCol, vecCol, m, cb)
      .write.mode("append").parquet(codesPath(dir))
    Similarity.ivfAssign(batch, idCol, vecCol, seeds)
      .select(col(idCol), col("cell"))
      .write.mode("append").parquet(cellsPath(dir))
  }

  /** Cell-occupancy statistics from per-cell counts — the shared stat
    * program of [[occupancyStats]] and q309's drift trajectory. Input:
    * `(byCols..., cnt)` — one row per (group, cell) with its occupancy;
    * output per group: `n_cells_used, n_vecs, max_occ, mean_occ,
    * imbalance` where imbalance = max_occ·n_cells_used/n_vecs (the
    * max/mean occupancy ratio — 1.0 for perfectly balanced cells).
    * Integer aggregates; the two doubles divide in a pinned order so
    * an oracle replays them exactly.
    */
  def occupancyStatsFromCounts(counts: DataFrame,
      byCols: Seq[String]): DataFrame = {
    val g =
      if (byCols.isEmpty) counts.groupBy()
      else counts.groupBy(byCols.map(col): _*)
    g.agg(count(lit(1)).as("n_cells_used"),
        sum(col("cnt")).as("n_vecs"),
        max(col("cnt")).as("max_occ"))
      .select(byCols.map(col) ++ Seq(col("n_cells_used"), col("n_vecs"),
        col("max_occ"),
        (col("n_vecs").cast("double") / col("n_cells_used"))
          .as("mean_occ"),
        (col("max_occ").cast("double") * col("n_cells_used") /
          col("n_vecs")).as("imbalance")): _*)
  }

  /** One-row occupancy stats over a `(id, cell)` assignment table. */
  def occupancyStats(cells: DataFrame,
      cellCol: String = "cell"): DataFrame =
    occupancyStatsFromCounts(
      cells.groupBy(col(cellCol)).agg(count(lit(1)).as("cnt")), Nil)

  /** The drift-alarm signal of the STORED index: max/mean cell
    * occupancy of `cells/`. A frozen-model index serving a drifting
    * corpus (new source, embedding-model version change) piles new
    * vectors into few cells — probe cost grows with the hottest cell,
    * so occupancy imbalance IS the "re-centroid now" signal. One scan
    * of the (id, cell) table + a 1-row driver read.
    */
  def cellImbalance(spark: SparkSession, dir: String): Double = {
    val st = occupancyStats(spark.read.parquet(cellsPath(dir))).head()
    st.getDouble(st.fieldIndex("imbalance"))
  }

  /** IVF-PQ top-k served entirely from the stored artifacts — no
    * corpus-vector access at query time (the compressed-index
    * promise: queries touch the model tables + codes only).
    */
  def topK(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, m: Int, nprobe: Int,
      k: Int): DataFrame = {
    val mod = load(spark, dir)
    Similarity.ivfPqTopK(mod.codes, mod.cells, mod.centroids, queries,
      idCol, vecCol, m, mod.codebooks, nprobe, k)
  }
}
