package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BATCH perceptron — the linear-classifier member of the trainer
  * family ([[KMeans]] centroids, [[BpeTrainer]] merges,
  * `Similarity.pqCodebooksKMeans` codebooks, `PageRank.labelPropagation`
  * communities): fixed-round batch updates
  * `w_{t} = w_{t-1} + Σ_{misclassified under w_{t-1}} y·x`
  * over INTEGER features and ±1 labels — every margin, every update,
  * and every error count is exact int64 arithmetic, so the trained
  * model is bit-identical on any engine and any partitioning with NO
  * rounding discipline at all (the one trainer here with zero float
  * ops; the classic shallow text classifier a curation pipeline runs
  * where fastText would need libm).
  *
  * Per round: ONE aggregation over one scan — the margin
  * `y·⟨w, x⟩` folds the previous round's weights in as plan-time
  * literals (no weight join, the q102 discipline), the misclassified
  * indicator gates d+1 conditional sums, and the driver collects a
  * single (d+2)-long row (the bounded-driver contract: d is a small
  * constant). Rounds are a fixed small constant; cost is
  * rounds × one map-side-combined agg.
  *
  * Overflow headroom: |w_j| ≤ rounds·Σ|x_j| and margins ≤
  * (d+1)·max|w|·max|x| — int64 holds through ~1e14 corpus feature
  * mass; beyond that the same sums ride DECIMAL(38,0) (the q173
  * discipline) with the comparison semantics unchanged.
  */
object Perceptron {

  /** One training round's audit row: errors measured under the
    * incoming weights, and the updated weights that result.
    */
  final case class Round(round: Int, nErr: Long, n: Long, w: Seq[Long])

  /** Train `rounds` batch-perceptron rounds from w = 0. `xCols` are
    * integer feature columns (include a constant 1 column for the
    * bias); `yCol` is ±1. Returns one [[Round]] per round.
    */
  def fitBatch(features: DataFrame, xCols: Seq[String], yCol: String,
      rounds: Int): Seq[Round] = {
    require(rounds >= 1 && xCols.nonEmpty)
    var w = Seq.fill(xCols.length)(0L)
    val out = Seq.newBuilder[Round]
    for (t <- 1 to rounds) {
      val margin: Column = col(yCol) *
        xCols.zip(w).map { case (c, wj) => col(c) * lit(wj) }
          .reduce(_ + _)
      val bad = (margin <= 0L).cast("long")
      val aggs = Seq(sum(bad).as("n_err"), count(lit(1)).as("n")) ++
        xCols.zipWithIndex.map { case (c, j) =>
          sum(bad * col(yCol) * col(c)).as(s"u$j")
        }
      val row = features.agg(aggs.head, aggs.tail: _*).head()
      val upd = xCols.indices.map(j => row.getAs[Long](s"u$j"))
      w = w.zip(upd).map { case (a, b) => a + b }
      out += Round(t, row.getAs[Long]("n_err"), row.getAs[Long]("n"), w)
    }
    out.result()
  }
}
