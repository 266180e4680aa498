package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion (RRF, Cormack/Clarke/
  * Buettcher SIGIR'09) of independently ranked retrieval legs — the
  * standard way a training-data or RAG pipeline combines lexical
  * (BM25, [[Bm25.topK]]) and vector ([[Similarity.topK]] /
  * [[Similarity.ivfPqTopK]]) search without score calibration:
  *
  *   rrf(d) = Σ_legs 1 / (k0 + rank_leg(d))     (absent leg ⇒ 0)
  *
  * Float parity by construction: ranks are integers, `k0 + rank` is an
  * exactly-representable integer-valued double, one IEEE division per
  * leg is exactly rounded, and the per-document score folds the legs
  * in their WRITTEN order — every double is bit-identical across
  * engines with no libm call anywhere (the same stance as BM25's
  * rational idf surrogate).
  *
  * Scale shape (100 TB): each leg is already top-k-bounded by its own
  * production operator (inverted-index BM25, IVF-PQ ANN), so fusion
  * only ever touches Σ|legs|·k rows per query — a union + one keyed
  * aggregation. Ranks, not scores, cross the operator boundary, so the
  * legs can run on different clusters/indexes and fuse from their
  * result tables. The batch variant keys everything by query id: state
  * and the final window partition by query, so parallelism grows with
  * the query batch, never with the corpus.
  */
object Hybrid {

  private def fusedScore(legs: Seq[String], rrfK: Int): Column =
    legs.map { nm =>
      coalesce(lit(1.0) / (lit(rrfK).cast("double")
        + col(s"${nm}_rank").cast("double")), lit(0.0))
    }.reduce(_ + _)

  /** Single-query fusion. Each leg is (name, ranked DataFrame) with
    * `idCol` and an integer `rank` column (1-based, as produced by the
    * retrieval operators). Output: rank, idCol, one `<leg>_rank`
    * column per leg (null where the leg did not retrieve the doc),
    * rrf_score — top `k` by (score desc, id asc).
    */
  def rrfFuse(legs: Seq[(String, DataFrame)], idCol: String,
      rrfK: Int, k: Int): DataFrame = {
    require(legs.nonEmpty && rrfK > 0 && k > 0)
    val tagged = legs.map { case (nm, df) =>
      df.select(col(idCol), lit(nm).as("__leg"),
        col("rank").cast("int").as("__rank"))
    }.reduce(_.unionByName(_))
    // per-leg rank via conditional agg — no join between the legs, one
    // tiny keyed shuffle over Σ|legs|·k rows
    val rankCols = legs.map { case (nm, _) =>
      max(when(col("__leg") === nm, col("__rank"))).as(s"${nm}_rank")
    }
    val fused = tagged.groupBy(col(idCol))
      .agg(rankCols.head, rankCols.tail: _*)
      .withColumn("rrf_score", fusedScore(legs.map(_._1), rrfK))
    // deliberate single-partition window over ≤ Σ legs·k rows (the
    // bounded-result class GraftSession documents)
    fused
      .orderBy(col("rrf_score").desc, col(idCol).asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf_score").desc, col(idCol).asc)))
      .orderBy(col("rank"))
  }

  /** Batch fusion: legs additionally carry `queryCol`; ranking and
    * the top-k window partition by query id. Semantics per query are
    * exactly [[rrfFuse]] (spec-asserted).
    */
  def rrfFuseBatch(legs: Seq[(String, DataFrame)], queryCol: String,
      idCol: String, rrfK: Int, k: Int): DataFrame = {
    require(legs.nonEmpty && rrfK > 0 && k > 0)
    val tagged = legs.map { case (nm, df) =>
      df.select(col(queryCol), col(idCol), lit(nm).as("__leg"),
        col("rank").cast("int").as("__rank"))
    }.reduce(_.unionByName(_))
    val rankCols = legs.map { case (nm, _) =>
      max(when(col("__leg") === nm, col("__rank"))).as(s"${nm}_rank")
    }
    val fused = tagged.groupBy(col(queryCol), col(idCol))
      .agg(rankCols.head, rankCols.tail: _*)
      .withColumn("rrf_score", fusedScore(legs.map(_._1), rrfK))
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col("rrf_score").desc, col(idCol).asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
