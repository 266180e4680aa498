package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Streaming ANN probe — the stream-side twin of
  * [[graft.operators.Similarity.ivfTopK]] against a FROZEN index (the
  * [[graft.pipeline.AnnIndexPipeline]] frozen-model discipline):
  * queries ARRIVE as a stream, the index is the static side, and each
  * query's top-k is emitted once its event-time window closes.
  *
  * Dataflow (the two streaming join/agg classes composed):
  *
  *  1. CELL ROUTE — a narrow per-row map against the broadcast
  *     centroid model: each query row scores the nlist frozen
  *     centroids (the model is broadcast-sized by the AnnIndex
  *     contract) and fans out to its `nprobe` best cells (cosine
  *     desc, cell asc — [[Similarity.ivfTopK]]'s exact probe rule,
  *     same sequential-fold double arithmetic). No shuffle, no state.
  *  2. PROBE — a stateless STREAM–STATIC equi-join on the cell id:
  *     probe rows join the stored (corpus_id, vector, cell) inverted
  *     lists in place; candidate work per query is
  *     |corpus|·nprobe/nlist, identical to the batch plan. The static
  *     side never re-reads per batch beyond the join's own scan.
  *  3. TOP-K — the one stateful operator: a WATERMARK-BOUNDED
  *     windowed aggregation per (window, query_id) collects the
  *     candidate set and emits `slice(array_sort(...), k)` when the
  *     watermark passes the window end. State per open query is its
  *     candidate list (bounded by the probed cells' sizes); closed
  *     windows evict — the state-store contract StreamAnnSpec pins.
  *
  * Batch equivalence (spec-proved): for in-time queries the emitted
  * (rank, corpus_id, cosine) rows are BIT-IDENTICAL to
  * [[Similarity.ivfTopK]] on the same frozen index, because route,
  * score, and tie-break replay the same float programs.
  *
  * At 100 TB: the centroid model is KB–MB (broadcast); the corpus
  * side is the stored cells/vectors table partitioned by cell id;
  * per-trigger cost is linear in (arrived queries × probed-cell
  * sizes). Late queries beyond the watermark are dropped by the
  * aggregation — the same lateness contract as every windowed agg.
  */
object StreamAnn {

  /** The frozen routing model: (cell, centroid vector, centroid norm)
    * collected to the driver — broadcast-sized by the AnnIndex
    * contract (nlist ≈ √n rows).
    */
  final case class Centroid(cell: Long, cvec: Array[Float], cnorm: Double)

  /** Collect a [[Similarity.seedCentroids]]-shaped frame (cell, cvec,
    * cnorm) into the frozen routing model.
    */
  def freeze(centroids: DataFrame): Array[Centroid] =
    centroids.select(col("cell").cast("long"),
        col("cvec").cast("array<float>"), col("cnorm").cast("double"))
      .collect()
      .map(r => Centroid(r.getLong(0), r.getSeq[Float](1).toArray,
        r.getDouble(2)))
      .sortBy(_.cell)

  /** The static probe side: the corpus assigned to the frozen cells —
    * (corpus_id, cvec2, vnorm, cell), i.e. [[Similarity.ivfAssign]]
    * under the SAME centroid snapshot the router holds.
    */
  def corpusSide(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame =
    Similarity.ivfAssign(corpus, idCol, vecCol, centroids)
      .select(col(idCol).as("corpus_id"), col(vecCol).as("cvec2"),
        col("vnorm"), col("cell"))

  /** Streamed IVF top-k: `queries` is a STREAMING frame (idCol,
    * tsCol, vecCol); output rows (query_id, window_end, rank,
    * corpus_id, cosine) emit in append mode once the watermark
    * passes each query's window.
    */
  def topK(queries: DataFrame, idCol: String, tsCol: String,
      vecCol: String, model: Array[Centroid], corpusCells: DataFrame,
      nprobe: Int, k: Int, windowDur: String, delay: String): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = model // closure-captured: ships once per task binary
    val probes = queries
      .select(col(idCol).cast("long").as("query_id"), col(tsCol).as("ts"),
        col(vecCol).cast("array<float>").as("qvec"))
      .as[(Long, java.sql.Timestamp, Seq[Float])]
      .flatMap { case (qid, t, qv) =>
        val q = qv.toArray
        // the SAME sequential-fold double programs as the codegen
        // dot/norm expressions — bit-identical routing vs batch
        var n2 = 0.0
        var i = 0
        while (i < q.length) { n2 += q(i).toDouble * q(i); i += 1 }
        val qnorm = math.sqrt(n2)
        val scored = cents.map { c =>
          var d = 0.0
          var j = 0
          val lim = math.min(q.length, c.cvec.length)
          while (j < lim) { d += q(j).toDouble * c.cvec(j); j += 1 }
          (c.cell, d / (qnorm * c.cnorm))
        }
        scored.sortBy { case (cell, cos) => (-cos, cell) }.take(nprobe)
          .map { case (cell, _) => (qid, t, cell, qv, qnorm) }
      }
      .toDF("query_id", "ts", "cell", "qvec", "qnorm")
      .withWatermark("ts", delay)
    val cand = probes.join(corpusCells, Seq("cell"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("ts"), col("corpus_id"),
        (Similarity.dot(col("qvec"), col("cvec2")) /
          (col("qnorm") * col("vnorm"))).as("cosine"))
    cand
      .groupBy(window(col("ts"), windowDur), col("query_id"))
      .agg(slice(array_sort(collect_list(
          struct((-col("cosine")).as("negCos"),
            col("corpus_id").as("corpus_id")))), 1, k).as("top"))
      .select(col("query_id"), col("window.end").as("window_end"),
        posexplode(col("top")).as(Seq("rk", "e")))
      .select(col("query_id"), col("window_end"),
        (col("rk") + 1).cast("int").as("rank"),
        col("e.corpus_id").as("corpus_id"),
        (-col("e.negCos")).as("cosine"))
  }
}
