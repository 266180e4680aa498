package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming PQ / SQ8 vector ENCODE against frozen codebooks — the
  * encode-side twin [[StreamAnn]] (probe-side) was missing: the ANN
  * artifact pipeline ([[graft.pipeline.AnnIndexPipeline]]) maintains
  * IVF/codebook artifacts batch-side; arriving vectors must be coded
  * against the SAME frozen model so stream- and batch-written codes
  * are interchangeable in one index.
  *
  * Both encoders are STATELESS streaming maps — the best kind of
  * streaming operator: no state store, no watermark coupling, exactly
  * the per-row float program of the batch twin, so emitted codes are
  * bit-identical to [[graft.operators.Similarity.pqEncode]] /
  * [[graft.operators.Similarity.sqEncode]] on the same rows no matter
  * how the stream micro-batches, retries, or interleaves
  * (StreamPqSpec pins both equalities). Window bounds are carried as
  * PLAIN COLUMNS computed from event time (floorDiv to the tumbling
  * grid) so downstream windowed consumers can join/group without
  * re-deriving them.
  *
  * Bit-identity argument, op for op:
  *  - PQ sdist replays ⟨s,s⟩ − 2⟨s,c⟩ + ⟨c,c⟩ with
  *    [[graft.expressions.DotProduct]]'s sequential left fold of
  *    per-element double products (float→double promotion is exact),
  *    same association ((ss − 2·sc) + cc); argmin ties break to the
  *    lowest codeword id exactly like the batch max_by struct order.
  *  - SQ8 replays floor(x·127/s + 0.5) per dimension (0 on an
  *    all-zero dimension), the identical portable half-up rounding.
  *
  * At 100 TB: the frozen models are KB–MB (PQ: m·k codewords; SQ8:
  * one scale row) and ship in the task closure exactly like a
  * broadcast; per-trigger cost is a narrow map over arrived rows —
  * encode throughput scales with input partitions, no shuffle at all.
  */
object StreamPq {

  final case class VecIn(ts: Timestamp, vec_id: Long, vec: Seq[Float])

  /** One frozen PQ codeword: subspace, codeword id, centroid (double
    * — exact for float-sliced donor codebooks too), ⟨c,c⟩ as the
    * batch frame carried it.
    */
  final case class Codeword(sub: Int, cw: Long, cvec: Array[Double],
      cc: Double)

  final case class PqCode(window_start: Timestamp, window_end: Timestamp,
      vec_id: Long, sub: Int, cw: Long, sdist: Double)

  final case class SqCode(window_start: Timestamp, window_end: Timestamp,
      vec_id: Long, sq_code: Seq[Long])

  /** Freeze a [[graft.operators.Similarity.pqCodebooks]] /
    * pqCodebooksKMeans frame `(sub, cw, cvec, cc)` into the driver
    * model, cw-ordered within each subspace (the tie-break order).
    */
  def freezeCodebooks(codebooks: DataFrame): Array[Codeword] =
    codebooks.select(col("sub").cast("int"),
        col("cw").cast("long"), col("cvec").cast("array<double>"),
        col("cc").cast("double"))
      .collect()
      .map(r => Codeword(r.getInt(0), r.getLong(1),
        r.getSeq[Double](2).toArray, r.getDouble(3)))
      .sortBy(c => (c.sub, c.cw))

  /** Freeze a [[graft.operators.Similarity.sqScales]] one-row frame
    * `(scales: array<double>)` into the driver model.
    */
  def freezeScales(scales: DataFrame): Array[Double] =
    scales.select(col("scales").cast("array<double>"))
      .head().getSeq[Double](0).toArray

  /** [[graft.expressions.DotProduct]]'s exact walk: sequential left
    * fold of element-wise double products.
    */
  private def dotFD(a: Array[Float], off: Int, b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < b.length) { acc += a(off + i).toDouble * b(i); i += 1 }
    acc
  }
  private def dotFF(a: Array[Float], off: Int, len: Int): Double = {
    var acc = 0.0; var i = 0
    while (i < len) {
      val x = a(off + i).toDouble; acc += x * x; i += 1
    }
    acc
  }

  /** Streamed PQ encode: emits the long-form code rows
    * (window_start, window_end, vec_id, sub, cw, sdist), bit-identical
    * to batch `pqEncode(corpus, id, vec, m, codebooks)` on the same
    * rows. Append-mode safe with zero state.
    */
  def encodePq(vectors: Dataset[VecIn], windowSeconds: Long, m: Int,
      model: Array[Codeword])(implicit spark: SparkSession): Dataset[PqCode] = {
    import spark.implicits._
    require(windowSeconds > 0 && m >= 1)
    val winMs = windowSeconds * 1000L
    val bySub: Array[Array[Codeword]] =
      (0 until m).map(s0 => model.filter(_.sub == s0)).toArray
    vectors.flatMap { v =>
      val ws = Math.floorDiv(v.ts.getTime, winMs) * winMs
      val arr = v.vec.toArray
      val subLen = arr.length / m
      (0 until m).iterator.map { sub =>
        val off = sub * subLen
        val ss = dotFF(arr, off, subLen)
        var bestCw = -1L; var bestD = Double.PositiveInfinity
        var first = true
        bySub(sub).foreach { c =>
          val d = ss - 2.0 * dotFD(arr, off, c.cvec) + c.cc
          if (first || d < bestD) { bestD = d; bestCw = c.cw; first = false }
        }
        PqCode(new Timestamp(ws), new Timestamp(ws + winMs),
          v.vec_id, sub, bestCw, bestD)
      }
    }
  }

  /** Streamed SQ8 encode: emits (window_start, window_end, vec_id,
    * sq_code), bit-identical to batch `sqEncode` under the same
    * frozen scale table. Append-mode safe with zero state.
    */
  def encodeSq(vectors: Dataset[VecIn], windowSeconds: Long,
      scales: Array[Double])(implicit spark: SparkSession): Dataset[SqCode] = {
    import spark.implicits._
    require(windowSeconds > 0)
    val winMs = windowSeconds * 1000L
    vectors.map { v =>
      val ws = Math.floorDiv(v.ts.getTime, winMs) * winMs
      val code = v.vec.toArray.zip(scales).map { case (x, s) =>
        if (s == 0.0) 0L
        else math.floor(x.toDouble * 127.0 / s + 0.5).toLong
      }.toSeq
      SqCode(new Timestamp(ws), new Timestamp(ws + winMs), v.vec_id, code)
    }
  }
}
