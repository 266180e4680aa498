package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Similarity
import StreamPq.{PqCode, SqCode, VecIn}

/** Stream-side vector encode ≡ batch encode under the same frozen
  * model — the encode twin of StreamAnnSpec's probe equivalence.
  */
class StreamPqSpec extends SparkSpec {
  import spark.implicits._

  private val DIM = 8
  private val M = 2

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // deterministic float corpus, mixed signs, some repeated subvectors
  // (tie-break coverage)
  private def corpus = (0 until 60).map { i =>
    (i.toLong, (0 until DIM).map(d =>
      (((i * 31 + d * 17) % 13) - 6) / 3.0f))
  }.toDF("vec_id", "vec")

  private def inputs = (0 until 60).map { i =>
    VecIn(ts(f"2025-01-01 10:00:${i % 60}%02d"), i.toLong,
      (0 until DIM).map(d => (((i * 31 + d * 17) % 13) - 6) / 3.0f))
  }

  test("streamed PQ codes are bit-identical to batch pqEncode") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val cb = Similarity.pqCodebooksKMeans(corpus, "vec_id", "vec",
      m = M, k = 4, iters = 2)
    val model = StreamPq.freezeCodebooks(cb)
    val batch = Similarity.pqEncode(corpus, "vec_id", "vec", M, cb)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("sub"),
        r.getAs[Long]("cw"), r.getAs[Double]("sdist")))
      .sortBy(t => (t._1, t._2)).toSeq
    val input = MemoryStream[VecIn]
    val q = StreamPq.encodePq(input.toDS(), windowSeconds = 60,
        m = M, model = model)
      .writeStream.format("memory").queryName("pq_codes")
      .outputMode(OutputMode.Append()).start()
    try {
      val (x, y) = inputs.splitAt(25)
      input.addData(x: _*)
      q.processAllAvailable()
      input.addData(y.reverse: _*) // out of order: stateless ⇒ harmless
      q.processAllAvailable()
      val streamed = spark.table("pq_codes").as[PqCode].collect()
        .map(r => (r.vec_id, r.sub, r.cw, r.sdist))
        .sortBy(t => (t._1, t._2)).toSeq
      assert(streamed === batch, "stream ≢ batch PQ codes")
      // window columns ride along on the tumbling grid
      val winds = spark.table("pq_codes").as[PqCode].collect()
      assert(winds.forall(r =>
        r.window_end.getTime - r.window_start.getTime == 60000L))
    } finally q.stop()
  }

  test("streamed PQ codes match batch under DONOR (float) codebooks too") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val cb = Similarity.pqCodebooks(corpus, "vec_id", "vec",
      m = M, seedMod = 10)
    val model = StreamPq.freezeCodebooks(cb)
    val batch = Similarity.pqEncode(corpus, "vec_id", "vec", M, cb)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("sub"),
        r.getAs[Long]("cw"), r.getAs[Double]("sdist")))
      .sortBy(t => (t._1, t._2)).toSeq
    val input = MemoryStream[VecIn]
    val q = StreamPq.encodePq(input.toDS(), windowSeconds = 60,
        m = M, model = model)
      .writeStream.format("memory").queryName("pq_donor_codes")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(inputs: _*)
      q.processAllAvailable()
      val streamed = spark.table("pq_donor_codes").as[PqCode].collect()
        .map(r => (r.vec_id, r.sub, r.cw, r.sdist))
        .sortBy(t => (t._1, t._2)).toSeq
      assert(streamed === batch,
        "float-donor codebook drifted between stream and batch")
    } finally q.stop()
  }

  test("streamed SQ8 codes are bit-identical to batch sqEncode") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val scalesDf = Similarity.sqScales(corpus, "vec")
    val scales = StreamPq.freezeScales(scalesDf)
    val batch = Similarity.sqEncode(corpus, "vec_id", "vec", scalesDf)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Long]]("sq_code").toSeq))
      .sortBy(_._1).toSeq
    val input = MemoryStream[VecIn]
    val q = StreamPq.encodeSq(input.toDS(), windowSeconds = 60, scales)
      .writeStream.format("memory").queryName("sq_codes")
      .outputMode(OutputMode.Append()).start()
    try {
      val (x, y) = inputs.splitAt(40)
      input.addData(x: _*)
      q.processAllAvailable()
      input.addData(y: _*)
      q.processAllAvailable()
      val streamed = spark.table("sq_codes").as[SqCode].collect()
        .map(r => (r.vec_id, r.sq_code.toSeq)).sortBy(_._1).toSeq
      assert(streamed === batch, "stream ≢ batch SQ8 codes")
      // all-zero dimension rule: codes stay in [-127, 127]
      assert(streamed.forall(_._2.forall(c => c >= -127 && c <= 127)))
    } finally q.stop()
  }
}
