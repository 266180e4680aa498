package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Similarity

object StreamAnnSpec {
  case class QVec(vec_id: Long, ts: Timestamp, embedding: Seq[Float])
}

class StreamAnnSpec extends SparkSpec {
  import StreamAnnSpec.QVec

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // same deterministic corpus shape as SimilaritySpec's NSW case:
  // enough rows that seedMod=13 yields multi-member cells
  private def corpus = {
    import spark.implicits._
    (1L to 40L).map(i => (i,
        Seq((i % 7).toFloat + 1f, (i % 5).toFloat, (i % 3).toFloat)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  test("streamed probe == batch ivfTopK on the same frozen index; late queries drop") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val seeds = Similarity.seedCentroids(corpus, "vec_id", "embedding", 13)
    val model = StreamAnn.freeze(seeds)
    assert(model.length === 3) // 13, 26, 39
    val side = StreamAnn.corpusSide(corpus, "vec_id", "embedding", seeds)
      .localCheckpoint(true)

    val qIds = Seq(10L, 20L, 30L, 40L)
    val qVecs = corpus.filter(col("vec_id").isin(qIds: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap

    val input = MemoryStream[QVec]
    val out = StreamAnn.topK(input.toDF(), "vec_id", "ts", "embedding",
      model, side, nprobe = 2, k = 3,
      windowDur = "1 minute", delay = "30 seconds")
    val q = out.writeStream.format("memory").queryName("sann_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(qIds.zipWithIndex.map { case (id, i) =>
        QVec(id, ts(f"2025-01-01 10:00:${5 * i}%02d"), qVecs(id)) }: _*)
      q.processAllAvailable()
      // nothing emits before the watermark passes the window end
      assert(spark.table("sann_out").count() === 0L)
      // advance event time past window end + delay → the window closes
      input.addData(QVec(99L, ts("2025-01-01 10:05:00"),
        Seq(1f, 1f, 1f)))
      q.processAllAvailable()
      val got = spark.table("sann_out")
        .select("query_id", "rank", "corpus_id", "cosine")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val want = Similarity.ivfTopK(corpus,
          corpus.filter(col("vec_id").isin(qIds: _*)),
          "vec_id", "embedding", seedMod = 13, nprobe = 2, k = 3)
        .select("query_id", "rank", "corpus_id", "cosine")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got === want,
        s"stream/batch divergence:\n got=$got\n want=$want")

      // a query older than the watermark is dropped by the windowed
      // agg — its window has already closed (bounded-state contract)
      input.addData(QVec(77L, ts("2025-01-01 10:00:30"), qVecs(10L)))
      q.processAllAvailable()
      // push the watermark far enough that 77's window WOULD emit had
      // its rows been admitted
      input.addData(QVec(98L, ts("2025-01-01 10:20:00"),
        Seq(1f, 1f, 1f)))
      q.processAllAvailable()
      assert(spark.table("sann_out")
        .filter($"query_id" === 77L).count() === 0L,
        "late query must not resurrect a closed window")
      // and the state store is draining as windows close, not
      // accumulating: the last progress reports bounded state rows
      val st = q.lastProgress.stateOperators
      assert(st.nonEmpty && st.head.numRowsTotal <= 2L,
        s"state not watermark-bounded: ${st.map(_.numRowsTotal).mkString(",")}")
    } finally q.stop()
  }
}
