package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.operators.Dedup
import graft.operators.Dedup.MinHashParams

object StreamNearDupSpec {
  case class Doc(doc_id: Long, ts: Timestamp, text: String)
}

class StreamNearDupSpec extends SparkSpec {
  import StreamNearDupSpec.Doc

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private val mh = MinHashParams()

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "the quick brown fox jumps over the lazy cat tonight"), // near-dup of 1
    (3L, "completely different words about spark query engines here"),
    (4L, "the quick brown fox jumps over the lazy dog tonight"), // exact dup of 1
    (5L, "completely different words about flink query engines here") // near-dup of 3
  )

  test("in-horizon near-dups are flagged and suppressible; state evicts at the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Doc]
    val q = StreamNearDup.matches(input.toDF(), "doc_id", "ts", "text",
        n = 3, tau = 0.5, mh, delaySeconds = 10)
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Doc(1L, ts("2025-01-01 10:00:00"), corpus(0)._2),
        Doc(3L, ts("2025-01-01 10:00:01"), corpus(2)._2))
      q.processAllAvailable()
      // a dup of doc 1 arriving within the horizon is flagged (exact
      // text — a guaranteed band collision; sub-identical near-dup
      // parity is the replay test's job)
      input.addData(Doc(2L, ts("2025-01-01 10:00:03"), corpus(0)._2))
      q.processAllAvailable()
      val m1 = spark.table("neardup_out")
        .select("doc_id", "dup_of", "jaccard").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(m1.map(t => (t._1, t._2)).toSet === Set((2L, 1L)),
        s"doc 2 must match doc 1 and nothing else: ${m1.toSeq}")
      assert(m1.forall(_._3 === 1.0))
      // advance the watermark far past the horizon, then send a dup
      // of doc 3: its bucket state was evicted → NOT flagged
      // (cross-horizon dups are the stored-index batch path's job)
      input.addData(Doc(8L, ts("2025-01-01 10:05:00"), "watermark advancing filler text payload row"))
      q.processAllAvailable()
      input.addData(Doc(5L, ts("2025-01-01 10:04:55"), corpus(2)._2))
      q.processAllAvailable()
      val all = spark.table("neardup_out")
        .select("doc_id", "dup_of").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(all === Set((2L, 1L)),
        s"evicted bucket must not match the late near-dup: $all")
    } finally q.stop()
  }

  test("bounded replay equals the batch minhashNearDups answer, pair for pair") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Doc]
    val q = StreamNearDup.matches(input.toDF(), "doc_id", "ts", "text",
        n = 3, tau = 0.5, mh, delaySeconds = 3600)
      .writeStream.format("memory").queryName("neardup_replay")
      .outputMode(OutputMode.Append()).start()
    try {
      // replay the corpus in id order (ascending event time), all
      // within one horizon, across several micro-batches
      corpus.zipWithIndex.foreach { case ((id, text), i) =>
        input.addData(Doc(id, ts(f"2025-01-01 10:00:${i}%02d"), text))
        q.processAllAvailable()
      }
      val streamPairs = spark.table("neardup_replay")
        .select(col("dup_of").as("d1"), col("doc_id").as("d2"), col("jaccard"))
        .distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val batchPairs = Dedup.minhashNearDups(
          corpus.toDF("doc_id", "text"), "doc_id", "text",
          n = 3, tau = 0.5, mh).collect()
        .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"),
          r.getAs[Double]("jaccard"))).toSet
      assert(batchPairs.nonEmpty)
      assert(streamPairs === batchPairs,
        s"stream $streamPairs != batch $batchPairs")
    } finally q.stop()
  }

  test("hot-bucket cap stops state accumulation, not verification") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Doc]
    // cap = 1: only the first doc per bucket is retained as state
    val q = StreamNearDup.matches(input.toDF(), "doc_id", "ts", "text",
        n = 3, tau = 0.5, mh, delaySeconds = 3600, maxBucket = 1)
      .writeStream.format("memory").queryName("neardup_cap")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Doc(1L, ts("2025-01-01 10:00:00"), corpus(0)._2))
      q.processAllAvailable()
      input.addData(Doc(4L, ts("2025-01-01 10:00:01"), corpus(3)._2))
      q.processAllAvailable()
      // 4 verified against the retained doc 1 (cap ≥ verification)…
      input.addData(Doc(2L, ts("2025-01-01 10:00:02"), corpus(0)._2))
      q.processAllAvailable()
      val pairs = spark.table("neardup_cap")
        .select("doc_id", "dup_of").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // …but 4 was never ADDED to state, so 2 (same text again)
      // matches only the retained doc 1, not doc 4
      assert(pairs === Set((4L, 1L), (2L, 1L)),
        s"capped bucket must verify against retained state only: $pairs")
    } finally q.stop()
  }
}
