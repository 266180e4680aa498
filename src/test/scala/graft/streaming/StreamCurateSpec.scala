package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec

object StreamCurateSpec {
  case class Doc(doc_id: Long, ts: Timestamp, url: String, lang: String,
      source: String, text: String)
}

class StreamCurateSpec extends SparkSpec {
  import StreamCurateSpec.Doc

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // passes every Gopher rule: >20 distinct words, sane lengths,
  // stopwords present
  private val good = "the quick brown fox of the valley jumps over a " +
    "lazy dog and then wanders through seventeen quiet meadows towards " +
    "distant mountain villages carrying small parcels for friendly " +
    "residents who wave back cheerfully every single morning"

  test("stream funnel: URL dups, bad lang, gopher fails, text dups all gated") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Doc]
    val q = StreamCurate.curateWithinWatermark(
        input.toDF(), "ts", "10 seconds", Seq("en"))
      .writeStream.format("memory").queryName("curate_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        // survives
        Doc(1L, ts("2025-01-01 10:00:00"),
          "HTTP://Example.COM:80/a?b=2&a=1#f", "en", "s0", good),
        // same canonical URL → dropped at the URL-dedup stage
        Doc(2L, ts("2025-01-01 10:00:01"),
          "http://example.com/a?a=1&b=2", "en", "s0", good + " tail"),
        // wrong language
        Doc(3L, ts("2025-01-01 10:00:02"),
          "http://example.com/b", "fr", "s0", good + " encore"),
        // fails the gopher word-count rule
        Doc(4L, ts("2025-01-01 10:00:03"),
          "http://example.com/c", "en", "s0", "way too short"),
        // exact text duplicate of doc 1 under a NEW url → dropped at
        // the content-hash stage
        Doc(5L, ts("2025-01-01 10:00:04"),
          "http://example.com/d", "en", "s0", good))
      q.processAllAvailable()
      val out = spark.table("curate_out")
      assert(out.select("doc_id").collect().map(_.getLong(0)).toSet
        === Set(1L))
      // emitted rows carry the canonical url and content hash for the
      // downstream batch fold's stored indexes
      val r = out.head()
      assert(r.getAs[String]("curl") === "http://example.com/a?a=1&b=2")
      assert(out.columns.contains("h"))
    } finally q.stop()
  }

  test("stream gopher gate agrees with the batch gopherFlags verdict") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // run the BATCH flags over the same texts: the stream must keep
    // exactly the docs the batch funnel's gopher stage keeps
    val texts = Seq((1L, good), (2L, "too short"),
      (3L, good + " " + good)) // doubled text → high dup_frac
    val batch = texts.map { case (id, t) => (id, "s0", "en", t) }
      .toDF("doc_id", "source", "lang", "text")
    val gpass = graft.queries.TextAnalysis.gopherFlags(batch)
      .filter(col("r_nwords") * col("r_meanlen") * col("r_stop") *
        col("r_dupfrac") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamCurate.curateWithinWatermark(
        input.toDF(), "ts", "10 seconds", Seq("en"))
      .writeStream.format("memory").queryName("curate_parity")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(texts.zipWithIndex.map { case ((id, t), i) =>
        Doc(id, ts(s"2025-01-01 10:00:0$i"),
          s"http://example.com/p$id", "en", "s0", t)
      }: _*)
      q.processAllAvailable()
      assert(spark.table("curate_parity").select("doc_id")
        .collect().map(_.getLong(0)).toSet === gpass)
    } finally q.stop()
  }
}
