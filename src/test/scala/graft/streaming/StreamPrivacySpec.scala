package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.operators.Privacy
import StreamPrivacy.{ClassRow, Keyed}

/** Streaming k-anonymity monitor ≡ the batch class profile on the
  * same window's rows, under interleaved triggers and duplicates;
  * windows close only via watermark; the sensitive-domain cap is
  * loud.
  */
class StreamPrivacySpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streamed per-window class rows are bit-identical to batch classProfile") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Keyed]
    val q = StreamPrivacy.classProfile(input.toDS(), windowSeconds = 60,
        watermarkDelay = "90 seconds")
      .writeStream.format("memory").queryName("priv_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // three QI classes with sizes 5 / 3 / 1 and sensitive
      // diversities 3 / 1 / 1, delivered out of order over two triggers
      val base = "2025-01-01 10:00:"
      val items = Seq(
        ("A|x", "s1"), ("A|x", "s2"), ("A|x", "s1"), ("A|x", "s3"),
        ("A|x", "s2"),
        ("B|y", "s1"), ("B|y", "s1"), ("B|y", "s1"),
        ("C|z", "s9")).zipWithIndex.map { case ((qi, sv), i) =>
        Keyed(ts(f"$base${(i * 13) % 60}%02d"), qi, sv)
      }
      val (x, y) = items.splitAt(4)
      input.addData(x.reverse: _*)
      q.processAllAvailable()
      input.addData(y: _*)
      q.processAllAvailable()
      assert(spark.table("priv_out").count() === 0, "window still open")
      input.addData(Keyed(ts("2025-01-01 10:05:30"), "late", "s"))
      q.processAllAvailable()
      val streamed = spark.table("priv_out").as[ClassRow].collect()
        .map(r => (r.qi, r.class_size, r.class_l)).sorted.toSeq
      val batch = Privacy.classProfile(
          items.map(i => (i.qi, i.sensitive)).toDF("qi", "sensitive"),
          Seq("qi"), "sensitive")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      assert(streamed === batch, "stream ≢ batch class profile")
      assert(streamed === Seq(("A|x", 5L, 3L), ("B|y", 3L, 1L),
        ("C|z", 1L, 1L)))
    } finally q.stop()
  }

  test("sensitive-domain cap fails loudly instead of growing state") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Keyed]
    val q = StreamPrivacy.classProfile(input.toDS(), windowSeconds = 60,
        watermarkDelay = "90 seconds")
      .writeStream.format("memory").queryName("priv_cap")
      .outputMode(OutputMode.Append()).start()
    try {
      val many = (0 to StreamPrivacy.MAX_SENSITIVE_DOMAIN).map(i =>
        Keyed(ts("2025-01-01 10:00:01"), "Q", s"v$i"))
      input.addData(many: _*)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage != null)
    } finally q.stop()
  }
}
