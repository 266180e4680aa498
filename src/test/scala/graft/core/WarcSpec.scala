package graft.core

import java.io.ByteArrayInputStream
import java.nio.file.Files
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def writeReadBack(rows: Seq[(String, String)]) = {
    val tmp = Files.createTempDirectory("warc_spec").toString
    val df = rows.toDF("record_id", "text").select(
      col("record_id"),
      concat(lit("http://x.example/"), col("record_id")).as("target_uri"),
      lit("2026-01-01T00:00:00Z").as("warc_date"),
      lit("text/plain").as("content_type"),
      encode(col("text"), "UTF-8").as("payload"))
    WarcTable.write(df, tmp)
    (tmp, WarcTable.read(spark, tmp))
  }

  test("round trip is byte-lossless, including CRLFs inside payloads") {
    // payloads containing the record terminator sequence and unicode
    // must survive: framing is Content-Length, not sentinel scanning
    val tricky = Seq(
      "a" -> "plain text",
      "b" -> "embedded\r\n\r\nterminator and\nnewlines",
      "c" -> "unicode é中文 and WARC/1.0 lookalike header",
      "d" -> "")
    val (_, back) = writeReadBack(tricky)
    val got = back.filter($"warc_type" === "response")
      .select($"record_id", decode($"payload", "UTF-8").as("text"),
        $"content_length")
      .as[(String, String, Long)].collect().sortBy(_._1)
    assert(got.map(r => r._1 -> r._2).toSeq === tricky.sortBy(_._1))
    // content_length is the UTF-8 octet count, not the char count
    val c = got.find(_._1 == "c").get
    assert(c._3 === c._2.getBytes("UTF-8").length.toLong)
  }

  test("one warcinfo record per shard file, typed and parseable") {
    val (_, back) = writeReadBack(Seq("a" -> "x", "b" -> "y"))
    val info = back.filter($"warc_type" === "warcinfo").collect()
    assert(info.nonEmpty)
    assert(info.forall(_.getAs[String]("record_id")
      .startsWith("urn:graft:warcinfo:")))
    assert(back.filter($"warc_type" === "response").count() === 2)
  }

  test("files are concatenated per-record gzip members (CC layout)") {
    val (tmp, _) = writeReadBack(Seq("a" -> "x", "b" -> "y"))
    val f = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).maxBy(_.length)
    val bytes = Files.readAllBytes(f.toPath)
    // at least two gzip magic headers = multiple members in one file
    val magics = bytes.sliding(2).count(a =>
      (a(0) & 0xff) == 0x1f && (a(1) & 0xff) == 0x8b)
    assert(magics >= 2)
    // a plain multi-member GZIPInputStream walk sees every record
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
    val n = WarcTable.records(in).count(_ => true)
    assert(n >= 2) // warcinfo + at least one response in this shard
  }

  test("corrupt archives fail loudly") {
    def parse(s: String) =
      WarcTable.records(new ByteArrayInputStream(s.getBytes("UTF-8")))
        .toList
    intercept[IllegalArgumentException] {
      parse("HTTP/1.1 200 OK\r\n\r\n")
    }
    intercept[IllegalArgumentException] {
      parse("WARC/1.0\r\nWARC-Type: response\r\n\r\n") // no Content-Length
    }
    intercept[java.io.EOFException] {
      parse("WARC/1.0\r\nContent-Length: 100\r\n\r\nshort")
    }
  }

  test("allocation bombs throw cleanly BEFORE allocating") {
    def parse(s: String) =
      WarcTable.records(new ByteArrayInputStream(s.getBytes("UTF-8")))
        .toList
    // multi-GB Content-Length: the throw must come from the guard,
    // not from a 2 GB array allocation (an OOM Error would kill the
    // task, not fail the record)
    intercept[IllegalArgumentException] {
      parse("WARC/1.0\r\nContent-Length: 2000000000\r\n\r\n")
    }
    intercept[IllegalArgumentException] {
      parse("WARC/1.0\r\nContent-Length: -5\r\n\r\n")
    }
    // endless header block (streamed, never materialized here): the
    // header-count guard fires at 1024 lines
    val many = new java.io.SequenceInputStream(
      new ByteArrayInputStream("WARC/1.0\r\n".getBytes("UTF-8")),
      new java.io.InputStream {
        private val line = "X-Filler: y\r\n".getBytes("UTF-8")
        private var i = 0
        override def read(): Int = { val b = line(i % line.length); i += 1; b }
      })
    intercept[IllegalArgumentException] {
      WarcTable.records(many).toList
    }
    // a "line" that never ends: the 1 MiB line guard fires instead of
    // accumulating the stream
    val endless = new java.io.SequenceInputStream(
      new ByteArrayInputStream("WARC/1.0\r\nA".getBytes("UTF-8")),
      new java.io.InputStream { override def read(): Int = 'a' })
    intercept[IllegalArgumentException] {
      WarcTable.records(endless).toList
    }
  }
}
