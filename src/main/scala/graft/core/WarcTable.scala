package graft.core

import java.io.{BufferedInputStream, ByteArrayInputStream, EOFException,
  InputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC/1.0 (ISO 28500) interchange — the archive format LLM corpora
  * are crawled into (Common Crawl ships WARC). Not part of the
  * reference surface (parquet/Delta-only, see SURVEY §2); added for
  * the training-data pipeline, which must ingest raw crawl archives.
  *
  * On-disk layout matches Common Crawl's convention: each record is
  * its OWN gzip member and a file is the concatenation of members
  * (readers can split on member boundaries; java.util.zip's
  * GZIPInputStream walks concatenated members natively). A file
  * starts with one `warcinfo` record, then `response` records; every
  * record is `WARC/1.0\r\n` + named headers + `\r\n` + exactly
  * Content-Length payload bytes + `\r\n\r\n`. Payloads are arbitrary
  * bytes — CRLFs inside the payload cannot confuse the parser because
  * framing is length-delimited, never sentinel-delimited (pinned by
  * WarcSpec).
  *
  * Scale notes (100 TB):
  *  - a WARC file is not splittable below member granularity, so one
  *    file = one read task — the standard discipline for crawl
  *    processing (Common Crawl shards ~1 GB/file; the writer emits
  *    one file per partition, so the caller sizes shards with
  *    repartition, same as the parquet/JSONL writers);
  *  - the reader is `binaryFile` scan → per-partition streaming
  *    parse: one pass, no driver involvement, memory bounded by one
  *    file + one record;
  *  - the writer streams records through a fresh per-record gzip
  *    member on an executor-side Hadoop FileSystem handle (works on
  *    file://, hdfs://, or any configured object store).
  */
object WarcTable {

  val Version = "WARC/1.0"

  /** Read-back schema: one row per WARC record. */
  val schema: StructType = StructType(Seq(
    StructField("warc_type", StringType, nullable = false),
    StructField("record_id", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Write `df` as sharded .warc.gz files (one per partition).
    * Expected columns: record_id, target_uri, warc_date, content_type
    * (strings) and payload (binary). Existing output is replaced.
    */
  def write(df: DataFrame, path: String): Unit = {
    val out = new Path(path)
    val fs = out.getFileSystem(
      df.sparkSession.sessionState.newHadoopConf())
    fs.delete(out, true)
    fs.mkdirs(out)
    val cols = df.select(col("record_id"), col("target_uri"),
      col("warc_date"), col("content_type"), col("payload"))
    cols.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val pid = TaskContext.getPartitionId()
        val part = new Path(out, f"part-$pid%05d.warc.gz")
        // Executor-side FS handle: default Configuration picks up the
        // cluster's core-site from the classpath (file:// needs none).
        val efs = part.getFileSystem(new Configuration())
        val os = efs.create(part, true)
        try {
          writeMember(os, warcinfoRecord(pid))
          rows.foreach { r =>
            writeMember(os, responseRecord(
              r.getString(0), r.getString(1), r.getString(2),
              r.getString(3), r.getAs[Array[Byte]](4)))
          }
        } finally os.close()
      }
    }
  }

  /** Parse every record of every .warc.gz file under `path`. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.gz").load(path)
      .select(col("content"))
    files.mapPartitions { rows =>
      rows.flatMap { r =>
        val in = new BufferedInputStream(new GZIPInputStream(
          new ByteArrayInputStream(r.getAs[Array[Byte]](0)), 1 << 16))
        records(in)
      }
    }(Encoders.row(schema))
  }

  /** Write one record as its own gzip member (Common Crawl layout). */
  private def writeMember(os: java.io.OutputStream,
      record: Array[Byte]): Unit = {
    val gz = new GZIPOutputStream(os, 1 << 16) {
      // keep the underlying stream open across members
      override def close(): Unit = finish()
    }
    gz.write(record)
    gz.close()
    os.flush()
  }

  private def headerBlock(pairs: Seq[(String, String)],
      contentLength: Int): Array[Byte] =
    (Version + "\r\n" +
      pairs.map { case (k, v) => s"$k: $v\r\n" }.mkString +
      s"Content-Length: $contentLength\r\n\r\n")
      .getBytes("UTF-8")

  private def responseRecord(recordId: String, targetUri: String,
      warcDate: String, contentType: String,
      payload: Array[Byte]): Array[Byte] = {
    val head = headerBlock(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> s"<$recordId>",
      "WARC-Date" -> warcDate,
      "WARC-Target-URI" -> targetUri,
      "Content-Type" -> contentType), payload.length)
    head ++ payload ++ "\r\n\r\n".getBytes("UTF-8")
  }

  private def warcinfoRecord(pid: Int): Array[Byte] = {
    val body = "software: graft\r\nformat: WARC File Format 1.0\r\n"
      .getBytes("UTF-8")
    headerBlock(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> s"<urn:graft:warcinfo:$pid>",
      "Content-Type" -> "application/warc-fields"), body.length) ++
      body ++ "\r\n\r\n".getBytes("UTF-8")
  }

  /** Streaming record parser: strict on framing (a malformed version
    * line or missing Content-Length throws — corrupt archives fail
    * loudly, never yield silently truncated corpora).
    */
  private[core] def records(in: InputStream): Iterator[Row] =
    new Iterator[Row] {
      private var nextRow: Row = advance()
      override def hasNext: Boolean = nextRow != null
      override def next(): Row = {
        val r = nextRow; nextRow = advance(); r
      }

      private def advance(): Row = {
        // skip inter-record blank lines; EOF here ends the iterator
        var line = readLine(in)
        while (line != null && line.isEmpty) line = readLine(in)
        if (line == null) return null
        if (!line.startsWith("WARC/"))
          throw new IllegalArgumentException(
            s"WARC: bad version line '$line'")
        var headers = Map.empty[String, String]
        var nHeaders = 0
        var h = readLine(in)
        while (h != null && h.nonEmpty) {
          val i = h.indexOf(':')
          if (i < 0) throw new IllegalArgumentException(
            s"WARC: bad header line '$h'")
          nHeaders += 1
          // allocation-bomb guard: a crafted endless header block
          // must fail as a clean throw, not grow the map until OOM
          // (an Error would kill the task, not fail the record)
          if (nHeaders > 1024) throw new IllegalArgumentException(
            "WARC: more than 1024 header lines")
          headers += h.substring(0, i).trim.toLowerCase ->
            h.substring(i + 1).trim
          h = readLine(in)
        }
        val len = headers.getOrElse("content-length",
          throw new IllegalArgumentException(
            "WARC: missing Content-Length")).toLong
        // same guard for the payload: a crafted multi-GB
        // Content-Length must throw BEFORE the allocation
        if (len < 0 || len > (1L << 30))
          throw new IllegalArgumentException(
            s"WARC: implausible Content-Length $len")
        val payload = readFully(in, len.toInt)
        Row(
          headers.getOrElse("warc-type", ""),
          headers.getOrElse("warc-record-id", "")
            .stripPrefix("<").stripSuffix(">"),
          headers.getOrElse("warc-target-uri", null),
          headers.getOrElse("warc-date", null),
          headers.getOrElse("content-type", null),
          len, payload)
      }
    }

  /** Read a CRLF-terminated line as ISO-8859-1 (header bytes are
    * ASCII); null at EOF before any byte.
    */
  private def readLine(in: InputStream): String = {
    val buf = new ArrayBuffer[Byte](96)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') {
      buf += b.toByte
      // allocation-bomb guard: a header "line" with no newline for
      // gigabytes must throw cleanly, not accumulate until OOM
      if (buf.length > (1 << 20)) throw new IllegalArgumentException(
        "WARC: header line exceeds 1 MiB")
      b = in.read()
    }
    if (buf.nonEmpty && buf.last == '\r') buf.dropRightInPlace(1)
    new String(buf.toArray, "ISO-8859-1")
  }

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val k = in.read(out, off, n - off)
      if (k < 0) throw new EOFException(
        s"WARC: payload truncated at $off of $n bytes")
      off += k
    }
    out
  }
}
