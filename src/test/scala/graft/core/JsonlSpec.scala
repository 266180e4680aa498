package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_jsonl_$tag").toString

  test("round trip is lossless for hostile strings") {
    val rows = Seq(
      (1L, "plain ascii"),
      (2L, "embedded \"quotes\" and \\backslashes\\"),
      (3L, "newline\nand\ttab and\rcarriage"),
      (4L, "unicode: café 中文 😀 emoji"),
      (5L, ""),
      (6L, "{\"looks\":\"like json\"}"))
    val df = rows.toDF("id", "text")
    val back = JsonlTable.roundTrip(df, tmpDir("hostile"))
    assert(back.as[(Long, String)].collect().toSet === rows.toSet)
  }

  test("null fields survive and schema is the explicit one") {
    val df = Seq((1L, Some("a"), Some(10)), (2L, None, None))
      .toDF("id", "text", "n")
    val back = JsonlTable.roundTrip(df, tmpDir("nulls"))
    // the json source widens every field to nullable (a JSON line can
    // omit any key) — names and types must round-trip exactly
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.collect().map(r => (r.getLong(0),
        Option(r.get(1)), Option(r.get(2)))).toSet ===
      Set((1L, Some("a"), Some(10)), (2L, None, None)))
  }

  test("output files are gzip members, one JSON object per line") {
    val dir = tmpDir("gz")
    JsonlTable.write(Seq((1L, "x"), (2L, "y")).toDF("id", "t")
      .coalesce(1), dir)
    val files = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".json.gz"))
    assert(files.nonEmpty)
    val in = new java.util.zip.GZIPInputStream(
      new java.io.FileInputStream(files.head))
    val lines = scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toSeq
    assert(lines.size === 2)
    assert(lines.forall(l => l.startsWith("{") && l.endsWith("}")))
  }

  test("append adds rows without clobbering existing ones") {
    val dir = tmpDir("append")
    JsonlTable.write(Seq((1L, "a")).toDF("id", "t"), dir)
    JsonlTable.append(Seq((2L, "b")).toDF("id", "t"), dir)
    val back = JsonlTable.read(spark, dir,
      Seq((0L, "")).toDF("id", "t").schema)
    assert(back.as[(Long, String)].collect().toSet ===
      Set(1L -> "a", 2L -> "b"))
  }
}
