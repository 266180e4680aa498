package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OrcSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_orc_$tag").toString

  test("round trip is lossless for hostile strings") {
    val rows = Seq(
      (1L, "plain ascii"),
      (2L, "embedded \"quotes\" and \\backslashes\\"),
      (3L, "newline\nand\ttab and\rcarriage"),
      (4L, "unicode: café 中文 😀 emoji"),
      (5L, ""),
      (6L, "{\"looks\":\"like json\"}"))
    val df = rows.toDF("id", "text")
    val back = OrcTable.roundTrip(df, tmpDir("hostile"))
    assert(back.as[(Long, String)].collect().toSet === rows.toSet)
  }

  test("nested array<float> columns round-trip exactly") {
    val rows = Seq(
      (1L, Array(0.5f, -1.25f, 3.75f)),
      (2L, Array(1e-9f, -1e9f, 0.0f)),
      (3L, Array.empty[Float]))
    val df = rows.toDF("vec_id", "embedding")
    val back = OrcTable.roundTrip(df, tmpDir("nested"))
    // ORC (like JSON) widens element nullability on read — names and
    // value types must survive; containsNull is allowed to widen
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map { f =>
        (f.name, f.dataType match {
          case org.apache.spark.sql.types.ArrayType(et, _) => et
          case dt => dt
        })
      }.toSeq
    assert(shape(back.schema) === shape(df.schema))
    // float bit patterns must survive the columnar round trip exactly
    assert(back.as[(Long, Array[Float])].collect()
        .map { case (id, v) => (id, v.toSeq) }.toSet ===
      rows.map { case (id, v) => (id, v.toSeq) }.toSet)
  }

  test("nulls survive and the explicit read schema is enforced") {
    val df = Seq((1L, Some("a"), Some(10)), (2L, None, None))
      .toDF("id", "text", "n")
    val back = OrcTable.roundTrip(df, tmpDir("nulls"))
    assert(back.collect().map(r => (r.getLong(0),
        Option(r.get(1)), Option(r.get(2)))).toSet ===
      Set[(Long, Option[Any], Option[Any])](
        (1L, Some("a"), Some(10)), (2L, None, None)))
  }

  test("predicate pushdown reaches the ORC scan") {
    val dir = tmpDir("pushdown")
    OrcTable.write((1L to 1000L).map(i => (i, s"doc$i")).toDF("id", "text"),
      dir)
    val df = OrcTable.read(spark, dir,
      new org.apache.spark.sql.types.StructType()
        .add("id", "long").add("text", "string"))
      .filter(col("id") === 7L).select(col("text"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,7)]") ||
      plan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,7"),
      s"filter must reach the ORC scan:\n$plan")
  }

  test("append extends the table without rewriting") {
    val dir = tmpDir("append")
    OrcTable.write(Seq((1L, "a")).toDF("id", "t"), dir)
    OrcTable.append(Seq((2L, "b")).toDF("id", "t"), dir)
    val back = OrcTable.read(spark, dir,
      new org.apache.spark.sql.types.StructType()
        .add("id", "long").add("t", "string"))
    assert(back.as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b")))
  }
}
