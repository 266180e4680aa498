package graft.core

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec

class AvroSpec extends SparkSpec {

  test("round trip is lossless across every supported type, incl. nulls") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n", IntegerType),
      StructField("x", DoubleType),
      StructField("flag", BooleanType),
      StructField("s", StringType),
      StructField("payload", BinaryType),
      StructField("vec", ArrayType(FloatType)),
      StructField("ids", ArrayType(LongType))))
    val rows = Seq(
      Row(1L, 42, 3.25, true, "hello world", Array[Byte](1, 2, 3),
        Seq(0.5f, -1.25f, 3.0f), Seq(10L, 20L)),
      Row(2L, null, null, false, "", Array.empty[Byte],
        Seq.empty[Float], null),
      Row(3L, -7, -0.0, null, null, null, Seq(Float.MinPositiveValue),
        Seq(Long.MaxValue, Long.MinValue)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val tmp = Files.createTempDirectory("avro_spec").toString
    val back = AvroTable.roundTrip(df, tmp)
    assert(back.schema === schema)
    def norm(r: Row): Seq[Any] = r.toSeq.map {
      case b: Array[Byte] => b.toSeq
      case s: scala.collection.Seq[_] => s.toSeq
      case x => x
    }
    assert(back.collect().map(norm).sortBy(_.head.asInstanceOf[Long]).toSeq
      === rows.map(norm).sortBy(_.head.asInstanceOf[Long]))
    // the container is real Avro: file count = non-empty partitions
    assert(Files.list(java.nio.file.Paths.get(tmp)).iterator().asScala
      .count(_.toString.endsWith(".avro")) === 2)
  }

  private implicit class It[A](i: java.util.Iterator[A]) {
    def asScala: Iterator[A] = scala.jdk.CollectionConverters
      .IteratorHasAsScala(i).asScala
  }

  test("unsupported interchange types fail loudly at schema translation") {
    val bad = StructType(Seq(
      StructField("m", MapType(StringType, LongType))))
    val e = intercept[IllegalArgumentException] {
      AvroTable.avroSchema(bad, "Bad")
    }
    assert(e.getMessage.contains("unsupported avro interchange type"))
  }
}
