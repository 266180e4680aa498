package graft.core

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  test("commit / latest-read / time travel / history") {
    val path = Files.createTempDirectory("graft-vt").toString + "/t"
    val v1 = VersionedTable.commit(Seq((1, "a"), (2, "b")).toDF("id", "s"), path)
    assert(v1 === 1)
    val v2 = VersionedTable.commit(Seq((3, "c")).toDF("id", "s"), path)
    assert(v2 === 2)
    assert(VersionedTable.versions(spark, path) === Seq(1, 2))
    // latest wins by default
    assert(VersionedTable.read(spark, path).count() === 1)
    // time travel to the superseded snapshot
    val old = VersionedTable.read(spark, path, Some(1))
    assert(old.orderBy("id").as[(Int, String)].collect()
      .toSeq === Seq((1, "a"), (2, "b")))
  }

  test("uncommitted snapshot directory is invisible to readers") {
    val path = Files.createTempDirectory("graft-vt2").toString + "/t"
    VersionedTable.commit(Seq(1).toDF("id"), path)
    // simulate a writer that died after the parquet job, before the
    // marker: v00002 exists on disk but was never committed
    Seq(99).toDF("id").write.parquet(s"$path/v00002")
    assert(VersionedTable.latestVersion(spark, path) === Some(1))
    assert(VersionedTable.read(spark, path).as[Int].collect().toSeq === Seq(1))
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, path, Some(2))
    }
  }

  test("merge upserts matching keys and inserts new ones") {
    val path = Files.createTempDirectory("graft-vt-m").toString + "/t"
    VersionedTable.commit(
      Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)).toDF("id", "s", "v"),
      path)
    val updates = Seq((2, "B", 99.0), (4, "d", 40.0)).toDF("id", "s", "v")
    val v = VersionedTable.merge(spark, path, updates, keys = Seq("id"))
    assert(v === 2)
    val now = VersionedTable.read(spark, path)
      .orderBy("id").as[(Int, String, Double)].collect().toSeq
    assert(now === Seq((1, "a", 10.0), (2, "B", 99.0), (3, "c", 30.0),
      (4, "d", 40.0)))
    // pre-merge state still time-travelable
    assert(VersionedTable.read(spark, path, Some(1)).count() === 3)
  }

  test("delete removes matching rows copy-on-write") {
    val path = Files.createTempDirectory("graft-vt-d").toString + "/t"
    VersionedTable.commit(Seq((1, "keep"), (2, "drop")).toDF("id", "s"), path)
    VersionedTable.delete(spark, path, col("s") === "drop")
    assert(VersionedTable.read(spark, path).as[(Int, String)]
      .collect().toSeq === Seq((1, "keep")))
    assert(VersionedTable.read(spark, path, Some(1)).count() === 2)
  }

  test("vacuum drops superseded snapshots, keeps the latest") {
    val path = Files.createTempDirectory("graft-vt3").toString + "/t"
    (1 to 3).foreach(i => VersionedTable.commit(Seq(i).toDF("id"), path))
    VersionedTable.vacuum(spark, path)
    assert(VersionedTable.versions(spark, path) === Seq(3))
    assert(VersionedTable.read(spark, path).as[Int].collect().toSeq === Seq(3))
    assert(!new java.io.File(s"$path/v00001").exists())
  }

  test("partitioned snapshot commit keeps hive layout per version") {
    val path = Files.createTempDirectory("graft-vt4").toString + "/t"
    val df = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    VersionedTable.commit(df, path, partitionBy = Seq("k"))
    assert(new java.io.File(s"$path/v00001/k=a").exists())
    assert(VersionedTable.read(spark, path).count() === 2)
  }

  test("compact rewrites many small files into few, same data") {
    val path = Files.createTempDirectory("graft-cp").toString + "/t"
    val df = spark.range(0, 1000).withColumn("v", col("id") * 2)
    df.repartition(64).write.parquet(path) // 64 tiny files
    def partFiles() = new java.io.File(path).listFiles()
      .count(_.getName.startsWith("part-"))
    assert(partFiles() === 64)
    val before = spark.read.parquet(path).orderBy("id").collect()
    ParquetTable.compact(spark, path) // total bytes ≪ 128MB target → 1 file
    assert(partFiles() === 1)
    val after = spark.read.parquet(path).orderBy("id").collect()
    assert(after.toSeq === before.toSeq)
  }

  test("partitioned compact preserves partition dirs and data") {
    val path = Files.createTempDirectory("graft-cp2").toString + "/t"
    val df = spark.range(0, 200)
      .withColumn("k", (col("id") % 2).cast("string"))
    df.repartition(16).write.partitionBy("k").parquet(path)
    val before = spark.read.parquet(path).orderBy("id").collect()
    ParquetTable.compact(spark, path, partitionBy = Seq("k"))
    assert(new java.io.File(s"$path/k=0").exists())
    val perDir = new java.io.File(s"$path/k=0").listFiles()
      .count(_.getName.startsWith("part-"))
    assert(perDir === 1)
    val after = spark.read.parquet(path).orderBy("id").collect()
    assert(after.toSeq === before.toSeq)
  }
}
