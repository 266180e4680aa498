package graft.core

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TableFormatSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned write/read round trip with partition pruning") {
    val base = Files.createTempDirectory("graft-tf").toString
    val df = Seq(("2025-01-01", "AA", 1.0), ("2025-01-01", "DL", 2.0),
      ("2025-01-02", "AA", 3.0)).toDF("d", "carrier", "v")
    ParquetTable.write(df, s"$base/t", partitionBy = Seq("d"))
    val back = ParquetTable.read(spark, s"$base/t")
    assert(back.count() === 3)
    // partition pruning: filter on the partition column reads 1 dir
    val pruned = back.filter(col("d") === "2025-01-01")
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters"))
    assert(pruned.count() === 2)
    // append adds rows without clobbering
    ParquetTable.append(
      Seq(("2025-01-03", "UA", 4.0)).toDF("d", "carrier", "v"),
      s"$base/t", Seq("d"))
    assert(ParquetTable.read(spark, s"$base/t").count() === 4)
  }

  test("single-file CSV export writes one part file with header") {
    val base = Files.createTempDirectory("graft-csv").toString
    val df = Seq((1, "a"), (2, "b")).toDF("id", "name")
    ParquetTable.exportCsv(df, s"$base/out")
    val parts = new java.io.File(s"$base/out").listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(parts.length === 1)
    val back = spark.read.option("header", "true").csv(s"$base/out")
    assert(back.columns.toSeq === Seq("id", "name"))
    assert(back.count() === 2)
  }
}
