package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.pipeline.FlightSchema

class StreamIngestSpec extends SparkSpec {

  private def csvRow(flNum: Int): String =
    s"1/15/2025 12:00:00 AM,AA,$flNum,11057,CLT,12892,LAX,0900,0905," +
      "5.0,5.0,1200,1158,-2.0,0.0,0.0,0.0,290.0,2125.0"
  private val header =
    "FL_DATE,OP_UNIQUE_CARRIER,OP_CARRIER_FL_NUM,ORIGIN_AIRPORT_ID,ORIGIN," +
      "DEST_AIRPORT_ID,DEST,CRS_DEP_TIME,DEP_TIME,DEP_DELAY,DEP_DELAY_NEW," +
      "CRS_ARR_TIME,ARR_TIME,ARR_DELAY,ARR_DELAY_NEW,CANCELLED,DIVERTED," +
      "AIR_TIME,DISTANCE"

  test("incremental file ingest: second run only appends new files") {
    val base = Files.createTempDirectory("graft-stream").toString
    val in = s"$base/in"; val out = s"$base/out"; val cp = s"$base/cp"
    Files.createDirectories(Paths.get(in))

    Files.writeString(Paths.get(s"$in/batch1.csv"),
      (header +: (1 to 5).map(csvRow)).mkString("\n"))
    StreamIngest.ingestOnce(spark, in, FlightSchema.flightData, out, cp,
      clock = lit("2025-02-01 00:00:00").cast("timestamp"))
    val afterFirst = spark.read.parquet(out)
    assert(afterFirst.count() === 5)
    assert(afterFirst.columns.contains("source_file"))
    assert(afterFirst.select("partition_date").distinct().head()
      .getDate(0).toString === "2025-01-15")

    // drop a second file; checkpoint must skip batch1
    Files.writeString(Paths.get(s"$in/batch2.csv"),
      (header +: (6 to 8).map(csvRow)).mkString("\n"))
    StreamIngest.ingestOnce(spark, in, FlightSchema.flightData, out, cp,
      clock = lit("2025-02-01 00:00:00").cast("timestamp"))
    val afterSecond = spark.read.parquet(out)
    assert(afterSecond.count() === 8)
    // exactly-once: flight numbers 1-8, no re-processing of batch1
    assert(afterSecond.select("OP_CARRIER_FL_NUM").distinct().count() === 8)
  }
}
