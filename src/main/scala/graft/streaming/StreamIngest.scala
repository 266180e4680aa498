package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Incremental file-stream ingest (SURVEY.md §2.1 S7/S8, §2.10).
  *
  * The reference uses Databricks Autoloader (cloudFiles) with
  * trigger-once (bronze_ingest/download_and_ingest.py:214-248) —
  * proprietary; the open equivalent is Structured Streaming's file
  * source with Trigger.AvailableNow: checkpointed exactly-once file
  * discovery, bounded per run, schema pinned up front.
  *
  * Scale notes: file discovery state lives in the checkpoint (RocksDB
  * file-source log), so repeated runs only process NEW files —
  * re-delivery is handled by the sink's idempotent append +
  * checkpointed offsets. maxFilesPerTrigger bounds micro-batch size so
  * a backlog of thousands of files doesn't build one giant batch.
  */
object StreamIngest {

  def csvFileStream(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schema).option("header", "true")
      .option("timestampFormat", "M/d/yyyy hh:mm:ss a")
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.csv(dir)
  }

  /** Ingest metadata mirroring the batch path (S9); input_file_name is
    * legal here — single source.
    */
  def withStreamMetadata(df: DataFrame,
      clock: Column = current_timestamp()): DataFrame =
    df.withColumn("ingestion_timestamp", clock)
      .withColumn("source_file", input_file_name())
      .withColumn("partition_date", col("FL_DATE").cast("date"))

  /** S8: checkpointed append parquet sink, bounded run
    * (Trigger.AvailableNow ≡ the reference's trigger(once=True)).
    */
  def startAppend(df: DataFrame, outPath: String,
      checkpoint: String): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(outPath)

  /** One bounded incremental run: discover new files, append, wait. */
  def ingestOnce(spark: SparkSession, inDir: String, schema: StructType,
      outPath: String, checkpoint: String,
      clock: Column = current_timestamp()): Unit = {
    val q = startAppend(
      withStreamMetadata(csvFileStream(spark, inDir, schema), clock),
      outPath, checkpoint)
    q.awaitTermination()
  }
}
