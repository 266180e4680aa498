package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Clustered streaming sink: every micro-batch lands as
  * Hilbert-clustered parquet files, so STREAMED ingest gets the q233
  * data-skipping layout without a separate compaction pass — each
  * file's (x, y) min/max box is tight in BOTH dimensions and a 2-D
  * box predicate prunes most files on read.
  *
  * Shape per batch: normalize both cluster columns against FROZEN
  * domain bounds (passed in, the frozen-model discipline — bounds are
  * corpus facts, not per-batch statistics, or file boxes would drift
  * batch to batch), key by [[graft.expressions.HilbertIndex]], ONE
  * repartitionByRange on the key (the same single range exchange any
  * clustered write pays), sortWithinPartitions so parquet row-group
  * stats inherit the clustering, append. Exactly-once comes from the
  * checkpointed foreachBatch offsets + idempotent parquet append.
  */
object StreamClusteredWrite {

  /** Add the Hilbert cluster key of (xCol, yCol) normalized from
    * [0, xMax] × [0, yMax] onto a [0, 2^bits) grid.
    */
  def withClusterKey(df: DataFrame, xCol: String, yCol: String,
      xMax: Long, yMax: Long, bits: Int): DataFrame = {
    require(xMax >= 0 && yMax >= 0 && bits >= 1 && bits <= 31)
    val n = 1L << bits
    def norm(c: String, mx: Long) =
      expr(s"(CAST($c AS BIGINT) * $n) div (${mx} + 1)")
    df.withColumn("__hkey", call_function("graft_hilbert",
      norm(xCol, xMax), norm(yCol, yMax), lit(bits)))
  }

  /** Start the clustered append sink. `filesPerBatch` bounds the range
    * exchange's partition count = parquet files per micro-batch.
    */
  def start(df: DataFrame, xCol: String, yCol: String, xMax: Long,
      yMax: Long, bits: Int, filesPerBatch: Int, outDir: String,
      checkpoint: String): StreamingQuery = {
    require(filesPerBatch >= 1)
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          withClusterKey(batch, xCol, yCol, xMax, yMax, bits)
            .repartitionByRange(filesPerBatch, col("__hkey"))
            .sortWithinPartitions(col("__hkey"))
            .drop("__hkey")
            .write.mode("append").parquet(outDir)
        }
        ()
      }
      .start()
  }
}
