package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time streaming aggregations — beyond reference parity (the
  * reference's only stream is a pass-through file ingest), these are
  * the stateful pieces a continuously-fed lakehouse needs.
  *
  * Scale notes: watermarks bound state; the windowed aggregate's
  * shuffle key is (window, key), so state distributes across
  * executors; streaming dedup keeps one state row per id within the
  * watermark horizon.
  */
object StreamAggregates {

  /** Tumbling-window counts/sums per key, late data dropped past the
    * watermark. `tsCol` must be an event-time timestamp column.
    */
  def windowedStats(events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, windowDur: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur).as("w"), col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"),
        avg(col(valueCol)).as("avg_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col(keyCol), col("n_events"), col("sum_value"), col("avg_value"))

  /** Streaming exact dedup by id within the watermark horizon —
    * re-deliveries of the same id are dropped; state expires with the
    * watermark so it cannot grow unboundedly.
    */
  def dedupById(events: DataFrame, tsCol: String,
      idCol: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(idCol)

  /** Watermarked stream-stream interval join (the attribution shape:
    * impressions ⋈ clicks). A right row matches a left row with the
    * same key when it arrives within [leftTs, leftTs + maxDelay].
    * The event-time bound on BOTH the join condition and the
    * watermarks is what lets Spark evict join state — without it the
    * buffered sides grow forever.
    *
    * Output columns are the left columns then the right columns
    * (callers pick distinct names per side).
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftTsCol: String, rightTsCol: String,
      leftKeyCol: String, rightKeyCol: String,
      maxDelay: String, watermarkDelay: String): DataFrame = {
    val l = left.withWatermark(leftTsCol, watermarkDelay).alias("l")
    val r = right.withWatermark(rightTsCol, watermarkDelay).alias("r")
    l.join(r,
      col(s"l.$leftKeyCol") === col(s"r.$rightKeyCol") &&
        col(s"r.$rightTsCol") >= col(s"l.$leftTsCol") &&
        col(s"r.$rightTsCol") <= col(s"l.$leftTsCol") + expr(s"INTERVAL $maxDelay"))
  }
}
