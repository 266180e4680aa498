package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.CountMin

/** Streaming Count-Min sketch per tumbling window — the streaming
  * twin of `operators.CountMin`, and unlike [[StreamFrequentItems]]'
  * Misra-Gries bounds this twin is EXACT about its own artifact: CMS
  * counters are pure order-free integer sums, so the emitted sketch
  * is bit-identical to `CountMin.counters` over the same window's
  * rows no matter how the stream interleaves, retries, or batches —
  * StreamCountMinSpec pins stream ≡ batch equality.
  *
  * State per (window, row) is one w-bounded bucket map (never the key
  * universe, never buffered events); each item fans out to its d row
  * keys BEFORE the shuffle, so update work spreads across executors
  * exactly like the batch hash-agg. EventTimeTimeout emits the
  * counters when the watermark closes the window and removes the
  * state — downstream estimates run `CountMin.estimate` over the
  * emitted rows, batch and stream interchangeably (counters from
  * adjacent windows merge by addition, the CMS fold contract).
  */
object StreamCountMin {

  final case class Hashed(ts: Timestamp, h: Long)
  final case class Routed(ts: Timestamp, row: Int, bucket: Long)
  final case class CmsState(counts: Map[Long, Long])
  final case class CounterRow(window_start: Timestamp,
      window_end: Timestamp, row: Int, bucket: Long, cnt: Long)

  /** Emits the (row, bucket, cnt) counter table of each tumbling
    * window once the watermark passes its end.
    */
  def counters(items: Dataset[Hashed], windowSeconds: Long,
      watermarkDelay: String, d: Int, w: Int)(
      implicit spark: SparkSession): Dataset[CounterRow] = {
    import spark.implicits._
    require(d >= 1 && d <= CountMin.maxDepth && w >= 2 &&
      windowSeconds > 0)
    val winMs = windowSeconds * 1000L
    items
      .flatMap(it => (0 until d).map(i =>
        Routed(it.ts, i, CountMin.bucketOf(it.h, i, w))))
      .withWatermark("ts", watermarkDelay)
      .groupByKey(r => (Math.floorDiv(r.ts.getTime, winMs) * winMs, r.row))
      .flatMapGroupsWithState[CmsState, CounterRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((winStart, row), batch, state: GroupState[CmsState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            s.counts.iterator.map { case (bucket, cnt) =>
              CounterRow(new Timestamp(winStart),
                new Timestamp(winStart + winMs), row, bucket, cnt)
            }
          } else {
            val counts = scala.collection.mutable.Map.empty[Long, Long]
            state.getOption.foreach(s => counts ++= s.counts)
            batch.foreach { r =>
              counts(r.bucket) = counts.getOrElse(r.bucket, 0L) + 1L
            }
            state.update(CmsState(counts.toMap))
            state.setTimeoutTimestamp(winStart + winMs)
            Iterator.empty
          }
      }
  }
}
