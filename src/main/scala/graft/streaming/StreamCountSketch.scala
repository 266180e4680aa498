package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.CountSketch

/** Streaming Count-Sketch per tumbling window — the signed member of
  * the bit-identical streaming-sketch family ([[StreamCountMin]],
  * [[StreamKmv]]): signed counters are pure order-free integer sums
  * (each item's bucket AND sign are fixed functions of its hash), so
  * the emitted per-window counter table is bit-identical to
  * `CountSketch.counters` over the same rows regardless of trigger
  * interleaving — StreamCountSketchSpec pins it, and
  * `CountSketch.estimate` consumes batch and streamed counters
  * interchangeably.
  *
  * State per (window, row) is one w-bounded bucket→sum map; items fan
  * out to their d (row, bucket, sign) updates BEFORE the shuffle, the
  * [[StreamCountMin]] shape exactly.
  */
object StreamCountSketch {

  final case class Hashed(ts: Timestamp, h: Long)
  final case class Routed(ts: Timestamp, row: Int, bucket: Long, sgn: Long)
  final case class CsState(counts: Map[Long, Long])
  final case class CounterRow(window_start: Timestamp,
      window_end: Timestamp, row: Int, bucket: Long, cnt: Long)

  /** Emits the (row, bucket, cnt = Σ sign) counter table of each
    * tumbling window once the watermark passes its end.
    */
  def counters(items: Dataset[Hashed], windowSeconds: Long,
      watermarkDelay: String, d: Int, w: Int)(
      implicit spark: SparkSession): Dataset[CounterRow] = {
    import spark.implicits._
    require(d >= 1 && d <= CountSketch.maxDepth && d % 2 == 1 && w >= 2 &&
      windowSeconds > 0)
    val winMs = windowSeconds * 1000L
    items
      .flatMap(it => (0 until d).map(i =>
        Routed(it.ts, i, CountSketch.bucketOf(it.h, i, w),
          CountSketch.signOf(it.h, i))))
      .withWatermark("ts", watermarkDelay)
      .groupByKey(r => (Math.floorDiv(r.ts.getTime, winMs) * winMs, r.row))
      .flatMapGroupsWithState[CsState, CounterRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((winStart, row), batch, state: GroupState[CsState]) =>
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
              counts(r.bucket) = counts.getOrElse(r.bucket, 0L) + r.sgn
            }
            state.update(CsState(counts.toMap))
            state.setTimeoutTimestamp(winStart + winMs)
            Iterator.empty
          }
      }
  }
}
