package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming KMV (bottom-k) sketches per tumbling window — the
  * streaming twin of `operators.Kmv.sketches`, in the
  * [[StreamCountMin]] bit-identical family: a bottom-k of DISTINCT
  * hashes is a pure order-free set fold (min-k of a union is the
  * min-k of min-ks), so the emitted sketch rows are bit-identical to
  * the batch windowed group-limit over the same window's rows, no
  * matter how the stream interleaves, retries, or batches —
  * StreamKmvSpec pins stream ≡ batch equality, and downstream
  * `Kmv.pairJaccard` / the (k−1)·P/kth cardinality estimator consume
  * emitted rows interchangeably with batch sketch rows.
  *
  * State per (window, key) is AT MOST k sorted longs — never the
  * distinct set, never buffered events: each micro-batch merges its
  * hashes into the running bottom-k and re-truncates, so a key with a
  * billion distinct hashes still carries k longs of state.
  * EventTimeTimeout emits the sketch when the watermark closes the
  * window and removes the state.
  */
object StreamKmv {

  final case class Keyed(ts: Timestamp, key: String, h: Long)
  final case class KmvState(hashes: Seq[Long])
  final case class SketchRow(window_start: Timestamp,
      window_end: Timestamp, key: String, h: Long)

  /** Emits each tumbling window's per-key bottom-k sketch (one row
    * per retained hash) once the watermark passes the window end.
    */
  def sketches(items: Dataset[Keyed], windowSeconds: Long,
      watermarkDelay: String, k: Int)(
      implicit spark: SparkSession): Dataset[SketchRow] = {
    import spark.implicits._
    require(k >= 1 && windowSeconds > 0)
    val winMs = windowSeconds * 1000L
    items
      .withWatermark("ts", watermarkDelay)
      .groupByKey(r => (Math.floorDiv(r.ts.getTime, winMs) * winMs, r.key))
      .flatMapGroupsWithState[KmvState, SketchRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((winStart, key), batch, state: GroupState[KmvState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            s.hashes.iterator.map(h => SketchRow(new Timestamp(winStart),
              new Timestamp(winStart + winMs), key, h))
          } else {
            // min-k of (running min-k ∪ batch hashes): distinct, sort,
            // truncate — associative and commutative, so replays and
            // reorderings cannot change the closed-window contents
            val merged = (state.getOption.map(_.hashes).getOrElse(Nil) ++
              batch.map(_.h)).distinct.sorted.take(k)
            state.update(KmvState(merged))
            state.setTimeoutTimestamp(winStart + winMs)
            Iterator.empty
          }
      }
  }
}
