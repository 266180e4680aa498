package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact deduplication — the ingest-time twin of
  * `operators.Dedup.keepLatest`: drop every repeat of a key that
  * arrives within the watermark horizon of its first sighting, so the
  * downstream incremental pipeline (`pipeline/Incremental`) never
  * re-processes a redelivered document/event.
  *
  * Built on `dropDuplicatesWithinWatermark` (Spark 3.5+), NOT plain
  * `dropDuplicates`: the plain variant keeps every key's fingerprint
  * in state FOREVER (unbounded state growth — the classic streaming
  * dedup failure at corpus scale), while the watermark-scoped variant
  * evicts a key's state once the event-time watermark passes its
  * first-seen timestamp plus the delay. State is therefore bounded by
  * keys-per-horizon — at-least-once sources (Kafka redeliveries, file
  * re-lists, backfill overlap) redeliver within minutes, so a horizon
  * of hours holds state orders of magnitude smaller than the corpus.
  *
  * Duplicates farther apart than the horizon are NOT caught here —
  * that is batch dedup's job (exact/minhash over the lake); this
  * operator's contract is exactly-once WITHIN the delivery window.
  *
  * Scale: state is hash-partitioned by key (the same shuffle as any
  * keyed stateful op); eviction is watermark-driven, so state size is
  * workload-bounded, not history-bounded. RocksDB state store holds
  * the horizon on disk when keys-per-horizon outgrow executor heap.
  */
object StreamDedup {

  /** Deduplicate `events` on `keyCols` within the `delay` watermark
    * horizon measured on event-time column `tsCol`. Emits each key's
    * FIRST-ARRIVING row (processing order — at-least-once sources
    * redeliver the same payload, so first == any).
    */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
      tsCol: String, delay: String): DataFrame = {
    require(keyCols.nonEmpty)
    events
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)
  }
}
