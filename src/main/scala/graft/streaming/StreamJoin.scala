package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked STREAM–STREAM interval join — the attribution
  * primitive (q144's view→click funnel as a streaming twin): every
  * effect-stream row joins the cause-stream rows of the same key
  * whose timestamp precedes it by at most `horizon`.
  *
  * This is the one Structured Streaming join class where BOTH inputs
  * are unbounded: Spark buffers each side's rows as join state, and
  * the pair (two watermarks + a time-range join condition) is exactly
  * what lets it evict — a cause row older than
  * `watermark − horizon` can never match a future in-time effect row,
  * so the state store drops it (spec-verified via the state-operator
  * metrics, not assumed). Without the range condition the state would
  * grow without bound; this operator makes the condition part of its
  * contract rather than a caller obligation.
  *
  * Semantics: emit (cause, effect) for effect.ts ∈
  * [cause.ts, cause.ts + horizon], equi-keyed on `keyCol` — ALL pairs
  * in the window, the raw attribution table (first-touch/last-touch
  * are one downstream aggregate over it). `leftOuter` additionally
  * emits each unmatched cause row once, null-padded, AFTER the
  * watermark proves no effect can still arrive — the "views that
  * never converted" side of the funnel, impossible to know early.
  *
  * Batch equivalence: on a bounded, fully in-time replay the SAME
  * join expression over static frames returns the identical pair set
  * (spec-pinned) — the streaming run adds only the late-data drop.
  *
  * Scale: state is hash-partitioned by the join key; per-key state
  * holds only rows inside the horizon. Output columns are the cause
  * columns prefixed `l_` and effect columns prefixed `r_` (the
  * rename also keeps the two `ts` columns distinct).
  */
object StreamJoin {

  def intervalJoin(cause: DataFrame, effect: DataFrame, keyCol: String,
      tsCol: String, horizon: String, watermarkDelay: String,
      joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "leftOuter").contains(joinType),
      s"unsupported joinType $joinType (inner | leftOuter)")
    val l = cause.toDF(cause.columns.map("l_" + _): _*)
      .withWatermark(s"l_$tsCol", watermarkDelay)
    val r = effect.toDF(effect.columns.map("r_" + _): _*)
      .withWatermark(s"r_$tsCol", watermarkDelay)
    l.join(r,
      col(s"l_$keyCol") === col(s"r_$keyCol") &&
        col(s"r_$tsCol") >= col(s"l_$tsCol") &&
        col(s"r_$tsCol") <= col(s"l_$tsCol") + expr(s"interval $horizon"),
      joinType)
  }

  /** STREAM–STATIC broadcast enrichment — the other streaming join
    * class (one side bounded): decorate an event stream with a
    * dimension snapshot (user → segment, url → domain reputation,
    * doc → curation verdict). The static side broadcasts, so the
    * stream never shuffles and NO join state accrues — unlike
    * [[intervalJoin]] there is nothing to watermark or evict, which
    * is exactly why this is the default enrichment shape at scale
    * (a stateful join for a lookup table would buffer the whole
    * stream).
    *
    * `left` keeps unmatched events null-padded (the usual contract:
    * an unknown key must not drop the event); pass `inner` to gate
    * instead. The dim snapshot is resolved at query START — a
    * file-backed dim updated mid-query is not re-listed (the
    * Structured Streaming static-side caveat, spec-pinned); restart
    * the query (or use a versioned-table view) to pick up dim
    * changes.
    */
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String],
      joinType: String = "left"): DataFrame = {
    require(Seq("left", "inner").contains(joinType),
      s"unsupported joinType $joinType (left | inner)")
    stream.join(broadcast(dim), keys, joinType)
  }
}
