package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) sharding — the consistent
  * assignment rule for shard maps that must survive resizing: key k
  * goes to argmax_s w(k, s) over the live shard set. Its defining
  * guarantee (Thaler & Ravishankar 1996): when a shard is ADDED, the
  * only keys that move are those won by the new shard — no key ever
  * moves BETWEEN existing shards, so a resize re-shuffles 1/(S+1) of
  * the data instead of nearly all of it (naive k mod S moves ~S/(S+1)).
  *
  * Weights are fixed-constant BIGINT arithmetic mod 1e9+7 — the
  * assignment is a pure function of (key, shard id), reproducible in
  * ANSI SQL, partition-independent, and stable across runs.
  *
  * Shape at scale: per-row argmax over an S-element struct array
  * (S is the shard count, a small constant) — fully narrow, zero
  * shuffle, and safe for NON-UNIQUE keys: every input row is
  * assigned independently (duplicate keys get the same shard, and
  * no row is dropped), unlike a window-over-key argmax which would
  * collapse duplicates to one row.
  */
object Rendezvous {

  private val P = 1000000007L

  /** w(key, shard): combine then SQUARE-mix mod P. The square is the
    * load-bearing step — an affine-in-shard weight (mix(key) + s·C)·A
    * leaves the per-key shard ordering structured and starves low
    * shards (measured: shards 0-1 got 10/2000 keys); h² mod P is
    * non-linear in s, so orderings decorrelate. All intermediates
    * < 2^63 (h < P ⇒ h² < ~1e18). */
  def weight(key: Column, shard: Column): Column = {
    val h = ((key.cast("long") % P) * lit(2654435761L) % P
      + shard.cast("long") * lit(97003L) + lit(11L)) % P
    (h * h % P * lit(40503L) + h) % P
  }

  /** Assigns each row's `keyCol` to its HRW shard in [0, nShards):
    * input columns + `shard`. Ties (probability ~S²/P) break to the
    * smallest shard id, deterministically. */
  def assign(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1)
    // struct compares field-by-field: max w first, then max(-shard) =
    // smallest shard id on ties — exactly (w desc, shard asc).
    val cands = array((0 until nShards).map { s0 =>
      struct(weight(col(keyCol), lit(s0)).as("w"), lit(-s0).as("ns"))
    }: _*)
    df.withColumn("shard", (-array_max(cands).getField("ns")).cast("int"))
  }
}
