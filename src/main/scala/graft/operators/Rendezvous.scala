package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  * Shape at scale: explode keys × S candidate shards (narrow, no
  * shuffle — S is the shard count, a small constant), pick the argmax
  * per key with a window over the S rows. The WindowGroupLimit
  * optimizer prunes to the winner per key before any wide exchange.
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
    val exploded = df
      .withColumn("shard", explode(array((0 until nShards).map(lit): _*)))
      .withColumn("w", weight(col(keyCol), col("shard")))
    val win = Window.partitionBy(col(keyCol))
      .orderBy(col("w").desc, col("shard").asc)
    exploded.withColumn("rn", row_number().over(win))
      .filter(col("rn") === 1)
      .drop("w", "rn")
  }
}
