package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-minimum-values (bottom-k) sketches for cross-corpus set overlap
  * — the sketch family whose CONTENTS are a deterministic function of
  * the input (the k smallest integer hashes of the distinct set),
  * unlike HLL's register layout (q40), so estimates oracle BIT-EXACT:
  * every number here is integer counting plus one IEEE division.
  *
  * The point at 100 TB: pairwise corpus overlap (|A∩B|, Jaccard)
  * without joining corpus-sized sets. Exact overlap needs the
  * vocab-level self-join per pair; the KMV path reduces each corpus
  * to k longs (one bottom-k per key — a windowed group limit, no
  * global sort), and all pair arithmetic runs on |keys|²·k tiny rows.
  * The estimator is the standard bottom-k Jaccard: merge two
  * sketches, keep the k smallest of the union, count how many of
  * those appear in both sketches — matches/k is an unbiased Jaccard
  * estimate with rsd ≈ 1/√k. When a set has fewer than k distinct
  * hashes the sketch IS the set and the estimate is exact.
  */
object Kmv {

  /** Bottom-k sketch per key: input must be DISTINCT (key, hash)
    * rows; output keeps the k smallest hashes per key. One windowed
    * group-limit — Spark pushes the rank filter into a partial
    * top-k, so no key's full set is ever buffered.
    */
  def sketches(sets: DataFrame, keyCol: String, hashCol: String,
      k: Int): DataFrame = {
    require(k >= 1)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(hashCol).asc)
    sets.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Pairwise (key_a < key_b) Jaccard estimates from sketches: for
    * each pair, the k smallest of the merged sketch hashes vote —
    * a hash in both sketches is an intersection witness. Returns
    * (key_a, key_b, k_eff, n_match, jacc_est); k_eff < k only when
    * the merged sketch has fewer than k hashes (small sets ⇒ exact).
    * All joins are equi-joins on the key; every frame after the
    * sketch is O(|keys|²·k).
    */
  def pairJaccard(sk: DataFrame, keyCol: String, hashCol: String,
      k: Int): DataFrame = {
    val keys = sk.select(col(keyCol)).distinct()
    val pairs = keys.as("ka").join(keys.as("kb"),
        col(s"ka.$keyCol") < col(s"kb.$keyCol"))
      .select(col(s"ka.$keyCol").as("key_a"), col(s"kb.$keyCol").as("key_b"))
    val mA = pairs.join(sk, col(keyCol) === col("key_a"))
      .select(col("key_a"), col("key_b"), col(hashCol).as("h"),
        lit(1).as("ina"), lit(0).as("inb"))
    val mB = pairs.join(sk, col(keyCol) === col("key_b"))
      .select(col("key_a"), col("key_b"), col(hashCol).as("h"),
        lit(0).as("ina"), lit(1).as("inb"))
    val merged = mA.unionByName(mB)
      .groupBy(col("key_a"), col("key_b"), col("h"))
      .agg(max(col("ina")).as("ina"), max(col("inb")).as("inb"))
    val w = Window.partitionBy(col("key_a"), col("key_b"))
      .orderBy(col("h").asc)
    merged.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .groupBy(col("key_a"), col("key_b"))
      .agg(count(lit(1)).as("k_eff"),
        sum(when(col("ina") === 1 && col("inb") === 1, 1L)
          .otherwise(0L)).as("n_match"))
      .withColumn("jacc_est",
        col("n_match").cast("double") / col("k_eff").cast("double"))
  }
}
