package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling. Membership is a pure function of
  * the row's key — no RNG state — so samples are reproducible across
  * runs and engines, stable under repartitioning, and consistent
  * between tables sharing the key. That is the property a training
  * pipeline needs for train/eval splits: `sample(seed)` in Spark is
  * per-partition positional and changes when the input re-splits;
  * hash-of-key membership never does.
  *
  * Scale (100 TB): every operator here is a narrow per-row predicate
  * inside the scan — no shuffle, no sort, composes with parquet column
  * pruning like any filter.
  */
object Sampling {

  /** Congruential slot in [0, den): two independent congruential
    * hashes combined into a ~10^12-range value H, then H mod den.
    * Integer-only and expressible in any SQL dialect, with two
    * scale-safety properties the naive ((key+1)·A mod P) mod den
    * formulation lacks:
    *  - NO OVERFLOW for any BIGINT key: the key is reduced mod a
    *    2^31-scale prime BEFORE the multiply, so every intermediate
    *    stays < 2^63 (the naive form wraps negative — or errors in
    *    engines with checked arithmetic — from key ≈ 3.5e9);
    *  - the slot range covers den up to ~10^12, so per-stratum
    *    denominators the size of a real corpus still map uniformly
    *    (the naive form silently capped slots at 1000003, turning
    *    any larger stratum's budget filter into a tautology).
    */
  private val M1 = 2147483647L // 2^31 − 1, prime (key reducer 1)
  private val M2 = 2147483629L // prime (key reducer 2)
  private val A1 = 2654435761L // Knuth multiplier
  private val A2 = 2246822519L // xxhash prime
  private val P1 = 1000003L
  private val P2 = 999983L

  def slotWide(key: Column): Column = {
    val k = key.cast("long")
    val h1 = (((k % M1 + M1) % M1 + lit(1L)) * lit(A1)) % lit(P1)
    val h2 = (((k % M2 + M2) % M2 + lit(1L)) * lit(A2)) % lit(P2)
    h1 * lit(P2) + h2
  }
  def slotWideSql(x: String): String = {
    val k = s"CAST($x AS BIGINT)"
    s"""((($k % $M1 + $M1) % $M1 + 1) * $A1 % $P1) * $P2
       | + (($k % $M2 + $M2) % $M2 + 1) * $A2 % $P2""".stripMargin
  }

  def slot(key: Column, den: Int): Column = slotWide(key) % lit(den.toLong)
  def slotSql(x: String, den: Int): String = s"(${slotWideSql(x)}) % $den"

  /** Efraimidis–Spirakis weighted reservoir: EXACTLY k rows sampled
    * WITHOUT replacement with probability proportional to weight —
    * the fixed-count complement of [[weightedHashSample]]'s Bernoulli
    * rate. A-ES keys each row by u^(1/w) with u uniform; ranking by
    * the equivalent −ln(u)/w ascending keeps the same rows without
    * the pow. Here u is the [[slotWide]] hash (reproducible, engine-
    * portable) mapped to (0,1], and ln comes from the DETERMINISTIC
    * graft_lndet (ln(u) = −lnDet(1/u), 1/u ≥ 1 by construction) — so
    * selection is decided on bit-identical doubles in both engines,
    * not on libm luck. Zero/negative weights are excluded (their
    * inclusion probability is 0).
    *
    * Scale: the key is a narrow per-row expression; orderBy(k).limit
    * compiles to TakeOrderedAndProject — per-partition top-k, then a
    * k-row driver merge. No full sort, no shuffle of the corpus.
    */
  private val EsInvNum = (P1 * P2 + 1).toDouble // 999985999950, exact
  def esKey(key: Column, weight: Column): Column = {
    val inv = lit(EsInvNum) / (slotWide(key) + lit(1L)).cast("double")
    call_function("graft_lndet", inv) / weight
  }
  /** The inv = 1/u input for the oracle's lnDet CTE chain
    * ([[graft.queries.Portable.lnDetSqlCtes]]); the key is then
    * `lnp / w`.
    */
  def esInvSql(x: String): String =
    s"CAST($EsInvNum AS DOUBLE) / ((${slotWideSql(x)}) + 1)"

  def weightedReservoir(df: DataFrame, keyCol: String, weight: Column,
      k: Int): DataFrame = {
    require(k >= 1)
    df.filter(weight > lit(0.0))
      .withColumn("es_key", esKey(col(keyCol), weight))
      .orderBy(col("es_key").asc, col(keyCol).asc)
      .limit(k)
  }

  /** [[weightedReservoir]] per stratum: exactly k rows per stratum
    * (when the stratum has that many positive-weight rows), inclusion
    * ∝ weight within each. The window's rank filter is WindowGroupLimit-
    * pruned (each map partition keeps its local top-k before the
    * exchange — [[exactPerStratum]]'s shape), so the shuffle carries
    * O(P·k) rows per stratum.
    */
  def weightedReservoirPerStratum(df: DataFrame, keyCol: String,
      strataCol: String, weight: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1)
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("es_key").asc, col(keyCol).asc)
    df.filter(weight > lit(0.0))
      .withColumn("es_key", esKey(col(keyCol), weight))
      .withColumn("es_rank", row_number().over(w))
      .filter(col("es_rank") <= k)
  }

  /** Keep ~num/den of rows, decided by the key hash. */
  def hashSample(df: DataFrame, keyCol: String, num: Int, den: Int): DataFrame =
    df.filter(slot(col(keyCol), den) < num)

  /** [[slot]] with a per-row (data-dependent) denominator column. */
  def slotBy(key: Column, den: Column): Column = slotWide(key) % den
  def slotBySql(x: String, den: String): String =
    s"(${slotWideSql(x)}) % ($den)"

  /** Mixture sampling: resample strata toward TARGET PROPORTIONS — the
    * training-data mixing primitive ("webtext 30%, code 20%, …" over a
    * corpus whose natural proportions are different). Each stratum s
    * gets an integer row budget targetTotal·w(s)‰ (computed on the
    * driver — weights are config); membership within the stratum is
    * the key hash against the stratum's OWN cardinality, so exactly
    * the rows with the lowest hash slots survive. A stratum whose
    * budget exceeds its population keeps everything (capped by
    * `least` — upsampling/replication is a different operator).
    *
    * Scale: one count-aggregate over the strata (tiny result,
    * broadcast back), then a scan-time filter — no data shuffle at
    * all. Deterministic: same key ⇒ same verdict on any engine or
    * partitioning.
    *
    * Output keeps the input columns plus `stratum_n` (population) and
    * `target_n` (the effective budget).
    */
  def mixtureSample(df: DataFrame, keyCol: String, strataCol: String,
      targetTotal: Int, weightsPerMille: Map[String, Int],
      defaultPerMille: Int): DataFrame = {
    def budget(perMille: Int): Long = targetTotal.toLong * perMille / 1000
    val target = weightsPerMille.foldLeft(lit(budget(defaultPerMille)): Column) {
      case (acc, (stratum, w)) =>
        when(col(strataCol) === stratum, lit(budget(w))).otherwise(acc)
    }
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("stratum_n"))
      .withColumnRenamed(strataCol, "__stratum")
    // null-safe join: a NULL stratum is still a stratum — it gets the
    // default rate and its own population count. A plain EqualTo join
    // would silently DROP every null-stratum row (same reasoning as
    // winsorizedRankSelect's <=> bounds join).
    df.join(broadcast(counts), col(strataCol) <=> col("__stratum"))
      .drop("__stratum")
      .withColumn("target_n", least(target, col("stratum_n")))
      .filter(slotBy(col(keyCol), col("stratum_n")) < col("target_n"))
  }

  /** Per-stratum sampling rates (num out of den), with a default rate
    * for strata not listed. One CASE chain — still a scan-time filter.
    */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Int], defaultNum: Int, den: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultNum): Column) {
      case (acc, (stratum, num)) =>
        when(col(strataCol) === stratum, lit(num)).otherwise(acc)
    }
    df.filter(slot(col(keyCol), den) < rate)
  }

  /** Slot range of [[slotWide]]: [0, P1·P2). */
  val slotRange: Long = P1 * P2

  /** Per-row PROBABILITY-weighted sampling: keep each row with
    * probability `probCol` (clamped to [0,1]), decided by the key
    * hash — the quality-weighted subsample ("prefer high-quality
    * documents") a training pipeline draws. Deterministic like every
    * operator here: same key + same probability ⇒ same verdict on any
    * engine or partitioning; still a pure scan-time filter.
    */
  def weightedHashSample(df: DataFrame, keyCol: String,
      probCol: Column): DataFrame =
    df.filter(slotWide(col(keyCol)).cast("double") <
      least(lit(1.0), greatest(lit(0.0), probCol)) * lit(slotRange.toDouble))
  def weightedHashSampleSql(x: String, probSql: String): String =
    s"""CAST(${slotWideSql(x)} AS DOUBLE) <
       | LEAST(1.0, GREATEST(0.0, $probSql)) * ${slotRange.toDouble}""".stripMargin

  /** EXACTLY k rows per stratum (when the stratum has that many),
    * deterministically: rank the stratum's rows by (key hash, key) —
    * a reproducible pseudo-random order — and keep the first k. The
    * fixed-count complement of [[mixtureSample]]'s rate-based budgets
    * (hash-threshold membership only approximates the count; ranking
    * pins it). One window shuffle on the stratum; Spark's
    * WindowGroupLimit prunes each map partition to its local top-k
    * before the exchange, so the shuffle carries O(P·k) rows per
    * stratum, not the corpus.
    *
    * Determinism contract requires `keyCol` values to be UNIQUE within
    * each stratum: the order is (hash(key), key), so duplicate keys tie
    * completely and WHICH physical row survives the tie is partition-
    * order-dependent. With a non-unique key, pass a surrogate (e.g.
    * monotonically-increasing file/row position materialized at ingest)
    * or accept row-identity nondeterminism (the KEPT key multiset is
    * still deterministic).
    */
  def exactPerStratum(df: DataFrame, keyCol: String, strataCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("sample_rank",
        row_number().over(Window.partitionBy(col(strataCol))
          .orderBy(slotWide(col(keyCol)), col(keyCol))))
      .filter(col("sample_rank") <= k)
  }

  /** Disjoint deterministic split: rows with slot < evalPerMille are
    * "eval", the rest "train". The same key always lands on the same
    * side, on any engine, at any partitioning.
    */
  def trainEvalSplit(df: DataFrame, keyCol: String,
      evalPerMille: Int): DataFrame =
    df.withColumn("split",
      when(slot(col(keyCol), 1000) < evalPerMille, lit("eval"))
        .otherwise(lit("train")))
}
