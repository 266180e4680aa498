package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperLogLog cardinality sketch (Flajolet et al. 2007) with FIXED
  * integer hashing — the register-based distinct counter next to the
  * engine's order-statistic one ([[Kmv]]): KMV keeps k hash values
  * (k·8 bytes, also buys Jaccard overlap), HLL keeps m = 256 6-bit-ish
  * registers (~256 bytes) and wins on space at pure-cardinality jobs;
  * both are one-pass, mergeable, and here bit-reproducible.
  *
  * Determinism: the wide hash is [[Sampling.slotWide]] (~2^39.9
  * range, pure BIGINT arithmetic); bucket = h mod 256; rho = trailing
  * zeros of w = h div 256 plus 1, computed EXACTLY as
  * bit_count((w & −w) − 1) + 1 (both engines' bit_count is
  * two's-complement, so w = 0 → bit_count(−1) = 64 → capped), capped
  * at 31 so the register sum below stays exact integer.
  *
  * The harmonic-mean denominator Σ 2^(−M_j) is accumulated as the
  * INTEGER Σ 2^(31 − M_j) (max 256·2^31 = 2^39 — no overflow, no
  * float summation order): absent registers contribute 2^31 exactly.
  * The only doubles are the final α·m²·2^31 / S division and the
  * small-range linear-counting branch m·ln(m/V) (ln = graft_lndet,
  * the deterministic series both engines replay op for op).
  *
  * Shape at scale: registers are a map-side-combined max per
  * (key, bucket) — at most 256 rows per key leave each partition
  * regardless of input size; the estimate is one tiny agg over them.
  */
object Hll {

  val M = 256
  private val LOG2_M = java.lang.Integer.numberOfTrailingZeros(M)
  val RHO_CAP = 31
  val ALPHA: Double = 0.7213 / (1.0 + 1.079 / 256.0)
  /** α·m²·2^31 — the numerator of the raw estimate, one shared
    * literal so both engines divide the identical double.
    */
  val NUM: Double = ALPHA * 256.0 * 256.0 * 2147483648.0
  /** Linear-counting threshold 2.5·m. */
  val LC_THRESHOLD = 640.0

  /** Per-(key, bucket) max-rho registers: ≤ m rows per key. `hashCol`
    * must be non-negative (slotWide-domain).
    */
  def registers(df: DataFrame, keyCol: String, hashCol: String): DataFrame = {
    // Column ops, not an expr() splice, so hashCol may be any column
    // name (backtick-needing ones included). hashCol is non-negative
    // (slotWide-domain), so h >>> log2(M) == h div M exactly.
    val w = shiftrightunsigned(col(hashCol), LOG2_M)
    val rho = least(
      bit_count(w.bitwiseAND(lit(0L) - w) - lit(1L)).cast("int") + lit(1),
      lit(RHO_CAP))
    df.select(col(keyCol),
        (col(hashCol) % lit(M.toLong)).as("bucket"),
        rho.as("rho"))
      .groupBy(col(keyCol), col("bucket"))
      .agg(max(col("rho")).as("r"))
  }

  /** Estimate per key from a [[registers]] frame: (key, m_present,
    * v_zero, s_scaled, est). est applies the standard small-range
    * correction: linear counting m·ln(m/V) when E_raw ≤ 2.5m and
    * zero registers exist.
    */
  def estimate(regs: DataFrame, keyCol: String): DataFrame =
    estimateKeys(regs, Seq(keyCol))

  /** [[estimate]] with a composite key (e.g. a source PAIR whose
    * registers were max-merged for a union estimate).
    */
  def estimateKeys(regs: DataFrame, keyCols: Seq[String]): DataFrame = {
    val agg = regs.groupBy(keyCols.map(col): _*)
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${RHO_CAP} - r AS INT))"))
          .as("s_present"),
        count(lit(1)).as("m_present"))
      .withColumn("v_zero", lit(M.toLong) - col("m_present"))
      .withColumn("s_scaled",
        col("s_present") + col("v_zero") * lit(2147483648L))
    val eRaw = lit(NUM) / col("s_scaled").cast("double")
    val lc = lit(M.toDouble) * call_function("graft_lndet",
      lit(M.toDouble) / greatest(col("v_zero"), lit(1L)).cast("double"))
    agg.select(keyCols.map(col) ++ Seq(col("m_present"), col("v_zero"),
      col("s_scaled"),
      when(eRaw <= lit(LC_THRESHOLD) && col("v_zero") > 0, lc)
        .otherwise(eRaw).as("est")): _*)
  }
}
