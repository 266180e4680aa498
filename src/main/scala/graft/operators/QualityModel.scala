package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality scoring with the hashing trick — the
  * fasttext-shaped linear classifier every production curation
  * pipeline runs after the heuristic filters: each token hashes into
  * one of B weight buckets, the doc's score is the mean bucket weight,
  * and docs above the threshold are kept.
  *
  * The weight table here is a deterministic integer function of the
  * bucket index (a trained model would broadcast a real array — the
  * DATAFLOW is identical), and weights are integer MILLI-units so the
  * per-doc sum is exact long arithmetic: score = Σmᵢ / (1000·n). No
  * float accumulation order anywhere — the score, and therefore the
  * keep/drop decision, is bit-identical on any engine or partitioning.
  *
  * Scale (100 TB): scoring is a NARROW map — the native shingle-hash
  * expression tokenizes and hashes each doc in one compiled pass, the
  * bucket→weight map is closed-form arithmetic inside the same
  * projection (a trained model would be one broadcast array lookup),
  * and no shuffle happens until whatever aggregation the caller adds.
  * This is the cheapest possible shape for a full-corpus pass: one
  * scan, zero exchanges, output rows = input rows.
  */
object QualityModel {

  /** Weight buckets. Power of two so `hash % B` spreads the rolling
    * hash's low bits evenly.
    */
  val Buckets = 4096L
  private val WMul = 2654435761L
  private val WAdd = 98765L

  /** Milli-weight of bucket j: ((j·WMul + WAdd) mod 2001) − 1000,
    * i.e. an integer in [−1000, 1000] ≈ a weight in [−1.0, 1.0].
    */
  private def milliWeight(bucket: Column): Column =
    (bucket * lit(WMul) + lit(WAdd)) % lit(2001L) - lit(1000L)

  /** SQL twin of the scoring arithmetic (DuckDB), over a token-hash
    * list expression.
    */
  def sumMilliSql(hashListSql: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       | list_transform($hashListSql,
       |   h2 -> (h2 % $Buckets) * $WMul + $WAdd)),
       | (a, b) -> a + (b % 2001) - 1000)""".stripMargin

  /** Score every doc: (id, n_tokens, sum_milli, logit, keep) ordered
    * by id. logit = sum_milli / (1000·n_tokens) (null when the doc
    * has no tokens), keep = 1 when logit clears `threshold`.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.0): DataFrame = {
    import graft.queries.Portable.pround
    val hs = graft.functions.TextFns.shingleHashes(col(textCol), 1)
    docs
      .select(col(idCol), hs.as("__hs"))
      .select(col(idCol),
        size(col("__hs")).cast("long").as("n_tokens"),
        aggregate(col("__hs"), lit(0L),
          (acc, h) => acc + milliWeight(h % lit(Buckets))).as("sum_milli"))
      .select(col(idCol), col("n_tokens"), col("sum_milli"),
        when(col("n_tokens") > 0,
          pround(col("sum_milli").cast("double")
            / (col("n_tokens") * lit(1000L)), 6)).as("logit"))
      .withColumn("keep",
        when(col("logit") > threshold, lit(1)).otherwise(lit(0)))
      .orderBy(col(idCol))
  }
}
