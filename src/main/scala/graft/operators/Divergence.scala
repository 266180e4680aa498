package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution-drift diagnostics between corpus slices — the
  * data-mixture health check a training pipeline runs per source /
  * snapshot / crawl: how far apart are two slices' token
  * distributions?
  *
  * The distance is TOTAL VARIATION, not KL/JS: TV has a closed form
  * over the SHARED vocabulary only —
  *   TV(p,q) = 1 − Σ_t min(p_t, q_t)
  *           = 1 − Σ_{t∈both} min(c1_t·n2, c2_t·n1) / (n1·n2)
  * so tokens unique to either side never need materializing (their
  * mass is picked up by the 1−…), there is no log (libm ulp
  * divergence between engines), and every intermediate is an exact
  * integer/decimal — the final division is the only float op, making
  * the result bit-portable to the oracle.
  *
  * Scale (100 TB): one token-keyed count aggregation (map-side combine
  * eats the explosion), one token-keyed self-join of the per-source
  * count table (rows = |vocab|·sources, NOT corpus tokens), per-source
  * totals broadcast. The pair space is |sources|² — sources are
  * slices (tens to thousands), never documents. Counts multiply as
  * DECIMAL(38,0): c·n overflows int64 once both pass ~3e9 tokens,
  * which a 100 TB slice does.
  */
object Divergence {

  /** Pairwise TV distance between per-source whitespace-token
    * distributions. Output: (src1, src2, n1, n2, n_common, tv) for
    * src1 < src2, ordered.
    */
  def tokenTV(docs: DataFrame, srcCol: String, textCol: String): DataFrame = {
    import graft.queries.Portable.pround
    val counts = docs
      .select(col(srcCol).as("src"),
        explode(graft.functions.TextFns.tokens(col(textCol))).as("token"))
      .groupBy(col("src"), col("token")).agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("src"))
      .agg(sum(col("c")).cast("long").as("n"))
    val a = counts.select(col("src").as("src1"), col("token"),
      col("c").as("c1"))
    val b = counts.select(col("src").as("src2"), col("token"),
      col("c").as("c2"))
    a.join(b, a("token") === b("token") && col("src1") < col("src2"))
      .join(broadcast(totals.select(col("src").as("src1"),
        col("n").as("n1"))), Seq("src1"))
      .join(broadcast(totals.select(col("src").as("src2"),
        col("n").as("n2"))), Seq("src2"))
      .groupBy(col("src1"), col("src2"), col("n1"), col("n2"))
      .agg(count(lit(1)).as("n_common"),
        sum(least(col("c1").cast(DecimalType(38, 0)) * col("n2"),
          col("c2").cast(DecimalType(38, 0)) * col("n1"))).as("__s"))
      .select(col("src1"), col("src2"), col("n1"), col("n2"),
        col("n_common"),
        pround(lit(1.0) - col("__s").cast("double")
          / (col("n1").cast("double") * col("n2").cast("double")), 6)
          .as("tv"))
      .orderBy(col("src1"), col("src2"))
  }
}
