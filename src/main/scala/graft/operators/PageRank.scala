package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an edge table — the crawl-graph centrality score used
  * to weight / prioritize web documents in corpus curation (the signal
  * Common-Crawl-derived datasets rank hosts by).
  *
  * Semantics (pinned, oracle-checkable): damped PageRank with the
  * DROPPED-DANGLING-MASS convention — a node with no out-edges simply
  * leaks its mass (no uniform redistribution). Ranks are SCALED
  * INTEGERS ("millionths" by default): every step is integer `div` /
  * multiply / sum, so iterations are exact, order-independent, and
  * bit-identical across engines and partitionings — no float drift,
  * no libm. Rank magnitudes are bounded by n·scale ≪ 2⁶³, and the
  * normalization constant cancels in any downstream ordering.
  *
  *   r₀(v)    = scale
  *   rₜ₊₁(v) = (scale·(den−num)) div den
  *             + (num · Σ_{u→v} (rₜ(u) div outdeg(u))) div den
  *
  * Scale notes (the textbook distributed-PageRank cost model):
  *  - edges are deduplicated and the (src, dst, outdeg) table is
  *    materialized ONCE (localCheckpoint) — the per-iteration work
  *    rereads it with flat lineage;
  *  - each iteration = one src-keyed join (node-sized ranks onto the
  *    edge table) + one dst-keyed map-side-combined sum — shuffle
  *    volume O(edges) contributions, state O(nodes);
  *  - iteration state localCheckpoints every round (same driver
  *    discipline as the CC loop, Dedup.scala:439) so the plan never
  *    deepens with iteration count.
  */
object PageRank {

  /** @param edges any DataFrame with integral `srcCol`/`dstCol`
    * @param iters  fixed iteration count (unrolled by the oracle)
    * @param scale  integer rank unit; must divide by den exactly
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
      scale: Long = 1000000L, num: Long = 85L, den: Long = 100L)
      : DataFrame = {
    require(iters >= 0, "iters must be non-negative")
    require(scale % den == 0, s"scale=$scale must be divisible by den=$den")
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val eo = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")),
        "src")
      .localCheckpoint(true) // (src, dst, outdeg): static across rounds
    val base = (scale / den) * (den - num)
    var ranks = nodes.select(col("node"), lit(scale).as("r"))
      .localCheckpoint(true)
    for (_ <- 0 until iters) {
      val sums = eo.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
      ranks = nodes.join(sums, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(base) +
            expr(s"($num * coalesce(cs, CAST(0 AS BIGINT))) div $den"))
            .as("r"))
        .localCheckpoint(true)
    }
    ranks.select(col("node"), col("r").as("rank_scaled"))
  }
}
