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

  /** PERSONALIZED PageRank: the teleport mass returns to the SEED set
    * instead of spreading uniformly — rank becomes "proximity to the
    * topic" (topic-sensitive PageRank, Haveliwala 2002), the score
    * recsys and focused-crawl curation rank against. Same integer
    * exactness contract as [[run]]:
    *
    *   r₀(v)    = scale·[v ∈ S]
    *   rₜ₊₁(v) = [v ∈ S]·((scale·(den−num)) div den)
    *             + (num · Σ_{u→v} (rₜ(u) div outdeg(u))) div den
    *
    * Non-seed sinks still leak (dropped-dangling convention). `seeds`
    * is a 1-column frame of node ids; seed rows not present in the
    * edge set are ignored.
    */
  def personalized(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, iters: Int, scale: Long = 1000000L,
      num: Long = 85L, den: Long = 100L): DataFrame = {
    require(iters >= 0, "iters must be non-negative")
    require(scale % den == 0, s"scale=$scale must be divisible by den=$den")
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val sd = seeds.toDF("seed").select(col("seed").cast("long")).distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .join(sd, col("node") === col("seed"), "left")
      .select(col("node"), col("seed").isNotNull.as("is_seed"))
      .localCheckpoint(true)
    val eo = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")),
        "src")
      .localCheckpoint(true)
    val base = (scale / den) * (den - num)
    var ranks = nodes
      .select(col("node"), col("is_seed"),
        when(col("is_seed"), lit(scale)).otherwise(lit(0L)).as("r"))
      .localCheckpoint(true)
    for (_ <- 0 until iters) {
      val sums = eo.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
      ranks = nodes.join(sums, col("node") === col("dst"), "left")
        .select(col("node"), col("is_seed"),
          (when(col("is_seed"), lit(base)).otherwise(lit(0L)) +
            expr(s"($num * coalesce(cs, CAST(0 AS BIGINT))) div $den"))
            .as("r"))
        .localCheckpoint(true)
    }
    ranks.select(col("node"), col("is_seed"), col("r").as("rank_scaled"))
  }

  /** Synchronous label-propagation communities (Raghavan et al. 2007,
    * the determinized variant) over an UNDIRECTED edge list — the
    * community-detection member of the graph-analytics family (q43/q57
    * give exact components, q133 centrality, q145 local clustering;
    * LPA gives the coarser "which cluster of the co-visitation graph
    * is this item in" cut that recsys / topic-balance pipelines use).
    *
    * Semantics (pinned, oracle-checkable): every node starts labelled
    * with its own id; each round, EVERY node simultaneously adopts the
    * most frequent label among its NEIGHBOURS (its own current label
    * does not vote), ties broken by the smallest label. Synchronous
    * update + min-tie-break makes the result a pure function of
    * (edges, rounds) — no RNG, no visit order, bit-identical across
    * engines and partitionings. A fixed round count is the contract
    * (classic LPA's "run to convergence" can oscillate on bipartite
    * subgraphs under synchronous update; bounded rounds are also what
    * a production scheduler wants).
    *
    * Scale: per round ONE src-keyed join (node-sized label table onto
    * the mirrored edge table) + one (node, label)-keyed count + one
    * node-partitioned argmax window — shuffle volume O(edges), state
    * O(nodes), plan kept flat by per-round localCheckpoint (the
    * PageRank/CC loop discipline above).
    *
    * @param edges undirected edge list, one row per unordered pair
    *              (canonical s < d orientation, already deduplicated —
    *              the q145 projection's shape); self-loops are dropped
    * @param rounds fixed synchronous round count (unrolled by oracles)
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rounds >= 1, "rounds must be positive")
    val e = edges
      .select(col(srcCol).cast("long").as("s"),
        col(dstCol).cast("long").as("d"))
      .filter(col("s").isNotNull && col("d").isNotNull &&
        col("s") =!= col("d"))
    // mirror once: each undirected pair votes in both directions
    val eb = e.union(e.select(col("d").as("s"), col("s").as("d")))
      .localCheckpoint(true)
    var labels = eb.select(col("s").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    val argmax = Window.partitionBy(col("node"))
      .orderBy(col("c").desc, col("label").asc)
    for (_ <- 1 to rounds) {
      labels = eb.join(labels, eb("s") === labels("node"))
        .select(col("d").as("node"), col("label"))
        .groupBy(col("node"), col("label"))
        .agg(count(lit(1)).as("c"))
        .withColumn("__rn", row_number().over(argmax))
        .filter(col("__rn") === 1)
        .select(col("node"), col("label"))
        .localCheckpoint(true)
    }
    labels
  }

  /** k-CORE decomposition — the density-peeling member of the graph
    * family (connected components = reachability, PageRank =
    * centrality, triangles = local clustering, LPA = communities,
    * k-core = COHESION): iteratively drop every node whose degree in
    * the SURVIVING subgraph is < k; the fixpoint — the maximal
    * subgraph of minimum degree ≥ k — is unique and order-independent
    * (Seidman 1983), which is what makes it exactly oracle-able.
    * The standard "dense engaged core vs peripheral noise" cut for
    * co-visitation graphs and spam-farm detection.
    *
    * Runs a FIXED `rounds` peels (not a driver convergence probe), so
    * engine and oracle execute the same deterministic program whether
    * or not the fixpoint has been reached; peeling removes nodes
    * monotonically, so rounds beyond convergence are no-ops (pick
    * rounds with headroom — the spec pins fixpoint stability on the
    * real corpus). Output: surviving (node, deg) under the final
    * edge set.
    *
    * Scale: per round one degree aggregation + two semi-joins on the
    * shrinking edge set — O(edges) shuffle like the CC/LPA loops,
    * localCheckpointed per round. Undirected degrees come from the
    * both-orientations union; input edges must be canonical
    * (src < dst, deduplicated).
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    var e = edges.select(col(srcCol).as("s"), col(dstCol).as("d"))
      .localCheckpoint(true)
    def degrees(es: DataFrame): DataFrame =
      es.select(col("s").as("n"))
        .unionByName(es.select(col("d").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    for (_ <- 1 to rounds) {
      val keep = degrees(e).filter(col("deg") >= k).select(col("n"))
      e = e.join(keep.select(col("n").as("s")), Seq("s"))
        .join(keep.select(col("n").as("d")), Seq("d"))
        .select(col("s"), col("d"))
        .localCheckpoint(true)
    }
    degrees(e)
  }

  /** HITS hubs & authorities (Kleinberg 1999) — the OTHER classic
    * link-centrality next to [[run]]: PageRank scores a page by the
    * rank of who links TO it; HITS separates the two roles, scoring
    * hubs (good linkers) and authorities (good link targets) by
    * mutual reinforcement:
    *   a(v) ← Σ_{u→v} h(u),   h(u) ← Σ_{u→v} a(v)
    * On the curation side this is the directory-page vs content-page
    * split a crawl ranker wants where PageRank conflates the roles.
    *
    * Exactness: textbook HITS L2-normalizes each half-step — a sqrt
    * per iteration, so floats and libm. This implementation
    * normalizes by the MAXIMUM (L∞) instead: the power iteration
    * converges to the same principal-eigenvector direction, and every
    * step stays scaled-integer — sums, one max, one exact `div` —
    * bit-identical across engines/partitionings with zero rounding
    * discipline (the [[run]] contract; after each normalization the
    * top hub/authority sits exactly at `scale`).
    *
    * Overflow headroom: contributions ≤ indeg_max·scale and the
    * normalize step multiplies by scale — int64 holds through
    * indeg_max·scale² ≈ 9e18, i.e. indeg_max ~ 9e6 at the default
    * millionths scale; raise/lower `scale` to trade resolution.
    *
    * Scale shape: per iteration two edge joins + two node-keyed
    * map-side-combined sums + two 1-row max aggs broadcast back —
    * O(edges) shuffle, O(nodes) state, flat lineage via the
    * PageRank/CC localCheckpoint discipline.
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
      scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, "iters must be positive")
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    var hub = nodes.select(col("node"), lit(scale).as("r"))
      .localCheckpoint(true)
    var auth = hub
    def half(scores: DataFrame, inCol: String, outCol: String): DataFrame = {
      val sums = e.join(scores, col(inCol) === col("node"))
        .select(col(outCol).as("tn"), col("r"))
        .groupBy(col("tn")).agg(sum(col("r")).as("v"))
      val raw = nodes.join(sums, col("node") === col("tn"), "left")
        .select(col("node"), coalesce(col("v"), lit(0L)).as("v"))
      val mx = raw.agg(max(col("v")).as("mx"))
      raw.crossJoin(broadcast(mx))
        .select(col("node"), expr(s"(v * $scale) div mx").as("r"))
        .localCheckpoint(true)
    }
    for (_ <- 1 to iters) {
      auth = half(hub, "src", "dst")
      hub = half(auth, "dst", "src")
    }
    hub.select(col("node"), col("r").as("hub_scaled"))
      .join(auth.select(col("node"), col("r").as("auth_scaled")), "node")
  }
}
