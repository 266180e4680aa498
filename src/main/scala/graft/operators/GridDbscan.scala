package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Density-based clustering (DBSCAN) with grid-cell candidate
  * generation — the noise-aware complement to k-means for embedding
  * curation: clusters of arbitrary shape emerge from local density,
  * and low-density points are labeled NOISE instead of being forced
  * into the nearest centroid.
  *
  * Semantics (deterministic variant of Ester et al. 1996):
  *  - neighbor: distance² ≤ eps² in the 2-D projection;
  *  - core: |N_eps(p)| ≥ minPts, self included;
  *  - cluster: connected component of the core-core neighbor graph,
  *    labeled by its smallest core id (large-star/small-star CC —
  *    O(log n) rounds at any diameter);
  *  - border: non-core within eps of ≥1 core — assigned the SMALLEST
  *    adjacent cluster label (classic DBSCAN leaves this arbitrary;
  *    min-label makes it order- and partition-independent);
  *  - noise: everything else.
  *
  * Shape at scale: candidate pairs come from a 3×3 grid-cell
  * EQUI-JOIN (cell width = eps, so all true neighbors are adjacent-
  * cell pairs) — never an all-pairs compare; cost is Σ per-cell
  * occupancy products, the shuffle is keyed on cells. Aggregations
  * collapse map-side, CC is bounded driver state. The quadratic
  * failure mode of naive DBSCAN is confined to single dense cells,
  * where occupancy caps (cf. Dedup.capBuckets) can be composed in.
  */
object GridDbscan {

  /** Directed near pairs (i, j), i ≠ j, dist² ≤ eps² — each ordered
    * pair appears exactly once: the probe side explodes to its 9
    * neighbor cells, the build side stays at its home cell, and a
    * point has one home cell. */
  def nearPairs(pts: DataFrame, eps: Double): DataFrame = {
    require(eps > 0)
    val cells = pts.select(col("id"), col("x"), col("y"),
      floor(col("x") / lit(eps)).cast("long").as("cx"),
      floor(col("y") / lit(eps)).cast("long").as("cy"))
    val offs = for { dx <- -1 to 1; dy <- -1 to 1 }
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))
    val probe = cells.withColumn("o", explode(array(offs: _*)))
      .select(col("id").as("i"), col("x").as("ax"), col("y").as("ay"),
        (col("cx") + col("o.dx")).as("jx"), (col("cy") + col("o.dy")).as("jy"))
    probe.join(cells,
        col("jx") === col("cx") && col("jy") === col("cy")
          && col("i") =!= col("id"))
      .filter((col("ax") - col("x")) * (col("ax") - col("x"))
        + (col("ay") - col("y")) * (col("ay") - col("y")) <= lit(eps * eps))
      .select(col("i"), col("id").as("j"))
  }

  /** Full labeling: (node, component, role ∈ {core, border}). Noise
    * points are absent — the caller reports them as the complement.
    */
  def label(pts: DataFrame, eps: Double, minPts: Int): DataFrame = {
    require(minPts >= 1)
    // near is read three times (counts, core edges, border attach):
    // materialize once, truncate lineage
    val near = nearPairs(pts, eps).localCheckpoint(true)
    val core = near.groupBy(col("i"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") + 1 >= minPts)
      .select(col("i").as("id"))
      .localCheckpoint(true)
    val coreEdges = near
      .join(core.withColumnRenamed("id", "i"), Seq("i"))
      .join(core.withColumnRenamed("id", "j"), Seq("j"))
      .filter(col("i") < col("j"))
      .select(col("i").as("d1"), col("j").as("d2"))
    val comp = Dedup.connectedComponentsStar(coreEdges)
    // isolated cores (no core neighbor) are singleton clusters
    val coreLab = core.join(comp, core("id") === comp("node"), "left")
      .select(core("id").as("node"),
        coalesce(col("component"), core("id")).as("component"))
      .localCheckpoint(true)
    val border = near
      .join(core.withColumnRenamed("id", "i"), Seq("i"), "left_anti")
      .join(coreLab.withColumnRenamed("node", "j"), Seq("j"))
      .groupBy(col("i").as("node"))
      .agg(min(col("component")).as("component"))
    coreLab.withColumn("role", lit("core"))
      .unionByName(border.withColumn("role", lit("border")))
  }
}
