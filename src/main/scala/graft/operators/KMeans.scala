package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic distributed Lloyd k-means over an embedding column —
  * the clustering primitive the similarity stack was missing: IVF
  * (Similarity.ivfTopK) and SemDeDup consume centroids; this operator
  * TRAINS them as a first-class, oracle-verifiable step instead of the
  * one-shot seeded pick those operators use internally.
  *
  * Determinism (the property that makes a DuckDB oracle possible for
  * an iterative algorithm):
  *   - init: the k vectors whose ids order first by the integer hash
  *     (id·2654435761) mod 1e9+7 (ties by id) are the seed centroids,
  *     cluster index = position in that order. No RNG.
  *   - assignment: squared L2 distance is accumulated in EXACT
  *     DECIMAL(38,8) — each per-dim (a−b)² double is cast to
  *     DECIMAL(28,8) and decimal-summed, so the fold order can never
  *     change the value and the argmin (ties → lowest cluster id) is
  *     identical on any engine / any partitioning.
  *   - update: per-dim means from exact decimal sums (the q49 shape),
  *     rounded to 6 decimals (pround) before they feed the next
  *     assignment, so the centroid state is a portable decimal value,
  *     not an accumulation-order-dependent double.
  *   - empty clusters keep their previous centroid (driver-side
  *     carry), so k never silently shrinks mid-run.
  *
  * Scale (100 TB): per iteration, assignment is a NARROW map over the
  * corpus against k·d broadcast centroid literals (k·d doubles — KBs
  * even at k=4096, d=1024); the update is one posexplode →
  * groupBy(cluster, pos) hash aggregation whose shuffle carries only
  * k·d partially-combined rows per task (map-side combine collapses
  * the n·d explosion). Driver state is k·d doubles per iteration —
  * the same broadcast-centroids discipline as IVF. Nothing is
  * quadratic; iterations are a fixed driver loop.
  *
  * Reference scope: the reference has no ML operators — this is an
  * engine addition from the training-pipeline mandate (centroid
  * training for IVF ANN / SemDeDup / data-mixture clustering).
  */
object KMeans {

  /** Multiplier for the deterministic id-hash seed order (Knuth's
    * 2654435761, the same constant the LSH planes use).
    */
  private val SeedMul = 2654435761L
  private val SeedMod = 1000000007L

  /** Exact decimal squared-L2 between a vector column and a constant
    * centroid: Σ DECIMAL(28,8)((aᵢ−cᵢ)²), decimal-summed (order-free).
    * Native kernel (expressions.Dist2Decimal) — bit-identical to the
    * aggregate∘zip_with chain it replaces, one primitive loop per row
    * instead of interpreted per-element lambdas + Decimal allocations.
    */
  private def dist2(vec: Column, centroid: Array[Double]): Column = {
    val carr = array(centroid.map(lit(_)): _*)
    call_function("graft_dist2q8", vec, carr)
  }

  /** All k exact-decimal distances for a row's vector, as one array
    * column; the argmin is array_position(d, array_min(d)) − 1 —
    * decimal equality is exact, and first-position tie-break = lowest
    * cluster id.
    */
  private[graft] def distArray(vec: Column,
      cents: Array[Array[Double]]): Column =
    array(cents.map(c => dist2(vec, c)): _*)

  /** Run `iters` Lloyd iterations; returns the per-cluster per-dim
    * stats of the FINAL assignment: (cluster, pos, n_vecs, mean_v)
    * for pos < outDims, ordered — n_vecs is the cluster size, mean_v
    * the 6-decimal-rounded exact-decimal mean. Rows with a null
    * vector are excluded up front (they could never be assigned).
    */
  /** Seed centroids: the first k non-null vectors in deterministic
    * hash-of-id order. The id is reduced mod P BEFORE the multiply:
    * (P-1)·SeedMul fits int64, a raw id·SeedMul does not once ids
    * pass ~3.4e9 — Spark would wrap silently where DuckDB (and common
    * sense) overflow.
    */
  private def seedArrays(src: DataFrame, idCol: String,
      vecCol: String, k: Int): Array[Array[Double]] = {
    val cents = src
      .select(col(idCol).cast("long").as("__id"), col(vecCol).as("__v"))
      .withColumn("__h",
        ((col("__id") % lit(SeedMod)) * lit(SeedMul)) % lit(SeedMod))
      .orderBy(col("__h"), col("__id"))
      .limit(k)
      .select(col("__v").cast("array<double>"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(cents.length == k,
      s"need at least k=$k non-null vectors, found ${cents.length}")
    cents
  }

  /** One assignment pass under `cents`: per-(cluster, dim) counts and
    * 6-decimal exact-decimal means of the assigned vectors.
    */
  private def assignStats(src: DataFrame, vecCol: String,
      cents: Array[Array[Double]]): DataFrame = {
    import graft.queries.Portable.pround
    src
      .select(col(vecCol), distArray(col(vecCol), cents).as("__d"))
      .select(
        (array_position(col("__d"), array_min(col("__d"))) - lit(1L))
          .cast("int").as("cluster"),
        posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col("cluster"), col("pos"))
      .agg(count(lit(1)).as("n_vecs"),
        pround(sum(col("v").cast("double").cast(DecimalType(28, 8)))
          .cast("double") / count(lit(1)), 6).as("mean_v"))
  }

  /** Fold `updates` assignment-and-mean rounds into the centroid
    * arrays (empty clusters carry their previous value forward).
    */
  private def updatedCents(src: DataFrame, idCol: String, vecCol: String,
      k: Int, updates: Int): Array[Array[Double]] = {
    var cents = seedArrays(src, idCol, vecCol, k)
    // k decimal-fold distance scores per row run serial on a
    // single-split scan (the q159 lesson); fanOut is a guarded no-op
    // on real multi-file data, and the (cluster, pos) agg is
    // partition-invariant, so the trained model is bit-identical
    val fanned = graft.core.Scan.fanOut(src)
    for (_ <- 1 to updates) {
      val next = Array.tabulate(k)(j => cents(j).clone())
      assignStats(fanned, vecCol, cents)
        .select(col("cluster"), col("pos"), col("mean_v")).collect()
        .foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      cents = next
    }
    cents
  }

  /** One assignment pass under trained centroid arrays, per ROW:
    * (id, cluster, d2c). The cluster is the exact-decimal argmin (the
    * training rule — ties to the lowest cluster id); d2c is the
    * squared L2 to the assigned centroid as a SEQUENTIAL-FOLD DOUBLE
    * (`aggregate` ≡ `list_reduce` — the dot-product bit-parity
    * discipline), NOT the decimal: Spark's double→decimal cast rounds
    * the shortest decimal repr where DuckDB rounds the binary value,
    * so the 8th decimal of the decimal sum is not engine-portable,
    * while the fold double is bit-identical — which is what
    * SemDeDup's survivor rank orders on. Narrow map against the k·d
    * broadcast centroid literal — zero shuffles.
    */
  def assign(vecs: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]]): DataFrame = {
    val cLit = array(cents.map(c => array(c.map(lit(_)): _*)): _*)
    graft.core.Scan.fanOut(vecs.filter(col(vecCol).isNotNull))
      .select(col(idCol), col(vecCol),
        distArray(col(vecCol), cents).as("__d"))
      .select(col(idCol), col(vecCol),
        (array_position(col("__d"), array_min(col("__d"))) - lit(1L))
          .cast("int").as("cluster"))
      .select(col(idCol), col("cluster"),
        call_function("graft_dist2",
          col(vecCol), element_at(cLit, col("cluster") + 1)).as("d2c"))
  }

  def fit(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, outDims: Int = 8): DataFrame = {
    require(k >= 1 && iters >= 1 && outDims >= 1)
    val src = vecs.filter(col(vecCol).isNotNull)
    val cents = updatedCents(src, idCol, vecCol, k, iters - 1)
    assignStats(graft.core.Scan.fanOut(src), vecCol, cents)
      .filter(col("pos") < outDims)
      .orderBy(col("cluster"), col("pos"))
  }

  /** The trained MODEL itself: centroid arrays after `iters` full
    * assignment-and-mean rounds (each mean 6-decimal rounded — the
    * cross-engine state discipline [[fit]] documents), empty clusters
    * carrying their previous value. Driver-side k·dims doubles, the
    * same bounded model read as fit's per-iteration collect. This is
    * what PQ codebook TRAINING consumes
    * ([[Similarity.pqCodebooksKMeans]]) — fit's stats view is the
    * audit mart, this is the artifact.
    */
  def fitCentroidArrays(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): Array[Array[Double]] = {
    // iters = 0 is allowed and returns the raw seeds — the untrained
    // baseline q159's ladder compares Lloyd training against
    require(k >= 1 && iters >= 0)
    updatedCents(vecs.filter(col(vecCol).isNotNull), idCol, vecCol, k,
      iters)
  }

  /** All m PQ-subspace codebooks trained in ONE dataflow per Lloyd
    * round — bit-identical to calling [[fitCentroidArrays]] on each
    * subspace slice independently (the seed ids are shared across
    * subspaces because the hash order depends only on ids; the
    * decimal argmin and 6-decimal means are per-subspace either way),
    * but the JOB count drops from m·(1 + iters) sequential driver
    * round-trips to 1 + iters: each round explodes (vector, sub),
    * scores against the m·k-row BROADCAST centroid table, and
    * hash-aggs per (sub, cluster, dim) — one corpus pass for all
    * subspaces. That is the 100 TB shape: driver round-trips, not
    * per-row work, are what serial per-subspace training multiplies.
    * (The centroids ride as a broadcast TABLE, not a literal tree:
    * an m·k·subLen literal nest inlined k ways compiled a ~10⁵-node
    * plan per round — at m=16/k=32 the driver spent ~5 s/round in
    * analysis+codegen while tasks were idle. Same decimal program
    * per candidate, so results are bit-identical; ties still break
    * to the lowest codeword id via the (−d², −j) struct argmax.)
    *
    * @return centroids indexed [sub][codeword][dim-within-subspace]
    */
  def fitSubspaceCentroidArrays(vecs: DataFrame, idCol: String,
      vecCol: String, m: Int, k: Int, iters: Int)
      : Array[Array[Array[Double]]] = {
    import graft.queries.Portable.pround
    require(m >= 1 && k >= 1 && iters >= 0)
    val src = vecs.filter(col(vecCol).isNotNull)
    val dims = src.select(size(col(vecCol))).head.getInt(0)
    require(dims % m == 0, s"dims $dims must divide into m=$m subspaces")
    val subLen = dims / m
    val seedVecs = src
      .select(col(idCol).cast("long").as("__id"), col(vecCol).as("__v"))
      .withColumn("__h",
        ((col("__id") % lit(SeedMod)) * lit(SeedMul)) % lit(SeedMod))
      .orderBy(col("__h"), col("__id"))
      .limit(k)
      .select(col("__v").cast("array<double>"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(seedVecs.length == k,
      s"need at least k=$k non-null vectors, found ${seedVecs.length}")
    var cents: Array[Array[Array[Double]]] = Array.tabulate(m, k)(
      (sub, j) => seedVecs(j).slice(sub * subLen, (sub + 1) * subLen))
    // each Lloyd row scores m·k decimal folds — heavy narrow work that
    // runs serial when the scan collapses to one split (q159 measured
    // 3.8 s/round single-task at sf0.1); restore splits first. No-op
    // on real multi-file datasets (Scan.fanOut's partition guard), and
    // the groupBy below is partition-invariant (exact decimal sums)
    val fanned = graft.core.Scan.fanOut(src)
    val spark = vecs.sparkSession
    import spark.implicits._
    for (_ <- 1 to iters) {
      val next = Array.tabulate(m, k)((sub, j) => cents(sub)(j).clone())
      // centroids as a broadcast TABLE (m·k rows), never a literal
      // nest: the plan stays O(1) in k, the assignment is the
      // pqEncode shape — explode (vector, sub), broadcast-join the
      // candidates, map-side-combined argmin per (vector, sub)
      val centDf = (for (sub <- 0 until m; j <- 0 until k)
        yield (sub, j, cents(sub)(j).toSeq)).toDF("sub", "__j", "__cv")
      val d2 = call_function("graft_dist2q8", col("__sv"), col("__cv"))
      val stats = fanned
        // per-ROW group key: monotonically_increasing_id, NOT idCol —
        // duplicate or null ids must not merge rows into one
        // assignment (the key's VALUE never reaches a result: each
        // row argmins alone, then sums are over the same row multiset
        // whatever the key labels, so determinism is untouched)
        .select(monotonically_increasing_id().as("__rid"),
          col(vecCol).as("__v"))
        .select(col("__rid"), col("__v"),
          explode(sequence(lit(0), lit(m - 1))).as("sub"))
        .select(col("__rid"), col("sub"),
          slice(col("__v"), col("sub") * lit(subLen) + lit(1),
            lit(subLen)).as("__sv"))
        .join(broadcast(centDf), Seq("sub"))
        .select(col("__rid"), col("sub"), col("__sv"), col("__j"),
          d2.as("__d2"))
        // argmax of (−d², −j) = the lowest-d² candidate, ties to the
        // lowest codeword id — exactly array_position(min) on the old
        // literal array; j is unique per group so the argmax is total
        .groupBy(col("__rid"), col("sub"))
        .agg(max_by(struct(col("__j"), col("__sv")),
          struct(negate(col("__d2")), -col("__j"))).as("__best"))
        .select(col("sub"), col("__best.__j").as("cluster"),
          posexplode(col("__best.__sv")).as(Seq("pos", "v")))
        .groupBy(col("sub"), col("cluster"), col("pos"))
        .agg(pround(sum(col("v").cast("double").cast(DecimalType(28, 8)))
          .cast("double") / count(lit(1)), 6).as("mean_v"))
        .collect()
      stats.foreach(r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3))
      cents = next
    }
    cents
  }
}
