package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles via window ranks — same semantics as
  * Spark's `percentile` / DuckDB's `quantile_cont`
  * (pos = p·(n−1), result = v_lo + frac·(v_hi − v_lo)) but computed
  * with ONE sort shuffle and O(1) memory per group.
  *
  * Spark's built-in exact `percentile` is an aggregate that buffers
  * every value of a group in memory — a giant skewed group at 100 TB
  * is an executor OOM. Here the values are sorted by the shuffle
  * (range-partitioned window), each row checks whether its rank is a
  * percentile boundary, and the aggregation only combines the ≤2
  * selected rows per percentile.
  */
object Percentiles {

  /** One row per group: `outNames(i)` = exact p(i)-percentile of
    * `valCol` (nulls excluded, like the built-ins). Single-column
    * convenience over [[groupedExactMulti]].
    */
  def groupedExact(df: DataFrame, groupCol: String, valCol: String,
      ps: Seq[Double], outNames: Seq[String]): DataFrame =
    groupedExactMulti(df, groupCol, Seq((valCol, ps, outNames)))

  /** Shape dispatcher: the window formulations ([[groupedExactMulti]],
    * [[winsorized]]) parallelize by GROUP COUNT — G groups means G
    * tasks sort everything, catastrophic when G ≪ cluster; the
    * rank-select formulations ([[groupedExactRankSelect]],
    * [[winsorizedRankSelect]]) range-partition by VALUE, so any task
    * count shares the sort, but their per-partition counting table and
    * driver interpolation scale with G — the window shape wins once the
    * group count alone saturates the cluster (measured crossover at
    * 10×, SCALE.md: 3 groups → rank-select 1.9× vs window 3.1-6.3×).
    *
    * Rank-select is chosen when the (approximate or hinted) group count
    * is at most a quarter of the shuffle partition count — below that
    * the window shape provably idles ≥ 3/4 of the cluster on its
    * biggest stage, above it group-hash parallelism is adequate and the
    * one-pass window shape is cheaper. The probe is one
    * approx_count_distinct aggregate over the group column only
    * (column-pruned scan); pass `groupCountHint` to skip it when the
    * caller already knows the cardinality (a catalog stat, a config).
    */
  private[operators] def chooseRankSelect(df: DataFrame, groupCol: String,
      groupCountHint: Long): Boolean = {
    val g = if (groupCountHint >= 0) groupCountHint
      else df.select(col(groupCol))
        .agg(approx_count_distinct(col(groupCol))).head().getLong(0)
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    g * 4 <= p
  }

  /** [[groupedExactMulti]] / [[groupedExactRankSelect]] behind the
    * measured dispatch rule (see [[chooseRankSelect]]): bit-identical
    * results either way (asserted in PercentilesSpec), shape chosen by
    * group cardinality vs shuffle partitions.
    *
    * NOTE: when `groupCountHint` is not supplied, dispatch runs an
    * EAGER approx_count_distinct Spark job at DataFrame-construction
    * time (not at action time), and near the g·4 = partitions
    * threshold the approximate count can flip the chosen PLAN between
    * runs (results stay bit-identical — only the shape changes).
    * Callers that know the cardinality, or that need a stable plan,
    * should pass `groupCountHint`.
    */
  def groupedExactAuto(df: DataFrame, groupCol: String,
      specs: Seq[(String, Seq[Double], Seq[String])],
      groupCountHint: Long = -1L): DataFrame =
    if (chooseRankSelect(df, groupCol, groupCountHint))
      groupedExactRankSelect(df, groupCol, specs)
    else groupedExactMulti(df, groupCol, specs)

  /** [[winsorized]] / [[winsorizedRankSelect]] behind the same
    * dispatch rule — the two shapes produce bit-identical clamp
    * decisions (PercentilesSpec), so only the plan changes. Same
    * eager-probe caveat as [[groupedExactAuto]]: omit
    * `groupCountHint` and construction runs one Spark job.
    */
  def winsorizedAuto(df: DataFrame, groupCol: String, valCol: String,
      pLo: Double, pHi: Double, outCol: String,
      groupCountHint: Long = -1L): DataFrame =
    if (chooseRankSelect(df, groupCol, groupCountHint))
      winsorizedRankSelect(df, groupCol, valCol, pLo, pHi, outCol)
    else winsorized(df, groupCol, valCol, pLo, pHi, outCol)

  /** Exact percentiles of SEVERAL value columns in ONE sort pass.
    * `specs` = (valueCol, percentiles, outputNames) per column. The
    * value columns are stacked into (column-tag, value) rows, ranked
    * by a single window partitioned on (group, tag) — one shuffle and
    * one sort regardless of how many columns/percentiles are asked —
    * then recombined by a final hash aggregation on the group key.
    * A column whose group has no non-null values yields null (the
    * SQL quantile-of-empty answer).
    */
  def groupedExactMulti(df: DataFrame, groupCol: String,
      specs: Seq[(String, Seq[Double], Seq[String])]): DataFrame = {
    require(specs.nonEmpty &&
      specs.forall { case (_, ps, ns) => ps.nonEmpty && ps.size == ns.size })
    val stacked = df
      .select(col(groupCol),
        explode(array(specs.map { case (vc, _, _) =>
          struct(lit(vc).as("__vc"), col(vc).cast("double").as("__v"))
        }: _*)).as("__s"))
      .select(col(groupCol), col("__s.__vc").as("__vc"), col("__s.__v").as("__v"))
      .filter(col("__v").isNotNull)
    val byGroupCol = Window.partitionBy(col(groupCol), col("__vc"))
    val ranked = stacked
      .withColumn("__rn", row_number().over(byGroupCol.orderBy(col("__v"))))
      .withColumn("__n", count(lit(1)).over(byGroupCol))
    val aggs = specs.flatMap { case (vc, ps, names) =>
      ps.zip(names).map { case (p, name) =>
        val inCol = col("__vc") === lit(vc)
        // 1-based boundary ranks for pos = 1 + p·(n−1)
        val pos = lit(1.0) + lit(p) * (col("__n") - lit(1)).cast("double")
        val lo = floor(pos)
        val hi = ceil(pos)
        val frac = pos - lo
        val vLo = sum(when(inCol && col("__rn") === lo, col("__v")).otherwise(lit(0.0)))
        val vHi = sum(when(inCol && col("__rn") === hi, col("__v")).otherwise(lit(0.0)))
        // v_lo + frac·(v_hi − v_lo); frac is constant within (group,
        // column), recover with max over the column's rows (null —
        // hence a null percentile — when the column has no rows).
        // lo==hi ⇒ frac=0 ⇒ exactly v_lo.
        (vLo + max(when(inCol, frac)) * (vHi - vLo)).as(name)
      }
    }
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Exact percentiles of ONE value column plus arbitrary extra
    * aggregates in the SAME pass: one scan, one sort shuffle, and a
    * final hash aggregation that reuses the window's hash partitioning
    * on `groupCol` (no second exchange for the non-distinct
    * aggregates). The input's other columns flow through the ranked
    * rows, so `extra` may aggregate any of them — this is how
    * profiling queries fuse sketches with exact percentiles instead of
    * scanning the table twice and joining.
    *
    * Null `valCol` rows still reach `extra` (so count(*)/countDistinct
    * see every row) but are excluded from ranking: they sort last, the
    * boundary ranks only cover the non-null prefix, and a group with
    * no non-null values yields null percentiles (the quantile-of-empty
    * answer), exactly like [[groupedExactMulti]].
    */
  def groupedExactWithAggs(df: DataFrame, groupCol: String, valCol: String,
      ps: Seq[Double], outNames: Seq[String],
      extra: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(ps.nonEmpty && ps.size == outNames.size)
    val byGroup = Window.partitionBy(col(groupCol))
    val ranked = df
      .withColumn("__v", col(valCol).cast("double"))
      .withColumn("__rn",
        row_number().over(byGroup.orderBy(col("__v").asc_nulls_last)))
      .withColumn("__n", count(col("__v")).over(byGroup))
    val pAggs = ps.zip(outNames).map { case (p, name) =>
      val pos = lit(1.0) + lit(p) * (col("__n") - lit(1)).cast("double")
      val lo = floor(pos)
      val hi = ceil(pos)
      val frac = pos - lo
      val vLo = sum(when(col("__rn") === lo, col("__v")).otherwise(lit(0.0)))
      val vHi = sum(when(col("__rn") === hi, col("__v")).otherwise(lit(0.0)))
      (vLo + max(when(col("__v").isNotNull, frac)) * (vHi - vLo)).as(name)
    }
    val aggs = pAggs ++ extra
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-row winsorization: clamp `valCol` into its group's
    * [pLo, pHi] EXACT interpolated percentile bounds — the outlier
    * treatment a feature pipeline applies before normalization. The
    * bounds are computed in the same window pass that would rank the
    * rows anyway (row_number + whole-partition boundary sums), so the
    * whole operator is ONE sort shuffle and O(1) memory per group —
    * no separate percentile job and no join back.
    *
    * Null values stay null (and are excluded from ranking, like the
    * other operators here). Output = input columns + `outCol` (the
    * clamped double).
    */
  def winsorized(df: DataFrame, groupCol: String, valCol: String,
      pLo: Double, pHi: Double, outCol: String): DataFrame = {
    require(pLo <= pHi)
    val byGroup = Window.partitionBy(col(groupCol))
    val ranked = df
      .withColumn("__v", col(valCol).cast("double"))
      .withColumn("__rn",
        row_number().over(byGroup.orderBy(col("__v").asc_nulls_last)))
      .withColumn("__n", count(col("__v")).over(byGroup))
    // pos = 1 + p·(n−1); the boundary sums touch one row each, the
    // rest contribute exact 0.0 — identical arithmetic to the DuckDB
    // oracle formulation, so clip decisions are bit-reproducible.
    def bound(p: Double) = {
      val pos = lit(1.0) + lit(p) * (col("__n") - lit(1)).cast("double")
      val lo = floor(pos)
      val hi = ceil(pos)
      val frac = pos - lo
      val vLo = sum(when(col("__rn") === lo, col("__v")).otherwise(lit(0.0)))
        .over(byGroup)
      val vHi = sum(when(col("__rn") === hi, col("__v")).otherwise(lit(0.0)))
        .over(byGroup)
      vLo + frac * (vHi - vLo)
    }
    ranked
      .withColumn(outCol,
        when(col("__v").isNull, lit(null).cast("double"))
          .otherwise(least(greatest(col("__v"), bound(pLo)), bound(pHi))))
      .drop("__v", "__rn", "__n")
  }

  /** [[winsorized]] with the bounds computed by DISTRIBUTED RANK
    * SELECTION instead of a per-group window — the low-group-
    * cardinality escape hatch, same duality as groupedExactMulti vs
    * groupedExactRankSelect (measured at 10×: the window shape scales
    * with per-group size, this shape with the cluster). Two passes
    * over the input (bounds, then clamp via a broadcast join of the
    * tiny per-group bounds table) instead of one sorted pass, but
    * every pass is fully parallel. Bit-identical clamp decisions: the
    * rank-select interpolation performs the same double arithmetic as
    * the window formulation (asserted in PercentilesSpec).
    */
  def winsorizedRankSelect(df: DataFrame, groupCol: String, valCol: String,
      pLo: Double, pHi: Double, outCol: String): DataFrame = {
    require(pLo <= pHi)
    val bounds = groupedExactRankSelect(df, groupCol,
      Seq((valCol, Seq(pLo, pHi), Seq("__blo", "__bhi"))))
      .withColumnRenamed(groupCol, "__g")
    val v = col(valCol).cast("double")
    // LEFT + null-safe: groups with only null values get no bounds
    // row, and a NULL group key must still find its bounds — an inner
    // EqualTo join would DROP those input rows, while the window shape
    // keeps them (outCol null). Unmatched rows can only carry null
    // values, so the clamp below never sees a non-null v without
    // bounds.
    df.join(broadcast(bounds), col(groupCol) <=> col("__g"), "left")
      .withColumn(outCol,
        when(v.isNull, lit(null).cast("double"))
          .otherwise(least(greatest(v, col("__blo")), col("__bhi"))))
      .drop("__g", "__blo", "__bhi")
  }

  /** Exact percentiles by DISTRIBUTED RANK SELECTION — same results as
    * [[groupedExactMulti]], but with parallelism INDEPENDENT of group
    * cardinality. The window formulations hash-partition by the group
    * key, so three groups means three tasks sort everything — at
    * 100 TB that is 33 TB per task. Here the rows are range-partitioned
    * and sorted by VALUE alone (sampling-based boundaries balance the
    * partitions no matter how values distribute), so any number of
    * tasks share the sort; group membership just rides along.
    *
    * Dataflow (the classic TeraSort-style selection):
    *   1. stack the value columns to (value → (group, colIdx)) pairs
    *      and `sortByKey` — ONE range shuffle, P partitions;
    *   2. count rows per (partition, group, col) — a streamed
    *      per-partition pass collecting a P×G×C table to the driver
    *      (G·C is small by contract: this operator targets LOW-
    *      cardinality groups, exactly where the window variant cannot
    *      parallelize; high-cardinality groups should keep using
    *      [[groupedExactMulti]], whose parallelism is the group count);
    *   3. from the counts, compute each percentile's global boundary
    *      ranks (pos = 1 + p·(n−1)) and broadcast, per partition, the
    *      LOCAL ranks it must surface;
    *   4. re-stream the sorted partitions (the sort's shuffle files
    *      are reused — RDD result stages skip the map side), emitting
    *      only the ≤ 2·|ps|·G·C boundary rows; interpolate on the
    *      driver.
    * Total cost: one full shuffle + two streamed passes over its
    * output, O(1) executor memory, and a boundary-row collect that is
    * KB-sized. Results are independent of P (asserted in the spec):
    * ranks are global, so partition boundaries cannot shift values.
    *
    * This is the one operator family where the RDD layer earns its
    * keep (per-partition streaming counters against a broadcast rank
    * plan); everything stays a single sorted shuffle that Catalyst
    * could not express without a per-group window.
    *
    * Measured at sf0.1 (q67 vs q38, warmed): task-second PARITY with
    * the window variant (~3 s both) at lower wall time (1.5 s vs
    * 2.0 s — 32 tasks share the sort the window shape serializes onto
    * 3). The Tungsten exchange is what makes it free: an earlier cut
    * that shuffled boxed Kryo tuples via rdd.sortByKey cost ~5x.
    * Prefer this shape whenever groups ≪ cores; the window variants
    * win when the group count alone saturates the cluster.
    */
  def groupedExactRankSelect(df: DataFrame, groupCol: String,
      specs: Seq[(String, Seq[Double], Seq[String])],
      numPartitions: Int = 0): DataFrame = {
    require(specs.nonEmpty &&
      specs.forall { case (_, ps, ns) => ps.nonEmpty && ps.size == ns.size })
    val spark = df.sparkSession
    val P = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val valCols = specs.map(_._1)
    val C = valCols.size

    def emptyResult() = {
      val schema = org.apache.spark.sql.types.StructType(
        df.schema(groupCol) +: specs.flatMap(_._3).map(n =>
          org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.DoubleType)))
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    }

    // dictionary-encode (group, colIdx) into one small Int so the hot
    // loops below are array increments on specialized primitive pairs,
    // not hash probes on boxed tuples (6x cheaper measured at sf0.1).
    // The dictionary build is a column-pruned map-side-combined
    // distinct — cheap by the low-cardinality contract.
    val groups: Array[Any] =
      df.select(col(groupCol)).distinct().collect().map(_.get(0))
    if (groups.isEmpty) return emptyResult()
    val K = groups.length * C

    // stack + encode inside codegen (explode over a struct array, key
    // from a G-deep null-safe when-chain), range-shuffle + sort in
    // TUNGSTEN (compressed UnsafeRow exchange, radix sort), and only
    // then cross into the RDD layer through the tuple encoder. Both
    // streamed passes below run jobs on this one RDD, so the shuffle
    // map output is computed once and reused — same files, no
    // re-sort. (A plain rdd.sortByKey shuffled boxed Kryo tuples and
    // cost ~2x this shape; df.rdd's generic Row boxing cost ~6x.)
    val gKey: org.apache.spark.sql.Column =
      groups.zipWithIndex.foldRight(lit(-1): org.apache.spark.sql.Column) {
        case ((g, i), e) => when(col(groupCol) <=> lit(g), lit(i)).otherwise(e)
      }
    val sorted = df
      .select(explode(array(valCols.zipWithIndex.map { case (c, i) =>
        struct(col(c).cast("double").as("v"), (gKey * C + i).as("k"))
      }: _*)).as("s"))
      .filter(col("s.v").isNotNull)
      .select(col("s.v").as("v"), col("s.k").as("k"))
      .repartitionByRange(P, col("v"))
      .sortWithinPartitions(col("v"))
      .as[(Double, Int)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaInt))
      .rdd

    // pass 1: per-partition occupancy per encoded key
    val byPidAsc: Array[(Int, Array[Long])] =
      sorted.mapPartitionsWithIndex { (pid, it) =>
        val cnt = new Array[Long](K)
        it.foreach(kv => cnt(kv._2) += 1L)
        Iterator.single(pid -> cnt)
      }.collect().sortBy(_._1)

    val totals = new Array[Long](K)
    byPidAsc.foreach { case (_, cnt) =>
      var k = 0
      while (k < K) { totals(k) += cnt(k); k += 1 }
    }
    if (totals.forall(_ == 0L)) return emptyResult()

    // global 1-based boundary ranks per key (pos = 1 + p·(n−1))
    val wanted: Array[Set[Long]] = Array.tabulate(K) { k =>
      if (totals(k) == 0L) Set.empty
      else specs(k % C)._2.flatMap { p =>
        val pos = 1.0 + p * (totals(k) - 1).toDouble
        Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
      }.toSet
    }

    // per-partition plan: starting offset per key + the LOCAL ranks
    // (global − offset) that partition must surface
    val running = new Array[Long](K)
    val plan: Map[Int, (Array[Long], Array[Set[Long]])] =
      byPidAsc.iterator.map { case (pid, cnt) =>
        val offs = running.clone()
        val needs = Array.tabulate(K) { k =>
          val need = wanted(k).collect {
            case r if r > offs(k) && r <= offs(k) + cnt(k) => r - offs(k)
          }
          running(k) += cnt(k)
          need
        }
        pid -> (offs, needs)
      }.filter(_._2._2.exists(_.nonEmpty)).toMap
    val bcPlan = spark.sparkContext.broadcast(plan)

    // pass 2: reuse the sort's shuffle output (result stage only — the
    // map side is skipped), surface boundary rows keyed by GLOBAL rank
    val globalPicked: Map[(Int, Long), Double] =
      sorted.mapPartitionsWithIndex { (pid, it) =>
        bcPlan.value.get(pid) match {
          case None => Iterator.empty
          case Some((offs, needs)) =>
            val cnt = new Array[Long](K)
            it.flatMap { case (v, k) =>
              if (needs(k).isEmpty) None
              else {
                cnt(k) += 1L
                if (needs(k).contains(cnt(k))) Some(((k, offs(k) + cnt(k)), v))
                else None
              }
            }
        }
      }.collect().toMap
    bcPlan.destroy()

    val rows = groups.zipWithIndex.toSeq
      .filter { case (_, gi) => (0 until C).exists(i => totals(gi * C + i) > 0) }
      .map { case (g, gi) =>
        val cells = specs.zipWithIndex.flatMap { case ((_, ps, _), i) =>
          val k = gi * C + i
          if (totals(k) == 0L) ps.map(_ => null)
          else ps.map { p =>
            val pos = 1.0 + p * (totals(k) - 1).toDouble
            val lo = math.floor(pos).toLong
            val hi = math.ceil(pos).toLong
            val vLo = globalPicked((k, lo))
            val vHi = globalPicked((k, hi))
            java.lang.Double.valueOf(vLo + (pos - lo) * (vHi - vLo))
          }
        }
        org.apache.spark.sql.Row.fromSeq(g +: cells)
      }
    val schema = org.apache.spark.sql.types.StructType(
      df.schema(groupCol) +: specs.flatMap(_._3).map(n =>
        org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.DoubleType)))
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](rows.asJava), schema)
  }
}
