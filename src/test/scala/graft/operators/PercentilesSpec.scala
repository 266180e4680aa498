package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Plan-shape and semantics coverage for the sort-based percentile
  * operator (the value-equivalence property vs Spark's builtin lives
  * in PropertySpec).
  */
class PercentilesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", 1.0, 10.0), ("a", 2.0, 20.0), ("a", 3.0, 30.0), ("a", 4.0, 40.0),
    ("b", 5.0, 50.0), ("b", 7.0, 70.0),
    ("c", 9.0, Double.NaN)
  ).toDF("g", "x", "y")
    .withColumn("y", when(col("g") === "c", lit(null)).otherwise(col("y")))

  test("groupedExactMulti: N value columns, ONE sort in the plan") {
    val out = Percentiles.groupedExactMulti(df, "g", Seq(
      ("x", Seq(0.5), Seq("x_med")),
      ("y", Seq(0.5, 1.0), Seq("y_med", "y_max"))))
    // AQE wraps the plan, so count Sort nodes in the printed tree
    // (same technique as BucketingSpec's no-Exchange assertion)
    val plan = out.queryExecution.executedPlan.toString()
    val sorts = "(?m)\\bSort \\[".r.findAllIn(plan).size
    assert(sorts === 1,
      s"expected one window sort for all value columns, got $sorts in:\n$plan")

    val rows = out.collect().map(r => r.getString(0) ->
      (r.getDouble(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(rows("a")._1 === 2.5) // interpolated median of 1..4
    assert(rows("a")._2 === Some(25.0))
    assert(rows("a")._3 === Some(40.0))
    assert(rows("b")._1 === 6.0)
    // group c has only nulls in y -> null percentile, x still computed
    assert(rows("c")._1 === 9.0)
    assert(rows("c")._2 === None && rows("c")._3 === None)
  }

  test("groupedExactWithAggs: sketches ride the percentile pass, no join") {
    val out = Percentiles.groupedExactWithAggs(df, "g", "y",
      Seq(0.5), Seq("y_med"),
      Seq(count(lit(1)).as("n"), countDistinct(col("x")).as("nd"),
        max(col("x")).as("x_max")))
    // the whole computation is one dataflow: no join, exactly one scan
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("Join"), s"fused pass must not join:\n$plan")
    assert("LocalTableScan|Scan".r.findAllIn(plan).size <= 1 ||
      !plan.contains("BroadcastExchange"))

    val rows = out.collect().map(r => r.getString(0) ->
      (Option(r.get(1)), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(rows("a")._1 === Some(25.0))
    assert(rows("a")._2 === 4L && rows("a")._3 === 4L && rows("a")._4 === 4.0)
    assert(rows("b")._1 === Some(60.0))
    // all-null value group: null percentile, but extras see every row
    assert(rows("c")._1 === None)
    assert(rows("c")._2 === 1L && rows("c")._4 === 9.0)
  }

  test("groupedExactRankSelect ≡ groupedExactMulti, independent of P") {
    val specs = Seq(
      ("x", Seq(0.0, 0.5, 0.9, 1.0), Seq("x0", "x50", "x90", "x100")),
      ("y", Seq(0.5), Seq("y50")))
    def canon(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => r.getString(0) ->
        (1 until r.length).map(i => Option(r.get(i)))).toMap
    val viaWindow = canon(Percentiles.groupedExactMulti(df, "g", specs))

    // larger deterministic corpus so ranks cross partition boundaries
    val big = spark.range(0, 997).selectExpr(
      "concat('g', id % 5) AS g",
      "CAST((id * 37) % 991 AS DOUBLE) AS x",
      "CASE WHEN id % 7 = 0 THEN NULL ELSE CAST((id * 13) % 83 AS DOUBLE) END AS y")
    val bigWindow = canon(Percentiles.groupedExactMulti(big, "g", specs))

    for (p <- Seq(1, 3, 17)) {
      assert(canon(Percentiles.groupedExactRankSelect(df, "g", specs, p))
        === viaWindow, s"small corpus, P=$p")
      assert(canon(Percentiles.groupedExactRankSelect(big, "g", specs, p))
        === bigWindow, s"big corpus, P=$p")
    }
    // the whole point: group cardinality (5) no longer caps parallelism
    // — any P gives identical results, so P can track the cluster
  }

  test("winsorized clamps into exact percentile bounds; nulls stay null") {
    val d = (Seq.tabulate(100)(i => ("a", (i + 1).toDouble)) ++
      Seq(("b", 10.0), ("b", 30.0), ("b", Double.NaN)))
      .toDF("g", "v")
      .withColumn("v", when(isnan(col("v")), lit(null)).otherwise(col("v")))
    val out = Percentiles.winsorized(d, "g", "v", 0.05, 0.95, "w")
    val a = out.filter(col("g") === "a").select("w").as[Double].collect()
    // bounds for 1..100: pos_lo = 1+0.05·99 = 5.95 → 5.95; pos_hi = 95.05
    assert(a.min === 5.95 && a.max === 95.05)
    assert(a.count(_ == 5.95) === 5) // values 1..5 clipped up
    assert(a.count(_ == 95.05) === 5) // values 96..100 clipped down
    val b = out.filter(col("g") === "b")
      .select("v", "w").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    // b bounds: lo = 10+0.05·20 = 11.0, hi = 10+0.95·20 = 29.0
    assert(b === Set(
      (Some(10.0), Some(11.0)), (Some(30.0), Some(29.0)), (None, None)))
  }

  test("winsorized ≡ groupedExactMulti bounds + manual clamp") {
    val d = (1 to 500).map(i =>
      (s"g${i % 3}", ((i * 2654435761L) % 1000003L).toDouble))
      .toDF("g", "v")
    // per-row compare: the bound arithmetic is the same expression in
    // both paths, so every clamped double must match bit-for-bit
    // (sums would differ in the last ulp from summation order)
    val got = Percentiles.winsorized(d, "g", "v", 0.1, 0.9, "w")
      .select("g", "v", "w")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val bounds = Percentiles.groupedExactMulti(d, "g",
        Seq(("v", Seq(0.1, 0.9), Seq("lo", "hi"))))
    val want = d.join(bounds, "g")
      .select(col("g"), col("v"),
        least(greatest(col("v"), col("lo")), col("hi")).as("w"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got === want)
  }

  test("winsorizedRankSelect ≡ winsorized, bit for bit") {
    // includes: a null value inside a populated group, a group whose
    // values are ALL null (gets no bounds row), and a NULL group key —
    // the window shape keeps all of them, so rank-select must too
    val d = ((1 to 400).map(i =>
      (s"g${i % 3}", Option(((i * 40503L) % 1000003L).toDouble))) ++
      Seq(("g0", None: Option[Double]),
        ("gnullonly", None: Option[Double]),
        (null.asInstanceOf[String], Option(7.0)),
        (null.asInstanceOf[String], Option(9.0))))
      .toDF("g", "v")
    def rows(df2: org.apache.spark.sql.DataFrame) =
      df2.select("g", "v", "w")
        .collect().map(r => (Option(r.getString(0)), Option(r.get(1)),
          Option(r.get(2))))
        .sortBy(t => (t._1.getOrElse(""), t._2.map(_.toString).getOrElse("")))
        .toSeq
    val a = rows(Percentiles.winsorized(d, "g", "v", 0.05, 0.95, "w"))
    val b = rows(Percentiles.winsorizedRankSelect(d, "g", "v", 0.05, 0.95, "w"))
    assert(a === b)
    assert(a.size === d.count()) // neither shape drops rows
  }

  test("auto dispatch picks each shape in its regime, results identical") {
    import org.apache.spark.sql.execution.window.WindowExec
    def usesWindow(out: org.apache.spark.sql.DataFrame): Boolean =
      out.queryExecution.sparkPlan.collect { case w: WindowExec => w }.nonEmpty
    val d = (1 to 400).map(i =>
      (s"g${i % 3}", ((i * 40503L) % 1000003L).toDouble)).toDF("g", "v")
    val specs = Seq(("v", Seq(0.1, 0.5, 0.9), Seq("p10", "p50", "p90")))
    val P = spark.sessionState.conf.numShufflePartitions

    // the unhinted probe (one approx_count_distinct job) must agree
    // with the rule evaluated on the true cardinality (3 groups)
    assert(Percentiles.chooseRankSelect(d, "g", groupCountHint = -1)
      === (3 * 4 <= P))

    // hinted low cardinality → rank-select regime (no Window node: the
    // result is a driver-interpolated local relation)
    assert(Percentiles.chooseRankSelect(d, "g", groupCountHint = 1L))
    val auto = Percentiles.groupedExactAuto(d, "g", specs,
      groupCountHint = 1L)
    assert(!usesWindow(auto), "low-cardinality dispatch must pick rank-select")

    // hinted high cardinality → window regime (Window node present)
    assert(!Percentiles.chooseRankSelect(d, "g", groupCountHint = P.toLong))
    val autoWin = Percentiles.groupedExactAuto(d, "g", specs,
      groupCountHint = P.toLong)
    assert(usesWindow(autoWin), "high-cardinality dispatch must pick window")

    // both shapes, bit-identical values (interpolation arithmetic shared)
    def canon(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => r.getString(0) ->
        (1 until r.length).map(i => Option(r.get(i)))).toMap
    assert(canon(auto) === canon(autoWin))

    // winsorizedAuto dispatches the same rule, same per-row results
    val wRank = Percentiles.winsorizedAuto(d, "g", "v", 0.05, 0.95, "w",
      groupCountHint = 1L)
    val wWin = Percentiles.winsorizedAuto(d, "g", "v", 0.05, 0.95, "w",
      groupCountHint = P.toLong)
    assert(!usesWindow(wRank) && usesWindow(wWin))
    def rows(df2: org.apache.spark.sql.DataFrame) =
      df2.select("g", "v", "w").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(rows(wRank) === rows(wWin))
  }

  test("single-column groupedExact delegates to the fused pass") {
    val out = Percentiles.groupedExact(df, "g", "x", Seq(0.0, 1.0),
      Seq("lo", "hi")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out("a") === ((1.0, 4.0)))
    assert(out("b") === ((5.0, 7.0)))
  }
}
