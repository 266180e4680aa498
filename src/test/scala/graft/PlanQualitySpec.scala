package graft

/** Plan-shape regression net: pins the physical-plan properties the
  * engine's scale story depends on, so a future refactor that silently
  * turns a broadcast join into a sort-merge join (or re-introduces
  * q40's double scan / countDistinct Expand) fails a spec instead of a
  * benchmark review. Runs at sf0.001; each query is collected first so
  * AQE finalizes the plan (same technique as graft.Explain).
  */
class PlanQualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    // AQE's toString appends "== Initial Plan ==" after the final
    // plan — keep only the final section or every node double-counts
    df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==").head
  }

  private def count(plan: String, needle: String): Int =
    needle.r.findAllIn(plan).size

  test("star joins broadcast — never sort-merge") {
    for (q <- Seq("q04_star_broadcast", "q05_region_year_revenue",
        "q66_pipeline_mart")) {
      val p = planOf(q)
      assert(count(p, "SortMergeJoin") === 0, s"$q grew a SortMergeJoin")
      assert(count(p, "BroadcastHashJoin") >= 2, s"$q lost its broadcasts")
    }
  }

  test("q40 profiling stays one scan, no countDistinct Expand") {
    val p = planOf("q40_approx_sketches")
    assert(count(p, "Scan parquet") === 1,
      "q40 must read lineitem exactly once")
    assert(count(p, "Expand") === 0,
      "q40 must not mix distinct + sketch aggregates (Expand)")
  }

  test("q30 summary stats is ONE aggregation pass, not one per column") {
    val p = planOf("q30_summary_stats")
    assert(count(p, "Scan parquet") === 1,
      "q30 must read lineitem exactly once (union-per-column embeds " +
        "the aggregate subtree once per branch)")
  }

  test("pair generation joins on inverted-index keys — never all-pairs") {
    for (q <- Seq("q22_jaccard_pairs", "q24_minhash_lsh_pairs")) {
      val p = planOf(q)
      assert(count(p, "CartesianProduct") === 0, s"$q went quadratic")
      assert(count(p, "BroadcastNestedLoopJoin") === 0, s"$q went quadratic")
    }
  }

  test("scan-side pushdown reaches the parquet reader") {
    val p = planOf("q11_filter_complex")
    assert("PushedFilters: \\[[^\\]]".r.findAllIn(p)
      .exists(!_.endsWith("[]")), "q11 lost its pushed filters")
  }

  test("top-N-per-group prunes before the shuffle (WindowGroupLimit)") {
    val p = planOf("q10_topn_per_group")
    assert(count(p, "WindowGroupLimit") >= 1,
      "q10 lost the partial top-k before the window shuffle")
  }
}
