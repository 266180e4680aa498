package graft

/** Benchmark main (driver contract): run the headline queries against
  * SPARK_GRAFT_SF_DIR and print ONE JSON line with per-query seconds.
  *
  * Each query is forced through the `noop` sink — unlike count(),
  * which lets Catalyst prune projections, noop materializes every
  * output row, so timings reflect real work. One untimed warm-up of
  * the first query absorbs JVM/classloader startup.
  */
object Bench {
  /** Representative coverage of every operator family: scan-agg, star
    * joins, dim chains, window top-N, rollup/pivot/percentiles, text
    * analysis (native hash expressions), the full dedup suite incl.
    * survivor selection, similarity (exact pairs, brute + LSH top-k),
    * multimodal, profiling, and sketches. The exact quadratic
    * variants (q22/q25/q26) are included since the native expressions
    * made them cheap at sf0.1; at real scale their LSH counterparts
    * are the path.
    */
  private val headline = Seq(
    "q01_pricing_summary", "q02_conditional_agg", "q04_star_broadcast",
    "q05_region_year_revenue", "q07_full_outer_coalesce", "q09_top_parts",
    "q10_topn_per_group", "q14_date_funcs", "q17_token_stats",
    "q18_text_quality", "q20_fingerprint", "q21_exact_dedup",
    "q22_jaccard_pairs", "q23_minhash_sig", "q24_minhash_lsh_pairs",
    "q25_simhash_pairs", "q26_cosine_neardup", "q27_ann_topk",
    "q28_ann_lsh_buckets", "q29_binary_features", "q30_summary_stats",
    "q32_json_extract", "q33_ann_lsh_topk", "q34_rollup",
    "q36_semi_anti", "q38_percentiles", "q39_neardup_dedup",
    "q40_approx_sketches", "q41_asof_join", "q42_interval_pairs",
    "q43_dedup_clusters", "q44_window_suite", "q45_cube",
    "q46_sessions", "q47_vocab_topk", "q48_tfidf_topterms",
    "q49_label_centroids", "q50_edit_distance_pairs", "q51_histogram",
    "q52_ngram_positions", "q53_ann_ivf_topk", "q54_bigram_surprise",
    "q55_stratified_sample")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").toSeq).getOrElse(headline)
    val debug = sys.env.contains("SPARK_GRAFT_BENCH_DEBUG")
    val spark = graft.core.GraftSession.local(appName = "graft-bench")
    val queries = SparkEntry.queries

    // Debug accounting: executor task time vs wall time per query, to
    // localize stalls (driver planning vs task execution).
    val taskNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    val taskCount = new java.util.concurrent.atomic.AtomicLong(0L)
    val jobCount = new java.util.concurrent.atomic.AtomicLong(0L)
    if (debug) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          if (te.taskInfo != null) {
            taskNanos.addAndGet((te.taskInfo.finishTime - te.taskInfo.launchTime) * 1000000L)
            taskCount.incrementAndGet()
          }
        }
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobCount.incrementAndGet()
      })

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      val (tn0, tc0, jc0) = (taskNanos.get, taskCount.get, jobCount.get)
      try queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      val sec = (System.nanoTime() - t0) / 1e9
      if (debug) {
        // settle async task-end events before reading counters
        Thread.sleep(200)
        System.err.println(f"[bench-debug] $name wall=$sec%.2fs " +
          f"taskTime=${(taskNanos.get - tn0) / 1e9}%.2fs " +
          s"tasks=${taskCount.get - tc0} jobs=${jobCount.get - jc0}")
      }
      sec
    }

    run(names.head) // warm-up, untimed
    val results = names.map(n => n -> run(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
