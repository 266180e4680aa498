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
    for (q <- Seq("q22_jaccard_pairs", "q24_minhash_lsh_pairs",
        "q25_simhash_pairs", "q96_duplicated_spans", "q112_cross_dedup",
        "q152_image_neardup", "q175_jaccard_prefix")) {
      val p = planOf(q)
      assert(count(p, "CartesianProduct") === 0, s"$q went quadratic")
      assert(count(p, "BroadcastNestedLoopJoin") === 0, s"$q went quadratic")
    }
  }

  test("SemDeDup pairs never cross cluster boundaries — equi-join on cluster, no all-pairs") {
    // pair generation must ride the cluster id as a hash-join key:
    // any cartesian/BNLJ means the within-cluster confinement (the
    // O(Σ cell²), never corpus², property) silently broke. Same pin
    // for the cross-frame decontamination member (q211): corpus×eval
    // must equi-join on the trained cell, never |corpus|×|eval|.
    for (q <- Seq("q202_semdedup", "q211_semantic_decontamination")) {
      val p = planOf(q)
      assert(count(p, "CartesianProduct") === 0, s"$q went quadratic")
      assert(count(p, "BroadcastNestedLoopJoin") === 0, s"$q went quadratic")
    }
  }

  test("NSW graph build + search never go all-pairs") {
    val p = planOf("q214_nsw_topk")
    // edge construction must equi-join on the cell id and every hop
    // must equi-join the frontier on (cell, node): a cartesian means
    // the within-cell confinement or the hop join silently broke. The
    // only nested-loop joins allowed are the broadcast-SEED routing
    // crossjoins (corpus×nlist and queries×nlist — linear in the
    // corpus, the accepted IVF pattern).
    assert(count(p, "CartesianProduct") === 0, "q214 went quadratic")
    assert(count(p, "BroadcastNestedLoopJoin") <= 3,
      "q214 grew a nested-loop join beyond the broadcast-seed routing")
  }

  test("CDC chunking is one scan — pure in-scan arithmetic, no join") {
    for (q <- Seq("q93_cdc_chunks", "q94_cdc_dedup_stats")) {
      val p = planOf(q)
      assert(count(p, "Scan parquet") === 1,
        s"$q must read documents exactly once")
      assert(!p.contains("Join"),
        s"$q must not join (q94 carries `source` through the chunker):\n$p")
    }
  }

  test("corpus shuffle: ONE shard exchange, per-shard sort only") {
    // shuffleOrder's contract: rows move once (hash on shard), each
    // shard sorts independently — no global range sort of the corpus
    val df = graft.operators.TrainingPrep.shuffleOrder(
      spark.read.parquet(s"$dir/documents.parquet").select("doc_id"),
      "doc_id", seed = 42L, numShards = 4)
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==").head
    assert(count(p, "Exchange hashpartitioning") === 1,
      s"shuffleOrder must shuffle exactly once, on shard:\n$p")
    assert(count(p, "Exchange rangepartitioning") === 0,
      s"shuffleOrder must not global-sort:\n$p")
  }

  test("PQ encode/ADC: codebook always broadcasts, never cartesian") {
    for (q <- Seq("q100_pq_encode", "q101_pq_adc_topk")) {
      val p = planOf(q)
      assert(count(p, "BroadcastHashJoin") >= 1,
        s"$q must broadcast the codebook:\n$p")
      assert(count(p, "SortMergeJoin") === 0 &&
        count(p, "CartesianProduct") === 0,
        s"$q corpus side must stay scan-local:\n$p")
      // q101's scorer is q27's brute-probe shape: exactly ONE
      // deliberate BNLJ (corpus scan × broadcast per-query LUTs);
      // anything more means a join degraded somewhere else
      val bnljBudget = if (q == "q101_pq_adc_topk") 1 else 0
      assert(count(p, "BroadcastNestedLoopJoin") === bnljBudget,
        s"$q BNLJ count must be exactly $bnljBudget:\n$p")
    }
  }

  test("OPQ rung: final assembly is 1-row broadcasts, nothing quadratic") {
    // q231's heavy stages (k-means fits, encodes, ADC probes) run
    // eagerly behind localCheckpoints and carry q100/q101's pins; the
    // visible final plan must be just the three 1-row arm frames
    // unioned plus the argmin-MSE cross of two 1-row frames — never a
    // SortMergeJoin or an unchecked CartesianProduct
    val p = planOf("q231_opq_rung")
    assert(count(p, "SortMergeJoin") === 0, s"q231 grew a shuffle join:\n$p")
    assert(count(p, "CartesianProduct") === 0, s"q231 went cartesian:\n$p")
  }

  test("epoch allocation: corpus never shuffles — broadcast totals only") {
    val p = planOf("q99_epoch_allocation")
    // the docs side is read for totals (tiny agg) and for the decision
    // scan; the decision join must be broadcast, not a corpus shuffle
    assert(count(p, "BroadcastHashJoin") >= 1,
      s"q99 lost its broadcast totals join:\n$p")
    assert(count(p, "SortMergeJoin") === 0,
      s"q99 must never sort-merge the corpus:\n$p")
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

  test("fanOut fires only below cores/2 splits — cluster plans unchanged") {
    import org.apache.spark.sql.functions.col
    // well-split input: fanOut must return the SAME DataFrame object —
    // no new plan node at all (this no-op guard is what makes it safe
    // to leave in cluster code paths)
    val cores = spark.sparkContext.defaultParallelism
    val wide = spark.range(0, 1000).toDF("id").repartition(cores)
    assert(graft.core.Scan.fanOut(wide) eq wide,
      "fanOut must be an object-identity no-op at >= cores/2 splits")
    // boundary: the smallest split count satisfying splits*2 >= cores
    // is still a no-op (hysteresis); ceil handles odd core counts
    if (cores >= 2) {
      val half = spark.range(0, 1000).toDF("id")
        .repartition((cores + 1) / 2)
      assert(graft.core.Scan.fanOut(half) eq half,
        "fanOut must not fire at exactly ceil(cores/2) splits")
    }
    // collapsed input: exactly one round-robin exchange appears and the
    // partition count is restored to defaultParallelism
    val one = spark.range(0, 1000).toDF("id").coalesce(1)
    val fanned = graft.core.Scan.fanOut(one)
    assert(!(fanned eq one))
    assert(fanned.rdd.getNumPartitions === cores)
    val p = fanned.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==").head
    assert(count(p, "Exchange RoundRobinPartitioning") === 1,
      s"fanOut must add exactly one round-robin exchange, plan:\n$p")
    // values pass through unchanged
    assert(fanned.select(col("id")).collect().map(_.getLong(0)).sorted
      === (0L until 1000L).toArray)
  }

  /** Unpartitioned windows sort the WORLD on one task unless the input
    * is provably bounded. GraftSession mutes WindowExec's per-query
    * warning (bench-noise reasons, GraftSession.scala) — this sweep is
    * the compensating control: every oracle query's PRE-AQE physical
    * plan is scanned for empty-partitionSpec window nodes, and each hit
    * must be on the documented bounded-intermediate allowlist.
    */
  test("quality scoring is a pure narrow map — zero data shuffles") {
    val p = planOf("q104_quality_logit")
    // the only Exchange allowed is the final ORDER BY's range partition
    assert(count(p, "Exchange hashpartitioning") === 0,
      "q104 scoring must not shuffle — hashing-trick scoring is row-local")
    assert(count(p, "Generate") === 0 && count(p, "Join") === 0,
      "q104 must score from the token-hash array without explode or join")
  }

  test("novelty builds its shingle index with a window min, not a self-join") {
    val p = planOf("q103_ngram_novelty")
    assert(count(p, "Join") === 0,
      "q103 min-doc-per-shingle must be a window over ONE exchange, " +
        "not a groupBy + self-join (that shape shuffles the grams twice)")
    assert(count(p, "Exchange hashpartitioning") === 2,
      "q103 is exactly two keyed exchanges: shingle hash, then doc id")
  }

  test("k-means assignment is narrow — broadcast centroids, no join") {
    val p = planOf("q102_kmeans_fit")
    assert(count(p, "Join") === 0,
      "q102 must assign against centroid literals, never a centroid join")
    assert(count(p, "Exchange hashpartitioning") === 1,
      "q102's only keyed exchange is the (cluster, pos) update aggregation")
  }

  test("TV divergence joins shared vocab only — totals broadcast") {
    val p = planOf("q105_source_divergence")
    assert(count(p, "CartesianProduct") === 0 &&
      count(p, "BroadcastNestedLoopJoin") === 0,
      "q105 must never go all-pairs")
    assert(count(p, "BroadcastHashJoin") >= 2,
      "q105's per-source totals must broadcast onto the vocab join")
  }

  test("q106 moments is ONE aggregation pass like q30/q84") {
    val p = planOf("q106_moments")
    assert(count(p, "Scan parquet") === 1,
      "q106 must read lineitem exactly once")
  }

  test("gopher rules ride the scan — no shuffle before the funnel agg") {
    val p110 = planOf("q110_gopher_rules")
    assert(count(p110, "Exchange hashpartitioning") === 0 &&
      count(p110, "Join") === 0,
      "q110 rule flags must be row-local scan-stage expressions")
    val p111 = planOf("q111_filter_funnel")
    assert(count(p111, "Scan parquet") === 1 && count(p111, "Join") === 0,
      "q111 funnel is one map-side-combined agg over one scan")
  }

  test("filtered ANN broadcasts queries — corpus never shuffles") {
    val p = planOf("q114_filtered_ann")
    assert(count(p, "BroadcastHashJoin") === 1,
      "q114's label-filtered probe must be one broadcast hash join")
    assert(count(p, "CartesianProduct") === 0 &&
      count(p, "BroadcastNestedLoopJoin") === 0,
      "q114 must keep the filter in the join condition, not go all-pairs")
  }

  test("SQ8 topK: integer probe, corpus never shuffles, scales broadcast") {
    val p = planOf("q132_sq8_topk")
    // three deliberate nested-loop fanouts and no more: the brute
    // query probe (q27's documented shape — queries broadcast against
    // the encoded corpus) plus the two 1-ROW scale-table broadcasts
    // (corpus encode, query encode) — per-row work is bounded by dim,
    // never |corpus|
    assert(count(p, "BroadcastNestedLoopJoin") === 3,
      s"q132 must keep only the probe + two 1-row scale fanouts:\n$p")
    assert(count(p, "CartesianProduct") === 0 &&
      count(p, "SortMergeJoin") === 0,
      s"q132 degraded a join:\n$p")
    // shuffles: the dim-sized scale agg (map-side combined) and the
    // per-query ranking window — the corpus codes themselves ride scans
    assert(count(p, "Exchange hashpartitioning") <= 4,
      s"q132 grew an unexpected shuffle:\n$p")
  }

  test("curation funnel is ONE documents scan — stages share flags, no rejoin") {
    val p = planOf("q139_curation_funnel")
    assert(count(p, "Scan parquet") === 1,
      s"q139 must compute every stage's flags from one scan:\n$p")
    assert(count(p, "Join") === 0,
      s"q139 must not join stages back together:\n$p")
  }

  test("URL dedup and domain stats are narrow + one keyed shuffle") {
    for (q <- Seq("q134_url_dedup", "q137_domain_stats")) {
      val p = planOf(q)
      assert(count(p, "Join") === 0, s"$q grew a join:\n$p")
      assert(count(p, "Scan parquet") === 1, s"$q re-scanned:\n$p")
    }
  }

  test("PageRank never goes all-pairs; iteration state is checkpointed") {
    val p = planOf("q133_pagerank")
    assert(count(p, "CartesianProduct") === 0 &&
      count(p, "BroadcastNestedLoopJoin") === 0,
      s"q133 must join contributions on src, never all-pairs:\n$p")
    // localCheckpoint per iteration → the final plan reads scanned
    // RDD state, not a 3-iteration lineage of nested joins
    assert(count(p, "Scan ExistingRDD") >= 1,
      s"q133 lost its per-iteration localCheckpoint:\n$p")
  }

  test("quality ensemble: four windows share ONE source exchange") {
    val p = planOf("q141_quality_ensemble")
    assert(count(p, "Scan parquet") === 1 && count(p, "Join") === 0,
      s"q141 must stay one scan, no joins:\n$p")
    assert(count(p, "Exchange hashpartitioning") === 1,
      s"q141's four source-partitioned windows must reuse one exchange:\n$p")
  }

  test("IVF-PQ scores via a cell hash join — the brute LUT probe is gone") {
    for (q <- Seq("q117_ivf_pq_topk", "q125_ivf_pq_filtered"))
      assertIvfPqShape(planOf(q))
  }

  test("residual IVF-PQ keeps q117's shape — residual math never degrades a join") {
    val p = planOf("q153_ivfpq_residual_topk")
    // the assignment is localCheckpointed (a persisted model table in
    // production), so the final plan keeps only the query-probe
    // centroid fanout; the residual subtraction is a narrow map behind
    // broadcast hash joins on cell, and scoring stays the cell hash join
    assert(count(p, "BroadcastNestedLoopJoin") <= 1,
      s"q153 grew an unbounded nested-loop join:\n$p")
    assert(count(p, "BroadcastHashJoin") >= 3,
      s"q153 must hash-join residuals, codes, and probe LUTs:\n$p")
    assert(count(p, "CartesianProduct") === 0 &&
      count(p, "SortMergeJoin") === 0,
      s"q153 degraded a join:\n$p")
  }

  test("IVF-SQ8 scores via a cell hash join — bounded fanouts only") {
    val p = planOf("q136_ivf_sq8_topk")
    // allowed nested-loop joins: the two centroid fanouts (corpus
    // assign, query probe — per-row work nlist ≈ √n) and the two 1-ROW
    // scale-table fanouts (corpus encode, query encode — per-row work
    // dim). The SCORING join must be a broadcast HASH join on cell id.
    assert(count(p, "BroadcastNestedLoopJoin") === 4,
      s"q136 must keep only the 4 bounded fanouts:\n$p")
    assert(count(p, "BroadcastHashJoin") >= 2,
      s"q136 must hash-join codes to probes on cell:\n$p")
    assert(count(p, "CartesianProduct") === 0 &&
      count(p, "SortMergeJoin") === 0,
      s"q136 degraded a join:\n$p")
  }

  private def assertIvfPqShape(p: String): Unit = {
    // the ONLY nested-loop joins allowed are the two centroid-fanout
    // ranking passes (queries × nlist seeds, corpus × nlist seeds in
    // ivfAssign) — per-row work bounded by nlist ≈ √n, never |corpus|.
    // The SCORING join (codes × probe LUTs) must be a broadcast HASH
    // join on cell id: that is the whole point of the composition.
    assert(count(p, "BroadcastNestedLoopJoin") === 2,
      s"q117 must keep only the two bounded centroid fanouts:\n$p")
    assert(count(p, "BroadcastHashJoin") >= 2,
      s"q117 must hash-join codes to probe LUTs on cell:\n$p")
    assert(count(p, "CartesianProduct") === 0 &&
      count(p, "SortMergeJoin") === 0,
      s"q117 degraded a join:\n$p")
  }

  test("IVF-BIN scores via a cell hash join — centroid fanouts only") {
    val p = planOf("q181_ivf_bin_topk")
    // allowed nested-loop joins: the two centroid fanouts (corpus
    // assign, query probe); bin codes need no scale table, so two
    // fewer fanouts than IVF-SQ8. Scoring must stay the broadcast
    // hash join on cell id.
    assert(count(p, "BroadcastNestedLoopJoin") === 2,
      s"q181 must keep only the two centroid fanouts:\n$p")
    assert(count(p, "BroadcastHashJoin") >= 2,
      s"q181 must hash-join codes to probes on cell:\n$p")
    assert(count(p, "CartesianProduct") === 0 &&
      count(p, "SortMergeJoin") === 0,
      s"q181 degraded a join:\n$p")
  }

  test("rolling anomaly: one keyed agg + one type-partitioned window") {
    val p = planOf("q178_rolling_anomaly")
    assert(count(p, "Scan parquet") === 1 && count(p, "Join") === 0,
      s"q178 is one scan, no joins:\n$p")
    // the (event_type, day) agg and the event_type window can share a
    // partitioning only if the window repartitions on the agg's
    // prefix; pin the shuffle budget instead of the exact reuse
    assert(count(p, "Exchange hashpartitioning") <= 2,
      s"q178 grew an unexpected shuffle:\n$p")
  }

  test("shard manifest: two-phase prefix sum, no global sort of the corpus") {
    val p = planOf("q179_shard_manifest")
    // packOffsets' shape: bucket-local window + broadcast bucket
    // bases; the only range partitioning allowed is the final tiny
    // manifest ORDER BY (shards ≈ corpus/target rows, never corpus)
    assert(count(p, "Exchange rangepartitioning") <= 1,
      s"q179 must not globally sort the corpus:\n$p")
    assert(count(p, "BroadcastHashJoin") >= 1,
      s"q179's bucket bases must broadcast:\n$p")
    assert(count(p, "SortMergeJoin") === 0 &&
      count(p, "CartesianProduct") === 0,
      s"q179 degraded a join:\n$p")
  }

  test("gate kappa: ONE documents scan fans into the six pair rows") {
    val p = planOf("q180_gate_kappa")
    // the checkpointed 1-row agg means the final plan reads RDD state
    // once per union arm — but documents itself is scanned exactly
    // once (inside the checkpoint's lineage, gone from this plan)
    assert(count(p, "Scan parquet") === 0,
      s"q180 must aggregate documents once inside the checkpoint:\n$p")
    assert(count(p, "Join") === 0, s"q180 must not join:\n$p")
  }

  test("hybrid RRF legs keep their production shapes") {
    val p = planOf("q120_hybrid_rrf")
    assert(count(p, "SortMergeJoin") === 0 &&
      count(p, "CartesianProduct") === 0,
      s"q120 degraded a join:\n$p")
    // the ONLY nested-loop joins are the exact-cosine leg's deliberate
    // single-query broadcast probe (q27's documented brute shape — at
    // scale the vector leg is ivfPqTopK, whose plan q117 pins) and
    // BM25's 1-row corpus-stats fanout (q79's shape); the fusion
    // itself is a union + one keyed agg, never a join of legs
    assert(count(p, "BroadcastNestedLoopJoin") === 2,
      s"q120 grew an extra nested-loop join:\n$p")
  }

  test("DSIR scoring is a narrow map over a broadcast model") {
    val p = planOf("q121_dsir_selection")
    // two deliberate 1-row scalar fanouts (smoothing totals, ratio
    // MAP); the candidate scan must score row-locally — no join, no
    // explode, no shuffle of documents
    assert(count(p, "BroadcastNestedLoopJoin") === 2,
      s"q121 must fan out exactly the two 1-row model tables:\n$p")
    assert(count(p, "CartesianProduct") === 0 &&
      count(p, "SortMergeJoin") === 0, s"q121 degraded a join:\n$p")
    // every keyed exchange is bucket-keyed (bounded by nBuckets, the
    // whole point of hashed features); the document table itself never
    // hash-shuffles (scoring is row-local against the broadcast map)
    assert(count(p, "hashpartitioning\\(bucket") >= 1 &&
      count(p, "Exchange hashpartitioning") ===
        count(p, "hashpartitioning\\(bucket"),
      s"q121 grew a non-bucket keyed exchange:\n$p")
    assert(count(p, "hashpartitioning\\(doc_id") === 0,
      s"q121 must never shuffle documents:\n$p")
  }

  test("JSONL round trip aggregates without joins") {
    val p = planOf("q122_jsonl_roundtrip")
    assert(count(p, "Join") === 0, s"q122 is scan+agg only:\n$p")
  }

  test("round-10 continuation queries keep their scale shapes") {
    // q164: the greedy fold runs on the distinct-word dictionary and
    // its counts BROADCAST back onto the token stream — never a
    // shuffle join against the exploded tokens
    val p164 = planOf("q164_wordpiece_compare")
    assert(count(p164, "BroadcastHashJoin") >= 1, "q164 lost the " +
      "dictionary broadcast")
    assert(count(p164, "CartesianProduct") === 0, "q164 went quadratic")
    // q170: contamination spans come from the hash-keyed inverted
    // join — never all-pairs
    val p170 = planOf("q170_contamination_spans")
    assert(count(p170, "CartesianProduct") === 0, "q170 went quadratic")
    assert(count(p170, "BroadcastNestedLoopJoin") === 0,
      "q170 went quadratic")
    // q166: the hashing trick is ONE scan, zero joins — that's the
    // point of the operator
    val p166 = planOf("q166_feature_hashing")
    assert(count(p166, "Scan parquet") === 1, "q166 must scan once")
    assert(count(p166, "Join") === 0, "q166 must not join")
    // q162/q169: the only fanout is the documented broadcast 1-row
    // (corpus max); everything else is keyed aggregation
    for (q <- Seq("q162_bucket_batching", "q169_decayed_popularity")) {
      val p = planOf(q)
      assert(count(p, "BroadcastNestedLoopJoin") <= 1,
        s"$q grew beyond its single 1-row fanout")
      assert(count(p, "CartesianProduct") === 0, s"$q went quadratic")
      assert(count(p, "SortMergeJoin") === 0, s"$q grew a shuffle join")
    }
    // q163: the card reads documents once per leg (doc-grain + token
    // distinct) and joins only the per-source aggregates
    val p163 = planOf("q163_dataset_card")
    assert(count(p163, "Scan parquet") === 2,
      "q163 must scan documents exactly twice (one per leg)")
  }

  test("round-13b queries keep their scale shapes") {
    // q247: filter build + probe are equi-joins on the bit position;
    // the only 1-row fanouts are the broadcast bounds/aggregates
    val p247 = planOf("q247_bloom_skipping")
    assert(count(p247, "CartesianProduct") === 0, "q247 went quadratic")
    assert(count(p247, "SortMergeJoin") === 0, "q247 grew a shuffle join")
    // q248/q257: pair generation is the blocked equi-join — never
    // all-pairs
    for (q <- Seq("q248_record_linkage", "q257_weighted_jaccard")) {
      val p = planOf(q)
      assert(count(p, "CartesianProduct") === 0, s"$q went quadratic")
      assert(count(p, "BroadcastNestedLoopJoin") === 0, s"$q went quadratic")
    }
    // q257: the pair-gen join reads CAPPED posting lists — the
    // row_number<=cap prune must compile to a WindowGroupLimit so a
    // stop token's D² blowup is cut before the self-join, and the
    // prn<=cap filter itself must be present
    val p257 = planOf("q257_weighted_jaccard")
    assert(count(p257, "WindowGroupLimit") >= 1,
      "q257 lost its posting-list cap (WindowGroupLimit)")
    assert(count(p257, "prn") >= 1, "q257 lost the prn<=cap filter")
    // q249: DBSCAN candidates come from the 3x3 cell equi-join
    val p249 = planOf("q249_dbscan_grid")
    assert(count(p249, "CartesianProduct") === 0, "q249 went quadratic")
    assert(count(p249, "BroadcastNestedLoopJoin") <= 1,
      "q249 grew beyond its single 1-row noise fanout")
    // q255: AA pairs ride the user-keyed inverted join
    val p255 = planOf("q255_adamic_adar")
    assert(count(p255, "CartesianProduct") === 0, "q255 went quadratic")
    // q245/q246: pure aggregation pipelines — no join beyond the
    // documented broadcasts, no shuffle join
    for (q <- Seq("q245_k_anonymity", "q246_score_auc")) {
      val p = planOf(q)
      assert(count(p, "SortMergeJoin") === 0, s"$q grew a shuffle join")
      assert(count(p, "CartesianProduct") === 0, s"$q went quadratic")
    }
  }

  test("no undocumented unpartitioned Window in any oracle query plan") {
    import org.apache.spark.sql.execution.window.WindowExec
    // every entry here is a window over a bounded-tiny intermediate:
    //   q64/q68/q81: prefix-sum over per-BUCKET totals (rows = bucket
    //     count, input already aggregated);
    //   q79: final rank over the per-query top-k survivors (≤ q·k rows)
    //   q120/q121: final rank over the ≤ k fused / ≤ m selected
    //     survivors (both post-limit, like q79)
    //   q154/q155: q64's bucket-total prefix window plus the vocab-id
    //     window over the char table (≤ alphabet + merges rows)
    //   q172: waterfill rank/prefix/level windows over the per-SOURCE
    //     totals (k ≈ 20 rows — the q64 bucket-prefix class)
    //   q179: shardManifest IS packOffsets (q64's bucket-total prefix
    //     window, rows = bucket count) + the per-shard rollup
    val allowed = Set("q64_pack_offsets", "q68_pack_segments",
      "q81_chunk_spans", "q79_bm25_topk", "q120_hybrid_rrf",
      "q121_dsir_selection", "q154_bpe_pack_ids", "q155_multimodal_pack",
      "q172_waterfill_mixture", "q173_apportion_eval",
      "q179_shard_manifest",
      // q192: cumulative sums over the 10-row decile table
      "q192_vocab_growth",
      // q194: rank/prefix windows over the per-SOURCE totals
      "q194_source_gini",
      // q196: leaderboard ranks over the per-ITEM totals (item
      // catalog = bounded dimension, not the event stream)
      "q196_wilson_ranking",
      // q199: q68's segment map (packOffsets' bucket-total prefix
      // window) under a rollup
      "q199_pack_boundary_stats",
      // q207: q154's pack pipeline under the unigram tokenizer — the
      // same q64 bucket-total prefix window
      "q207_unigram_pack_ids",
      // q233: the per-ADDRESS-count exclusive prefix (≤ 2^(2·ZO_BITS)
      // rows structurally — the q64 bucket-total class; the row-data
      // rank is partitioned by address since r15's two-phase rewrite)
      "q233_hilbert_skipping",
      // q252: cumulative coverage over the ≤ k greedy picks (k = 8
      // driver-loop rows — the q64 bounded-intermediate class)
      "q252_set_cover",
      // q267: the GLOBAL sensitive-value CDF — a cumulative sum over
      // the m-row value domain (m = |sensitive enum| ≤ a handful;
      // the per-class windows partition by QI and are not global)
      "q267_t_closeness",
      // q296: the BH rank over the K = 25 per-metric p-value rows —
      // the hypothesis battery is a bounded dimension (q252's
      // bounded-intermediate class), not the event stream
      "q296_bh_fdr",
      // q301: midrank prefix-sum over the ≤ 200-row token-count value
      // grid (input already aggregated — the q64 bucket-prefix class)
      "q301_mann_whitney")
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    for (name <- SparkEntry.queries.keys.toSeq.sorted
        if !allowed.contains(name)) {
      val df = SparkEntry.queries(name)(spark, dir)
      val hits = df.queryExecution.sparkPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      if (hits.nonEmpty) offenders += name
    }
    assert(offenders.isEmpty,
      s"unpartitioned Window over non-allowlisted input in: $offenders")
  }
}
