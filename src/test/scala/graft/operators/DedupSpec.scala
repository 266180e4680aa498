package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Dedup.MinHashParams

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "the quick brown fox jumps over the lazy cat tonight"), // near-dup of 1
    (3L, "completely different words about spark query engines here"),
    (4L, "the quick brown fox jumps over the lazy dog tonight")  // exact dup of 1
  ).toDF("doc_id", "text")

  test("keepLatest keeps one row per key by order column") {
    val events = Seq(
      (1L, "click", 100L, 10.0),
      (1L, "click", 200L, 20.0),
      (2L, "view", 150L, 30.0)
    ).toDF("user_id", "event_type", "ts", "value")
    val out = Dedup.keepLatest(events, Seq("user_id", "event_type"), "ts", "value")
      .orderBy("user_id").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("ts") === 200L) // latest kept
  }

  test("jaccardPairs finds near-dups via the inverted shingle index") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, tau = 0.5)
      .orderBy("d1", "d2").collect()
    val keys = pairs.map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(keys.contains((1L, 4L))) // exact dup
    assert(keys.contains((1L, 2L))) // near dup (1 token differs)
    assert(!keys.exists { case (a, b) => a == 3L || b == 3L })
    val exact = pairs.find(r => r.getAs[Long]("d1") == 1L &&
      r.getAs[Long]("d2") == 4L).get
    assert(exact.getAs[Double]("jaccard") === 1.0)
  }

  test("crossNearDups matches the batch only against the corpus") {
    val corpus = docs.filter(col("doc_id") =!= 4L) // 1, 2, 3
    val batch = docs.filter(col("doc_id") === 4L)  // exact dup of 1
    val m = Dedup.crossNearDups(corpus, batch, "doc_id", "text",
      n = 3, tau = 0.5, MinHashParams()).collect()
    // identical text → identical signature → every band collides; the
    // (4,2) near-dup pair sits at jaccard ≈ 0.45 < tau and must be
    // verified away even if a band surfaces it
    assert(m.map(r => (r.getAs[Long]("bid"), r.getAs[Long]("cid"))).toSet
      === Set((4L, 1L)))
    assert(m.head.getAs[Double]("jaccard") === 1.0)
    // never batch×batch, never corpus×corpus
    assert(m.forall(_.getAs[Long]("bid") === 4L))
  }

  test("crossNearDups ≡ full-corpus LSH pairs restricted to batch×corpus") {
    // Splitting a corpus must not change which cross-side pairs the
    // banded path surfaces: crossNearDups(corpus, batch) equals
    // minhashNearDups(corpus ∪ batch) filtered to pairs with exactly
    // one side in the batch (uncapped buckets, so the only difference
    // is the join orientation). tau low enough to admit the 0.45
    // near-dup pairs IF their bands collide — both paths share the
    // band family, so they agree either way.
    val batchIds = Set(2L)
    val corpus = docs.filter(!col("doc_id").isin(batchIds.toSeq: _*))
    val batch = docs.filter(col("doc_id").isin(batchIds.toSeq: _*))
    val cross = Dedup.crossNearDups(corpus, batch, "doc_id", "text",
        n = 3, tau = 0.4, MinHashParams()).collect()
      .map(r => (r.getAs[Long]("bid"), r.getAs[Long]("cid"))).toSet
    val full = Dedup.minhashNearDups(docs, "doc_id", "text",
        n = 3, tau = 0.4, MinHashParams()).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")))
      .filter { case (a, b) => batchIds.contains(a) ^ batchIds.contains(b) }
      .map { case (a, b) => if (batchIds.contains(a)) (a, b) else (b, a) }
      .toSet
    assert(cross === full)
  }

  test("crossNearDups from a parquet-persisted index ≡ recomputed; appendable") {
    val dir = java.nio.file.Files.createTempDirectory("sig_index").toString
    val corpus = docs.filter(col("doc_id") =!= 4L) // 1, 2, 3
    val batch = docs.filter(col("doc_id") === 4L)  // exact dup of 1
    val params = MinHashParams()
    // materialize the corpus index once (the per-corpus-version write)
    Dedup.minhashBands(corpus, "doc_id", "text", 3, params)
      .write.mode("overwrite").parquet(s"$dir/bands")
    Dedup.shingleSets(corpus, "doc_id", "text", 3)
      .write.mode("overwrite").parquet(s"$dir/sets")
    def fromIndex() = Dedup.crossNearDupsFromIndex(
        spark.read.parquet(s"$dir/bands"), spark.read.parquet(s"$dir/sets"),
        batch, "doc_id", "text", 3, tau = 0.5, params).collect()
      .map(r => (r.getAs[Long]("bid"), r.getAs[Long]("cid"),
        r.getAs[Double]("jaccard"))).toSet
    val direct = Dedup.crossNearDups(corpus, batch, "doc_id", "text",
        3, 0.5, params).collect()
      .map(r => (r.getAs[Long]("bid"), r.getAs[Long]("cid"),
        r.getAs[Double]("jaccard"))).toSet
    assert(fromIndex() === direct)
    // append a new corpus doc (another exact dup of 1) to the stored
    // index — the delta write, no corpus recompute — and the batch doc
    // must now ALSO match it
    val delta = Seq((7L, docs.filter(col("doc_id") === 1L)
      .select("text").head().getString(0))).toDF("doc_id", "text")
    Dedup.minhashBands(delta, "doc_id", "text", 3, params)
      .write.mode("append").parquet(s"$dir/bands")
    Dedup.shingleSets(delta, "doc_id", "text", 3)
      .write.mode("append").parquet(s"$dir/sets")
    assert(fromIndex().map(t => (t._1, t._2))
      === direct.map(t => (t._1, t._2)) + ((4L, 7L)))
  }

  test("crossNearDups: a batch doc below the shingle width has no matches") {
    val corpus = docs
    val tiny = Seq((9L, "two words")).toDF("doc_id", "text") // < n tokens
    val m = Dedup.crossNearDups(corpus, tiny, "doc_id", "text",
      n = 3, tau = 0.5, MinHashParams()).count()
    // empty shingle set → no signature row → no bands → keep verdict
    // downstream (mirrors the oracle, where NULL band hashes never join)
    assert(m === 0L)
  }

  test("minhash LSH surfaces exact dups and only above-threshold pairs") {
    val rows = Dedup.minhashNearDups(docs, "doc_id", "text", n = 3,
      tau = 0.5, MinHashParams()).collect()
    val nd = rows.map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    // identical docs share every band — guaranteed candidate + jaccard 1
    assert(nd.contains((1L, 4L)))
    // every surfaced pair must clear the verify threshold (LSH candidate
    // generation is probabilistic; verification is exact)
    assert(rows.forall(_.getAs[Double]("jaccard") >= 0.5))
    assert(!nd.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("hot-bucket guard bounds degenerate LSH buckets") {
    // adversarial template corpus: 40 byte-identical docs — every band
    // of every doc lands in ONE bucket, the O(b²) task the cap exists
    // to bound
    val template = (1L to 40L)
      .map(i => (i, "identical boilerplate text repeated across the corpus today"))
      .toDF("doc_id", "text")
    // uncapped (default 10000): the full quadratic pair set surfaces
    val full = Dedup.minhashNearDups(template, "doc_id", "text", n = 3,
      tau = 0.5, MinHashParams()).count()
    assert(full === 40L * 39 / 2)
    // cap 8 < bucket size 40: the hot bucket is dropped, zero
    // candidates instead of a quadratic task
    val capped = Dedup.minhashNearDups(template, "doc_id", "text", n = 3,
      tau = 0.5, MinHashParams(), maxBucket = 8).count()
    assert(capped === 0)
    // the dropped mass is observable for monitoring
    val hot = Dedup.hotBuckets(
      Dedup.minhashBands(template, "doc_id", "text", 3, MinHashParams()),
      Seq("band_idx", "band_hash"), maxBucket = 8).collect()
    assert(hot.length === MinHashParams().bands)
    assert(hot.forall(_.getAs[Long]("n_docs") === 40L))
    // mixed corpus: docs in healthy buckets still pair under the cap
    // (ids shifted to 101-104 so they don't collide with the template)
    val shifted = docs.select((col("doc_id") + 100).as("doc_id"), col("text"))
    val cappedShifted = Dedup.minhashNearDups(template.unionByName(shifted),
        "doc_id", "text", n = 3, tau = 0.5, MinHashParams(), maxBucket = 8)
      .collect().map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(cappedShifted.contains((101L, 104L)), "healthy-bucket pair survives")
    assert(!cappedShifted.exists { case (a, b) => b <= 40 })
  }

  test("bucket cap: exact dropped-mass accounting and recall via other bands") {
    // adversarial-at-scale shape: 35 near-identical docs (common 20-token
    // body + unique suffix). Their minhash sigs mostly agree, so each
    // band concentrates them into one big bucket — but NOT the same
    // split per band: for these 35 docs the buckets are 33/28/24/25
    // docs across bands 0..3. That asymmetry is what the cap exploits:
    // dropping one band's hot bucket does not lose the pair, because a
    // different band still holds it in an under-cap bucket.
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val near = (1 to 35).map(i => (i.toLong, s"$base unique$i"))
      .toDF("doc_id", "text")
    val p = MinHashParams()
    val bands = Dedup.minhashBands(near, "doc_id", "text", 3, p)
    val key = Seq("band_idx", "band_hash")

    // cap 10, hot bucket 33 docs = 3.3x the cap: every multi-doc bucket
    // is hot -> conservation must hold EXACTLY (kept + dropped = all)
    val hot10 = Dedup.hotBuckets(bands, key, maxBucket = 10)
      .agg(sum(col("n_docs"))).collect().head.getLong(0)
    val kept10 = Dedup.capBuckets(bands, key, maxBucket = 10).count()
    assert(kept10 + hot10 === bands.count(), "dropped mass must be exact")

    // per-task candidate bound: after capping, NO surviving bucket
    // exceeds the cap, so a bucket's candidate-pair fan-out is at most
    // C(cap,2) regardless of input skew
    val cap = 30
    val survivors = Dedup.capBuckets(bands, key, cap)
      .groupBy(key.map(col): _*).agg(count(lit(1)).as("n"))
    assert(survivors.agg(max(col("n"))).collect().head.getLong(0) <= cap)

    // cap 30 drops exactly band 0's 33-doc bucket; the docs it held
    // still pair through bands 1-3 (28/24/25-doc buckets, under cap)
    val hot30 = Dedup.hotBuckets(bands, key, cap).collect()
    assert(hot30.map(r => (r.getAs[Int]("band_idx"), r.getAs[Long]("n_docs")))
      .toSeq === Seq((0, 33L)))
    val pairs30 = Dedup.minhashNearDups(near, "doc_id", "text", n = 3,
      tau = 0.5, p, maxBucket = cap)
    assert(pairs30.count() >= 28L * 27 / 2,
      "pairs must still surface via the other bands' under-cap buckets")
  }

  test("simhash hot-bucket cap completes degenerate corpora with bounded work") {
    val template = (1L to 40L)
      .map(i => (i, "identical boilerplate text repeated across the corpus today"))
      .toDF("doc_id", "text")
    assert(Dedup.simhashPairs(template, "doc_id", "text", n = 3,
      maxHamming = 3).count() === 40L * 39 / 2)
    assert(Dedup.simhashPairs(template, "doc_id", "text", n = 3,
      maxHamming = 3, maxBucket = 8).count() === 0)
  }

  test("connectedComponents collapses chains into one cluster") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("d1", "d2")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(1L) === 1L && cc(2L) === 1L && cc(3L) === 1L) // chain a-b-c
    assert(cc(7L) === 7L && cc(9L) === 7L)
  }

  test("connectedComponents lineage stays flat over many iterations") {
    // 13-node chain: min-label propagation moves the label one hop per
    // iteration, so this needs 12 iterations + 1 to detect convergence.
    // Before the localCheckpoint fix the analyzed plan doubled per
    // iteration (~MBs by iteration 12); checkpointing truncates each
    // iteration to a leaf, so the returned plan must stay tiny.
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("d1", "d2")
    val result = Dedup.connectedComponents(chain, maxIter = 20)
    val cc = result.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size === 13)
    assert(cc.values.forall(_ === 0L), "whole chain collapses to min label 0")
    val planChars = result.queryExecution.analyzed.toString.length
    assert(planChars < 10000,
      s"analyzed plan is $planChars chars — lineage is growing again")
  }

  test("star CC ≡ label propagation on chains, random graphs, and forests") {
    def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // deep chain — the case the O(log n) algorithm exists for
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("d1", "d2")
    val chainStar = asMap(Dedup.connectedComponentsStar(chain))
    assert(chainStar.size === 41 && chainStar.values.forall(_ === 0L))

    // seeded random graph: both algorithms must agree exactly
    val rnd = new scala.util.Random(42)
    val randomPairs = Seq.fill(80)(
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(p => p._1 != p._2).toDF("d1", "d2")
    assert(asMap(Dedup.connectedComponentsStar(randomPairs)) ===
      asMap(Dedup.connectedComponents(randomPairs)))

    // forest of disjoint components
    val forest = Seq((1L, 2L), (2L, 3L), (7L, 9L), (20L, 21L)).toDF("d1", "d2")
    assert(asMap(Dedup.connectedComponentsStar(forest)) ===
      asMap(Dedup.connectedComponents(forest)))

    // lineage discipline holds here too
    val plan = Dedup.connectedComponentsStar(chain)
      .queryExecution.analyzed.toString.length
    assert(plan < 10000, s"star CC plan is $plan chars")
  }

  test("duplicatedSpans finds maximal repeated substrings, cross- and in-doc") {
    // doc 1 and doc 2 share an 12-token passage embedded in otherwise
    // unique text; doc 3 repeats its own 10-token refrain twice; doc 4
    // is entirely unique
    val passage = (1 to 12).map(i => s"shared$i")
    val refrain = (1 to 10).map(i => s"ref$i")
    def uniq(tag: String, n: Int) = (1 to n).map(i => s"$tag$i")
    val docs = Seq(
      (1L, (uniq("a", 20) ++ passage ++ uniq("b", 15)).mkString(" ")),
      (2L, (uniq("c", 9) ++ passage ++ uniq("d", 22)).mkString(" ")),
      (3L, (refrain ++ uniq("e", 14) ++ refrain ++ uniq("f", 6)).mkString(" ")),
      (4L, uniq("g", 40).mkString(" "))
    ).toDF("doc_id", "text")
    val w = 4
    val spans = Dedup.duplicatedSpans(docs, "doc_id", "text", w)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("span_start"), r.getAs[Int]("span_end"),
          r.getAs[Int]("span_len"), r.getAs[Long]("n_windows")))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
    // doc 1: passage occupies tokens 21..32 — exactly one span
    assert(spans(1L) === Seq((21, 32, 12, 9L)))
    // doc 2: same passage at tokens 10..21
    assert(spans(2L) === Seq((10, 21, 12, 9L)))
    // doc 3: the refrain at 1..10 and again at 25..34, two spans
    assert(spans(3L) === Seq((1, 10, 10, 7L), (25, 34, 10, 7L)))
    // doc 4: no duplicated window anywhere
    assert(!spans.contains(4L))
  }

  test("duplicatedSpans ≡ naive reference on seeded random corpora") {
    // reference implementation: count every w-window string corpus-wide,
    // mark positions whose window repeats, merge by the ≤ w gap rule
    def naiveSpans(docs: Seq[(Long, String)], w: Int)
        : Map[Long, Seq[(Int, Int)]] = {
      val windows = docs.flatMap { case (id, text) =>
        val toks = text.trim.split("\\s+", -1).toSeq
        (0 to toks.length - w).map(p => (id, p, toks.slice(p, p + w).mkString(" ")))
      }
      val counts = windows.groupBy(_._3).view.mapValues(_.size).toMap
      windows.filter(x => counts(x._3) >= 2)
        .groupBy(_._1).view.mapValues { xs =>
          val ps = xs.map(_._2).sorted
          val spans = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
          for (p <- ps) {
            if (spans.nonEmpty && p <= spans.last._2 + w)
              spans(spans.size - 1) = (spans.last._1, p)
            else spans += ((p, p))
          }
          spans.map { case (mn, mx) => (mn + 1, mx + w) }.toSeq
        }.toMap
    }
    val rnd = new scala.util.Random(20260813L)
    val vocab = (1 to 30).map(i => s"v$i")
    val motif = (1 to 9).map(i => s"m$i")
    val corpus = (1L to 25L).map { id =>
      val toks = (1 to 30 + rnd.nextInt(30)).map(_ => vocab(rnd.nextInt(vocab.size)))
      // plant the shared motif into some docs at a random position
      val withMotif = if (id % 3 == 0) {
        val at = rnd.nextInt(toks.size)
        toks.take(at) ++ motif ++ toks.drop(at)
      } else toks
      (id, withMotif.mkString(" "))
    }
    val want = naiveSpans(corpus, 4)
    val got = Dedup.duplicatedSpans(corpus.toDF("doc_id", "text"),
        "doc_id", "text", 4)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Int]("span_start"), r.getAs[Int]("span_end"))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
    assert(got === want)
    assert(want.nonEmpty, "fixture must contain duplicated spans")
  }

  test("jaccardPairsPrefix ≡ jaccardPairs on seeded random corpora with planted near-dups") {
    // the prefix-filter losslessness theorem, exercised empirically:
    // identical (pair set, counts, jaccard) at three exactly-
    // representable thresholds on a corpus where near-dup pairs
    // straddle each threshold
    val rnd = new scala.util.Random(20260814L)
    val vocab = (1 to 40).map(i => s"w$i")
    val base = (1L to 20L).map { id =>
      (id, (1 to 15 + rnd.nextInt(20)).map(_ => vocab(rnd.nextInt(vocab.size))))
    }
    // plant mutated copies: replace 0–4 random tokens of a base doc
    val mutated = base.filter(_._1 % 2 == 0).map { case (id, toks) =>
      val nMut = rnd.nextInt(5)
      val arr = toks.toArray
      (0 until nMut).foreach { _ =>
        arr(rnd.nextInt(arr.length)) = vocab(rnd.nextInt(vocab.size))
      }
      (id + 100L, arr.toSeq)
    }
    val corpus = (base ++ mutated).map { case (id, toks) => (id, toks.mkString(" ")) }
      .toDF("doc_id", "text")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Long]("n_common"),
        r.getAs[Long]("n1"), r.getAs[Long]("n2"),
        math.round(r.getAs[Double]("jaccard") * 1e9))
    }.toSet
    for (tau <- Seq(0.25, 0.5, 0.75)) {
      val exhaustive = key(Dedup.jaccardPairs(corpus, "doc_id", "text", 3, tau)
        .select(col("d1"), col("d2"), col("n_common").cast("long").as("n_common"),
          col("n1").cast("long").as("n1"), col("n2").cast("long").as("n2"),
          col("jaccard")))
      val prefixed = key(Dedup.jaccardPairsPrefix(corpus, "doc_id", "text", 3, tau))
      assert(prefixed === exhaustive, s"tau=$tau")
      assert(exhaustive.nonEmpty, s"fixture must have pairs at tau=$tau")
    }
    // the point of the filter: the prefix index is materially smaller
    val (full, pref) = Dedup.prefixIndexSizes(corpus, "doc_id", "text", 3, 0.5)
    assert(pref < full, s"prefix index ($pref) must shrink vs full ($full)")
    assert(pref >= 1L)
  }

  test("simhash: identical docs at hamming 0, near-dups close, unrelated far") {
    val sh = Dedup.simhashDF(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sh(1L) === sh(4L))
    val hamming12 = java.lang.Long.bitCount(sh(1L) ^ sh(2L))
    val hamming13 = java.lang.Long.bitCount(sh(1L) ^ sh(3L))
    assert(hamming12 < hamming13)
  }

  test("qualitySurvivors keeps the best-quality doc per component, not the lowest id") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // pairs: {1,2,3} one component, {5,6} another; 9 unpaired
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("d1", "d2")
    val scored = Seq(
      (1L, 0.2, 0.9), (2L, 0.8, 0.1), (3L, 0.8, 0.5), // 3 beats 2 on dr
      (5L, 0.4, 0.0), (6L, 0.4, 0.0),                 // full tie -> id 5
      (9L, 0.1, 0.1)
    ).toDF("doc_id", "q", "dr")
    val out = Dedup.qualitySurvivors(scored, "doc_id", pairs, Seq("q", "dr"))
      .select("doc_id", "component", "n_cluster_docs", "keep", "kept_by")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4))).toMap
    // component 1 = {1,2,3}: rep is 3 (q 0.8, dr 0.5) — NOT min id 1
    assert(out(1L) === ((1L, 3L, 0, 3L)))
    assert(out(2L) === ((1L, 3L, 0, 3L)))
    assert(out(3L) === ((1L, 3L, 1, 3L)))
    // component 5 = {5,6}: full quality tie -> lowest id wins
    assert(out(5L) === ((5L, 2L, 1, 5L)))
    assert(out(6L) === ((5L, 2L, 0, 5L)))
    // unpaired doc is its own singleton component, always kept
    assert(out(9L) === ((9L, 1L, 1, 9L)))
  }

  test("simhashRecallAudit: recall is EXACTLY 1.0 for hamming <= bands-1") {
    import spark.implicits._
    // near-dup mutations + unrelated docs give a hamming spread
    val base = "the quick brown fox jumps over the lazy dog again and " +
      "again with remarkable persistence every single day"
    val docs = ((1 to 12).map(i =>
        (i.toLong, base + s" variation token$i number$i")) ++
      (13 to 24).map(i =>
        (i.toLong, s"completely different corpus line $i about " +
          s"spark partitions shuffles and catalyst optimizer rules $i")))
      .toDF("doc_id", "text")
    val audit = Dedup.simhashRecallAudit(docs, "doc_id", "text",
        n = 3, hMax = 64).collect()
    assert(audit.nonEmpty)
    // the pigeonhole bound, measured: 4 bands / hamming <= 3 -> every
    // pair is a banding candidate
    for (r <- audit if r.getAs[Int]("hamming") <= 3)
      assert(r.getAs[Long]("n_cands") === r.getAs[Long]("n_pairs"),
        s"banding missed a pair at hamming ${r.getAs[Int]("hamming")}")
    // candidate counts never exceed pair counts
    for (r <- audit)
      assert(r.getAs[Long]("n_cands") <= r.getAs[Long]("n_pairs"))
  }

  test("containmentPairs: excerpts surface where jaccard misses; maxDf prunes") {
    import spark.implicits._
    val full = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val excerpt = full.split(" ").take(8).mkString(" ") // strict prefix
    val other = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen"
    val docs = Seq((1L, full), (2L, excerpt), (3L, other))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.8)
      .collect()
    assert(pairs.length === 1)
    val r = pairs.head
    // directed: the excerpt (smaller set) is the contained side, its
    // shingles are all in the full doc (containment exactly 1.0), and
    // jaccard sits far below any symmetric dedup threshold
    assert(r.getAs[Long]("contained") === 2L)
    assert(r.getAs[Long]("container") === 1L)
    assert(r.getAs[Double]("containment") === 1.0)
    assert(r.getAs[Double]("jaccard") < 0.5)
    // the SAME corpus under jaccardPairs finds nothing — the gap the
    // operator exists for
    assert(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5).isEmpty)
    // df-pruning: every shared shingle has df = 2, so maxDf = 1 drops
    // the whole inverted index — the documented conservative-prune
    // trade (recall, not correctness)
    assert(Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.8,
      maxDf = 1).isEmpty)
    assert(Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.8,
      maxDf = 2).collect().length === 1)
  }

  test("weightedJaccardPairs: universal stop token stays bounded, scores exact") {
    // Adversarial corpus: ONE token in EVERY doc (df = 300). A naive
    // posting self-join emits C(300,2) = 44,850 pairs from that token
    // alone; the capped posting list bounds generation at C(cap,2).
    val nDocs = 300
    val tc = (0 until nDocs).flatMap { i =>
      Seq((i.toLong, "en", 0L, 3L, 2L, 999L, 2L),   // stop token, count 2
        (i.toLong, "en", 0L, 3L, 2L, 10000L + i, 1L)) // unique token
    }.toDF("doc_id", "lang", "blk", "n", "nd", "h", "c")
    val got = Dedup.weightedJaccardPairs(tc, capDf = 8).collect()
    assert(got.length === 8 * 7 / 2,
      s"expected C(8,2)=28 bounded pairs, got ${got.length}")
    // scoring stays EXACT over all tokens for surviving candidates:
    // shared tokens = {999} with min(2,2)=2
    got.foreach { r =>
      assert(r.getAs[Long]("min_sum") === 2L)
      assert(r.getAs[Long]("inter") === 1L)
    }
    // and docs beyond the first cap postings never appear
    assert(got.forall(r => r.getAs[Long]("d1") < 8 && r.getAs[Long]("d2") < 8))
  }

  test("weightedJaccardPairs: rare-token pairs unaffected by the cap") {
    // two docs sharing a rare token AND the stop token — the pair is
    // generated via the rare token even when both sit past the cap
    // window of the stop token's posting list, and min_sum counts BOTH
    val tc = ((0 until 20).flatMap { i =>
      Seq((i.toLong, "en", 0L, 4L, 3L, 999L, 1L),
        (i.toLong, "en", 0L, 4L, 3L, 5000L + i, 1L))
    } ++ Seq( // docs 100, 101: past cap=4 on token 999's posting list
      (100L, "en", 0L, 4L, 3L, 999L, 1L), (100L, "en", 0L, 4L, 3L, 777L, 3L),
      (101L, "en", 0L, 4L, 3L, 999L, 1L), (101L, "en", 0L, 4L, 3L, 777L, 3L)))
      .toDF("doc_id", "lang", "blk", "n", "nd", "h", "c")
    val got = Dedup.weightedJaccardPairs(tc, capDf = 4)
      .filter(col("d1") === 100L && col("d2") === 101L).collect()
    assert(got.length === 1, "rare-token pair was lost")
    assert(got.head.getAs[Long]("min_sum") === 4L) // min(3,3) + min(1,1)
    assert(got.head.getAs[Long]("inter") === 2L)
  }
}
