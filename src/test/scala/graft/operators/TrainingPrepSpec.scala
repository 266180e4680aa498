package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TrainingPrepSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------------
  // contaminationReport
  // ------------------------------------------------------------------

  private lazy val contamDocs = Seq(
    (1L, "the quick brown fox jumps", false),
    (2L, "lazy dogs sleep all day", false),
    (3L, "the quick brown fox naps", true) // eval doc
  ).toDF("doc_id", "text", "is_eval")

  test("contaminationReport counts eval shingle overlap per train doc") {
    val rep = TrainingPrep.contaminationReport(
        contamDocs, "doc_id", "text", n = 3, isEval = col("is_eval"))
      .orderBy("doc_id").collect()
    // doc1 shares 2 of its 3 trigrams with the eval doc; doc2 shares
    // none and must be OMITTED (caller anti-joins on the report)
    assert(rep.length === 1)
    val r = rep.head
    assert(r.getAs[Long]("doc_id") === 1L)
    assert(r.getAs[Int]("n_shingles") === 3)
    assert(r.getAs[Long]("n_overlap") === 2L)
    assert(math.abs(r.getAs[Double]("contamination_ratio") - 2.0 / 3) < 1e-12)
  }

  test("contaminationReport counts distinct shingles once") {
    // train doc repeats the contaminated trigram; distinct semantics
    // must count it once in both n_shingles and n_overlap
    val docs = Seq(
      (1L, "a b c a b c", false), // trigrams: abc bca cab abc -> 3 distinct
      (2L, "a b c", true)
    ).toDF("doc_id", "text", "is_eval")
    val r = TrainingPrep.contaminationReport(
      docs, "doc_id", "text", n = 3, isEval = col("is_eval")).collect().head
    assert(r.getAs[Int]("n_shingles") === 3)
    assert(r.getAs[Long]("n_overlap") === 1L)
  }

  // ------------------------------------------------------------------
  // repetitionStats
  // ------------------------------------------------------------------

  test("bloomContamination: every train doc reported, no false negatives") {
    val out = TrainingPrep.bloomContamination(
        contamDocs, "doc_id", "text", n = 3, isEval = col("is_eval"),
        fpp = 0.001)
      .orderBy("doc_id").collect()
    // unlike contaminationReport, CLEAN docs appear too (n_exact = 0)
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L))
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_bloom"),
        r.getAs[Long]("n_exact"))).toMap
    assert(byId(1L)._3 === 2L) // same exact overlap as contaminationReport
    assert(byId(2L)._3 === 0L)
    // the sketch contract on a larger corpus: bloom hits ⊇ exact hits
    // per doc, and false-positive excess stays near fpp per shingle
    val big = (0L until 400L).map { i =>
      val words =
        if (i % 10 == 0) (0 until 20).map(j => s"eval${i}w$j") // eval
        else if (i % 10 == 1) (0 until 20).map(j => s"eval${i - 1}w$j") // copy of prior eval
        else (0 until 20).map(j => s"doc${i}w$j") // disjoint vocab
      (i, words.mkString(" "), i % 10 == 0)
    }.toDF("doc_id", "text", "is_eval")
    val rep = TrainingPrep.bloomContamination(
        big, "doc_id", "text", n = 3, isEval = col("is_eval"), fpp = 0.001)
      .collect()
    assert(rep.length === 360) // every non-eval doc
    rep.foreach { r =>
      val (ns, nb, ne) = (r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_bloom"), r.getAs[Long]("n_exact"))
      assert(nb >= ne, s"false negative on doc ${r.getLong(0)}")
      assert(nb - ne <= math.max(3L, ns / 20),
        s"fp excess ${nb - ne} of $ns shingles on doc ${r.getLong(0)}")
    }
    // the copies of eval docs are fully contaminated; disjoint docs are
    // exactly clean
    val byMod = rep.groupBy(_.getAs[Long]("doc_id") % 10 == 1)
    assert(byMod(true).forall(r =>
      r.getAs[Long]("n_exact") === r.getAs[Long]("n_shingles")))
    assert(byMod(false).forall(_.getAs[Long]("n_exact") === 0L))
  }

  test("cdcChunks: exact cover + content-defined boundary stability") {
    // deterministic pseudo-random token streams; doc 2 = doc 1 plus an
    // appended suffix, doc 3 = same suffix after a DIFFERENT prefix
    val baseToks = (1 to 300).map(i => s"t${(i * 7919) % 997}")
    val suffix = (1 to 120).map(i => s"s${(i * 104729) % 1009}")
    val docs = Seq(
      (1L, baseToks.mkString(" ")),
      (2L, (baseToks ++ suffix).mkString(" ")),
      (3L, ((1 to 250).map(i => s"u${(i * 31) % 983}") ++ suffix)
        .mkString(" "))
    ).toDF("doc_id", "text")
    val out = TrainingPrep.cdcChunks(docs, "doc_id", "text", w = 4,
      divisor = 16)
    val chunks = out.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_idx"),
        r.getAs[Int]("chunk_start"), r.getAs[Int]("chunk_end"),
        r.getAs[Int]("chunk_len"), r.getAs[String]("chunk_hash")))
      .groupBy(_._1).map { case (id, cs) => id -> cs.sortBy(_._2).toSeq }

    // exact cover: chunks tile 1..n_tokens with no gaps or overlaps
    for ((id, cs) <- chunks) {
      assert(cs.head._3 === 1, s"doc $id first chunk must start at 1")
      cs.sliding(2).foreach {
        case Seq(a, b) => assert(b._3 === a._4 + 1, s"doc $id gap at $b")
        case _ =>
      }
      assert(cs.forall(c => c._5 === c._4 - c._3 + 1))
    }
    assert(chunks(1L).last._4 === 300)
    assert(chunks(2L).last._4 === 420)

    // content locality 1: every chunk of doc 1 except its FINAL
    // (end-of-doc-forced) one appears in doc 2 with identical span+hash
    val d2 = chunks(2L).map(c => (c._3, c._4, c._6)).toSet
    chunks(1L).init.foreach { c =>
      assert(d2.contains((c._3, c._4, c._6)),
        s"prefix chunk $c not preserved after append")
    }
    // content locality 2: the shared SUFFIX yields identical chunk
    // hashes in docs 2 and 3 despite different prefixes (positions
    // shift; hashes — the dedup key — agree). Skip each doc's first
    // suffix chunk (straddles the splice) and last (end-forced).
    def suffixHashes(id: Long, prefixLen: Int) =
      chunks(id).filter(_._3 > prefixLen + 4).init.map(_._6)
    val s2 = suffixHashes(2L, 300)
    val s3 = suffixHashes(3L, 250)
    assert(s2.nonEmpty, "suffix must produce interior chunks")
    assert(s2.toSet.subsetOf(s3.toSet) || s3.toSet.subsetOf(s2.toSet),
      s"shared suffix chunks diverged: $s2 vs $s3")
  }

  test("cdcChunks edge cases: null / empty / all-space / shorter-than-w text") {
    val docs = Seq(
      (1L, Option("alpha beta")), // n_tokens=2 < w: one end-forced chunk
      (2L, None: Option[String]), // null text: no rows (explode skips null)
      (3L, Option("")), // Spark split("") = [""]: one empty-token chunk
      (4L, Option("   ")) // trim → "": same single-empty-token shape
    ).toDF("doc_id", "text")
    val out = TrainingPrep.cdcChunks(docs, "doc_id", "text", w = 4, divisor = 8)
      .collect().groupBy(_.getAs[Long]("doc_id"))
    assert(!out.contains(2L), "null text must produce no chunk rows")
    val d1 = out(1L)
    assert(d1.length === 1 && d1.head.getAs[Int]("chunk_start") === 1 &&
      d1.head.getAs[Int]("chunk_end") === 2 &&
      d1.head.getAs[Int]("n_tokens") === 2)
    // docs 3 and 4 both tokenize to [""]: identical single chunks whose
    // hash is md5("") — pins the trim/split parity with the oracle
    for (id <- Seq(3L, 4L)) {
      val d = out(id)
      assert(d.length === 1 && d.head.getAs[Int]("chunk_len") === 1)
      assert(d.head.getAs[String]("chunk_hash") ===
        "d41d8cd98f00b204e9800998ecf8427e")
    }
  }

  test("bloomContamination tolerates null text and non-long id types") {
    val docs = Seq(
      ("a", Option("the quick brown fox jumps")),
      ("b", None: Option[String]), // null text: report (0, 0), not NPE
      ("e", Option("the quick brown fox naps"))
    ).toDF("doc_id", "text").withColumn("is_eval", col("doc_id") === "e")
    val out = TrainingPrep.bloomContamination(
        docs, "doc_id", "text", n = 3, isEval = col("is_eval"), fpp = 0.01)
      .orderBy("doc_id").collect()
    // string ids pass through with their own type
    assert(out.map(_.getString(0)).toSeq === Seq("a", "b"))
    val b = out.find(_.getString(0) == "b").get
    assert(b.getAs[Long]("n_shingles") === 0L)
    assert(b.getAs[Long]("n_bloom") === 0L)
    assert(b.getAs[Long]("n_exact") === 0L)
    val a = out.find(_.getString(0) == "a").get
    assert(a.getAs[Long]("n_exact") === 2L) // same overlap as contamDocs
  }

  test("repetitionStats computes dup fractions and top-2gram occupancy") {
    val docs = Seq((1L, "a a a b"), (2L, "x")).toDF("doc_id", "text")
    val st = TrainingPrep.repetitionStats(docs, "doc_id", "text", Seq(2, 3))
      .orderBy("doc_id").collect()

    val d1 = st(0)
    assert(d1.getAs[Int]("n_tokens") === 4)
    // 2-grams: "a a","a a","a b" -> 1 duplicate occurrence of 3
    assert(math.abs(d1.getAs[Double]("dup_2gram_frac") - 1.0 / 3) < 1e-12)
    // 3-grams: "a a a","a a b" -> all distinct
    assert(d1.getAs[Double]("dup_3gram_frac") === 0.0)
    assert(d1.getAs[Long]("top_2gram_count") === 2L)
    assert(math.abs(d1.getAs[Double]("top_2gram_frac") - 2.0 / 3) < 1e-12)

    // single-token doc: no 2-grams at all -> zeros, not nulls/NaN
    val d2 = st(1)
    assert(d2.getAs[Int]("n_tokens") === 1)
    assert(d2.getAs[Double]("dup_2gram_frac") === 0.0)
    assert(d2.getAs[Long]("top_2gram_count") === 0L)
    assert(d2.getAs[Double]("top_2gram_frac") === 0.0)
  }

  // ------------------------------------------------------------------
  // packOffsets
  // ------------------------------------------------------------------

  private lazy val packDocs =
    Seq((1L, 4L), (2L, 8L), (3L, 3L), (4L, 10L), (5L, 0L))
      .toDF("doc_id", "n_tokens")

  test("packOffsets: exclusive prefix sums and sequence spans") {
    val got = TrainingPrep.packOffsets(packDocs, "doc_id", "n_tokens",
        seqLen = 10, bucketWidth = 2)
      .select("doc_id", "offset", "first_seq", "last_seq", "n_seqs")
      .orderBy("doc_id").collect().map(_.toSeq.map(_.asInstanceOf[Long]))
    val want = Seq(
      Seq(1L, 0L, 0L, 0L, 1L),   // tokens 0..3   -> seq 0
      Seq(2L, 4L, 0L, 1L, 2L),   // tokens 4..11  -> spans seqs 0-1
      Seq(3L, 12L, 1L, 1L, 1L),  // tokens 12..14 -> seq 1
      Seq(4L, 15L, 1L, 2L, 2L),  // tokens 15..24 -> spans seqs 1-2
      Seq(5L, 25L, 2L, 2L, 1L))  // empty doc: lands at its offset's seq
    assert(got.toSeq === want)
  }

  test("packOffsets is independent of bucketWidth (parallelism knob only)") {
    def offsets(w: Long) =
      TrainingPrep.packOffsets(packDocs, "doc_id", "n_tokens",
          seqLen = 10, bucketWidth = w)
        .select("doc_id", "offset", "first_seq", "last_seq", "n_seqs")
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val base = offsets(1L << 20) // single bucket: plain window semantics
    assert(offsets(1L) === base)
    assert(offsets(3L) === base)
  }

  test("packSegments: doc token conservation and full sequences") {
    val segs = TrainingPrep.packSegments(packDocs, "doc_id", "n_tokens",
        seqLen = 10, bucketWidth = 2)
      .select("doc_id", "seq_id", "seg_start", "seg_len")
      .orderBy("doc_id", "seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // exact segment map for offsets 0,4,12,15,25 at seqLen 10
    val want = Seq(
      (1L, 0L, 0L, 4L),            // doc1 tokens 0..3   -> seq 0
      (2L, 0L, 0L, 6L),            // doc2 first 6 tokens fill seq 0
      (2L, 1L, 6L, 2L),            // ...last 2 spill into seq 1
      (3L, 1L, 0L, 3L),            // doc3 inside seq 1
      (4L, 1L, 0L, 5L),            // doc4 fills the rest of seq 1
      (4L, 2L, 5L, 5L),            // ...and half of seq 2
      (5L, 2L, 0L, 0L))            // empty doc: position, no tokens
    assert(segs.toSeq === want)

    // invariants: per-doc conservation; every non-final seq holds
    // exactly seqLen tokens
    val byDoc = segs.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(byDoc === Map(1L -> 4L, 2L -> 8L, 3L -> 3L, 4L -> 10L, 5L -> 0L))
    val bySeq = segs.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    assert(bySeq(0L) === 10L && bySeq(1L) === 10L)
    assert(bySeq(2L) === 5L) // final partial sequence
  }

  // ------------------------------------------------------------------
  // quantizeStats
  // ------------------------------------------------------------------

  test("chunkSpans: coverage, overlap, and tail-merge invariants") {
    // docs of 1, 5 (=chunk), 6, 13, 14 tokens; chunk=5, overlap=2
    val docs = Seq(1, 5, 6, 13, 14).zipWithIndex.map { case (n, i) =>
      (i.toLong, (1 to n).map(t => s"t$t").mkString(" "))
    }.toDF("doc_id", "text")
    val out = TrainingPrep.chunkSpans(docs, "text", chunk = 5, overlap = 2)
      .select("doc_id", "n_tokens", "chunk_idx", "chunk_start", "chunk_end",
        "chunk_len")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._3)).toMap
    out.foreach { case (_, chunks) =>
      val n = chunks.head._2
      // first chunk starts at 1; last chunk ends exactly at n
      assert(chunks.head._4 === 1L)
      assert(chunks.last._5 === n)
      // every token position is covered by some chunk
      val covered = chunks.flatMap(c => c._4 to c._5).toSet
      assert(covered === (1L to n).toSet)
      // consecutive chunks overlap by >= the configured overlap, and
      // full-length docs get full-width windows (no pure-overlap tail)
      chunks.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 - b._4 + 1 >= 2, s"overlap too small: $a -> $b")
          assert(b._4 > a._4) // strictly advancing
        case _ =>
      }
      if (n >= 5) assert(chunks.forall(_._6 === 5L)) // all full-width
    }
    // 13 tokens, stride 3: chunks at 1..5, 4..8, 7..11, 9..13 (clamped)
    assert(out(3L).map(c => (c._4, c._5)) ===
      Seq((1L, 5L), (4L, 8L), (7L, 11L), (9L, 13L)))
    // 1-token doc: a single [1,1] chunk
    assert(out(0L).map(c => (c._4, c._5)) === Seq((1L, 1L)))
  }

  test("quantizeStats: symmetric int8 with exact integer checks") {
    val vec = Seq(1.27f, -2.54f, 0.0f)
    val df = Seq((1L, vec)).toDF("vec_id", "embedding")
    val r = TrainingPrep.quantizeStats(df, "embedding").collect().head

    // recompute with the operator's exact double arithmetic
    val xs = vec.map(_.toDouble)
    val scale = xs.map(math.abs).max / 127.0
    val qs = xs.map(x => math.floor(x / scale + 0.5))
    val mse = xs.map(x => math.pow(x - qs(xs.indexOf(x)) * scale, 2)).sum / xs.size

    assert(r.getAs[Double]("scale") === scale)
    assert(r.getAs[Long]("q_min") === qs.min.toLong)
    assert(r.getAs[Long]("q_max") === qs.max.toLong)
    assert(r.getAs[Long]("q_sum") === qs.sum.toLong)
    assert(math.abs(r.getAs[Double]("mse") - mse) < 1e-15)
    // symmetric int8 range is respected
    assert(qs.min >= -127 && qs.max <= 127)
  }

  test("quantizeStats: zero vector quantizes to all-zero with scale 0") {
    val df = Seq((1L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = TrainingPrep.quantizeStats(df, "embedding").collect().head
    assert(r.getAs[Double]("scale") === 0.0)
    assert(r.getAs[Long]("q_min") === 0L)
    assert(r.getAs[Long]("q_max") === 0L)
    assert(r.getAs[Long]("q_sum") === 0L)
    assert(r.getAs[Double]("mse") === 0.0)
  }

  // ------------------------------------------------------------------
  // shuffleOrder / epochAllocation
  // ------------------------------------------------------------------

  test("shuffleOrder: deterministic total permutation, seed-sensitive") {
    val docs = (1L to 500L).toDF("doc_id")
    def order(seed: Long) =
      TrainingPrep.shuffleOrder(docs, "doc_id", seed, numShards = 4)
        .select("doc_id", "shard", "pos").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))

    val a = order(42L)
    // every doc appears exactly once; within each shard positions are
    // exactly 1..count (a proper permutation, no gaps or ties)
    assert(a.map(_._1).toSet.size === 500)
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
    }
    // re-running with the same seed reproduces the epoch order exactly
    assert(order(42L).sortBy(_._1).toSeq === a.sortBy(_._1).toSeq)
    // a different seed is a different permutation (the affine mix is a
    // bijection, so ANY difference implies many)
    val b = order(43L)
    assert(a.sortBy(_._1).toSeq !== b.sortBy(_._1).toSeq)
    // shards are roughly balanced: affine-permuted keys spread evenly
    val sizes = a.groupBy(_._2).values.map(_.length)
    assert(sizes.min > 500 / 4 / 2, s"shard sizes $sizes badly skewed")
  }

  test("epochAllocation: floor+remainder repeats hit the token budget") {
    val docs = (1L to 300L).map { i =>
      val src = if (i <= 200) "web" else "books"
      (i, src, 10L + i % 7) // varying doc lengths
    }.toDF("doc_id", "source", "n_tokens")
    val tokens = docs.groupBy("source").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // books up-samples ~3x, web down-samples to floor 0 + remainder
    val budgets = Seq(
      ("books", tokens("books") * 3 + 37L),
      ("web", tokens("web") / 2)
    ).toDF("source", "token_budget")
    val out = TrainingPrep.epochAllocation(
        docs, "doc_id", "source", "n_tokens", budgets, seed = 7L)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("repeat_floor"),
        r.getAs[Int]("extra"), r.getAs[Long]("n_repeats")))

    assert(out.length === 300) // every doc gets a decision
    out.foreach { case (_, src, _, rf, ex, nr) =>
      assert(ex === 0 || ex === 1)
      assert(nr === rf + ex)
      assert(rf === (if (src == "books") 3L else 0L))
    }
    // allocated token mass lands near the budget for BOTH regimes: the
    // floor part is exact, the hash-selected remainder is a Bernoulli
    // sum with mean rem — allow 4 sigma (p(1-p) ≤ 1/4 per token unit)
    for ((src, budget) <- Seq(
        ("books", tokens("books") * 3 + 37L), ("web", tokens("web") / 2))) {
      val alloc = out.filter(_._2 == src).map(x => x._3 * x._6).sum
      val srcDocs = out.count(_._2 == src)
      val maxDoc = out.filter(_._2 == src).map(_._3).max
      val sigma = maxDoc * math.sqrt(srcDocs.toDouble) / 2
      assert(math.abs(alloc - budget) <= 4 * sigma,
        s"$src allocated $alloc vs budget $budget (4sigma=${4 * sigma})")
    }
    // a source with no budget row is dropped from the epoch entirely
    val noBudget = TrainingPrep.epochAllocation(
        docs, "doc_id", "source", "n_tokens",
        Seq(("books", 100L)).toDF("source", "token_budget"), seed = 7L)
      .filter(col("source") === "web").collect()
    assert(noBudget.forall(_.getAs[Long]("n_repeats") === 0L))
  }

  // ------------------------------------------------------------------
  // ngramNovelty
  // ------------------------------------------------------------------

  test("ngramNovelty: seen-before fractions under corpus order") {
    val docs = Seq(
      (1L, "a b c d"),        // bigrams ab bc cd — all first
      (2L, "a b c d"),        // exact dup of 1 — novelty 0
      (3L, "c d e f"),        // cd seen (doc1), de ef new — 2/3 novel
      (4L, "x y")             // xy new — fully novel
    ).toDF("doc_id", "text")
    val out = TrainingPrep.ngramNovelty(docs, "doc_id", "text", n = 2)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_seen"),
          r.getAs[Double]("novelty"))).toMap
    assert(out(1L) === ((3L, 0L, 1.0)))
    assert(out(2L) === ((3L, 3L, 0.0)))
    assert(out(3L)._1 === 3L)
    assert(out(3L)._2 === 1L)
    assert(math.abs(out(3L)._3 - 2.0 / 3) < 1e-6)
    assert(out(4L) === ((1L, 0L, 1.0)))
  }

  test("ngramNovelty: repeated shingles within one doc count once") {
    val docs = Seq(
      (1L, "a b a b a b"), // bigrams ab ba ab ba ab -> distinct {ab, ba}
      (2L, "a b")          // ab seen in doc1
    ).toDF("doc_id", "text")
    val out = TrainingPrep.ngramNovelty(docs, "doc_id", "text", n = 2)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_seen"))).toMap
    assert(out(1L) === ((2L, 0L)))
    assert(out(2L) === ((1L, 1L)))
  }

  // ------------------------------------------------------------------
  // waterfill
  // ------------------------------------------------------------------

  private def runWaterfill(sizes: Seq[(String, Long)], num: Long,
      den: Long): Map[String, (Long, Boolean)] =
    TrainingPrep.waterfill(sizes.toDF("src", "n"), "src", "n", num, den)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(3))))
      .toMap

  test("waterfill: small sources take all, capped split level exactly") {
    // total 3030, budget 1/2 = 1515; a(10) and b(20) fit under their
    // candidate levels and take everything; the 1485 left splits over
    // {c, d} as level 742 + remainder 1 to the first capped key
    val out = runWaterfill(
      Seq(("a", 10L), ("b", 20L), ("c", 1000L), ("d", 2000L)), 1L, 2L)
    assert(out("a") === ((10L, true)))
    assert(out("b") === ((20L, true)))
    assert(out("c") === ((743L, false)))
    assert(out("d") === ((742L, false)))
    assert(out.values.map(_._1).sum === 1515L)
  }

  test("waterfill: budget >= total means everyone takes all") {
    val out = runWaterfill(Seq(("a", 5L), ("b", 7L), ("c", 100L)), 1L, 1L)
    assert(out.values.forall(_._2 === true))
    assert(out.values.map(_._1).sum === 112L)
  }

  test("apportion: exact budget, within-1 proportionality, largest remainder first") {
    val sizes = Seq(("a", 7L), ("b", 13L), ("c", 101L), ("d", 379L),
      ("e", 500L))
    val total = sizes.map(_._2).sum
    for ((num, den) <- Seq((1L, 10L), (1L, 3L), (2L, 5L))) {
      val b = total * num / den
      val out = TrainingPrep.apportion(sizes.toDF("src", "n"), "src",
          "n", num, den)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(out.values.sum === b, s"budget $num/$den not hit exactly")
      sizes.foreach { case (k, n) =>
        val exactShare = b.toDouble * n / total
        assert(out(k) >= math.floor(exactShare).toLong &&
          out(k) <= math.ceil(exactShare).toLong,
          s"$k allocation ${out(k)} not within 1 of $exactShare")
      }
    }
  }

  test("waterfill hits the budget exactly on skewed randomized sizes") {
    val sizes = (0 until 17)
      .map(i => (s"s$i", ((i * 2654435761L) % 997L) * (i % 5 + 1) + 1L))
    for ((num, den) <- Seq((1L, 3L), (3L, 5L), (9L, 10L))) {
      val out = runWaterfill(sizes, num, den)
      val total = sizes.map(_._2).sum
      val capped = out.values.filter(!_._2)
      if (capped.nonEmpty)
        assert(out.values.map(_._1).sum === total * num / den,
          s"budget $num/$den not hit exactly")
      out.foreach { case (k, (alloc, takesAll)) =>
        val sz = sizes.toMap.apply(k)
        assert(alloc <= sz, s"$k over-allocated")
        if (takesAll) assert(alloc === sz)
      }
      // fairness: no capped source may end below another's allocation
      // by more than the +1 remainder step
      if (capped.nonEmpty) {
        val allocs = capped.map(_._1)
        assert(allocs.max - allocs.min <= 1L, "uneven water level")
      }
    }
  }

  test("shardManifest: whole docs, contiguous ranges, sizes within one doc of target") {
    val rnd = new scala.util.Random(7L)
    val docs = (1L to 200L).map(id => (id, 50L + rnd.nextInt(900)))
      .toDF("doc_id", "n_b")
    val target = 4096
    val m = TrainingPrep.shardManifest(docs, "doc_id", "n_b", target)
      .orderBy("shard").collect()
    val totalBytes = docs.agg(sum("n_b")).head().getLong(0)
    val maxDoc = docs.agg(max("n_b")).head().getLong(0)
    // conservation: every doc in exactly one shard, all bytes accounted
    assert(m.map(_.getAs[Long]("n_docs")).sum === 200L)
    assert(m.map(_.getAs[Long]("n_bytes")).sum === totalBytes)
    // contiguity in publishing order: ranges tile [1, 200] in order
    val ranges = m.map(r => (r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc")))
    assert(ranges.head._1 === 1L && ranges.last._2 === 200L)
    ranges.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(lo2 === hi + 1, "shard doc ranges must tile without gap/overlap")
    }
    // the floor(prefix/target) policy bounds every shard's size by one
    // doc around the target (the final shard only from below has no
    // lower bound)
    m.init.foreach { r =>
      val nb = r.getAs[Long]("n_bytes")
      assert(nb > target - maxDoc && nb < target + maxDoc,
        s"shard ${r.getAs[Long]("shard")} size $nb strays beyond ±maxDoc")
    }
    // shard id = floor(exclusive prefix / target), recomputed naively
    val sizes = docs.orderBy("doc_id").collect().map(_.getLong(1))
    val naive = sizes.scanLeft(0L)(_ + _).init.map(_ / target)
    val wantDocs = naive.groupBy(identity).view.mapValues(_.length.toLong).toMap
    m.foreach { r =>
      assert(r.getAs[Long]("n_docs") === wantDocs(r.getAs[Long]("shard")))
    }
  }
}
