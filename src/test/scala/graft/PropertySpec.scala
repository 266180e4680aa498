package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.TextFns

/** Property tests for the pure column expressions (SURVEY.md §5): the
  * native codegen expressions must agree with their higher-order-
  * function formulations on arbitrary input, and the silver
  * derivations must respect their invariants.
  *
  * Drawn from seeded ScalaCheck generators directly (the
  * scalatest-scalacheck bridge isn't in the offline cache) —
  * deterministic across runs.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sample stream from a generator. */
  private def samples[T](g: Gen[T], n: Int): Seq[T] = {
    val p = Gen.Parameters.default
    (0 until n).flatMap(i => g.apply(p, Seed(42L + i)))
  }

  private def forAll[T](g: Gen[T], n: Int = 40)(body: T => Unit): Unit =
    samples(g, n).foreach(body)

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '), 1 -> Gen.const('\t')))
      .map(_.mkString)

  test("native RollingHash ≡ HOF aggregate/transform formulation") {
    forAll(Gen.listOfN(20, asciiText)) { (texts: List[String]) =>
      whenever(texts.nonEmpty) {
        val df = texts.toDF("t")
        val hof = aggregate(
          transform(sequence(lit(1), length(col("t"))),
            i => ascii(col("t").substr(i, lit(1))).cast("long")),
          lit(0L), (h, c) => (h * lit(31L) + c) % lit(TextFns.P))
        val rows = df.select(
          TextFns.rollingHash(col("t")).as("native"), hof.as("hof")).collect()
        rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
      }
    }
  }

  test("native ShingleHashes ≡ shingle strings hashed individually") {
    forAll(Gen.zip(Gen.listOfN(10, asciiText), Gen.choose(1, 4))) {
      case (texts: List[String], n: Int) =>
      whenever(texts.nonEmpty) {
        val df = texts.toDF("t")
        val viaStrings = transform(
          TextFns.shingles(TextFns.tokens(col("t")), n),
          sh => TextFns.rollingHash(sh))
        val rows = df.select(
          TextFns.shingleHashes(col("t"), n).as("native"),
          viaStrings.as("strs")).collect()
        rows.foreach { r =>
          assert(r.getSeq[Long](0) === r.getSeq[Long](1))
        }
      }
    }
  }

  test("native graft_shingles ≡ HOF shingles∘tokens formulation") {
    val gText = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)), Gen.const(""), Gen.const("  ")))
      .map(_.mkString(" "))
    forAll(Gen.zip(gText, Gen.chooseNum(1, 4)), n = 60) { case (text, w) =>
      val df = Seq(Tuple1(text)).toDF("t")
      val native = df.select(TextFns.shinglesNative(col("t"), w))
        .collect()(0).getSeq[String](0)
      val hof = df.select(TextFns.shingles(TextFns.tokens(col("t")), w))
        .collect()(0).getSeq[String](0)
      assert(native === hof, s"text=${text.take(40)} n=$w")
    }
  }

  test("native graft_shingle_filter ≡ shingles filtered by hash membership") {
    val gText = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)), Gen.const(""), Gen.const("  ")))
      .map(_.mkString(" "))
    forAll(Gen.zip(gText, Gen.chooseNum(1, 3)), n = 40) { case (text, w) =>
      val df = Seq(Tuple1(text)).toDF("t")
      val all = df.select(TextFns.shinglesNative(col("t"), w))
        .collect()(0).getSeq[String](0)
      // candidate set = hashes of every other shingle (+ one absent)
      val cands = all.zipWithIndex.collect { case (s, i) if i % 2 == 0 =>
        graft.expressions.RollingHash.hash(s)
      }.toArray :+ -1L
      val expected = all.filter(s =>
        cands.contains(graft.expressions.RollingHash.hash(s)))
      val got = df.select(TextFns.shingleFilter(col("t"), w, cands))
        .collect()(0).getSeq[String](0)
      assert(got === expected, s"text=${text.take(40)} n=$w")
    }
  }

  test("exact-decimal moments agree with Spark's built-in skew/kurtosis") {
    val df = graft.SparkEntry.queries("q106_moments")(
      spark, "/root/testdata/sf0.001")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    for (r <- df.collect()) {
      val c = r.getAs[String]("col_name")
      val ref = li.select(
        skewness(col(c).cast("double")), kurtosis(col(c).cast("double")))
        .collect()(0)
      // built-ins accumulate running doubles (order-dependent) — agree
      // to 1e-4 relative, not bit-exact; the decimal pipeline is the
      // one that hash-matches DuckDB
      assert(math.abs(r.getAs[Double]("skewness") - ref.getDouble(0))
        <= 1e-4 * (1 + math.abs(ref.getDouble(0))), s"skew($c)")
      assert(math.abs(r.getAs[Double]("kurtosis_excess") - ref.getDouble(1))
        <= 1e-4 * (1 + math.abs(ref.getDouble(1))), s"kurt($c)")
    }
  }

  test("native graft_dot ≡ HOF zip_with/aggregate fold, bit for bit") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-10f, 10f))
    forAll(Gen.listOfN(10, Gen.zip(vecGen, vecGen))) {
      (pairs: List[(List[Float], List[Float])]) =>
      whenever(pairs.nonEmpty) {
        val df = pairs.map { case (a, b) => (a.toArray, b.toArray) }
          .toDF("a", "b")
        val hof = aggregate(
          zip_with(col("a"), col("b"),
            (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, x) => acc + x)
        df.select(graft.operators.Similarity.dot(col("a"), col("b"))
            .as("native"), hof.as("hof"))
          .collect()
          .foreach { r =>
            // bit-identical, not approximately equal
            assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
              java.lang.Double.doubleToLongBits(r.getDouble(1)))
          }
      }
    }
  }

  test("native graft_idot ≡ HOF integer fold; null/mismatch semantics") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-127L, 127L))
    forAll(Gen.listOfN(10, Gen.zip(vecGen, vecGen))) {
      (pairs: List[(List[Long], List[Long])]) =>
      whenever(pairs.nonEmpty) {
        val df = pairs.map { case (a, b) => (a.toArray, b.toArray) }
          .toDF("a", "b")
        val hof = aggregate(
          zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x)
        df.select(graft.operators.Similarity.idot(col("a"), col("b"))
            .as("native"), hof.as("hof"))
          .collect()
          .foreach(r => assert(r.getLong(0) === r.getLong(1)))
      }
    }
    // length mismatch and null arrays → null, like the HOF chain
    val edge = Seq((Array(1L, 2L), Array(1L, 2L, 3L)))
      .toDF("a", "b")
      .select(graft.operators.Similarity.idot(col("a"), col("b")).as("d"))
      .collect()
    assert(edge.head.isNullAt(0))
  }

  test("SQ8 codes are invariant under uniform positive scaling") {
    // max-abs scales make quantization scale-free: encoding 2x·v must
    // give the SAME int8 codes as encoding v (the property that lets
    // corpora with different global norms share the code path)
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-5f, 5f))
    forAll(Gen.listOfN(6, vecGen)) { (vecs: List[List[Float]]) =>
      whenever(vecs.nonEmpty) {
        def codes(mult: Float) = {
          val df = vecs.zipWithIndex
            .map { case (v, i) => (i.toLong, v.map(_ * mult).toArray) }
            .toDF("vec_id", "embedding")
          val s = graft.operators.Similarity.sqScales(df, "embedding")
          graft.operators.Similarity.sqEncode(df, "vec_id", "embedding", s)
            .collect().map(r => r.getAs[Long]("vec_id") ->
              r.getAs[Seq[Long]]("sq_code")).toMap
        }
        val base = codes(1f)
        // power-of-two multipliers are exact in float
        for (m <- Seq(2f, 64f)) assert(codes(m) === base)
      }
    }
  }

  test("PageRank conserves mass exactly on dangling-free graphs") {
    // every node has an out-edge → no mass leaks; with integer ranks
    // the total can only drift by the per-node div truncations, each
    // < outdeg ≤ n — bound it exactly
    forAll(Gen.chooseNum(3, 12)) { (n: Int) =>
      val ring = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
      val r = graft.operators.PageRank
        .run(ring.toDF("src", "dst"), "src", "dst", iters = 3)
        .collect().map(_.getAs[Long]("rank_scaled"))
      // a ring is symmetric: every node keeps exactly the unit rank
      assert(r.toSet === Set(1000000L))
    }
  }

  test("label propagation resolves disjoint cliques to their min label") {
    // in a clique, 3 synchronous rounds provably converge to the min
    // node id (round 1: min's neighbours tie → second-smallest, all
    // others → min or smaller; rounds 2-3 flood the min); disjoint
    // cliques can never exchange labels
    val cliqueSizes = Gen.listOfN(3, Gen.chooseNum(3, 6))
    forAll(Gen.zip(cliqueSizes, Gen.chooseNum(0L, 1000L)), n = 15) {
      case (sizes: List[Int], base: Long) =>
        var next = base
        val cliques = sizes.map { sz =>
          val ids = (0 until sz).map(i => next + i * 7L); next += sz * 7L + 3L
          ids
        }
        val edges = cliques.flatMap(ids =>
          for (i <- ids.indices; j <- (i + 1) until ids.size)
            yield (ids(i), ids(j)))
        val out = graft.operators.PageRank
          .labelPropagation(edges.toDF("s", "d"), "s", "d", rounds = 3)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        cliques.foreach { ids =>
          ids.foreach(id => assert(out(id) === ids.min,
            s"node $id of clique $ids"))
        }
    }
  }

  test("delay categorization is total and first-match ordered") {
    import graft.pipeline.Silver
    forAll(Gen.listOfN(50, Gen.option(Gen.chooseNum(-2000.0, 5000.0)))) {
      (delays: List[Option[Double]]) =>
      whenever(delays.nonEmpty) {
        val df = delays.toDF("DEP_DELAY_CLEAN")
          .withColumn("ARR_DELAY_CLEAN", col("DEP_DELAY_CLEAN"))
        val out = Silver.categorizeDelays(df)
          .select("DEP_DELAY_CLEAN", "DEP_DELAY_CATEGORY").collect()
        out.foreach { r =>
          val cat = r.getString(1)
          assert(graft.quality.FlightSuites.delayCategories.contains(cat))
          if (r.isNullAt(0)) assert(cat === "Unknown")
          else {
            val d = r.getDouble(0)
            val expected =
              if (d < 0) "Early" else if (d == 0) "On time"
              else if (d <= 15) "Minor" else if (d <= 60) "Moderate"
              else if (d <= 180) "Significant" else "Severe"
            assert(cat === expected)
          }
        }
      }
    }
  }

  test("sort-based exact percentiles ≡ Spark's percentile aggregate") {
    val g = Gen.listOfN(80,
      Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(-1000.0, 1000.0)))
    forAll(g, n = 20) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("k", "v")
        val ps = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
        val mine = graft.operators.Percentiles
          .groupedExact(df, "k", "v", ps, ps.map(p => s"p$p"))
          .orderBy("k").collect()
        val spk = df.groupBy("k")
          .agg(expr(s"percentile(v, array(${ps.mkString(",")}))").as("arr"))
          .orderBy("k").collect()
        mine.zip(spk).foreach { case (m, s) =>
          val arr = s.getSeq[Double](1)
          ps.indices.foreach { i =>
            assert(math.abs(m.getDouble(i + 1) - arr(i)) <=
              1e-9 * math.max(1.0, math.abs(arr(i))),
              s"k=${m.getString(0)} p=${ps(i)}")
          }
        }
      }
    }
  }

  test("rank-select percentiles ≡ Spark's percentile aggregate") {
    // duplicates on purpose (small integer grid) — boundary ranks must
    // pick consistent values under ties; parallelism swept separately
    val g = Gen.listOfN(120,
      Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.chooseNum(-20, 20)))
    forAll(g, n = 10) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("k", "i").withColumn("v", col("i").cast("double"))
        val ps = Seq(0.0, 0.1, 0.5, 0.77, 1.0)
        val mine = graft.operators.Percentiles
          .groupedExactRankSelect(df, "k",
            Seq(("v", ps, ps.map(p => s"p$p"))), numPartitions = 7)
          .orderBy("k").collect()
        val spk = df.groupBy("k")
          .agg(expr(s"percentile(v, array(${ps.mkString(",")}))").as("arr"))
          .orderBy("k").collect()
        assert(mine.map(_.getString(0)).toSeq === spk.map(_.getString(0)).toSeq)
        mine.zip(spk).foreach { case (m, s) =>
          val arr = s.getSeq[Double](1)
          ps.indices.foreach { i =>
            assert(math.abs(m.getDouble(i + 1) - arr(i)) <=
              1e-9 * math.max(1.0, math.abs(arr(i))),
              s"k=${m.getString(0)} p=${ps(i)}")
          }
        }
      }
    }
  }

  test("packing invariants hold for arbitrary corpora and bucket widths") {
    import graft.operators.TrainingPrep
    val g = Gen.zip(
      Gen.listOfN(60, Gen.chooseNum(0L, 40L)), // token counts, zeros incl.
      Gen.choose(1, 30))                       // seqLen
    forAll(g, n = 10) { case (toks, seqLen) =>
      whenever(toks.nonEmpty) {
        val df = toks.zipWithIndex
          .map { case (t, i) => (i.toLong, t) }.toDF("id", "n_tokens")
        val expectedOffsets = toks.scanLeft(0L)(_ + _).init
        for (w <- Seq(1L, 7L, 1L << 20)) {
          val offs = TrainingPrep.packOffsets(df, "id", "n_tokens", seqLen, w)
            .orderBy("id").collect()
          // offsets are the exclusive prefix sum, independent of w
          assert(offs.map(_.getAs[Long]("offset")).toSeq === expectedOffsets,
            s"w=$w seqLen=$seqLen")
          offs.foreach { r =>
            assert(r.getAs[Long]("n_seqs") ===
              r.getAs[Long]("last_seq") - r.getAs[Long]("first_seq") + 1)
          }
          val segs = TrainingPrep.packSegments(df, "id", "n_tokens", seqLen, w)
            .collect()
          // conservation: every token lands in exactly one segment
          val byDoc = segs.groupBy(_.getAs[Long]("id"))
            .view.mapValues(_.map(_.getAs[Long]("seg_len")).sum).toMap
          toks.zipWithIndex.foreach { case (t, i) =>
            assert(byDoc.getOrElse(i.toLong, 0L) === t, s"doc $i w=$w")
          }
          // every non-final sequence is exactly full
          val bySeq = segs.groupBy(_.getAs[Long]("seq_id"))
            .view.mapValues(_.map(_.getAs[Long]("seg_len")).sum).toMap
          if (bySeq.nonEmpty) {
            val lastSeq = bySeq.keys.max
            bySeq.foreach { case (sid, tot) =>
              if (sid != lastSeq) assert(tot === seqLen.toLong,
                s"seq $sid not full (w=$w)")
              else assert(tot <= seqLen.toLong)
            }
          }
        }
      }
    }
  }

  test("winsorized output is bounded, order-preserving, and count-stable") {
    val g = Gen.listOfN(60,
      Gen.zip(Gen.oneOf("a", "b"), Gen.chooseNum(-500.0, 500.0)))
    forAll(g, n = 15) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("k", "v")
        val out = graft.operators.Percentiles
          .winsorized(df, "k", "v", 0.1, 0.9, "w")
          .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
        assert(out.length === rows.length)
        // clamp bounds are real data quantiles ⇒ within each group the
        // output range is inside the input range, and clamping is
        // monotone (order of values never inverts)
        out.groupBy(_._1).foreach { case (_, grp) =>
          val vs = grp.map(_._2)
          val ws = grp.map(_._3)
          assert(ws.min >= vs.min && ws.max <= vs.max)
          grp.sortBy(_._2).map(_._3).sliding(2).foreach {
            case Array(w1, w2) => assert(w1 <= w2)
            case _ =>
          }
        }
      }
    }
  }

  test("mixtureSample: kept ⊆ input, budget respected, population cap") {
    val g = Gen.zip(
      Gen.chooseNum(50, 400), // targetTotal
      Gen.listOfN(120, Gen.zip(Gen.chooseNum(0L, 5000L), Gen.oneOf("x", "y", "z"))))
    forAll(g, n = 15) { case (total, rows) =>
      val df = rows.distinct.toDF("k", "s")
      val out = graft.operators.Sampling.mixtureSample(
        df, "k", "s", total, Map("x" -> 700, "y" -> 100), 50)
      val kept = out.select("k", "s").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(kept.subsetOf(rows.distinct.toSet))
      val pops = rows.distinct.groupBy(_._2).view.mapValues(_.size).toMap
      val budgets = Map(
        "x" -> total.toLong * 700 / 1000, "y" -> total.toLong * 100 / 1000,
        "z" -> total.toLong * 50 / 1000)
      // a stratum whose budget covers its population keeps EVERY row
      // (slot < n is a tautology); target_n reports min(budget, pop).
      // Subsampled strata land NEAR the budget (hash slots collide, so
      // the exact count wobbles) — the distributional check lives in
      // SamplingSpec; here we pin the hard guarantees only.
      val keptBy = kept.groupBy(_._2).view.mapValues(_.size).toMap
      pops.foreach { case (s, pop) =>
        if (budgets(s) >= pop) assert(keptBy.getOrElse(s, 0) === pop)
      }
      val targetN = out.select("s", "target_n").distinct().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      targetN.foreach { case (s, t) =>
        assert(t === math.min(budgets(s), pops(s).toLong))
      }
    }
  }

  test("scd2 compressHistory round-trips: runs expand back to snapshots") {
    val g = Gen.listOfN(50, Gen.zip(
      Gen.oneOf(1L, 2L, 3L), Gen.chooseNum(0L, 25L), Gen.oneOf("A", "B", "C")))
    forAll(g, n = 15) { raw =>
      // one snapshot per (key, day): keep the max value for determinism
      val rows = raw.groupBy(t => (t._1, t._2)).view
        .mapValues(_.map(_._3).max).toSeq
        .map { case ((k, d), v) => (k, d, v) }
      whenever(rows.nonEmpty) {
        val df = rows.toDF("k", "d", "v")
        val runs = graft.operators.Scd2
          .compressHistory(df, "k", "d", Seq("v"))
          .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("run_id"),
            r.getAs[Long]("effective_from"), r.getAs[Long]("effective_to"),
            r.getAs[String]("v"), r.getAs[Long]("n_snapshots")))
        // expand each run back over the key's observed days — must
        // reproduce the snapshot stream exactly
        val byKeyDays = rows.groupBy(_._1).view
          .mapValues(_.map(_._2).sorted).toMap
        val expanded = runs.flatMap { case (k, _, from, to, v, n) =>
          val days = byKeyDays(k).filter(d => d >= from && d <= to)
          assert(days.size.toLong === n)
          days.map(d => (k, d, v))
        }.toSet
        assert(expanded === rows.toSet)
        // runs per key are non-overlapping and ordered
        runs.groupBy(_._1).foreach { case (_, rs) =>
          rs.sortBy(_._3).sliding(2).foreach {
            case Array(r1, r2) =>
              assert(r1._4 < r2._3) // prev effective_to < next effective_from
              assert(r1._5 !== r2._5) // adjacent runs differ in value
            case _ =>
          }
        }
      }
    }
  }

  test("quality score stays in [0,1] for arbitrary inputs") {
    import graft.pipeline.Silver
    val g = for {
      cancelled <- Gen.oneOf(0.0, 1.0)
      airTime <- Gen.option(Gen.chooseNum(-100.0, 2000.0))
      dist <- Gen.option(Gen.chooseNum(-10.0, 30000.0))
      dep <- Gen.option(Gen.chooseNum(-500.0, 3000.0))
    } yield (cancelled, airTime, dist, dep)
    forAll(Gen.listOfN(30, g)) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("CANCELLED", "AIR_TIME", "DISTANCE", "DEP_DELAY")
          .withColumn("ARR_DELAY", col("DEP_DELAY"))
          .withColumn("DEP_TIME", lit("0900"))
          .withColumn("ARR_TIME", lit("1100"))
          .withColumn("CRS_DEP_TIME", lit("0855"))
          .withColumn("CRS_ARR_TIME", lit("1055"))
          .withColumn("DIVERTED", lit(0.0))
        val scored = (Silver.handleMissingValues _)
          .andThen(Silver.standardizeDataTypes)
          .andThen(Silver.validateBusinessRules)(df)
        assert(scored.filter(col("DATA_QUALITY_SCORE") < 0 ||
          col("DATA_QUALITY_SCORE") > 1).count() === 0L)
      }
    }
  }

  test("rendezvous: monotone under chained shard additions on random keys") {
    import graft.operators.Rendezvous
    forAll(Gen.listOfN(60, Gen.chooseNum(0L, 1000000L)), n = 6) { keys =>
      whenever(keys.nonEmpty) {
        val df = keys.distinct.toDF("k")
        val chain = (4 to 7).map(nS =>
          nS -> Rendezvous.assign(df, "k", nS)
            .select("k", "shard").collect()
            .map(r => r.getLong(0) -> r.getInt(1)).toMap)
        chain.sliding(2).foreach { case Seq((na, a), (nb, b)) =>
          a.keys.foreach { k =>
            assert(a(k) == b(k) || b(k) == nb - 1,
              s"key $k moved between OLD shards at $na->$nb")
          }
        }
      }
    }
  }

  test("bloom skip: never a false negative on random key/file layouts") {
    import graft.operators.BloomSkip
    val g = Gen.listOfN(80, Gen.zip(Gen.chooseNum(0L, 7L), Gen.chooseNum(0L, 5000L)))
    forAll(g, n = 5) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("f", "key")
        val fb = BloomSkip.fileBits(df, "f", "key", 128, 3)
        val probes = rows.map(_._2).distinct.toDF("probe")
        val pass = BloomSkip.probePass(fb, probes, 128, 3)
          .select("probe", "f").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        rows.foreach { case (f, k) =>
          assert(pass.contains((k, f)), s"false negative: key $k file $f")
        }
      }
    }
  }

  test("set cover: greedy gains are non-increasing and sum to covered mass") {
    import graft.operators.SetCover
    val g = Gen.listOfN(60, Gen.zip(Gen.chooseNum(1L, 12L),
      Gen.chooseNum(0, 30).map(i => s"f$i")))
    forAll(g, n = 5) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("id", "h")
        val picks = SetCover.greedy(spark, df, 6)
          .collect().map(r => r.getLong(2))
        picks.sliding(2).foreach {
          case Array(a, b) => assert(a >= b, "greedy gain increased")
          case _ => ()
        }
        val universe = rows.map(_._2).distinct.size
        assert(picks.sum <= universe)
      }
    }
  }
}
