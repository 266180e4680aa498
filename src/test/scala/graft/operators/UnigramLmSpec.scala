package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UnigramLmSpec extends SparkSpec {

  /** Independent single-node reference: same recurrence, plain Scala
    * arrays and tuple ordering — the partitioned Catalyst fold must
    * agree segmentation-for-segmentation.
    */
  private def naive(w: String, costs: Map[String, Int],
      maxL: Int): List[String] = {
    val n = w.length
    val dp = new Array[(Int, Int, List[String])](n + 1)
    dp(0) = (0, 0, Nil)
    for (j <- 1 to n) {
      var best: (Int, Int, Int, List[String]) = null
      for (l <- 1 to math.min(maxL, j)) {
        costs.get(w.substring(j - l, j)).foreach { pc =>
          val prev = dp(j - l)
          val cand = (prev._1 + pc, prev._2 + 1, -l, prev._3 :+ w.substring(j - l, j))
          if (best == null ||
            Ordering[(Int, Int, Int)].lt((cand._1, cand._2, cand._3),
              (best._1, best._2, best._3))) best = cand
        }
      }
      dp(j) = (best._1, best._2, best._4)
    }
    dp(n)._3
  }

  test("viterbiPieces ≡ naive reference on seeded random words and vocabularies") {
    import spark.implicits._
    var lcg = 0xB5297A4D3F84D5B3L
    def next(bound: Int): Int = {
      lcg = lcg * 6364136223846793005L + 1442695040888963407L
      (((lcg >>> 33) % bound + bound) % bound).toInt
    }
    val alpha = "abc"
    for (trial <- 0 until 20) {
      // chars always present (fallback closure) + random multi pieces
      val multi = (0 until 8).map { _ =>
        val l = 2 + next(3)
        (0 until l).map(_ => alpha(next(3))).mkString
      }.distinct
      val costs = (alpha.map(_.toString) ++ multi)
        .map(p => p -> (1 + next(6))).toMap
      val words = (0 until 30).map { _ =>
        val l = 1 + next(10)
        (0 until l).map(_ => alpha(next(3))).mkString
      }.distinct
      val got = words.toDF("w").repartition(4)
        .select(col("w"),
          UnigramLm.viterbiPieces(col("w"), costs, 4).as("ps"))
        .as[(String, Seq[String])].collect().toMap
      for (w <- words) {
        val exp = naive(w, costs, 4)
        assert(got(w).toList === exp, s"trial $trial word $w")
        assert(got(w).mkString === w, s"pieces must concat to $w")
      }
    }
  }

  test("tie order: cost first, then fewer pieces, then longest last piece") {
    import spark.implicits._
    // "abab": ab|ab (cost 4, np 2) vs abab (cost 4, np 1) — np breaks
    val c1 = Map("a" -> 9, "b" -> 9, "ab" -> 2, "abab" -> 4)
    val r1 = Seq("abab").toDF("w")
      .select(UnigramLm.viterbiPieces(col("w"), c1, 4))
      .as[Seq[String]].head()
    assert(r1 === Seq("abab"))
    // "ab": a|b (cost 2, np 2) vs ab (cost 2, np 1) — np again
    val c2 = Map("a" -> 1, "b" -> 1, "ab" -> 2)
    val r2 = Seq("ab").toDF("w")
      .select(UnigramLm.viterbiPieces(col("w"), c2, 4))
      .as[Seq[String]].head()
    assert(r2 === Seq("ab"))
    // "aaa": a|aa vs aa|a — cost and np tie; longest LAST piece wins
    val c3 = Map("a" -> 1, "aa" -> 1)
    val r3 = Seq("aaa").toDF("w")
      .select(UnigramLm.viterbiPieces(col("w"), c3, 4))
      .as[Seq[String]].head()
    assert(r3 === Seq("a", "aa"))
  }

  test("train: deterministic, partitioning-invariant, closed single-char fallback") {
    import spark.implicits._
    val docs = Seq(
      "spark join hash join scan", "hash hash join batch scan scan",
      "row batch row join spark", "scan join hash row batch spark spark")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val a = UnigramLm.train(docs, "text", seedMulti = 20, keepMulti = 10)
      .collect().toSeq
    val b = UnigramLm.train(docs.repartition(7), "text",
      seedMulti = 20, keepMulti = 10).collect().toSeq
    assert(a === b, "EM must not depend on partitioning")
    val pieces = a.map(_.getString(0))
    val charsInCorpus = "sparkjoinhashscanbatchrow".toSet.map((c: Char) => c.toString)
    assert(charsInCorpus.subsetOf(pieces.toSet),
      "every corpus char stays in the vocabulary")
    assert(pieces.count(_.length > 1) <= 10, "keepMulti bound")
    assert(a.forall(_.getInt(2) >= 1), "bit costs are >= 1")
    // ordered by (n_uses DESC, piece)
    val key = a.map(r => (-r.getLong(1), r.getString(0)))
    assert(key === key.sorted)
    // multi-char pieces that survived were actually used
    assert(a.filter(_.getString(0).length > 1).forall(_.getLong(1) > 0))
  }

  test("pathological mega-words are excluded by the maxWordLen bomb guard") {
    import spark.implicits._
    // viterbiPieces carries every prefix's segmentation — O(len²)
    // pieces per word — so an adversarial "word" must never reach it
    val bomb = "x" * 100000
    val docs = Seq((0L, s"spark join $bomb hash join"),
      (1L, "hash spark join join")).toDF("doc_id", "text")
    val out = UnigramLm.train(docs, "text", seedMulti = 10, keepMulti = 5)
      .collect()
    // trains fine, and the bomb contributed nothing: 'x' never occurs
    // in any counted word, so it is not even in the char vocabulary
    assert(!out.exists(_.getString(0).contains("x")))
    assert(out.nonEmpty)
  }

  test("bitCost is floor(log2(t/c)) + 1") {
    for ((t, c, exp) <- Seq((8L, 8L, 1), (9L, 8L, 1), (16L, 8L, 2),
      (17L, 8L, 2), (1000L, 1L, 10), (1L, 1L, 1), (1023L, 512L, 1),
      (1024L, 512L, 2)))
      assert(UnigramLm.bitCost(t, c) === exp, s"t=$t c=$c")
  }
}
