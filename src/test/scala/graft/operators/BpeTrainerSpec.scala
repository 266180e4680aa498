package graft.operators

import graft.SparkSpec

class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  /** Naive single-node reference BPE (Sennrich et al. 2016 fig. 1):
    * word-freq dict of char lists; per round count adjacent pairs,
    * merge the (count, left, right)-max pair greedily left-to-right.
    */
  private def naiveBpe(texts: Seq[String], nMerges: Int,
      minCount: Long): Seq[(Int, String, String, String, Long)] = {
    var words: Map[Vector[String], Long] = texts
      .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, f) => w.map(_.toString).toVector -> f }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var i = 1
    var done = false
    while (i <= nMerges && !done) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      for ((syms, f) <- words; j <- 0 until syms.length - 1)
        counts((syms(j), syms(j + 1))) =
          counts.getOrElse((syms(j), syms(j + 1)), 0L) + f
      val best = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some(((a, b), c)) if c >= minCount =>
          out += ((i, a, b, a + b, c))
          words = words.map { case (syms, f) =>
            val nb = scala.collection.mutable.ArrayBuffer.empty[String]
            syms.foreach { s =>
              if (nb.nonEmpty && nb.last == a && s == b)
                nb(nb.length - 1) = a + b
              else nb += s
            }
            nb.toVector -> f
          }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
          i += 1
        case _ => done = true
      }
    }
    out.toSeq
  }

  private val corpus = Seq(
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new")

  test("train equals the naive reference BPE, merge for merge") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = BpeTrainer.train(docs, "text", nMerges = 12, minCount = 2L)
      .collect()
      .map(r => (r.getAs[Int]("merge_idx"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[String]("merged"),
        r.getAs[Long]("pair_count"))).toSeq
    val want = naiveBpe(corpus, nMerges = 12, minCount = 2L)
    assert(got === want)
    // sanity: the classic toy corpus learns multi-char subwords
    assert(got.exists(_._4.length >= 3))
  }

  test("train is deterministic across partitionings") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val a = BpeTrainer.train(docs, "text", 8).collect().map(_.toSeq).toSeq
    val b = BpeTrainer.train(docs.repartition(5), "text", 8)
      .collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("train stops early when no pair clears minCount") {
    val docs = Seq((1L, "ab cd ef")).toDF("doc_id", "text")
    // every word unique, every pair count 1 < minCount=2
    val out = BpeTrainer.train(docs, "text", nMerges = 5).collect()
    assert(out.isEmpty)
  }

  test("string-replace APPLY reproduces the trainer's fold segmentation") {
    import org.apache.spark.sql.functions._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = BpeTrainer.train(docs, "text", nMerges = 10, minCount = 2L)
      .collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
    assert(merges.nonEmpty)
    // per distinct word: chars -> chained mergePair folds (the
    // trainer's own semantics) vs the marker-string replace chain
    val words = docs
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
      .distinct()
    val viaFold = merges.foldLeft(
        words.select(col("w"), split(col("w"), "").as("syms"))) {
        case (df, (a, b)) =>
          df.select(col("w"), BpeTrainer.mergePair(col("syms"), a, b).as("syms"))
      }
      .collect().map(r => r.getAs[String]("w") ->
        r.getAs[scala.collection.Seq[String]]("syms").toSeq).toMap
    val viaReplace = words
      .select(col("w"),
        BpeTrainer.bpeSymbolString(col("w"), merges).as("s"),
        BpeTrainer.bpeTokenCount(col("w"), merges).as("n"))
      .collect().map(r => r.getAs[String]("w") ->
        (r.getAs[String]("s"), r.getAs[Long]("n"))).toMap
    for ((w, syms) <- viaFold) {
      val (str, n) = viaReplace(w)
      // marker form |s1|s2|...|sn| — terminated, so a merge pattern
      // can never prefix-match inside a longer symbol
      assert(str === syms.mkString("|", "|", "|"), s"word=$w")
      assert(n === syms.length.toLong, s"word=$w")
    }
    // whole-document application == sum over its words (merges never
    // cross the space boundary)
    val perDoc = docs.select(col("doc_id"),
        BpeTrainer.bpeTokenCount(col("text"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = corpus.zipWithIndex.map { case (t, i) =>
      i.toLong -> t.trim.split("\\s+").filter(_.nonEmpty)
        .map(w => viaFold(w).length.toLong).sum
    }.toMap
    assert(perDoc === expected)
  }

  test("merge patterns never prefix-match inside a longer symbol") {
    import org.apache.spark.sql.functions._
    // "distant" under demoMerges: (t,a) fires first → symbol "ta";
    // when (s,t)'s turn comes, s is followed by "ta", NOT "t" — the
    // fold compares full symbols, so no merge. The pre-round-10
    // leading-marker encoding matched "|s|t" as a prefix of "|s|ta"
    // and corrupted the segmentation to d,i,sta,n,t.
    val out = Seq((1L, "distant")).toDF("doc_id", "text")
      .select(BpeTrainer.bpeSymbolString(col("text"),
        BpeTrainer.demoMerges)).head.getString(0)
    assert(out === "|d|i|s|ta|n|t|")
  }

  test("vocab ids: chars first (sorted), merge ranks after; encode round-trips") {
    import org.apache.spark.sql.functions._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = BpeTrainer.demoMerges
    val vocab = BpeTrainer.vocabTable(docs, "text", merges)
    val rows = vocab.collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("id")).toMap
    // base chars = the corpus' distinct non-space chars, ids 0..B-1 in
    // sorted order; merge products follow at B+rank
    val chars = corpus.mkString.replaceAll("\\s+", "").distinct.sorted
    chars.zipWithIndex.foreach { case (c, i) =>
      assert(rows(c.toString) === i.toLong, s"char $c")
    }
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      assert(rows(a + b) === chars.length + i.toLong, s"merge $a+$b")
    }
    assert(rows.size === chars.length + merges.size)

    // encode → decode round-trips the whitespace-scrubbed corpus, and
    // ids re-tokenize consistently under any partitioning
    val enc = BpeTrainer.bpeEncodeIds(docs, "doc_id", "text", merges, vocab)
    val detok = BpeTrainer.bpeDecodeIds(enc, "doc_id", vocab)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    corpus.zipWithIndex.foreach { case (t, i) =>
      assert(detok(i.toLong) === t.replaceAll("\\s+", ""), s"doc $i")
    }
    val encRepart = BpeTrainer.bpeEncodeIds(docs.repartition(7), "doc_id",
      "text", merges, vocab)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(asMap(enc) === asMap(encRepart))
    // every id array length equals the replace-chain token count
    val counts = docs.select(col("doc_id"),
        BpeTrainer.bpeTokenCount(col("text"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    asMap(enc).foreach { case (d, ids) =>
      assert(ids.length.toLong === counts(d), s"doc $d")
    }
  }
}
