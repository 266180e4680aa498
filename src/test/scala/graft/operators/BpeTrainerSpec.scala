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
      assert(str === syms.mkString("|", "|", "").stripSuffix("|").
        ensuring(_ => true), s"word=$w") // marker form: |s1|s2...
      assert(str === "|" + syms.mkString("|"), s"word=$w")
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
}
