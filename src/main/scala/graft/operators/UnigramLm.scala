package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Unigram-LM (SentencePiece-style) subword tokenizer — the THIRD
  * tokenizer family next to BPE merge-order application
  * ([[BpeTrainer]]) and WordPiece greedy longest-match
  * ([[WordPiece]]): pieces carry a LANGUAGE-MODEL cost and a word's
  * segmentation is the lattice path minimizing total cost (Kudo 2018,
  * "Subword Regularization" §3), trained by EM over the corpus.
  *
  * Deterministic engine variant (the q183-perceptron discipline —
  * zero floats in the model):
  *   - HARD EM (Viterbi-EM): the E-step takes the single best
  *     segmentation per word instead of forward–backward expected
  *     counts, so piece counts are exact integers.
  *   - Integer bit costs: a piece with count c out of total T costs
  *     `bitLength(T div c)` bits — the exact integer
  *     `floor(log2(T/c)) + 1` (floor(log2(T/c)) = floor(log2(T div
  *     c)) for T >= c, because floor(T/c) >= 2^q iff T >= c*2^q), a
  *     monotone quantization of the negative log-likelihood that
  *     both engines compute with pure integer arithmetic
  *     (`length(bin(T // c))` in the oracle).
  *   - Viterbi tie order: lexicographic (total cost ASC, piece count
  *     ASC, last-piece length DESC) applied at every DP position —
  *     fully deterministic, partitioning-invariant.
  *
  * Training loop: seed the vocabulary with every substring of length
  * 1..maxPieceLen of the word dictionary (counted with multiplicity,
  * frequency-weighted — the suffix-array seeding of the reference
  * algorithm) pruned to all single chars + the top `seedMulti`
  * multi-char pieces; then per EM round, Viterbi-segment the word
  * dictionary under current costs, recount, prune (after round 1: top
  * `keepMulti` multi-char pieces by usage; unused multi-char pieces
  * drop every round; single chars are the fallback closure and never
  * drop — an unused char keeps count floor 1), recost.
  *
  * Scale shape: all per-word work (substring generation, the Viterbi
  * fold) runs over the DISTINCT-WORD dictionary — orders of magnitude
  * smaller than the token stream — as pure Catalyst HOF expressions
  * (no UDF, no shuffle beyond the word/piece groupBys); the model
  * that crosses to the driver is the bounded vocabulary
  * (seedMulti + alphabet rows, the KMeans/BpeTrainer bounded-state
  * discipline), re-broadcast as literal maps each round.
  */
object UnigramLm {

  /** `floor(log2(t/c)) + 1` in pure integer arithmetic (t >= c >= 1).
    */
  private[operators] def bitCost(t: Long, c: Long): Int =
    64 - java.lang.Long.numberOfLeadingZeros(t / c)

  private def costsOf(counts: Seq[(String, Long)]): Map[String, Int] = {
    val t = counts.map(_._2).sum
    counts.map { case (p, c) => p -> bitCost(t, c) }.toMap
  }

  /** Best-segmentation pieces of word column `w` under the literal
    * piece-cost map: a single Catalyst `aggregate` fold over the
    * character positions carrying (cost, pieceCount, pieces) per
    * prefix, choosing at each position the lexicographic minimum of
    * (cost ASC, pieces ASC, length DESC) over the <= maxPieceLen
    * candidate last pieces. Total because every single char of the
    * trained corpus is in the vocabulary.
    */
  def viterbiPieces(w: Column, costs: Map[String, Int],
      maxPieceLen: Int): Column = {
    val cmap = typedLit(costs)
    val fin = aggregate(
      sequence(lit(1), length(w)),
      struct(
        array(lit(0)).as("cs"),
        array(lit(0)).as("nps"),
        array(array().cast("array<string>")).as("sg")),
      (acc, j) => {
        val cs = acc.getField("cs")
        val nps = acc.getField("nps")
        val sg = acc.getField("sg")
        val cands = array((1 to maxPieceLen).map { l =>
          val piece = w.substr(j - lit(l) + 1, lit(l))
          val prev = j - lit(l) + 1 // dp index of position j-l (1-based)
          when(j >= l, struct(
            (element_at(cs, prev) + try_element_at(cmap, piece)).as("c"),
            (element_at(nps, prev) + 1).as("np"),
            lit(-l).as("nl"),
            concat(element_at(sg, prev), array(piece)).as("s")))
        }: _*)
        val best = element_at(array_sort(filter(cands,
          x => x.isNotNull && x.getField("c").isNotNull)), 1)
        struct(
          concat(cs, array(best.getField("c"))).as("cs"),
          concat(nps, array(best.getField("np"))).as("nps"),
          concat(sg, array(best.getField("s"))).as("sg"))
      })
    element_at(fin.getField("sg"), length(w) + 1)
  }

  /** Train the unigram LM and return the final vocabulary:
    * (piece, n_uses, cost) ordered by (n_uses DESC, piece) — n_uses
    * the frequency-weighted Viterbi usage count of the LAST EM round
    * (single chars may be 0: they are the untrained fallback
    * closure), cost the integer bit cost under the final counts.
    */
  def train(docs: DataFrame, textCol: String, maxPieceLen: Int = 4,
      seedMulti: Int = 60, keepMulti: Int = 40, rounds: Int = 2,
      maxWordLen: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(rounds >= 1)

    // maxWordLen is a decompression-bomb-class guard, not a tuning
    // knob: [[viterbiPieces]]'s fold carries every prefix's
    // segmentation, O(len²) pieces per word, so one adversarial
    // megabyte "word" in an untrusted corpus would otherwise blow up
    // a task. SentencePiece's own trainer caps sentence-piece input
    // the same way (max_sentencepiece_length et al.).
    val words = docs
      .select(explode(TextFns.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0 && length(col("w")) <= maxWordLen)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .localCheckpoint() // re-read once per EM round

    // seed: every substring with multiplicity, frequency-weighted
    val subs = words.select(col("freq"), explode(flatten(transform(
        sequence(lit(1), length(col("w"))),
        p => transform(
          sequence(lit(1), least(lit(maxPieceLen), length(col("w")) - p + 1)),
          l => col("w").substr(p, l))))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
      .localCheckpoint() // chars + top-multi both read it
    val chars0 = subs.filter(length(col("piece")) === 1)
      .as[(String, Long)].collect().toSeq
    val multi0 = subs.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece")).limit(seedMulti)
      .as[(String, Long)].collect().toSeq
    var vocab: Seq[(String, Long)] = chars0 ++ multi0
    var uses: Map[String, Long] = Map.empty
    for (r <- 1 to rounds) {
      val costs = costsOf(vocab)
      uses = words
        .select(col("freq"),
          explode(viterbiPieces(col("w"), costs, maxPieceLen)).as("piece"))
        .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
        .as[(String, Long)].collect().toMap // bounded: <= |vocab| rows
      val multi = vocab.collect {
        case (p, _) if p.length > 1 && uses.getOrElse(p, 0L) > 0L =>
          (p, uses(p))
      }
      val keptMulti =
        if (r == 1) multi.sortBy { case (p, c) => (-c, p) }.take(keepMulti)
        else multi
      // single chars never drop: fallback closure, count floor 1
      vocab = chars0.map { case (p, _) =>
        (p, math.max(uses.getOrElse(p, 0L), 1L)) } ++ keptMulti
    }

    val costs = costsOf(vocab)
    vocab.map { case (p, _) => (p, uses.getOrElse(p, 0L), costs(p)) }
      .toDF("piece", "n_uses", "cost")
      .orderBy(col("n_uses").desc, col("piece"))
  }
}
