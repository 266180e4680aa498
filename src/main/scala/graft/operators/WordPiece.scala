package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Greedy longest-match ("maximal munch") subword tokenization — the
  * WordPiece/BERT inference rule (Wu et al. 2016; Song et al. 2021's
  * fast WordPiece is the linear-time formulation of exactly this
  * semantics), the SECOND tokenizer family next to BPE merge-order
  * application (BpeTrainer.bpeTokenCount): at each position take the
  * LONGEST vocabulary piece that matches, consume it, repeat. The two
  * rules genuinely disagree under the same vocabulary — with the demo
  * merge list, "query" is qu|ery (2 tokens) under BPE merge order but
  * que|r|y (3) under greedy longest match, because greedy commits to
  * "que" before the higher-rank "ery" merge can form — so shipping
  * both makes the tokenizer-choice cost measurable (q164) instead of
  * assumed.
  *
  * Vocabulary model: the supplied pieces (multi-char merge products)
  * plus an implicit single-character fallback for EVERY character —
  * the closure that makes segmentation total without an [UNK] token
  * (BpeTrainer.vocabTable ships all base chars for the same reason).
  *
  * Scale: the walk is a pure per-row Catalyst HOF fold (one
  * `aggregate` over ≤ len(word) steps; each step probes the per-length
  * literal piece arrays with `substr` + `array_contains` — no UDF, no
  * shuffle). Callers apply it to the DISTINCT-WORD dictionary and
  * broadcast-join counts back onto the token stream (the BpeTrainer
  * word-dict discipline): per-word work is paid once per distinct
  * word, not once per token occurrence — at corpus scale the
  * dictionary is orders of magnitude smaller than the token stream.
  */
object WordPiece {

  /** Length of the longest piece matching `w` at 1-based `pos`; 1 if
    * only the single-char fallback matches. `byLen` is (len, pieces)
    * longest-first.
    */
  private def jump(w: Column, pos: Column,
      byLen: Seq[(Int, Seq[String])]): Column = {
    val cases = byLen.map { case (l, ps) =>
      when(array_contains(array(ps.map(lit): _*), w.substr(pos, lit(l))),
        lit(l))
    }
    coalesce(cases :+ lit(1): _*)
  }

  private def piecesByLen(pieces: Seq[String]): Seq[(Int, Seq[String])] =
    pieces.filter(_.length > 1).distinct.groupBy(_.length).toSeq
      .sortBy(-_._1).map { case (l, ps) => (l, ps.sorted) }

  /** Number of greedy longest-match pieces `w` segments into. The
    * fold runs len(w) steps (an upper bound — each step advances ≥ 1
    * position) guarded by `pos <= len`, so the extra steps are no-ops
    * and the result is exact for any word length, including "".
    */
  def greedyPieceCount(w: Column, pieces: Seq[String]): Column = {
    val byLen = piecesByLen(pieces)
    aggregate(
      sequence(lit(1), length(w)),
      struct(lit(1).as("pos"), lit(0).as("cnt")),
      (acc, _) => {
        val p = acc.getField("pos")
        when(p <= length(w),
          struct((p + jump(w, p, byLen)).as("pos"),
            (acc.getField("cnt") + 1).as("cnt")))
          .otherwise(acc)
      }).getField("cnt")
  }

  /** The greedy segmentation itself (array of pieces, in order) — the
    * spec surface: concat(pieces) must equal the word, every
    * multi-char piece must be in the vocabulary, and each step must
    * be maximal. Same fold as [[greedyPieceCount]] with the matched
    * substring appended per step.
    */
  def greedyPieces(w: Column, pieces: Seq[String]): Column = {
    val byLen = piecesByLen(pieces)
    aggregate(
      sequence(lit(1), length(w)),
      struct(lit(1).as("pos"), typedLit(Seq.empty[String]).as("ps")),
      (acc, _) => {
        val p = acc.getField("pos")
        val j = jump(w, p, byLen)
        when(p <= length(w),
          struct((p + j).as("pos"),
            concat(acc.getField("ps"), array(w.substr(p, j))).as("ps")))
          .otherwise(acc)
      }).getField("ps")
  }
}
