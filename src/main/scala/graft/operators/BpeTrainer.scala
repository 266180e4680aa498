package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary induction (Sennrich et al. 2016) — the
  * tokenizer TRAINING step of a data pipeline, next to the
  * tokenizer-APPLICATION operators (q95 pre-tokens, pack/chunk ops).
  *
  * The algorithm iterates "count adjacent symbol pairs → merge the
  * most frequent" — but NEVER over the corpus: like every real BPE
  * trainer, it runs on the WORD-FREQUENCY table. The corpus is
  * scanned exactly once (one token-keyed count aggregation, map-side
  * combine); all nMerges iterations then operate on distinct words
  * only — millions of rows at 100 TB, not trillions. Per iteration:
  * one pair-explode + hash agg over the word table, a 1-row argmax
  * collect, and a narrow per-word merge fold; the word table is
  * localCheckpointed each round so lineage stays flat (the
  * connectedComponents lesson — on a multi-executor cluster prefer
  * reliable checkpoint()).
  *
  * Determinism: the winning pair maximizes (count, then
  * lexicographically smallest left, then right) — no RNG, no
  * order-dependence, so the merge table is reproducible on any
  * partitioning (spec-pinned). Greedy left-to-right non-overlapping
  * merge semantics match the reference BPE formulation (an in-spec
  * naive implementation is the test oracle — the iterative list
  * rebuild is not ANSI-SQL-expressible, so this operator carries no
  * DuckDB oracle; the driver records the weaker rows-only check).
  *
  * Output: one row per learned merge —
  * (merge_idx, left, right, merged, pair_count), in merge order.
  */
object BpeTrainer {

  /** Greedy left-to-right merge of adjacent (a,b) symbol pairs into
    * a+b, as a fold over the symbol array: append, unless the
    * accumulator's last element is `a` and the current symbol is `b`,
    * in which case replace the last element with the merged symbol.
    * A symbol created by a merge is never re-merged in the same pass
    * (string equality against the full merged symbol fails) — the
    * standard non-overlap rule.
    */
  private[operators] def mergePair(syms: Column, a: String,
      b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) =>
        when(element_at(acc, -1) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(concat(element_at(acc, -1), s))))
          .otherwise(concat(acc, array(s))))

  /** Learn `nMerges` BPE merges from the corpus' whitespace words.
    * Stops early when no pair reaches `minCount` occurrences.
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L): DataFrame = {
    require(nMerges >= 1 && minCount >= 1)
    val spark = docs.sparkSession
    import spark.implicits._

    // the ONLY corpus-wide pass: word frequencies, then chars
    var words = docs
      .select(explode(graft.functions.TextFns.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(split(col("w"), "").as("syms"), col("freq"))
      .localCheckpoint(true)

    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var i = 1
    var done = false
    while (i <= nMerges && !done) {
      val top = words
        // single-symbol words carry no pairs — and sequence(0, -1)
        // would DESCEND, fabricating reversed out-of-bounds pairs
        .filter(size(col("syms")) > 1)
        .select(col("freq"), explode(
          // adjacent pairs: (syms[j], syms[j+1]) for j in 0..n-2
          transform(sequence(lit(0), size(col("syms")) - 2), j =>
            struct(element_at(col("syms"), j + 1).as("a"),
              element_at(col("syms"), j + 2).as("b")))).as("p"))
        .groupBy(col("p.a"), col("p.b")).agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty || top.head.getAs[Long]("cnt") < minCount) done = true
      else {
        val (a, b) = (top.head.getAs[String]("a"), top.head.getAs[String]("b"))
        merges += ((i, a, b, a + b, top.head.getAs[Long]("cnt")))
        words = words
          .select(mergePair(col("syms"), a, b).as("syms"), col("freq"))
          .localCheckpoint(true)
        i += 1
      }
    }
    merges.toSeq
      .toDF("merge_idx", "left", "right", "merged", "pair_count")
  }

  // ------------------------------------------------------------------
  // Tokenizer APPLICATION: run a (trained or shipped) merge list over
  // a corpus — the inference half of BPE, and the everyday operation
  // of a training-data pipeline (token counting with the REAL
  // tokenizer, not the whitespace estimate).
  // ------------------------------------------------------------------

  /** The document as a marker-delimited symbol string: every non-space
    * character becomes `|c`, then each merge (a, b) → ab is ONE
    * single-pass left-to-right non-overlapping string replace of
    * `|a|b` with `|ab` — exactly [[mergePair]]'s fold semantics
    * (the leading marker pins symbol boundaries, so a symbol ENDING
    * in `a` can never false-match, and a just-merged symbol cannot
    * re-merge in the same pass because its interior has no marker).
    * Word boundaries need no special casing: patterns contain no
    * spaces, so merges never cross them.
    *
    * Why strings instead of chained array folds: both engines ship a
    * codegen'd single-pass `replace`, the whole merge chain stays one
    * narrow scan-stage expression per document (zero shuffles), and
    * the SQL oracle is the IDENTICAL chain ([[bpeSymbolStringSql]]).
    * Precondition: the text must not contain the `|` marker.
    */
  def bpeSymbolString(text: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(regexp_replace(text, "(\\S)", "|$1")) {
      case (s, (a, b)) => replace(s, lit(s"|$a|$b"), lit(s"|$a$b"))
    }

  def bpeSymbolStringSql(x: String, merges: Seq[(String, String)]): String =
    merges.foldLeft(s"regexp_replace($x, '(\\S)', '|\\1', 'g')") {
      case (s, (a, b)) => s"replace($s, '|$a|$b', '|$a$b')"
    }

  /** Token count under the merge list: one marker per symbol. */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column = {
    val s = bpeSymbolString(text, merges)
    (length(s) - length(replace(s, lit("|"), lit("")))).cast("long")
  }

  def bpeTokenCountSql(x: String, merges: Seq[(String, String)]): String = {
    val s = bpeSymbolStringSql(x, merges)
    s"CAST(len($s) - len(replace($s, '|', '')) AS BIGINT)"
  }
}
