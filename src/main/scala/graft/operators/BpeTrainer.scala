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

  /** The document as a marker-delimited symbol string: whitespace is
    * canonicalized to single spaces, every non-space character becomes
    * `|c`, a marker is appended after each word's LAST symbol (before
    * each space and at the end), and each merge (a, b) → ab is then
    * ONE single-pass left-to-right non-overlapping string replace of
    * `|a|b|` with `|ab|` — exactly [[mergePair]]'s fold semantics.
    * Markers on BOTH sides of the pattern are load-bearing: with only
    * leading markers (the pre-round-10 encoding), merge (s,t) on
    * `…|s|ta|…` would match `|s|t` as a PREFIX of symbol `ta` and
    * corrupt the segmentation — "distant" under the demo list was the
    * caught counterexample (the trainer's fold compares full symbols,
    * so prefix matches must be impossible here too). The trailing
    * marker consumed by a match is re-emitted by the replacement, so
    * chained merges still see every boundary. Word boundaries need no
    * special casing: patterns contain no spaces, so merges never
    * cross them.
    *
    * Why strings instead of chained array folds: both engines ship a
    * codegen'd single-pass `replace`, the whole merge chain stays one
    * narrow scan-stage expression per document (zero shuffles), and
    * the SQL oracle is the IDENTICAL chain ([[bpeSymbolStringSql]]).
    * Precondition: the text must not contain the `|` marker.
    */
  def bpeSymbolString(text: Column, merges: Seq[(String, String)]): Column = {
    val canon = regexp_replace(trim(text), "\\s+", " ")
    val marked = concat(
      replace(regexp_replace(canon, "(\\S)", "|$1"), lit(" "), lit("| ")),
      lit("|"))
    merges.foldLeft(marked) {
      case (s, (a, b)) => replace(s, lit(s"|$a|$b|"), lit(s"|$a$b|"))
    }
  }

  def bpeSymbolStringSql(x: String, merges: Seq[(String, String)]): String = {
    val canon = s"regexp_replace(trim($x), '\\s+', ' ', 'g')"
    val marked =
      s"replace(regexp_replace($canon, '(\\S)', '|\\1', 'g'), ' ', '| ') || '|'"
    merges.foldLeft(marked) {
      case (s, (a, b)) => s"replace($s, '|$a|$b|', '|$a$b|')"
    }
  }

  /** Token count under the merge list: one marker per symbol. */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column = {
    // markers = symbols + one terminator per word, so tokens =
    // markers − words. Words count from the RAW text (one cheap
    // regex split), NOT from the symbol string: every additional
    // reference to `s` re-evaluates the whole merge chain — a
    // 5-reference variant with a `when` guard defeated codegen
    // subexpression reuse and cost 7.5× on q124 (measured). The
    // all-whitespace edge folds into the word count (its split
    // yields [""], i.e. 1, matching the lone terminator marker).
    val s = bpeSymbolString(text, merges)
    val markers = length(s) - length(replace(s, lit("|"), lit("")))
    val words = when(length(trim(text)) === 0, lit(1))
      .otherwise(size(split(trim(text), "\\s+")))
    (markers - words).cast("long")
  }

  /** A small shipped merge list for pipeline defaults and oracles
    * (q124/q154): deliberately exercises multi-level merges (t+h→th,
    * th+e→the; e+r→er, er+y→ery) whose pair members are themselves
    * merge products. Order matters — it IS the vocabulary rank order.
    */
  val demoMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("t", "h"), ("th", "e"), ("t", "a"), ("ta", "b"),
    ("s", "t"), ("q", "u"), ("qu", "e"), ("o", "r"), ("i", "n"),
    ("a", "g"), ("er", "y"))

  /** The tokenized document as an ARRAY of symbol strings (the
    * [[bpeSymbolString]] markers split off) — the bridge from the
    * replace chain to id assignment. The symbol string keeps the
    * document's whitespace BETWEEN markers (word-final symbols read
    * "w " etc.), so it is scrubbed before the split — without this,
    * every word-final symbol silently misses the vocabulary join (the
    * round-trip spec is what catches that class of bug).
    */
  def bpeTokens(text: Column, merges: Seq[(String, String)]): Column =
    filter(
      split(regexp_replace(bpeSymbolString(text, merges), "\\s+", ""),
        "\\|"),
      s => length(s) > 0)

  /** DuckDB mirror of [[bpeTokens]]. */
  def bpeTokensSql(x: String, merges: Seq[(String, String)]): String =
    s"""list_filter(string_split(regexp_replace(
       |${bpeSymbolStringSql(x, merges)}, '\\s+', '', 'g'), '|'),
       |x -> x != '')""".stripMargin

  /** Vocabulary table (token, id) for a merge list over a corpus:
    * the corpus' distinct non-whitespace CHARACTERS sorted ascending
    * take ids 0..B−1, then each merge's product takes id B+rank −
    * the merge-rank order a real BPE tokenizer ships (merge i's
    * product is always id-able even when later merges consume it).
    * Every post-merge token is either a base character or some
    * merge's product, so the table is total over [[bpeTokens]]
    * output. The base count B is a bounded driver read (the vocab is
    * a MODEL table, ≤ alphabet + |merges| rows); the id window runs
    * over that same tiny table.
    */
  def vocabTable(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val chars = docs
      .select(explode(split(regexp_replace(col(textCol), "\\s+", ""), ""))
        .as("token"))
      .filter(length(col("token")) > 0)
      .distinct()
    val charIds = chars.select(col("token"),
      (row_number().over(Window.orderBy(col("token"))) - 1).cast("long")
        .as("id"))
    val base = chars.count()
    val mergeIds = merges.zipWithIndex
      .map { case ((a, b), i) => (a + b, base + i) }
      .toDF("token", "id")
    charIds.unionByName(mergeIds)
  }

  /** Tokenize the corpus to vocabulary-id arrays: (idCol, ids) with
    * `ids[pos]` = vocab id of the pos-th BPE token. The scan emits
    * (doc, pos, token) rows, the model-sized vocab broadcasts into an
    * equi-join, and one doc-keyed aggregation reassembles position
    * order — tokenization at scale is scan + broadcast probe + one
    * keyed shuffle, never a corpus-side sort. Tokens outside the
    * vocab cannot occur ([[vocabTable]] is total by construction);
    * the inner join makes a violated precondition visible as a
    * shortened array rather than a silent wrong id.
    */
  def bpeEncodeIds(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], vocab: DataFrame): DataFrame =
    docs
      .select(col(idCol),
        posexplode(bpeTokens(col(textCol), merges)).as(Seq("pos", "token")))
      .join(broadcast(vocab), Seq("token"))
      .groupBy(col(idCol))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("id")))),
        x => x.getField("id")).as("ids"))

  /** Inverse of [[bpeEncodeIds]] for QA round-trips: ids back to the
    * concatenated surface form (the document with its whitespace
    * removed — BPE merges never cross the token boundary, so
    * detokenize(encode(text)) must equal the scrubbed text exactly;
    * spec-pinned corpus-wide).
    */
  def bpeDecodeIds(encoded: DataFrame, idCol: String,
      vocab: DataFrame): DataFrame =
    encoded
      .select(col(idCol), posexplode(col("ids")).as(Seq("pos", "id")))
      .join(broadcast(vocab), Seq("id"))
      .groupBy(col(idCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("token")))),
        x => x.getField("token")), "").as("detok"))

  def bpeTokenCountSql(x: String, merges: Seq[(String, String)]): String = {
    val s = bpeSymbolStringSql(x, merges)
    s"""CAST((len($s) - len(replace($s, '|', '')))
       | - (CASE WHEN len(trim($x)) = 0 THEN 1
       |     ELSE len(regexp_split_to_array(trim($x), '\\s+')) END)
       | AS BIGINT)""".stripMargin
  }
}
