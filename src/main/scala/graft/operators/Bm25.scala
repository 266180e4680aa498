package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Log-free BM25 full-text ranking — the classic lexical retrieval
  * scorer (Robertson & Zaragoza 2009) re-expressed Spark-first, the
  * lexical sibling of the ANN operators for hybrid retrieval.
  *
  * Scoring: Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  * with the RATIONAL idf surrogate (N − df + ½)/(df + ½) instead of
  * its logarithm — same stance as the TF-IDF operator: ln() differs
  * in the last ulp across libm implementations and would break the
  * bit-exact oracle, and the surrogate is a monotone map of the true
  * idf so ranking is preserved. Pass k1/b as exactly-representable
  * doubles (1.25, 0.75) so both engines compute identical floats.
  *
  * Scale shape (100 TB): the query-term restriction lands INSIDE the
  * token explode scan, so the tf shuffle carries only occurrences of
  * the query's terms (the inverted-index trick — corpus tokens never
  * shuffle); document frequencies are a tiny per-term aggregate
  * (broadcast); corpus stats are one scalar row (broadcast); score
  * folds run in a deterministic term order so results are
  * bit-reproducible under any partitioning.
  */
object Bm25 {

  /** Shared scoring dataflow: per-(doc, query-term) BM25
    * contributions. `restrict` narrows the exploded (id, dl, term)
    * token stream to query terms — an isin filter for a literal list,
    * a broadcast join for a query table — and runs inside the scan.
    */
  private def contributions(docs: DataFrame, idCol: String,
      textCol: String, restrict: DataFrame => DataFrame,
      k1: Double, b: Double): DataFrame = {
    // (id, dl, term) rows — native one-pass tokenizer
    val toks = docs.select(col(idCol),
        TextFns.shinglesNative(col(textCol), 1).as("__toks"))
      .select(col(idCol), size(col("__toks")).cast("double").as("dl"),
        explode(col("__toks")).as("term"))
    val qtoks = restrict(toks)
    // corpus stats: integer-valued doubles sum exactly in any order.
    // NOTE this is a second tokenizing scan of the corpus (stats need
    // UNFILTERED token counts; the tf branch filters inside its scan
    // and the two aggregations can't share one pass without caching)
    // — at deployment, persist the tokenized projection or store dl
    // as a table column to make this a cheap column scan.
    val stats = docs
      .select(size(TextFns.shingleHashes(col(textCol), 1))
        .cast("double").as("dl0"))
      .agg(count(lit(1)).cast("double").as("n_docs"),
        avg(col("dl0")).as("avgdl"))
    val tf = qtoks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"),
        first(col("dl")).as("dl")) // constant per document
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("dfreq"))
    tf
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        (col("n_docs") - col("dfreq") + lit(0.5)) / (col("dfreq") + lit(0.5)))
      .withColumn("contrib",
        col("idf") * col("tf") * lit(k1 + 1) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b)
            + lit(b) * col("dl") / col("avgdl"))))
  }

  /** Top-k documents for a bag-of-words query. Output: idCol, dl
    * (token count), n_terms (query terms matched), score, rank.
    * The per-document score folds ≤ |terms| contributions in the
    * FIXED written order of the term list (conditional aggregates,
    * not sum()) — bit-reproducible under any partitioning.
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double, b: Double, k: Int): DataFrame = {
    require(queryTerms.nonEmpty && k > 0)
    // a duplicated term would add its contribution once per LIST entry
    // in the fixed-order fold below — dedupe, preserving first-seen
    // order (classic BM25 treats the query as a term set)
    val terms = queryTerms.distinct
    val contrib = contributions(docs, idCol, textCol,
      _.filter(col("term").isin(terms.map(lit): _*)), k1, b)
    // fixed-order fold over the literal term list — sum() would add
    // in partial-aggregation order and wobble the last ulp
    val termCols: Seq[Column] = terms.map(t =>
      coalesce(max(when(col("term") === t, col("contrib"))), lit(0.0)))
    val scored = contrib.groupBy(col(idCol))
      .agg(first(col("dl")).as("dl"),
        count(lit(1)).as("n_terms"),
        termCols.reduce(_ + _).as("score"))
    // rank over the k survivors only — a deliberate single-partition
    // window over ≤ k rows (GraftSession documents why WindowExec's
    // blanket warning is silenced for this class of plan)
    scored
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col(idCol).asc)))
      .orderBy(col("rank"))
  }

  /** BATCH retrieval: top-k docs for EVERY query in a (queryIdCol,
    * termCol) table — the realistic search workload ([[topK]] is the
    * single-query oracle baseline). Same scoring dataflow
    * ([[contributions]]); differences forced by dynamic queries:
    *  - the term restriction becomes a broadcast join against the
    *    distinct query-term set (still inside the token scan — only
    *    matching occurrences shuffle);
    *  - per-(query, doc) scores fold contributions in SORTED TERM
    *    ORDER via sort_array∘collect_list (a dynamic term set has no
    *    written order to fix; the sorted fold is partition-independent
    *    and equals [[topK]] exactly when its literal list is sorted —
    *    spec-asserted);
    *  - ranking is a per-query window (query id is the partition key,
    *    so parallelism grows with the query batch).
    * Document frequencies stay per-term (query-independent), so the
    * inverted stats build is shared across the whole batch.
    */
  def topKPerQuery(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, termCol: String,
      k1: Double, b: Double, k: Int): DataFrame = {
    require(k > 0)
    val q = queries.select(col(queryIdCol), col(termCol).as("term")).distinct()
    val qTerms = q.select(col("term")).distinct()
    val contrib = contributions(docs, idCol, textCol,
      _.join(broadcast(qTerms), Seq("term")), k1, b)
    val scored = contrib
      .join(broadcast(q), Seq("term"))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(first(col("dl")).as("dl"),
        count(lit(1)).as("n_terms"),
        aggregate(
          sort_array(collect_list(struct(col("term"), col("contrib")))),
          lit(0.0), (acc, x) => acc + x.getField("contrib")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryIdCol))
      .orderBy(col("score").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
