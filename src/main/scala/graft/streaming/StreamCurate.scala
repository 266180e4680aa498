package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFns, UrlFns}

/** Streaming curation — the ingest-time twin of the batch curation
  * funnel (q139 / `pipeline.CurationPipeline`): crawl records are
  * gated AS THEY ARRIVE so garbage never lands in the lake, instead
  * of being scrubbed out of it later.
  *
  * Stage mapping (batch → stream):
  *  - URL canonicalization, language gate, Gopher rules are all
  *    row-local scan-stage expressions — IDENTICAL code in both modes
  *    (that is the point of keeping them narrow: no state, no
  *    reordering, safe at any watermark);
  *  - URL dedup and exact-text dedup become watermark-horizon
  *    `dropDuplicatesWithinWatermark` passes (canonical-url key, then
  *    content-hash key) — state bounded by keys-per-horizon, exactly
  *    [[StreamDedup]]'s contract. Duplicates farther apart than the
  *    horizon are batch dedup's job (`CurationPipeline`'s stored hash
  *    table); the stream's contract is exactly-once within the
  *    delivery window.
  *
  * The emitted rows carry `curl` (canonical URL) and `h` (content
  * hash) so the downstream batch fold can append them to its stored
  * indexes without recomputing either.
  */
object StreamCurate {

  /** Gate a streaming `docs` frame (doc_id, url, lang, source, text +
    * event-time `tsCol`): canonical-URL dedup → language gate →
    * Gopher rules → content-hash dedup, all within the `delay`
    * watermark horizon.
    */
  def curateWithinWatermark(docs: DataFrame, tsCol: String, delay: String,
      keepLangs: Seq[String]): DataFrame = {
    import graft.queries.TextAnalysis._
    val toks = TextFns.tokens(col("text"))
    val nTok = size(toks)
    val meanLen = aggregate(toks, lit(0L), (a, tk) => a + length(tk))
      .cast("double") / nTok
    val dupFrac = lit(1.0) -
      size(array_distinct(toks)).cast("double") / nTok
    val nStop = size(filter(array_distinct(toks),
      tk => tk.isin(stopwords.map(lit): _*)))
    // the SAME bounds as the batch gopherFlags (TextAnalysis q110) —
    // shared constants, so the stream and the batch fold can never
    // disagree about what passes
    val gpass = nTok.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS) &&
      meanLen.between(GOPHER_MIN_WLEN, GOPHER_MAX_WLEN) &&
      nStop >= GOPHER_MIN_STOP && dupFrac <= GOPHER_MAX_DUPFRAC
    docs
      .withColumn("curl", UrlFns.canonicalizeUrl(col("url")))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(Seq("curl"))
      .filter(col("lang").isin(keepLangs.map(x => x: Any): _*))
      .filter(gpass)
      .withColumn("h", TextFns.rollingHash(col("text")))
      .dropDuplicatesWithinWatermark(Seq("h"))
  }
}
