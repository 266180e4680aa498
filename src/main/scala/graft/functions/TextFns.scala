package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable text-analysis column builders for the LLM-data-pipeline
  * operators (tokenization, hashing, fingerprinting), with matching
  * ANSI-SQL string builders so every query has a DuckDB oracle that
  * computes BIT-IDENTICAL values.
  *
  * Design rules for portability:
  *  - integer arithmetic only, mod P = 1e9+7 (fits BIGINT: h*31+255 and
  *    a*s+b with a,s,b < P stay < 2^63);
  *  - folds are sequential left-folds in both engines
  *    (`functions.aggregate` ≡ `list_reduce`); the fold op has identity
  *    at 0 so DuckDB's no-initial-value reduce gets a prepended 0;
  *  - everything is built-in higher-order functions — whole-stage
  *    codegen keeps these on the fast path, no UDF serialization.
  *
  * Scale note (100 TB): all of these are narrow per-row expressions —
  * they pipeline inside the scan stage, shuffle nothing, and cost
  * O(chars) per row.
  */
object TextFns {
  /** Prime modulus for all rolling hashes. */
  val P = 1000000007L

  /** Whitespace tokenization (trim first; multi-space collapsed). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")
  def tokensSql(x: String): String =
    s"regexp_split_to_array(trim($x), '\\s+')"

  /** Polynomial rolling hash over the characters of `s`, mod P.
    * h := (h*31 + codepoint) % P, left fold from 0. Backed by the
    * native codegen expression graft.expressions.RollingHash
    * (registered by GraftSession) — the equivalent HOF chain
    * (aggregate∘transform∘sequence) is interpreted per character and
    * ~10× slower on document-length strings.
    */
  def rollingHash(s: Column): Column =
    call_function("graft_rolling_hash", s)
  def rollingHashSql(x: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       | list_transform(generate_series(1, len($x)),
       |   i -> CAST(ascii(substr($x, i, 1)) AS BIGINT))),
       | (h, c) -> (h * 31 + c) % ${P})""".stripMargin

  /** Tokenize + hash + candidate-filter in one compiled pass: the
    * shingle STRINGS whose rolling hash is in `cands` (native
    * ShingleHashFilter — strings built only for survivors). The
    * HeavyHitters recount shape.
    */
  def shingleFilter(text: Column, n: Int, cands: Array[Long]): Column =
    call_function("graft_shingle_filter", text, lit(n), lit(cands))

  /** Tokenize+shingle+hash in one compiled pass (native ShingleHashes
    * expression; n=1 degenerates to per-token hashes). Returns one
    * hash per shingle position; array_distinct for set semantics.
    */
  def shingleHashes(text: Column, n: Int): Column =
    call_function("graft_shingle_hashes", text, lit(n))
  def shingleHashesSql(x: String, n: Int): String =
    s"""list_transform(${shinglesSql(tokensSql(x), n)},
       | sh2 -> ${rollingHashSql("sh2")})""".stripMargin

  /** Order-independent content fingerprint: sum of distinct token
    * hashes mod P ((a+b)%P is commutative ⇒ array_distinct ordering
    * differences between engines don't matter). Distinct applies to
    * the HASHES on both sides so values agree even under collision.
    */
  def tokenSetHash(text: Column): Column =
    aggregate(
      array_distinct(shingleHashes(text, 1)),
      lit(0L),
      (acc, h) => (acc + h) % lit(P))
  def tokenSetHashSql(x: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       | list_distinct(${shingleHashesSql(x, 1)})),
       | (acc, h) -> (acc + h) % ${P})""".stripMargin

  /** Count of tokens that appear in a fixed marker set. */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(m => lit(m)): _*)))
  def markerCountSql(toksSql: String, markers: Seq[String]): String = {
    val inList = markers.map(m => s"'$m'").mkString(", ")
    s"len(list_filter($toksSql, t -> t IN ($inList)))"
  }

  /** Tokenize-and-shingle in one compiled pass, emitting shingle
    * STRINGS (native ShingleStrings expression) — ≡
    * `shingles(tokens(text), n)` value for value, without the
    * interpreted per-position lambda. Use on recount paths that must
    * materialize strings from raw text.
    */
  def shinglesNative(text: Column, n: Int): Column =
    call_function("graft_shingles", text, lit(n))

  /** Word n-gram shingles: positions 1..len-n+1, space-joined.
    * Guarded: Spark's sequence(1, 0) yields a DESCENDING [1,0] (not
    * empty like DuckDB's generate_series), so short docs take the
    * empty-array branch explicitly.
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  def shinglesSql(toksSql: String, n: Int): String =
    s"""list_transform(
       | generate_series(1, greatest(len($toksSql) - ${n - 1}, 0)),
       | i -> array_to_string(list_slice($toksSql, i, i + ${n - 1}), ' '))""".stripMargin
}
