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
    * h := (h*31 + ascii(char)) % P, left fold from 0.
    */
  def rollingHash(s: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(s)),
        i => ascii(s.substr(i, lit(1))).cast("long")),
      lit(0L),
      (h, c) => (h * lit(31L) + c) % lit(P))
  def rollingHashSql(x: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       | list_transform(generate_series(1, len($x)),
       |   i -> CAST(ascii(substr($x, i, 1)) AS BIGINT))),
       | (h, c) -> (h * 31 + c) % ${P})""".stripMargin

  /** Order-independent content fingerprint: sum of distinct-token
    * rolling hashes mod P ((a+b)%P is commutative ⇒ array_distinct
    * ordering differences between engines don't matter).
    */
  def tokenSetHash(text: Column): Column =
    aggregate(
      transform(array_distinct(tokens(text)), t => rollingHash(t)),
      lit(0L),
      (acc, h) => (acc + h) % lit(P))
  def tokenSetHashSql(x: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       | list_transform(list_distinct(${tokensSql(x)}),
       |   t -> ${rollingHashSql("t")})),
       | (acc, h) -> (acc + h) % ${P})""".stripMargin

  /** Count of tokens that appear in a fixed marker set. */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(m => lit(m)): _*)))
  def markerCountSql(toksSql: String, markers: Seq[String]): String = {
    val inList = markers.map(m => s"'$m'").mkString(", ")
    s"len(list_filter($toksSql, t -> t IN ($inList)))"
  }

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
