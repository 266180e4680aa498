package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * SIGMOD 2003 — the MOSS algorithm): slide a window of `w`
  * consecutive shingle hashes and keep each window's MINIMUM, ties to
  * the RIGHTMOST occurrence; the deduped (position, hash) selections
  * are the document's fingerprint. The guarantee that makes this the
  * code/plagiarism-dedup primitive: any shared substring of at least
  * w + n − 1 tokens produces at least one shared fingerprint, while
  * storage is ~2/(w+1) of the shingle count — a principled, bounded
  * subsample of q22's full inverted index.
  *
  * Implementation is one narrow per-row expression chain over the
  * compiled shingle hashes ([[TextFns.shingleHashes]]): windows via
  * sequence/slice, rightmost-min via array_position over the reversed
  * slice, dedup via array_distinct — every step has an exact DuckDB
  * twin (generate_series / list slicing / list_position /
  * list_distinct), so fingerprints oracle bit-exactly. O(m·w) per doc,
  * zero shuffle.
  */
object Winnow {

  /** Selected fingerprints, one row per distinct (position, hash)
    * selection: (idCol, fp_pos — 1-based shingle position, fp).
    * Documents with fewer than w shingles emit nothing (no full
    * window exists). Selections dedupe as the single long
    * fp_pos·2³¹ + fp (both factors < 2³¹ — the hash is mod 1e9+7 and
    * positions are document-bounded), because distinct-on-struct-lists
    * is not portable; the pair is decoded back with shift/mask.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      n: Int, w: Int): DataFrame = {
    require(n >= 1 && w >= 2, "need shingle n >= 1 and window w >= 2")
    docs.select(col(idCol), TextFns.shingleHashes(col(textCol), n).as("sh"))
      .filter(size(col("sh")) >= w)
      .select(col(idCol), explode(array_distinct(transform(
        sequence(lit(0), size(col("sh")) - w),
        i => {
          val win = slice(col("sh"), i + lit(1), lit(w))
          val minh = array_min(win)
          val rpos = lit(w + 1) - array_position(reverse(win), minh)
          (i + rpos) * lit(2147483648L) + minh
        }))).as("e"))
      .select(col(idCol), shiftright(col("e"), 31).as("fp_pos"),
        col("e").bitwiseAND(lit(2147483647L)).as("fp"))
  }

  /** The same encoded selection list as SQL text (for oracles); pass
    * a precomputed shingle-hash list COLUMN as `shSql` — the
    * expression is referenced per window. Decode rows with
    * `e >> 31` / `e & 2147483647`.
    */
  def fingerprintsSql(shSql: String, w: Int): String =
    s"""list_distinct(list_transform(
       | generate_series(0, len($shSql) - $w),
       | i -> (i + ($w + 1
       |     - list_position(list_reverse(($shSql)[i + 1 : i + $w]),
       |         list_min(($shSql)[i + 1 : i + $w]))))
       |   * 2147483648 + list_min(($shSql)[i + 1 : i + $w])))""".stripMargin
}
