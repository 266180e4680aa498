package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.expressions.RollingHash

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val N = 3
  private val W = 4

  /** Naive reference: shingle hashes via RollingHash on joined token
    * windows, then the textbook winnow loop (min per window, rightmost
    * tie, dedup).
    */
  private def reference(text: String): Set[(Long, Long)] = {
    val toks = text.trim.split("\\s+", -1).toSeq
    val sh = (0 to toks.length - N)
      .map(i => RollingHash.hash(toks.slice(i, i + N).mkString(" ")))
    if (sh.length < W) return Set.empty
    (0 to sh.length - W).map { i =>
      val win = sh.slice(i, i + W)
      val mn = win.min
      val rj = i + win.lastIndexOf(mn)
      (rj + 1L, mn) // 1-based position
    }.toSet
  }

  private def engine(rows: Seq[(Long, String)]): Map[Long, Set[(Long, Long)]] =
    Winnow.fingerprints(rows.toDF("doc_id", "text"), "doc_id", "text", N, W)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }

  test("selection matches the textbook winnow loop, incl. rightmost ties") {
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "a a a a a a a a a a", // all-identical shingles: pure tie-break
      3L -> "one two three four five six seven eight nine ten eleven twelve",
      4L -> "x y z w") // exactly n+w-... too few shingles for a window
    val got = engine(docs)
    docs.foreach { case (id, text) =>
      assert(got.getOrElse(id, Set.empty) === reference(text), s"doc $id")
    }
    assert(!got.contains(4L), "sub-window doc must emit nothing")
  }

  test("the winnowing guarantee: a shared run of >= w+n-1 tokens shares a fingerprint") {
    val shared = "alpha beta gamma delta epsilon zeta" // w+n-1 = 6 tokens
    val docs = Seq(
      10L -> s"p q r s t u v $shared",
      11L -> s"$shared m n o k l j h")
    val got = engine(docs)
    val fpsA = got(10L).map(_._2)
    val fpsB = got(11L).map(_._2)
    assert((fpsA & fpsB).nonEmpty,
      "guaranteed shared fingerprint missing")
  }

  test("density: selections per doc stay well under the shingle count") {
    val text = (1 to 200).map(i => s"t${(i * 7919) % 97}").mkString(" ")
    val got = engine(Seq(20L -> text))(20L)
    val m = 200 - N + 1
    // expected density ~ 2/(w+1) = 0.4; allow slack but pin the order
    assert(got.size <= m * 6 / 10, s"${got.size} of $m selected")
  }
}
