package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Aho–Corasick blocklist scan: parity with a naive per-pattern
  * indexOf sweep (all occurrences, overlapping included), the
  * dict-suffix emission cases (pattern inside / suffix of another),
  * null contracts, and partition invariance.
  */
class AhoCorasickSpec extends SparkSpec {
  import spark.implicits._

  private def naive(text: String, pats: Seq[String]): Seq[(String, Int)] =
    pats.flatMap { p =>
      Iterator.iterate(text.indexOf(p))(i => text.indexOf(p, i + 1))
        .takeWhile(_ >= 0).map(i => p -> (i + 1)).toSeq
    }

  test("all occurrences match a naive indexOf sweep, overlaps included") {
    val pats = Seq("aba", "ab", "ba", "abab", "c")
    val texts = Seq(
      1L -> "ababab",   // self-overlapping everything
      2L -> "abcba",
      3L -> "",
      4L -> "aaaa",     // no matches
      5L -> "cababac")
    val df = texts.toDF("doc_id", "text")
    val got = AhoCorasick.matches(df, "doc_id", "text", pats)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .toSet
    val want = texts.flatMap { case (id, t) =>
      naive(t, pats).map { case (p, pos) => (id, p, pos) } }.toSet
    assert(got == want)
  }

  test("suffix-of-another and nested patterns both emit at the same end") {
    val pats = Seq("table", "fast table", "t")
    val df = Seq(1L -> "fast table").toDF("doc_id", "text")
    val got = AhoCorasick.matches(df, "doc_id", "text", pats)
      .collect().map(r => (r.getString(1), r.getInt(2))).toSet
    assert(got == Set(("fast table", 1), ("table", 6), ("t", 4), ("t", 6)))
  }

  test("self-bordered phrase counts overlapping occurrences (replace would not)") {
    val df = Seq(1L -> "table table table").toDF("doc_id", "text")
    val got = AhoCorasick.matches(df, "doc_id", "text", Seq("table table"))
      .collect().map(_.getInt(2)).sorted.toSeq
    assert(got == Seq(1, 7))
  }

  test("null text matches nothing; dict validation throws") {
    val df = Seq((1L, null: String), (2L, "ab")).toDF("doc_id", "text")
    val got = AhoCorasick.matches(df, "doc_id", "text", Seq("ab")).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(2L))
    intercept[IllegalArgumentException] {
      new AhoCorasick.Automaton(IndexedSeq("a", "a"))
    }
    intercept[IllegalArgumentException] {
      new AhoCorasick.Automaton(IndexedSeq(""))
    }
    intercept[IllegalArgumentException] {
      new AhoCorasick.Automaton(IndexedSeq.empty)
    }
  }

  test("partition invariance") {
    val docs = (1 to 200).map(i =>
      i.toLong -> Seq("ab", "ba", "ca", "abc")
        .map(p => p * (i % 3 + 1)).mkString(" "))
    val pats = Seq("ab", "aba", "cab", "ba")
    val a = AhoCorasick.matches(docs.toDF("doc_id", "text"),
        "doc_id", "text", pats)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .sorted.toSeq
    val b = AhoCorasick.matches(docs.toDF("doc_id", "text").repartition(13),
        "doc_id", "text", pats)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .sorted.toSeq
    assert(a == b && a.nonEmpty)
  }
}
