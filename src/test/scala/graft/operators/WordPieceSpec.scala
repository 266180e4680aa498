package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private val pieces = BpeTrainer.demoMerges.map { case (a, b) => a + b }
  private val multi = pieces.filter(_.length > 1).toSet

  /** Independent single-node greedy longest-match reference. */
  private def refGreedy(w: String): Seq[String] = {
    val maxLen = (multi.map(_.length) + 1).max
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = 0
    while (p < w.length) {
      val l = (math.min(maxLen, w.length - p) to 2 by -1)
        .find(l => multi.contains(w.substring(p, p + l)))
        .getOrElse(1)
      out += w.substring(p, p + l)
      p += l
    }
    out.toSeq
  }

  private def samples[T](g: Gen[T], n: Int): Seq[T] = {
    val p = Gen.Parameters.default
    (0 until n).flatMap(i => g.apply(p, Seed(7L + i)))
  }

  test("greedy segmentation ≡ reference; round-trips; is maximal") {
    val alphabet = Gen.oneOf("abegihnoqrstuy".toSeq)
    val word = Gen.chooseNum(1, 12)
      .flatMap(n => Gen.listOfN(n, alphabet).map(_.mkString))
    val words = (samples(word, 120) ++
      Seq("query", "table", "the", "stream", "sort", "aggregate", "er",
        "q", "x")).distinct
    val got = words.toDF("w")
      .select(col("w"), WordPiece.greedyPieces(col("w"), pieces).as("ps"),
        WordPiece.greedyPieceCount(col("w"), pieces).as("n"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getSeq[String](1), r.getInt(2))).toMap
    words.foreach { w =>
      val (ps, n) = got(w)
      val ref = refGreedy(w)
      assert(ps === ref, s"segmentation of '$w'")
      assert(n === ref.length, s"count of '$w'")
      assert(ps.mkString === w, s"round-trip of '$w'")
      ps.foreach(p =>
        assert(p.length == 1 || multi.contains(p), s"piece '$p' of '$w'"))
      // maximality: at each emitted start no LONGER piece matches
      var pos = 0
      ps.foreach { p =>
        ((p.length + 1) to (w.length - pos)).foreach { l =>
          assert(!multi.contains(w.substring(pos, pos + l)),
            s"'$w' at $pos: piece '$p' not maximal")
        }
        pos += p.length
      }
    }
  }

  test("greedy and BPE merge order genuinely disagree under one vocab") {
    // greedy commits to "que" before the higher-rank "ery" can form
    val df = Seq("query").toDF("t").select(
      WordPiece.greedyPieceCount(col("t"), pieces).as("wp"),
      BpeTrainer.bpeTokenCount(col("t"), BpeTrainer.demoMerges).as("bpe"))
    val r = df.collect().head
    assert(r.getInt(0) === 3) // que|r|y
    assert(r.getLong(1) === 2L) // qu|ery
  }

  test("empty and whitespace-free edge words") {
    val got = Seq("", "a", "zzzz").toDF("w")
      .select(WordPiece.greedyPieceCount(col("w"), pieces)).as[Int]
      .collect()
    assert(got === Array(0, 1, 4))
  }
}
