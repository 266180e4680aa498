package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // naive single-node mirror of the operator's arithmetic ------------
  private def rh(s: String): Long =
    s.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % 1000000007L)
  private def feats(text: String, b: Int): Seq[Long] = {
    val toks = text.trim.split("\\s+").toSeq
    val uni = toks.map(rh)
    val bi =
      if (toks.length >= 2) toks.sliding(2).map(_.mkString(" ")).map(rh).toSeq
      else Seq.empty[Long]
    (uni ++ bi).map(_ % b)
  }
  private def naiveWeights(docs: Seq[(Long, String, Boolean)], b: Int)
      : Map[Long, Double] = {
    val occ = docs.flatMap { case (_, t, tg) => feats(t, b).map(_ -> tg) }
    val cnt = occ.groupBy(_._1).map { case (bk, os) =>
      bk -> (os.count(_._2).toLong, os.count(!_._2).toLong)
    }
    val nt = cnt.values.map(_._1).sum
    val nr = cnt.values.map(_._2).sum
    val v = cnt.size.toLong
    def ratio(bk: Long): Double = {
      val (ct, cr) = cnt(bk)
      ((ct + 1).toDouble / (nt + v).toDouble) /
        ((cr + 1).toDouble / (nr + v).toDouble)
    }
    docs.filter(!_._3).map { case (id, t, _) =>
      id -> feats(t, b).sorted.foldLeft(1.0)((acc, bk) => acc * ratio(bk))
    }.toMap
  }

  private lazy val corpus = Seq(
    (1L, "a a b", true),
    (2L, "b c a", true),
    (3L, "a b b", false),
    (4L, "c c", false),
    (5L, "a a a b", false)
  )
  private lazy val df = corpus.toDF("doc_id", "text", "is_t")

  test("weights are bit-exact vs the naive single-node mirror") {
    for (b <- Seq(4, 256)) { // b=4 forces bucket collisions
      val out = Dsir.importanceWeights(df, "doc_id", "text", col("is_t"), b)
        .select("doc_id", "weight").as[(Long, Double)].collect().toMap
      assert(out === naiveWeights(corpus, b), s"nBuckets=$b")
    }
  }

  test("target documents are excluded; n_feats = unigrams + bigrams") {
    val out = Dsir.importanceWeights(df, "doc_id", "text", col("is_t"), 256)
      .select("doc_id", "n_feats").as[(Long, Int)].collect().toMap
    assert(out.keySet === Set(3L, 4L, 5L))
    assert(out(3L) === 3 + 2) // "a b b": 3 unigrams, 2 bigrams
    assert(out(4L) === 2 + 1)
    assert(out(5L) === 4 + 3)
  }

  test("target-resembling candidates outrank dissimilar ones") {
    val skewed = Seq(
      (1L, "x x y x", true), (2L, "y x x", true),
      (10L, "x x y", false), (11L, "z w z w", false))
    val sel = Dsir.selectTop(skewed.toDF("doc_id", "text", "is_t"),
        "doc_id", "text", col("is_t"), 1024, 2)
      .select("rank", "doc_id").as[(Int, Long)].collect().toMap
    assert(sel(1) === 10L) // the x/y doc matches the target distribution
    assert(sel(2) === 11L)
  }

  test("the ratio model is bounded by nBuckets") {
    val rat = Dsir.featureRatios(df, "text", col("is_t"), 4)
    assert(rat.count() <= 4)
  }
}
