package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Skewed corpus: token t0 everywhere, a zipf-ish tail, spread
    * across many partitions so candidates must survive the merge.
    */
  private lazy val docs = (1 to 400).map { i =>
    val words = Seq("t0") ++
      (1 to 5).map(j => s"t${(i * j) % 37}") ++
      Seq(s"rare$i")
    (i.toLong, words.mkString(" "))
  }.toDF("doc_id", "text").repartition(13)

  private def naive(minFreq: Double) = {
    val toks = docs.select(
      explode(graft.functions.TextFns.tokens(col("text"))).as("token"))
    val n = toks.count()
    toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= math.ceil(minFreq * n).toLong)
      .orderBy("token")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  test("frequentTokens is EXACT: equals the naive full groupBy") {
    for (mf <- Seq(0.001, 0.01, 0.1)) {
      val got = HeavyHitters.frequentTokens(docs, "text", mf)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got === naive(mf), s"minFreq=$mf")
    }
  }

  test("frequentShingles matches the naive shingle groupBy") {
    val got = HeavyHitters.frequentShingles(docs, "text", 2, 0.01)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val sh = docs.select(explode(graft.functions.TextFns.shingles(
      graft.functions.TextFns.tokens(col("text")), 2)).as("shingle"))
    val n = sh.count()
    val want = sh.groupBy("shingle").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= math.ceil(0.01 * n).toLong)
      .orderBy("shingle")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === want)
  }

  test("candidate capacity is bounded and the guarantee is enforced") {
    // margin 1.0 at minFreq 0.5 -> k=2 counters per partition, yet the
    // dominant token must still surface with its exact count
    val heavy = (1 to 50).map(i => (i.toLong, "x x x y" + i)).toDF("doc_id", "text")
    val out = HeavyHitters.frequentTokens(heavy, "text", 0.5, margin = 1.0)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("x", 150L)))
    // parameters that cannot honor the guarantee must refuse, not
    // silently under-report
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentTokens(heavy, "text", 0.0)
    }
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentTokens(heavy, "text", 0.5, margin = 0.5)
    }
  }
}
