package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("sketches keep exactly the k smallest hashes per key") {
    val sets = (1L to 50L).map(h => ("a", h)) ++
      Seq(("b", 5L), ("b", 2L), ("b", 9L))
    val sk = Kmv.sketches(sets.toDF("k", "h"), "k", "h", 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(sk.filter(_._1 == "a").map(_._2).sorted.toSeq === (1L to 10L))
    // smaller-than-k set: the sketch IS the set
    assert(sk.filter(_._1 == "b").map(_._2).sorted.toSeq === Seq(2L, 5L, 9L))
  }

  test("pairJaccard is exact when k covers the union") {
    val sets = Seq(
      // a ∩ b = {1,2}, union 6 → jacc 1/3;  c disjoint from both
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("b", 1L), ("b", 2L), ("b", 7L), ("b", 8L),
      ("c", 100L), ("c", 101L)).toDF("k", "h")
    val sk = Kmv.sketches(sets, "k", "h", 64)
    val got = Kmv.pairJaccard(sk, "k", "h", 64)
      .orderBy("key_a", "key_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("k_eff"),
        r.getAs[Long]("n_match"), r.getAs[Double]("jacc_est")))
    assert(got.length === 3) // ab, ac, bc
    val ab = got.find(t => t._1 == "a" && t._2 == "b").get
    assert(ab._3 === 6L && ab._4 === 2L && ab._5 === 2.0 / 6.0)
    val ac = got.find(t => t._1 == "a" && t._2 == "c").get
    assert(ac._4 === 0L && ac._5 === 0.0)
  }

  test("estimate error stays within the advertised rsd on seeded sets") {
    var lcg = 0xB5297A4DL
    def next(bound: Int): Int = {
      lcg = lcg * 6364136223846793005L + 1442695040888963407L
      (((lcg >>> 33) % bound + bound) % bound).toInt
    }
    val k = 128
    // two sets of ~2000 hashes with a planted ~40% overlap
    val shared = (0 until 800).map(_ => next(1 << 30).toLong).distinct
    val onlyA = (0 until 1200).map(_ => next(1 << 30).toLong).distinct
    val onlyB = (0 until 1200).map(_ => next(1 << 30).toLong).distinct
    val a = (shared ++ onlyA).distinct
    val b = (shared ++ onlyB).distinct
    val exact = a.intersect(b).size.toDouble / a.union(b).distinct.size
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("k", "h")
    val sk = Kmv.sketches(df, "k", "h", k)
    val est = Kmv.pairJaccard(sk, "k", "h", k)
      .collect().head.getAs[Double]("jacc_est")
    // rsd ≈ sqrt(j(1-j)/k) ≈ 0.04 here; allow 4 sigma
    assert(math.abs(est - exact) < 4 * math.sqrt(exact * (1 - exact) / k),
      s"est $est vs exact $exact")
  }
}
