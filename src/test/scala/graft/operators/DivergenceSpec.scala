package graft.operators

import graft.SparkSpec

class DivergenceSpec extends SparkSpec {
  import spark.implicits._

  test("tokenTV: hand-computed distance, symmetry encoded as src1<src2") {
    val docs = Seq(
      ("A", "a a b"), ("B", "a b b")
    ).toDF("source", "text")
    val out = Divergence.tokenTV(docs, "source", "text").collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("src1") === "A" && r.getAs[String]("src2") === "B")
    assert(r.getAs[Long]("n1") === 3L && r.getAs[Long]("n2") === 3L)
    assert(r.getAs[Long]("n_common") === 2L)
    // min-mass: a -> min(2*3,1*3)=3, b -> min(1*3,2*3)=3; TV = 1-6/9
    assert(math.abs(r.getAs[Double]("tv") - 1.0 / 3) < 1e-6)
  }

  test("tokenTV: identical slices are at 0; disjoint vocab pairs drop out") {
    val docs = Seq(
      ("A", "x y z"), ("B", "x y z"), ("C", "p q r")
    ).toDF("source", "text")
    val out = Divergence.tokenTV(docs, "source", "text").collect()
      .map(r => (r.getAs[String]("src1"), r.getAs[String]("src2")) -> r).toMap
    assert(out(("A", "B")).getAs[Double]("tv") === 0.0)
    // C shares nothing with A/B: TV=1 pairs are omitted (inner join on
    // the shared vocabulary — the absence IS the signal)
    assert(!out.contains(("A", "C")) && !out.contains(("B", "C")))
  }

  test("tokenTV is partitioning-invariant and bounded in [0,1]") {
    val docs = (1 to 60).map { i =>
      (s"src${i % 3}", s"tok${i % 7} tok${i % 5} tok${i % 11} filler")
    }.toDF("source", "text")
    val a = Divergence.tokenTV(docs, "source", "text").collect()
    val b = Divergence.tokenTV(docs.repartition(7), "source", "text").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    a.foreach { r =>
      val tv = r.getAs[Double]("tv")
      assert(tv >= 0.0 && tv <= 1.0)
    }
  }
}
