package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SemDeDupSpec extends SparkSpec {

  // tiny synthetic corpus: three tight semantic groups plus isolated
  // vectors, 4-dim, ids chosen so hash seed order is nontrivial
  private def vecs = {
    import spark.implicits._
    Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.99f, 0.01f, 0.0f, 0.0f)),   // near-dup of 0
      (2L, Seq(0.98f, 0.02f, 0.01f, 0.0f)),  // near-dup of 0/1
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Seq(0.0f, 0.99f, 0.02f, 0.0f)),   // near-dup of 3
      (5L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
      (6L, Seq(0.0f, 0.0f, 0.0f, 1.0f)),
      (7L, Seq(0.5f, 0.5f, 0.5f, 0.5f)),
      (8L, Seq(-1.0f, 0.1f, 0.0f, 0.0f)),
      (9L, Seq(0.1f, -1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  test("semantic groups never cross cluster boundaries") {
    val out = Dedup.semDeDup(vecs, "vec_id", "embedding", k = 3,
      iters = 2, tau = 0.95).collect()
    // each component lives in exactly one cluster
    val byComp = out.groupBy(_.getAs[Long]("component"))
    for ((comp, rows) <- byComp)
      assert(rows.map(_.getAs[Int]("cluster")).distinct.length === 1,
        s"component $comp straddles clusters")
    // every vector appears exactly once, each group keeps exactly one
    assert(out.map(_.getAs[Long]("vec_id")).sorted === (0L to 9L).toArray)
    for ((comp, rows) <- byComp) {
      assert(rows.map(_.getAs[Int]("keep")).sum === 1,
        s"component $comp must keep exactly one survivor")
      val keeper = rows.find(_.getAs[Int]("keep") == 1).get
      assert(rows.forall(_.getAs[Long]("kept_by") ==
        keeper.getAs[Long]("vec_id")))
      assert(rows.forall(_.getAs[Long]("n_group") == rows.length))
    }
  }

  test("survivor is the group member FARTHEST from its centroid (ties: lowest id)") {
    val out = Dedup.semDeDup(vecs, "vec_id", "embedding", k = 3,
      iters = 2, tau = 0.95).collect()
    for ((_, rows) <- out.groupBy(_.getAs[Long]("component"))
        if rows.length > 1) {
      val keeper = rows.find(_.getAs[Int]("keep") == 1).get
      val maxD2 = rows.map(_.getAs[Double]("d2c")).max
      assert(keeper.getAs[Double]("d2c") === maxD2,
        "SemDeDup keeps the least-centroid-similar member")
      val tied = rows.filter(_.getAs[Double]("d2c") == maxD2)
      assert(keeper.getAs[Long]("vec_id") ===
        tied.map(_.getAs[Long]("vec_id")).min)
    }
    // the corpus actually produced at least one multi-member group —
    // otherwise this test pinned nothing
    assert(out.exists(_.getAs[Long]("n_group") > 1))
  }

  test("null-embedding rows come back keep=1 singleton, never dropped") {
    import spark.implicits._
    val withNull = vecs.unionByName(
      Seq((99L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>")))
    val out = Dedup.semDeDup(withNull, "vec_id", "embedding", 3, 2, 0.95)
      .collect()
    // every input row present — the undecidable row included
    assert(out.map(_.getAs[Long]("vec_id")).sorted ===
      ((0L to 9L) :+ 99L).toArray)
    val nr = out.find(_.getAs[Long]("vec_id") == 99L).get
    assert(nr.getAs[Int]("keep") === 1 && nr.getAs[Long]("n_group") === 1L &&
      nr.getAs[Long]("kept_by") === 99L && nr.getAs[Long]("component") === 99L)
    assert(nr.isNullAt(nr.fieldIndex("cluster")) &&
      nr.isNullAt(nr.fieldIndex("d2c")))
    // and it perturbs nothing: the decided rows match the null-free run
    val base = Dedup.semDeDup(vecs, "vec_id", "embedding", 3, 2, 0.95)
      .orderBy("vec_id").collect().toSeq
    assert(out.filter(_.getAs[Long]("vec_id") != 99L)
      .sortBy(_.getAs[Long]("vec_id")).toSeq === base)
  }

  test("semDeDupCross: strictly cross-frame, cluster-confined, eval held out of training") {
    import spark.implicits._
    val corpus = vecs.filter(col("vec_id") % 2 === 0)
    val evalA = vecs.filter(col("vec_id") % 2 === 1)
    val prs = Dedup.semDeDupCross(corpus, evalA, "vec_id", "embedding",
      k = 3, iters = 2, tau = 0.9).collect()
    val corpusIds = (0L to 9L).filter(_ % 2 == 0).toSet
    // sides are strictly from their frames — no self-frame pairs
    assert(prs.forall(r => corpusIds(r.getAs[Long]("corpus_id")) &&
      !corpusIds(r.getAs[Long]("eval_id"))))
    assert(prs.forall(_.getAs[Double]("cosine") >= 0.9))
    // the tight group 0/1/2 splits corpus {0,2} / eval {1}: both cross
    // pairs must surface (they share a cell under any sane clustering)
    val got = prs.map(r => (r.getAs[Long]("corpus_id"),
      r.getAs[Long]("eval_id"))).toSet
    assert(got.contains((0L, 1L)) && got.contains((2L, 1L)),
      s"expected the 0-1 and 2-1 cross pairs, got $got")
    // held-out training: centroids are a function of the corpus ONLY,
    // so shrinking the eval frame cannot change surviving verdicts for
    // the eval vectors both runs share
    val evalB = evalA.filter(col("vec_id") =!= 9L)
    val prsB = Dedup.semDeDupCross(corpus, evalB, "vec_id", "embedding",
      3, 2, 0.9).collect()
      .map(r => (r.getAs[Long]("corpus_id"), r.getAs[Long]("eval_id"),
        r.getAs[Double]("cosine"))).toSet
    val prsAShared = prs.filter(_.getAs[Long]("eval_id") != 9L)
      .map(r => (r.getAs[Long]("corpus_id"), r.getAs[Long]("eval_id"),
        r.getAs[Double]("cosine"))).toSet
    assert(prsB === prsAShared)
    // partitioning invariance
    val rep = Dedup.semDeDupCross(corpus.repartition(5),
        evalA.repartition(3), "vec_id", "embedding", 3, 2, 0.9)
      .collect().map(r => (r.getAs[Long]("corpus_id"),
        r.getAs[Long]("eval_id"), r.getAs[Double]("cosine"))).toSet
    assert(rep === prs.map(r => (r.getAs[Long]("corpus_id"),
      r.getAs[Long]("eval_id"), r.getAs[Double]("cosine"))).toSet)
  }

  test("partitioning-invariant and tau-monotone") {
    val a = Dedup.semDeDup(vecs, "vec_id", "embedding", 3, 2, 0.95)
      .orderBy("vec_id").collect().toSeq
    val b = Dedup.semDeDup(vecs.repartition(7), "vec_id", "embedding",
      3, 2, 0.95).orderBy("vec_id").collect().toSeq
    assert(a === b)
    // lower tau can only merge more: dropped set grows monotonically
    def dropped(tau: Double) =
      Dedup.semDeDup(vecs, "vec_id", "embedding", 3, 2, tau)
        .filter(col("keep") === 0).collect()
        .map(_.getAs[Long]("vec_id")).toSet
    assert(dropped(0.999).subsetOf(dropped(0.9)))
  }
}
