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
