package graft.operators

import graft.SparkSpec

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // two tight 2-D blobs far apart: any sane k=2 run must split them
  private lazy val blobs = Seq(
    (1L, Array(0.0f, 0.1f)), (2L, Array(0.1f, 0.0f)),
    (3L, Array(0.05f, 0.05f)),
    (4L, Array(10.0f, 10.1f)), (5L, Array(10.1f, 10.0f)),
    (6L, Array(10.05f, 10.05f))
  ).toDF("vec_id", "embedding")

  test("fit separates well-spread blobs and reports exact means") {
    val out = KMeans.fit(blobs, "vec_id", "embedding", k = 2, iters = 3,
      outDims = 2).collect()
    // 2 clusters x 2 dims
    assert(out.length === 4)
    val byCluster = out.groupBy(_.getAs[Int]("cluster"))
    assert(byCluster.keySet === Set(0, 1))
    // each cluster holds one full blob of 3 vectors
    out.foreach(r => assert(r.getAs[Long]("n_vecs") === 3L))
    // means: one cluster near 0.05, the other near 10.05, per dim
    val means = byCluster.map { case (c, rows) =>
      c -> rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[Double]("mean_v"))
    }
    val lo = means.values.find(_.head < 1.0).get
    val hi = means.values.find(_.head > 1.0).get
    lo.foreach(m => assert(math.abs(m - 0.05) < 1e-4))
    hi.foreach(m => assert(math.abs(m - 10.05) < 1e-4))
  }

  test("fit is deterministic across runs and partitionings") {
    val a = KMeans.fit(blobs, "vec_id", "embedding", 2, 3, 2).collect()
    val b = KMeans.fit(blobs.repartition(7), "vec_id", "embedding", 2, 3, 2)
      .collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("empty cluster keeps its previous centroid instead of vanishing") {
    // all six points identical: after the first assignment every point
    // goes to ONE cluster (lowest id wins ties); the other seed must
    // carry its centroid through all iterations without NPE/absence
    val same = Seq.tabulate(6)(i => ((i + 1).toLong, Array(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val out = KMeans.fit(same, "vec_id", "embedding", k = 2, iters = 3,
      outDims = 2).collect()
    // only the surviving (non-empty) cluster reports rows
    assert(out.map(_.getAs[Int]("cluster")).distinct.length === 1)
    assert(out.forall(_.getAs[Long]("n_vecs") === 6L))
    assert(out.sortBy(_.getAs[Int]("pos"))
      .map(_.getAs[Double]("mean_v")).toSeq === Seq(1.0, 2.0))
  }

  test("null vectors are excluded, k > non-null rows rejected") {
    val withNull = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, null.asInstanceOf[Array[Float]])
    ).toDF("vec_id", "embedding")
    val out = KMeans.fit(withNull, "vec_id", "embedding", 1, 2, 2).collect()
    assert(out.forall(_.getAs[Long]("n_vecs") === 1L))
    intercept[IllegalArgumentException] {
      KMeans.fit(withNull, "vec_id", "embedding", k = 2, iters = 1)
    }
  }
}
