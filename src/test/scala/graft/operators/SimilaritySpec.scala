package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(2.0f, 0.0f, 0.0f)),   // same direction as 1
    (3L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal to 1
    (4L, Array(1.0f, 1.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("cosinePairs: colinear = 1, orthogonal filtered out") {
    val pairs = Similarity.cosinePairs(vecs, "vec_id", "embedding", tau = 0.9)
      .collect().map(r => (r.getAs[Long]("v1"), r.getAs[Long]("v2"),
        r.getAs[Double]("cosine")))
    assert(pairs.exists { case (a, b, c) => a == 1L && b == 2L && c === 1.0 })
    assert(!pairs.exists { case (a, b, _) => (a, b) == (1L, 3L) })
  }

  test("topK ranks by cosine with id tie-break") {
    val top = Similarity.topK(vecs, vecs.filter(col("vec_id") === 1L),
      "vec_id", "embedding", k = 2)
      .orderBy("rank").collect()
    assert(top.map(_.getAs[Long]("corpus_id")).toSeq === Seq(2L, 4L))
    assert(top(0).getAs[Double]("cosine") === 1.0)
  }

  test("lshBucket: colinear vectors land in the same bucket") {
    val buckets = vecs.select(col("vec_id"),
        Similarity.lshBucket(col("embedding"), 8).as("b"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("b")).toMap
    assert(buckets(1L) === buckets(2L)) // scaling never flips a sign bit
    assert(buckets.values.forall(b => b >= 0 && b < 256))
  }

  test("lshTopK restricts candidates to the query's bucket") {
    val out = Similarity.lshTopK(vecs, vecs.filter(col("vec_id") === 1L),
      "vec_id", "embedding", nBits = 8, k = 3).collect()
    // every returned candidate shares the query's bucket
    val qb = vecs.select(Similarity.lshBucket(col("embedding"), 8))
      .where(col("vec_id") === 1L)
    out.foreach { r =>
      assert(r.getAs[Long]("query_id") === 1L)
      assert(r.getAs[Double]("cosine") <= 1.0 + 1e-9)
    }
  }
}
