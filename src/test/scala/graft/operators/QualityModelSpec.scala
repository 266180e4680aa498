package graft.operators

import graft.SparkSpec
import graft.expressions.RollingHash

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  private def milli(token: String): Long = {
    val b = RollingHash.hash(token) % QualityModel.Buckets
    (b * 2654435761L + 98765L) % 2001L - 1000L
  }

  test("score: exact long milli-weight sum and mean logit") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha alpha"))
      .toDF("doc_id", "text")
    val out = QualityModel.score(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val m1 = milli("alpha") + milli("beta") + milli("gamma")
    assert(out(1L).getAs[Long]("n_tokens") === 3L)
    assert(out(1L).getAs[Long]("sum_milli") === m1)
    assert(math.abs(out(1L).getAs[Double]("logit") - m1 / 3000.0) < 1e-6)
    // repeated tokens weigh in every occurrence (bag, not set)
    assert(out(2L).getAs[Long]("sum_milli") === 2 * milli("alpha"))
  }

  test("score: keep flag follows the threshold over the rounded logit") {
    // craft two docs on either side of a nonzero threshold
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha alpha"))
      .toDF("doc_id", "text")
    val logits = QualityModel.score(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("logit")).toMap
    val mid = (logits(1L) + logits(2L)) / 2
    val keeps = QualityModel.score(docs, "doc_id", "text", threshold = mid)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("keep")).toMap
    assert(keeps(1L) === (if (logits(1L) > mid) 1 else 0))
    assert(keeps(2L) === (if (logits(2L) > mid) 1 else 0))
    assert(keeps.values.sum === 1) // exactly one side clears the midpoint
  }

  test("score is partitioning-invariant (pure narrow map)") {
    val docs = (1L to 50L).map(i => (i, s"tok$i common word$i extra"))
      .toDF("doc_id", "text")
    val a = QualityModel.score(docs, "doc_id", "text").collect()
    val b = QualityModel.score(docs.repartition(7), "doc_id", "text").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }
}
