package graft.operators

import graft.SparkSpec

class CorpusDiffSpec extends SparkSpec {
  import spark.implicits._

  test("all four verdicts, keyed by id, content compared by hash") {
    val v1 = Seq((1L, "same"), (2L, "old text"), (3L, "gone"))
      .toDF("doc_id", "text")
    val v2 = Seq((1L, "same"), (2L, "new text"), (4L, "fresh"))
      .toDF("doc_id", "text")
    val d = CorpusDiff.diff(v1, v2, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("status")).toMap
    assert(d === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("summary rolls up counts and id ranges per status") {
    val v1 = (1L to 100L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val v2 = (1L to 120L).filter(_ % 10 != 0)
      .map(i => (i, if (i % 7 == 0) s"doc$i!" else s"doc$i"))
      .toDF("doc_id", "text")
    val s = CorpusDiff.summary(v1, v2, "doc_id", "text")
      .collect().map(r => r.getAs[String]("status") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("lo"),
          r.getAs[Long]("hi")))).toMap
    // added: 101..120 minus %10==0 (110, 120) → 18 docs
    assert(s("added") === ((18L, 101L, 119L)))
    // removed: multiples of 10 in 1..100 → 10 docs
    assert(s("removed") === ((10L, 10L, 100L)))
    // changed: %7==0 in 1..100, excluding %10==0 (70) → 13 docs
    assert(s("changed") === ((13L, 7L, 98L)))
    assert(s("unchanged")._1 === 100L - 10L - 13L)
  }

  test("empty old version marks everything added") {
    val v1 = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val v2 = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val d = CorpusDiff.diff(v1, v2, "doc_id", "text").collect()
    assert(d.length === 2 && d.forall(_.getAs[String]("status") == "added"))
  }
}
