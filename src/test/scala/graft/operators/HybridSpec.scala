package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HybridSpec extends SparkSpec {
  import spark.implicits._

  // hand-built ranked legs: lexical retrieved {1,2,3}, vector {2,3,5}
  private lazy val lex = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
  private lazy val vec = Seq((2L, 1), (3L, 2), (5L, 3)).toDF("id", "rank")

  test("rrfFuse matches the closed-form RRF scores") {
    val out = Hybrid.rrfFuse(Seq("lex" -> lex, "vec" -> vec), "id",
        rrfK = 60, k = 10)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("rrf_score"), r.getAs[Int]("rank")))
      .toMap
    def s(r: Int) = 1.0 / (60.0 + r)
    // both-leg docs first: 2 = 1/62+1/61, 3 = 1/63+1/62, then 1, then 5
    assert(out(2L)._1 === s(2) + s(1))
    assert(out(3L)._1 === s(3) + s(2))
    assert(out(1L)._1 === s(1))
    assert(out(5L)._1 === s(3))
    assert(out(2L)._2 === 1 && out(3L)._2 === 2
      && out(1L)._2 === 3 && out(5L)._2 === 4)
  }

  test("absent-leg ranks are null, not zero") {
    val rows = Hybrid.rrfFuse(Seq("lex" -> lex, "vec" -> vec), "id", 60, 10)
      .collect().map(r => r.getAs[Long]("id") ->
        (Option(r.get(r.fieldIndex("lex_rank"))),
          Option(r.get(r.fieldIndex("vec_rank"))))).toMap
    assert(rows(1L) === (Some(1), None))
    assert(rows(5L) === (None, Some(3)))
    assert(rows(2L) === (Some(2), Some(1)))
  }

  test("ties break on id ascending; k truncates after fusion") {
    // ids 1 and 5 tie (single leg, rank where? 1 has lex rank 1, 5 has
    // vec rank 3) — make a symmetric tie instead
    val l2 = Seq((7L, 1), (9L, 2)).toDF("id", "rank")
    val v2 = Seq((8L, 1), (9L, 2)).toDF("id", "rank")
    val out = Hybrid.rrfFuse(Seq("l" -> l2, "v" -> v2), "id", 60, 2)
      .select("rank", "id").as[(Int, Long)].collect().toSeq
    // 9 fused from both legs wins; 7 and 8 tie at 1/61 → id asc → 7
    assert(out === Seq(1 -> 9L, 2 -> 7L))
  }

  test("rrfFuseBatch ≡ per-query rrfFuse (bit-exact)") {
    val lexB = Seq((10L, 1L, 1), (10L, 2L, 2), (20L, 3L, 1), (20L, 4L, 2))
      .toDF("query_id", "id", "rank")
    val vecB = Seq((10L, 2L, 1), (10L, 5L, 2), (20L, 4L, 1), (20L, 1L, 2))
      .toDF("query_id", "id", "rank")
    val batch = Hybrid.rrfFuseBatch(
        Seq("lex" -> lexB, "vec" -> vecB), "query_id", "id", 60, 3)
      .select("query_id", "rank", "id", "rrf_score")
      .as[(Long, Int, Long, Double)].collect().toSet
    val single = Seq(10L, 20L).flatMap { qid =>
      Hybrid.rrfFuse(Seq(
          "lex" -> lexB.filter(col("query_id") === qid).drop("query_id"),
          "vec" -> vecB.filter(col("query_id") === qid).drop("query_id")),
        "id", 60, 3)
        .select("rank", "id", "rrf_score")
        .as[(Int, Long, Double)].collect()
        .map { case (r, i, sc) => (qid, r, i, sc) }
    }.toSet
    assert(batch === single)
  }

  test("leg fold order is the written order (score is deterministic)") {
    // same legs, both orders: scores must be IDENTICAL doubles because
    // addition of two exactly-divided terms is commutative here only
    // up to fp-association — with two legs a+b == b+a exactly, but the
    // written-order contract is what the oracle relies on; pin it
    val a = Hybrid.rrfFuse(Seq("lex" -> lex, "vec" -> vec), "id", 60, 10)
      .select("id", "rrf_score").as[(Long, Double)].collect().toMap
    val b = Hybrid.rrfFuse(Seq("vec" -> vec, "lex" -> lex), "id", 60, 10)
      .select("id", "rrf_score").as[(Long, Double)].collect().toMap
    assert(a === b)
  }
}
