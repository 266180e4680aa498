package graft.operators

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a a b"),   // two 'a', one 'b'
    (2L, "a c"),     // one 'a'
    (3L, "b b b"),   // three 'b'
    (4L, "c c c")    // no query terms
  ).toDF("doc_id", "text")

  test("scores match the closed-form formula") {
    val k1 = 1.25
    val b = 0.75
    val out = Bm25.topK(docs, "doc_id", "text", Seq("a", "b"), k1, b, k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("score"), r.getAs[Int]("rank"))).toMap
    // n=4 docs, avgdl = (3+2+3+3)/4 = 2.75; df(a)=2, df(b)=2
    val idf = (4.0 - 2.0 + 0.5) / (2.0 + 0.5) // both terms: 1.0
    def term(tf: Double, dl: Double) =
      idf * tf * (k1 + 1) / (tf + k1 * (1.0 - b + b * dl / 2.75))
    val d1 = term(2, 3) + term(1, 3) // a twice + b once
    val d2 = term(1, 2)
    val d3 = term(3, 3)
    assert(math.abs(out(1L)._1 - d1) < 1e-12)
    assert(math.abs(out(2L)._1 - d2) < 1e-12)
    assert(math.abs(out(3L)._1 - d3) < 1e-12)
    assert(!out.contains(4L)) // no query terms → no score
    // d1 (two terms) outranks d3 (one frequent term) outranks d2
    assert(out(1L)._2 === 1 && out(3L)._2 === 2 && out(2L)._2 === 3)
  }

  test("rarer terms weigh more (idf ordering)") {
    val corpus = Seq(
      (1L, "common common"), (2L, "common rare"),
      (3L, "common x"), (4L, "common y")
    ).toDF("doc_id", "text")
    val out = Bm25.topK(corpus, "doc_id", "text", Seq("common", "rare"),
        1.25, 0.75, 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("rank"))
      .toMap
    // doc 2 has the rare term (df=1) — beats doc 1's double 'common'
    assert(out(2L) === 1)
  }

  test("topKPerQuery ≡ per-query topK runs (sorted term lists)") {
    val corpus = Seq(
      (1L, "a a b c"), (2L, "a c c"), (3L, "b b d"), (4L, "c d d a")
    ).toDF("doc_id", "text")
    val queries = Seq(
      (10L, "a"), (10L, "b"),          // sorted lists so the fixed
      (20L, "c"), (20L, "d")           // written fold == sorted fold
    ).toDF("query_id", "term")
    val batch = Bm25.topKPerQuery(corpus, "doc_id", "text",
        queries, "query_id", "term", 1.25, 0.75, k = 3)
      .select("query_id", "rank", "doc_id", "score")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val single = Seq(10L -> Seq("a", "b"), 20L -> Seq("c", "d")).flatMap {
      case (qid, terms) =>
        Bm25.topK(corpus, "doc_id", "text", terms, 1.25, 0.75, k = 3)
          .select("rank", "doc_id", "score")
          .collect().map(r => (qid, r.getInt(0), r.getLong(1),
            r.getDouble(2)))
    }.toSet
    assert(batch === single) // bit-exact, including the doubles
  }

  test("top-k truncates deterministically with id tie-break") {
    val corpus = (1L to 20L).map(i => (i, "t")).toDF("doc_id", "text")
    val out = Bm25.topK(corpus, "doc_id", "text", Seq("t"), 1.25, 0.75, 5)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(out === Seq(1L, 2L, 3L, 4L, 5L)) // equal scores → lowest ids
  }
}
