package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, Long] =
    PageRank.run(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getAs[Long]("node") ->
        r.getAs[Long]("rank_scaled")).toMap

  test("a 2-cycle is a fixed point at the scale unit") {
    // A↔B: each node receives exactly what it sends, every iteration
    for (it <- Seq(1, 3)) {
      val r = ranksOf(Seq((1L, 2L), (2L, 1L)), it)
      assert(r === Map(1L -> 1000000L, 2L -> 1000000L))
    }
  }

  test("star graph: hand-computed exact integer ranks, dangling mass drops") {
    // A→B, A→C; B and C are dangling (their mass leaks)
    val r1 = ranksOf(Seq((1L, 2L), (1L, 3L)), 1)
    assert(r1 === Map(1L -> 150000L, 2L -> 575000L, 3L -> 575000L))
    val r2 = ranksOf(Seq((1L, 2L), (1L, 3L)), 2)
    // r2(B) = 150000 + (85 · (150000 div 2)) div 100 = 213750
    assert(r2 === Map(1L -> 150000L, 2L -> 213750L, 3L -> 213750L))
    assert(r2.values.sum < r1.values.sum, "dangling mass must leak")
  }

  test("duplicate edge rows do not double-count contributions") {
    val dup = ranksOf(Seq((1L, 2L), (1L, 2L), (1L, 3L)), 2)
    val ded = ranksOf(Seq((1L, 2L), (1L, 3L)), 2)
    assert(dup === ded)
  }

  test("deterministic under repartitioning (exact integer iterations)") {
    val edges = (1L to 200L).map(i => (i % 37, (i * i) % 41))
    val a = PageRank.run(edges.toDF("src", "dst"), "src", "dst", 3)
      .orderBy("node").collect().map(_.toSeq).toSeq
    val b = PageRank.run(edges.toDF("src", "dst").repartition(13),
        "src", "dst", 3)
      .orderBy("node").collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  private def pprOf(edges: Seq[(Long, Long)], seeds: Seq[Long], iters: Int)
      : Map[Long, Long] =
    PageRank.personalized(edges.toDF("src", "dst"), "src", "dst",
        seeds.toDF("seed"), iters)
      .collect().map(r => r.getAs[Long]("node") ->
        r.getAs[Long]("rank_scaled")).toMap

  test("personalized: teleport returns to the seed; far nodes get 0") {
    // chain 1→2→3→4, seed {1}: after 1 iter only 1 (teleport) and 2
    // (one hop from the seed's initial mass) hold rank
    val r1 = pprOf(Seq((1L, 2L), (2L, 3L), (3L, 4L)), Seq(1L), 1)
    assert(r1(1L) === 150000L)
    assert(r1(2L) === 850000L)
    assert(r1(3L) === 0L && r1(4L) === 0L)
    // iter 2: mass reaches 3 = (85 · 850000) div 100; 2 gets the
    // seed's retained 150000 forwarded: (85·150000) div 100 = 127500
    val r2 = pprOf(Seq((1L, 2L), (2L, 3L), (3L, 4L)), Seq(1L), 2)
    assert(r2(3L) === 722500L)
    assert(r2(2L) === 127500L)
  }

  test("personalized with ALL nodes as seeds equals uniform PageRank") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 2L))
    val uni = ranksOf(edges, 3)
    val ppr = pprOf(edges, Seq(1L, 2L, 3L), 3)
    assert(uni === ppr)
  }

  test("personalized: unknown seed ids are ignored, empty seed set all-zero") {
    val edges = Seq((1L, 2L), (2L, 1L))
    val r = pprOf(edges, Seq(99L), 2)
    assert(r.values.forall(_ == 0L))
  }
}
