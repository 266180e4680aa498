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
}
