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

  private def hitsOf(edges: Seq[(Long, Long)], iters: Int)
      : (Map[Long, Long], Map[Long, Long]) = {
    val got = PageRank.hits(edges.toDF("s", "d"), "s", "d", iters)
      .collect()
    (got.map(r => r.getAs[Long]("node") -> r.getAs[Long]("hub_scaled")).toMap,
      got.map(r => r.getAs[Long]("node") -> r.getAs[Long]("auth_scaled")).toMap)
  }

  test("hits: hand-computed star graph, two iterations") {
    // 1→10, 2→10, 3→10, 1→20 — 10 is the strong authority, 1 the
    // strong hub (it also links the weak authority 20).
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 20L))
    val (h1, a1) = hitsOf(edges, 1)
    assert(a1(10L) === 1000000L)            // top authority at scale
    assert(a1(20L) === 333333L)             // (S·S) div 3S
    assert(Seq(1L, 2L, 3L).forall(a1(_) == 0L))
    assert(h1(1L) === 1000000L)             // top hub at scale
    assert(h1(2L) === 750000L && h1(3L) === 750000L)
    val (h2, a2) = hitsOf(edges, 2)
    assert(a2(10L) === 1000000L && a2(20L) === 400000L)
    assert(h2(1L) === 1000000L)
    assert(h2(2L) === 714285L && h2(3L) === 714285L)
    assert(h2(10L) === 0L && h2(20L) === 0L)
  }

  test("hits: normalization pins the max of each role to scale") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    val (h, a) = hitsOf(edges, 4)
    assert(h.values.max === 1000000L && a.values.max === 1000000L)
  }

  test("hits: shuffle-partition invariance (integer exactness)") {
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 20L), (4L, 20L))
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    def snap = PageRank.hits(edges.toDF("s", "d"), "s", "d", 3)
      .collect().map(_.toString).sorted.toSeq
    val base = snap
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "5")
      assert(snap === base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
