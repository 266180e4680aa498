package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed interval join equals the naive inequality join") {
    val rows = Seq(
      (1L, 10L, 0L), (1L, 11L, 50L), (1L, 12L, 99L), (1L, 13L, 101L),
      (1L, 14L, 200L), (2L, 20L, 0L), (2L, 21L, 100L), (3L, 30L, 5L)
    ).toDF("k", "id", "t")
    val delta = 100L
    val bucketed = RangeJoin.withinDeltaPairs(rows, "k", "id", "t", delta)
      .select("id1", "id2", "dt").orderBy("id1", "id2")
      .collect().map(_.toSeq).toSeq
    val naive = rows.as("a").join(rows.as("b"),
        col("a.k") === col("b.k") && col("a.id") < col("b.id") &&
        abs(col("b.t") - col("a.t")) <= delta)
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        (col("b.t") - col("a.t")).as("dt"))
      .orderBy("id1", "id2").collect().map(_.toSeq).toSeq
    assert(bucketed === naive)
    // boundary cases present: exactly delta apart (11,13? 50→101 is 51... )
    assert(naive.exists { case Seq(_, _, dt: Long) => math.abs(dt) == delta })
  }

  test("id order against time order: higher-id-earlier-time pairs survive") {
    // the round-6 10x-sweep regression: ids say NOTHING about time
    // order (replicated corpora jump ids by 1e9 over repeated
    // timestamps), so the bucketing must catch pairs where the
    // HIGHER id is in the EARLIER bucket. Here id 99 sits at t=95
    // (bucket 0), id 5 at t=105 (bucket 1): |dt| = 10 <= 100 — the
    // previous-bucket-only replication lost exactly this shape.
    val rows = Seq(
      (1L, 5L, 105L), (1L, 99L, 95L),   // inverted across the boundary
      (1L, 7L, 199L), (1L, 80L, 201L),  // inverted, same direction pair
      (1L, 50L, 300L)
    ).toDF("k", "id", "t")
    val delta = 100L
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("id1", "id2", "dt").orderBy("id1", "id2")
        .collect().map(_.toSeq).toSeq
    val bucketed = canon(RangeJoin.withinDeltaPairs(rows, "k", "id", "t", delta))
    val naive = canon(rows.as("a").join(rows.as("b"),
        col("a.k") === col("b.k") && col("a.id") < col("b.id") &&
        abs(col("b.t") - col("a.t")) <= delta)
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        (col("b.t") - col("a.t")).as("dt")))
    assert(bucketed === naive)
    // the inverted pair is actually in the answer (guards the fixture)
    assert(naive.exists { case Seq(a, b, dt: Long) =>
      a == 5L && b == 99L && dt == -10L })
  }
}
