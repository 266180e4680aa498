package graft.operators

import graft.SparkSpec

/** Greedy max-coverage semantics: textbook greedy order on a
  * hand-built incidence, marginal (not raw-size) gains, smallest-id
  * ties, early stop, and partition invariance.
  */
class SetCoverSpec extends SparkSpec {
  import spark.implicits._

  // item 1: {a,b,c,d}; item 2: {c,d,e}; item 3: {e,f}; item 4: {a}
  // greedy: 1 (gain 4) -> 3 (marginal 2: e,f — beats 2's marginal 1)
  //         -> everything covered -> early stop (zero-gain items are
  //         never picked: they vanish from the anti-joined incidence)
  private def pairs = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"), (1L, "d"),
    (2L, "c"), (2L, "d"), (2L, "e"),
    (3L, "e"), (3L, "f"),
    (4L, "a"))
    .toDF("id", "h")

  test("greedy picks by MARGINAL gain; full coverage stops the loop") {
    val got = SetCover.greedy(spark, pairs, 3)
      .as[(Int, Long, Long)].collect().toSeq
    assert(got === Seq((1, 1L, 4L), (2, 3L, 2L)))
  }

  test("tie on equal marginal gain goes to the smallest id") {
    val t = Seq((7L, "a"), (7L, "b"), (5L, "c"), (5L, "d"), (9L, "d"))
      .toDF("id", "h")
    val got = SetCover.greedy(spark, t, 1).as[(Int, Long, Long)].collect()
    assert(got(0) === ((1, 5L, 2L))) // 5 and 7 both gain 2 -> 5
  }

  test("early stop when features are exhausted by construction") {
    val two = Seq((1L, "x"), (2L, "x")).toDF("id", "h")
    val got = SetCover.greedy(spark, two, 5).as[(Int, Long, Long)].collect()
    // round 1 covers everything; round 2 picks a zero-gain item;
    // never more rounds than items
    assert(got.length <= 2)
    assert(got(0) === ((1, 1L, 1L)))
  }

  test("gains sum to the distinct feature count when coverage completes") {
    val got = SetCover.greedy(spark, pairs, 4)
      .as[(Int, Long, Long)].collect()
    assert(got.map(_._3).sum === 6L) // {a,b,c,d,e,f}
  }

  test("shuffle-partition invariance") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    def snap = SetCover.greedy(spark, pairs.repartition(5), 3)
      .collect().map(_.toString).toSeq
    val base = SetCover.greedy(spark, pairs, 3)
      .collect().map(_.toString).toSeq
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      assert(snap === base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
