package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  // 64x64 grid of (x, y) points — two independent dimensions
  private lazy val grid = spark.range(0, 4096)
    .select((col("id") / 64).cast("long").as("x"),
      (col("id") % 64).cast("long").as("y"))

  test("interleave produces the Morton curve") {
    val z = grid.select(col("x"), col("y"),
        ZOrder.interleave(Seq(col("x"), col("y")), 6).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(z((0L, 0L)) === 0L)
    assert(z((1L, 0L)) === 1L) // x occupies even bit positions
    assert(z((0L, 1L)) === 2L) // y occupies odd bit positions
    assert(z((1L, 1L)) === 3L)
    assert(z((3L, 5L)) === 39L) // x=011,y=101 -> interleaved 100111
    assert(z.values.toSet.size === 4096) // bijective on the full grid
  }

  test("z-order prunes files on the secondary dimension; linear sort cannot") {
    val nFiles = 16
    val zStats = ZOrder.partitionStats(
      ZOrder.cluster(grid, Seq("x", "y"), bitsPerCol = 6, nFiles),
      Seq("x", "y"))
    val linStats = ZOrder.partitionStats(
      grid.repartitionByRange(nFiles, col("x")).sortWithinPartitions(col("x")),
      Seq("x", "y"))

    // narrow range on y (the non-leading dimension)
    val zHitY = ZOrder.partitionsHit(zStats, "y", 10, 13)
    val linHitY = ZOrder.partitionsHit(linStats, "y", 10, 13)
    assert(linHitY === nFiles) // linear layout: every file spans all of y
    assert(zHitY <= nFiles / 2) // z-order: y envelopes are tight

    // the leading dimension still prunes under z-order
    val zHitX = ZOrder.partitionsHit(zStats, "x", 10, 13)
    assert(zHitX <= nFiles / 2)
  }

  test("quantileRank buckets skewed data evenly") {
    val skewed = spark.range(0, 4096)
      .select((col("id") * col("id")).as("v")) // quadratic skew
    val ranks = skewed.select(
        ZOrder.quantileRank(skewed, "v", bits = 3).as("r"))
      .groupBy("r").count().collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(ranks.map(_._1).toSet.size === 8) // all 8 buckets used
    // even-ish occupancy despite skew: no bucket more than 2x fair share
    assert(ranks.map(_._2).max <= 2 * 4096 / 8)
  }
}
