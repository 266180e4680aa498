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

  test("cluster stats cost does not scale with the clustered column count") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    // count the jobs of the (eager) stats pass alone — no action is
    // run on the clustered result. AQE runs >1 job per action, so the
    // invariant asserted is per-ACTION: N clustered columns must cost
    // the same number of jobs as 1 (one multi-column approxQuantile),
    // not N× it.
    def jobsFor(cols: Seq[String]): Int = {
      spark.sparkContext.addSparkListener(listener)
      try {
        jobs.set(0)
        ZOrder.cluster(grid, cols, bitsPerCol = 3, numPartitions = 4)
        // listener delivery is async: poll until the count is stable
        var prev = -1
        var stableFor = 0
        var waited = 0
        while (stableFor < 3 && waited < 50) {
          Thread.sleep(100); waited += 1
          val cur = jobs.get()
          if (cur == prev) stableFor += 1 else { stableFor = 0; prev = cur }
        }
        jobs.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val oneCol = jobsFor(Seq("x"))
    val twoCol = jobsFor(Seq("x", "y"))
    assert(twoCol === oneCol,
      s"stats jobs grew with column count: 1 col = $oneCol, 2 cols = $twoCol")
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
