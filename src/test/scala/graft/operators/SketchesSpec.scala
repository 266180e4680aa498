package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // inline synthetic data (deterministic LCG) — keeps `sbt test` free
  // of machine-absolute dataset paths
  private lazy val rows = {
    var seed = 42L
    def next(): Long = { seed = (seed * 6364136223846793005L + 1442695040888963407L); seed }
    (1 to 6000).map { _ =>
      val k = math.abs(next()) % 1500          // ~1500 distinct keys
      val v = (math.abs(next()) % 100000) / 10.0
      val g = Seq("A", "N", "R")((math.abs(next()) % 3).toInt)
      (g, k, v)
    }
  }
  private lazy val df = rows.toDF("flag", "key", "price")

  test("HLL distinct count is within the rsd bound of the exact answer") {
    val exact = df.select(countDistinct(col("key"))).head().getLong(0)
    val approx = df.select(Sketches.approxDistinct(col("key"), rsd = 0.02))
      .head().getLong(0)
    // 5 sigma on a 2% rsd
    assert(math.abs(approx - exact).toDouble / exact < 0.10,
      s"approx=$approx exact=$exact")
  }

  test("approx percentiles respect the configured rank-error bound") {
    val accuracy = 10000
    val approx = df.select(
      Sketches.approxPercentiles(col("price"), Seq(0.5), accuracy))
      .head().getSeq[Double](0).head
    val exact = df.select(expr("percentile(price, 0.5)")).head().getDouble(0)
    val n = df.count()
    // rank error ≤ n/accuracy (+1 rank of slack for interpolation and
    // duplicate values) — tied to the accuracy parameter, so a dropped
    // or misapplied accuracy argument fails this test
    val offByRows = df.filter(col("price")
      .between(math.min(approx, exact), math.max(approx, exact))).count()
    val bound = n / accuracy + (2 * n.toDouble / rows.map(_._3).distinct.size).ceil.toLong + 1
    assert(offByRows <= bound, s"approx=$approx exact=$exact offByRows=$offByRows bound=$bound")
  }

  test("cardinalityProfile computes per-group sketches in one pass") {
    val prof = Sketches.cardinalityProfile(df, "flag", "key", "price")
      .orderBy("flag").collect()
    assert(prof.length === 3)
    prof.foreach { r =>
      assert(r.getAs[Long]("approx_distinct") > 0)
      assert(r.getAs[Seq[Double]]("approx_p50_p95_p99").length === 3)
    }
  }
}
