package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SketchesSpec extends SparkSpec {

  lazy val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("HLL distinct count is within the rsd bound of the exact answer") {
    val exact = lineitem.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val approx = lineitem
      .select(Sketches.approxDistinct(col("l_partkey"), rsd = 0.02))
      .head().getLong(0)
    // 5 sigma on a 2% rsd
    assert(math.abs(approx - exact).toDouble / exact < 0.10,
      s"approx=$approx exact=$exact")
  }

  test("approx percentiles land within rank-error bound of exact") {
    val approx = lineitem.select(
      Sketches.approxPercentiles(col("l_extendedprice"), Seq(0.5), 10000))
      .head().getSeq[Double](0).head
    val exact = lineitem.select(expr("percentile(l_extendedprice, 0.5)"))
      .head().getDouble(0)
    // rank error 1/10000 over ~6k rows → at most a couple of ranks off
    val n = lineitem.count()
    val nearRank = lineitem.filter(col("l_extendedprice")
      .between(math.min(approx, exact), math.max(approx, exact))).count()
    assert(nearRank <= n / 100, s"approx=$approx exact=$exact offByRows=$nearRank")
  }

  test("cardinalityProfile computes per-group sketches in one pass") {
    val prof = Sketches.cardinalityProfile(
      lineitem, "l_returnflag", "l_partkey", "l_quantity")
      .orderBy("l_returnflag").collect()
    assert(prof.length === 3)
    prof.foreach { r =>
      assert(r.getAs[Long]("approx_distinct") > 0)
      assert(r.getAs[Seq[Double]]("approx_p50_p95_p99").length === 3)
    }
  }
}
