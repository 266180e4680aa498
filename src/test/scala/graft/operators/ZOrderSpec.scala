package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue interleaves bits: hand vectors and round-trip") {
    def z(x: Long, y: Long, bits: Int = 8): Long =
      Seq((x, y)).toDF("x", "y")
        .select(ZOrder.zvalue(col("x"), col("y"), bits).as("z"))
        .collect().head.getLong(0)
    assert(z(1, 0) === 1L)  // x bit 0 → position 0
    assert(z(0, 1) === 2L)  // y bit 0 → position 1
    assert(z(1, 1) === 3L)
    assert(z(2, 0) === 4L)  // x bit 1 → position 2
    assert(z(0, 2) === 8L)  // y bit 1 → position 3
    // x=3 → bits 0,1 at positions 0,2; y=5 → bits 0,2 at positions 1,5
    assert(z(3, 5) === (1L + 2L + 4L + 32L))
    // round-trip over a seeded sample
    var lcg = 0xCAFEBABEL
    def next(bound: Int): Int = {
      lcg = lcg * 6364136223846793005L + 1442695040888963407L
      (((lcg >>> 33) % bound + bound) % bound).toInt
    }
    for (_ <- 0 until 200) {
      val (x, y) = (next(1 << 20).toLong, next(1 << 20).toLong)
      val zz = Seq((x, y)).toDF("x", "y")
        .select(ZOrder.zvalue(col("x"), col("y"), 20)).collect().head.getLong(0)
      assert(ZOrder.deinterleave(zz, 20) === ((x, y)), s"($x, $y)")
    }
    // SQL text agrees with the Column expression
    val rows = (0 until 50).map(i => (i.toLong * 37 % 1024, i.toLong * 91 % 1024))
      .toDF("x", "y")
    val both = rows.select(ZOrder.zvalue(col("x"), col("y"), 10).as("a"),
      expr(ZOrder.zvalueSql("x", "y", 10)).as("b")).collect()
    assert(both.forall(r => r.getLong(0) === r.getLong(1)))
  }

  test("z-range buckets have tighter 2-D boxes than linear slabs") {
    // uniform grid: every (x, y) in [0,64)² — the canonical locality case
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
      .withColumn("z", ZOrder.zvalue(col("x"), col("y"), 6))
    // 16 z-range buckets = the 16 aligned 16×16 quadrant tiles
    val zstats = grid.withColumn("b", expr("(z * 16) div 4096"))
      .groupBy("b")
      .agg(min("x").as("mnx"), max("x").as("mxx"),
        min("y").as("mny"), max("y").as("mxy"))
      .collect()
    assert(zstats.length === 16)
    for (r <- zstats) {
      assert(r.getAs[Long]("mxx") - r.getAs[Long]("mnx") === 15L)
      assert(r.getAs[Long]("mxy") - r.getAs[Long]("mny") === 15L)
    }
    // linear slabs: full-width in y — no pruning power on y
    val lin = grid.withColumn("b", expr("(x * 16) div 64"))
      .groupBy("b")
      .agg(min("y").as("mny"), max("y").as("mxy")).collect()
    assert(lin.forall(r =>
      r.getAs[Long]("mny") === 0L && r.getAs[Long]("mxy") === 63L))
  }
}
