package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HilbertIndexSpec extends SparkSpec {
  import spark.implicits._

  test("xy2d is a bijection onto [0, 4^bits) and d2xy inverts it") {
    val bits = 4
    val n = 1 << bits
    val ds = for (x <- 0L until n; y <- 0L until n)
      yield HilbertIndex.xy2d(x, y, bits)
    assert(ds.sorted === (0L until n.toLong * n), "not a bijection")
    for (x <- 0L until n; y <- 0L until n) {
      val d = HilbertIndex.xy2d(x, y, bits)
      assert(HilbertIndex.d2xy(d, bits) === ((x, y)), s"roundtrip ($x,$y)")
    }
  }

  test("consecutive addresses are grid-adjacent — the locality z-order lacks") {
    val bits = 5
    val n = 1 << bits
    for (d <- 0L until (n.toLong * n - 1)) {
      val (x0, y0) = HilbertIndex.d2xy(d, bits)
      val (x1, y1) = HilbertIndex.d2xy(d + 1, bits)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) === 1L,
        s"jump at d=$d: ($x0,$y0) -> ($x1,$y1)")
    }
    // contrast: Morton has non-adjacent steps (the diagonal jumps)
    val zJumps = (0L until (n.toLong * n - 1)).count { z =>
      val (x0, y0) = graft.operators.ZOrder.deinterleave(z, bits)
      val (x1, y1) = graft.operators.ZOrder.deinterleave(z + 1, bits)
      math.abs(x1 - x0) + math.abs(y1 - y0) > 1L
    }
    assert(zJumps > 0, "the contrast claim needs Morton to actually jump")
  }

  test("hand-pinned order-1 and order-2 values match the published curve") {
    // order 1: the U shape (0,0)→(0,1)→(1,1)→(1,0)
    assert(HilbertIndex.xy2d(0, 0, 1) === 0L)
    assert(HilbertIndex.xy2d(0, 1, 1) === 1L)
    assert(HilbertIndex.xy2d(1, 1, 1) === 2L)
    assert(HilbertIndex.xy2d(1, 0, 1) === 3L)
    // order 2 corners
    assert(HilbertIndex.xy2d(0, 0, 2) === 0L)
    assert(HilbertIndex.xy2d(3, 0, 2) === 15L)
  }

  test("codegen path equals the interpreted walk on random inputs") {
    val bits = 10
    var lcg = 0x12345L
    def next(bound: Int): Long = {
      lcg = lcg * 6364136223846793005L + 1442695040888963407L
      ((lcg >>> 33) % bound + bound) % bound
    }
    val pts = (0 until 500).map(_ => (next(1 << bits), next(1 << bits)))
    val df = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        call_function("graft_hilbert", col("x"), col("y"), lit(bits))
          .as("h"))
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) === HilbertIndex.xy2d(x, y, bits),
        s"codegen diverged at ($x,$y)")
    }
  }
}
