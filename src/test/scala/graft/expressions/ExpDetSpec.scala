package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ExpDet (deterministic exp) contract: accuracy vs libm on the
  * documented domain, the registered-function ≡ canonical-walk
  * identity (interpreted and codegen'd paths both route through
  * ExpDet.compute), and the sigmoid clamp behavior q268 relies on.
  */
class ExpDetSpec extends SparkSpec {
  import spark.implicits._

  test("compute tracks libm exp within 2e-14 relative on |x| <= 43") {
    var worst = 0.0
    var x = -43.0
    while (x <= 43.0) {
      val e = math.exp(x)
      worst = math.max(worst, math.abs(ExpDet.compute(x) - e) / e)
      x += 0.0137
    }
    assert(worst < 2e-14, s"worst relative error $worst")
  }

  test("graft_expdet column path equals ExpDet.compute bit-for-bit") {
    val xs = (-430 to 430).map(_ / 10.0)
    val got = xs.toDF("x")
      .select(col("x"), call_function("graft_expdet", col("x")).as("e"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    xs.foreach { x =>
      assert(got(x) == ExpDet.compute(x), s"mismatch at x=$x")
    }
  }

  test("exp identities hold to within series truncation") {
    // exp(0) uses the pure Horner (k=0): exactly 1 by construction.
    assert(ExpDet.compute(0.0) === 1.0)
    // exp(ln 2) = 2 up to the single-constant reduction error.
    assert(math.abs(ExpDet.compute(ExpDet.LN2) - 2.0) < 1e-13)
    // reciprocal symmetry: exp(x)·exp(−x) ≈ 1.
    Seq(0.5, 1.7, 10.0, 30.0).foreach { x =>
      val p = ExpDet.compute(x) * ExpDet.compute(-x)
      assert(math.abs(p - 1.0) < 1e-12, s"x=$x product $p")
    }
  }

  test("sigmoid: bounds, monotonicity, clamp saturation") {
    val zs = (-100 to 100).map(_ * 0.5)
    val ss = zs.map(ExpDet.sigmoid)
    assert(ss.forall(s => s >= 0.0 && s <= 1.0))
    assert(ss.zip(ss.tail).forall { case (a, b) => a <= b })
    assert(ExpDet.sigmoid(0.0) === 0.5)
    // beyond the ±30 clamp the value is pinned to the clamp's value
    assert(ExpDet.sigmoid(31.0) === ExpDet.sigmoid(30.0))
    assert(ExpDet.sigmoid(-31.0) === ExpDet.sigmoid(-30.0))
    assert(ExpDet.sigmoid(30.0) > 1.0 - 1e-12)
  }
}
