package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  test("pavLong pools violators to the block mean (hand vector)") {
    // means 0.0, 1.0, 0.5 → bins 1,2 violate and pool to 3/4
    val got = Isotonic.pavLong(Seq((0, 2L, 0L), (1, 2L, 2L), (2, 2L, 1L)))
    assert(got.map(_._4) === Seq(0.0, 0.75, 0.75))
    // per-bin raw counts are preserved
    assert(got.map(t => (t._1, t._2, t._3)) ===
      Seq((0, 2L, 0L), (1, 2L, 2L), (2, 2L, 1L)))
    // already-monotone input is untouched
    val mono = Seq((0, 4L, 1L), (1, 4L, 2L), (2, 4L, 4L))
    assert(Isotonic.pavLong(mono).map(_._4) === Seq(0.25, 0.5, 1.0))
    // global violator pools everything
    assert(Isotonic.pavLong(Seq((0, 1L, 1L), (1, 1L, 0L)))
      .map(_._4) === Seq(0.5, 0.5))
  }

  test("pavLong equals the minimax closed form on seeded random grids") {
    var lcg = 0x5DEECE66DL
    def next(bound: Int): Int = {
      lcg = lcg * 6364136223846793005L + 1442695040888963407L
      (((lcg >>> 33) % bound + bound) % bound).toInt
    }
    for (trial <- 0 until 50) {
      val nb = 2 + next(20)
      val bins = (0 until nb).map { b =>
        val n = 1L + next(30)
        (b, n, next((n + 1).toInt).toLong)
      }
      val pav = Isotonic.pavLong(bins).map(_._4)
      // ŷ_i = max_{j≤i} min_{k≥i} mean(j..k) — the oracle's formula
      def mean(j: Int, k: Int): Double = {
        val np = (j to k).map(bins(_)._3).sum
        val n = (j to k).map(bins(_)._2).sum
        np.toDouble / n.toDouble
      }
      val mm = (0 until nb).map(i =>
        (0 to i).map(j => (i until nb).map(k => mean(j, k)).min).max)
      assert(pav === mm, s"trial $trial: $bins")
      // monotone non-decreasing
      assert(pav.zip(pav.tail).forall { case (a, b) => a <= b })
      // calibration preserves the total positive mass (weighted mean)
      val lhs = bins.zip(pav).map { case ((_, n, _), p) => p * n }.sum
      val rhs = bins.map(_._3.toLong).sum.toDouble
      assert(math.abs(lhs - rhs) < 1e-6 * math.max(1.0, rhs))
    }
  }

  test("calibrate reduces the frame to grid-bounded counts and fits") {
    val df = Seq.tabulate(300) { i =>
      val bin = i % 5
      // positive rate rises with bin except a planted violation at 3
      val pos = if (bin == 3) (i % 10 < 2) else (i % 10 < 2 * bin)
      (bin, if (pos) 1L else 0L)
    }.toDF("bin", "pos")
    val got = Isotonic.calibrate(df, "bin", "pos")
      .orderBy("bin").collect()
    assert(got.map(_.getAs[Int]("bin")).toSeq === Seq(0, 1, 2, 3, 4))
    assert(got.map(_.getAs[Long]("n")).sum === 300L)
    val cal = got.map(_.getAs[Double]("p_cal")).toSeq
    assert(cal.zip(cal.tail).forall { case (a, b) => a <= b },
      s"not monotone: $cal")
    // the planted dip at bin 3 pooled with a neighbor
    val raw = got.map(_.getAs[Double]("p_hat")).toSeq
    assert(raw(3) < raw(2), "fixture must contain a violation")
    assert(cal(3) >= cal(2))
  }

  test("calibrate accepts a LongType bin column (regression lane)") {
    // regression lane: without the cast("int") in calibrate, a LONG
    // bin grid (e.g. an untruncated `div` expression) threw
    // ClassCastException at getAs[Int] on collect
    val df = Seq.tabulate(200) { i =>
      (i.toLong % 4L, if (i % 10 < 2 * (i % 4)) 1L else 0L)
    }.toDF("bin", "pos")
    val got = Isotonic.calibrate(df, "bin", "pos").orderBy("bin").collect()
    assert(got.map(_.getAs[Int]("bin")).toSeq === Seq(0, 1, 2, 3))
    assert(got.map(_.getAs[Long]("n")).sum === 200L)
    val cal = got.map(_.getAs[Double]("p_cal")).toSeq
    assert(cal.zip(cal.tail).forall { case (a, b) => a <= b })
  }
}
