package graft.operators

import graft.SparkSpec

class PerceptronSpec extends SparkSpec {
  import spark.implicits._

  private def naive(rows: Seq[(Long, Seq[Long])], rounds: Int)
      : Seq[Perceptron.Round] = {
    val d = rows.head._2.length
    var w = Seq.fill(d)(0L)
    (1 to rounds).map { t =>
      val bad = rows.filter { case (y, x) =>
        y * x.zip(w).map { case (a, b) => a * b }.sum <= 0L
      }
      val upd = (0 until d).map(j => bad.map { case (y, x) => y * x(j) }.sum)
      w = w.zip(upd).map { case (a, b) => a + b }
      Perceptron.Round(t, bad.size.toLong, rows.size.toLong, w)
    }
  }

  test("separable fixture: training error reaches 0 and stays there") {
    // y = sign(x1 - x2) with a margin — linearly separable through
    // the origin, so the perceptron convergence theorem applies
    val rows = (1 to 60).map { i =>
      val a = 10L + (i % 7); val b = 10L + ((i * 3) % 7)
      val (x1, x2) = if (i % 2 == 0) (a + 5, b) else (a, b + 5)
      val y = if (x1 - x2 > 0) 1L else -1L
      (y, 1L, x1, x2)
    }
    val df = rows.toDF("y", "x0", "x1", "x2")
    val hist = Perceptron.fitBatch(df, Seq("x0", "x1", "x2"), "y", 8)
    assert(hist.head.nErr === 60L) // w = 0: everything misclassified
    assert(hist.exists(_.nErr === 0L), s"never converged: ${hist.map(_.nErr)}")
    // once a round sees 0 errors the update is empty — weights freeze
    val at0 = hist.indexWhere(_.nErr === 0L)
    hist.drop(at0).foreach { r =>
      assert(r.nErr === 0L && r.w === hist(at0).w, "weights must freeze at 0 errors")
    }
  }

  test("fitBatch ≡ naive reference on seeded random integer data") {
    val rnd = new scala.util.Random(20260814L)
    val rows = (1 to 120).map { _ =>
      (if (rnd.nextBoolean()) 1L else -1L,
        Seq(8L, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong,
          rnd.nextInt(9).toLong - 4L))
    }
    val df = rows.map { case (y, x) => (y, x(0), x(1), x(2), x(3)) }
      .toDF("y", "x0", "x1", "x2", "x3")
    val got = Perceptron.fitBatch(df, Seq("x0", "x1", "x2", "x3"), "y", 5)
    assert(got === naive(rows, 5))
  }

  test("training history is invariant to partitioning") {
    val rows = (1 to 200).map { i =>
      (if (i % 3 == 0) 1L else -1L, 4L, (i % 23).toLong, (i % 17).toLong)
    }
    val df1 = rows.toDF("y", "x0", "x1", "x2").coalesce(1)
    val df8 = rows.toDF("y", "x0", "x1", "x2").repartition(8)
    val h1 = Perceptron.fitBatch(df1, Seq("x0", "x1", "x2"), "y", 4)
    val h8 = Perceptron.fitBatch(df8, Seq("x0", "x1", "x2"), "y", 4)
    assert(h1 === h8)
  }
}
