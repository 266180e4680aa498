package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val DIM = 8

  // anisotropic cloud: dominant variance on axis 0, secondary on
  // axis 3, plus small full-rank jitter so no direction is exactly
  // degenerate (the power iteration's seeds stay well-defined)
  private def cloud(n: Int) = (0 until n).map { i =>
    val v = Array.tabulate(DIM)(j => (((i * (j + 7)) % 5) - 2) * 0.01f)
    v(0) += ((i * 37) % 21 - 10).toFloat        // var ~ 36
    v(3) += (((i * 13) % 7 - 3) * 0.8).toFloat  // var ~ 2.5
    (i.toLong, v)
  }.toDF("vec_id", "embedding")

  test("fit recovers the dominant axes of an anisotropic cloud") {
    val m = Pca.fit(cloud(200), "vec_id", "embedding", DIM, 2, 50)
    assert(m.n === 200L)
    // components are unit vectors
    for (c <- m.comps)
      assert(math.abs(c.map(x => x * x).sum - 1.0) < 1e-9)
    // deflation ⇒ orthogonal components
    val cross = m.comps(0).zip(m.comps(1)).map { case (a, b) => a * b }.sum
    assert(math.abs(cross) < 1e-6, s"components not orthogonal: $cross")
    // dominant axis is 0, secondary is 3 (up to sign)
    assert(math.abs(math.abs(m.comps(0)(0)) - 1.0) < 1e-3,
      s"pc1 not along axis 0: ${m.comps(0).toSeq}")
    assert(math.abs(math.abs(m.comps(1)(3)) - 1.0) < 1e-3,
      s"pc2 not along axis 3: ${m.comps(1).toSeq}")
    // eigenvalues ordered and positive; trace bounds their sum
    assert(m.eigs(0) > m.eigs(1) && m.eigs(1) > 0)
    assert(m.eigs.sum <= m.trace + 1e-9)
    // eigenvalue 1 ≈ the axis-0 variance of the (decimal-exact) data
    val xs = cloud(200).select(col("embedding")(0).cast("double"))
      .collect().map(_.getDouble(0))
    val mean = xs.sum / xs.length
    val varE = xs.map(x => (x - mean) * (x - mean)).sum / xs.length
    assert(math.abs(m.eigs(0) - varE) / varE < 1e-3,
      s"λ1 ${m.eigs(0)} vs exact axis-0 variance $varE")
  }

  test("fitOuterProduct is bit-identical to fit (the d-scalability path)") {
    val df = cloud(200).repartition(7) // multiple partitions: the
    // partial-accumulator merge order must not matter (decimal sums)
    val a = Pca.fit(df, "vec_id", "embedding", DIM, 2, 12)
    val b = Pca.fitOuterProduct(df, "vec_id", "embedding", DIM, 2, 12)
    assert(a.n === b.n)
    assert(a.trace === b.trace)
    assert(a.mean.toSeq === b.mean.toSeq)
    assert(a.eigs.toSeq === b.eigs.toSeq)
    for (c <- 0 until 2)
      assert(a.comps(c).toSeq === b.comps(c).toSeq, s"component $c")
    for (j <- 0 until DIM)
      assert(a.cov(j).toSeq === b.cov(j).toSeq, s"cov row $j")
  }

  test("fitOuterProduct accepts array<double> input like fit does") {
    // regression lane: the RDD path read getSeq[Double] off the raw
    // column — without the up-front array<double> cast an
    // array<float> caller worked but an array<double> caller's twin,
    // a DOUBLE-typed frame, must also work, matching fit() exactly
    import org.apache.spark.sql.functions.col
    val df = cloud(150)
    val dd = df.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val a = Pca.fit(dd, "vec_id", "embedding", DIM, 2, 12)
    val b = Pca.fitOuterProduct(dd, "vec_id", "embedding", DIM, 2, 12)
    assert(a.n === b.n)
    assert(a.eigs.toSeq === b.eigs.toSeq)
    for (j <- 0 until DIM)
      assert(a.cov(j).toSeq === b.cov(j).toSeq, s"cov row $j")
  }

  test("project is a narrow map whose variance matches the eigenvalue") {
    val df = cloud(200)
    val m = Pca.fit(df, "vec_id", "embedding", DIM, 2, 50)
    val p = Pca.project(df, "vec_id", "embedding", m)
    assert(p.columns.toSeq === Seq("vec_id", "p1", "p2"))
    // no shuffle: the projection plan has zero exchanges
    val plan = p.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection shuffled:\n$plan")
    val rows = p.collect().map(r =>
      (r.getAs[Double]("p1"), r.getAs[Double]("p2")))
    // projections are centered: means ~ 0
    assert(math.abs(rows.map(_._1).sum / rows.length) < 1e-9)
    assert(math.abs(rows.map(_._2).sum / rows.length) < 1e-9)
    // sample variance along each component ≈ its eigenvalue
    val v1 = rows.map(t => t._1 * t._1).sum / rows.length
    val v2 = rows.map(t => t._2 * t._2).sum / rows.length
    assert(math.abs(v1 - m.eigs(0)) / m.eigs(0) < 1e-6,
      s"var(p1) $v1 vs λ1 ${m.eigs(0)}")
    assert(math.abs(v2 - m.eigs(1)) / m.eigs(1) < 1e-6,
      s"var(p2) $v2 vs λ2 ${m.eigs(1)}")
  }
}
