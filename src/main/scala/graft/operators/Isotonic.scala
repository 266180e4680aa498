package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isotonic (monotone non-decreasing) calibration of a binary-label
  * score — pool-adjacent-violators on a BOUNDED score grid, the
  * standard way to turn a ranking signal (quality logit, ensemble
  * vote, perceptron margin) into a probability without assuming a
  * parametric link.
  *
  * Distribution shape: ONE hash-agg pass reduces the corpus to
  * per-bin (n, n_pos) longs on the caller's bounded grid; PAV runs
  * driver-side on that grid-sized state (the KMeans bounded-collect
  * pattern — never O(rows)); applying the fitted step function back
  * to rows is a broadcast map. At 100 TB nothing changes: the grid is
  * the contract, the shuffle carries |grid| keyed partial counts.
  *
  * Oracle exactness: all pooling decisions compare block means by
  * LONG cross-multiplication (exact rationals, no doubles — valid
  * while n² fits a long, i.e. n < 3·10⁹ rows; beyond that swap in
  * BigInt compares, the decision logic is unchanged). Each output
  * probability is ONE IEEE division of exact longs, so it is the
  * correctly-rounded double of an exact rational — and because
  * rounding is monotone, the minimax characterization
  * ŷ_i = max_{j≤i} min_{k≥i} mean(j..k) evaluates to the SAME double
  * in SQL: the optimum is attained at the pooled block's boundaries
  * (the same long sums, the same single division), and no competitor
  * interval can invert an exact inequality after rounding. That is
  * what lets a DuckDB oracle replay PAV as an O(|grid|²) closed form
  * instead of a sequential loop.
  */
object Isotonic {

  /** PAV over present bins (ascending). Input (bin, n, nPos) with
    * n ≥ 1; output (bin, n, nPos, pCal) with pCal the pooled-block
    * probability, non-decreasing in bin.
    */
  def pavLong(bins: Seq[(Int, Long, Long)]): Seq[(Int, Long, Long, Double)] = {
    require(bins.map(_._1) == bins.map(_._1).sorted, "bins must ascend")
    // block stack: (nPos, n, first index into `bins`)
    val st = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
    bins.zipWithIndex.foreach { case ((_, n, np), i) =>
      var cur = (np, n, i)
      // pool while this block's mean is BELOW its predecessor's:
      // np_cur/n_cur < np_prev/n_prev  ⇔  np_cur·n_prev < np_prev·n_cur
      while (st.nonEmpty &&
          cur._1 * st.last._2 < st.last._1 * cur._2) {
        val p = st.remove(st.length - 1)
        cur = (p._1 + cur._1, p._2 + cur._2, p._3)
      }
      st += cur
    }
    val out = new Array[(Int, Long, Long, Double)](bins.length)
    var b = 0
    while (b < st.length) {
      val (np, n, first) = st(b)
      val last = if (b + 1 < st.length) st(b + 1)._3 else bins.length
      val p = np.toDouble / n.toDouble // one division of exact longs
      var i = first
      while (i < last) {
        val (bin, bn, bnp) = bins(i)
        out(i) = (bin, bn, bnp, p)
        i += 1
      }
      b += 1
    }
    out.toSeq
  }

  /** One corpus pass → grid-bounded counts → driver PAV → per-bin
    * calibration table (bin, n, n_pos, p_hat, p_cal). `binCol` must
    * be a bounded integer grid; `posCol` a 0/1 long label.
    */
  def calibrate(df: DataFrame, binCol: String, posCol: String): DataFrame = {
    // cast("int") so a LongType bin expression (e.g. an untruncated
    // long grid) satisfies the "bounded integer grid" contract instead
    // of throwing ClassCastException at getAs[Int].
    val agg = df.groupBy(col(binCol).cast("int").as("bin"))
      .agg(count(lit(1)).as("n"), sum(col(posCol)).as("np"))
      .collect()
      .map(r => (r.getAs[Int]("bin"), r.getAs[Long]("n"),
        r.getAs[Long]("np")))
      .sortBy(_._1)
      .toSeq
    val fitted = pavLong(agg)
    val spark = df.sparkSession
    import spark.implicits._
    fitted.map { case (bin, n, np, p) =>
      (bin, n, np, np.toDouble / n.toDouble, p)
    }.toDF("bin", "n", "n_pos", "p_hat", "p_cal")
  }
}
