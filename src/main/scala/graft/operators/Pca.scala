package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Principal components of an embedding column, computed Spark-first
  * and oracle-exactly.
  *
  * Distribution shape: ONE distributed pass builds the d-vector of
  * per-dimension sums and the d×d matrix of per-pair product sums
  * (posexplode → vec_id-keyed self-join → hash agg with map-side
  * partial aggregation; the corpus is touched once, the shuffle
  * carries d² keyed partial sums, NOT rows). Everything after is
  * driver-side math on the collected d×d model — the KMeans-centroid
  * bounded-state pattern (d=64 ⇒ 4 096 rows), corpus-size
  * independent. Projection back onto the fitted components is a
  * narrow per-row map against broadcast literal arrays.
  *
  * Oracle exactness: per-row terms are 8-decimal prounded BEFORE the
  * DECIMAL(38,8) cast, summed exactly (order-free), cast back to
  * double (the established `dsum` bridge); every subsequent scalar is
  * a fixed expression tree over those doubles, and every vector
  * reduction (mat-vec rows, norms, Rayleigh quotients, trace) is a
  * SEQUENTIAL ascending-index left fold — `aggregate` ≡ DuckDB
  * `list_reduce` — so the power iteration is replayable bit-exactly
  * as unrolled SQL CTE stages.
  *
  * Scale note (100 TB): the exact-covariance pass is O(n·d²) expanded
  * rows through a partial-agg; at d in the thousands swap the
  * self-join expansion for per-partition outer-product accumulation
  * (same exact decimal sums, fewer shuffled bytes) or fit on a
  * deterministic sample — the driver-side eigensolve and the
  * projection map are unchanged.
  */
object Pca {

  /** Fitted model: all driver-side state is O(d²), never O(n). */
  final case class PcaModel(
      n: Long,
      mean: Array[Double],
      cov: Array[Array[Double]],
      comps: Array[Array[Double]],
      eigs: Array[Double],
      trace: Double)

  import graft.queries.Portable.pround

  /** One distributed pass → exact decimal sums → deterministic
    * driver-side power iteration with deflation. Component c is
    * seeded from basis vector e_c and iterated exactly `iters` times
    * — the output is DEFINED as that measurement (well-defined with
    * or without convergence), which is what makes it replayable.
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      nComps: Int, iters: Int): PcaModel = {
    require(nComps >= 1 && nComps <= dim && iters >= 1)
    val ex = df
      .select(col(idCol).as("id"), posexplode(col(vecCol)).as(Seq("j", "xf")))
      .select(col("id"), col("j"), col("xf").cast("double").as("x"))
    // per-dimension sums Σx_j, exact on the 8-decimal grid
    val sjRows = ex.groupBy("j")
      .agg(sum(pround(col("x"), 8).cast(DecimalType(38, 8)))
        .cast("double").as("s"), count(lit(1)).as("cnt"))
      .collect()
    val sj = new Array[Double](dim)
    var n = 0L
    sjRows.foreach { r =>
      sj(r.getAs[Int]("j")) = r.getAs[Double]("s")
      n = r.getAs[Long]("cnt")
    }
    // per-pair product sums Σx_j·x_k: the vec_id-keyed self-join
    // expands each row to d² terms, combined map-side by the hash agg
    val e2 = ex.select(col("id"), col("j").as("k"), col("x").as("y"))
    val sjkRows = ex.join(e2, "id")
      .groupBy("j", "k")
      .agg(sum(pround(col("x") * col("y"), 8).cast(DecimalType(38, 8)))
        .cast("double").as("s"))
      .collect()
    val sjk = Array.ofDim[Double](dim, dim)
    sjkRows.foreach(r =>
      sjk(r.getAs[Int]("j"))(r.getAs[Int]("k")) = r.getAs[Double]("s"))
    eigensolve(n, sj, sjk, dim, nComps, iters)
  }

  /** Deterministic power iteration with deflation over exact-sum
    * doubles — shared by [[fit]] and [[fitOuterProduct]]; every
    * reduction is a sequential ascending fold (the oracle-replay
    * contract).
    */
  private def eigensolve(n: Long, sj: Array[Double],
      sjk: Array[Array[Double]], dim: Int, nComps: Int, iters: Int)
      : PcaModel = {
    val nd = n.toDouble
    // covariance: fixed expression tree over the exact-sum doubles
    val cov = Array.tabulate(dim, dim)((j, k) =>
      (sjk(j)(k) - sj(j) * sj(k) / nd) / nd)
    // trace: sequential ascending fold over the diagonal
    var trace = 0.0
    var t = 0
    while (t < dim) { trace += cov(t)(t); t += 1 }

    def matvec(m: Array[Array[Double]], v: Array[Double]): Array[Double] =
      Array.tabulate(dim) { j =>
        var acc = 0.0
        var k = 0
        while (k < dim) { acc += m(j)(k) * v(k); k += 1 }
        acc
      }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < dim) { acc += a(i) * b(i); i += 1 }
      acc
    }

    var work = cov.map(_.clone())
    val comps = new Array[Array[Double]](nComps)
    val eigs = new Array[Double](nComps)
    var c = 0
    while (c < nComps) {
      var v = Array.tabulate(dim)(j => if (j == c) 1.0 else 0.0)
      var it = 0
      while (it < iters) {
        val w = matvec(work, v)
        val nrm = math.sqrt(dot(w, w))
        v = w.map(_ / nrm)
        it += 1
      }
      // Rayleigh quotient on the FINAL unit vector
      val w2 = matvec(work, v)
      val lam = dot(v, w2)
      comps(c) = v
      eigs(c) = lam
      // deflate: work_jk -= λ·v_j·v_k (same expression order as the
      // oracle's `c - lam * vj * vk`)
      work = Array.tabulate(dim, dim)((j, k) =>
        work(j)(k) - lam * v(j) * v(k))
      c += 1
    }
    PcaModel(n, Array.tabulate(dim)(j => sj(j) / nd), cov, comps, eigs,
      trace)
  }

  /** The d-scalability variant of [[fit]]: per-partition OUTER-PRODUCT
    * accumulation instead of the (row, j, k) self-join expansion — the
    * shuffle carries one d + d² decimal-sum block PER PARTITION
    * instead of n·d² expanded rows, which is the path for d in the
    * thousands. Bit-identical to [[fit]] by construction (PcaSpec
    * pins full-model equality): each per-row term is prounded with
    * the SAME double ops, decimal-rounded with the same
    * shortest-repr HALF_UP rule Spark's double→DECIMAL cast uses
    * (`BigDecimal.valueOf` = shortest repr — the r11 portability
    * gotcha), summed exactly (order-free), and converted back with
    * the same `BigDecimal.doubleValue` Spark's decimal→double cast
    * calls. The eigensolve then runs on identical doubles.
    */
  def fitOuterProduct(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, nComps: Int, iters: Int): PcaModel = {
    require(nComps >= 1 && nComps <= dim && iters >= 1)
    import java.math.{BigDecimal => JBD, RoundingMode}
    def pround8(x: Double): Double = math.floor(x * 1.0e8 + 0.5) / 1.0e8
    def dec8(x: Double): JBD =
      JBD.valueOf(pround8(x)).setScale(8, RoundingMode.HALF_UP)
    final class Acc extends Serializable {
      val sj = Array.fill(dim)(JBD.ZERO)
      val sjk = Array.fill(dim * dim)(JBD.ZERO)
      var n = 0L
      def add(v: Array[Double]): Unit = {
        var j = 0
        while (j < dim) {
          sj(j) = sj(j).add(dec8(v(j)))
          var k = 0
          while (k < dim) {
            sjk(j * dim + k) = sjk(j * dim + k).add(dec8(v(j) * v(k)))
            k += 1
          }
          j += 1
        }
        n += 1
      }
      def merge(o: Acc): Acc = {
        var i = 0
        while (i < dim) { sj(i) = sj(i).add(o.sj(i)); i += 1 }
        i = 0
        while (i < dim * dim) { sjk(i) = sjk(i).add(o.sjk(i)); i += 1 }
        n += o.n
        this
      }
    }
    // Cast to array<double> up front so this entry point accepts the
    // same inputs as fit() (any numeric array), not just array<float>.
    val acc = df.select(col(vecCol).cast("array<double>")).rdd
      .mapPartitions { it =>
        val a = new Acc
        it.foreach { r =>
          val s = r.getSeq[Double](0)
          a.add(s.toArray)
        }
        Iterator.single(a)
      }
      .reduce(_ merge _)
    val sj = acc.sj.map(_.doubleValue)
    val sjk = Array.tabulate(dim, dim)((j, k) =>
      acc.sjk(j * dim + k).doubleValue)
    eigensolve(acc.n, sj, sjk, dim, nComps, iters)
  }

  /** Project (center → dot with each fitted component) as a NARROW
    * per-row map against broadcast literal arrays — zero shuffle, the
    * 100 TB path. Output columns `p1..p{nComps}`, sequential-fold
    * doubles (bit-exact vs the oracle's list_reduce).
    */
  def project(df: DataFrame, idCol: String, vecCol: String,
      model: PcaModel): DataFrame = {
    val meanLit = typedLit(model.mean.toSeq)
    val centered = zip_with(col(vecCol), meanLit,
      (x, m) => x.cast("double") - m)
    val projCols = model.comps.zipWithIndex.map { case (comp, i) =>
      aggregate(
        zip_with(centered, typedLit(comp.toSeq), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x).as(s"p${i + 1}")
    }
    df.select(col(idCol) +: projCols: _*)
  }
}
