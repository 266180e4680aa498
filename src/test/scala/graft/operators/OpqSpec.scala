package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class OpqSpec extends SparkSpec {
  import spark.implicits._

  test("energySnakePerm deals energy-ranked dims serpentine across subspaces") {
    // d=8, m=2: dim k has energy descending in k (dim 0 largest), so
    // the energy ranking IS (0,1,2,...,7). Snake with m=2:
    //   r:   0  1  2  3  4  5  6  7      (rank by energy desc)
    //   g:   0  0  1  1  2  2  3  3      (round = r/m)
    //   sub: 0  1  1  0  0  1  1  0      (even round → j, odd → m-1-j)
    // perm(sub*sl+g) = dim  →  sub0: [0,3,4,7], sub1: [1,2,5,6]
    val vals = Seq.tabulate(3)(i =>
      Tuple1(Array.tabulate(8)(d => (8 - d).toFloat * (i + 1))))
    val df = vals.toDF("vec")
    val perm = Opq.energySnakePerm(df, "vec", 2)
    assert(perm.toSeq === Seq(0, 3, 4, 7, 1, 2, 5, 6))
  }

  test("permuteCol is an exact reorder — a bijection preserving every element") {
    val df = Seq(Tuple1(Array.tabulate(8)(d => d.toFloat + 0.25f)))
      .toDF("vec")
    val perm = Array(7, 0, 3, 1, 6, 2, 5, 4)
    assert(perm.sorted.toSeq === (0 until 8), "test perm must be a bijection")
    val out = df.select(Opq.permuteCol(col("vec"), perm).as("o"))
      .head.getSeq[Float](0)
    assert(out === perm.toSeq.map(p => p.toFloat + 0.25f))
    assert(out.sorted === (0 until 8).map(_.toFloat + 0.25f))
  }

  test("the snake assignment balances subspace energy load") {
    // 64 dims with strongly skewed energies: contiguous slicing puts
    // the whole head in one subspace; the snake must spread it so the
    // max/min per-subspace energy-rank sum gap is the minimal ±m range
    val df = Seq(Tuple1(Array.tabulate(64)(d => math.pow(1.2, -d).toFloat)))
      .toDF("vec")
    val perm = Opq.energySnakePerm(df, "vec", 8)
    assert(perm.sorted.toSeq === (0 until 64), "perm must be a bijection")
    // rank of dim d is d (energies strictly descending); per-subspace
    // rank sums under snake differ by at most m-1 per paired round
    val rankSums = perm.grouped(8).map(_.sum).toSeq
    assert(rankSums.max - rankSums.min <= 8,
      s"snake failed to balance: $rankSums")
  }
}
