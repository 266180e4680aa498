package graft.operators

import graft.SparkSpec

/** Exact-AUC semantics against hand-computed Mann-Whitney values,
  * including tie handling, degenerate one-class groups, and
  * perfect/inverted separability.
  */
class RocAucSpec extends SparkSpec {
  import spark.implicits._

  private def aucOf(rows: Seq[(String, Double, Boolean)]): Map[String, Option[Double]] = {
    val df = rows.toDF("g", "score", "pos")
    RocAuc.auc(df, "g", "score", "pos").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
  }

  test("perfect separation gives 1.0; inverted gives 0.0") {
    val m = aucOf(Seq(
      ("sep", 1.0, false), ("sep", 2.0, false), ("sep", 3.0, true), ("sep", 4.0, true),
      ("inv", 1.0, true), ("inv", 2.0, true), ("inv", 3.0, false), ("inv", 4.0, false)))
    assert(m("sep") === Some(1.0))
    assert(m("inv") === Some(0.0))
  }

  test("average-rank tie handling matches the hand computation") {
    // scores: 1(neg), 2(pos), 2(neg), 3(pos)
    // avg ranks: 1 -> 1; the two 2s -> 2.5 each; 3 -> 4
    // sum pos ranks = 2.5 + 4 = 6.5; AUC = (6.5 - 2*3/2) / (2*2) = 0.875
    val m = aucOf(Seq(
      ("t", 1.0, false), ("t", 2.0, true), ("t", 2.0, false), ("t", 3.0, true)))
    assert(m("t") === Some(0.875))
  }

  test("all-tied scores give exactly 0.5; one-class groups give null") {
    val m = aucOf(Seq(
      ("flat", 7.0, true), ("flat", 7.0, false), ("flat", 7.0, true),
      ("onlypos", 1.0, true), ("onlypos", 2.0, true)))
    assert(m("flat") === Some(0.5))
    assert(m("onlypos") === None)
  }

  test("n_ties counts rows at mixed-class score values") {
    val df = Seq(
      ("t", 1.0, false), ("t", 2.0, true), ("t", 2.0, false), ("t", 3.0, true))
      .toDF("g", "score", "pos")
    val r = RocAuc.auc(df, "g", "score", "pos").head
    assert(r.getLong(1) === 2L) // n_pos
    assert(r.getLong(2) === 2L) // n_neg
    assert(r.getLong(3) === 2L) // the two rows at score 2.0
  }

  test("shuffle-partition invariance") {
    val rows = (1 to 200).map(i =>
      ("g" + (i % 3), (i * 37 % 41).toDouble, i % 41 % 2 == 0))
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    def snap = RocAuc.auc(rows.toDF("g", "score", "pos"), "g", "score", "pos")
      .collect().map(_.toString).sorted.toSeq
    val base = snap
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "5")
      assert(snap === base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("averagePrecision: perfect, inverted, and hand-computed tied rankings") {
    // perfect separation: AP = 1
    val perfect = Seq(("g", 3.0, true), ("g", 2.0, true), ("g", 1.0, false))
      .toDF("g", "score", "pos")
    val rp = RocAuc.averagePrecision(perfect, "g", "score", "pos").head
    assert(rp.getAs[Double]("ap") === 1.0)
    // all positives ranked last: AP = the known harmonic-ish value
    //   thresholds desc: (1, FP), (0.5, TP): term = (1/1)·(1/2) = 0.5
    val inv = Seq(("g", 1.0, false), ("g", 0.5, true))
      .toDF("g", "score", "pos")
    val ri = RocAuc.averagePrecision(inv, "g", "score", "pos").head
    assert(ri.getAs[Double]("ap") === 0.5)
    // tied block: scores (2: 1 pos + 1 neg), (1: 1 pos)
    //   t=2: ΔTP=1, TP=1, N=2 → (1/2)·(1/2)=0.25
    //   t=1: ΔTP=1, TP=2, N=3 → (1/2)·(2/3)=0.333333...
    //   AP = 0.25 + 1/3 (both terms pround8-quantized)
    val tied = Seq(("g", 2.0, true), ("g", 2.0, false), ("g", 1.0, true))
      .toDF("g", "score", "pos")
    val rt = RocAuc.averagePrecision(tied, "g", "score", "pos").head
    assert(math.abs(rt.getAs[Double]("ap") - (0.25 + 1.0 / 3.0)) < 1e-7)
    assert(rt.getAs[Long]("n_thresholds") === 2L)
    assert(rt.getAs[Double]("prevalence") === 2.0 / 3.0)
  }

  test("averagePrecision: no positives reports NULL ap; invariance") {
    import org.apache.spark.sql.functions.col
    val none = Seq(("g", 1.0, false), ("g", 2.0, false))
      .toDF("g", "score", "pos")
    assert(RocAuc.averagePrecision(none, "g", "score", "pos")
      .head.isNullAt(5))
    val rows = (1 to 200).map(i =>
      ("g" + (i % 3), (i * 37 % 41).toDouble, i % 41 % 2 == 0))
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    def snap = RocAuc.averagePrecision(rows.toDF("g", "score", "pos"),
      "g", "score", "pos").collect().map(_.toString).sorted.toSeq
    val base = snap
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "5")
      assert(snap === base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
