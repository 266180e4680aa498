package graft.operators

import graft.SparkSpec
import graft.operators.RecordLinkage.FieldWeights

/** Fellegi-Sunter scoring semantics: exact micro-log-odds sums,
  * threshold classification bands, and the m>u contract.
  */
class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  private val fields = Seq(
    FieldWeights("f1", m = 0.9, u = 0.1),   // agree +ln(9), disagree +ln(1/9)
    FieldWeights("f2", m = 0.8, u = 0.2))   // agree +ln(4), disagree +ln(0.25)

  test("score6 is the exact sum of the micro weights") {
    val df = Seq(
      (true, true), (true, false), (false, true), (false, false))
      .toDF("f1", "f2")
    val got = RecordLinkage.score(df, fields)
      .select("f1", "f2", "score6").as[(Boolean, Boolean, Long)]
      .collect().map { case (a, b, s) => (a, b) -> s }.toMap
    val Seq(w1, w2) = fields
    assert(got((true, true)) === w1.agreeMicro + w2.agreeMicro)
    assert(got((true, false)) === w1.agreeMicro + w2.disagreeMicro)
    assert(got((false, true)) === w1.disagreeMicro + w2.agreeMicro)
    assert(got((false, false)) === w1.disagreeMicro + w2.disagreeMicro)
  }

  test("weights: symmetric fields give ±ln(odds) pairs; scoreSql mirrors") {
    val w = FieldWeights("x", 0.9, 0.1)
    assert(w.agreeMicro === math.round(StrictMath.log(9.0) * 1e6))
    assert(w.disagreeMicro === -w.agreeMicro) // (1-m)/(1-u) = 1/9 here
    val sql = RecordLinkage.scoreSql(Seq(w))
    assert(sql.contains(w.agreeMicro.toString)
      && sql.contains(w.disagreeMicro.toString))
  }

  test("classify bands: match / possible / nonmatch at the thresholds") {
    val df = Seq(5000000L, 1000000L, -5000000L, 2000000L, -2000000L)
      .toDF("score6")
    val got = RecordLinkage.classify(df, upperMicro = 2000000L,
        lowerMicro = -2000000L)
      .select("score6", "decision").as[(Long, String)].collect().toMap
    assert(got(5000000L) === "match")
    assert(got(2000000L) === "match")      // boundary inclusive upper
    assert(got(1000000L) === "possible")
    assert(got(-2000000L) === "nonmatch")  // boundary inclusive lower
    assert(got(-5000000L) === "nonmatch")
  }

  test("non-discriminating fields are rejected") {
    intercept[IllegalArgumentException] { FieldWeights("bad", 0.1, 0.9) }
    intercept[IllegalArgumentException] { FieldWeights("bad", 0.5, 0.5) }
  }
}
