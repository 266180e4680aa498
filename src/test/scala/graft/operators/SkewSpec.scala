package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed: 900 rows of key "hot", a few cold keys
  private lazy val big = ((1 to 900).map(i => ("hot", i.toDouble)) ++
    Seq(("a", 1.0), ("b", 2.0), ("b", 3.0))).toDF("k", "v")
  private lazy val small = Seq(("hot", "H"), ("a", "A"), ("c", "C"))
    .toDF("k", "name")

  test("saltedJoin equals the plain join (inner and left)") {
    for (jt <- Seq("inner", "left")) {
      val plain = big.join(small, Seq("k"), jt)
        .select("k", "v", "name").orderBy("k", "v").collect()
      val salted = Skew.saltedJoin(big, small, "k", salts = 8, jt)
        .select("k", "v", "name").orderBy("k", "v").collect()
      assert(salted.map(_.toSeq).toSeq === plain.map(_.toSeq).toSeq, s"join type $jt")
    }
  }

  test("salt is deterministic: identical results under repartition") {
    // the salt must be a pure function of row content — a retry-
    // or-layout-dependent salt (e.g. monotonically_increasing_id)
    // changes shuffle buckets between attempts
    val shuffled = big.repartition(7)
    val a = Skew.saltedJoin(big, small, "k", salts = 8)
      .select("k", "v", "name").orderBy("k", "v").collect().map(_.toSeq).toSeq
    val b = Skew.saltedJoin(shuffled, small, "k", salts = 8)
      .select("k", "v", "name").orderBy("k", "v").collect().map(_.toSeq).toSeq
    assert(a === b)
    val c1 = Skew.countByKey(big, "k", salts = 8).orderBy("k")
      .collect().map(_.toSeq).toSeq
    val c2 = Skew.countByKey(shuffled, "k", salts = 8).orderBy("k")
      .collect().map(_.toSeq).toSeq
    assert(c1 === c2)
  }

  test("two-phase salted aggregation equals direct groupBy") {
    val direct = big.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("total"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val cnt = Skew.countByKey(big, "k", salts = 8).orderBy("k").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = Skew.sumByKey(big, "k", "v", salts = 8).orderBy("k").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    direct.foreach { case (k, c, s) =>
      assert(cnt(k) === c)
      assert(math.abs(totals(k) - s) < 1e-9)
    }
  }
}
