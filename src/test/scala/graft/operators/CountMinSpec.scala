package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def seeded(n: Int) = {
    var lcg = 0x1234ABCDL
    (0 until n).map { _ =>
      lcg = lcg * 6364136223846793005L + 1442695040888963407L
      // zipf-ish: small key space with heavy repeats
      (((lcg >>> 33) % 40 + 40) % 40) * 1009L % 1000003L
    }
  }

  test("estimates never undercount and are exact without collisions") {
    val items = seeded(2000).toDF("h")
    val exact = items.groupBy("h").agg(count(lit(1)).as("tf"))
    // tight sketch: collisions expected, guarantee is one-sided
    val ctrs = CountMin.counters(items, "h", 4, 16)
    val est = CountMin.estimate(ctrs, exact, "h", 4, 16)
      .collect().map(r => (r.getAs[Long]("tf"), r.getAs[Long]("cms_est")))
    assert(est.forall { case (tf, e) => e >= tf },
      "CMS must never undercount")
    // wide sketch: 40 keys into 4×8192 buckets — collisions vanish
    val wide = CountMin.estimate(
      CountMin.counters(items, "h", 4, 8192), exact, "h", 4, 8192)
      .collect().map(r => (r.getAs[Long]("tf"), r.getAs[Long]("cms_est")))
    assert(wide.forall { case (tf, e) => e === tf },
      "collision-free sketch must be exact")
  }

  test("counters are mergeable by addition") {
    val a = seeded(900)
    val (p1, p2) = a.splitAt(450)
    val cAll = CountMin.counters(a.toDF("h"), "h", 3, 32)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val c1 = CountMin.counters(p1.toDF("h"), "h", 3, 32)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val c2 = CountMin.counters(p2.toDF("h"), "h", 3, 32)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = (c1.keySet ++ c2.keySet).map(k =>
      k -> (c1.getOrElse(k, 0L) + c2.getOrElse(k, 0L))).toMap
    assert(merged === cAll)
  }
}
