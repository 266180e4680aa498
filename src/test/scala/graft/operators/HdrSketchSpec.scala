package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HDR log-bucket quantile sketch: bucketing round-trip, the 2^-b
  * relative-error bound, shard-merge ≡ direct-build, rank containment
  * (the q310 audit invariant), and partition invariance.
  */
class HdrSketchSpec extends SparkSpec {
  import spark.implicits._

  private val B = 5

  test("bucket round-trip: v lands in [low, low+width) and idx is monotone") {
    // exhaustive small region + exponential probes up to 2^40
    val vs = (0L to 4096L) ++ (10 to 40).flatMap(e =>
      Seq((1L << e) - 1, 1L << e, (1L << e) + 1, (1L << e) + (1L << (e - 3))))
    val df = vs.toDF("v").select(col("v"),
      HdrSketch.bucketIdx(col("v"), B).as("idx"))
      .select(col("v"), col("idx"),
        HdrSketch.bucketLow(col("idx"), B).as("low"),
        HdrSketch.bucketWidth(col("idx"), B).as("width"))
    val rows = df.orderBy("v").collect()
    rows.foreach { r =>
      val (v, low, width) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(v >= low && v < low + width, s"v=$v low=$low width=$width")
      // relative-error bound: width ≤ max(1, low·2^-B)
      if (low > 0) assert(width <= math.max(1L, low >> B),
        s"v=$v low=$low width=$width")
    }
    val idxs = rows.map(_.getLong(1))
    assert(idxs.zip(idxs.tail).forall { case (a, b) => a <= b },
      "idx not monotone in v")
    // exact region: values below 2^(B+1) get width-1 buckets
    rows.takeWhile(_.getLong(0) < (1L << (B + 1))).foreach { r =>
      assert(r.getLong(3) == 1L && r.getLong(2) == r.getLong(0))
    }
  }

  test("merge of shard sketches == sketch of the union") {
    val vals = (1 to 3000).map(i => ("s" + (i % 3), (i.toLong * 2654435761L) % 100000L))
    val df = vals.toDF("shard", "v")
    val direct = HdrSketch.sketch(df.withColumn("g", lit("all")),
      Seq("g"), "v", B)
    val merged = HdrSketch.merge(
      HdrSketch.sketch(df, Seq("shard"), "v", B)
        .withColumn("g", lit("all")).drop("shard"), Seq("g"))
    val d = direct.select("g", "idx", "cnt").orderBy("idx").collect().toSeq
    val m = merged.select("g", "idx", "cnt").orderBy("idx").collect().toSeq
    assert(d == m)
  }

  test("quantile rank containment: exact rank value inside selected bucket") {
    val vals = (1 to 5000).map(i =>
      ("g" + (i % 2), math.abs((i.toLong * 0x9E3779B97F4A7C15L) % 1000000L)))
    val df = vals.toDF("g", "v")
    val ps = Seq((50, 1L, 2L), (90, 9L, 10L), (99, 99L, 100L))
    val sk = HdrSketch.sketch(df, Seq("g"), "v", B)
    val q = HdrSketch.quantiles(sk, Seq("g"), ps, B)
      .collect().map(r => (r.getString(0), r.getInt(r.fieldIndex("pct"))) ->
        (r.getLong(r.fieldIndex("est_low")), r.getLong(r.fieldIndex("width"))))
      .toMap
    // driver-side exact rank selection
    val byG = vals.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((g, sorted) <- byG; (pct, num, den) <- ps) {
      val rank = (num * (sorted.length - 1)) / den // 0-based floor
      val exact = sorted(rank.toInt)
      val (low, width) = q((g, pct))
      assert(exact >= low && exact < low + width,
        s"g=$g pct=$pct exact=$exact low=$low width=$width")
    }
  }

  test("partition invariance: sketch identical under repartition") {
    val df = (1 to 2000).map(i => ("s", (i.toLong * 48271L) % 65537L))
      .toDF("g", "v")
    val a = HdrSketch.sketch(df, Seq("g"), "v", B)
      .orderBy("idx").collect().toSeq
    val b = HdrSketch.sketch(df.repartition(17), Seq("g"), "v", B)
      .orderBy("idx").collect().toSeq
    assert(a == b)
  }

  test("bounded state: bucket count stays under the structural cap") {
    // worst case: values spanning the full long range
    val vs = (0 to 62).flatMap(e => Seq((1L << e), (1L << e) + ((1L << e) >> 1)))
    val sk = HdrSketch.sketch(vs.toDF("v").withColumn("g", lit("x")),
      Seq("g"), "v", B)
    val cap = (64 - B) * (1 << B) + (1 << (B + 1))
    assert(sk.count() <= cap)
  }
}
