package graft.operators

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def facts(rows: (String, String, Double, Double)*): DataFrame =
    rows.toDF("airline", "day", "delay", "distance")

  private def sortedRows(df: DataFrame) =
    df.orderBy("airline", "day").collect().map(_.toSeq).toSeq

  test("refresh(mart, delta) == full re-aggregation of the union") {
    val base = facts(
      ("AA", "d1", 10.0, 100.0), ("AA", "d1", 20.0, 200.0),
      ("UA", "d1", 5.0, 500.0))
    val delta = facts(
      ("AA", "d1", 30.0, 300.0), // existing group: adds in
      ("DL", "d2", 7.0, 700.0))  // new group: passes through
    val keys = Seq("airline", "day")
    val sums = Seq("delay", "distance")

    val incremental = IncrementalAgg.refresh(
      IncrementalAgg.aggregate(base, keys, sums), delta, keys, sums)
    val full = IncrementalAgg.aggregate(base.unionByName(delta), keys, sums)
    assert(sortedRows(incremental) === sortedRows(full))
  }

  test("untouched mart groups survive refresh unchanged") {
    val base = facts(("AA", "d1", 10.0, 100.0), ("UA", "d1", 5.0, 500.0))
    val delta = facts(("AA", "d1", 1.0, 1.0))
    val out = IncrementalAgg.refresh(
        IncrementalAgg.aggregate(base, Seq("airline", "day"), Seq("delay")),
        delta, Seq("airline", "day"), Seq("delay"))
      .orderBy("airline").collect()
    val ua = out.find(_.getString(0) == "UA").get
    assert(ua.getAs[Long]("n_rows") === 1L)
    assert(ua.getAs[Double]("sum_delay") === 5.0)
    val aa = out.find(_.getString(0) == "AA").get
    assert(aa.getAs[Long]("n_rows") === 2L)
    assert(aa.getAs[Double]("sum_delay") === 11.0)
  }
}
