package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val quotes = Seq(
    ("AAPL", 100L, 10.0), ("AAPL", 200L, 11.0), ("AAPL", 300L, 12.0),
    ("MSFT", 150L, 50.0)
  ).toDF("sym", "ts", "price")
  private lazy val trades = Seq(
    ("AAPL", 50L, 5),    // before any quote → null
    ("AAPL", 200L, 7),   // equal ts → inclusive match 11.0
    ("AAPL", 250L, 9),   // between → 11.0
    ("AAPL", 999L, 11),  // after all → 12.0
    ("MSFT", 160L, 13),
    ("GOOG", 500L, 15)   // key with no right rows → null
  ).toDF("sym", "ts", "qty")

  test("asof join picks the latest right row at or before each left ts") {
    val out = AsOfJoin.asofJoin(trades, quotes, "sym", "ts",
        Seq("price", "ts"))
      .orderBy("sym", "ts").collect()
    val byKey = out.map(r => (r.getString(0), r.getLong(1)) ->
      (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(byKey(("AAPL", 50L)) === None)
    assert(byKey(("AAPL", 200L)) === Some(11.0)) // inclusive
    assert(byKey(("AAPL", 250L)) === Some(11.0))
    assert(byKey(("AAPL", 999L)) === Some(12.0))
    assert(byKey(("MSFT", 160L)) === Some(50.0))
    assert(byKey(("GOOG", 500L)) === None)
    // matched right ts carried alongside
    val t250 = out.find(r => r.getString(0) == "AAPL" && r.getLong(1) == 250L).get
    assert(t250.getLong(t250.fieldIndex("asof_ts")) === 200L)
  }
}
