package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SilverSpec extends SparkSpec {

  // explicit schema (S2): HHMM times stay strings with leading zeros —
  // inferSchema would read "0905" as int 905 (also true in the
  // reference's inferred bronze path)
  lazy val silver = Silver.transform(
    Bronze.ingest(spark, fixture("flights.csv"), fixture("L_AIRPORT_ID.csv"),
      fixture("L_UNIQUE_CARRIERS.csv"),
      clock = lit("2025-02-01 00:00:00").cast("timestamp"),
      inferSchema = false))

  test("silver emits the exact 34-column contract in order") {
    assert(silver.columns.toSeq === FlightSchema.silverColumns)
  }

  test("silver also runs on the inferred-schema bronze path (reference default)") {
    // inferSchema reads HHMM columns as ints ("0905" → 905); the
    // cleaner's regexp implicitly casts back to string, so 4-digit
    // afternoon times gain a colon and morning times pass through
    // 3-digit — faithful to the reference's inferred pipeline.
    val inferred = Silver.transform(
      Bronze.ingest(spark, fixture("flights.csv"), fixture("L_AIRPORT_ID.csv"),
        fixture("L_UNIQUE_CARRIERS.csv"),
        clock = lit("2025-02-01 00:00:00").cast("timestamp")))
    assert(inferred.columns.toSeq === FlightSchema.silverColumns)
    assert(inferred.count() === 12)
    val r100 = inferred.filter(col("FLIGHT_NUMBER") === 100)
      .select("ACTUAL_DEPARTURE_TIME", "PLANNED_ARRIVAL_TIME").head()
    assert(r100.getString(0) === "905")   // int 905 → "905", no match
    assert(r100.getString(1) === "12:00") // int 1200 → "12:00"
  }

  test("cancelled flights null out operational fields and set flags") {
    val row = silver.filter(col("FLIGHT_NUMBER") === 200)
      .select("ACTUAL_DEPARTURE_TIME", "DEPARTURE_DELAY", "AIR_TIME_MINUTES",
        "HAS_MISSING_TIMES", "HAS_MISSING_DELAYS", "IS_CANCELLED",
        "DEPARTURE_DELAY_CATEGORY", "IS_DELAYED")
      .head()
    assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2))
    assert(row.getBoolean(3) && row.getBoolean(4) && row.getBoolean(5))
    assert(row.getString(6) === "Unknown") // null delay → Unknown
    assert(row.isNullAt(7))                // IS_DELAYED tri-state null
  }

  test("HHMM times gain a colon; 3-digit times pass through unchanged") {
    val r100 = silver.filter(col("FLIGHT_NUMBER") === 100)
      .select("ACTUAL_DEPARTURE_TIME", "PLANNED_ARRIVAL_TIME").head()
    assert(r100.getString(0) === "09:05")
    assert(r100.getString(1) === "12:00")
    // the reference regexp "(\d{2})(\d{2})" skips 3-digit "945"
    val r300 = silver.filter(col("FLIGHT_NUMBER") === 300)
      .select("ACTUAL_DEPARTURE_TIME").head()
    assert(r300.getString(0) === "945")
  }

  test("delay categories follow first-match boundaries") {
    val cats = silver
      .filter(col("FLIGHT_NUMBER").between(101, 106))
      .select("FLIGHT_NUMBER", "DEPARTURE_DELAY_CATEGORY")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(cats === Map(101 -> "Early", 102 -> "On time", 103 -> "Minor",
      104 -> "Moderate", 105 -> "Significant", 106 -> "Severe"))
  }

  test("business-rule flags and quality score") {
    // flight 107: AIR_TIME 1441 (invalid), DISTANCE 0 (invalid),
    // delays fine, times present → score = (1+1+0+0+1)/5 = 0.6
    val r = silver.filter(col("FLIGHT_NUMBER") === 107)
      .select("AIR_TIME_VALID", "DISTANCE_VALID", "REASONABLE_DELAYS",
        "DATA_QUALITY_SCORE").head()
    assert(!r.getBoolean(0) && !r.getBoolean(1) && r.getBoolean(2))
    assert(r.getDouble(3) === 0.6)
    // flight 301: 13000 mi → 20921 km ≥ 20000 → DISTANCE_VALID false
    assert(!silver.filter(col("FLIGHT_NUMBER") === 301)
      .select("DISTANCE_VALID").head().getBoolean(0))
    // quality score always within [0,1]
    assert(silver.filter(col("DATA_QUALITY_SCORE") < 0 ||
      col("DATA_QUALITY_SCORE") > 1).count() === 0)
  }

  test("text standardization: codes uppercased/trimmed, route derived") {
    val r100 = silver.filter(col("FLIGHT_NUMBER") === 100)
      .select("ORIGIN_AIRPORT_CODE", "ROUTE_CODE", "ROUTE_NAME").head()
    assert(r100.getString(0) === "CLT") // "clt" uppercased
    assert(r100.getString(1) === "CLT-LAX")
    assert(r100.getString(2) ===
      "from Charlotte, NC: Charlotte Douglas International to Los Angeles, CA: Los Angeles International")
    val r107 = silver.filter(col("FLIGHT_NUMBER") === 107)
      .select("AIRLINE_CODE", "AIRLINE_NAME", "ROUTE_NAME").head()
    assert(r107.getString(0) === "ZZ")  // " zz " upper(trim)
    assert(r107.isNullAt(1))            // unmatched carrier name
    assert(r107.isNullAt(2))            // concat with null airport name
  }

  test("speed, distance km, weekend flag") {
    val r100 = silver.filter(col("FLIGHT_NUMBER") === 100)
      .select("DISTANCE_KM", "SPEED_KM_H", "IS_WEEKEND", "AIR_TIME_HOURS").head()
    assert(math.abs(r100.getDouble(0) - 2125.0 * 1.60934) < 1e-9)
    assert(math.abs(r100.getDouble(1) - r100.getDouble(0) / 290.0 * 60) < 1e-9)
    assert(!r100.getBoolean(2)) // 2025-01-15 is a Wednesday
    assert(math.abs(r100.getDouble(3) - 290.0 / 60.0) < 1e-9)
    // 2025-01-18 is a Saturday
    assert(silver.filter(col("FLIGHT_NUMBER") === 301)
      .select("IS_WEEKEND").head().getBoolean(0))
  }
}
