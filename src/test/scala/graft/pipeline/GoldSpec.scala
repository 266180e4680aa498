package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GoldSpec extends SparkSpec {

  private val clock = lit("2025-02-01 00:00:00").cast("timestamp")
  lazy val silver = Silver.transform(
    Bronze.ingest(spark, fixture("flights.csv"), fixture("L_AIRPORT_ID.csv"),
      fixture("L_UNIQUE_CARRIERS.csv"), clock, inferSchema = false))
  lazy val dimDate = GoldDims.dimDate(spark)
  lazy val dimTime = GoldDims.dimTime(spark)
  lazy val dimAirline = GoldDims.dimAirline(silver, clock)
  lazy val dimAirport = GoldDims.dimAirport(silver, clock)
  lazy val dimRoute = GoldDims.dimRoute(silver, clock)
  lazy val fact =
    FactFlights.build(silver, dimDate, dimAirport, dimAirline, dimRoute)

  test("dim_date: 4018 rows, unique int yyyyMMdd keys, weekend flag") {
    assert(dimDate.count() === 4018)
    assert(dimDate.select("DATE_KEY").distinct().count() === 4018)
    val jan15 = dimDate.filter(col("DATE_KEY") === 20250115)
      .select("YEAR", "QUARTER", "MONTH", "MONTH_NAME", "DAY_OF_WEEK_NAME",
        "IS_WEEKEND").head()
    assert(jan15.getInt(0) === 2025 && jan15.getInt(1) === 1 && jan15.getInt(2) === 1)
    assert(jan15.getString(3) === "Jan" && jan15.getString(4) === "Wednesday")
    assert(!jan15.getBoolean(5))
  }

  test("dim_time: 1440 rows, unique HHMM keys (intended semantics)") {
    assert(dimTime.count() === 1440)
    assert(dimTime.select("TIME_KEY").distinct().count() === 1440)
    val t0930 = dimTime.filter(col("TIME_KEY") === 930)
      .select("HOUR_24", "HOUR_12", "MINUTE", "TIME_STRING", "AM_PM",
        "TIME_OF_DAY", "IS_BUSINESS_HOURS", "IS_PEAK_HOURS").head()
    assert(t0930.getInt(0) === 9 && t0930.getInt(1) === 9 && t0930.getInt(2) === 30)
    assert(t0930.getString(3) === "09:30" && t0930.getString(4) === "AM")
    assert(t0930.getString(5) === "Morning")
    assert(t0930.getBoolean(6) && !t0930.getBoolean(7))
    val t2330 = dimTime.filter(col("TIME_KEY") === 2330)
      .select("HOUR_12", "AM_PM", "TIME_OF_DAY", "IS_RED_EYE").head()
    assert(t2330.getInt(0) === 11 && t2330.getString(1) === "PM")
    assert(t2330.getString(2) === "Night" && t2330.getBoolean(3))
  }

  test("dim_airline / dim_airport distinct builds") {
    // carriers: AA, DL, UA + (AA, null) from the unmatched " aa " row
    assert(dimAirline.count() === 4)
    // airports: CLT, LAX (named) + XXX (null name)
    assert(dimAirport.select("AIRPORT_CODE").distinct().count() === 3)
  }

  test("dim_route aggregates and popularity tiers") {
    val cltLax = dimRoute.filter(col("ROUTE_CODE") === "CLT-LAX").head()
    assert(cltLax.getAs[String]("ROUTE_POPULARITY") === "Low Frequency")
    val dist = cltLax.getAs[java.math.BigDecimal]("DISTANCE_KM")
    assert(math.abs(dist.doubleValue() - 2125.0 * 1.60934) < 0.01)
  }

  test("fact: 22-column contract, resolved keys, time-key round trip") {
    assert(fact.columns.toSeq === FlightSchema.factColumns)
    assert(fact.count() === 12)
    val r100 = fact.filter(col("FLIGHT_NUMBER") === 100).head()
    assert(r100.getAs[Int]("DATE_KEY") === 20250115)
    assert(r100.getAs[Int]("ACTUAL_DEPARTURE_TIME_KEY") === 905)
    assert(r100.getAs[Int]("PLANNED_DEPARTURE_TIME_KEY") === 900)
    // 3-digit "945" passthrough still casts to 945
    val r300 = fact.filter(col("FLIGHT_NUMBER") === 300).head()
    assert(r300.getAs[Int]("ACTUAL_DEPARTURE_TIME_KEY") === 945)
    // every DATE_KEY resolves on this fixture
    assert(FactFlights.fkAudit(fact).head().getAs[Long]("null_date_key") === 0L)
  }

  test("daily airline performance mart: KPIs incl. conditional avgs") {
    val mart = Marts.dailyAirlinePerformance(fact, dimDate, dimAirline)
    // AA on 2025-01-16: flights 101-106, none cancelled, 4 delayed
    val aa16 = mart.filter(col("AIRLINE_CODE") === "AA" &&
      col("FLIGHT_DATE") === lit("2025-01-16").cast("date")).head()
    assert(aa16.getAs[Long]("TOTAL_FLIGHTS") === 6L)
    assert(aa16.getAs[Long]("CANCELLED_FLIGHTS") === 0L)
    assert(aa16.getAs[Long]("DELAYED_FLIGHTS") === 4L)
    assert(aa16.getAs[Long]("ONTIME_FLIGHTS") === 2L)
    assert(aa16.getAs[Double]("COMPLETION_RATE") === 100.0)
    assert(aa16.getAs[Double]("ON_TIME_PERFORMANCE") === 33.33)
    // avg dep delay over non-cancelled: (-5+0+15+60+180+301)/6
    assert(math.abs(aa16.getAs[Double]("AVG_DEPARTURE_DELAY") - 551.0 / 6) < 1e-9)
  }

  test("all-cancelled group: OTP and delay rate are null, not NaN") {
    // DL on 2025-01-15: single cancelled flight
    val mart = Marts.dailyAirlinePerformance(fact, dimDate, dimAirline)
    val dl = mart.filter(col("AIRLINE_CODE") === "DL").head()
    assert(dl.getAs[Long]("CANCELLED_FLIGHTS") === 1L)
    assert(dl.getAs[Double]("CANCELLATION_RATE") === 100.0)
    assert(dl.isNullAt(dl.fieldIndex("ON_TIME_PERFORMANCE")))
    assert(dl.isNullAt(dl.fieldIndex("DELAY_RATE")))
    assert(dl.isNullAt(dl.fieldIndex("AVG_DEPARTURE_DELAY")))
  }

  test("daily airport performance: full outer join keeps one-sided days") {
    val mart = Marts.dailyAirportPerformance(fact, dimDate, dimAirport)
    // CLT on 01-16 has 6 departures (AA 101-106) and 0 arrivals
    val clt16 = mart.filter(col("AIRPORT_CODE") === "CLT" &&
      col("FLIGHT_DATE") === lit("2025-01-16").cast("date")).head()
    assert(clt16.getAs[Long]("TOTAL_DEPARTURES") === 6L)
    assert(clt16.isNullAt(clt16.fieldIndex("TOTAL_ARRIVALS")))
    // LAX on 01-16: arrivals only
    val lax16 = mart.filter(col("AIRPORT_CODE") === "LAX" &&
      col("FLIGHT_DATE") === lit("2025-01-16").cast("date")).head()
    assert(lax16.getAs[Long]("TOTAL_ARRIVALS") === 6L)
    assert(lax16.isNullAt(lax16.fieldIndex("TOTAL_DEPARTURES")))
  }

  test("route performance mart aggregates monthly per route+airline") {
    val mart = Marts.routePerformance(fact, dimDate, dimRoute, dimAirline)
    val aaCltLax = mart.filter(col("ROUTE_CODE") === "CLT-LAX" &&
      col("AIRLINE_CODE") === "AA" && col("MONTH") === 1).head()
    assert(aaCltLax.getAs[Long]("FLIGHT_FREQUENCY") === 7L)
    assert(aaCltLax.getAs[Long]("CANCELLATIONS") === 0L)
  }
}
