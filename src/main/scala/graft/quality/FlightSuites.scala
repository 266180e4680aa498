package graft.quality

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.pipeline.FlightSchema
import Expectations._

/** The reference's three expectation suites (bronze / silver / gold),
  * ported check-for-check with its two known bugs fixed (SURVEY.md
  * §2.12): the silver suite names the emitted column SPEED_KM_H (the
  * reference checks "SPEED_KM/H", silver_expectations.py:68), and the
  * delay-category set matches the enricher's actual labels (the
  * reference expects labels the enricher never produces,
  * silver_expectations.py:166-169 vs flight_data_enricher.py:15-21).
  */
object FlightSuites {

  /** bronze_expectations.py:47-79. */
  val bronze: Seq[Expectation] = Seq(
    rowCountBetween(1),
    columnExists("FL_DATE", "OP_UNIQUE_CARRIER", "OP_CARRIER_FL_NUM",
      "ORIGIN_AIRPORT_ID", "DEST_AIRPORT_ID", "CANCELLED", "DIVERTED"),
    notNull("FL_DATE", mostly = 0.95),
    notNull("OP_UNIQUE_CARRIER", mostly = 0.95),
    between("DISTANCE", 0, 20000, mostly = 0.99),
    inSet("CANCELLED", Seq(0.0, 1.0)),
    inSet("DIVERTED", Seq(0.0, 1.0)),
    ofType("OP_CARRIER_FL_NUM", IntegerType))

  val delayCategories: Seq[String] =
    Seq("Unknown", "Early", "On time", "Minor", "Moderate", "Significant", "Severe")

  /** silver_expectations.py:50-190 (fixed names/labels, see object doc). */
  val silver: Seq[Expectation] = Seq(
    rowCountBetween(1),
    columnExists(FlightSchema.silverColumns: _*),
    notNull("FLIGHT_DATE", mostly = 0.95),
    notNull("AIRLINE_CODE", mostly = 0.95),
    notNull("ORIGIN_AIRPORT_CODE", mostly = 0.95),
    notNull("DEST_AIRPORT_CODE", mostly = 0.95),
    between("DEPARTURE_DELAY", -200, 2000, mostly = 0.95),
    between("ARRIVAL_DELAY", -200, 2000, mostly = 0.95),
    between("AIR_TIME_MINUTES", 0, 1440, mostly = 0.95),
    between("DISTANCE_KM", 0, 32186.8, mostly = 0.99), // 20000 mi in km
    between("SPEED_KM_H", 200, 1200, mostly = 0.90),
    between("DATA_QUALITY_SCORE", 0, 1),
    lengthBetween("ORIGIN_AIRPORT_CODE", 3, 3, mostly = 0.95),
    lengthBetween("DEST_AIRPORT_CODE", 3, 3, mostly = 0.95),
    lengthBetween("AIRLINE_CODE", 2, 3, mostly = 0.95),
    lengthBetween("ROUTE_CODE", 7, 7, mostly = 0.95),
    inSet("DEPARTURE_DELAY_CATEGORY", delayCategories),
    inSet("ARRIVAL_DELAY_CATEGORY", delayCategories),
    inSet("IS_CANCELLED", Seq(true, false)),
    inSet("IS_DIVERTED", Seq(true, false)))

  /** gold_expectations.py:8-401 — one suite per table. */
  val dimDate: Seq[Expectation] = Seq(
    rowCountBetween(1),
    columnExists("DATE_KEY", "FULL_DATE", "YEAR", "QUARTER", "MONTH",
      "DAY_OF_WEEK", "IS_WEEKEND"),
    unique("DATE_KEY"),
    notNull("FULL_DATE"),
    between("QUARTER", 1, 4), between("MONTH", 1, 12),
    between("DAY_OF_WEEK", 1, 7))

  val dimTime: Seq[Expectation] = Seq(
    rowCountBetween(1440, 1440),
    unique("TIME_KEY"),
    between("HOUR_24", 0, 23), between("HOUR_12", 1, 12),
    between("MINUTE", 0, 59),
    inSet("AM_PM", Seq("AM", "PM")),
    inSet("TIME_OF_DAY", Seq("Night", "Morning", "Afternoon", "Evening")))

  val dimAirline: Seq[Expectation] = Seq(
    rowCountBetween(1),
    notNull("AIRLINE_CODE"),
    lengthBetween("AIRLINE_CODE", 2, 3, mostly = 0.95))

  val dimAirport: Seq[Expectation] = Seq(
    rowCountBetween(1),
    unique("AIRPORT_CODE"),
    lengthBetween("AIRPORT_CODE", 3, 3, mostly = 0.95))

  val dimRoute: Seq[Expectation] = Seq(
    rowCountBetween(1),
    unique("ROUTE_CODE"),
    lengthBetween("ROUTE_CODE", 7, 7, mostly = 0.95),
    inSet("ROUTE_POPULARITY",
      Seq("Very Popular", "Popular", "Moderate", "Low Frequency")))

  val factFlights: Seq[Expectation] = Seq(
    rowCountBetween(1),
    columnExists(FlightSchema.factColumns: _*),
    notNull("DATE_KEY", mostly = 0.95),
    between("DATA_QUALITY_SCORE", 0, 1),
    inSet("DEPARTURE_DELAY_CATEGORY", delayCategories),
    satisfies("time_keys_in_range",
      col("ACTUAL_DEPARTURE_TIME_KEY").isNull ||
        col("ACTUAL_DEPARTURE_TIME_KEY").between(0, 2400), mostly = 0.99))
}
