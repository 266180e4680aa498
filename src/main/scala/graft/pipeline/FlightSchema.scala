package graft.pipeline

import org.apache.spark.sql.types._

/** Canonical source schemas for the flight-lakehouse pipeline.
  *
  * Ports the reference's fixed 19-column contract
  * (configs/data_schema.py:9-29): HHMM times are STRINGS, 0/1 flags are
  * DOUBLES — the silver layer owns all typing.
  */
object FlightSchema {
  val flightData: StructType = StructType(Seq(
    StructField("FL_DATE", TimestampType, nullable = true),
    StructField("OP_UNIQUE_CARRIER", StringType, nullable = true),
    StructField("OP_CARRIER_FL_NUM", IntegerType, nullable = true),
    StructField("ORIGIN_AIRPORT_ID", IntegerType, nullable = true),
    StructField("ORIGIN", StringType, nullable = true),
    StructField("DEST_AIRPORT_ID", IntegerType, nullable = true),
    StructField("DEST", StringType, nullable = true),
    StructField("CRS_DEP_TIME", StringType, nullable = true),
    StructField("DEP_TIME", StringType, nullable = true),
    StructField("DEP_DELAY", DoubleType, nullable = true),
    StructField("DEP_DELAY_NEW", DoubleType, nullable = true),
    StructField("CRS_ARR_TIME", StringType, nullable = true),
    StructField("ARR_TIME", StringType, nullable = true),
    StructField("ARR_DELAY", DoubleType, nullable = true),
    StructField("ARR_DELAY_NEW", DoubleType, nullable = true),
    StructField("CANCELLED", DoubleType, nullable = true),
    StructField("DIVERTED", DoubleType, nullable = true),
    StructField("AIR_TIME", DoubleType, nullable = true),
    StructField("DISTANCE", DoubleType, nullable = true)))

  /** Lookup CSVs (L_AIRPORT_ID / L_UNIQUE_CARRIERS): Code,Description. */
  val lookup: StructType = StructType(Seq(
    StructField("Code", StringType, nullable = true),
    StructField("Description", StringType, nullable = true)))

  /** The silver contract: 34 columns in this exact order
    * (flights_silver_transform.py:69-119).
    */
  val silverColumns: Seq[String] = Seq(
    "FLIGHT_DATE", "FLIGHT_NUMBER", "AIRLINE_CODE", "AIRLINE_NAME",
    "ORIGIN_AIRPORT_CODE", "DEST_AIRPORT_CODE",
    "ORIGIN_AIRPORT_NAME", "DEST_AIRPORT_NAME",
    "ACTUAL_DEPARTURE_TIME", "ACTUAL_ARRIVAL_TIME",
    "PLANNED_DEPARTURE_TIME", "PLANNED_ARRIVAL_TIME",
    "DEPARTURE_DELAY", "ARRIVAL_DELAY",
    "DEPARTURE_DELAY_NEW", "ARRIVAL_DELAY_NEW",
    "DEPARTURE_DELAY_CATEGORY", "ARRIVAL_DELAY_CATEGORY",
    "IS_DELAYED", "IS_ONTIME", "IS_CANCELLED", "IS_DIVERTED",
    "AIR_TIME_MINUTES", "AIR_TIME_HOURS", "DISTANCE_KM", "SPEED_KM_H",
    "ROUTE_CODE", "ROUTE_NAME", "IS_WEEKEND",
    "HAS_MISSING_TIMES", "HAS_MISSING_DELAYS",
    "AIR_TIME_VALID", "DISTANCE_VALID", "REASONABLE_DELAYS",
    "DATA_QUALITY_SCORE")

  /** The fact contract: 22 columns (facts/fact_flights.py:63-89). */
  val factColumns: Seq[String] = Seq(
    "FLIGHT_NUMBER", "DATE_KEY",
    "ACTUAL_DEPARTURE_TIME_KEY", "ACTUAL_ARRIVAL_TIME_KEY",
    "PLANNED_DEPARTURE_TIME_KEY", "PLANNED_ARRIVAL_TIME_KEY",
    "AIRLINE_CODE", "ORIGIN_AIRPORT_CODE", "DEST_AIRPORT_CODE",
    "ROUTE_CODE", "IS_WEEKEND", "IS_DIVERTED", "IS_CANCELLED",
    "IS_DELAYED", "IS_ONTIME", "DEPARTURE_DELAY", "ARRIVAL_DELAY",
    "DEPARTURE_DELAY_CATEGORY", "ARRIVAL_DELAY_CATEGORY",
    "AIR_TIME_MINUTES", "DISTANCE_KM", "SPEED_KM_H",
    "DATA_QUALITY_SCORE")
}
