package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Silver transform: five cleaning stages + three enrichment stages +
  * the 34-column contract projection, all narrow `DataFrame =>
  * DataFrame` functions — the whole layer collapses into a single
  * WholeStageCodegen pass over the bronze scan (no shuffle until the
  * partitioned write).
  *
  * Semantics ported stage-by-stage from
  * spark_jobs/silver_transform/flight_data_cleaner.py and
  * flight_data_enricher.py; quirks kept deliberately:
  *  - the HHMM→"HH:MM" regexp ("(\d{2})(\d{2})" → "$1:$2") does NOT
  *    zero-pad, so 3-digit times like "945" pass through unchanged
  *    (flight_data_cleaner.py:66-84) — fact time keys then re-strip
  *    the colon, round-tripping either way;
  *  - cancelled flights null out times/delays/airtime BEFORE quality
  *    flags, so cancelled ⇒ has_missing_* = true;
  *  - ÷0 → NULL (Spark non-ANSI) is load-bearing for SPEED_KM_H when
  *    AIR_TIME_CLEAN = 0.
  */
object Silver {

  /** Stage 1 (clean_datetime_fields): FL_DATE → date. */
  def cleanDatetimeFields(df: DataFrame): DataFrame =
    df.withColumn("FL_DATE_PARSED",
      when(col("FL_DATE").isNull, lit(null)).otherwise(to_date(col("FL_DATE"))))

  /** Stage 2 (handle_missing_values): null out operational fields for
    * cancelled flights; derive has_missing_* flags.
    */
  def handleMissingValues(df: DataFrame): DataFrame = {
    val cancelled = col("CANCELLED") === 1.0
    df.withColumn("DEP_TIME_CLEAN", when(cancelled, lit(null)).otherwise(col("DEP_TIME")))
      .withColumn("ARR_TIME_CLEAN", when(cancelled, lit(null)).otherwise(col("ARR_TIME")))
      .withColumn("AIR_TIME_HOURS_CLEAN",
        when(cancelled, lit(null)).otherwise(col("AIR_TIME") / 60.0))
      .withColumn("DEP_DELAY_CLEAN", when(cancelled, lit(null)).otherwise(col("DEP_DELAY")))
      .withColumn("ARR_DELAY_CLEAN", when(cancelled, lit(null)).otherwise(col("ARR_DELAY")))
      .withColumn("AIR_TIME_CLEAN", when(cancelled, lit(null)).otherwise(col("AIR_TIME")))
      .withColumn("has_missing_times",
        when(col("DEP_TIME_CLEAN").isNull || col("ARR_TIME_CLEAN").isNull, true)
          .otherwise(false))
      .withColumn("has_missing_delays",
        when(col("DEP_DELAY_CLEAN").isNull || col("ARR_DELAY_CLEAN").isNull, true)
          .otherwise(false))
  }

  private val hhmm = "(\\d{2})(\\d{2})"

  /** Stage 3 (standardize_data_types): HHMM → "HH:MM" (no zero-pad —
    * see object doc), miles → km, 0/1 doubles → booleans.
    */
  def standardizeDataTypes(df: DataFrame): DataFrame =
    df.withColumn("DEP_TIME_PARSED",
        when(col("DEP_TIME_CLEAN").isNotNull,
          regexp_replace(col("DEP_TIME_CLEAN"), hhmm, "$1:$2")).otherwise(lit(null)))
      .withColumn("CRS_DEP_TIME_PARSED",
        when(col("CRS_DEP_TIME").isNotNull,
          regexp_replace(col("CRS_DEP_TIME"), hhmm, "$1:$2")).otherwise(lit(null)))
      .withColumn("ARR_TIME_PARSED",
        when(col("ARR_TIME_CLEAN").isNotNull,
          regexp_replace(col("ARR_TIME_CLEAN"), hhmm, "$1:$2")).otherwise(lit(null)))
      .withColumn("CRS_ARR_TIME_PARSED",
        when(col("CRS_ARR_TIME").isNotNull,
          regexp_replace(col("CRS_ARR_TIME"), hhmm, "$1:$2")).otherwise(lit(null)))
      .withColumn("DISTANCE_KM",
        when(col("DISTANCE").isNotNull, col("DISTANCE") * 1.60934).otherwise(lit(null)))
      .withColumn("CANCELLED_BOOL", col("CANCELLED") === 1.0)
      .withColumn("DIVERTED_BOOL", col("DIVERTED") === 1.0)

  /** Stage 4 (validate_business_rules): range checks + the five-term
    * DATA_QUALITY_SCORE ∈ [0,1] (missing flags subtract).
    */
  def validateBusinessRules(df: DataFrame): DataFrame =
    df.withColumn("AIR_TIME_VALID",
        when(col("AIR_TIME_CLEAN").isNotNull,
          col("AIR_TIME_CLEAN") > 0 && col("AIR_TIME_CLEAN") < 1440).otherwise(false))
      .withColumn("DISTANCE_VALID",
        when(col("DISTANCE").isNotNull,
          col("DISTANCE") > 0 && col("DISTANCE_KM") < 20000).otherwise(false))
      .withColumn("REASONABLE_DELAYS",
        when(col("DEP_DELAY_CLEAN").isNotNull && col("ARR_DELAY_CLEAN").isNotNull,
          col("DEP_DELAY_CLEAN") > -60 && col("DEP_DELAY_CLEAN") < 300 &&
          col("ARR_DELAY_CLEAN") > -60 && col("ARR_DELAY_CLEAN") < 300)
          .otherwise(false))
      .withColumn("DATA_QUALITY_SCORE",
        (when(col("has_missing_times"), 0).otherwise(1) +
         when(col("has_missing_delays"), 0).otherwise(1) +
         when(col("AIR_TIME_VALID"), 1).otherwise(0) +
         when(col("DISTANCE_VALID"), 1).otherwise(0) +
         when(col("REASONABLE_DELAYS"), 1).otherwise(0)) / 5.0)

  /** Stage 5 (standardize_text_fields): trim/upper codes and names. */
  def standardizeTextFields(df: DataFrame): DataFrame =
    df.withColumn("AIRLINE_CODE_CLEAN", upper(trim(col("OP_UNIQUE_CARRIER"))))
      .withColumn("ORIGIN_AIRPORT_CLEAN", upper(trim(col("ORIGIN"))))
      .withColumn("DEST_AIRPORT_CLEAN", upper(trim(col("DEST"))))
      .withColumn("CARRIER_NAME_CLEAN", trim(col("CARRIER_NAME")))
      .withColumn("ORIGIN_AIRPORT_NAME_CLEAN", trim(col("ORIGIN_AIRPORT_NAME")))
      .withColumn("DEST_AIRPORT_NAME_CLEAN", trim(col("DEST_AIRPORT_NAME")))

  val clean: DataFrame => DataFrame =
    Seq(cleanDatetimeFields _, handleMissingValues _, standardizeDataTypes _,
      validateBusinessRules _, standardizeTextFields _)
      .reduce(_ andThen _)

  /** Enrichment 1 (categorize_delays): ordered first-match categories
    * + IS_DELAYED / IS_ONTIME tri-state (null when delays unknown).
    */
  def categorizeDelays(df: DataFrame): DataFrame = {
    def category(c: String) =
      when(col(c).isNull, "Unknown")
        .when(col(c) < 0, "Early")
        .when(col(c) === 0, "On time")
        .when(col(c) <= 15, "Minor")
        .when(col(c) <= 60, "Moderate")
        .when(col(c) <= 180, "Significant")
        .otherwise("Severe")
    df.withColumn("DEP_DELAY_CATEGORY", category("DEP_DELAY_CLEAN"))
      .withColumn("ARR_DELAY_CATEGORY", category("ARR_DELAY_CLEAN"))
      .withColumn("IS_DELAYED",
        when(col("DEP_DELAY_CLEAN").isNull || col("ARR_DELAY_CLEAN").isNull, lit(null))
          .when(col("DEP_DELAY_CLEAN") > 0 || col("ARR_DELAY_CLEAN") > 0, true)
          .otherwise(false))
      .withColumn("IS_ONTIME",
        when(col("DEP_DELAY_CLEAN").isNull || col("ARR_DELAY_CLEAN").isNull, lit(null))
          .when(col("DEP_DELAY_CLEAN") <= 0 && col("ARR_DELAY_CLEAN") <= 0, true)
          .otherwise(false))
  }

  /** Enrichment 2 (calculate_performance_metrics). */
  def performanceMetrics(df: DataFrame): DataFrame =
    df.withColumn("SPEED_KM_H",
      when(col("DISTANCE_KM").isNotNull && col("AIR_TIME_CLEAN").isNotNull,
        col("DISTANCE_KM") / col("AIR_TIME_CLEAN") * 60).otherwise(lit(null)))

  /** Enrichment 3 (add_operational_metrics). */
  def operationalMetrics(df: DataFrame): DataFrame =
    df.withColumn("ROUTE_CODE",
        concat(col("ORIGIN_AIRPORT_CLEAN"), lit("-"), col("DEST_AIRPORT_CLEAN")))
      .withColumn("ROUTE_NAME",
        concat(lit("from "), col("ORIGIN_AIRPORT_NAME_CLEAN"),
          lit(" to "), col("DEST_AIRPORT_NAME_CLEAN")))
      .withColumn("IS_WEEKEND",
        dayofweek(col("FL_DATE_PARSED")) === 1 || dayofweek(col("FL_DATE_PARSED")) === 7)

  val enrich: DataFrame => DataFrame =
    Seq(categorizeDelays _, performanceMetrics _, operationalMetrics _)
      .reduce(_ andThen _)

  /** P1: the 34-column silver contract projection
    * (flights_silver_transform.py:69-119).
    */
  def finalProjection(df: DataFrame): DataFrame =
    df.select(
      col("FL_DATE_PARSED").as("FLIGHT_DATE"),
      col("OP_CARRIER_FL_NUM").as("FLIGHT_NUMBER"),
      col("AIRLINE_CODE_CLEAN").as("AIRLINE_CODE"),
      col("CARRIER_NAME_CLEAN").as("AIRLINE_NAME"),
      col("ORIGIN_AIRPORT_CLEAN").as("ORIGIN_AIRPORT_CODE"),
      col("DEST_AIRPORT_CLEAN").as("DEST_AIRPORT_CODE"),
      col("ORIGIN_AIRPORT_NAME_CLEAN").as("ORIGIN_AIRPORT_NAME"),
      col("DEST_AIRPORT_NAME_CLEAN").as("DEST_AIRPORT_NAME"),
      col("DEP_TIME_PARSED").as("ACTUAL_DEPARTURE_TIME"),
      col("ARR_TIME_PARSED").as("ACTUAL_ARRIVAL_TIME"),
      col("CRS_DEP_TIME_PARSED").as("PLANNED_DEPARTURE_TIME"),
      col("CRS_ARR_TIME_PARSED").as("PLANNED_ARRIVAL_TIME"),
      col("DEP_DELAY_CLEAN").as("DEPARTURE_DELAY"),
      col("ARR_DELAY_CLEAN").as("ARRIVAL_DELAY"),
      col("DEP_DELAY_NEW").as("DEPARTURE_DELAY_NEW"),
      col("ARR_DELAY_NEW").as("ARRIVAL_DELAY_NEW"),
      col("DEP_DELAY_CATEGORY").as("DEPARTURE_DELAY_CATEGORY"),
      col("ARR_DELAY_CATEGORY").as("ARRIVAL_DELAY_CATEGORY"),
      col("IS_DELAYED"), col("IS_ONTIME"),
      col("CANCELLED_BOOL").as("IS_CANCELLED"),
      col("DIVERTED_BOOL").as("IS_DIVERTED"),
      col("AIR_TIME_CLEAN").as("AIR_TIME_MINUTES"),
      col("AIR_TIME_HOURS_CLEAN").as("AIR_TIME_HOURS"),
      col("DISTANCE_KM"), col("SPEED_KM_H"),
      col("ROUTE_CODE"), col("ROUTE_NAME"), col("IS_WEEKEND"),
      col("has_missing_times").as("HAS_MISSING_TIMES"),
      col("has_missing_delays").as("HAS_MISSING_DELAYS"),
      col("AIR_TIME_VALID"), col("DISTANCE_VALID"), col("REASONABLE_DELAYS"),
      col("DATA_QUALITY_SCORE"))

  /** Full silver stage. */
  val transform: DataFrame => DataFrame =
    clean andThen enrich andThen finalProjection
}
