package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each scale-factor directory holds one parquet file per table. At
  * cluster scale these would be directory-partitioned datasets; the
  * read path is identical (`spark.read.parquet(dir)` handles both).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events` with a canonical `ts_us` BIGINT epoch-micros column.
    *
    * The driver's generated `events.parquet` has shipped `ts` as both
    * TIMESTAMP(NANOS) (which the nanosAsLong conf surfaces as an
    * epoch-nanos long) and TIMESTAMP(MICROS) (surfaced as
    * TIMESTAMP_NTZ). Every event query does integer µs arithmetic —
    * session gaps, as-of deltas, day bucketing — so they all read
    * through this single physical-type dispatch instead of assuming a
    * layout. DuckDB's `epoch_us(ts)` yields the identical value for
    * either layout (naive timestamps are treated as UTC; the session
    * timezone here is pinned UTC to match), so oracles are unchanged.
    */
  def eventsUs(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = load(spark, sfDir, "events")
    ev.withColumn("ts_us", microsCol(ev, "ts"))
  }

  /** Epoch-micros BIGINT view of a timestamp-ish column (see eventsUs). */
  def microsCol(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case LongType          => expr(s"$c div 1000") // legacy epoch-nanos read
      case TimestampNTZType  => unix_micros(col(c).cast(TimestampType))
      case TimestampType     => unix_micros(col(c))
      case dt => throw new IllegalArgumentException(
        s"unsupported type for timestamp column $c: $dt")
    }

  /** Convenience bundle so query code reads declaratively. */
  final case class Tpch(spark: SparkSession, sfDir: String) {
    def region: DataFrame     = load(spark, sfDir, "region")
    def nation: DataFrame     = load(spark, sfDir, "nation")
    def customer: DataFrame   = load(spark, sfDir, "customer")
    def supplier: DataFrame   = load(spark, sfDir, "supplier")
    def part: DataFrame       = load(spark, sfDir, "part")
    def orders: DataFrame     = load(spark, sfDir, "orders")
    def lineitem: DataFrame   = load(spark, sfDir, "lineitem")
    def events: DataFrame     = load(spark, sfDir, "events")
    /** events + canonical epoch-micros `ts_us` (schema-drift safe). */
    def eventsUs: DataFrame   = Tables.eventsUs(spark, sfDir)
    def documents: DataFrame  = load(spark, sfDir, "documents")
    def embeddings: DataFrame = load(spark, sfDir, "embeddings")
  }
}
