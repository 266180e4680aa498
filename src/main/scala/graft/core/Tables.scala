package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    def documents: DataFrame  = load(spark, sfDir, "documents")
    def embeddings: DataFrame = load(spark, sfDir, "embeddings")
  }
}
