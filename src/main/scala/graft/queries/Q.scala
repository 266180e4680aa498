package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle over
  * the same parquet tables. Queries must be deterministic: stable ORDER
  * BY on non-null keys, floating aggregates rounded, identical column
  * names on both sides (driver hash-compares by sorted column name).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Q {
  /** Registry helper: fold query groups into the SparkEntry maps. */
  def toQueryMap(qs: Seq[Q]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.run).toMap
  def toOracleMap(qs: Seq[Q]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
