package graft

/** Dev smoke: mirrors the driver's t1 check (SparkEntry.entry rows > 0). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS=$n")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
