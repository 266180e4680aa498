package graft.dev
import org.apache.spark.sql.functions._

/** Scratch perf/plan probe (dev only, not part of the engine surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(appName = "probe")
    val qs = graft.SparkEntry.queries
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (n <- args) {
      val df = qs(n)(spark, dir)
      println(s"===== $n =====")
      df.explain("formatted")
    }
    spark.stop()
  }
}
