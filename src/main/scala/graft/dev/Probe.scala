package graft.dev
import org.apache.spark.sql.functions._

/** Scratch perf probe (dev only, not part of the engine surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(appName = "probe")
    spark.sparkContext.setLogLevel("INFO")
    val qs = graft.SparkEntry.queries
    val dir = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(s"PROBE $tag: ${(System.nanoTime() - t0) / 1e9}s")
    }
    for (n <- Seq("q32_json_extract", "q32_json_extract", "q30_summary_stats",
                  "q32_json_extract")) {
      time(n)(qs(n)(spark, dir).write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
