package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    if (args.length < 2 || args.length > 3) {
      System.err.println(
        "usage: graft.Verify <sfDir> <outDir> [subset]\n" +
          "  subset: comma-separated names, or @sweep10x (the canonical\n" +
          "  scaled-oracle set, dev.SweepSets); default = all queries\n" +
          "  (SPARK_GRAFT_VERIFY_QUERIES env also accepted)")
      sys.exit(2)
    }
    val sfDir = args(0)
    val outDir = args(1)
    val spark = graft.core.GraftSession.local(appName = "graft-verify")
    new java.io.File(outDir).mkdirs()
    // optional dev-loop subset (arg 3 or env); driver runs all
    val subset = args.lift(2).orElse(sys.env.get("SPARK_GRAFT_VERIFY_QUERIES"))
      .map {
        case "@sweep10x" => graft.dev.SweepSets.sweep10x.toSet
        case s => s.split(",").map(_.trim).toSet
      }
    SparkEntry.queries
      .filter { case (name, _) => subset.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => subset.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
