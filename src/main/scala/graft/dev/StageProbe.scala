package graft.dev
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-stage task-time probe for one query. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(appName = "stageprobe")
    val stages = mutable.Map[Int, (String, Long, Int, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = si.taskMetrics.executorRunTime
        val sw = si.taskMetrics.shuffleWriteMetrics.bytesWritten
        val sr = si.taskMetrics.shuffleReadMetrics.totalBytesRead
        val gc = si.taskMetrics.jvmGCTime
        stages(si.stageId) = (si.name.take(60), ms, si.numTasks, sw, sr, gc)
      }
    })
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (name <- args) {
      // warm
      graft.SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      stages.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(s"===== $name =====")
      println(f"WALL $wall%.2f s")
      stages.toSeq.sortBy(_._1).foreach { case (id, (n, ms, nt, sw, sr, gc)) =>
        println(f"stage $id%3d tasks=$nt%3d run=${ms/1000.0}%8.2f s " +
          f"gc=${gc/1000.0}%6.2f s " +
          f"swrite=${sw/1e6}%8.1f MB sread=${sr/1e6}%8.1f MB  $n")
      }
    }
    spark.stop()
  }
}
