package graft

/** Dev tool: print formatted physical plans for selected queries (all
  * with no args) and a one-line summary of scan pushdown / join
  * strategy / codegen coverage per query.
  *
  *   sbt "runMain graft.Explain q01_pricing_summary q04_star_broadcast"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.core.GraftSession.local(appName = "graft-explain")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // materialize THIS df's queryExecution so AQE finalizes the plan
      // (a noop write would execute a separate clone and leave
      // isFinalPlan=false here); Explain runs at sf0.001 so collect is
      // cheap
      df.collect()
      val plan = df.queryExecution.executedPlan.toString()
      val pushed = "PushedFilters: \\[[^\\]]+\\]".r
        .findAllIn(plan).toSeq.count(!_.contains("[]"))
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
      val bnl = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
      val smj = "SortMergeJoin".r.findAllIn(plan).size
      // codegen stages appear as "*(n)" prefixes in plan strings
      val wsc = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan)
        .map(_.group(1)).toSet.size
      val exch = "Exchange".r.findAllIn(plan).size
      println(s"== $name: pushedFilters=$pushed broadcastHash=$bhj " +
        s"broadcastNL=$bnl sortMerge=$smj codegenSpans=$wsc exchanges=$exch")
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN_FULL")) {
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    }
    spark.stop()
  }
}
