package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables runs with zero shuffle exchanges") {
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "rv")
    ParquetTable.writeBucketedTable(left, "b_left", 8, Seq("k"), Seq("k"))
    ParquetTable.writeBucketedTable(right, "b_right", 8, Seq("k"), Seq("k"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the shuffle behavior is visible
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_left")
        .join(spark.table("b_right"), "k")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"expected shuffle-free co-bucketed join, got:\n$plan")
      assert(joined.count() === 1000)

      // aggregation on the bucket key is also shuffle-free
      val agg = spark.table("b_left").groupBy("k").agg(count(lit(1)))
      agg.collect()
      assert(!agg.queryExecution.executedPlan.toString().contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_left")
      spark.sql("DROP TABLE IF EXISTS b_right")
    }
  }
}
