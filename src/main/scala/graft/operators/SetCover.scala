package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Greedy maximum-coverage selection — the (1 − 1/e)-approximate
  * submodular picker behind "choose k documents that together cover
  * the most distinct features" (eval-suite construction, seed-set
  * selection, coreset sketching). Round r picks the item whose
  * feature set adds the most NOT-yet-covered features, ties to the
  * smallest id.
  *
  * Shape at scale: the item-feature incidence is a distinct (id, h)
  * table; each round is one anti-join against the covered-feature set
  * (equi-join keyed on the feature hash — never a per-item scan of
  * the covered set) + a hash-agg of gains + a 1-ROW collect (the
  * argmax). Driver state is k winner ids; the covered set stays
  * distributed, localCheckpoint-ed per round so plan depth is O(1).
  * k is a small constant (the q107 bounded-driver-loop discipline).
  */
object SetCover {

  /** Greedy k rounds over distinct `(id, h)` incidence pairs.
    * Returns one row per round: (round 1-based, picked id, gain =
    * newly covered features). Stops early if every feature is
    * covered; rounds then < k.
    */
  def greedy(spark: SparkSession, pairs: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    val inc = pairs.select(col("id"), col("h")).distinct()
      .localCheckpoint(true)
    var covered: DataFrame = null // null = empty set, round 1 skips the join
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    var round = 1
    var done = false
    while (round <= k && !done) {
      val fresh =
        if (covered == null) inc
        else inc.join(covered, Seq("h"), "left_anti")
      val top = fresh.groupBy(col("id")).agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("id").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val id = top(0).getLong(0); val gain = top(0).getLong(1)
        picks += ((round, id, gain))
        val won = inc.filter(col("id") === id).select(col("h"))
        covered = (if (covered == null) won
                   else covered.unionByName(won).distinct())
          .localCheckpoint(true)
        round += 1
      }
    }
    import spark.implicits._
    picks.toSeq.toDF("round", "id", "gain")
  }
}
