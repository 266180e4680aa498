package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for the cases AQE's skew-join splitting
  * can't reach (aggregations, or joins below AQE's skew thresholds).
  *
  * At 100 TB a single hot key (one airline, one route, one document
  * template) can pin an entire stage on one task; salting fans the hot
  * key across `salts` partitions at the cost of replicating the small
  * side / adding a second (cheap, partial-aggregated) shuffle.
  */
object Skew {

  /** Deterministic per-row salt: hash of EVERY column of the row, mod
    * `salts`. Determinism is load-bearing, not cosmetic: a salt built
    * on `monotonically_increasing_id` (or rand) changes value when a
    * task is retried or a stage re-runs under AQE, so the same row can
    * land in two different shuffle buckets across attempts — exactly
    * the nondeterministic-shuffle-key shape behind SPARK-23207-class
    * double-count/loss bugs. Hashing the full row is stable across
    * retries and repartitioning. Caveat (documented, accepted):
    * byte-identical duplicate rows share a salt, so a hot key made of
    * *identical* rows will not spread — dedup upstream or add a stable
    * discriminator column before salting in that case.
    */
  private def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(hash(df.columns.map(col): _*), lit(salts))

  /** Equi-join `big ⋈ small` on `key`, with the big side salted into
    * `salts` buckets and the small side replicated once per salt.
    * Result equals the unsalted join; the shuffle key becomes
    * (key, salt) so a hot key spreads over `salts` tasks. Inner and
    * left joins only (replication breaks right/full semantics).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "left_outer").contains(joinType),
      "salted join supports inner/left only")
    val saltedBig = big.withColumn("__salt", rowSalt(big, salts))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall,
        saltedBig(key) === replicatedSmall(key) &&
          saltedBig("__salt") === replicatedSmall("__salt"),
        joinType)
      .drop(replicatedSmall(key))
      .drop(saltedBig("__salt")).drop(replicatedSmall("__salt"))
  }

  /** Two-phase salted aggregation: partial-aggregate on (key, salt),
    * then final-aggregate on key. `partials` maps output column name →
    * (partial agg over raw rows, final agg over partials). Result
    * equals the direct groupBy for decomposable aggregates
    * (count/sum/min/max).
    */
  def twoPhaseAgg(df: DataFrame, key: String, salts: Int,
      partials: Map[String, (Column, Column => Column)]): DataFrame = {
    val salted = df.withColumn("__salt", rowSalt(df, salts))
    val phase1 = salted.groupBy(col(key), col("__salt"))
      .agg(partials.head._2._1.as(s"__p_${partials.head._1}"),
        partials.tail.map { case (n, (p, _)) => p.as(s"__p_$n") }.toSeq: _*)
    phase1.groupBy(col(key))
      .agg(partials.head._2._2(col(s"__p_${partials.head._1}")).as(partials.head._1),
        partials.tail.map { case (n, (_, f)) => f(col(s"__p_$n")).as(n) }.toSeq: _*)
  }

  /** Skew-safe count per key. */
  def countByKey(df: DataFrame, key: String, salts: Int): DataFrame =
    twoPhaseAgg(df, key, salts,
      Map("cnt" -> (count(lit(1)), (c: Column) => sum(c))))

  /** Skew-safe sum per key. */
  def sumByKey(df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame =
    twoPhaseAgg(df, key, salts,
      Map("total" -> (sum(col(valueCol)), (c: Column) => sum(c))))
}
