package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HRW sharding contract: range, determinism, balance, and the
  * defining monotone-resize property — adding a shard moves keys ONLY
  * into the new shard.
  */
class RendezvousSpec extends SparkSpec {
  import spark.implicits._

  private def keys(n: Int) = (0 until n).map(_.toLong * 17 + 3).toDF("k")

  test("assignment in range, one shard per key, deterministic") {
    val a = Rendezvous.assign(keys(500), "k", 8)
      .select("k", "shard").as[(Long, Int)].collect().toMap
    assert(a.size === 500)
    assert(a.values.forall(s => s >= 0 && s < 8))
    val b = Rendezvous.assign(keys(500).repartition(7), "k", 8)
      .select("k", "shard").as[(Long, Int)].collect().toMap
    assert(a === b)
  }

  test("balance: no shard starves or hoards on 2000 keys x 16 shards") {
    val counts = Rendezvous.assign(keys(2000), "k", 16)
      .groupBy("shard").count().as[(Int, Long)].collect().toMap
    assert(counts.size === 16)
    // uniform expectation 125/shard; generous 3x band
    assert(counts.values.forall(c => c > 40 && c < 375), counts.toString)
  }

  test("duplicate keys: every input row is assigned, none dropped") {
    // 4 copies of each of 50 keys — a window-over-key argmax would
    // collapse each key's copies to a single output row.
    val dup = (0 until 200).map(i => ((i % 50).toLong, i)).toDF("k", "pay")
    val out = Rendezvous.assign(dup, "k", 8)
      .select("k", "pay", "shard").as[(Long, Int, Int)].collect()
    assert(out.length === 200, s"rows dropped: ${200 - out.length}")
    assert(out.map(r => (r._1, r._2)).toSet.size === 200)
    // copies of the same key land on the same shard
    assert(out.groupBy(_._1).values.forall(_.map(_._3).distinct.length == 1))
  }

  test("monotone resize: adding a shard only moves keys INTO it") {
    val at5 = Rendezvous.assign(keys(800), "k", 5)
      .select("k", "shard").as[(Long, Int)].collect().toMap
    val at6 = Rendezvous.assign(keys(800), "k", 6)
      .select("k", "shard").as[(Long, Int)].collect().toMap
    val moved = at5.keys.filter(k => at5(k) != at6(k))
    assert(moved.forall(k => at6(k) == 5),
      s"keys moved between OLD shards: ${moved.filter(k => at6(k) != 5)}")
    // expected churn ~ 1/6 of keys; assert the order of magnitude
    assert(moved.size > 800 / 12 && moved.size < 800 / 3, moved.size)
  }
}
