package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def keys(n: Int) = (1L to n).map(k => (k, if (k % 2 == 0) "a" else "b"))
    .toDF("k", "stratum")

  test("hashSample is deterministic and partition-invariant") {
    val df = keys(5000)
    val once = Sampling.hashSample(df, "k", 100, 1000)
      .select("k").as[Long].collect().sorted.toSeq
    val again = Sampling.hashSample(df.repartition(17), "k", 100, 1000)
      .select("k").as[Long].collect().sorted.toSeq
    assert(once === again)
    // ~10% +- sampling noise
    assert(once.size > 5000 * 0.06 && once.size < 5000 * 0.14)
  }

  test("stratifiedHashSample applies per-stratum rates") {
    val df = keys(20000)
    val sampled = Sampling.stratifiedHashSample(
      df, "k", "stratum", Map("a" -> 300), defaultNum = 50, den = 1000)
    val byStratum = sampled.groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // stratum a at 30%, stratum b at default 5% (10000 keys each)
    assert(byStratum("a") > 10000 * 0.25 && byStratum("a") < 10000 * 0.35)
    assert(byStratum("b") > 10000 * 0.02 && byStratum("b") < 10000 * 0.08)
  }

  test("mixtureSample hits per-stratum budgets, capped at population") {
    val df = keys(10000) // 5000 per stratum
    // budgets: a = 6000·500‰ = 3000 of 5000; b = 6000·1200‰ = 7200 > 5000
    val out = Sampling.mixtureSample(df, "k", "stratum",
      targetTotal = 6000, weightsPerMille = Map("a" -> 500, "b" -> 1200),
      defaultPerMille = 0)
    val byStratum = out.groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // subsampled stratum lands near its budget (hash-slot noise only)
    assert(byStratum("a") > 3000 * 0.9 && byStratum("a") < 3000 * 1.1)
    // over-weighted stratum is capped: keeps every row
    assert(byStratum("b") === 5000L)
    val tn = out.select("stratum", "target_n").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tn === Map("a" -> 3000L, "b" -> 5000L))
  }

  test("mixtureSample samples NULL strata at the default rate (null-safe join)") {
    // half the rows carry a NULL stratum: they form their own stratum
    // and get the default budget — an EqualTo join would silently drop
    // every one of them (the round-5 advisor finding)
    val df = (1L to 4000L)
      .map(k => (k, if (k % 2 == 0) "a" else null))
      .toDF("k", "stratum")
    val out = Sampling.mixtureSample(df, "k", "stratum",
      targetTotal = 2000, weightsPerMille = Map("a" -> 500),
      defaultPerMille = 500)
    val byStratum = out.groupBy("stratum").count()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    // both strata have 2000 rows and a 1000-row budget
    assert(byStratum.contains(None), "NULL-stratum rows were dropped")
    assert(byStratum(None) > 900L && byStratum(None) < 1100L)
    assert(byStratum(Some("a")) > 900L && byStratum(Some("a")) < 1100L)
    // population/budget columns populated for the null stratum too
    val tn = out.filter(col("stratum").isNull)
      .select("stratum_n", "target_n").distinct().collect()
    assert(tn.length === 1 && tn(0).getLong(0) === 2000L &&
      tn(0).getLong(1) === 1000L)
  }

  test("mixtureSample is deterministic under repartitioning") {
    val df = keys(4000)
    def kept(d: org.apache.spark.sql.DataFrame) =
      Sampling.mixtureSample(d, "k", "stratum", 1000,
        Map("a" -> 600), 400).select("k").as[Long].collect().toSet
    assert(kept(df) === kept(df.repartition(11)))
  }

  test("exactPerStratum yields exactly k per stratum, stable under repartition") {
    val df = keys(2000)
    def sample(d: org.apache.spark.sql.DataFrame) =
      Sampling.exactPerStratum(d, "k", "stratum", 7)
        .select("k").as[Long].collect().toSet
    val got = sample(df)
    assert(got.size === 14) // 7 from each of the two strata
    assert(sample(df.repartition(9)) === got)
    // a stratum smaller than k yields its whole population
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("k", "stratum")
    assert(Sampling.exactPerStratum(tiny, "k", "stratum", 7).count() === 3)
  }

  test("slot hash survives huge keys and strata beyond the hash primes") {
    // keys at replicated-dataset scale (~9e9): the naive (key+1)*A
    // formulation wrapped negative here; and a stratum LARGER than the
    // 1e6-scale hash primes: the naive slot range capped at 1000003,
    // turning any larger stratum's budget filter into a tautology
    val big = spark.range(0, 2000000)
      .select((col("id") + 9000000000L).as("k"), lit("s").as("stratum"))
    val slots = big.select(Sampling.slotWide(col("k")).as("s"))
      .agg(min("s").as("mn"), max("s").as("mx")).collect()(0)
    assert(slots.getLong(0) >= 0L) // no negative overflow wrap
    assert(slots.getLong(1) > 1000003L) // range not capped at P1
    // budget 500k of a 2M stratum: kept must track the budget, not
    // collapse to all-rows (the old tautology) — hash-slot noise only
    val kept = Sampling.mixtureSample(big, "k", "stratum",
      targetTotal = 500000, weightsPerMille = Map("s" -> 1000),
      defaultPerMille = 0).count()
    assert(kept > 400000L && kept < 600000L, s"kept=$kept of 2M, budget 500k")
  }

  test("weightedHashSample keeps rows proportionally to their probability") {
    val df = (1L to 20000L).map(k => (k, if (k % 2 == 0) 0.8 else 0.2))
      .toDF("k", "p")
    val kept = Sampling.weightedHashSample(df, "k", col("p"))
      .groupBy("p").count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(kept(0.8) > 10000 * 0.72 && kept(0.8) < 10000 * 0.88)
    assert(kept(0.2) > 10000 * 0.14 && kept(0.2) < 10000 * 0.26)
    // p clamps: 0 keeps nothing, >=1 keeps everything
    assert(Sampling.weightedHashSample(df, "k", lit(0.0)).count() === 0)
    assert(Sampling.weightedHashSample(df, "k", lit(1.5)).count() === 20000)
    // deterministic under repartitioning
    val a = Sampling.weightedHashSample(df, "k", col("p"))
      .select("k").as[Long].collect().toSet
    val b = Sampling.weightedHashSample(df.repartition(7), "k", col("p"))
      .select("k").as[Long].collect().toSet
    assert(a === b)
  }

  test("weightedReservoir: exactly k, naive-reference parity, weight-monotone, zero-weight-free") {
    val rows = (1L to 300L).map(i => (i, (i % 17 + 1).toDouble))
    val df = rows.toDF("k", "w")
    val got = Sampling.weightedReservoir(df, "k", col("w"), 20)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(got.size === 20)
    // independent recomputation: same hash → inv → LnDet.compute → /w,
    // top-20 by (key, id) in plain Scala
    def slotWideRef(k: Long): Long = {
      val h1 = ((k % 2147483647L + 2147483647L) % 2147483647L + 1L) *
        2654435761L % 1000003L
      val h2 = ((k % 2147483629L + 2147483629L) % 2147483629L + 1L) *
        2246822519L % 999983L
      h1 * 999983L + h2
    }
    val want = rows.map { case (k, w) =>
      val inv = 999985999950.0 / (slotWideRef(k) + 1L).toDouble
      (graft.expressions.LnDet.compute(inv) / w, k)
    }.sorted.take(20).map(_._2).toSet
    assert(got === want, "selection diverged from the naive A-ES reference")
    // monotone in weight: boosting a non-selected row's weight far
    // enough pulls it in; boosting an already-selected row keeps it
    val out = (rows.map(_._1).toSet -- got).head
    val boosted = rows.map { case (k, w) =>
      (k, if (k == out) w * 1e9 else w) }.toDF("k", "w")
    val got2 = Sampling.weightedReservoir(boosted, "k", col("w"), 20)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(got2.contains(out), "raising a weight must not hurt inclusion")
    // zero/negative weights are never sampled
    val withZero = rows.map { case (k, w) =>
      (k, if (k <= 250) 0.0 else w) }.toDF("k", "w")
    val got3 = Sampling.weightedReservoir(withZero, "k", col("w"), 20)
      .select("k").collect().map(_.getLong(0))
    assert(got3.forall(_ > 250) && got3.length === 20)
    // partition invariance
    val got4 = Sampling.weightedReservoir(df.repartition(13), "k",
      col("w"), 20).select("k").collect().map(_.getLong(0)).toSet
    assert(got4 === got)
  }

  test("weightedReservoirPerStratum: k per stratum, per-stratum A-ES parity, stable") {
    val rows = (1L to 240L).map(i => (i, s"s${i % 4}", (i % 13 + 1).toDouble))
    val df = rows.toDF("k", "g", "w")
    val got = Sampling.weightedReservoirPerStratum(df, "k", "g", col("w"), 7)
      .select("g", "k").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.groupBy(_._1).forall(_._2.length == 7))
    // each stratum's selection equals the global operator run on just
    // that stratum (the per-stratum window IS k independent reservoirs)
    for (g <- Seq("s0", "s1", "s2", "s3")) {
      val solo = Sampling.weightedReservoir(df.filter(col("g") === g),
        "k", col("w"), 7).select("k").collect().map(_.getLong(0)).toSet
      assert(got.filter(_._1 == g).map(_._2).toSet === solo, s"stratum $g")
    }
    val again = Sampling.weightedReservoirPerStratum(df.repartition(11),
        "k", "g", col("w"), 7)
      .select("g", "k").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.sorted.toSeq === again.sorted.toSeq)
  }

  test("trainEvalSplit is disjoint, exhaustive, and key-consistent") {
    val df = keys(3000)
    val split = Sampling.trainEvalSplit(df, "k", evalPerMille = 200)
    assert(split.count() === 3000)
    val evalKeys = split.filter(col("split") === "eval")
      .select("k").as[Long].collect().toSet
    val trainKeys = split.filter(col("split") === "train")
      .select("k").as[Long].collect().toSet
    assert(evalKeys.intersect(trainKeys).isEmpty)
    assert(evalKeys.size + trainKeys.size === 3000)
    // same keys land on the same side when derived from another table
    val other = keys(3000).withColumn("payload", col("k") * 2)
    val evalKeys2 = Sampling.trainEvalSplit(other, "k", 200)
      .filter(col("split") === "eval").select("k").as[Long].collect().toSet
    assert(evalKeys2 === evalKeys)
  }

  test("tempered membership keeps rare strata at ~1/sqrt(n) higher rates") {
    // q113's integer predicate slot(id)^2 * n_stratum < K^2 on a
    // SKEWED source distribution — the testdata sources are uniform,
    // so the inverse-sqrt character is pinned here: a stratum with 16x
    // the rows must sample at ~1/4 the rate (keeping its absolute
    // sample count ~4x, i.e. flattened toward uniform, never equal).
    val den = 1000
    val k2 = 2500L * 2500L
    val rows = ((1L to 16000L).map(i => (i, "big")) ++
      (100001L to 101000L).map(i => (i, "rare"))).toDF("id", "src")
    val counts = rows.groupBy(col("src")).agg(count(lit(1)).as("n"))
    val slot = Sampling.slot(col("id"), den)
    val kept = rows.join(broadcast(counts), "src")
      .filter(slot * slot * col("n") < lit(k2))
      .groupBy(col("src")).agg(count(lit(1)).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rateBig = kept("big").toDouble / 16000
    val rateRare = kept("rare").toDouble / 1000
    // theory: rate = K/(den*sqrt(n)) -> big 2500/(1000*126.5) ~ 0.0198,
    // rare 2500/(1000*31.6) ~ 0.0791; ratio exactly sqrt(16) = 4
    assert(math.abs(rateBig - 0.0198) < 0.005, s"big rate $rateBig")
    assert(math.abs(rateRare - 0.0791) < 0.02, s"rare rate $rateRare")
    val ratio = rateRare / rateBig
    assert(ratio > 3.0 && ratio < 5.0,
      s"rare/big rate ratio $ratio should be ~sqrt(16)=4")
  }
}
