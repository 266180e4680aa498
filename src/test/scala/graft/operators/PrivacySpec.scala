package graft.operators

import graft.SparkSpec

/** k-anonymity / l-diversity audit semantics on a hand-computable
  * grid, plus the rollup contract (classes sum to records, subset
  * guard) and shuffle-partition invariance.
  */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // (region, segment, sensitive) — classes by (region, segment):
  //   (A, x): 3 rows, sensitive {s1, s2}        -> size 3, l 2
  //   (A, y): 1 row,  sensitive {s1}            -> size 1, l 1
  //   (B, x): 2 rows, sensitive {s1}            -> size 2, l 1
  private def rows = Seq(
    ("A", "x", "s1"), ("A", "x", "s1"), ("A", "x", "s2"),
    ("A", "y", "s1"),
    ("B", "x", "s1"), ("B", "x", "s1"))
    .toDF("region", "segment", "sensitive")

  test("classProfile: size and sensitive diversity per QI tuple") {
    val got = Privacy.classProfile(rows, Seq("region", "segment"), "sensitive")
      .orderBy("region", "segment")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("A", "x", 3L, 2L), ("A", "y", 1L, 1L), ("B", "x", 2L, 1L)))
  }

  test("kAnonymityAudit: per-region k, l, risky mass under k=3") {
    val got = Privacy.kAnonymityAudit(rows, Seq("region", "segment"),
        "sensitive", k = 3L, reportCols = Seq("region"))
      .orderBy("region").collect()
    // region A: classes {3, 1} -> k=1, l=1, risky = 1 of 4 records
    val a = got(0)
    assert(a.getString(0) === "A")
    assert(a.getLong(1) === 4L)   // n_records
    assert(a.getLong(2) === 2L)   // n_classes
    assert(a.getLong(3) === 1L)   // k_anonymity
    assert(a.getLong(4) === 1L)   // l_diversity
    assert(a.getLong(5) === 1L)   // n_risky_records
    assert(a.getDouble(6) === 0.25)
    // region B: one class of 2 -> k=2, risky = all 2 records
    val b = got(1)
    assert(b.getLong(1) === 2L && b.getLong(3) === 2L && b.getLong(5) === 2L)
    assert(b.getDouble(6) === 1.0)
  }

  test("audit invariants: class mass sums to records; k=1 grid is all-safe") {
    val audit = Privacy.kAnonymityAudit(rows, Seq("region", "segment"),
      "sensitive", k = 1L, reportCols = Seq("region"))
    assert(audit.collect().forall(r => r.getLong(5) == 0L))
    val total = audit.agg(org.apache.spark.sql.functions.sum("n_records"))
      .head.getLong(0)
    assert(total === 6L)
  }

  test("reportCols must be a subset of qiCols") {
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityAudit(rows, Seq("region"), "sensitive", 2L,
        Seq("segment"))
    }
  }

  test("shuffle-partition invariance") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    def snap = Privacy.kAnonymityAudit(rows, Seq("region", "segment"),
      "sensitive", 3L, Seq("region")).collect().map(_.toString).sorted.toSeq
    val base = snap
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      assert(snap === base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
