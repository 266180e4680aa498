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

  // t-closeness grid: adds a homogeneous-s2 class so EMDs spread.
  // N=8, s1=5, s2=3; global cums: s1->5, s2->8. Hand EMDs (m=2):
  //   (A,x) size 3, cums (2,3): |2·8−5·3| + 0 = 1  -> 1/24  ≈ 0.0417
  //   (A,y) size 1, cums (1,1): |1·8−5·1| + 0 = 3  -> 3/8   = 0.375
  //   (B,x) size 2, cums (2,2): |2·8−5·2| + 0 = 6  -> 6/16  = 0.375
  //   (B,y) size 2, cums (0,2): |0−5·2|   + 0 = 10 -> 10/16 = 0.625
  private def tRows = rows.union(Seq(
    ("B", "y", "s2"), ("B", "y", "s2")).toDF("region", "segment", "sensitive"))

  test("tClosenessAudit: hand-computed ordered EMD per class, raw gate") {
    val got = Privacy.tClosenessAudit(tRows, Seq("region", "segment"),
        "sensitive", t = 0.5, reportCols = Seq("region"))
      .orderBy("region").collect()
    val a = got(0)
    assert(a.getString(0) === "A")
    assert(a.getLong(1) === 4L)      // n_records
    assert(a.getLong(2) === 2L)      // n_classes
    assert(a.getDouble(3) === 0.375) // t_max
    assert(a.getLong(4) === 0L)      // n_violating at raw t=0.5
    val b = got(1)
    assert(b.getString(0) === "B")
    assert(b.getLong(1) === 4L && b.getLong(2) === 2L)
    assert(b.getDouble(3) === 0.625)
    assert(b.getLong(4) === 1L)      // only (B,y) exceeds 0.5
    assert(b.getLong(5) === 2L)      // its 2 records exposed
    assert(b.getDouble(6) === 0.5)
  }

  test("tClosenessAudit: normalized gate scales by sqrt(class size)") {
    // stats: (A,x) 0.0417·√3≈0.072, (A,y) 0.375, (B,x) 0.375·√2≈0.530,
    // (B,y) 0.625·√2≈0.884 — only (B,y) exceeds 0.7.
    val got = Privacy.tClosenessAudit(tRows, Seq("region", "segment"),
        "sensitive", t = 0.7, reportCols = Seq("region"), normalized = true)
      .orderBy("region").collect()
    assert(got(0).getLong(4) === 0L)
    assert(got(1).getLong(4) === 1L && got(1).getLong(5) === 2L)
  }

  test("tClosenessAudit: a class matching the global mix has EMD 0") {
    // one QI class only -> its distribution IS the global one
    val uni = Seq(("A", "x", "s1"), ("A", "x", "s2"), ("A", "x", "s1"))
      .toDF("region", "segment", "sensitive")
    val got = Privacy.tClosenessAudit(uni, Seq("region", "segment"),
      "sensitive", 0.1, Seq("region")).head()
    assert(got.getDouble(3) === 0.0 && got.getLong(4) === 0L)
  }

  test("tClosenessAudit: single-valued sensitive domain is EMD 0, not NaN") {
    // m_vals = 1 makes the raw formula 0/0 = NaN, and NaN orders above
    // every t — flagging every class as violating. The correct answer
    // is EMD = 0 (P = Q trivially when there is one value).
    val mono = Seq(("A", "x", "s1"), ("A", "y", "s1"), ("B", "x", "s1"))
      .toDF("region", "segment", "sensitive")
    val got = Privacy.tClosenessAudit(mono, Seq("region", "segment"),
        "sensitive", t = 0.001, reportCols = Seq("region"))
      .orderBy("region").collect()
    got.foreach { r =>
      assert(!r.getDouble(3).isNaN, "t_max is NaN")
      assert(r.getDouble(3) === 0.0)
      assert(r.getLong(4) === 0L, "single-valued domain flagged violating")
    }
  }

  test("tClosenessAudit shuffle-partition invariance") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    def snap = Privacy.tClosenessAudit(tRows, Seq("region", "segment"),
      "sensitive", 0.5, Seq("region")).collect().map(_.toString).sorted.toSeq
    val base = snap
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      assert(snap === base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
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
