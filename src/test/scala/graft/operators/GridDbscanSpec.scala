package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DBSCAN semantics on hand-built geometries: a dense blob, a chain
  * crossing cell boundaries, border attachment, noise, and
  * partition-count invariance.
  */
class GridDbscanSpec extends SparkSpec {
  import spark.implicits._

  private val EPS = 1.0
  private val MIN = 3

  test("blob + noise: one cluster, outlier stays unlabeled") {
    // 4 mutually-near points (pairwise dist <= 1), one far outlier
    val pts = Seq(
      (1L, 0.0, 0.0), (2L, 0.5, 0.0), (3L, 0.0, 0.5), (4L, 0.5, 0.5),
      (9L, 10.0, 10.0))
      .toDF("id", "x", "y")
    val lab = GridDbscan.label(pts, EPS, MIN).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(lab.length === 4)
    assert(lab.forall { case (_, c, role) => c == 1L && role == "core" })
  }

  test("chain across cell boundaries links into one cluster") {
    // points at x = 0, 0.9, 1.8, 2.7, 3.6 — consecutive pairs near,
    // different grid cells; all are core (each has >= 2 neighbors
    // except ends... ends have 1 neighbor so with MIN=2 all core)
    val pts = (0 to 4).map(i => (i.toLong + 1, i * 0.9, 0.0))
      .toDF("id", "x", "y")
    val lab = GridDbscan.label(pts, EPS, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(lab.length === 5)
    assert(lab.forall(_._2 == 1L), s"chain split: ${lab.mkString(",")}")
  }

  test("border point attaches to the smallest adjacent cluster") {
    // two 4-point cores around x~0 and x~3; a bridge point at x=1.9
    // within eps of ONE core point of each cluster, itself with only
    // 2 neighbors + self = 3 < MIN=4 -> border, takes the min label;
    // the clusters stay separate (no core-core edge through a border)
    val pts = Seq(
      (1L, 0.0, 0.0), (2L, 0.3, 0.0), (3L, 0.6, 0.0), (4L, 0.9, 0.0),
      (10L, 2.7, 0.0), (11L, 3.0, 0.0), (12L, 3.3, 0.0), (13L, 3.6, 0.0),
      (20L, 1.8, 0.0))
      .toDF("id", "x", "y")
    val lab = GridDbscan.label(pts, EPS, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val byId = lab.map(t => t._1 -> (t._2, t._3)).toMap
    assert(byId(20L) === (1L, "border"))
    assert(byId(1L) === (1L, "core") && byId(10L) === (10L, "core"))
    assert(byId(13L)._1 === 10L)
  }

  test("nearPairs emits each ordered pair exactly once, symmetric") {
    val pts = Seq((1L, 0.0, 0.0), (2L, 0.5, 0.5), (3L, 5.0, 5.0))
      .toDF("id", "x", "y")
    val got = GridDbscan.nearPairs(pts, EPS).as[(Long, Long)]
      .collect().sorted.toSeq
    assert(got === Seq((1L, 2L), (2L, 1L)))
  }

  test("shuffle-partition invariance") {
    val pts = (1 to 120).map(i =>
      (i.toLong, (i % 11).toDouble * 0.4, (i % 7).toDouble * 0.4))
      .toDF("id", "x", "y")
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    def snap = GridDbscan.label(pts, EPS, MIN)
      .collect().map(_.toString).sorted.toSeq
    val base = snap
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "5")
      assert(snap === base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
