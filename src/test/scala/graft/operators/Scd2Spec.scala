package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.VersionedTable

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  test("compressHistory: runs break on value change, not on gaps") {
    val snaps = Seq[(String, Long, Option[String])](
      ("u1", 1L, Some("A")), ("u1", 2L, Some("A")), ("u1", 4L, Some("A")),
      ("u1", 5L, Some("B")), ("u1", 6L, None), ("u1", 7L, None),
      ("u1", 8L, Some("B")),
      ("u2", 3L, Some("A"))
    ).toDF("k", "d", "v")
    val out = Scd2.compressHistory(snaps, "k", "d", Seq("v"))
      .orderBy("k", "effective_from")
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("run_id"),
        r.getAs[Long]("effective_from"), r.getAs[Long]("effective_to"),
        Option(r.getAs[String]("v")), r.getAs[Long]("n_snapshots"))).toSeq
    assert(out === Seq(
      ("u1", 1L, 1L, 4L, Some("A"), 3L),  // the day-3 gap does NOT break the run
      ("u1", 2L, 5L, 5L, Some("B"), 1L),
      ("u1", 3L, 6L, 7L, None, 2L),       // null is a value; null==null extends
      ("u1", 4L, 8L, 8L, Some("B"), 1L),  // B after null is a change
      ("u2", 1L, 3L, 3L, Some("A"), 1L)))
  }

  test("compressHistory breaks when ANY of several value columns changes") {
    val snaps = Seq(
      ("k", 1L, "x", 10), ("k", 2L, "x", 10),
      ("k", 3L, "x", 20), ("k", 4L, "y", 20)
    ).toDF("k", "d", "a", "b")
    val runs = Scd2.compressHistory(snaps, "k", "d", Seq("a", "b"))
      .orderBy("effective_from")
      .collect().map(r => (r.getAs[Long]("effective_from"),
        r.getAs[String]("a"), r.getAs[Int]("b")))
    assert(runs.toSeq === Seq((1L, "x", 10), (3L, "x", 20), (4L, "y", 20)))
  }

  private def dimRows(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "color", "effective_from", "effective_to", "is_current")
      .collect().map(r => (r.getAs[String]("k"), r.getAs[String]("color"),
        r.getAs[Long]("effective_from"),
        Option(r.getAs[java.lang.Long]("effective_to")).map(_.toLong),
        r.getAs[Boolean]("is_current"))).toSet

  test("applyBatch: insert / change / no-op CDC folds") {
    val b1 = Seq(("k1", "red"), ("k2", "blue")).toDF("k", "color")
    val b2 = Seq(("k1", "red"), ("k2", "green"), ("k3", "white"))
      .toDF("k", "color")
    val empty = Scd2.emptyDim(spark, b1, Seq("k"), Seq("color"))
    val v1 = Scd2.applyBatch(empty, b1, Seq("k"), Seq("color"), asOf = 100L)
    assert(dimRows(v1) === Set(
      ("k1", "red", 100L, None, true), ("k2", "blue", 100L, None, true)))
    val v2 = Scd2.applyBatch(v1, b2, Seq("k"), Seq("color"), asOf = 200L)
    assert(dimRows(v2) === Set(
      ("k1", "red", 100L, None, true),         // unchanged: untouched
      ("k2", "blue", 100L, Some(200L), false), // closed at the batch stamp
      ("k2", "green", 200L, None, true),       // new open version
      ("k3", "white", 200L, None, true)))      // brand-new key
    // re-delivering the same batch is a no-op (idempotent CDC fold)
    val v3 = Scd2.applyBatch(v2, b2, Seq("k"), Seq("color"), asOf = 300L)
    assert(dimRows(v3) === dimRows(v2))
  }

  test("applyBatch composes with VersionedTable: snapshots time-travel") {
    val dir = java.nio.file.Files.createTempDirectory("scd2dim").toString
    val b1 = Seq(("k1", "red")).toDF("k", "color")
    val b2 = Seq(("k1", "navy")).toDF("k", "color")
    val empty = Scd2.emptyDim(spark, b1, Seq("k"), Seq("color"))
    VersionedTable.commit(
      Scd2.applyBatch(empty, b1, Seq("k"), Seq("color"), 10L), dir)
    VersionedTable.commit(
      Scd2.applyBatch(VersionedTable.read(spark, dir), b2,
        Seq("k"), Seq("color"), 20L), dir)
    val latest = dimRows(VersionedTable.read(spark, dir))
    assert(latest === Set(
      ("k1", "red", 10L, Some(20L), false), ("k1", "navy", 20L, None, true)))
    // time travel to v1: the pre-change world
    assert(dimRows(VersionedTable.read(spark, dir, Some(1))) ===
      Set(("k1", "red", 10L, None, true)))
  }
}
