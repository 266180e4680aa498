package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

class StreamClusteredWriteSpec extends SparkSpec {
  import spark.implicits._

  private val BITS = 8
  private val N = 1 << BITS

  test("streamed batches land as Hilbert-clustered files whose boxes prune") {
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("scw_out").toString
    val ckpt = Files.createTempDirectory("scw_ckpt").toString
    val input = MemoryStream[(Long, Long)]
    // uniform grid points, two micro-batches, interleaved order
    var lcg = 0xABCDEFL
    def next(bound: Int): Long = {
      lcg = lcg * 6364136223846793005L + 1442695040888963407L
      ((lcg >>> 33) % bound + bound) % bound
    }
    val pts = (0 until 4000).map(_ => (next(1000), next(1000)))
    // AvailableNow snapshots offsets at start: enqueue both batches
    // first, then run the bounded drain (the ingestOnce shape)
    input.addData(pts.take(2000): _*)
    input.addData(pts.drop(2000).reverse: _*)
    val q = StreamClusteredWrite.start(
      input.toDS().toDF("x", "y"), "x", "y", xMax = 999, yMax = 999,
      bits = BITS, filesPerBatch = 16, outDir = out, checkpoint = ckpt)
    try q.awaitTermination() finally q.stop()
    // read back with file provenance: every row survived, and each
    // FILE's (x, y) box is tight enough that a quarter-domain box
    // predicate prunes most files
    val back = spark.read.parquet(out)
      .select(col("x"), col("y"),
        input_file_name().as("f"))
      .localCheckpoint(true)
    assert(back.count() === 4000)
    assert(back.select(struct(col("x"), col("y"))).distinct().count() ===
      pts.map { case (a, b) => (a, b) }.distinct.size.toLong)
    val boxes = back.groupBy(col("f"))
      .agg(min(col("x")).as("mnx"), max(col("x")).as("mxx"),
        min(col("y")).as("mny"), max(col("y")).as("mxy"),
        count(lit(1)).as("n"))
      .collect()
    assert(boxes.length >= 16, s"expected >= 16 files, got ${boxes.length}")
    // predicate: x in [250, 500), y in [250, 500) — 1/16 of the domain
    // (columns: f=0, mnx=1, mxx=2, mny=3, mxy=4, n=5)
    def prunable(b: org.apache.spark.sql.Row) =
      b.getLong(2) < 250 || b.getLong(1) >= 500 ||
        b.getLong(4) < 250 || b.getLong(3) >= 500
    val pruned = boxes.count(prunable)
    val scanned = boxes.filterNot(prunable).map(_.getLong(5)).sum
    // Hilbert clustering must prune over half the files and scan well
    // under half the rows for a 1/16-domain box; an unclustered append
    // prunes ~nothing (every file spans the whole domain)
    assert(pruned * 2 > boxes.length,
      s"only $pruned of ${boxes.length} files pruned")
    assert(scanned * 2 < 4000, s"scanned $scanned of 4000 rows")
  }

  test("cluster key normalization matches the q233 grid rule") {
    val df = Seq((0L, 0L), (999L, 999L), (500L, 250L)).toDF("x", "y")
    val got = StreamClusteredWrite
      .withClusterKey(df, "x", "y", 999, 999, BITS)
      .select(col("x"), col("y"), col("__hkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    def ref(x: Long, y: Long) = graft.expressions.HilbertIndex.xy2d(
      x * N / 1000, y * N / 1000, BITS)
    assert(got((0L, 0L)) === ref(0, 0))
    assert(got((999L, 999L)) === ref(999, 999))
    assert(got((500L, 250L)) === ref(500, 250))
  }
}
