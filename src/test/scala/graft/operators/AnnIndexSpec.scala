package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.VersionedTable

class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val m = 4

  private def mkCorpus(ids: Range): DataFrame =
    ids.map { i =>
      (i.toLong, Array.tabulate(dim)(d =>
        (((i + 1) * 2654435761L + d * 40503L) % 1000003L).toFloat / 1000003f))
    }.toDF("vec_id", "embedding")

  private def rows(df: DataFrame) =
    df.select("query_id", "cell", "rank", "corpus_id", "adist").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cell"),
        r.getAs[Int]("rank"), r.getAs[Long]("corpus_id"),
        r.getAs[Double]("adist")))
      .sortBy(t => (t._1, t._3)).toSeq

  test("stored model round-trips bit-exact and appends O(delta) with a frozen model") {
    val dir = java.nio.file.Files.createTempDirectory("ann_index").toString
    val corpusA = mkCorpus(0 until 200)
    val queries = corpusA.filter(col("vec_id") % 40 === 0)

    AnnIndex.build(corpusA, "vec_id", "embedding", m,
      pqSeedMod = 20, ivfSeedMod = 20, dir)

    // parquet round trip ≡ recomputed in-memory artifacts, bit-exact
    val cb = Similarity.pqCodebooks(corpusA, "vec_id", "embedding", m, 20)
    val seeds = Similarity.seedCentroids(corpusA, "vec_id", "embedding", 20)
    val encA = Similarity.pqEncode(corpusA, "vec_id", "embedding", m, cb)
    val cellsA = Similarity.ivfAssign(corpusA, "vec_id", "embedding", seeds)
      .select(col("vec_id"), col("cell"))
    val direct = rows(Similarity.ivfPqTopK(encA, cellsA, seeds, queries,
      "vec_id", "embedding", m, cb, nprobe = 3, k = 5))
    val stored = rows(AnnIndex.topK(spark, dir, queries,
      "vec_id", "embedding", m, nprobe = 3, k = 5))
    assert(stored === direct)

    // append a batch: encoded with the FROZEN model — codes/cells must
    // equal a full re-encode of the grown corpus under model A
    val batchB = mkCorpus(200 until 250)
    AnnIndex.appendEncode(batchB, "vec_id", "embedding", m, dir)
    val grown = corpusA.union(batchB)
    val loaded = AnnIndex.load(spark, dir)
    val expectedCodes = Similarity.pqEncode(grown, "vec_id", "embedding", m, cb)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("sub"),
        r.getAs[Long]("cw"), r.getAs[Double]("sdist"))).toSet
    val gotCodes = loaded.codes
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("sub"),
        r.getAs[Long]("cw"), r.getAs[Double]("sdist"))).toSet
    assert(gotCodes === expectedCodes)
    val expectedCells = Similarity.ivfAssign(grown, "vec_id", "embedding", seeds)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loaded.cells.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === expectedCells)

    // the appended index answers queries over the grown corpus
    // bit-identically to in-memory artifacts built with the frozen model
    val directGrown = rows(Similarity.ivfPqTopK(
      Similarity.pqEncode(grown, "vec_id", "embedding", m, cb),
      Similarity.ivfAssign(grown, "vec_id", "embedding", seeds)
        .select(col("vec_id"), col("cell")),
      seeds, queries, "vec_id", "embedding", m, cb, nprobe = 3, k = 5))
    assert(rows(AnnIndex.topK(spark, dir, queries,
      "vec_id", "embedding", m, nprobe = 3, k = 5)) === directGrown)
    // and the new batch actually surfaces as candidates
    assert(rows(AnnIndex.topK(spark, dir, queries,
        "vec_id", "embedding", m, nprobe = 10, k = 200))
      .exists(_._4 >= 200L))

    // model tables are one committed generation each
    assert(VersionedTable.versions(spark, s"$dir/codebooks") === Seq(1))
    assert(VersionedTable.versions(spark, s"$dir/centroids") === Seq(1))
  }

  test("occupancy stats: exact counts and the pinned imbalance program") {
    // 3 cells with occupancies 6, 3, 1 → max 6, mean 10/3,
    // imbalance = 6·3/10 = 1.8 exactly
    val cells = ((0 until 6).map(i => (i.toLong, 10L)) ++
      (6 until 9).map(i => (i.toLong, 20L)) :+ (9L, 30L))
      .toDF("vec_id", "cell")
    val st = AnnIndex.occupancyStats(cells).head()
    assert(st.getAs[Long]("n_cells_used") === 3L)
    assert(st.getAs[Long]("n_vecs") === 10L)
    assert(st.getAs[Long]("max_occ") === 6L)
    assert(st.getAs[Double]("mean_occ") === 10.0 / 3)
    assert(st.getAs[Double]("imbalance") === 6.0 * 3 / 10)
  }

  test("drift trigger: skewed batch re-centroids, retrain == from-scratch build") {
    import graft.pipeline.AnnIndexPipeline
    val tmp = java.nio.file.Files.createTempDirectory("ann_drift")
    val watch = java.nio.file.Files
      .createDirectories(tmp.resolve("watch")).toString
    val ix = tmp.resolve("index").toString
    def fold() = AnnIndexPipeline.foldNewVecFiles(spark, ix, watch,
      "vec_id", "embedding", m, pqSeedMod = 20, ivfSeedMod = 20,
      retrainGrowth = 10.0, maxImbalance = 3.0)

    mkCorpus(0 until 200).write.parquet(s"$watch/b1.parquet")
    assert(fold().map(_.action) === Seq("build"))

    // a balanced delta appends without re-centroiding
    mkCorpus(200 until 220).write.parquet(s"$watch/b2.parquet")
    assert(fold().map(_.action) === Seq("append"))
    assert(VersionedTable.versions(spark, s"$ix/codebooks") === Seq(1))

    // a DRIFTED delta (one dominant direction + jitter — the
    // embedding-model-version-change shape) piles into one cell;
    // growth is far from 10× but imbalance passes 3.0 → retrain_drift
    val skewed = (220 until 300).map { i =>
      (i.toLong, Array.tabulate(dim)(d =>
        if (d == 0) 10f else (i % 7) * 0.001f))
    }.toDF("vec_id", "embedding")
    skewed.write.parquet(s"$watch/b3.parquet")
    assert(fold().map(_.action) === Seq("retrain_drift"))
    assert(VersionedTable.versions(spark, s"$ix/codebooks") === Seq(1, 2))

    // the drift-triggered generation is bit-identical to a
    // from-scratch build over the same grown corpus
    val dir2 = java.nio.file.Files
      .createTempDirectory("ann_drift_ref").toString
    val grown = spark.read.parquet(s"$ix/vectors")
    AnnIndex.build(grown, "vec_id", "embedding", m,
      pqSeedMod = 20, ivfSeedMod = 20, dir2)
    def cellSet(d: String) = spark.read.parquet(s"$d/cells").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def codeSet(d: String) = spark.read.parquet(s"$d/codes").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("sub"),
        r.getAs[Long]("cw"), r.getAs[Double]("sdist"))).toSet
    assert(cellSet(ix) === cellSet(dir2))
    assert(codeSet(ix) === codeSet(dir2))
  }

  test("rebuild commits a new model generation; old generation stays readable") {
    val dir = java.nio.file.Files.createTempDirectory("ann_index_gen").toString
    AnnIndex.build(mkCorpus(0 until 100), "vec_id", "embedding", m,
      pqSeedMod = 10, ivfSeedMod = 10, dir)
    AnnIndex.build(mkCorpus(0 until 200), "vec_id", "embedding", m,
      pqSeedMod = 20, ivfSeedMod = 20, dir)
    assert(VersionedTable.versions(spark, s"$dir/codebooks") === Seq(1, 2))
    // time travel: generation 1's codebook is the 100-vector one
    val gen1 = VersionedTable.read(spark, s"$dir/codebooks", Some(1))
    assert(gen1.agg(max(col("cw"))).head().getLong(0) < 100L)
    val gen2 = VersionedTable.read(spark, s"$dir/codebooks", None)
    assert(gen2.agg(max(col("cw"))).head().getLong(0) >= 100L)
    // codes were rewritten for the new generation: every id encoded once
    val loaded = AnnIndex.load(spark, dir)
    assert(loaded.codes.count() === 200L * m)
  }

  test("stored-artifact serving reproduces the oracled q117 answer on testdata") {
    val dir = java.nio.file.Files.createTempDirectory("ann_index_q117").toString
    val sf = "/root/testdata/sf0.001"
    val emb = graft.core.Tables.Tpch(spark, sf).embeddings
    // q117's exact parameters: √n PQ codebook, pinned IVF seeds
    val n = emb.count()
    AnnIndex.build(emb, "vec_id", "embedding", 8,
      pqSeedMod = Similarity.sqrtSeedMod(n), ivfSeedMod = 25, dir)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val served = AnnIndex.topK(spark, dir, queries,
        "vec_id", "embedding", 8, nprobe = 2, k = 5)
      .select(col("query_id"), col("cell"), col("rank"), col("corpus_id"),
        graft.queries.Portable.pround(col("adist"), 6).as("adist"))
      .orderBy(col("query_id"), col("rank"))
    val oracled = graft.SparkEntry.queries("q117_ivf_pq_topk")(spark, sf)
    assert(served.collect().toSeq === oracled.collect().toSeq)
  }
}
