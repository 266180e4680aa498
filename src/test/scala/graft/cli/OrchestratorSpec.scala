package graft.cli

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import graft.SparkSpec
import graft.core.ParquetTable
import Orchestrator._

class OrchestratorSpec extends SparkSpec {

  private def task(name: String, deps: Seq[String] = Nil,
      fn: () => Unit = () => (), retries: Int = 2): TaskDef =
    TaskDef(name, deps, fn, retries)

  test("topoOrder respects dependencies, declaration order, and rejects bad graphs") {
    val order = topoOrder(Seq(
      task("export", Seq("gold")), task("gold", Seq("silver")),
      task("validate", Seq("gold")), task("silver", Seq("bronze")),
      task("bronze"))).map(_.name)
    assert(order === Seq("bronze", "silver", "gold", "export", "validate"))
    intercept[IllegalArgumentException] {
      topoOrder(Seq(task("a", Seq("b")), task("b", Seq("a"))))
    }
    intercept[IllegalArgumentException] {
      topoOrder(Seq(task("a", Seq("ghost"))))
    }
    intercept[IllegalArgumentException] {
      topoOrder(Seq(task("a"), task("a")))
    }
  }

  test("flaky task retries with delay, then succeeds") {
    var calls = 0
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val runs = runDag(Seq(
      TaskDef("flaky", Nil, () => {
        calls += 1
        if (calls < 3) sys.error(s"transient #$calls")
      }, retries = 2, retryDelayMs = 50L)), sleep = slept += _)
    assert(runs === Seq(TaskRun("flaky", Succeeded, 3, None)))
    assert(slept.toSeq === Seq(50L, 50L), "delay before each retry, not the first try")
  }

  test("permanent failure skips transitive downstream, independent branch runs") {
    var ran = List.empty[String]
    val runs = runDag(Seq(
      task("a", fn = () => ran ::= "a"),
      task("bad", fn = () => sys.error("boom"), retries = 1),
      task("b", Seq("bad"), () => ran ::= "b"),
      task("c", Seq("b"), () => ran ::= "c"),
      task("d", Seq("a"), () => ran ::= "d")))
    val byName = runs.map(r => r.name -> r).toMap
    assert(byName("a").status === Succeeded)
    assert(byName("bad").status === Failed)
    assert(byName("bad").attempts === 2) // 1 try + 1 retry
    assert(byName("bad").error.exists(_.contains("boom")))
    assert(byName("b").status === UpstreamFailed)
    assert(byName("c").status === UpstreamFailed) // transitive
    assert(byName("d").status === Succeeded)
    assert(ran.reverse === List("a", "d"))
    assert(byName("b").attempts === 0, "skipped tasks never run")
  }

  test("monthly DAG drives the real pipeline end-to-end") {
    val wh = Files.createTempDirectory("graft-dag").toString
    val runs = runDag(monthlyDag(spark, fixture("flights.csv"),
      fixture("L_AIRPORT_ID.csv"), fixture("L_UNIQUE_CARRIERS.csv"),
      wh, incremental = false))
    val byName = runs.map(r => r.name -> r.status).toMap
    // the 13-row fixture intentionally trips two silver `mostly`
    // thresholds (see IncrementalPipelineSpec), so the validate task
    // fails — and ONLY it; the build+export chain must succeed
    assert(byName === Map("bronze" -> Succeeded, "silver" -> Succeeded,
      "gold" -> Succeeded, "export" -> Succeeded, "validate" -> Failed))
  }

  test("streaming DAG: stream ingest -> incremental fold -> validate") {
    val tmp = Files.createTempDirectory("graft-stream-dag")
    val wh = tmp.resolve("wh").toString
    val airports = fixture("L_AIRPORT_ID.csv")
    val carriers = fixture("L_UNIQUE_CARRIERS.csv")

    // seed the warehouse with January via the batch pipeline
    RunPipeline.runBronze(spark, fixture("flights.csv"), airports, carriers, wh)
    RunPipeline.runSilver(spark, wh)
    RunPipeline.runGold(spark, wh)
    val janRows = ParquetTable.read(spark, s"$wh/silver/flights").count()

    // a February batch lands in the watch directory
    val watch = Files.createDirectories(tmp.resolve("landing"))
    val jan = Files.readAllLines(Paths.get(fixture("flights.csv"))).asScala.toSeq
    Files.write(watch.resolve("feb.csv"),
      (jan.head +: jan.tail.map(_.replaceFirst("^1/", "2/"))).asJava)

    def statuses() = runDag(streamingDag(
      spark, watch.toString, airports, carriers, wh))
      .map(r => r.name -> r.status).toMap

    // validate fails on the fixture's known `mostly` threshold trips
    // (same as the monthly DAG above) — the ingest+fold chain succeeds
    assert(statuses() === Map("stream_ingest" -> Succeeded,
      "incremental_fold" -> Succeeded, "validate" -> Failed))
    // the checkpointed stream landed the raw rows exactly once...
    assert(ParquetTable.read(spark, s"$wh/bronze/stream_flights").count() === 12)
    // ...and the fold advanced silver by the same batch
    val afterFold = ParquetTable.read(spark, s"$wh/silver/flights").count()
    assert(afterFold === janRows + 12)

    // re-running the whole DAG with no new files is a no-op end to end:
    // the stream checkpoint skips seen files, the marker log skips the
    // fold, and nothing grows
    assert(statuses() === Map("stream_ingest" -> Succeeded,
      "incremental_fold" -> Succeeded, "validate" -> Failed))
    assert(ParquetTable.read(spark, s"$wh/bronze/stream_flights").count() === 12)
    assert(ParquetTable.read(spark, s"$wh/silver/flights").count() === afterFold)

    // a late third batch is picked up by the same standing DAG
    Files.write(watch.resolve("mar.csv"),
      (jan.head +: jan.tail.map(_.replaceFirst("^1/", "3/"))).asJava)
    assert(statuses()("incremental_fold") === Succeeded)
    assert(ParquetTable.read(spark, s"$wh/bronze/stream_flights").count() === 24)
    assert(ParquetTable.read(spark, s"$wh/silver/flights").count()
      === afterFold + 12)
  }

  test("dedup DAG: two-batch fold keeps the stored index == full recompute") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Dedup
    import graft.operators.Dedup.MinHashParams
    import spark.implicits._
    val tmp = Files.createTempDirectory("dedup_dag")
    val watch = Files.createDirectories(tmp.resolve("landing")).toString
    val ix = tmp.resolve("index").toString
    val mh = MinHashParams()
    val texts = Map(
      1L -> "the quick brown fox jumps over the lazy dog tonight",
      3L -> "completely different words about spark query engines here",
      5L -> "yet another entirely unrelated document about flink runtimes")

    def statuses() = runDag(dedupDag(spark, watch, ix, 3, 0.5, mh))
      .map(r => r.name -> r.status).toMap

    // batch 1: docs 1, 2 (exact dup of 1 — in-batch drop), 3
    Seq((1L, texts(1L)), (2L, texts(1L)), (3L, texts(3L)))
      .toDF("doc_id", "text").write.parquet(s"$watch/batch1.parquet")
    assert(statuses() === Map("dedup_fold" -> Succeeded,
      "dedup_validate" -> Succeeded))
    // batch 2: doc 4 (exact dup of 1 — CROSS-corpus drop via the
    // stored index, batch 1's text never re-read), doc 5 (new)
    Seq((4L, texts(1L)), (5L, texts(5L)))
      .toDF("doc_id", "text").write.parquet(s"$watch/batch2.parquet")
    assert(statuses() === Map("dedup_fold" -> Succeeded,
      "dedup_validate" -> Succeeded))

    // kept corpus is exactly {1, 3, 5}…
    val corpus = spark.read.parquet(s"$ix/corpus")
    assert(corpus.select("doc_id").collect().map(_.getLong(0)).toSet
      === Set(1L, 3L, 5L))
    // …and the incrementally appended index is BIT-IDENTICAL to a
    // from-scratch recompute over that corpus (the DedupSpec append
    // property, driven through the CLI path)
    val keptDf = texts.toSeq.map { case (id, t) => (id, t) }
      .toDF("doc_id", "text")
    def bandSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band_idx"),
        r.getAs[Long]("band_hash"))).toSet
    assert(bandSet(spark.read.parquet(s"$ix/bands"))
      === bandSet(Dedup.minhashBands(keptDf, "doc_id", "text", 3, mh)))
    def setSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Seq[Long]]("shingle_set").toSet)).toSet
    assert(setSet(spark.read.parquet(s"$ix/sets"))
      === setSet(Dedup.shingleSets(keptDf, "doc_id", "text", 3)))

    // verdicts carry the drop provenance (scope + best match)
    val v = spark.read.parquet(s"$ix/verdicts")
      .select("doc_id", "keep", "dup_scope", "dup_of").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getAs[String]("dup_scope"),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(v(2L) === ((0, "batch", 1L)))
    assert(v(4L) === ((0, "corpus", 1L)))
    assert(v(1L)._1 === 1 && v(3L)._1 === 1 && v(5L)._1 === 1)

    // re-run with no new files: marker log makes the fold a no-op
    val bandsBefore = spark.read.parquet(s"$ix/bands").count()
    assert(statuses()("dedup_fold") === Succeeded)
    assert(spark.read.parquet(s"$ix/bands").count() === bandsBefore)
  }

  test("image dedup lane: mixed corpus two-batch fold, stored fingerprints == full recompute") {
    import org.apache.spark.sql.functions.col
    import graft.operators.{Dedup, Multimodal}
    import graft.operators.Dedup.MinHashParams
    import spark.implicits._
    val tmp = Files.createTempDirectory("image_dedup_dag")
    val docWatch = Files.createDirectories(tmp.resolve("docs")).toString
    val imgWatch = Files.createDirectories(tmp.resolve("media")).toString
    val ix = tmp.resolve("index").toString
    // three distinct 16x16 images; A reappears as in-batch dup (2) and
    // as a cross-batch dup (4)
    def png(pat: (Int, Int) => Int): Array[Byte] = {
      val pix = Array.tabulate(16 * 16 * 3) { i =>
        val p = i / 3; (pat(p % 16, p / 16) & 0xff).toByte
      }
      Multimodal.pngEncode(Multimodal.PngImage(16, 16, 3, pix), _ => 0,
        new java.util.zip.Deflater())
    }
    // high-frequency distinct textures — smooth gradients pHash too
    // close together (hamming <= 3) to serve as distinct fixtures
    val imgA = png((x, y) => x * 53 + y * 91 + (x ^ y) * 17)
    val imgB = png((x, y) => x * 29 + y * 13 + x * y * 7 + 128)
    val imgC = png((x, y) => (x * x * 11 + y * 41 + (x | y) * 23) ^ 0x5A)
    // precondition: the three fixtures are pairwise far apart
    locally {
      val fps = Seq((101L, imgA), (102L, imgB), (103L, imgC))
        .toDF("media_id", "content")
      val hs = Multimodal.phashFeatures(fps).collect()
        .map(r => r.getAs[Long]("phash"))
      for (i <- 0 until 3; j <- (i + 1) until 3)
        assert(java.lang.Long.bitCount(hs(i) ^ hs(j)) > 3,
          s"fixtures $i/$j too close for maxHamming=3")
    }

    def imgStatuses() = runDag(imageDedupDag(spark, imgWatch, ix,
      maxHamming = 3)).map(r => r.name -> r.status).toMap

    Seq((1L, imgA), (2L, imgA), (3L, imgB))
      .toDF("media_id", "content").write.parquet(s"$imgWatch/b1.parquet")
    assert(imgStatuses() === Map("image_dedup_fold" -> Succeeded,
      "image_dedup_validate" -> Succeeded))
    Seq((4L, imgA), (5L, imgC))
      .toDF("media_id", "content").write.parquet(s"$imgWatch/b2.parquet")
    assert(imgStatuses() === Map("image_dedup_fold" -> Succeeded,
      "image_dedup_validate" -> Succeeded))

    // kept media is exactly {1, 3, 5}…
    val media = spark.read.parquet(s"$ix/media")
    assert(media.select("media_id").collect().map(_.getLong(0)).toSet
      === Set(1L, 3L, 5L))
    // …and the incrementally appended fingerprints are BIT-IDENTICAL
    // to a from-scratch pHash recompute over that kept media
    def fpSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("phash"))).toSet
    assert(fpSet(spark.read.parquet(s"$ix/fps"))
      === fpSet(Multimodal.phashFeatures(media)
        .select(col("media_id"), col("phash"))))

    // verdicts carry scope + best match (hamming 0: identical images)
    val v = spark.read.parquet(s"$ix/image_verdicts")
      .select("media_id", "keep", "dup_scope", "dup_of", "hamming")
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getAs[String]("dup_scope"),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1 else r.getInt(4))).toMap
    assert(v(2L) === ((0, "batch", 1L, 0)))
    assert(v(4L) === ((0, "corpus", 1L, 0)))
    assert(v(1L)._1 === 1 && v(3L)._1 === 1 && v(5L)._1 === 1)

    // the TEXT lane folds into the SAME index dir, independently
    Seq((11L, "spark engines and catalyst optimizer details tonight"),
      (12L, "spark engines and catalyst optimizer details tonight"),
      (13L, "completely unrelated flink streaming words here"))
      .toDF("doc_id", "text").write.parquet(s"$docWatch/t1.parquet")
    val mh = MinHashParams()
    assert(runDag(dedupDag(spark, docWatch, ix, 3, 0.5, mh))
      .map(r => r.name -> r.status).toMap
      === Map("dedup_fold" -> Succeeded, "dedup_validate" -> Succeeded))
    assert(spark.read.parquet(s"$ix/corpus").select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(11L, 13L))
    // image lane untouched by the text fold, and its re-run is a no-op
    assert(fpSet(spark.read.parquet(s"$ix/fps")).size === 3)
    val before = spark.read.parquet(s"$ix/media").count()
    assert(imgStatuses()("image_dedup_fold") === Succeeded)
    assert(spark.read.parquet(s"$ix/media").count() === before)
  }

  test("audio dedup lane: two-batch fold, stored fingerprints == full recompute") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Multimodal
    import spark.implicits._
    val COEFFS = Seq(1.9, 1.5, 1.0, 0.5, 0.0, -0.5, -1.0, -1.5, -1.9)
    val (frame, hop) = (16, 6)
    val tmp = Files.createTempDirectory("audio_dedup_dag")
    val watch = Files.createDirectories(tmp.resolve("media")).toString
    val ix = tmp.resolve("index").toString
    def wav(samples: Array[Int]): Array[Byte] = {
      val n = samples.length
      val out = new Array[Byte](44 + 2 * n)
      def put(o: Int, s: String): Unit =
        s.getBytes("US-ASCII").copyToArray(out, o)
      def le32(o: Int, x: Int): Unit = {
        out(o) = x.toByte; out(o + 1) = (x >> 8).toByte
        out(o + 2) = (x >> 16).toByte; out(o + 3) = (x >> 24).toByte
      }
      def le16(o: Int, x: Int): Unit = {
        out(o) = x.toByte; out(o + 1) = (x >> 8).toByte
      }
      put(0, "RIFF"); le32(4, 36 + 2 * n); put(8, "WAVE"); put(12, "fmt ")
      le32(16, 16); le16(20, 1); le16(22, 1); le32(24, 8000)
      le32(28, 16000); le16(32, 2); le16(34, 16)
      put(36, "data"); le32(40, 2 * n)
      samples.indices.foreach(i => le16(44 + 2 * i, samples(i) & 0xFFFF))
      out
    }
    def hkWav(k: Long): Array[Byte] =
      wav(Array.tabulate(64)(t =>
        ((k * 53 + (17 + 3 * (k % 29)) * t) % 2003 - 1001).toInt))
    // three clips from distinct classes; A reappears as an in-batch
    // dup (2) and a cross-batch dup (4)
    val clipA = hkWav(0L)
    val clipB = hkWav(5L)
    val clipC = hkWav(11L)
    // precondition: fixtures pairwise far apart
    locally {
      val hs = Multimodal.audioFingerprints(
          Seq((101L, clipA), (102L, clipB), (103L, clipC))
            .toDF("media_id", "content"), COEFFS, frame, hop)
        .collect().map(_.getAs[Long]("afp"))
      for (i <- 0 until 3; j <- (i + 1) until 3)
        assert(java.lang.Long.bitCount(hs(i) ^ hs(j)) > 3,
          s"fixtures $i/$j too close for maxHamming=3")
    }
    def statuses() = runDag(audioDedupDag(spark, watch, ix, COEFFS,
      frame, hop, maxHamming = 3)).map(r => r.name -> r.status).toMap

    Seq((1L, clipA), (2L, clipA), (3L, clipB))
      .toDF("media_id", "content").write.parquet(s"$watch/b1.parquet")
    assert(statuses() === Map("audio_dedup_fold" -> Succeeded,
      "audio_dedup_validate" -> Succeeded))
    Seq((4L, clipA), (5L, clipC))
      .toDF("media_id", "content").write.parquet(s"$watch/b2.parquet")
    assert(statuses() === Map("audio_dedup_fold" -> Succeeded,
      "audio_dedup_validate" -> Succeeded))

    val media = spark.read.parquet(s"$ix/audio_media")
    assert(media.select("media_id").collect().map(_.getLong(0)).toSet
      === Set(1L, 3L, 5L))
    // appended fingerprints bit-identical to a from-scratch recompute
    def fpSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("afp"))).toSet
    assert(fpSet(spark.read.parquet(s"$ix/audio_fps"))
      === fpSet(Multimodal.audioFingerprints(media, COEFFS, frame, hop)
        .select(col("media_id"), col("afp"))))
    // verdicts carry scope + best match
    val v = spark.read.parquet(s"$ix/audio_verdicts")
      .select("media_id", "keep", "dup_scope", "dup_of", "hamming")
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getAs[String]("dup_scope"),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1 else r.getInt(4))).toMap
    assert(v(2L) === ((0, "batch", 1L, 0)))
    assert(v(4L) === ((0, "corpus", 1L, 0)))
    assert(v(1L)._1 === 1 && v(3L)._1 === 1 && v(5L)._1 === 1)
    // re-run is a no-op (marker log)
    assert(statuses()("audio_dedup_fold") === Succeeded)
    assert(spark.read.parquet(s"$ix/audio_media").count() === 3L)
  }

  test("ANN DAG: bootstrap build, frozen append, growth retrain == recompute") {
    import org.apache.spark.sql.functions.col
    import graft.core.VersionedTable
    import graft.operators.{AnnIndex, Similarity}
    import spark.implicits._
    val dim = 16
    val m = 4
    val tmp = Files.createTempDirectory("ann_dag")
    val watch = Files.createDirectories(tmp.resolve("landing")).toString
    val ix = tmp.resolve("index").toString
    def mkVecs(ids: Range) = ids.map { i =>
      (i.toLong, Array.tabulate(dim)(d =>
        (((i + 1) * 2654435761L + d * 40503L) % 1000003L).toFloat / 1000003f))
    }.toDF("vec_id", "embedding")
    def statuses() = runDag(annDag(spark, watch, ix, "vec_id", "embedding",
      m, retrainGrowth = 1.5)).map(r => r.name -> r.status).toMap
    def codeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("sub"),
        r.getAs[Long]("cw"))).toSet

    // batch 1 (100 vecs): no model yet -> bootstrap generation 1
    mkVecs(0 until 100).write.parquet(s"$watch/b1.parquet")
    assert(statuses() === Map("ann_fold" -> Succeeded,
      "ann_validate" -> Succeeded))
    assert(VersionedTable.versions(spark, s"$ix/codebooks") === Seq(1))

    // batch 2 (20 vecs, 120 < 1.5x100): frozen-model O(delta) append —
    // appended codes == full re-encode of the grown corpus under gen 1
    mkVecs(100 until 120).write.parquet(s"$watch/b2.parquet")
    assert(statuses() === Map("ann_fold" -> Succeeded,
      "ann_validate" -> Succeeded))
    assert(VersionedTable.versions(spark, s"$ix/codebooks") === Seq(1))
    val cb1 = VersionedTable.read(spark, s"$ix/codebooks")
    assert(codeSet(spark.read.parquet(s"$ix/codes")) ===
      codeSet(Similarity.pqEncode(mkVecs(0 until 120), "vec_id",
        "embedding", m, cb1)))

    // batch 3 (60 vecs, 180 >= 1.5x100): growth retrain -> generation 2,
    // codes rewritten over the FULL corpus under the new model
    mkVecs(120 until 180).write.parquet(s"$watch/b3.parquet")
    assert(statuses() === Map("ann_fold" -> Succeeded,
      "ann_validate" -> Succeeded))
    assert(VersionedTable.versions(spark, s"$ix/codebooks") === Seq(1, 2))
    val cb2 = VersionedTable.read(spark, s"$ix/codebooks")
    val all = mkVecs(0 until 180)
    assert(codeSet(spark.read.parquet(s"$ix/codes")) ===
      codeSet(Similarity.pqEncode(all, "vec_id", "embedding", m, cb2)))

    // serving from the folded store == in-memory artifacts over the
    // full corpus under the current generation, bit-exact
    val queries = all.filter(col("vec_id") % 40 === 0)
    val seeds = VersionedTable.read(spark, s"$ix/centroids")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "corpus_id", "adist").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("corpus_id"), r.getAs[Double]("adist")))
      .sortBy(t => (t._1, t._2)).toSeq
    val direct = rows(Similarity.ivfPqTopK(
      Similarity.pqEncode(all, "vec_id", "embedding", m, cb2),
      Similarity.ivfAssign(all, "vec_id", "embedding", seeds)
        .select(col("vec_id"), col("cell")),
      seeds, queries, "vec_id", "embedding", m, cb2, nprobe = 3, k = 5))
    assert(rows(AnnIndex.topK(spark, ix, queries, "vec_id", "embedding",
      m, nprobe = 3, k = 5)) === direct)

    // re-run with no new files: marker log makes the fold a no-op
    val codesBefore = spark.read.parquet(s"$ix/codes").count()
    assert(statuses()("ann_fold") === Succeeded)
    assert(spark.read.parquet(s"$ix/codes").count() === codesBefore)
    assert(VersionedTable.versions(spark, s"$ix/codebooks") === Seq(1, 2))
  }
  test("curation DAG: funnel fold, cross-corpus exact dedup, idempotent") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val tmp = Files.createTempDirectory("curation_dag")
    val watch = Files.createDirectories(tmp.resolve("landing")).toString
    val cur = tmp.resolve("curated").toString
    // a text that PASSES all four gopher rules: 60 words, sane mean
    // length, stopwords present, low dup fraction
    val good = (1 to 60).map(i => s"the quick word$i of text and").mkString(" ")
      .split(" ").distinct.mkString(" ") + " " +
      (1 to 45).map(i => s"filler$i").mkString(" ")

    def statuses() = runDag(curationDag(spark, watch, cur, Seq("en")))
      .map(r => r.name -> r.status).toMap

    // batch 1: 1 survives; 2 is a URL-dup of 1 (same canonical);
    // 3 fails the lang gate; 4 fails gopher (tiny text)
    Seq(
      (1L, "HTTP://Example.COM:80/a?b=2&a=1#f", "en", "s0", good),
      (2L, "http://example.com/a?a=1&b=2", "en", "s0", good + " tail1"),
      (3L, "http://example.com/b", "fr", "s0", good + " tail2"),
      (4L, "http://example.com/c", "en", "s0", "too short"))
      .toDF("doc_id", "url", "lang", "source", "text")
      .write.parquet(s"$watch/batch1.parquet")
    assert(statuses() === Map("curation_fold" -> Succeeded,
      "curation_validate" -> Succeeded))
    assert(spark.read.parquet(s"$cur/curated").select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(1L))

    // batch 2: 5 is an exact text dup of curated 1 -> CROSS-corpus
    // drop via stored hashes; 6 is new and survives
    Seq(
      (5L, "http://example.com/d", "en", "s0", good),
      (6L, "http://example.com/e", "en", "s0", good + " novel ending"))
      .toDF("doc_id", "url", "lang", "source", "text")
      .write.parquet(s"$watch/batch2.parquet")
    assert(statuses() === Map("curation_fold" -> Succeeded,
      "curation_validate" -> Succeeded))
    assert(spark.read.parquet(s"$cur/curated").select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(1L, 6L))

    // funnel metrics: batch-2 row shows the cross-corpus drop
    val m2 = spark.read.parquet(s"$cur/metrics")
      .filter(col("src_file") === "batch2.parquet").head()
    assert(m2.getAs[Long]("after_gopher") === 2L)
    assert(m2.getAs[Long]("after_exact") === 1L)

    // marker-log idempotence: re-run with no new files is a no-op
    val before = spark.read.parquet(s"$cur/curated").count()
    assert(statuses()("curation_fold") === Succeeded)
    assert(spark.read.parquet(s"$cur/curated").count() === before)
  }
  test("dataset DAG: curate -> near-dup fold -> pack, end to end") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Dedup.MinHashParams
    import spark.implicits._
    val tmp = Files.createTempDirectory("dataset_dag")
    val watch = Files.createDirectories(tmp.resolve("landing")).toString
    val cur = tmp.resolve("cur").toString
    val ix = tmp.resolve("ix").toString
    val out = tmp.resolve("out").toString
    val mh = MinHashParams()
    val textA = "the quick brown fox of the valley jumps over a lazy " +
      "dog and then wanders through seventeen quiet meadows towards " +
      "distant mountain villages carrying small parcels for friendly " +
      "residents who wave back cheerfully every single morning"
    val textB = "a completely different long document about the spark " +
      "catalyst optimizer and its rules which rewrite logical plans " +
      "into efficient physical operators while keeping the whole " +
      "pipeline declarative and friendly for the analytics user today"
    val textC = "yet another unrelated corpus entry describing the " +
      "streaming watermark semantics of stateful operators and the " +
      "eviction rules that keep state bounded by keys per horizon in " +
      "a production ingest deployment running around the clock"

    def statuses() = runDag(datasetDag(spark, watch, cur, ix, out,
        Seq("en"), 3, 0.5, mh)).map(r => r.name -> r.status).toMap
    def doc(id: Long, t: String) =
      (id, s"http://example.com/p$id", "en", "s0", t)

    Seq(doc(1L, textA), doc(3L, textB))
      .toDF("doc_id", "url", "lang", "source", "text")
      .write.parquet(s"$watch/b1.parquet")
    assert(statuses().values.forall(_ == Succeeded))
    assert(spark.read.parquet(s"$ix/corpus").select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(1L, 3L))

    // batch 2: 5 = exact dup of A (curation drops via stored hash);
    // 7 = near-dup paraphrase of A (passes curation, near-dup fold
    // drops it against the STORED signature index); 9 = new
    Seq(doc(5L, textA), doc(7L, textA.replace("morning", "evening")),
        doc(9L, textC))
      .toDF("doc_id", "url", "lang", "source", "text")
      .write.parquet(s"$watch/b2.parquet")
    assert(statuses().values.forall(_ == Succeeded))
    assert(spark.read.parquet(s"$cur/curated").select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(1L, 3L, 7L, 9L))
    assert(spark.read.parquet(s"$ix/corpus").select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(1L, 3L, 9L))

    // the packed work order covers exactly the deduped corpus, and
    // offsets are the gapless prefix sums validatePacked pins
    val packed = spark.read.parquet(s"$out/packed")
    assert(packed.select("doc_id").collect().map(_.getLong(0)).toSet
      === Set(1L, 3L, 9L))
    assert(graft.pipeline.DatasetPipeline.validatePacked(spark,
      s"$ix/corpus", out, 64))

    // training-ready id sequences: bounded invariants, then the
    // ≡-recompute assertion — the concatenation over seq_id order must
    // equal the per-doc id arrays in shuffled (shard, pos) order, and
    // decode back to the scrubbed corpus
    import graft.operators.{BpeTrainer, TrainingPrep}
    val merges = BpeTrainer.demoMerges
    assert(graft.pipeline.DatasetPipeline.validateSequences(spark,
      s"$ix/corpus", out, 64, merges))
    val seqRows = spark.read.parquet(s"$out/sequences")
      .orderBy("seq_id").collect()
    val allIds = seqRows.flatMap(r =>
      r.getSeq[Long](r.fieldIndex("ids"))).toSeq
    val corpusDf = spark.read.parquet(s"$ix/corpus")
    val vocab = BpeTrainer.vocabTable(corpusDf, "text", merges)
    val enc = BpeTrainer.bpeEncodeIds(corpusDf, "doc_id", "text",
      merges, vocab)
    val expectIds = TrainingPrep.shuffleOrder(enc, "doc_id", 42L, 4)
      .orderBy("shard", "pos").collect()
      .flatMap(r => r.getSeq[Long](r.fieldIndex("ids"))).toSeq
    assert(allIds === expectIds)
    val detok = BpeTrainer.bpeDecodeIds(enc, "doc_id", vocab)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val scrubbed = corpusDf.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).replaceAll("\\s+", ""))
      .toMap
    assert(detok === scrubbed)

    // idempotent re-run: folds are no-ops, pack + sequence rewrites
    // are identical
    val before = packed.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val beforeSeqs = seqRows.map(_.toSeq).toSeq
    assert(statuses().values.forall(_ == Succeeded))
    assert(spark.read.parquet(s"$out/packed").orderBy("doc_id")
      .collect().map(_.toSeq).toSeq === before)
    assert(spark.read.parquet(s"$out/sequences").orderBy("seq_id")
      .collect().map(_.toSeq).toSeq === beforeSeqs)
  }
}
