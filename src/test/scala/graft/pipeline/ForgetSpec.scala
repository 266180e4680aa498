package graft.pipeline

import java.nio.file.{Files, Path => JPath, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions.col
import graft.SparkSpec
import graft.cli.Orchestrator._
import graft.operators.Dedup.MinHashParams

class ForgetSpec extends SparkSpec {
  import spark.implicits._

  private val textA = "the quick brown fox of the valley jumps over a " +
    "lazy dog and then wanders through seventeen quiet meadows towards " +
    "distant mountain villages carrying small parcels for friendly " +
    "residents who wave back cheerfully every single morning"
  private val textB = "a completely different long document about the " +
    "spark catalyst optimizer and its rules which rewrite logical plans " +
    "into efficient physical operators while keeping the whole " +
    "pipeline declarative and friendly for the analytics user today"
  private val textC = "yet another unrelated corpus entry describing " +
    "the streaming watermark semantics of stateful operators and the " +
    "eviction rules that keep state bounded by keys per horizon in " +
    "a production ingest deployment running around the clock"

  private def doc(id: Long, t: String) =
    (id, s"http://example.com/p$id", "en", "s0", t)

  private def parquetFiles(root: String): Seq[JPath] =
    Files.walk(Paths.get(root)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq

  test("forget cascade: full erasure, untouched files preserved, re-admission, pack ≡ rebuild, idempotent") {
    val tmp = Files.createTempDirectory("forget_spec")
    val watch = Files.createDirectories(tmp.resolve("landing")).toString
    val cur = tmp.resolve("cur").toString
    val ix = tmp.resolve("ix").toString
    val out = tmp.resolve("out").toString
    val mh = MinHashParams()
    def fold() = runDag(datasetDag(spark, watch, cur, ix, out,
      Seq("en"), 3, 0.5, mh)).map(_.status)

    Seq(doc(1L, textA), doc(3L, textB))
      .toDF("doc_id", "url", "lang", "source", "text")
      .write.parquet(s"$watch/b1.parquet")
    assert(fold().forall(_ == Succeeded))
    Seq(doc(7L, textA.replace("morning", "evening")), doc(9L, textC))
      .toDF("doc_id", "url", "lang", "source", "text")
      .write.parquet(s"$watch/b2.parquet")
    assert(fold().forall(_ == Succeeded))
    // 7 was near-dup-dropped against 1's stored signatures; verdicts
    // name (7, dup_of=1) — forgetting 1 must erase that row too
    val tables = Seq(s"$cur/curated", s"$cur/hashes", s"$ix/bands",
      s"$ix/sets", s"$ix/corpus", s"$ix/verdicts")

    // snapshot: per parquet file, its bytes and whether it mentions 1
    val before = tables.flatMap(t => parquetFiles(t)).map { p =>
      val mentions = spark.read.parquet(p.toString).columns
        .intersect(Seq("doc_id", "dup_of")).exists { c =>
          spark.read.parquet(p.toString)
            .filter(col(c) === 1L).limit(1).count() > 0
        }
      (p, mentions, Files.readAllBytes(p).toSeq)
    }

    val res = Forget.forgetDocs(spark, cur, ix, Seq(1L))
    assert(res.map(_.rowsErased).sum > 0)
    // 1. zero remaining references in any stored table
    tables.foreach { t =>
      val df = spark.read.parquet(t)
      df.columns.intersect(Seq("doc_id", "dup_of")).foreach { c =>
        assert(df.filter(col(c) === 1L).count() === 0L, s"$t.$c")
      }
    }
    // the rest of the corpus is intact
    assert(spark.read.parquet(s"$ix/corpus").select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(3L, 9L))
    // 2. files that never mentioned the id are byte-identical
    before.filter(!_._2).foreach { case (p, _, bytes) =>
      assert(Files.exists(p) && Files.readAllBytes(p).toSeq === bytes,
        s"untouched file $p must not be rewritten")
    }
    // 3. erasure is real: identical text re-ingested is now ADMITTED
    // (content hash and signatures of textA are gone; 7's paraphrase
    // was never indexed, so nothing blocks it either)
    Seq(doc(11L, textA))
      .toDF("doc_id", "url", "lang", "source", "text")
      .write.parquet(s"$watch/b3.parquet")
    assert(fold().forall(_ == Succeeded))
    assert(spark.read.parquet(s"$ix/corpus").select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(3L, 9L, 11L))

    // 4. the epoch rebuild over the post-forget corpus ≡ a build over
    // a FROM-SCRATCH corpus holding the same surviving docs (written
    // in scrambled order, different file layout — packing must be a
    // pure function of the rows); no stale packed row references the
    // forgotten id
    val freshCorpus = tmp.resolve("fresh_corpus").toString
    Seq((11L, textA), (9L, textC), (3L, textB))
      .toDF("doc_id", "text").repartition(3)
      .write.mode("overwrite").parquet(freshCorpus)
    val out2 = tmp.resolve("out2").toString
    DatasetPipeline.packCorpus(spark, s"$ix/corpus", out, 42L, 4, 64)
    DatasetPipeline.packCorpus(spark, freshCorpus, out2, 42L, 4, 64)
    val a = spark.read.parquet(s"$out/packed").orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val b = spark.read.parquet(s"$out2/packed").orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(a === b && a.nonEmpty)
    assert(a.map(_.head).toSet === Set(3L, 9L, 11L))

    // 5. idempotent: a second forget finds nothing to rewrite
    val again = Forget.forgetDocs(spark, cur, ix, Seq(1L))
    assert(again.forall(r => r.filesRewritten == 0 && r.filesDeleted == 0
      && r.rowsErased == 0L))
  }

  private def onePartFile(rows: Seq[(Long, String)], dest: JPath): Unit = {
    val stage = Files.createTempDirectory("forget_stage").toString
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(stage)
    val part = Files.list(Paths.get(stage)).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    Files.copy(part, dest)
  }

  test("eraseFromDir swap is crash-safe: interrupted swaps recover, kept rows never lost") {
    // crash AFTER promote, BEFORE delete: both the superseded original
    // and its fgen1 replacement are on disk — recovery must drop the
    // original (higher generation wins), not double-count doc 2
    val d1 = Files.createTempDirectory("forget_crash1")
    onePartFile(Seq(1L -> "gone", 2L -> "kept"), d1.resolve("x.parquet"))
    onePartFile(Seq(2L -> "kept"), d1.resolve("fgen1_x.parquet"))
    val r1 = Forget.eraseFromDir(spark, d1.toString, Seq("doc_id"), Seq(99L))
    assert(r1.rowsErased === 0L && r1.filesRewritten === 0)
    assert(!Files.exists(d1.resolve("x.parquet")))
    assert(spark.read.parquet(d1.toString).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq(2L -> "kept"))

    // crash BEFORE promote: a leftover dot-tmp dir and the intact
    // original — recovery deletes the tmp, the erase then completes
    val d2 = Files.createTempDirectory("forget_crash2")
    onePartFile(Seq(1L -> "gone", 2L -> "kept", 3L -> "kept too"),
      d2.resolve("x.parquet"))
    val tmpDir = Files.createDirectories(d2.resolve(".forget_tmp_x.parquet"))
    Files.write(tmpDir.resolve("junk"), Array[Byte](1, 2, 3))
    val r2 = Forget.eraseFromDir(spark, d2.toString, Seq("doc_id"), Seq(1L))
    assert(r2.rowsErased === 1L && r2.filesRewritten === 1)
    assert(!Files.exists(tmpDir) && !Files.exists(d2.resolve("x.parquet")))
    assert(Files.exists(d2.resolve("fgen1_x.parquet")))
    assert(spark.read.parquet(d2.toString).select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(2L, 3L))

    // generations stack: a second erase of the same file promotes
    // fgen1 -> fgen2 (deterministic names, never growing prefixes)
    val r3 = Forget.eraseFromDir(spark, d2.toString, Seq("doc_id"), Seq(2L))
    assert(r3.rowsErased === 1L && r3.filesRewritten === 1)
    assert(Files.exists(d2.resolve("fgen2_x.parquet")) &&
      !Files.exists(d2.resolve("fgen1_x.parquet")))
    assert(spark.read.parquet(d2.toString).select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(3L))
  }
}
