package graft.pipeline

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.{BpeTrainer, TrainingPrep}

class DatasetPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("interleavePlaceholders: insert-before, same-position order, indices") {
    val docs = Seq(
      // ids [10,20,30]; marks: before pos 1, two at pos 3 (append)
      (1L, Seq(10L, 20L, 30L), Seq((1, 101L), (3, 102L), (3, 103L))),
      (2L, Seq(40L), Seq.empty[(Int, Long)]),       // no images
      (3L, Seq.empty[Long], Seq((0, 104L))))        // image-only doc
      .toDF("doc_id", "ids", "raw")
      .withColumn("marks", transform(col("raw"),
        m => struct(m.getField("_1").as("p"), m.getField("_2").as("ref"))))
    val out = TrainingPrep.interleavePlaceholders(docs, "doc_id",
        "marks", placeholderId = 99L)
      .select("doc_id", "ids", "refs").collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Long](1).toSeq,
          r.getSeq[org.apache.spark.sql.Row](2)
            .map(x => (x.getLong(0), x.getLong(1))).toSeq))
      .toMap
    assert(out(1L)._1 === Seq(10L, 99L, 20L, 30L, 99L, 99L))
    assert(out(1L)._2 === Seq((101L, 1L), (102L, 4L), (103L, 5L)))
    assert(out(2L)._1 === Seq(40L) && out(2L)._2.isEmpty)
    assert(out(3L)._1 === Seq(99L) && out(3L)._2 === Seq((104L, 0L)))
  }

  test("packMultimodalSequences: every image lands on a placeholder slot") {
    val tmp = Files.createTempDirectory("mm_pack")
    val corpusDir = tmp.resolve("corpus").toString
    val imagesDir = tmp.resolve("images").toString
    val outDir = tmp.resolve("out").toString
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog near a river",
      2L -> "streaming watermark semantics keep state bounded for keys",
      3L -> "a completely different document about query optimizers")
    texts.toDF("doc_id", "text").write.parquet(corpusDir)
    // images: doc 1 gets two, doc 3 one, plus one for an unknown doc
    Seq((1L, 2, 901L), (1L, 5, 902L), (3L, 0, 903L), (77L, 0, 999L))
      .toDF("doc_id", "p", "ref").write.parquet(imagesDir)
    val merges = BpeTrainer.demoMerges
    val (nSeqs, nAligned) = DatasetPipeline.packMultimodalSequences(
      spark, corpusDir, imagesDir, outDir, seed = 7L, numShards = 2,
      seqLen = 16, merges = merges)
    assert(nAligned === 3L, "unknown-doc image must be ignored")
    assert(nSeqs >= 2L)

    val vocabSize = BpeTrainer.vocabTable(
      spark.read.parquet(corpusDir), "text", merges).count()
    val seqs = spark.read.parquet(s"$outDir/sequences")
      .collect().map(r => r.getLong(r.fieldIndex("seq_id")) ->
        r.getSeq[Long](r.fieldIndex("ids")).toSeq).toMap
    val align = spark.read.parquet(s"$outDir/image_align")
      .select("media_ref", "seq_id", "pos_in_seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(align.map(_._1).toSet === Set(901L, 902L, 903L))
    // THE alignment contract: the id at each image's slot is the
    // placeholder id, and placeholders appear NOWHERE else
    align.foreach { case (ref, seqId, pos) =>
      assert(seqs(seqId)(pos) === vocabSize, s"ref $ref misaligned")
    }
    val placeholderSlots = seqs.toSeq.flatMap { case (sid, ids) =>
      ids.zipWithIndex.collect { case (id, i) if id == vocabSize => (sid, i) }
    }.toSet
    assert(placeholderSlots ===
      align.map(a => (a._2, a._3.toLong.toInt)).toSet)
    // token conservation: sequences carry text tokens + one slot per image
    val textTokens = texts.toDF("doc_id", "text")
      .agg(sum(BpeTrainer.bpeTokenCount(col("text"), merges)))
      .head.getLong(0)
    assert(seqs.values.map(_.size).sum === textTokens + 3)
  }

  test("packMultimodalSequences: image-only / whitespace docs keep their placeholders") {
    // pre-fix, a doc whose BPE id array is empty vanished before the
    // marks join, silently dropping its images from both tables
    val tmp = Files.createTempDirectory("mm_pack_empty")
    val corpusDir = tmp.resolve("corpus").toString
    val imagesDir = tmp.resolve("images").toString
    val outDir = tmp.resolve("out").toString
    Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "   ", // whitespace-only: zero text tokens
      3L -> "")    // fully empty, image-only doc
      .toDF("doc_id", "text").write.parquet(corpusDir)
    Seq((2L, 0, 201L), (3L, 0, 301L), (3L, 0, 302L))
      .toDF("doc_id", "p", "ref").write.parquet(imagesDir)
    val merges = BpeTrainer.demoMerges
    val (nSeqs, nAligned) = DatasetPipeline.packMultimodalSequences(
      spark, corpusDir, imagesDir, outDir, seed = 11L, numShards = 2,
      seqLen = 8, merges = merges)
    assert(nAligned === 3L,
      "empty-text docs must still contribute their placeholders")
    assert(nSeqs >= 1L)
    val vocabSize = BpeTrainer.vocabTable(
      spark.read.parquet(corpusDir), "text", merges).count()
    val seqs = spark.read.parquet(s"$outDir/sequences")
      .collect().map(r => r.getLong(r.fieldIndex("seq_id")) ->
        r.getSeq[Long](r.fieldIndex("ids")).toSeq).toMap
    val align = spark.read.parquet(s"$outDir/image_align")
      .select("media_ref", "seq_id", "pos_in_seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(align.map(_._1).toSet === Set(201L, 301L, 302L))
    align.foreach { case (ref, seqId, pos) =>
      assert(seqs(seqId)(pos) === vocabSize, s"ref $ref misaligned")
    }
    val textTokens = spark.read.parquet(corpusDir)
      .agg(sum(BpeTrainer.bpeTokenCount(col("text"), merges)))
      .head.getLong(0)
    assert(seqs.values.map(_.size).sum === textTokens + 3)
  }
}
