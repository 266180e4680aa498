package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.TrainingPrep

/** Training-dataset materialization — the LAST stage of the
  * end-to-end dataset build ([[graft.cli.Orchestrator.datasetDag]]):
  * given the curated, near-dup-free corpus snapshot, produce the
  * shard writer's work order — a seeded deterministic corpus shuffle
  * plus the token-packing offset table that maps every document into
  * fixed-length training sequences.
  *
  * Unlike the upstream folds (which are O(delta) appends), packing is
  * a FULL REWRITE by design: sequence offsets are a prefix sum over
  * the global shuffled order, so any corpus change moves every
  * downstream offset — the packed table is a pure function of the
  * corpus snapshot and is regenerated per epoch materialization
  * (cost is linear in the corpus, once per epoch, and entirely
  * shuffle-bounded by [[TrainingPrep.packOffsets]]' two-phase
  * bucketed prefix sum — no global sort).
  */
object DatasetPipeline {

  /** Pack the corpus at `corpusDir` (doc_id, text, …) into
    * `outDir/packed`: seeded shuffle order (shard, pos), whitespace
    * token counts, and per-document sequence offsets for `seqLen`-
    * token training sequences. Returns the packed row count.
    */
  def packCorpus(spark: SparkSession, corpusDir: String, outDir: String,
      seed: Long, numShards: Int, seqLen: Int): Long = {
    val corpus = spark.read.parquet(corpusDir)
      .withColumn("n_tokens",
        size(TextFns.tokens(col("text"))).cast("long"))
    val ordered = TrainingPrep.shuffleOrder(corpus, "doc_id", seed,
      numShards)
      // one monotone order key over (shard, pos): shards are disjoint
      // ranges, so packing never interleaves shards
      .withColumn("ord",
        col("shard").cast("long") * lit(1L << 40) + col("pos"))
    val packed = TrainingPrep.packOffsets(ordered, "ord", "n_tokens",
      seqLen)
      .select(col("doc_id"), col("shard"), col("pos"), col("n_tokens"),
        col("offset"), col("first_seq"), col("last_seq"), col("n_seqs"))
    packed.write.mode("overwrite").parquet(s"$outDir/packed")
    spark.read.parquet(s"$outDir/packed").count()
  }

  /** Packed-table invariants the standing DAG validates: one row per
    * corpus doc, offsets are EXACTLY the prefix sums of token counts
    * in (shard, pos) order (gapless, overlap-free), and every
    * document's sequence range matches its offset.
    */
  def validatePacked(spark: SparkSession, corpusDir: String,
      outDir: String, seqLen: Int): Boolean = {
    import org.apache.spark.sql.expressions.Window
    val packed = spark.read.parquet(s"$outDir/packed")
    val corpusN = spark.read.parquet(corpusDir).count()
    val w = Window.orderBy(col("shard"), col("pos"))
    val bad = packed
      .withColumn("expect_offset",
        coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L)))
      .filter(col("offset") =!= col("expect_offset") ||
        col("first_seq") =!= floor(col("offset") / seqLen) ||
        col("last_seq") =!= floor(
          (col("offset") + greatest(col("n_tokens"), lit(1L)) - 1) / seqLen))
    packed.count() == corpusN && bad.isEmpty
  }
}
