package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deletion-request ("right to be forgotten") cascade over the
  * standing dataset DAG — the data-governance operation every
  * production corpus must support: given a batch of doc ids, ERASE
  * every stored byte and fingerprint derived from them across the
  * curation corpus ([[CurationPipeline]]: curated rows + content
  * hashes) and the near-dup index ([[DedupIndexPipeline]]: bands,
  * shingle sets, kept corpus, verdict rows on EITHER side of a
  * match); the packed/tokenized training tables are pure per-epoch
  * functions of the corpus, so the next `dataset_pack` epoch is
  * automatically clean (and, spec-proved, bit-identical to packing a
  * corpus that never contained the docs).
  *
  * Semantics — ERASURE, not counterfactual replay: documents that
  * were historically dropped as duplicates OF a forgotten doc are not
  * resurrected (their text was never stored — by design nothing
  * remains to resurrect them from), which is the standard erasure
  * contract. What IS proved (ForgetSpec):
  *  - zero rows referencing a forgotten id remain in any stored
  *    table;
  *  - erasure is REAL, not tombstone-masking: re-ingesting identical
  *    text after a forget is ADMITTED (the content hash and MinHash
  *    signatures are gone);
  *  - the next epoch's packed tables ≡ a from-scratch build over the
  *    remaining corpus, bit for bit;
  *  - files containing none of the ids are left byte-identical, and
  *    a second forget of the same ids rewrites nothing (idempotent).
  *
  * Scale shape (100 TB): the expensive part is locating the rows. A
  * deletion request is a SMALL id batch (bounded contract — batch
  * requests, run the cascade once per window), so ids broadcast; one
  * scan per table finds the AFFECTED FILES via `input_file_name`,
  * and only those files are rewritten (append-dirs accumulate one
  * file set per folded batch, so a doc's rows live in few files; all
  * other files are untouched — no full-table rewrite). Per-batch
  * funnel METRICS keep only aggregate counts, never ids, and are
  * deliberately preserved as the audit record.
  */
object Forget {

  final case class EraseResult(dir: String, filesRewritten: Int,
      filesDeleted: Int, rowsErased: Long)

  // a rewritten file is named fgen<N>_<base>; an untouched original is
  // bare <base> (generation 0). Base and generation are recoverable
  // from the name alone, which is what makes the swap crash recovery
  // below deterministic.
  private val FgenName = "^fgen(\\d+)_(.*)$".r

  private[pipeline] def forgetGen(name: String): Int = name match {
    case FgenName(n, _) => n.toInt
    case _ => 0
  }

  private[pipeline] def forgetBase(name: String): String = name match {
    case FgenName(_, b) => b
    case _ => name
  }

  /** Finish any interrupted generation swap under `dir`: a
    * replacement is promoted to a VISIBLE name fgen<N+1>_<base>
    * before its predecessor (fgen<N>_<base> or bare <base>) is
    * deleted, so a crash between the two leaves both copies readable
    * — double-counting kept rows and keeping supposedly-erased rows
    * readable until recovered. This pass keeps only the highest
    * generation per base name and deletes leftover dot-prefixed tmp
    * dirs (crash before rename: the predecessor is still intact).
    * Driver-side listing only; no-op on a dir with no duplicates.
    */
  def recoverSwaps(spark: SparkSession, dir: String): Unit = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val byBase = fs.listStatus(root).map(_.getPath).flatMap { p =>
      if (p.getName.startsWith(".forget_tmp_")) { fs.delete(p, true); None }
      else Some((forgetBase(p.getName), forgetGen(p.getName), p))
    }.groupBy(_._1)
    byBase.values.filter(_.length > 1).foreach { vs =>
      vs.sortBy(-_._2).drop(1).foreach(v => fs.delete(v._3, false))
    }
  }

  /** Read a parquet append-dir that [[eraseFromDir]] may have
    * rewritten, finishing any interrupted generation swap first so a
    * crash mid-erase can never surface both generations of a file to
    * a consumer. ALL readers of the erasable dirs (curated/hashes,
    * bands/sets/corpus/fps/media/verdicts) go through here.
    */
  def readAppendDir(spark: SparkSession, dir: String): DataFrame = {
    recoverSwaps(spark, dir)
    spark.read.parquet(dir)
  }

  /** Erase every row of the parquet append-dir `dir` whose value in
    * ANY of `idCols` is in `ids`, rewriting only the files that
    * contain such rows. No-op (Nil result) if the dir doesn't exist.
    */
  def eraseFromDir(spark: SparkSession, dir: String, idCols: Seq[String],
      ids: Seq[Long]): EraseResult = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root) || ids.isEmpty)
      return EraseResult(dir, 0, 0, 0L)
    recoverSwaps(spark, dir)
    // the id batch is bounded (deletion requests are batched), so it
    // folds into scan-stage IN predicates — pushed to the parquet
    // reader, no join
    val distinctIds = ids.distinct
    val hit = idCols.map(c => col(c).isin(distinctIds: _*)).reduce(_ || _)
    // one scan finds the affected files; the file list is bounded by
    // the dir's file count (a driver-side listing either way)
    val affected = spark.read.parquet(dir)
      .withColumn("__f", input_file_name())
      .filter(hit)
      .select(col("__f")).distinct().collect().map(_.getString(0))
    var rewritten = 0
    var deleted = 0
    var rows = 0L
    affected.foreach { uri =>
      val filePath = new Path(new java.net.URI(uri))
      val before = spark.read.parquet(uri)
      val keepCond = idCols.map(c => !col(c).isin(distinctIds: _*) ||
        col(c).isNull).reduce(_ && _)
      val kept = before.filter(keepCond).localCheckpoint(true)
      val nBefore = before.count()
      val nKept = kept.count()
      rows += nBefore - nKept
      if (nKept == 0L) {
        fs.delete(filePath, false)
        deleted += 1
      } else {
        val tmp = new Path(root, s".forget_tmp_${filePath.getName}")
        fs.delete(tmp, true)
        kept.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = fs.listStatus(tmp).map(_.getPath)
          .find(_.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no part file written under $tmp"))
        // crash-safe swap: promote the replacement to a VISIBLE
        // next-generation name first, delete the predecessor after. A
        // crash between the two leaves both copies readable (kept rows
        // never lost), and the recovery pass at the top of this method
        // finishes the delete on the next run.
        val dest = new Path(root,
          s"fgen${forgetGen(filePath.getName) + 1}_${forgetBase(filePath.getName)}")
        fs.delete(dest, false)
        fs.rename(part, dest)
        fs.delete(filePath, false)
        fs.delete(tmp, true)
        rewritten += 1
      }
    }
    EraseResult(dir, rewritten, deleted, rows)
  }

  /** The full cascade: curation corpus + hashes, dedup-index bands /
    * sets / corpus, and verdict rows naming a forgotten id on either
    * side of a match. Returns one [[EraseResult]] per table touched.
    */
  def forgetDocs(spark: SparkSession, curDir: String, indexDir: String,
      ids: Seq[Long]): Seq[EraseResult] = Seq(
    eraseFromDir(spark, s"$curDir/curated", Seq("doc_id"), ids),
    eraseFromDir(spark, s"$curDir/hashes", Seq("doc_id"), ids),
    eraseFromDir(spark, s"$indexDir/bands", Seq("doc_id"), ids),
    eraseFromDir(spark, s"$indexDir/sets", Seq("doc_id"), ids),
    eraseFromDir(spark, s"$indexDir/corpus", Seq("doc_id"), ids),
    eraseFromDir(spark, s"$indexDir/verdicts", Seq("doc_id", "dup_of"), ids))
}
