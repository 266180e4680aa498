package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Multi-pattern blocklist scan — Aho–Corasick (1975) over a bounded,
  * driver-built pattern dictionary. The corpus-curation "badwords /
  * contamination-phrase" gate (C4's blocklist, eval-canary phrases):
  * at 100 TB the naive plan is one `contains`/regexp pass PER pattern
  * (dict-size scans of the corpus, or a dict-size expression chain);
  * the automaton is ONE O(chars) pass per document emitting EVERY
  * occurrence of every pattern — including overlapping and nested
  * matches, which greedy replace-based counting silently drops
  * (a self-bordered phrase like "table table" in "table table table"
  * occurs twice; replace counts one).
  *
  * Scale shape: the automaton is built once on the driver from the
  * bounded dict (bounded-state discipline — the dict is config, never
  * data-scale), ships inside the task closure like a broadcast model,
  * and the scan is a narrow mapPartitions that pipelines inside the
  * scan stage: nothing shuffles until the caller aggregates matches.
  * This is the codec exception class (per-partition imperative state
  * over opaque payloads) — the automaton is the per-partition "codec".
  */
object AhoCorasick {

  /** Trie + BFS failure links + flattened emit lists. Node 0 is root.
    * `emits(n)` lists every pattern index whose match ENDS at state n
    * (own output plus the failure-chain closure, precomputed so the
    * scan loop never walks fail links for output).
    */
  final class Automaton(val patterns: IndexedSeq[String]) extends Serializable {
    require(patterns.nonEmpty, "empty pattern dict")
    require(patterns.forall(_.nonEmpty), "empty pattern")
    require(patterns.distinct.size == patterns.size, "duplicate patterns")

    // construction scratch — @transient: the task closure ships only
    // the flattened nextArr/failArr/emits the scan loop reads, not
    // the boxed trie builder state (dead after the constructor)
    @transient private val next =
      mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    @transient private val out = mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { ch =>
        s = next(s).getOrElseUpdate(ch, {
          next += mutable.Map.empty[Char, Int]
          out += Nil
          next.size - 1
        })
      }
      out(s) = pi :: out(s)
    }
    @transient private val fail = Array.fill(next.size)(0)
    val emits: Array[Array[Int]] = {
      val em = Array.fill(next.size)(List.empty[Int])
      val q = mutable.Queue.empty[Int]
      next(0).valuesIterator.foreach { c => fail(c) = 0; q += c }
      em(0) = out(0)
      while (q.nonEmpty) {
        val u = q.dequeue()
        em(u) = out(u) ::: em(fail(u))
        next(u).foreach { case (ch, v) =>
          // f walks fail(u)'s chain, which is strictly shallower than
          // u, so next(f)(ch) can never be v itself (unique parent)
          var f = fail(u)
          while (f != 0 && !next(f).contains(ch)) f = fail(f)
          fail(v) = next(f).getOrElse(ch, 0)
          q += v
        }
      }
      em.map(_.toArray)
    }
    private val nextArr: Array[Map[Char, Int]] = next.map(_.toMap).toArray
    private val failArr: Array[Int] = fail

    def step(state: Int, ch: Char): Int = {
      var s = state
      while (s != 0 && !nextArr(s).contains(ch)) s = failArr(s)
      nextArr(s).getOrElse(ch, 0)
    }
  }

  val matchSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("pat", StringType),
    StructField("pos", IntegerType))) // 1-based match START

  /** All occurrences of every pattern in `textCol`, one row per match.
    * Null/empty text matches nothing. O(chars + matches) per row.
    * Positions are 1-based UTF-16 code-unit offsets — identical to
    * codepoint offsets for BMP-only text (the oracle's `substr`
    * counts codepoints, so supplementary-plane corpora would need a
    * codepoint-walking variant; the dict phrases themselves match
    * either way since matching is exact char equality).
    */
  def matches(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val auto = new Automaton(patterns.toIndexedSeq)
    val enc = Encoders.row(matchSchema)
    df.select(col(idCol).cast("long"), col(textCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val text = if (r.isNullAt(1)) "" else r.getString(1)
          val acc = mutable.ArrayBuffer.empty[Row]
          var s = 0
          var i = 0
          while (i < text.length) {
            s = auto.step(s, text.charAt(i))
            val em = auto.emits(s)
            var j = 0
            while (j < em.length) {
              val p = auto.patterns(em(j))
              acc += Row(id, p, i - p.length + 2) // 1-based start
              j += 1
            }
            i += 1
          }
          acc
        }
      }(enc)
  }
}
