package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the multi-dimensional sort key
  * behind lakehouse data-skipping layouts: rows clustered by the
  * interleaved bits of two columns land in files whose per-file
  * min/max ranges are TIGHT in BOTH dimensions, so a box predicate
  * prunes most files; a linear (single-column) layout only prunes in
  * its leading dimension.
  *
  * The key is a pure bit-arithmetic expression (shifts, masks, adds —
  * whole-stage-codegen'd, no UDF): bit i of x lands at position 2i,
  * bit i of y at 2i+1. At 100 TB the layout path is
  * `repartitionByRange(nFiles, zvalue(...))` + per-file min/max stats
  * — the write-side shuffle is the one range exchange every clustered
  * write pays; the read side is pure metadata pruning.
  */
object ZOrder {

  /** Morton key of two non-negative longs, `bits` bits each (masked;
    * bits ≤ 31 keeps the result within a positive long).
    */
  def zvalue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31)
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** The same key as SQL text (for oracles): Σ ((x>>i)&1)·2^(2i) +
    * ((y>>i)&1)·2^(2i+1).
    */
  def zvalueSql(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($x) >> $i) & 1) * ${1L << (2 * i)}",
        s"((($y) >> $i) & 1) * ${1L << (2 * i + 1)}")
    }.mkString("(", " + ", ")")

  /** Inverse (test harness): extract (x, y) back out of a Morton key. */
  private[graft] def deinterleave(z: Long, bits: Int): (Long, Long) = {
    var x = 0L
    var y = 0L
    var i = 0
    while (i < bits) {
      x |= ((z >> (2 * i)) & 1L) << i
      y |= ((z >> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (x, y)
  }
}
