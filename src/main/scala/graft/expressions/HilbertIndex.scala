package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Hilbert-curve index of a 2-D point — the data-skipping sort
  * key that strictly dominates the Morton key ([[graft.operators.ZOrder]])
  * on locality: consecutive Hilbert addresses are always
  * grid-adjacent, so range-bucketed "files" get min/max boxes with no
  * Morton-style diagonal jumps (measured in q233: the same 2-D box
  * predicate scans fewer rows under Hilbert than z-order at equal
  * file counts).
  *
  * Why a custom Expression and not composed functions: the standard
  * xy2d walk is a PER-BIT STATE MACHINE (reflect + swap the quadrant
  * frame at every level). Composing it from built-ins needs either a
  * `bits`-deep nested expression where x/y appear ~3× per level
  * (exponential tree) or an interpreted aggregate() lambda fold per
  * row; this expression is a tight generated-Java loop — O(bits) per
  * row inside whole-stage codegen, the RollingHash rationale. The
  * oracle replays the identical walk as `bits` chained CTE steps
  * ([[HilbertIndex.stepSql]]), all integer arithmetic, bit-exact.
  *
  * Inputs are non-negative longs already normalized to [0, 2^bits)
  * (callers mask/scale like z-order's callers do); 2·bits ≤ 62 keeps
  * the index positive.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, "hilbert bits must be in [1, 31]")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hilbert expects (BIGINT, BIGINT), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override protected def nullSafeEval(xv: Any, yv: Any): Any =
    HilbertIndex.xy2d(xv.asInstanceOf[Long], yv.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (xc, yc) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $xc;
         |long $y = $yc;
         |long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) != 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) != 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {

  /** The reference walk (interpreted eval + specs): the classic xy2d
    * with quadrant reflect/swap, d accumulating s² per level.
    */
  def xy2d(x0: Long, y0: Long, bits: Int): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0L) {
      val rx = if ((x & s) != 0L) 1L else 0L
      val ry = if ((y & s) != 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse walk (test harness): Hilbert address back to (x, y). */
  private[graft] def d2xy(d0: Long, bits: Int): (Long, Long) = {
    var x = 0L
    var y = 0L
    var t = d0
    var s = 1L
    while (s < (1L << bits)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  /** One oracle CTE step: given a relation with columns (x, y, d …),
    * produce the next level's (x, y, d) at scale `s` — the same
    * reflect/swap/accumulate as one loop iteration, pure integer SQL.
    * Chain [[stepSql]] for s = 2^(bits−1) … 1 to replay [[xy2d]].
    */
  def stepSql(s: Long): String = {
    val rx = s"(CASE WHEN (x & $s) != 0 THEN 1 ELSE 0 END)"
    val ry = s"(CASE WHEN (y & $s) != 0 THEN 1 ELSE 0 END)"
    s"""d + $s * $s * xor(3 * $rx, $ry) AS d,
      CASE WHEN $ry = 1 THEN x
           WHEN $rx = 1 THEN $s - 1 - y
           ELSE y END AS x,
      CASE WHEN $ry = 1 THEN y
           WHEN $rx = 1 THEN $s - 1 - x
           ELSE x END AS y"""
  }
}
