package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** DETERMINISTIC natural log for x ≥ 1 — graft's cross-engine-exact
  * replacement for libm ln(), which is only faithfully rounded and may
  * differ in the last ulp between implementations (the q48 rationale
  * for avoiding it in oracled arithmetic). Algorithm: 6-step binary
  * range reduction on exact power-of-two thresholds (each division is
  * by 2^k — EXACT in IEEE — and each comparison is exact), then the
  * fixed-order Horner atanh series 2·t·(1 + t²(1/3 + … + t²/15)) with
  * t = (m−1)/(m+1), m ∈ [1,2). Every operation is one two-operand
  * IEEE op in a pinned order, so any engine replaying the same
  * expression tree produces the SAME double — the DuckDB oracle does,
  * via [[graft.queries.Portable.lnDetSqlCtes]]. |t| ≤ 1/3 puts the
  * truncation error at ≤ t¹⁷/17 ≈ 8e-10. Domain [1, 2^64); x < 1
  * returns the series' (wrong-branch) value, so callers normalize
  * first (e.g. ln(u) for u ∈ (0,1] as −lnDet(1/u)).
  *
  * Consumers: MFCC log compression (q232), Efraimidis–Spirakis
  * weighted-reservoir keys (q234).
  */
case class LnDet(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_lndet expects DOUBLE, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    LnDet.compute(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.LnDet.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): LnDet =
    copy(child = newChild)
}

object LnDet {
  /** The canonical walk (also the interpreted eval and the JVM-side
    * decode path's log — [[graft.operators.Multimodal.lnDet]]
    * delegates here).
    */
  def compute(x: Double): Double = {
    var m = x
    var e = 0.0
    if (m >= 4294967296.0) { m = m / 4294967296.0; e += 32 }
    if (m >= 65536.0) { m = m / 65536.0; e += 16 }
    if (m >= 256.0) { m = m / 256.0; e += 8 }
    if (m >= 16.0) { m = m / 16.0; e += 4 }
    if (m >= 4.0) { m = m / 4.0; e += 2 }
    if (m >= 2.0) { m = m / 2.0; e += 1 }
    val t = (m - 1.0) / (m + 1.0)
    val t2 = t * t
    e * 0.6931471805599453 + 2.0 * (t * (1.0 + t2 * (1.0 / 3.0 +
      t2 * (1.0 / 5.0 + t2 * (1.0 / 7.0 + t2 * (1.0 / 9.0 +
        t2 * (1.0 / 11.0 + t2 * (1.0 / 13.0 + t2 * (1.0 / 15.0)))))))))
  }
}
