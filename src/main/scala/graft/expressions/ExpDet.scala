package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** DETERMINISTIC exp(x) — [[LnDet]]'s inverse-direction twin, built so
  * sigmoid/softmax/RBF arithmetic can appear in oracled queries without
  * depending on libm exp() (faithfully rounded only; last-ulp differences
  * between engines break hash parity).
  *
  * Algorithm, every step one two-operand IEEE op in a pinned order:
  *   1. k = floor(x/ln2 + 0.5)   — integer-valued double, |k| ≤ 63 on
  *      the documented domain |x| ≤ 43 (single-constant reduction; the
  *      ln2 rounding error contributes ≤ ~2e-15 relative, deterministic).
  *   2. r = x − k·ln2, r ∈ [−0.3466, 0.3466].
  *   3. exp(r) by the fixed-order 12-term Horner Taylor series —
  *      truncation ≤ r¹²/12! ≈ 7e-16.
  *   4. scale by 2^k via the six binary steps 2^32, 2^16, …, 2^1
  *      (each multiply/divide by a power of two is EXACT in IEEE), the
  *      mirror of LnDet's range reduction.
  *
  * The DuckDB oracle replays the identical tree via
  * [[graft.queries.Portable.expDetSqlCtes]]. Outside |x| ≤ 43 the
  * scale chain saturates at 2^±63 — callers clamp first (a saturated
  * sigmoid is exactly what a classifier wants there anyway).
  *
  * Consumers: logistic-regression gate (q268), Platt-style calibration.
  */
case class ExpDet(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_expdet expects DOUBLE, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    ExpDet.compute(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ExpDet.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): ExpDet =
    copy(child = newChild)
}

object ExpDet {
  val LN2 = 0.6931471805599453

  /** The canonical walk (also the SQL replay's spec, op for op). */
  def compute(x: Double): Double = {
    val k = math.floor(x / LN2 + 0.5)
    val r = x - k * LN2
    // 12-term Horner: 1 + r(1 + r(1/2 + r(1/6 + ...)))
    val p = 1.0 + r * (1.0 + r * (1.0 / 2.0 + r * (1.0 / 6.0 +
      r * (1.0 / 24.0 + r * (1.0 / 120.0 + r * (1.0 / 720.0 +
        r * (1.0 / 5040.0 + r * (1.0 / 40320.0 + r * (1.0 / 362880.0 +
          r * (1.0 / 3628800.0 + r * (1.0 / 39916800.0)))))))))))
    var ka = if (k < 0.0) -k else k
    if (ka > 63.0) ka = 63.0
    var sc = 1.0
    if (ka >= 32.0) { sc = sc * 4294967296.0; ka = ka - 32.0 }
    if (ka >= 16.0) { sc = sc * 65536.0; ka = ka - 16.0 }
    if (ka >= 8.0) { sc = sc * 256.0; ka = ka - 8.0 }
    if (ka >= 4.0) { sc = sc * 16.0; ka = ka - 4.0 }
    if (ka >= 2.0) { sc = sc * 4.0; ka = ka - 2.0 }
    if (ka >= 1.0) { sc = sc * 2.0; ka = ka - 1.0 }
    if (k < 0.0) p / sc else p * sc
  }

  /** Deterministic logistic sigmoid with the ±30 clamp both engines
    * apply before the exp (saturated far tails; clamp is portable).
    */
  def sigmoid(z: Double): Double = {
    val zc = if (z > 30.0) 30.0 else if (z < -30.0) -30.0 else z
    1.0 / (1.0 + compute(-zc))
  }
}
