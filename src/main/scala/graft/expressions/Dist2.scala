package graft.expressions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared element access for the squared-L2 kernels. */
private[expressions] trait Dist2Base { self: BinaryExpression =>
  protected def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType | IntegerType | LongType), _) =>
      Some(t)
    case _ => None
  }

  protected def check(name: String): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects numeric arrays, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  @inline protected final def get(a: ArrayData, i: Int, t: DataType): Double =
    t match {
      case FloatType => a.getFloat(i).toDouble
      case DoubleType => a.getDouble(i)
      case IntegerType => a.getInt(i).toDouble
      case LongType => a.getLong(i).toDouble
      case _ => throw new IllegalStateException("unreachable")
    }
}

/** Native DECIMAL squared L2 between two numeric arrays — the k-means
  * assignment kernel. Bit-identical semantics of
  *   aggregate(zip_with(a, b, (x,y) -> ((double(x)-double(y))^2)
  *                                       .cast(DECIMAL(28,8))),
  *             0L.cast(DECIMAL(38,8)), (acc,v) -> (acc+v).cast(38,8))
  * Each per-dim square rounds HALF_UP to 8 decimals of the double's
  * shortest decimal representation (exactly Spark's double→decimal
  * cast). CRITICALLY, the chained add is NOT an exact sum: Spark
  * types DECIMAL(38,8) + DECIMAL(28,8) as DECIMAL(38,7) (precision
  * would need 39, so allowPrecisionLoss drops the scale to 7), so
  * EVERY partial sum rounds HALF_UP to 7 decimals before the cast
  * back to scale 8 — a lossy but deterministic sequential fold, which
  * this kernel replays digit-for-digit (Dist2Spec pins parity against
  * the original chain; the unit digit of each scale-8 partial is
  * rounded away each step). One tight primitive loop with a compact
  * unscaled-long accumulator (BigInteger escape on overflow) replaces
  * the interpreted per-element lambda machinery and its per-add
  * Decimal allocations, which dominated the Lloyd passes (q202/q210/
  * q211/q212 first-iteration stages).
  *
  * Null semantics mirror the HOF chain: null array → null; length
  * mismatch or null element → null (zip_with pads with null and null
  * poisons the fold); a NaN/Infinite square or one whose decimal
  * exceeds DECIMAL(28,8) casts to null (non-ANSI) → null.
  */
case class Dist2Decimal(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with Dist2Base {

  override def dataType: DataType = DecimalType(38, 8)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = check("graft_dist2q8")

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    if (la.numElements() != ra.numElements()) return null
    val lt = elemType(left).get
    val rt = elemType(right).get
    val n = la.numElements()
    var i = 0
    // unscaled value at scale 8; a multiple of 10 after every add
    // (each partial sum is a scale-7 value re-expressed at scale 8)
    var accL = 0L
    var accB: JBigDecimal = null
    while (i < n) {
      if (la.isNullAt(i) || ra.isNullAt(i)) return null
      val d = get(la, i, lt) - get(ra, i, rt)
      val sq = d * d
      if (java.lang.Double.isNaN(sq) || java.lang.Double.isInfinite(sq))
        return null
      // Spark's Cast(double → DECIMAL(28,8)): BigDecimal over the
      // shortest decimal repr (valueOf), setScale(8, HALF_UP),
      // precision gate
      val bd = JBigDecimal.valueOf(sq).setScale(8, RoundingMode.HALF_UP)
      if (bd.precision > 28) return null
      val unscaled = bd.unscaledValue()
      if (accB == null && unscaled.bitLength() < 62) {
        val u = unscaled.longValue()
        val s = accL + u // both ≥ 0 and < 2^62: cannot overflow
        // the DECIMAL(38,7)-typed add: HALF_UP at scale 7, back to 8
        val r10 = s % 10L
        val acc7 = if (r10 >= 5L) s - r10 + 10L else s - r10
        if (acc7 <= (Long.MaxValue >> 1)) accL = acc7
        else accB = new JBigDecimal(
          java.math.BigInteger.valueOf(acc7), 8)
      } else {
        if (accB == null)
          accB = new JBigDecimal(java.math.BigInteger.valueOf(accL), 8)
        accB = accB.add(bd).setScale(7, RoundingMode.HALF_UP)
        if (accB.precision > 38) return null
        accB = accB.setScale(8)
      }
      i += 1
    }
    if (accB == null) Decimal(accL, 38, 8)
    else Decimal(BigDecimal(accB), 38, 8)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Dist2Decimal =
    copy(left = newLeft, right = newRight)
}

/** Native DOUBLE squared L2 — sequential left fold Σ (aᵢ−bᵢ)², the
  * exact semantics of
  *   aggregate(zip_with(a, b, (x,y) -> (double(x)-double(y)) *
  *                                     (double(x)-double(y))), 0d, +)
  * (and DuckDB's list_reduce), bit-identical because the fold is
  * sequential in both. NaN/Infinity flow through as double values,
  * exactly as in the HOF chain. Null semantics as [[Dist2Decimal]].
  */
case class Dist2Double(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with Dist2Base {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = check("graft_dist2")

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    if (la.numElements() != ra.numElements()) return null
    val lt = elemType(left).get
    val rt = elemType(right).get
    val n = la.numElements()
    var i = 0
    var acc = 0.0
    while (i < n) {
      if (la.isNullAt(i) || ra.isNullAt(i)) return null
      val d = get(la, i, lt) - get(ra, i, rt)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Dist2Double =
    copy(left = newLeft, right = newRight)
}
