package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two numeric arrays, accumulated as a
  * SEQUENTIAL left fold of element-wise double products — the exact
  * semantics of
  *   aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)
  * (and of DuckDB's list_reduce over list_zip), so results stay
  * BIT-IDENTICAL to the SQL oracle, just ~10× faster: Catalyst runs
  * nested higher-order lambdas interpreted, one variable binding per
  * element, which dominates all-pairs similarity scans.
  *
  * Null semantics mirror the HOF chain: null array → null; length
  * mismatch or null element → null (zip_with pads with null and
  * null poisons the fold).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType | IntegerType | LongType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects numeric arrays, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  @inline private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType => a.getLong(i).toDouble
    case _ => throw new IllegalStateException("unreachable")
  }

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
      acc += get(la, i, lt) * get(ra, i, rt)
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native INTEGER dot product over two integral arrays — the SQ8
  * scoring kernel (Similarity.sqTopK / ivfSqTopK). Semantics of
  *   aggregate(zip_with(a, b, (x,y) -> x*y), 0L, +)
  * but in one tight primitive loop instead of interpreted
  * per-element lambda bindings. Integer products/sums are exact and
  * order-independent, so this is trivially bit-identical to the
  * DuckDB list_reduce oracle; callers guarantee |elements| and
  * magnitudes keep the accumulation inside Long (int8 codes: |x| ≤
  * 127 ⇒ overflow needs > 5·10¹⁴ dims).
  *
  * Null semantics mirror the HOF chain: null array → null; length
  * mismatch or null element → null.
  */
case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(IntegerType | LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_idot expects integral arrays, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  @inline private def get(a: ArrayData, i: Int, t: DataType): Long =
    t match {
      case IntegerType => a.getInt(i).toLong
      case LongType => a.getLong(i)
      case _ => throw new IllegalStateException("unreachable")
    }

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    if (la.numElements() != ra.numElements()) return null
    val lt = left.dataType.asInstanceOf[ArrayType].elementType
    val rt = right.dataType.asInstanceOf[ArrayType].elementType
    val n = la.numElements()
    var i = 0
    var acc = 0L
    while (i < n) {
      if (la.isNullAt(i) || ra.isNullAt(i)) return null
      acc += get(la, i, lt) * get(ra, i, rt)
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotProduct =
    copy(left = newLeft, right = newRight)
}
