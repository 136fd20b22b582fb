package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst expression for the fixed-point squared-L2 distance:
  * Σ round((a[i]−b[i])²·1e12) as a Long — the distance kernel of the
  * product-quantization index ([[graft.functions.Vectors.pqAdcSearch]]).
  *
  * Same numeric contract as [[FixedPointDot]]: the per-element difference
  * is computed with ONE identical IEEE double subtraction in both engines
  * (parity, not exactness — widely separated magnitudes round), the square
  * is one more double rounding, and the HALF_UP fixed-point conversion
  * matches the SQL formulation
  * `SUM(CAST(ROUND((a[i]-b[i])*(a[i]-b[i])*1e12) AS BIGINT))` bit-for-bit
  * in both Spark and DuckDB — so PQ code assignment and ADC distances are
  * engine-independent BIGINTs (no doubles anywhere in the index).
  *
  * Numeric contract: each scaled term must fit a signed 64-bit long, i.e.
  * per-element |a[i]−b[i]| ≲ 3000 at the 1e12 scale. Violations throw
  * (longValueExact) instead of silently wrapping to a garbage distance.
  *
  * Participates in whole-stage codegen (doGenCode emits a static call),
  * keeping the distance loop inside the generated pipeline.
  */
case class FixedPointL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "fixed_point_l2"

  private def typeCode(e: Expression): Int =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType   => 0
      case DoubleType  => 1
      case LongType    => 2
      case IntegerType => 3
      case other => throw new IllegalArgumentException(s"unsupported element type $other")
    }
  @transient private lazy val lCode = typeCode(left)
  @transient private lazy val rCode = typeCode(right)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FixedPointL2.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lCode, rCode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = FixedPointL2.getClass.getName.stripSuffix("$")
    val (lc, rc) = (lCode, rCode)
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = $cls.compute($l, $r, $lc, $rc);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object FixedPointL2 {

  /** Column wrapper: fixed-point squared L2 as Long (scale 1e12). */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(FixedPointL2(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  private def get(ad: ArrayData, i: Int, code: Int): Double = code match {
    case 0 => ad.getFloat(i).toDouble
    case 1 => ad.getDouble(i)
    case 2 => ad.getLong(i).toDouble
    case _ => ad.getInt(i).toDouble
  }

  /** Shared loop for interpreted eval and generated code; exact HALF_UP
    * per squared difference (see FixedPointDot.compute for why
    * Math.round would drift on .5-adjacent doubles). */
  def compute(x: ArrayData, y: ArrayData, lCode: Int, rCode: Int): Long = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = get(x, i, lCode) - get(y, i, rCode)
      val p = d * d * 1e12
      // FixedPointDot.halfUpToLong: bit-identical HALF_UP without the
      // per-element BigDecimal; values ≥ 2^52 (and NaN/Inf) still take
      // the BigDecimal path, keeping the fail-fast longValueExact
      // overflow contract (generic int/long arrays make overflow
      // plausible)
      acc += FixedPointDot.halfUpToLong(p)
      i += 1
    }
    acc
  }
}
