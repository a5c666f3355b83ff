package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton (Z-order) bit interleave of two dimension codes into one
  * 64-bit sort key — the data-layout primitive behind multi-dimensional
  * clustering (Delta/Iceberg `OPTIMIZE ZORDER` style). Sorting by the
  * interleaved key keeps rows close in BOTH dimensions physically close
  * in the file layout, which turns parquet row-group/file min-max stats
  * into an effective 2-D index: a box predicate on either or both
  * dimensions prunes most files at scan time (see
  * [[graft.operators.LayoutOps]]).
  *
  * ORDERING CONTRACT: the key is a signed Long compared with ordinary
  * Long ordering, so the first dimension's bit 31 would land in the
  * sign bit and invert the order — dimension codes must be NON-NEGATIVE
  * ints (bit 31 clear; a negative code, e.g. from an unclamped
  * subtraction, silently destroys the clustering). The layout path
  * feeds 16-bit quantized codes ([[graft.operators.LayoutOps.q16]]),
  * which use only the low 32 bits of the key. The raw bit interleave
  * itself ([[ZOrder.interleave]]) is total on all 32-bit inputs.
  *
  * Pure bit arithmetic (six shift/mask rounds per dimension), codegen'd;
  * NULL in either dimension → NULL key (sorts together, still written).
  */
object ZOrder {
  /** Spread the 32 bits of `v` into the even bit positions of a long. */
  def spread(v0: Int): Long = {
    var v = v0.toLong & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Interleave: bit i of `a` lands at position 2i+1, of `b` at 2i. */
  def interleave(a: Int, b: Int): Long = (spread(a) << 1) | spread(b)
}

case class ZValue(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == IntegerType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"z_value expects (INT, INT), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder$$.MODULE$$.interleave($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ZValue = copy(left = newLeft, right = newRight)
}

object ZOrderFunctions {
  /** 64-bit Morton key of two INT dimension codes. */
  def z_value(a: Column, b: Column): Column =
    ColumnBridge.column(ZValue(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
}
