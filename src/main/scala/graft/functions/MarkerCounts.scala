package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused multi-dictionary membership counter: one pass over a word
  * array, counting occurrences (duplicates included) per dictionary —
  * ARRAY<INT>, one slot per dictionary.
  *
  * Replaces N separate `size(filter(w, _.isInCollection(dict)))` calls:
  * the higher-order filter lambda is interpreter-evaluated per element
  * and each dictionary re-walks the array, so langid's four dictionaries
  * cost 4 interpreted scans per row. Here a word is hashed ONCE into a
  * precomputed word→bitmask table and every dictionary's counter bumps
  * off the mask, inside whole-stage codegen. Up to 32 dictionaries.
  */
case class MarkerCounts(child: Expression, dicts: Seq[Seq[String]])
    extends UnaryExpression {
  require(dicts.nonEmpty && dicts.size <= 32, "1..32 dictionaries")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"marker_counts expects ARRAY<STRING>, got ${t.simpleString}")
  }

  /** word → bitmask of dictionaries containing it. */
  @transient lazy val maskTable: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    dicts.zipWithIndex.foreach { case (dict, i) =>
      dict.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    m
  }

  def countsOf(arr: ArrayData): Array[Int] = {
    val counts = new Array[Int](dicts.size)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val mask = maskTable.get(arr.getUTF8String(i))
        if (mask != null) {
          var m = mask.intValue()
          while (m != 0) {
            val b = java.lang.Integer.numberOfTrailingZeros(m)
            counts(b) += 1
            m &= m - 1
          }
        }
      }
      i += 1
    }
    counts
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(countsOf(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("markerCounts", this,
      classOf[MarkerCounts].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $self.countsOf($arr));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MarkerFunctions {
  /** Column API: per-dictionary occurrence counts of a string array. */
  def marker_counts(words: Column, dicts: Seq[Seq[String]]): Column =
    ColumnBridge.column(MarkerCounts(ColumnBridge.expression(words), dicts))
}
