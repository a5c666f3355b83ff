package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Adjacent word-pair ("w1 w2") strings of an ARRAY<STRING> column in
  * ONE compiled pass — the bigram spelling shared by v27
  * (rare-bigram quality scoring) and st14 (streaming vocabulary
  * ledger).
  *
  * Exists because the composable form —
  * `transform(sequence(1, size(w) - 1),
  *   i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))` —
  * evaluates an interpreted lambda tree per element per row (higher-
  * order functions are CodegenFallback), the same class the round-9
  * scale measurements flagged for shingles/scrub/PQ; at sf0.1 it was
  * the dominant term of st14's 676 ms single-batch addBatch.
  * Bit-identical to the composable spelling (FunctionsSpec pins it):
  * UTF8String.concat preserves bytes exactly, and a null word yields
  * a null element exactly as SQL concat's null propagation does.
  * Inputs with fewer than two words produce an EMPTY array — callers
  * keep their `size(w) >= 2` filter, under which the two spellings
  * agree (the composable form's `sequence(1, 0)` would DESCEND).
  *
  * [[CodegenFallback]] by the [[ShingleHashes]] argument: one
  * compiled call per row with a primitive loop beats per-element
  * interpreted trees. */
case class Bigrams(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bigrams expects ARRAY<STRING>, got ${other.simpleString}")
  }

  private val Space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[ArrayData]
    val n = w.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var prev = w.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur = w.getUTF8String(i)
      out(i - 1) =
        if (prev == null || cur == null) null
        else UTF8String.concat(prev, Space, cur)
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BigramFunctions {
  /** Column API: adjacent word-pair strings (see [[Bigrams]]). */
  def bigrams(words: Column): Column =
    ColumnBridge.column(Bigrams(ColumnBridge.expression(words)))
}
