package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-bit SimHash of a pre-hashed feature array (ARRAY<LONG> of feature
  * hashes → LONG signature): bit b of the output is set when the
  * majority of feature hashes have bit b set (ties count as set —
  * matching a sign-sum >= 0 over +1/-1 votes).
  *
  * Exists because the composable forms are slow at scale: an
  * explode + 64-way groupBy costs a full shuffle, and 64
  * `size(filter(...))` higher-order calls are CodegenFallback
  * (interpreted per row). This expression folds the array ONCE inside
  * whole-stage codegen with a 64-counter loop.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects ARRAY<BIGINT>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    // null elements are SKIPPED (a null hash must not vote 0 on every
    // bit — the zeroed slot read as 0L did exactly that; round-10
    // review), and the vote total only counts real elements
    var voters = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        voters += 1
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      // 2L: an Int doubling wraps past 2^30 set votes and flips the
      // majority comparison
      if (2L * counts(b) >= voters) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |int[] $counts = new int[64];
         |int ${n}_voters = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) continue;
         |  ${n}_voters++;
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $counts[$b]++;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if (2L * $counts[$b] >= ${n}_voters) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashFunctions {
  /** Column API: simhash64 over an ARRAY<LONG> of feature hashes. */
  def simhash64(featureHashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(featureHashes)))
}
