package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All MinHash permutation minima of a hash array in ONE pass: for
  * each affine permutation (a, b), min over the array of
  * ((h mod p) · a + b) mod p — the signature the LSH band join keys
  * on.
  *
  * Exists because the composable spelling evaluates the array once PER
  * PERMUTATION — 32 `array_min(transform(h0, ...))` trees re-walk the
  * ~52-element hash array 32 times per row (and the batch path paid a
  * full explode + 32-min groupBy SHUFFLE for the same numbers). One
  * compiled loop per row computes every minimum in a single walk, and
  * the signature becomes a per-row projection — no shuffle at any
  * scale. Output order matches the coefficient order; values are
  * bit-identical to the composable form (same pmod arithmetic) FOR
  * NON-EMPTY input — FunctionsSpec pins it, and the stored band
  * indexes built from either spelling agree bucket-for-bucket. An
  * EMPTY hash array yields all-Long.MaxValue sentinels where the
  * composable array_min would be NULL: every caller must guard
  * (DedupPairing's `size(sh) > 0` discipline), because identical
  * all-sentinel signatures would put every empty row in one LSH
  * bucket — an O(m²) hot-bucket blow-up (round-10 review made this
  * caller contract explicit). The constructor rejects primes above
  * 2³¹: `h0 * a` stays under 2⁶³ only for 31-bit primes, and a
  * larger (e.g. 61-bit Mersenne) prime would wrap negative under the
  * plain `%` here, silently diverging from the pmod spelling.
  *
  * [[CodegenFallback]] by the [[ShingleHashes]] argument: one compiled
  * JVM call per row running a tight primitive loop beats per-element
  * interpreted expression trees; the loop itself would not codegen
  * better.
  */
case class MinHashSig(child: Expression, coefs: Seq[(Long, Long)],
    prime: Long) extends UnaryExpression with CodegenFallback {

  require(prime > 0 && prime <= (1L << 31),
    s"minhash prime must be a positive 31-bit value (got $prime): " +
      "h0 * a overflows Long past that and plain % goes negative, " +
      "diverging from the pmod spelling")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects ARRAY<LONG>, got ${other.simpleString}")
  }

  @transient private lazy val as: Array[Long] = coefs.map(_._1).toArray
  @transient private lazy val bs: Array[Long] = coefs.map(_._2).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData].toLongArray()
    val n = as.length
    val mins = Array.fill(n)(Long.MaxValue)
    var i = 0
    while (i < arr.length) {
      val h0 = ((arr(i) % prime) + prime) % prime
      var k = 0
      while (k < n) {
        val v = (h0 * as(k) + bs(k)) % prime
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashFunctions {
  /** Column API: the full MinHash signature (one min per permutation)
    * of an ARRAY<LONG> hash column, in one pass. */
  def minhash_sig(hashes: Column, coefs: Seq[(Long, Long)],
      prime: Long): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hashes),
      coefs, prime))
}
