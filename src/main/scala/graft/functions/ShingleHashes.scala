package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct hashed 3-word shingles of a text column in ONE compiled pass:
  * split on spaces, FNV-1a-64 over each "w1 w2 w3" window (computed
  * incrementally over the word bytes — no intermediate shingle strings),
  * deduplicated into ARRAY<LONG>.
  *
  * Exists because the composable form
  * (`array_distinct(transform(sequence(...), i => concat_ws(...)))` then
  * another transform to hash) evaluates an interpreted expression tree
  * per element per row — measured as the dominant cost of the MinHash and
  * SimHash candidate paths. CodegenFallback is fine here: ONE compiled
  * JVM call per row doing a tight loop beats per-element interpretation;
  * the loop itself is not expressible as better codegen anyway.
  *
  * Texts with fewer than 3 words produce a single shingle over all words
  * (mirrors the DataFrame form's `greatest(n-2, 1)` window count).
  */
case class ShingleHashes(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects STRING, got ${other.simpleString}")
  }

  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  private def fnv(h0: Long, bytes: Array[Byte]): Long = {
    var h = h0
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * FnvPrime; i += 1 }
    h
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ")
    val n = words.length
    // encode each word ONCE: an interior word sits in up to 3 windows
    // and the per-window getBytes tripled allocations on the dedup
    // families' dominant per-row pass (round-10 review)
    val wordBytes = new Array[Array[Byte]](n)
    var w = 0
    while (w < n) {
      wordBytes(w) = words(w).getBytes("UTF-8"); w += 1
    }
    val nShingles = math.max(n - 2, 1)
    val seen = new java.util.HashSet[java.lang.Long](nShingles * 2)
    val out = new scala.collection.mutable.ArrayBuffer[Long](nShingles)
    var i = 0
    while (i < nShingles) {
      var h = FnvOffset
      var k = i
      val end = math.min(i + 3, n)
      while (k < end) {
        if (k > i) h = (h ^ ' '.toLong) * FnvPrime
        h = fnv(h, wordBytes(k))
        k += 1
      }
      if (seen.add(h)) out += h
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct 3-word shingle STRINGS in one compiled pass — same window
  * semantics as [[ShingleHashes]] but emitting the "w1 w2 w3" strings,
  * for the exact-Jaccard paths whose DuckDB oracle reproduces the string
  * shingles. */
case class ShingleStrings(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_strings expects STRING, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ")
    val n = words.length
    val nShingles = math.max(n - 2, 1)
    val seen = new java.util.LinkedHashSet[String](nShingles * 2)
    var i = 0
    while (i < nShingles) {
      val end = math.min(i + 3, n)
      seen.add(words.slice(i, end).mkString(" "))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleFunctions {
  /** Column API: distinct FNV-1a-64 hashes of the 3-word shingles. */
  def shingle_hashes(text: Column): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text)))

  /** Column API: distinct 3-word shingle strings. */
  def shingle_strings(text: Column): Column =
    ColumnBridge.column(ShingleStrings(ColumnBridge.expression(text)))
}
