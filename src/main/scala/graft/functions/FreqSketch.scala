package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.collection.mutable

/** Mergeable Misra-Gries heavy-hitters summary (the "frequent items"
  * companion to the quantile digest and HLL++): at most `k` counters per
  * group, associative merge (Agarwal et al., Mergeable Summaries), and
  * the classic guarantees over a stream of n items:
  *   - every item with true frequency > n/(k+1) is present;
  *   - each reported estimate underestimates the true count by at most
  *     the tracked `maxErr`: for a single un-merged summary that is
  *     ≤ n/(k+1), but merge() is additive (both inputs' maxErr plus any
  *     post-merge shrink), so a merged summary's bound can exceed
  *     n/(k+1) — FreqSketchSpec pins the looser additive limit.
  * When the number of distinct items is ≤ k the summary never decrements
  * and the counts are EXACT — which makes the registry entry over a
  * low-cardinality column oracle-checkable while the spec exercises the
  * lossy path on synthetic skew.
  *
  * Exact top-k by count needs a full groupBy of every distinct key; this
  * holds O(k) state per group regardless of cardinality — the 100 TB /
  * streaming-state form.
  */
final case class FreqSummary(k: Int) {
  val counts = mutable.HashMap.empty[String, Long]
  var n: Long = 0L
  var maxErr: Long = 0L // upper bound on undercount of any estimate

  def add(item: String, w: Long = 1L): Unit = {
    n += w
    counts.update(item, counts.getOrElse(item, 0L) + w)
    if (counts.size > k) shrink()
  }

  def merge(other: FreqSummary): Unit = {
    other.counts.foreach { case (item, c) =>
      counts.update(item, counts.getOrElse(item, 0L) + c)
    }
    n += other.n
    maxErr += other.maxErr
    if (counts.size > k) shrink()
  }

  /** Subtract the (k+1)-th largest count from every counter and drop the
    * non-positive ones — the batch form of the MG decrement. */
  private def shrink(): Unit = {
    val vs = counts.values.toArray
    java.util.Arrays.sort(vs)
    val sub = vs(vs.length - k - 1) // (k+1)-th largest
    maxErr += sub
    val dead = counts.collect { case (i, c) if c <= sub => i }
    dead.foreach(counts.remove)
    counts.mapValuesInPlace((_, c) => c - sub)
  }

  /** Top-m items by estimate, ties broken by item — deterministic for a
    * given summary state. */
  def top(m: Int): Seq[(String, Long)] =
    counts.toSeq.sortBy { case (item, c) => (-c, item) }.take(m)
}

/** freq_sketch(child, k, topM) → ARRAY<STRUCT<item, est, err_bound>>. */
case class FreqSketchAgg(
    child: Expression,
    k: Int = 64,
    topM: Int = 10,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSummary] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = FreqSketchAgg.resultType

  override def createAggregationBuffer(): FreqSummary = FreqSummary(k)

  // the Catalyst-internal toString of a non-string child (DateType
  // day-ints, timestamp micros) silently reported internal values as
  // "items" (round-10 review) — reject at analysis
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"freq_sketch expects STRING, got ${other.simpleString}" +
              " (cast the column first)")
    }

  override def update(buf: FreqSummary, input: InternalRow): FreqSummary = {
    val v = child.eval(input)
    if (v != null) buf.add(v.toString)
    buf
  }

  override def merge(buf: FreqSummary, other: FreqSummary): FreqSummary = {
    buf.merge(other); buf
  }

  override def eval(buf: FreqSummary): Any =
    new GenericArrayData(buf.top(topM).map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est, buf.maxErr)
    }.toArray[Any])

  override def serialize(buf: FreqSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k); out.writeLong(buf.n); out.writeLong(buf.maxErr)
    out.writeInt(buf.counts.size)
    // length-prefixed bytes, not writeUTF: items are arbitrary column
    // values and writeUTF throws past 64 KiB of encoded text
    buf.counts.foreach { case (i, c) =>
      val bs = i.getBytes("UTF-8")
      out.writeInt(bs.length); out.write(bs); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = FreqSummary(in.readInt())
    s.n = in.readLong(); s.maxErr = in.readLong()
    val m = in.readInt()
    var i = 0
    while (i < m) {
      val len = in.readInt()
      val bs = new Array[Byte](len)
      in.readFully(bs)
      s.counts.update(new String(bs, "UTF-8"), in.readLong())
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

object FreqSketchAgg {
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("est", LongType),
    StructField("err_bound", LongType))))
}

object FreqSketch {
  /** Column API: mergeable heavy-hitters top-`topM` of a string column. */
  def freq_sketch(c: Column, k: Int = 64, topM: Int = 10): Column =
    ColumnBridge.column(
      FreqSketchAgg(ColumnBridge.expression(c), k, topM)
        .toAggregateExpression())
}
