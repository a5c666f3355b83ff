package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import scala.collection.mutable.ArrayBuffer

/** Mergeable centroid-digest quantile sketch — the
  * TypedImperativeAggregate SURVEY §4/§7 reserves for streaming
  * percentiles (a t-digest-style cluster digest, simplified to uniform
  * centroid capacity). Exact `percentile` needs the full sorted value
  * set per group; this sketch holds <= `compression` centroids
  * (mean, weight), merges associatively across partitions/micro-batches,
  * and answers any quantile with linear interpolation between centroids.
  * Memory is O(compression) per group — at most ~2x compression
  * centroids after a compact (greedy packing fills centroids at least
  * half full) — regardless of input size: the property exact percentile
  * lacks at 100 TB / in streaming state.
  */
final case class CentroidDigest(compression: Int) {
  // unsorted centroid pool; compacted whenever it overgrows
  val means = new ArrayBuffer[Double]()
  val weights = new ArrayBuffer[Long]()
  var total: Long = 0L

  def add(v: Double, w: Long = 1L): Unit = {
    means += v; weights += w; total += w
    if (means.length > compression * 4) compact()
  }

  def addAll(other: CentroidDigest): Unit = {
    var i = 0
    while (i < other.means.length) {
      means += other.means(i); weights += other.weights(i); i += 1
    }
    total += other.total
    if (means.length > compression * 4) compact()
  }

  /** Sort by mean and greedily merge neighbours up to a uniform capacity
    * of ceil(total/compression) per centroid. */
  def compact(): Unit = {
    if (means.isEmpty) return
    val idx = means.indices.sortBy(means(_))
    val cap = math.max(1L, (total + compression - 1) / compression)
    val nm = new ArrayBuffer[Double](compression + 1)
    val nw = new ArrayBuffer[Long](compression + 1)
    var curMean = means(idx.head)
    var curW = weights(idx.head)
    idx.tail.foreach { i =>
      val (m, w) = (means(i), weights(i))
      if (curW + w <= cap) {
        // weighted mean of the merged centroid
        curMean = (curMean * curW + m * w) / (curW + w)
        curW += w
      } else {
        nm += curMean; nw += curW
        curMean = m; curW = w
      }
    }
    nm += curMean; nw += curW
    means.clear(); means ++= nm
    weights.clear(); weights ++= nw
  }

  /** Quantile estimate: walk cumulative weight, interpolate linearly
    * between neighbouring centroid means. */
  def quantile(q: Double): Double = {
    // out-of-range q (a typo like 95 for 0.95) previously returned the
    // min/max centroid as a plausible-looking number — fail loudly
    // like percentile_approx (round-10 review)
    require(q >= 0.0 && q <= 1.0, s"quantile q must be in [0,1]: $q")
    if (total == 0) return Double.NaN
    compact() // ensure sorted, bounded
    val idx = means.indices.sortBy(means(_))
    val target = q * (total - 1)
    var cum = 0.0
    var prevMean = means(idx.head)
    var prevCum = 0.0
    idx.foreach { i =>
      val w = weights(i).toDouble
      val center = cum + (w - 1) / 2.0
      if (center >= target) {
        val span = center - prevCum
        val frac = if (span <= 0) 0.0 else (target - prevCum) / span
        return prevMean + (means(i) - prevMean) * frac
      }
      prevMean = means(i); prevCum = cum + (w - 1) / 2.0
      cum += w
    }
    means(idx.last)
  }
}

/** percentile_sketch(child, q): mergeable approximate percentile. */
case class QuantileSketchAgg(
    child: Expression,
    q: Double,
    compression: Int = 128,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CentroidDigest] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): CentroidDigest =
    CentroidDigest(compression)

  // a non-Double child previously passed analysis and threw an opaque
  // executor-side ClassCastException (round-10 review)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"percentile_sketch expects DOUBLE, got ${other.simpleString}" +
              " (cast the column first)")
    }

  override def update(buf: CentroidDigest, input: InternalRow): CentroidDigest = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: CentroidDigest, other: CentroidDigest): CentroidDigest = {
    buf.addAll(other); buf
  }

  override def eval(buf: CentroidDigest): Any =
    if (buf.total == 0) null else buf.quantile(q)

  override def serialize(buf: CentroidDigest): Array[Byte] = {
    buf.compact()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.compression)
    out.writeLong(buf.total)
    out.writeInt(buf.means.length)
    var i = 0
    while (i < buf.means.length) {
      out.writeDouble(buf.means(i)); out.writeLong(buf.weights(i)); i += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CentroidDigest = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d = CentroidDigest(in.readInt())
    d.total = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) { d.means += in.readDouble(); d.weights += in.readLong(); i += 1 }
    d
  }

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

object QuantileSketch {
  /** Column API: mergeable approximate percentile of a double column. */
  def percentile_sketch(c: Column, q: Double,
      compression: Int = 128): Column =
    ColumnBridge.column(
      QuantileSketchAgg(ColumnBridge.expression(c), q, compression)
        .toAggregateExpression())
}
