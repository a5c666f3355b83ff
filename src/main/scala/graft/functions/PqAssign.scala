package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Product-quantization codebook assignment as compiled JVM loops —
  * the round-9 ScrubReport treatment applied to the PQ family's hot
  * path. The composable spelling argmin'd each (vector, subspace)
  * through `filter`/`transform`/`zip_with`/`aggregate` higher-order
  * functions, which are CodegenFallback and run INTERPRETED: measured
  * ~400 µs per vector for a 6-byte encode (st16 at the ×10 blow-up),
  * ~100× the arithmetic's real cost. The codebooks ship as a Spark
  * BROADCAST captured by the expression (512 entries ≈ 32 KB; never a
  * column, so no per-row payload copies), grouped per subspace and
  * sorted by code id once per executor.
  *
  * Semantics are BIT-IDENTICAL to the composable form (PqSpec /
  * the v18 oracles pin it end to end in DuckDB HUGEINT): integer
  * micro-unit squared L2, argmin with ties to the LOWEST code id
  * (the `array_min(struct(d, cid))` lexicographic rule — iterating
  * cids ascending with a strict `<` keeps the first minimum). */
private[functions] object PqCodebooks {
  /** (per-sub sorted-by-cid candidate arrays) from the broadcast
    * (sub, cid, cm) triples. */
  def bySub(cb: Array[(Int, Long, Array[Long])],
      m: Int): Array[Array[(Long, Array[Long])]] = {
    val out = Array.fill(m)(Array.empty[(Long, Array[Long])])
    cb.groupBy(_._1).foreach { case (s, entries) =>
      if (s >= 0 && s < m)
        out(s) = entries.sortBy(_._2).map(e => (e._2, e._3))
    }
    out
  }

  def sqDist(xm: Array[Long], off: Int, cm: Array[Long]): Long = {
    var d = 0L
    var i = 0
    while (i < cm.length) {
      val diff = xm(off + i) - cm(i)
      d += diff * diff
      i += 1
    }
    d
  }

  /** argmin (d, cid) over one subspace's candidates; null when the
    * subspace has no codebook entries (matches array_min(empty)). */
  def argmin(xm: Array[Long], off: Int,
      cands: Array[(Long, Array[Long])]): (Long, Long) = {
    if (cands.isEmpty) return null
    var bestD = Long.MaxValue
    var bestC = -1L
    var i = 0
    while (i < cands.length) {
      val d = sqDist(xm, off, cands(i)._2)
      if (d < bestD) { bestD = d; bestC = cands(i)._1 }
      i += 1
    }
    (bestD, bestC)
  }
}

/** struct(d, cid): the nearest codebook entry of ONE (vector-slice,
  * subspace) row — the training/encode inner loop. */
case class PqAssign(xm: Expression, sub: Expression,
    codebooks: Broadcast[Array[(Int, Long, Array[Long])]], m: Int)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = xm
  override def right: Expression = sub

  override def dataType: DataType = StructType(Seq(
    StructField("d", LongType, nullable = false),
    StructField("cid", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (xm.dataType, sub.dataType) match {
      case (ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_assign expects (ARRAY<LONG>, INT), got $other")
    }

  @transient private lazy val bySub = PqCodebooks.bySub(codebooks.value, m)

  override def nullSafeEval(xmAny: Any, subAny: Any): Any = {
    val arr = xmAny.asInstanceOf[ArrayData].toLongArray()
    val s = subAny.asInstanceOf[Int]
    if (s < 0 || s >= m) return null
    val best = PqCodebooks.argmin(arr, 0, bySub(s))
    if (best == null) null else InternalRow(best._1, best._2)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(xm = newLeft, sub = newRight)
}

/** array of all M sub-codes of a full micro-vector — the stateless
  * in-row encode (st16 / the stored code table). */
case class PqCodes(xm64: Expression,
    codebooks: Broadcast[Array[(Int, Long, Array[Long])]], m: Int,
    subDims: Int) extends UnaryExpression with CodegenFallback {

  override def child: Expression = xm64

  override def dataType: DataType =
    ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult =
    xm64.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_codes expects ARRAY<LONG>, got ${other.simpleString}")
    }

  @transient private lazy val bySub = PqCodebooks.bySub(codebooks.value, m)

  override def nullSafeEval(xmAny: Any): Any = {
    val arr = xmAny.asInstanceOf[ArrayData].toLongArray()
    val codes = new Array[Any](m)
    var s = 0
    while (s < m) {
      val best = PqCodebooks.argmin(arr, s * subDims, bySub(s))
      codes(s) = if (best == null) null else best._2
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(xm64 = newChild)
}

/** The whole per-query serve-side prep of st21/st21b in one compiled
  * pass: coarse route (the `ncell` nearest cells by integer micro-L2,
  * ties to the lower cell id — the array_sort(struct(d, cid)) rule)
  * and the full ADC lookup table (every (sub, cid) squared
  * sub-distance), already crossed to the exploded
  * (cell, sub, cid, ld) rows the stream-static code join consumes.
  * The composable spelling ran ~34 ms per query interpreted — the
  * serving path's per-request cost. */
case class PqRouteLut(xm64: Expression,
    coarse: Broadcast[Array[(Long, Array[Long])]],
    codebooks: Broadcast[Array[(Int, Long, Array[Long])]],
    ncell: Int, subDims: Int)
    extends UnaryExpression with CodegenFallback {

  override def child: Expression = xm64

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cell", LongType, nullable = false),
    StructField("sub", IntegerType, nullable = false),
    StructField("cid", LongType, nullable = false),
    StructField("ld", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    xm64.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_route_lut expects ARRAY<LONG>, got ${other.simpleString}")
    }

  @transient private lazy val sortedCb: Array[(Int, Long, Array[Long])] =
    codebooks.value.sortBy(e => (e._1, e._2))

  override def nullSafeEval(xmAny: Any): Any = {
    val arr = xmAny.asInstanceOf[ArrayData].toLongArray()
    // route: ncell lowest (d, cid)
    val cells = coarse.value
      .map { case (cid, cm) => (PqCodebooks.sqDist(arr, 0, cm), cid) }
      .sorted
      .take(ncell)
      .map(_._2)
    // LUT in (sub, cid) order, each against its own slice of the query
    val cb = sortedCb
    val out = new Array[Any](cells.length * cb.length)
    var o = 0
    var i = 0
    while (i < cells.length) {
      var j = 0
      while (j < cb.length) {
        val e = cb(j)
        out(o) = InternalRow(cells(i), e._1, e._2,
          PqCodebooks.sqDist(arr, e._1 * subDims, e._3))
        o += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(xm64 = newChild)
}

/** array of the `n` nearest candidates of ONE (vector, candidate-list)
  * row, ascending (d, cid) with ties to the LOWEST cid — the
  * `array_sort(struct(d, cid))[0..n]` rule compiled. The group-layer
  * router of the hierarchical coarse assignment (micro/L2 space): the
  * `sub` child selects which candidate list of the broadcast to rank
  * against (the [[PqAssign]] convention — offset 0, full-width
  * vectors), so one broadcast can carry per-group centroid lists and
  * the probe stays a pure in-row expression. n is small (2-3 probes),
  * so selection is one insertion pass, not a sort. */
case class PqAssignTop(xm: Expression, sub: Expression,
    codebooks: Broadcast[Array[(Int, Long, Array[Long])]], m: Int,
    n: Int) extends BinaryExpression with CodegenFallback {

  override def left: Expression = xm
  override def right: Expression = sub

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d", LongType, nullable = false),
    StructField("cid", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (xm.dataType, sub.dataType) match {
      case (ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_assign_top expects (ARRAY<LONG>, INT), got $other")
    }

  @transient private lazy val bySub = PqCodebooks.bySub(codebooks.value, m)

  override def nullSafeEval(xmAny: Any, subAny: Any): Any = {
    val arr = xmAny.asInstanceOf[ArrayData].toLongArray()
    val s = subAny.asInstanceOf[Int]
    if (s < 0 || s >= m) return null
    val cands = bySub(s)
    val keep = math.min(n, cands.length)
    if (keep == 0) return new GenericArrayData(Array.empty[Any])
    // bounded insertion into (dTop, cTop), ascending (d, cid): cands
    // iterate cids ascending, so a strict < on d preserves the
    // lowest-cid tie rule at every slot
    val dTop = Array.fill(keep)(Long.MaxValue)
    val cTop = Array.fill(keep)(Long.MaxValue)
    var i = 0
    while (i < cands.length) {
      val d = PqCodebooks.sqDist(arr, 0, cands(i)._2)
      if (d < dTop(keep - 1)) {
        var j = keep - 1
        while (j > 0 && d < dTop(j - 1)) {
          dTop(j) = dTop(j - 1); cTop(j) = cTop(j - 1); j -= 1
        }
        dTop(j) = d; cTop(j) = cands(i)._1
      }
      i += 1
    }
    val out = new Array[Any](keep)
    var o = 0
    while (o < keep) { out(o) = InternalRow(dTop(o), cTop(o)); o += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(xm = newLeft, sub = newRight)
}

object PqFunctions {
  def pq_assign(xm: Column, sub: Column,
      codebooks: Broadcast[Array[(Int, Long, Array[Long])]],
      m: Int): Column =
    ColumnBridge.column(PqAssign(ColumnBridge.expression(xm),
      ColumnBridge.expression(sub), codebooks, m))

  def pq_assign_top(xm: Column, sub: Column,
      codebooks: Broadcast[Array[(Int, Long, Array[Long])]],
      m: Int, n: Int): Column =
    ColumnBridge.column(PqAssignTop(ColumnBridge.expression(xm),
      ColumnBridge.expression(sub), codebooks, m, n))

  def pq_route_lut(xm64: Column,
      coarse: Broadcast[Array[(Long, Array[Long])]],
      codebooks: Broadcast[Array[(Int, Long, Array[Long])]],
      ncell: Int, subDims: Int): Column =
    ColumnBridge.column(PqRouteLut(ColumnBridge.expression(xm64),
      coarse, codebooks, ncell, subDims))

  def pq_codes(xm64: Column,
      codebooks: Broadcast[Array[(Int, Long, Array[Long])]],
      m: Int, subDims: Int): Column =
    ColumnBridge.column(PqCodes(ColumnBridge.expression(xm64),
      codebooks, m, subDims))
}
