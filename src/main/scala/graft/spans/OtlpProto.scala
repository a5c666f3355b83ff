package graft.spans

import java.util.Base64
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import scala.collection.mutable.ArrayBuffer

/** OTLP/protobuf ingestion (SURVEY §2.A A1, the `application/x-protobuf`
  * branch of the reference collector, collector/controller.go:46-53):
  * a dependency-free protobuf wire-format decoder for
  * `ExportTraceServiceRequest` (message/field layout per the public
  * opentelemetry-proto schema), producing the same denormalized span rows
  * as [[OtlpIngest.fromJson]], with the same attribute-stringification
  * rules (collector/service.go:184-237) and base64 ids
  * (collector/service.go:273-275).
  *
  * Decoding runs per-partition over a binary column (`mapPartitions`) —
  * the batch shape a Kafka `value: binary` stream feeds directly.
  */
object OtlpProto {

  // ---- minimal protobuf wire reader ----
  // Every read is bounds-checked against the reader's logical `end`, not
  // just the backing array: a submessage Reader must never consume its
  // parent's sibling bytes, and a truncated/corrupt request must raise a
  // descriptive error instead of silently mis-decoding into garbage rows
  // (this is the untrusted-input ingest path).
  final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasNext: Boolean = pos < end
    private def fail(what: String): Nothing =
      throw new IllegalArgumentException(
        s"malformed protobuf: $what at offset $pos (message end $end)")
    private def need(n: Int): Unit =
      if (n < 0 || pos + n > end) fail(s"need $n bytes past message bound")
    def varint(): Long = {
      var shift = 0; var result = 0L
      while (shift < 64) {
        if (pos >= end) fail("varint runs past message bound")
        val b = buf(pos); pos += 1
        result |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      fail("varint longer than 10 bytes")
    }
    /** varint length prefix, validated to fit in the remaining bytes. */
    private def lenPrefix(): Int = {
      val raw = varint()
      if (raw < 0 || raw > end - pos)
        fail(s"length $raw exceeds remaining ${end - pos} bytes")
      raw.toInt
    }
    def fixed64(): Long = {
      need(8)
      var r = 0L; var i = 0
      while (i < 8) { r |= (buf(pos + i) & 0xFFL) << (8 * i); i += 1 }
      pos += 8; r
    }
    def fixed32(): Int = {
      need(4)
      var r = 0; var i = 0
      while (i < 4) { r |= (buf(pos + i) & 0xFF) << (8 * i); i += 1 }
      pos += 4; r
    }
    def bytes(): Array[Byte] = {
      val len = lenPrefix()
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len; out
    }
    def sub(): Reader = {
      val len = lenPrefix()
      val r = new Reader(buf, pos, pos + len)
      pos += len; r
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => need(8); pos += 8
      case 2 =>
        // read the length FIRST: `pos += varint()` would capture the old
        // pos before varint() advances it, mis-skipping the field
        val len = lenPrefix()
        pos += len
      case 5 => need(4); pos += 4
      case w => fail(s"unknown wire type $w")
    }
    /** (fieldNumber, wireType) */
    def tag(): (Int, Int) = { val t = varint(); ((t >>> 3).toInt, (t & 7).toInt) }
  }

  // ---- OTLP model subset ----
  sealed trait PValue
  final case class PString(s: String) extends PValue
  final case class PBool(b: Boolean) extends PValue
  final case class PInt(i: Long) extends PValue
  final case class PDouble(d: Double) extends PValue
  final case class PArray(vs: Seq[PValue]) extends PValue
  final case class PKvList(kvs: Seq[(String, PValue)]) extends PValue
  final case class PBytes(bs: Array[Byte]) extends PValue

  private def readAnyValue(r: Reader): PValue = {
    // an AnyValue with NO recognized field set must surface as a NULL
    // attribute value, matching the JSON path's coalesce chain (the
    // previous PString("") default made element_at return "" on one
    // ingest path and NULL on the other, and diverged the
    // canonicalAttrs hash feeding resource_id — round-10 review)
    var v: PValue = null
    while (r.hasNext) {
      val (f, w) = r.tag()
      f match {
        case 1 => v = PString(new String(r.bytes(), "UTF-8"))
        case 2 => v = PBool(r.varint() != 0)
        case 3 => v = PInt(r.varint())
        case 4 => v = PDouble(java.lang.Double.longBitsToDouble(r.fixed64()))
        case 5 =>
          val sr = r.sub(); val vs = ArrayBuffer[PValue]()
          while (sr.hasNext) {
            val (ff, ww) = sr.tag()
            if (ff == 1) vs += readAnyValue(sr.sub()) else sr.skip(ww)
          }
          v = PArray(vs.toSeq)
        case 6 =>
          val sr = r.sub(); val kvs = ArrayBuffer[(String, PValue)]()
          while (sr.hasNext) {
            val (ff, ww) = sr.tag()
            if (ff == 1) kvs += readKeyValue(sr.sub()) else sr.skip(ww)
          }
          v = PKvList(kvs.toSeq)
        case 7 => v = PBytes(r.bytes())
        case _ => r.skip(w)
      }
    }
    v
  }

  private def readKeyValue(r: Reader): (String, PValue) = {
    var k = ""; var v: PValue = PString("")
    while (r.hasNext) {
      val (f, w) = r.tag()
      f match {
        case 1 => k = new String(r.bytes(), "UTF-8")
        case 2 => v = readAnyValue(r.sub())
        case _ => r.skip(w)
      }
    }
    (k, v)
  }

  // reference stringification rules (collector/service.go:184-237)
  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
  def stringify(v: PValue): String = v match {
    case null       => null
    case PString(s) => s
    case PBool(b)   => b.toString
    case PInt(i)    => i.toString
    case PDouble(d) => d.toString
    case PBytes(bs) => Base64.getEncoder.encodeToString(bs)
    // empty array joins to "" exactly like the JSON path (forall over
    // an empty array is true there, so it takes the comma-join branch)
    case PArray(vs) if vs.forall(_.isInstanceOf[PString]) =>
      vs.map(_.asInstanceOf[PString].s).mkString(",")
    case PArray(vs) =>
      vs.map(x => Option(stringify(x))
          .map(sx => s""""${jsonEscape(sx)}"""").getOrElse("null"))
        .mkString("[", ",", "]")
    case PKvList(kvs) =>
      kvs.map { case (k, x) =>
        s""""${jsonEscape(k)}":""" + Option(stringify(x))
          .map(sx => s""""${jsonEscape(sx)}"""").getOrElse("null")
      }.mkString("{", ",", "}")
  }

  final case class ProtoEvent(time_unix_nano: Long, name: String,
      attributes: Map[String, String])
  final case class ProtoSpanRow(trace_id: String, span_id: String,
      parent_span_id: String, flags: Int, name: String,
      start_time_unix_nano: Long, end_time_unix_nano: Long,
      duration_ns: Long, scope_name: String, resource_schema_url: String,
      resource_attributes: Map[String, String],
      span_attributes: Map[String, String], events: Seq[ProtoEvent])

  private def b64(bs: Array[Byte]): String =
    if (bs.isEmpty) "" else Base64.getEncoder.encodeToString(bs)

  private def readAttrs(r: Reader): (String, PValue) = readKeyValue(r)

  private def readEvent(r: Reader): ProtoEvent = {
    var t = 0L; var name = ""; val attrs = ArrayBuffer[(String, String)]()
    while (r.hasNext) {
      val (f, w) = r.tag()
      f match {
        case 1 => t = r.fixed64()
        case 2 => name = new String(r.bytes(), "UTF-8")
        case 3 =>
          val (k, v) = readAttrs(r.sub()); attrs += (k -> stringify(v))
        case _ => r.skip(w)
      }
    }
    ProtoEvent(t, name, attrs.toMap)
  }

  private def readSpan(r: Reader): ProtoSpanRow = {
    var traceId, spanId, parentId = Array.emptyByteArray
    var name = ""; var flags = 0
    var start = 0L; var end = 0L
    val attrs = ArrayBuffer[(String, String)]()
    val events = ArrayBuffer[ProtoEvent]()
    while (r.hasNext) {
      val (f, w) = r.tag()
      f match {
        case 1  => traceId = r.bytes()
        case 2  => spanId = r.bytes()
        case 4  => parentId = r.bytes()
        case 5  => name = new String(r.bytes(), "UTF-8")
        case 7  => start = r.fixed64()
        case 8  => end = r.fixed64()
        case 9  =>
          val (k, v) = readAttrs(r.sub()); attrs += (k -> stringify(v))
        case 11 => events += readEvent(r.sub())
        case 16 => flags = r.fixed32()
        case _  => r.skip(w)
      }
    }
    ProtoSpanRow(b64(traceId), b64(spanId), b64(parentId), flags, name,
      start, end, end - start, "", "", Map.empty, attrs.toMap, events.toSeq)
  }

  /** Decode one ExportTraceServiceRequest → flat span rows. */
  def decodeRequest(bytes: Array[Byte]): Seq[ProtoSpanRow] = {
    val out = ArrayBuffer[ProtoSpanRow]()
    val root = new Reader(bytes, 0, bytes.length)
    while (root.hasNext) {
      val (f, w) = root.tag()
      if (f != 1) { root.skip(w) }
      else {
        val rs = root.sub()
        var resAttrs = Map.empty[String, String]
        var schemaUrl = ""
        val scoped = ArrayBuffer[(String, Seq[ProtoSpanRow])]()
        while (rs.hasNext) {
          val (rf, rw) = rs.tag()
          rf match {
            case 1 =>
              val rr = rs.sub(); val as = ArrayBuffer[(String, String)]()
              while (rr.hasNext) {
                val (ff, ww) = rr.tag()
                if (ff == 1) {
                  val (k, v) = readAttrs(rr.sub()); as += (k -> stringify(v))
                } else rr.skip(ww)
              }
              resAttrs = as.toMap
            case 2 =>
              val sr = rs.sub()
              var scopeName = ""
              val spans = ArrayBuffer[ProtoSpanRow]()
              while (sr.hasNext) {
                val (sf, sw) = sr.tag()
                sf match {
                  case 1 =>
                    val scr = sr.sub()
                    while (scr.hasNext) {
                      val (cf, cw) = scr.tag()
                      if (cf == 1) scopeName = new String(scr.bytes(), "UTF-8")
                      else scr.skip(cw)
                    }
                  case 2 => spans += readSpan(sr.sub())
                  case _ => sr.skip(sw)
                }
              }
              scoped += (scopeName -> spans.toSeq)
            case 3 => schemaUrl = new String(rs.bytes(), "UTF-8")
            case _ => rs.skip(rw)
          }
        }
        scoped.foreach { case (scopeName, spans) =>
          spans.foreach { s =>
            out += s.copy(scope_name = scopeName,
              resource_schema_url = schemaUrl,
              resource_attributes = resAttrs)
          }
        }
      }
    }
    out.toSeq
  }

  /** Dataset of serialized requests → span DataFrame (SpanSchema column
    * order), decoded per partition.
    *
    * `lenient = true` (the STREAMING callers' mode) drops a message
    * that fails to decode instead of throwing: a corrupt payload in a
    * batch job should fail loudly, but in a streaming source the
    * failed micro-batch replays the same offsets on restart and
    * crashes forever — the poison-replay class the JSON path already
    * degrades around (from_json → nulls). Dropped messages are
    * counted in [[droppedMessages]] (per-executor, monitoring seam) —
    * a production deployment routes the raw bytes to a dead-letter
    * sink instead (round-10 review). */
  def fromProtobuf(requests: Dataset[Array[Byte]],
      lenient: Boolean = false): DataFrame = {
    val spark = requests.sparkSession
    import spark.implicits._
    requests.mapPartitions(_.flatMap { bytes =>
        if (!lenient) decodeRequest(bytes)
        else
          try decodeRequest(bytes)
          catch {
            case _: IllegalArgumentException =>
              droppedMessages.incrementAndGet()
              Seq.empty
          }
      })
      .toDF()
      .transform(OtlpIngest.withDerivedIds(_)) // same derivation as JSON path
      .select(SpanSchema.columns.map(col): _*)
  }

  /** Per-JVM count of lenient-mode messages dropped as undecodable. */
  val droppedMessages = new java.util.concurrent.atomic.AtomicLong(0)
}
