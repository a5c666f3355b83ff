package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming trace assembly — the custom-state Structured
  * Streaming piece (KeyValueGroupedDataset.flatMapGroupsWithState): spans
  * of one trace arrive across micro-batches; a trace is emitted once the
  * event-time watermark passes `gap` beyond its latest span (the
  * reference has no equivalent — its UI re-queries the store per trace;
  * SURVEY §1.5).
  *
  * State per key is one [[TraceBuffer]], bounded by the event-time
  * timeout — at 100 TB-rate ingest the state store holds only in-flight
  * traces, and the watermark is the backstop against trace-id leaks.
  * Event-time (not processing-time) timeouts keep the operator
  * deterministic and replayable.
  */
object TraceAssembler {
  final case class SpanEvent(trace_id: String, span_id: String,
      parent_span_id: String, name: String, scope_name: String,
      start_time_unix_nano: Long, duration_ns: Long)

  final case class TraceBuffer(spans: List[SpanEvent])

  final case class AssembledTrace(trace_id: String, n_spans: Int,
      root_name: String, services: Seq[String], start_ns: Long,
      total_duration_ns: Long)

  private def assemble(traceId: String, buf: TraceBuffer): AssembledTrace = {
    val spans = buf.spans.sortBy(s => (s.start_time_unix_nano, s.span_id))
    val root = spans.find(_.parent_span_id == "")
    val end = spans.map(s => s.start_time_unix_nano + s.duration_ns).max
    AssembledTrace(traceId, spans.length,
      root.map(_.name).getOrElse(""),
      spans.map(_.scope_name).distinct.sorted,
      spans.map(_.start_time_unix_nano).min,
      end - spans.map(_.start_time_unix_nano).min)
  }

  /** Flat-map spans grouped by trace_id into completed traces; a trace
    * completes when the watermark passes its latest span start + `gapMs`
    * (event time). `watermarkDelay` is the out-of-order tolerance. */
  def assembleTraces(spans: Dataset[SpanEvent], gapMs: Long = 30000,
      watermarkDelay: String = "1 second")
      (implicit spark: SparkSession): Dataset[AssembledTrace] = {
    import spark.implicits._
    val watermarked = spans
      .withColumn("event_ts",
        timestamp_micros(expr("start_time_unix_nano div 1000")))
      .withWatermark("event_ts", watermarkDelay)
      .as[SpanEvent]
    watermarked.groupByKey(_.trace_id)
      .flatMapGroupsWithState[TraceBuffer, AssembledTrace](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (traceId, newSpans, state: GroupState[TraceBuffer]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(assemble(traceId, _))
            state.remove()
            out.iterator
          } else {
            val buf = TraceBuffer(
              state.getOption.map(_.spans).getOrElse(Nil) ++ newSpans)
            state.update(buf)
            val lastMs = buf.spans.map(_.start_time_unix_nano).max / 1000000L
            // deadline must stay ahead of the current watermark
            val deadline = math.max(lastMs + gapMs,
              state.getCurrentWatermarkMs() + 1)
            state.setTimeoutTimestamp(deadline)
            Iterator.empty
          }
      }
  }

  final case class TraceStatus(trace_id: String, n_spans: Int,
      services: Seq[String], last_start_ns: Long)

  /** Live per-trace status via mapGroupsWithState (update mode): each
    * micro-batch emits the refreshed status of every trace that received
    * spans — the "open traces" monitoring view. Unlike
    * [[assembleTraces]] (append-on-completion), state here is a running
    * summary, not a span buffer: O(1) per trace.
    *
    * Timeout handling mirrors [[assembleTraces]]: when the watermark
    * passes `gapMs` beyond a trace's last span the state is REMOVED (the
    * final status is emitted once more as the closing update) — without
    * this the state store grows with every trace id ever seen. The
    * deadline is clamped to watermark+1 because `setTimeoutTimestamp`
    * throws if handed a timestamp at or before the current watermark
    * (reachable when a span arrives more than `gapMs` late but within
    * the watermark tolerance, or on the timed-out path itself where
    * last_start_ns is already behind the watermark). */
  def traceStatus(spans: Dataset[SpanEvent], gapMs: Long = 60000,
      watermarkDelay: String = "10 minutes")
      (implicit spark: SparkSession): Dataset[TraceStatus] = {
    import spark.implicits._
    val watermarked = spans
      .withColumn("event_ts",
        timestamp_micros(expr("start_time_unix_nano div 1000")))
      .withWatermark("event_ts", watermarkDelay)
      .as[SpanEvent]
    watermarked.groupByKey(_.trace_id)
      .mapGroupsWithState[TraceStatus, TraceStatus](
        GroupStateTimeout.EventTimeTimeout) {
        case (traceId, newSpans, state: GroupState[TraceStatus]) =>
          if (state.hasTimedOut) {
            val last = state.getOption
              .getOrElse(TraceStatus(traceId, 0, Seq.empty, 0L))
            state.remove()
            last
          } else {
            val prev = state.getOption
              .getOrElse(TraceStatus(traceId, 0, Seq.empty, 0L))
            val spansList = newSpans.toList
            val next = TraceStatus(traceId,
              prev.n_spans + spansList.length,
              (prev.services ++ spansList.map(_.scope_name)).distinct.sorted,
              math.max(prev.last_start_ns,
                spansList.map(_.start_time_unix_nano).maxOption.getOrElse(0L)))
            state.update(next)
            // expire once the watermark passes last span + gap; never set
            // a deadline at/behind the current watermark (throws)
            val deadline = math.max(next.last_start_ns / 1000000L + gapMs,
              state.getCurrentWatermarkMs() + 1)
            state.setTimeoutTimestamp(deadline)
            next
          }
      }
  }

  /** Batch twin (same assembly semantics, no state machinery) — used to
    * pin the streaming output in tests. */
  def assembleBatch(spans: Dataset[SpanEvent])
      (implicit spark: SparkSession): Dataset[AssembledTrace] = {
    import spark.implicits._
    spans.groupByKey(_.trace_id).mapGroups { (id, it) =>
      assemble(id, TraceBuffer(it.toList))
    }
  }
}
