package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.plans.Pipeline

/** Structured Streaming forms of the stateful transforms — Vector's
  * `Task` transform class (lib/vector-core/src/transform/mod.rs:33-36:
  * aggregate, reduce, dedupe, throttle run as stream→stream tasks).
  *
  * The batch pipeline's narrow stages (parse/enrich/route) are already
  * streaming-safe: the SAME Pipeline.buildFrom code runs over a
  * readStream frame. This module adds the genuinely stateful pieces:
  *
  *  - windowed aggregates with watermark (reference `aggregate`
  *    interval flush, src/transforms/aggregate.rs:333-335 — event-time
  *    window + watermark is the deterministic distributed analog);
  *  - streaming dedupe within a watermark (reference dedupe LRU cache,
  *    src/transforms/dedupe/ — the watermark bounds state like the LRU
  *    bound does);
  *  - token-bucket throttle via flatMapGroupsWithState (reference
  *    src/transforms/throttle/transform.rs:22-53, governor quota per
  *    key — here refilled in event-time);
  *  - session reduce via flatMapGroupsWithState (reference `reduce`
  *    ends_when/max_events/expire_after cut rules,
  *    src/transforms/reduce/transform.rs:264-310).
  *
  * State stores are per-key (shuffled on the group key), so state size
  * scales with key cardinality, not event count — the property that
  * lets these run on unbounded streams at cluster scale.
  */
// Serializable: recursive local defs inside the stateful closures
// compile to methods on this object, so the closures capture it
object StreamOps extends Serializable {

  /** The north-star pipeline over a streaming transcript frame:
    * parse → enrich → route (all narrow — shared code with batch), then
    * watermarked windowed counts per (port, role).
    */
  def pipeline(spark: SparkSession, stream: DataFrame,
               watermark: String = "1 hour"): DataFrame = {
    val st = Pipeline.buildFrom(spark, stream)
    st.routed
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), s"${Pipeline.WindowSecs} seconds"),
        col("port"), col("role"))
      .agg(count(lit(1)).as("n_turns"),
        sum(col("latency_ms")).as("sum_latency"))
  }

  /** Streaming dedupe: exact within the watermark horizon (bounded
    * state; the batch/LRU divergence note lives in operators.Dedupe).
    */
  def dedupe(df: DataFrame, cols: Seq[String], tsCol: String,
             watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(cols)

  // ---- throttle ------------------------------------------------------

  /** Keyed event with an event-time second — the throttle input shape. */
  final case class Keyed(key: String, epochSec: Long, payload: String)
  /** Token bucket state: tokens used per event-time window. */
  final case class Bucket(used: Map[Long, Long])

  /** Token-bucket throttle: at most `threshold` events per key per
    * `windowSecs` (event-time tumbling refill — deterministic analog of
    * the reference's wall-clock quota). Emits kept events (append mode).
    *
    * State holds a per-WINDOW counter map, not just the newest window:
    * with a single counter, a late event from an earlier window would be
    * charged against the newest window's budget. Per-window counters
    * make the per-window KEPT COUNT equal to the batch operator
    * regardless of arrival order; WHICH events fill a window's quota
    * still follows arrival order across micro-batches (a late early-ts
    * event finds its window already full where the batch operator,
    * sorting by event time, would have kept it) — the same
    * arrival-order semantics as the reference's wall-clock token
    * bucket. State is bounded to the newest `retainWindows` windows per
    * key; an event later than that horizon sees a fresh counter (the
    * permissive direction — the reference's wall-clock bucket would
    * also have refilled by then).
    */
  def throttle(ds: Dataset[Keyed], threshold: Int, windowSecs: Long,
               retainWindows: Int = 64)(
      implicit ek: Encoder[Keyed], eb: Encoder[Bucket]): Dataset[Keyed] = {
    ds.groupByKey(_.key)(org.apache.spark.sql.Encoders.STRING)
      .flatMapGroupsWithState[Bucket, Keyed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, events: Iterator[Keyed], state: GroupState[Bucket]) =>
          // order within the batch for determinism
          val sorted = events.toSeq.sortBy(e => (e.epochSec, e.payload))
          var used = state.getOption.map(_.used).getOrElse(Map.empty[Long, Long])
          val kept = Seq.newBuilder[Keyed]
          sorted.foreach { e =>
            val win = math.floorDiv(e.epochSec, windowSecs) * windowSecs
            val u = used.getOrElse(win, 0L)
            if (u < threshold) {
              used += (win -> (u + 1L))
              kept += e
            }
          }
          if (used.size > retainWindows)
            used = used.toSeq.sortBy(-_._1).take(retainWindows).toMap
          state.update(Bucket(used))
          kept.result().iterator
      }
  }

  // ---- session reduce ------------------------------------------------

  final case class SessionEvent(key: String, seq: Long, endsWhen: Boolean,
                                text: String)
  /** `startMs` is the open session's creation wall-clock (0 when no
    * session is open) — the reference's `ReduceState.creation`, the
    * clock `end_every_period_ms` ages against. `lastMs` is the last
    * arrival (the reference's `stale_since`), the clock
    * `expire_after_ms` ages against. */
  final case class SessionState(sessionId: Long, n: Long, buffer: Seq[String],
                                startMs: Long = 0L, lastMs: Long = 0L)
  final case class SessionOut(key: String, sessionId: Long, n: Long,
                              merged: String)

  /** Reduce with ends_when/max_events cut rules: buffer per key; a row
    * with endsWhen=true (or hitting maxEvents) closes the session
    * INCLUDING that row (reference reduce/transform.rs:223) and emits
    * the merged result. Open sessions are held in state across batches.
    *
    * `expireAfterMs` is the reference's `expire_after_ms` inactivity
    * flush (reduce/config.rs:109-111, default 30 s): when set, a key
    * with no new events for that long has its OPEN session flushed as-is
    * and its state dropped — guaranteed-delivery for sessions whose
    * closing event never arrives. Wall-clock (`ProcessingTimeTimeout`)
    * exactly like the reference's `flush_into` tick; the check fires on
    * the next micro-batch after expiry (the analog of `flush_period_ms`
    * is the trigger interval).
    */
  def sessionReduce(ds: Dataset[SessionEvent], maxEvents: Int,
                    expireAfterMs: Option[Long] = None,
                    endEveryMs: Option[Long] = None)(
      implicit eo: Encoder[SessionOut], es: Encoder[SessionState]): Dataset[SessionOut] = {
    val timeoutConf =
      if (expireAfterMs.isDefined || endEveryMs.isDefined)
        GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(_.key)(org.apache.spark.sql.Encoders.STRING)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, timeoutConf) {
        (key: String, events: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          def flushOpen(st: SessionState): (Option[SessionOut], SessionState) =
            if (st.n > 0)
              (Some(SessionOut(key, st.sessionId, st.n, st.buffer.mkString("\n"))),
                SessionState(st.sessionId + 1, 0L, Vector.empty))
            else (None, st)
          // the next timer for an OPEN session: the sooner of the
          // inactivity expiry (expire_after_ms ages against the LAST
          // event — reference stale_since) and the session-age cap
          // (end_every_period_ms ages against session CREATION —
          // reference ReduceState.creation; reduce/transform.rs:223-236
          // checks both on every flush tick).
          def armTimer(st: SessionState, now: Long): Unit = if (st.n > 0) {
            val candidates = expireAfterMs.toSeq ++
              endEveryMs.map(p => math.max(1L, st.startMs + p - now))
            if (candidates.nonEmpty) state.setTimeoutDuration(candidates.min)
          }
          if (state.hasTimedOut) {
            // timed flush (inactivity or session age): emit the open
            // session (if any) unchanged. The state KEEPS the advanced
            // sessionId counter — removing it would restart numbering
            // at 0 on the key's next event and mint duplicate
            // (key, sessionId) pairs. Same empty-buffer-no-timer shape
            // as the normal close path.
            val (flushed, st) = flushOpen(state.get)
            state.update(st)
            flushed.iterator
          } else {
            val now = state.getCurrentProcessingTimeMs()
            val sorted = events.toSeq.sortBy(_.seq)
            var st = state.getOption.getOrElse(SessionState(0L, 0L, Vector.empty))
            val out = Seq.newBuilder[SessionOut]
            // a session already past a deadline flushes BEFORE the new
            // arrivals (the reference's tick would have closed it
            // between batches). BOTH clocks: end-every ages against
            // creation, expire-after against the last arrival — and a
            // same-batch arrival suppresses hasTimedOut, so the timer
            // alone cannot cover this case.
            val overdue =
              (st.n > 0) && (
                endEveryMs.exists(p => now - st.startMs >= p) ||
                expireAfterMs.exists(p => now - st.lastMs >= p))
            if (overdue) {
              val (flushed, st2) = flushOpen(st)
              out ++= flushed; st = st2
            }
            sorted.foreach { e =>
              val buf = st.buffer :+ e.text
              val n = st.n + 1
              if (e.endsWhen || n >= maxEvents) {
                out += SessionOut(key, st.sessionId, n, buf.mkString("\n"))
                st = SessionState(st.sessionId + 1, 0L, Vector.empty)
              } else {
                st = st.copy(n = n, buffer = buf, lastMs = now,
                  startMs = if (st.n == 0L) now else st.startMs)
              }
            }
            // sessionId must survive even when the buffer is empty (it
            // numbers the NEXT session), but an empty buffer needs no
            // timer — nothing would flush.
            state.update(st)
            armTimer(st, now)
            out.result().iterator
          }
      }
  }

  // ---- line_agg (streaming) ------------------------------------------

  final case class Line(key: String, lineNo: Long, line: String)
  final case class LineAggState(firstLineNo: Long, n: Long, buffer: Seq[String])
  final case class MergedRecord(key: String, firstLineNo: Long, nLines: Long,
                                text: String)

  /** Streaming multiline merge — the reference's per-stream line_agg
    * state machine (`src/line_agg.rs:24-69`), EXACT semantics shared
    * with the batch form via `LineAgg.decide`: all four modes, plus
    * `startPattern` gating which lines may OPEN a buffer (a
    * non-matching line with no buffer open passes through as its own
    * record, line_agg.rs:353-366; the default `""` matches every line
    * — the original ContinueThrough behavior). EndExclude boundary
    * lines are re-handled against the empty state (the stash,
    * line_agg.rs:169-181). Open records persist in state across
    * micro-batches. The reference's flush `timeout` ("once this
    * timeout is reached, the buffered message is guaranteed to be
    * flushed, even if incomplete", line_agg.rs:68-69 +
    * DelayQueue:126-136) maps to `timeoutMs` here: a key idle that long
    * has its open record emitted incomplete and its state dropped
    * (`ProcessingTimeTimeout`, fires on the next micro-batch after
    * expiry). `None` keeps records open indefinitely (deterministic for
    * specs). Batch equivalent: `operators/LineAgg.mergeWithStart`.
    */
  def lineAgg(ds: Dataset[Line], conditionPattern: String,
              timeoutMs: Option[Long] = None,
              mode: graft.operators.LineAgg.Mode = graft.operators.LineAgg.ContinueThrough,
              startPattern: String = "")(
      implicit em: Encoder[MergedRecord], es: Encoder[LineAggState]): Dataset[MergedRecord] = {
    import graft.operators.LineAgg.{decide, Continue, EndInclude, EndExclude}
    // scala Regex (serializable), not java Pattern (not serializable)
    val condP = conditionPattern.r
    val startP = startPattern.r
    val m = mode
    val timeoutConf = if (timeoutMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    ds.groupByKey(_.key)(org.apache.spark.sql.Encoders.STRING)
      .flatMapGroupsWithState[LineAggState, MergedRecord](
        OutputMode.Append, timeoutConf) {
        (key: String, lines: Iterator[Line], state: GroupState[LineAggState]) =>
          def merged(st: LineAggState) =
            MergedRecord(key, st.firstLineNo, st.n, st.buffer.mkString("\n"))
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(merged(st))
          } else {
            val sorted = lines.toSeq.sortBy(_.lineNo)
            var st = state.getOption.orNull
            val out = Seq.newBuilder[MergedRecord]
            def handle(l: Line): Unit =
              if (st == null) {
                if (startP.findFirstIn(l.line).isDefined)
                  st = LineAggState(l.lineNo, 1L, Vector(l.line))
                else out += MergedRecord(key, l.lineNo, 1L, l.line)
              } else decide(m, condP.findFirstIn(l.line).isDefined) match {
                case Continue =>
                  st = st.copy(n = st.n + 1, buffer = st.buffer :+ l.line)
                case EndInclude =>
                  out += merged(st.copy(n = st.n + 1, buffer = st.buffer :+ l.line))
                  st = null
                case EndExclude =>
                  out += merged(st); st = null; handle(l)
              }
            sorted.foreach(handle)
            if (st == null) state.remove()
            else { state.update(st); timeoutMs.foreach(state.setTimeoutDuration) }
            out.result().iterator
          }
      }
  }

  /** Built-in session windows (gap-based session semantics — the
    * reference's expire_after_ms inactivity flush,
    * reduce/config.rs:109-115) — for when the cut rule is inactivity,
    * Spark's native session_window needs no custom state at all.
    */
  def sessionWindowCounts(df: DataFrame, key: Column, tsCol: String,
                          gap: String, watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), key)
      .agg(count(lit(1)).as("n"))
}
