package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Standardized per-component telemetry — the reference's
  * `src/internal_events/` contract (every component emits
  * EventsReceived / EventsSent / *EventsDropped, asserted by
  * `assert_transform_compliance` in its unit tests) re-expressed as
  * `Dataset.observe` metrics: accumulator-backed, zero extra passes,
  * visible to `QueryExecutionListener` (batch) and
  * `StreamingQueryListener` (micro-batch) — the runtime faces Vector's
  * GraphQL tap reads from.
  *
  * Composes with any stage: `Telemetry.component(df, "parse")` after a
  * transform gives the received count plus caller-declared stage
  * metrics. The pipeline's sink-side counterpart is
  * `MultiSink.manifestFor` (per-partition lineage + metrics written
  * with the data); this is the in-flight view.
  */
object Telemetry {

  /** Observe `events_received` (and optional extra metrics) for a
    * component. Metric namespace mirrors the reference's
    * `component_events_received_total` naming.
    */
  def component(df: DataFrame, name: String,
                extra: Seq[Column] = Nil): DataFrame = {
    val all = count(lit(1)).as("events_received") +: extra
    df.observe(s"graft.$name", all.head, all.tail: _*)
  }

  /** Per-port sent counts for a routed (multicast) frame: one observed
    * metric per port, computed in the same pass.
    */
  def routedSent(routed: DataFrame, ports: Seq[String],
                 name: String = "route"): DataFrame = {
    val all = count(lit(1)).as("events_sent") +:
      ports.map(p =>
        sum(when(col("port") === p, 1L).otherwise(0L)).as(s"sent_$p"))
    routed.observe(s"graft.$name", all.head, all.tail: _*)
  }

  /** Process-wide running totals behind the `internal_metrics` config
    * source (reference src/sources/internal_metrics.rs: the running
    * topology's own counters re-enter as metric events). Counters
    * accumulate from two feeds: per-sink delivered counts recorded by
    * `Topology.writeSinks`, and every `Dataset.observe` metric named
    * `graft.<component>` once [[harvest]] is installed on the session.
    */
  object Registry {
    private val counters =
      new java.util.concurrent.ConcurrentHashMap[(String, String), Double]()

    def add(component: String, metric: String, n: Double): Unit = {
      counters.merge((component, metric), n, (a, b) => a + b); ()
    }

    /** (component, metric, running total), insertion-order-free. */
    def snapshot(): Seq[(String, String, Double)] =
      counters.entrySet().toArray(Array.empty[java.util.Map.Entry[(String, String), Double]])
        .map(e => (e.getKey._1, e.getKey._2, e.getValue)).toSeq
        .sortBy(t => (t._1, t._2))

    def reset(): Unit = counters.clear()

    @volatile private var installed = false
    /** Registers a QueryExecutionListener that feeds every observed
      * `graft.<component>` metric into the registry (idempotent).
      */
    def harvest(spark: org.apache.spark.sql.SparkSession): Unit = synchronized {
      if (!installed) {
        installed = true
        spark.listenerManager.register(
          new org.apache.spark.sql.util.QueryExecutionListener {
            override def onSuccess(funcName: String,
                                   qe: org.apache.spark.sql.execution.QueryExecution,
                                   durationNs: Long): Unit =
              qe.observedMetrics.foreach { case (mname, row) =>
                if (mname.startsWith("graft.")) {
                  val comp = mname.stripPrefix("graft.")
                  row.schema.fields.zipWithIndex.foreach { case (f, i) =>
                    row.get(i) match {
                      case n: Number => add(comp, f.name, n.doubleValue())
                      case _ => ()
                    }
                  }
                }
              }
            override def onFailure(funcName: String,
                                   qe: org.apache.spark.sql.execution.QueryExecution,
                                   exception: Exception): Unit = ()
          })
      }
    }
  }

  /** Process-wide buffer of the engine's own log events, behind the
    * `internal_logs` config source (reference
    * src/sources/internal_logs.rs: Vector subscribes to its own
    * tracing events and re-emits them as log events). Components call
    * [[Logs.record]] at the same points the reference's components
    * `info!`/`warn!` — sink deliveries, source loads, refusals — and
    * the source snapshots the buffer. Bounded ring (the reference's
    * TraceSubscription buffers early events and drops under
    * backpressure; a cap is the batch analog): oldest entries drop
    * past [[Logs.Cap]].
    */
  object Logs {
    final val Cap = 10000
    final case class Entry(ts: java.sql.Timestamp, level: String,
                           target: String, message: String)
    private val buf = new java.util.concurrent.ConcurrentLinkedDeque[Entry]()
    private val dropped = new java.util.concurrent.atomic.AtomicLong()

    def record(level: String, target: String, message: String): Unit = {
      buf.addLast(Entry(java.sql.Timestamp.from(java.time.Instant.now()),
        level, target, message))
      // approximate trim — concurrent size() is O(n) but n is capped
      while (buf.size() > Cap) { buf.pollFirst(); dropped.incrementAndGet(); () }
    }

    def snapshot(): Seq[Entry] =
      buf.toArray(Array.empty[Entry]).toSeq

    def droppedCount: Long = dropped.get()

    def reset(): Unit = { buf.clear(); dropped.set(0L) }
  }
}
