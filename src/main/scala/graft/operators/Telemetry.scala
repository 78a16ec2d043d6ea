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
}
