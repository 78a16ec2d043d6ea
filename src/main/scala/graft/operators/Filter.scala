package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector `filter` transform.
  *
  * Reference: src/transforms/filter.rs:88-97 — keep events matching the
  * condition; dropped events are counted via the standardized
  * FilterEventsDropped internal event (filter.rs:94).
  *
  * Spark-first: `df.filter` (codegen, pushdown-eligible); the internal
  * telemetry analog is `observe()` — a zero-cost accumulator-backed
  * metric visible to QueryExecutionListener, no extra pass over the data.
  */
object Filter {
  /** Keep rows matching `cond`; attach an observed drop/keep count
    * (metrics appear under `name` in QueryExecution.observedMetrics).
    */
  def apply(df: DataFrame, cond: Column, name: String = "filter"): DataFrame =
    df.observe(name,
        sum(when(cond, 0L).otherwise(1L)).as("events_dropped"),
        count(lit(1)).as("events_in"))
      .filter(cond)
}
