package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-metadata stamping and envelope unwrapping.
  *
  *  - `withMetadata`: the aws_ec2_metadata transform's semantics
  *    (reference `src/transforms/aws_ec2_metadata.rs:98-120`) — stamp a
  *    slowly-changing single-row record (instance id, AZ, tags, ...)
  *    onto every event. The refresh loop lives outside the plan (the
  *    driver re-resolves the map and rebuilds the query); per-event
  *    work is literal columns — free under codegen. A multi-row
  *    variant is just `Enrich.lookup` with a one-key broadcast table.
  *  - `traceToLog`: the trace_to_log transform (reference
  *    `src/transforms/trace_to_log.rs`) — a TraceEvent is a LogEvent
  *    plus envelope fields; unwrapping is a projection that drops the
  *    envelope columns.
  */
object Stamp {

  def withMetadata(df: DataFrame, fields: Map[String, String]): DataFrame =
    fields.foldLeft(df) { case (d, (k, v)) => d.withColumn(k, lit(v)) }

  def traceToLog(df: DataFrame,
                 envelope: Seq[String] = Seq("trace_id", "span_id", "parent_span_id")): DataFrame =
    df.drop(envelope: _*)
}
