package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Grok

/** The remap/parse stage with Vector's error-channel semantics.
  *
  * Reference: src/transforms/remap.rs:564-651 — on parse failure the
  * ORIGINAL (pre-transform) event is forwarded to the `dropped` port,
  * annotated with metadata.dropped.{reason, component_id, component_kind}
  * (remap.rs:494-553); the primary port carries only successfully
  * transformed events.
  *
  * Spark-first shape: the two ports are two PROJECTIONS of one scan —
  * a match predicate splits the frame; both sides stay inside
  * whole-stage codegen (regexp_extract / rlike are codegen'd), the parquet
  * scan is shared, and nothing is collected to the driver. At cluster
  * scale the split is a narrow transformation: no shuffle.
  */
object Parse {

  final case class Ports(primary: DataFrame, dropped: DataFrame)

  /** Parse `textCol` with a compiled grok pattern; typed post-projection
    * `typing` maps extracted string fields to typed columns.
    */
  def grok(
      df: DataFrame,
      textCol: Column,
      compiled: Grok.Compiled,
      componentId: String = "parse",
      typing: Map[String, Column => Column] = Map.empty): Ports = {
    val ok = compiled.matches(textCol)
    val extracted = compiled.columns(textCol).foldLeft(df.filter(ok)) {
      case (acc, (name, c)) =>
        val typedC = typing.get(name).map(f => f(c)).getOrElse(c)
        acc.withColumn(name, typedC)
    }
    val dropped = df.filter(!ok)
      .withColumn("dropped_reason", lit("source must match exactly one pattern"))
      .withColumn("dropped_component_id", lit(componentId))
      .withColumn("dropped_component_kind", lit("transform"))
    Ports(extracted, dropped)
  }
}
