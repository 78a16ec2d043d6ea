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
  * Spark-first shape: both ports FILTER one shared `tagged` frame
  * (raw columns + extracted columns + `__parse_ok`). The split is a
  * narrow transformation (codegen'd regex, no shuffle, nothing
  * collected), and because the ports are filters of the SAME parent,
  * persisting `tagged` at a fan-out point serves BOTH ports from one
  * scan + one regex pass — two independent plans would each re-scan
  * the input when the dropped channel is consumed.
  */
object Parse {

  /** `tagged` is the shared parent: persist IT (not the ports) when
    * both channels are consumed.
    */
  final case class Ports(primary: DataFrame, dropped: DataFrame,
                         tagged: DataFrame)

  private val OkCol = "__parse_ok"

  /** Parse `textCol` with a compiled grok pattern; typed post-projection
    * `typing` maps extracted string fields to typed columns.
    */
  def grok(
      df: DataFrame,
      textCol: Column,
      compiled: Grok.Compiled,
      componentId: String = "parse",
      typing: Map[String, Column => Column] = Map.empty): Ports = {
    val extractedNames = compiled.columns(textCol).map(_._1)
    val tagged = compiled.columns(textCol)
      .foldLeft(df.withColumn(OkCol, compiled.matches(textCol))) {
        case (acc, (name, c)) =>
          // extraction and typing run ONLY on matched rows (unmatched
          // extraction yields '' — an ANSI-mode cast abort); unmatched
          // rows carry null, and the dropped port drops the column
          val typedC = typing.get(name).map(f => f(c)).getOrElse(c)
          acc.withColumn(name, when(col(OkCol), typedC))
      }
    val primary = tagged.filter(col(OkCol)).drop(OkCol)
    // the dropped port forwards the ORIGINAL pre-transform event
    // (remap.rs:494-553): the (all-null) extracted columns are dropped
    val dropped = tagged.filter(!col(OkCol))
      .drop(OkCol +: extractedNames: _*)
      .withColumn("dropped_reason", lit("source must match exactly one pattern"))
      .withColumn("dropped_component_id", lit(componentId))
      .withColumn("dropped_component_kind", lit("transform"))
    Ports(primary, dropped, tagged)
  }
}
