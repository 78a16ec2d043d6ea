package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multiline merge — the reference's `line_agg` state machine
  * (`src/line_agg.rs:24-69`: `start_pattern`/`condition_pattern`
  * regexes, modes ContinueThrough / ContinuePast / HaltBefore /
  * HaltWith, flush timeout).
  *
  * Batch re-expression: instead of a per-stream state machine we mark
  * group BOUNDARIES per line with a window over `(key, lineNo)` order,
  * turn them into group ids with a running sum, and merge each group
  * with an ordered concat. One shuffle on `key`, then two narrow
  * window passes — scales with the number of distinct keys (files).
  *
  * Boundary rule per mode, with c(i) = line i matches
  * `conditionPattern` (the canonical examples from the reference docs):
  *  - ContinueThrough: boundary at i iff NOT c(i). Java stacktraces:
  *    condition = `^\s` — indented lines join the preceding line.
  *  - ContinuePast: boundary at i iff NOT c(i-1). Trailing-backslash
  *    continuation: condition = `\\$` — a line joins the group when
  *    the PREVIOUS line ended with the continuation marker.
  *  - HaltBefore: boundary at i iff c(i). A condition match STARTS a
  *    new group (e.g. every log-timestamp line).
  *  - HaltWith: boundary at i iff c(i-1). A condition match is the
  *    LAST line of its group (e.g. an explicit end-marker).
  *
  * The flush `timeout` is a liveness knob of the streaming state
  * machine and has no batch meaning; in Structured Streaming the same
  * merge runs through `flatMapGroupsWithState` — see
  * `streaming/StreamOps.lineAgg`.
  */
object LineAgg {

  sealed trait Mode
  case object ContinueThrough extends Mode
  case object ContinuePast extends Mode
  case object HaltBefore extends Mode
  case object HaltWith extends Mode

  /** Merge lines into multiline records.
    *
    * @param df    one row per line
    * @param key   stream identity (file path / source id)
    * @param lineNo total order within a key
    * @param line  the text column
    * @param conditionPattern continuation/boundary regex (Java syntax)
    * @return one row per merged record:
    *         (key, grp, first_line_no, n_lines, text)
    */
  def merge(df: DataFrame, key: Column, lineNo: Column, line: Column,
            conditionPattern: String, mode: Mode): DataFrame = {
    val w = Window.partitionBy(key).orderBy(lineNo)
    val c = line.rlike(conditionPattern)
    val cPrev = lag(c, 1).over(w)
    val boundary: Column = mode match {
      case ContinueThrough => !c
      case ContinuePast    => !coalesce(cPrev, lit(false))
      case HaltBefore      => c
      case HaltWith        => coalesce(cPrev, lit(false))
    }
    // first line of a key always opens a group
    val start = coalesce(boundary, lit(true)) ||
      lag(lit(1), 1).over(w).isNull
    df.withColumn("__grp",
        sum(start.cast("long")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(key.as("key"), col("__grp").as("grp"))
      .agg(
        min(lineNo).as("first_line_no"),
        count(lit(1)).as("n_lines"),
        // ordered merge independent of task order: sort (lineNo, line)
        // structs, then join the line field
        array_join(
          transform(
            array_sort(collect_list(struct(lineNo.as("n"), line.as("l")))),
            s => s.getField("l")),
          "\n").as("text"))
  }
}
