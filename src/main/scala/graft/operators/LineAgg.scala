package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
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
// Serializable: closures that call `decide` capture the object itself
object LineAgg extends Serializable {

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

  // ---- exact sequential form (start_pattern semantics) ---------------

  /** One input line for [[mergeWithStart]]. */
  final case class InLine(key: String, lineNo: Long, line: String)
  /** One merged record; (first, last) line numbers mirror the
    * reference's (initial_context, last_context) pair.
    */
  final case class OutRec(key: String, first_line_no: Long,
                          last_line_no: Long, n_lines: Long, text: String)

  /** Per-line verdict of the reference machine over an OPEN buffer
    * (line_agg.rs:314-331): Continue appends, EndInclude closes with
    * the line, EndExclude closes without it and re-handles the line
    * against the empty state.
    */
  sealed trait Decision
  case object Continue extends Decision
  case object EndInclude extends Decision
  case object EndExclude extends Decision

  def decide(mode: Mode, conditionMatched: Boolean): Decision = (mode, conditionMatched) match {
    case (ContinueThrough, true)  => Continue
    case (ContinueThrough, false) => EndExclude
    case (ContinuePast, true)     => Continue
    case (ContinuePast, false)    => EndInclude
    case (HaltBefore, true)       => EndExclude
    case (HaltBefore, false)      => Continue
    case (HaltWith, true)         => EndInclude
    case (HaltWith, false)        => Continue
  }

  /** The reference state machine EXACTLY (src/line_agg.rs:294-368),
    * including `start_pattern`: with no buffer open, only a
    * start-matching line opens one — anything else passes through as
    * its own record (line_agg.rs:353-366) — and an EndExclude boundary
    * line is re-handled against the now-empty state (the stash,
    * line_agg.rs:169-181,346-350). The windowed [[merge]] treats every
    * boundary as a group opener, which coincides with this exactly when
    * start_pattern accepts every boundary line (the canonical pairings
    * in the reference's own tests); this form is the general one, and
    * what the config front-end's `[sources.*.multiline]` compiles to.
    *
    * Built on the Script harness (`transformByKey`): sequential per key
    * in lineNo order — the semantics — parallel across keys, state never
    * leaving the executor; one shuffle on the key, the sort rides it.
    */
  def mergeWithStart(ds: Dataset[InLine], startPattern: String,
                     conditionPattern: String, mode: Mode): Dataset[OutRec] = {
    val sp = ds.sparkSession
    import sp.implicits._
    // scala Regex, not java Pattern: the closure ships to executors and
    // Pattern is not Serializable
    val startP = startPattern.r
    val condP = conditionPattern.r
    val m = mode
    def emit(key: String, lines: Vector[InLine]): OutRec =
      OutRec(key, lines.head.lineNo, lines.last.lineNo,
        lines.size.toLong, lines.map(_.line).mkString("\n"))
    // buf == null ⇔ no open aggregate (the reference's vacant entry)
    def step(key: String, buf: Vector[InLine],
             l: InLine): (Vector[InLine], Seq[OutRec]) =
      if (buf == null) {
        if (startP.findFirstIn(l.line).isDefined) (Vector(l), Nil)
        else (null, Seq(emit(key, Vector(l))))
      } else decide(m, condP.findFirstIn(l.line).isDefined) match {
        case Continue   => (buf :+ l, Nil)
        case EndInclude => (null, Seq(emit(key, buf :+ l)))
        case EndExclude => // close, then re-handle l on empty state
          val (b2, more) = step(key, null, l)
          (b2, emit(key, buf) +: more)
      }
    Script.transformByKey[InLine, String, (String, Vector[InLine]), OutRec](
      ds, _.key, Seq(org.apache.spark.sql.functions.col("lineNo")))(
      k => (k, null))(
      (s, l) => { val (b2, out) = step(s._1, s._2, l); ((s._1, b2), out) })(
      (_, s) => if (s._2 == null) Nil else Seq(emit(s._1, s._2)))
  }
}
