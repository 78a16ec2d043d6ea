package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vector's `aggregate` transform re-expressed over event-time windows.
  *
  * Reference: src/transforms/aggregate.rs — tumbling windows keyed by
  * MetricSeries with modes Auto/Sum/Latest/Count/Diff/Max/Min/Mean/Stdev
  * (aggregate.rs:48-76); Auto = sum incremental, last absolute
  * (:134-140); Diff = value minus previous window's value (:256-262).
  * The reference flushes on PROCESSING-time interval ticks
  * (aggregate.rs:333-335); we deliberately use EVENT-time windows over
  * `ts` — deterministic, replayable, and the only semantics that survive
  * distributed re-execution (SURVEY.md §7.4 documents the divergence).
  *
  * Scale notes: one shuffle on (series keys, window); partial aggregation
  * (map-side combine) is automatic for all modes except Latest-by-order,
  * which uses max_by (still a single-pass hash aggregate). Diff adds a
  * window function over the aggregated (already small) frame, not the raw
  * events.
  */
object Aggregate {

  /** Tumbling event-time window start as epoch seconds (BIGINT). Kept as
    * a long rather than Spark's window struct so results are exactly
    * comparable across engines and stable under serialization.
    */
  def windowStart(ts: Column, windowSecs: Long): Column =
    (floor(unix_timestamp(ts) / windowSecs) * windowSecs).cast("long")

  sealed trait Mode
  /** The reference's DEFAULT mode (aggregate.rs:134-140): per series,
    * an Absolute event REPLACES the running entry and an Incremental
    * event ADDS to it — so a window's value is the last absolute value
    * plus the sum of incrementals recorded after it (plain incremental
    * sum when the window saw no absolute).
    */
  case object Auto extends Mode
  case object Sum extends Mode
  case object Count extends Mode
  case object Max extends Mode
  case object Min extends Mode
  case object Mean extends Mode
  case object Stdev extends Mode
  /** last value in (orderCol) order within the window — reference Latest */
  case object Latest extends Mode
  /** this window's Latest minus previous window's Latest — reference Diff */
  case object Diff extends Mode

  /** Aggregate `value` per (keys × tumbling window of `windowSecs`).
    * Returns columns: keys..., win (epoch secs), value.
    * Stdev is population stddev computed from exact sums (deterministic
    * across engines, unlike a streaming stddev over doubles).
    */
  def tumbling(
      df: DataFrame,
      keys: Seq[Column],
      ts: Column,
      value: Column,
      mode: Mode,
      windowSecs: Long = 10L,
      orderCol: Option[Column] = None,
      kind: Option[Column] = None): DataFrame = {
    val win = windowStart(ts, windowSecs).as("win")
    val grouped = df.groupBy(keys :+ win: _*)
    val ord = orderCol.getOrElse(ts)
    mode match {
      case Auto =>
        val kc = kind.getOrElse(throw new IllegalArgumentException(
          "Aggregate.Auto needs a kind column ('absolute'|'incremental')"))
        tumblingAutoKind(df, keys, ts, value, windowSecs, ord, kc).drop("kind")
      case Sum    => grouped.agg(sum(value).as("value"))
      // one per EVENT (record_count emits Counter{1} per metric,
      // aggregate.rs:173-185) — count(value) would skip null-valued rows
      case Count  => grouped.agg(count(lit(1)).as("value"))
      case Max    => grouped.agg(max(value).as("value"))
      case Min    => grouped.agg(min(value).as("value"))
      case Mean   => grouped.agg((sum(value) / count(value)).as("value"))
      case Stdev  =>
        // stddev_pop's central-moment accumulation, NOT the naive
        // sqrt((nΣx² − (Σx)²)/n²): on large-magnitude low-variance
        // series the naive radicand cancels catastrophically (measured
        // 0.12 "stdev" — or NaN from sqrt(−ulp) — for a CONSTANT
        // series). Exact-decimal callers needing the oracle-portable
        // naive form keep it inline (q_agg_modes).
        grouped.agg(stddev_pop(value).as("value"))
      case Latest => grouped.agg(max_by(value, ord).as("value"))
      case Diff   =>
        val latest = grouped.agg(max_by(value, ord).as("value"))
        val keyNames = latest.columns.filterNot(c => c == "win" || c == "value")
        val w = Window.partitionBy(keyNames.map(col): _*).orderBy(col("win"))
        latest.withColumn("value",
          col("value") - coalesce(lag(col("value"), 1).over(w), lit(0.0)))
    }
  }

  /** `Auto` with the flushed entry's `kind` in the output — what the
    * reference emits on flush (its map entry keeps the kind of the
    * event that seeded it, aggregate.rs:134-140): `absolute` when the
    * window recorded an absolute metric (it seeds the sum), else
    * `incremental`.
    *
    * One window pass to find each (series, win)'s last absolute event,
    * then a single hash aggregate over the surviving rows: the last
    * absolute plus every incremental after it. The window and the
    * groupBy share the same (keys, win) partitioning, so AQE plans ONE
    * exchange, not two. `ord` must be unique within a (series, window)
    * for the last-absolute row pick. Returns keys..., win, value, kind.
    */
  def tumblingAutoKind(df: DataFrame, keys: Seq[Column], ts: Column,
                       value: Column, windowSecs: Long, ord: Column,
                       kind: Column): DataFrame = {
    val win = windowStart(ts, windowSecs).as("win")
    val winPlain = windowStart(ts, windowSecs)
    val w = Window.partitionBy(keys :+ winPlain: _*)
    val lastAbs = max(when(kind === "absolute", ord)).over(w)
    df.withColumn("__last_abs", lastAbs)
      .filter(
        (kind === "absolute" && ord === col("__last_abs")) ||
        (kind === "incremental" &&
          (col("__last_abs").isNull || ord > col("__last_abs"))))
      .groupBy(keys :+ win: _*)
      // min over the SURVIVORS: the absolute seed row survives exactly
      // when the window had one, and "absolute" < "incremental"
      .agg(sum(value).as("value"), min(kind).as("kind"))
  }
}
