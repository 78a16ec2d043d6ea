package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The metric-side transforms: log_to_metric, metric_to_log,
  * incremental_to_absolute, tag_cardinality_limit.
  *
  * Metric model (reference lib/vector-core/src/event/metric/):
  * a flat MetricRow — name, namespace, tags, kind
  * (incremental|absolute, mod.rs:515), value — SURVEY.md §1.3. Tags are
  * carried as a canonical `k=v,k=v` string in verifiable outputs (map
  * columns don't hash portably); the library also exposes map-typed tags.
  */
object Metrics {

  // ---- log_to_metric -------------------------------------------------

  /** One conversion rule: reference src/transforms/log_to_metric.rs
    * :375-481 — each rule extracts a field (or counts the event) and
    * emits one metric per event; name/namespace/tags are templates
    * rendered per event (:101-123). Events missing the field are
    * skipped, not errored (:432).
    */
  final case class MetricRule(
      metricType: String,            // counter|gauge|set|distribution
      name: Column,                  // template-rendered name
      value: Column,                 // lit(1.0) for count-style counters
      tags: Seq[(String, Column)],   // rendered tag templates
      kind: String = "incremental",
      namespace: Column = lit(null).cast("string"))

  /** Log → metric rows. Missing field (null value) ⇒ row skipped for
    * value-bearing rules, matching the reference's TemplateRenderingError
    * /FieldNotFound skip semantics.
    *
    * ONE pass over the input: every rule renders into a struct and the
    * row explodes ×|rules| (Generate — narrow, codegen'd), instead of
    * |rules| unioned scans. At 100 TB the input read dominates the
    * transform, so the union form multiplies the job's scan cost by the
    * rule count; the explode form never re-reads. `passthrough` columns
    * (event time, sequence keys) ride along unchanged.
    */
  def logToMetric(logs: DataFrame, rules: Seq[MetricRule], ts: Column,
                  passthrough: Seq[(String, Column)] = Nil): DataFrame = {
    val structs = rules.map { r =>
      // a tag whose template renders null is DROPPED from the set (the
      // reference's per-tag TemplateRenderingError keeps the event,
      // log_to_metric.rs render_tags) — `when` nulls the k=v pair and
      // concat_ws skips it, so no dangling bare "k" reaches the
      // canonical string
      val tagStr = concat_ws(",",
        r.tags.map { case (k, v) =>
          when(v.isNotNull, concat_ws("=", lit(k), v)) }: _*)
      struct(
        r.name.cast("string").as("name"),
        r.namespace.as("namespace"),
        tagStr.as("tags"),
        lit(r.kind).as("kind"),
        lit(r.metricType).as("value_type"),
        r.value.cast("double").as("value"))
    }
    logs
      .select(explode(array(structs: _*)).as("m") +: ts.as("ts") +:
        passthrough.map { case (n, c) => c.as(n) }: _*)
      // null name = the reference's name TemplateRenderingError (skip
      // the event), same as the null-value FieldNotFound skip
      .filter(col("m.value").isNotNull && col("m.name").isNotNull)
      .select(Seq("name", "namespace", "tags", "kind", "value_type", "value")
        .map(f => col(s"m.$f").as(f)) ++
        (col("ts") +: passthrough.map { case (n, _) => col(n) }): _*)
  }

  /** `all_metrics` mode (log_to_metric.rs:77 config knob, :861-905
    * dispatch, `to_metrics` :783-859): the log IS the metric — it
    * carries `name`, `kind`, optional `namespace`/`tags`, and one value
    * arm (`counter.value`, `gauge.value`, …) — and converts 1:1 with no
    * per-rule templates. Malformed rows are DROPPED, mirroring the
    * reference's emit-error-produce-nothing path: null name or kind
    * (PathNotFound), kind outside absolute|incremental
    * (MetricValueError), no arm present (MetricDetailsNotFound), or an
    * unparseable arm value (ParseError → try_cast null).
    *
    * `arms` are (value_type, raw column) in precedence order — the
    * reference scans the log's root keys and takes the FIRST recognized
    * arm (:830-846); here the first arm whose raw column is non-null
    * wins, and if its value then fails the float parse the row drops
    * (same outcome as the reference's early error). Scalar arms
    * (counter/gauge) map onto the flat MetricRow; the collection arms
    * (set/distribution/histogram/summary samples) don't fit a flat
    * double row — their merge semantics live on the aggregation side
    * ([[aggregateMetrics]]/[[histogramAgg]]/[[summaryAgg]]).
    *
    * `tags` is a map column canonicalized to the sorted `k=v,k=v`
    * string of the flat model (the reference preserves object key
    * order; map columns have none, so sorted is the deterministic
    * choice). Pure narrow projection + filter — no shuffle, codegen'd.
    */
  def logToMetricAll(logs: DataFrame, ts: Column, name: Column, kind: Column,
                     arms: Seq[(String, Column)],
                     tags: Option[Column] = None,
                     namespace: Column = lit(null).cast("string"),
                     passthrough: Seq[(String, Column)] = Nil): DataFrame = {
    require(arms.nonEmpty, "all_metrics needs at least one value arm")
    val tagStr = tags.map { m =>
      // null-valued entries are dropped, not rendered as a bare key
      // (same per-tag skip as logToMetric's rule tags)
      array_join(transform(
        filter(sort_array(map_entries(m)), e => e.getField("value").isNotNull),
        e => concat_ws("=", e.getField("key"), e.getField("value"))), ",")
    }.getOrElse(lit(null).cast("string"))
    val arm = coalesce(arms.map { case (t, c) =>
      when(c.isNotNull, struct(lit(t).as("value_type"), c.cast("string").as("raw")))
    }: _*)
    logs
      .select(Seq(
        name.cast("string").as("name"), namespace.as("namespace"),
        tagStr.as("tags"), kind.cast("string").as("kind"), arm.as("__arm"),
        ts.as("ts")) ++ passthrough.map { case (n, c) => c.as(n) }: _*)
      .withColumn("value_type", col("__arm.value_type"))
      .withColumn("value", expr("try_cast(__arm.raw AS DOUBLE)"))
      .filter(col("name").isNotNull &&
        col("kind").isin("absolute", "incremental") &&
        col("value").isNotNull)
      .select(Seq("name", "namespace", "tags", "kind", "value_type", "value")
        .map(col) ++ (col("ts") +: passthrough.map { case (n, _) => col(n) }): _*)
  }

  /** Downstream aggregation of log_to_metric output per series×window:
    * counter → sum, gauge → last, set → distinct count, distribution →
    * count+sum (+ percentiles out of verifiable scope).
    *
    * `approxDistinct`: the exact set cardinality uses `countDistinct`,
    * which Catalyst plans as a partial-distinct — an EXTRA full shuffle
    * keyed on (series, value) ahead of the series shuffle (and an
    * Expand multiplying the stream once a second distinct agg joins).
    * Exactness is contractual for the oracle (default), but at 100 TB
    * pass `approxDistinct = true`: `approx_count_distinct`
    * (HyperLogLog++) is a plain partial-mergeable aggregate — ONE
    * exchange, sketch-sized state — the same swap the sink manifest
    * documents (Sinks.scala manifest agg). Spec-pinned: 2 exchanges
    * exact vs 1 approx.
    */
  def aggregateMetrics(metrics: DataFrame, windowSecs: Long, ord: Column,
                       approxDistinct: Boolean = false,
                       extraKeys: Seq[Column] = Nil): DataFrame = {
    val win = Aggregate.windowStart(col("ts"), windowSecs).as("win")
    val setVal = when(col("value_type") === "set", col("value"))
    val distinctAgg =
      if (approxDistinct) approx_count_distinct(setVal)
      else countDistinct(setVal)
    metrics
      // `kind` is part of the series identity here: summing an absolute
      // gauge snapshot into an incremental counter's delta stream would
      // silently corrupt the aggregate (the reference dispatches merge
      // behavior ON kind, aggregate.rs Auto). `extraKeys` carries
      // namespace when the input frame has one.
      .groupBy(Seq(col("name"), col("tags"), col("kind"),
        col("value_type"), win) ++ extraKeys: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("value_type") === "counter" || col("value_type") === "distribution",
          col("value"))).as("sum_value"),
        max_by(when(col("value_type") === "gauge", col("value")), ord).as("last_value"),
        distinctAgg.as("distinct_values"))
  }

  /** AggregatedHistogram per group: fixed upper-limit buckets with
    * NON-cumulative counts, plus total count and sum — the reference's
    * histogram metric value (src/transforms/log_to_metric.rs:705;
    * lib/vector-core/src/event/metric/value.rs:20-95 Bucket{upper_limit,
    * count}). `bucket_i` counts values in (buckets[i-1], buckets[i]];
    * `bucket_inf` is the overflow bucket. One map-side-combined hash agg
    * — the 100 TB shape: state per group is |buckets|+2 longs, and the
    * shuffle carries partials, not values.
    */
  def histogramAgg(df: DataFrame, value: Column, buckets: Seq[Double],
                   keys: Seq[Column]): DataFrame = {
    require(buckets == buckets.sorted && buckets.nonEmpty, "sorted, non-empty")
    val bucketCols = buckets.zipWithIndex.map { case (ub, i) =>
      val in =
        if (i == 0) value <= ub
        else value > buckets(i - 1) && value <= ub
      sum(when(in, 1L).otherwise(0L)).as(s"bucket_$i")
    } :+ sum(when(value > buckets.last, 1L).otherwise(0L)).as("bucket_inf")
    val aggs = bucketCols ++ Seq(
      count(value).as("n"), sum(value).cast("double").as("sum_value"))
    df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** AggregatedSummary per group: exact interpolated quantiles (`q_50`
    * style columns) + count + sum — the reference's summary value
    * (src/transforms/log_to_metric.rs:776). Exact `percentile` here so
    * the DuckDB oracle (quantile_cont) can verify bit-for-bit at gate
    * scale; the production swap at 100 TB is `summarySketchAgg` below —
    * same plan shape, mergeable DDSketch agg buffers.
    */
  /** q → column label: integer percents stay `q_50`-style; fractional
    * ones keep their digits (`0.999` → `q_99_9`) — `(q*100).round`
    * would alias 0.999 and 1.0 to the SAME `q_100` column (a duplicate
    * name the very first `col("q_100")` reference trips over) and
    * mislabel the common p999.
    */
  private[graft] def qLabel(q: Double): String = {
    val p = q * 100
    if (p == math.floor(p)) s"q_${p.toLong}"
    else s"q_${p.toString.replace('.', '_').replaceAll("_?0+$", "")}"
  }

  def summaryAgg(df: DataFrame, value: Column, quantiles: Seq[Double],
                 keys: Seq[Column]): DataFrame = {
    val qCols = quantiles.map { q =>
      round(percentile(value, lit(q)), 6)
        .as(qLabel(q))
    }
    val aggs = qCols ++ Seq(
      count(value).as("n"), sum(value).cast("double").as("sum_value"))
    df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** `summaryAgg`'s at-scale form: identical output shape (q_* columns
    * + n + sum) but the quantiles come from the mergeable DDSketch
    * `TypedImperativeAggregate` (reference MetricValue::Sketch,
    * lib/vector-core/src/event/metric/value.rs:20-95) — per-group state
    * is O(maxBins) regardless of row count, partials combine map-side,
    * and the shuffle carries sketches instead of values. Quantiles are
    * within `alpha` RELATIVE error of the exact rank statistic
    * (spec-checked); use `summaryAgg` when bit-exactness is contractual.
    */
  def summarySketchAgg(df: DataFrame, value: Column, quantiles: Seq[Double],
                       keys: Seq[Column], alpha: Double = 0.01): DataFrame = {
    val aggs = Seq(
      graft.functions.Sketch.ddQuantiles(value, quantiles, alpha).as("__qs"),
      count(value).as("n"), sum(value).cast("double").as("sum_value"))
    val g = df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
    quantiles.zipWithIndex.foldLeft(g) { case (d, (q, i)) =>
      d.withColumn(qLabel(q), col("__qs").getItem(i))
    }.drop("__qs")
  }

  // ---- metric_to_log ---------------------------------------------------

  /** Metric → structured log. Reference src/transforms/metric_to_log.rs
    * :286-330 serializes the metric into a log event; we emit both the
    * struct columns and a canonical rendered line.
    */
  def metricToLog(metrics: DataFrame): DataFrame =
    metrics.withColumn("message",
      concat(
        lit("metric name="), col("name"),
        lit(" kind="), col("kind"),
        lit(" type="), col("value_type"),
        // a tag-less metric (null tags) renders as tags={} — plain
        // concat would null the WHOLE message (the reference always
        // serializes; it just omits the tags key)
        lit(" tags={"), coalesce(col("tags"), lit("")), lit("}"),
        lit(" value="), col("value").cast("string")))

  // ---- incremental_to_absolute ----------------------------------------

  /** Running-sum normalization of incremental metrics into absolute.
    * Reference: src/transforms/incremental_to_absolute.rs:68-90 (per
    * MetricSeries running sum). One shuffle on the series key; the
    * cumulative frame is per-series ordered — at 100 TB the series
    * cardinality (not event count) bounds the window state.
    */
  /** `kind`: pass the kind column for MIXED frames — the reference
    * accumulates ONLY incremental metrics and forwards absolute ones
    * unchanged (its per-series cache never sees them); the running sum
    * here then covers incremental rows only and absolute rows keep
    * their value. Omit it (None) only when the input is all-incremental.
    */
  def incrementalToAbsolute(df: DataFrame, series: Seq[Column], ord: Column,
                            value: Column,
                            kind: Option[Column] = None): DataFrame = {
    val w = Window.partitionBy(series: _*).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val absValue = kind match {
      case None => sum(value).over(w)
      case Some(k) =>
        when(k === "incremental",
          sum(when(k === "incremental", value)).over(w))
          .otherwise(value)
    }
    df.withColumn("abs_value", absValue)
      .withColumn("kind", lit("absolute"))
  }

  // ---- tag_cardinality_limit -------------------------------------------

  /** Per-tag-key cardinality guard. Reference:
    * src/transforms/tag_cardinality_limit/ — track the value set per tag
    * key; once `valueLimit` distinct values are seen, either drop the tag
    * from offending events (DropTag) or drop the events (DropEvent).
    * "Seen" order = first occurrence by `ord` (deterministic batch analog
    * of arrival order).
    *
    * Implementation: per-value first-seen via one map-side-combined
    * `min(ord)` agg, then the `valueLimit` earliest values via
    * sort-limit — Spark plans that as TakeOrderedAndProject (each task
    * computes a local top-K, the driver merges K·partitions rows), so
    * the distinct value domain NEVER funnels through a single-partition
    * window. This operator exists precisely for unbounded-cardinality
    * tags: the shuffled agg handles any domain size, and only
    * `valueLimit` rows (the kept set — the same bounded state the
    * reference's per-key HashSet/bloom holds,
    * tag_cardinality_limit/config.rs:56-82) ever reach the driver for
    * the broadcast back.
    */
  def tagCardinalityLimit(
      df: DataFrame,
      tag: String,
      ord: Column,
      valueLimit: Int,
      dropEvent: Boolean): DataFrame = {
    // events NOT carrying the tag are never constrained by it (the
    // reference checks only tags present on the event): null must not
    // consume a limit slot, and dropEvent must pass tag-less rows through
    val firstSeen = df.filter(col(tag).isNotNull)
      .groupBy(col(tag).as("__v"))
      .agg(min(ord).as("__first"))
      .orderBy(col("__first"), col("__v"))
      .limit(valueLimit)
      .select(col("__v"))
    val joined = df.join(broadcast(firstSeen), df(tag) === firstSeen("__v"), "left")
    if (dropEvent) joined.filter(col(tag).isNull || col("__v").isNotNull).drop("__v")
    else joined.withColumn(tag,
      when(col("__v").isNotNull, col(tag)).otherwise(lit(null).cast("string")))
      .drop("__v")
  }
}
