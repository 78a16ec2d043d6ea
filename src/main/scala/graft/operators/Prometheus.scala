package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prometheus text exposition over the flat metric model (reference
  * src/sinks/prometheus/{exporter,collector}.rs — StringCollector).
  *
  * A scrape snapshot renders as, per metric family:
  * {{{
  * # HELP fullname name
  * # TYPE fullname counter|gauge|histogram
  * fullname{k="v",...} value
  * }}}
  * with `fullname = namespace_name` (encode_namespace '_'), label
  * values `\`/`"` backslash-escaped, and tags + the synthetic
  * `le` label sorted together (collector.rs encode_tags).
  *
  * Model mapping (collector.rs:48-90): only ABSOLUTE rows encode — an
  * incremental stream normalizes first (`Metrics.incrementalToAbsolute`
  * / `aggregate`), exactly the exporter's normalize step. counter and
  * gauge emit their value; `set` emits the series' distinct-value
  * cardinality as a gauge; `distribution` emits a cumulative
  * histogram over `buckets` (+Inf, `_sum`, `_count`) — the flat model
  * carries no per-series statistic flag, so the summary-statistic
  * rendering arm is not expressible and distributions always render as
  * histograms (documented narrowing).
  *
  * Output: `(fullname, ord, line)` — `ord` is the line's position
  * within its family (HELP, TYPE, then samples ordered by labels), so
  * `ORDER BY fullname, ord` reproduces the exposition byte order. One
  * window per family over a scrape-sized snapshot; every line is a
  * codegen'd string projection.
  */
object Prometheus {

  /** exporter.rs default_histogram_buckets. */
  val DefaultBuckets: Seq[Double] =
    Seq(0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0)

  /** Rust float Display: integral doubles print without `.0`, and
    * LARGE values print plain decimal (`10000000`), never the `1.0E7`
    * Spark's string cast produces past 1e7. Two decimal tiers:
    * decimal(38,9) holds 29 integer digits, so it covers |v| < 1e29
    * losslessly (a double's ULP at 1e7 is already ~2e-9, so 9
    * fractional digits carry full precision); for |v| in [1e29, 1e38)
    * every double is an exact integer (ULP ≥ 1 past 2^52 ≈ 4.5e15), so
    * decimal(38,0) extends plain rendering to the full 38 digits.
    * Both go through Double.toString's round-trip digits, matching
    * Rust's shortest-digits Display on everything the tests pin.
    * Values below 1e-4 keep Spark's exponent form (Rust would print
    * the zeros; numerically equal and valid exposition floats —
    * documented divergence), as does |v| ≥ 1e38 (decimal overflow).
    */
  private def fmt(c: Column): Column = {
    val s = c.cast("string")
    // try_cast: under ANSI mode a plain cast THROWS on decimal
    // overflow instead of nulling into the fallback. The two tiers
    // stay SEPARATE columns — coalescing the decimals themselves would
    // coerce both to a common decimal(38,0), truncating fractions.
    val dec9 = c.try_cast("decimal(38,9)")
    val dec0 = c.try_cast("decimal(38,0)")
    // strip only FRACTIONAL trailing zeros — the decimal(38,0) tier
    // renders integers with no dot, where a bare 0+$ would eat the
    // value's own zeros (1e30 -> "1")
    def plainOf(d: Column) = regexp_replace(regexp_replace(
      d.cast("string"), "(\\.\\d*?)0+$", "$1"), "\\.$", "")
    val plain = coalesce(plainOf(dec9), plainOf(dec0))
    when(s.contains("E") && abs(c) >= 1 && plain.isNotNull, plain)
      .otherwise(regexp_replace(s, "\\.0$", ""))
  }

  private def escTag(v: Column): Column =
    regexp_replace(v, "([\\\\\"])", "\\\\$1")

  /** Canonical `k=v,...` tag string (+ optional extra label) →
    * `{k="v",...}`; empty-and-no-extra renders nothing.
    */
  private def promLabels(tags: Column, extra: Option[(String, Column)]): Column = {
    val base = when(tags.isNotNull && length(tags) > 0,
      transform(split(tags, ","),
        t => concat(regexp_extract(t, "^([^=]*)=", 1), lit("=\""),
          escTag(regexp_extract(t, "^[^=]*=(.*)$", 1)), lit("\""))))
      .otherwise(array().cast("array<string>"))
    val withExtra = extra match {
      case Some((k, v)) => concat(base, array(concat(lit(k + "=\""), v, lit("\""))))
      case None => base
    }
    when(size(withExtra) > 0,
      concat(lit("{"), array_join(sort_array(withExtra), ","), lit("}")))
      .otherwise(lit(""))
  }

  /** Renders a snapshot of ABSOLUTE flat-model metric rows (one row
    * per series sample) into exposition lines.
    */
  def exposition(metrics: DataFrame,
                 defaultNamespace: Option[String] = None,
                 buckets: Seq[Double] = DefaultBuckets): DataFrame = {
    val ns = coalesce(col("namespace"),
      defaultNamespace.map(lit).getOrElse(lit(null).cast("string")))
    val fullname = when(ns.isNotNull, concat_ws("_", ns, col("name")))
      .otherwise(col("name"))
    val abs = metrics.filter(col("kind") === "absolute")
      .withColumn("__full", fullname)

    val ptype = when(col("value_type") === "counter", "counter")
      .when(col("value_type") === "gauge", "gauge")
      .when(col("value_type") === "set", "gauge")
      .otherwise("histogram")

    // ` <millis>` when the metric carries a timestamp (emit_value);
    // grouped renderings (set/histogram) use the series' max ts
    def tsSuffix(ts: Column): Column =
      when(ts.isNotNull,
        concat(lit(" "), unix_millis(ts).cast("string"))).otherwise(lit(""))

    // headers: one per family (collector emit_metadata)
    val headers = abs
      .groupBy(col("__full"), col("name"), ptype.as("__t"))
      .agg(lit(1).as("__one"))
      .select(col("__full"),
        array(
          concat(lit("# HELP "), col("__full"), lit(" "), col("name")),
          concat(lit("# TYPE "), col("__full"), lit(" "), col("__t"))
        ).as("__lines"))
      .select(col("__full"), posexplode(col("__lines")).as(Seq("ord", "line")))

    // scalar samples: counter/gauge one line per row
    val scalars = abs.filter(col("value_type").isin("counter", "gauge"))
      .select(col("__full"), col("tags"),
        concat(col("__full"), promLabels(col("tags"), None),
          lit(" "), fmt(col("value")), tsSuffix(col("ts"))).as("line"),
        lit(0L).as("__sub"))

    // sets: cardinality per series
    val sets = abs.filter(col("value_type") === "set")
      .groupBy(col("__full"), col("tags"))
      .agg(countDistinct(col("value")).as("__card"), max(col("ts")).as("__ts"))
      .select(col("__full"), col("tags"),
        concat(col("__full"), promLabels(col("tags"), None),
          lit(" "), col("__card").cast("string"), tsSuffix(col("__ts"))).as("line"),
        lit(0L).as("__sub"))

    // distributions → cumulative histogram: count(value <= le) is
    // cumulative BY DEFINITION, so each bucket is one conditional sum —
    // a single hash aggregate per series, no self-joins
    val dists = abs.filter(col("value_type") === "distribution")
    val bucketAggs = buckets.zipWithIndex.map { case (b, i) =>
      sum(when(col("value") <= b, 1L).otherwise(0L)).as(s"__b$i")
    }
    val distAgg = dists.groupBy(col("__full"), col("tags"))
      .agg(bucketAggs.head, bucketAggs.tail ++ Seq(
        count(lit(1)).as("__cnt"), sum(col("value")).as("__sum"),
        max(col("ts")).as("__ts")): _*)
    val bucketLines = buckets.zipWithIndex.map { case (b, i) =>
      struct(lit(i).as("__i"),
        concat(col("__full"), lit("_bucket"),
          promLabels(col("tags"), Some(("le", fmt(lit(b))))),
          lit(" "), col(s"__b$i").cast("string"), tsSuffix(col("__ts"))).as("line"))
    } ++ Seq(
      struct(lit(buckets.size).as("__i"),
        concat(col("__full"), lit("_bucket"),
          promLabels(col("tags"), Some(("le", lit("+Inf")))),
          lit(" "), col("__cnt").cast("string"), tsSuffix(col("__ts"))).as("line")),
      struct(lit(buckets.size + 1).as("__i"),
        concat(col("__full"), lit("_sum"), promLabels(col("tags"), None),
          lit(" "), fmt(col("__sum")), tsSuffix(col("__ts"))).as("line")),
      struct(lit(buckets.size + 2).as("__i"),
        concat(col("__full"), lit("_count"), promLabels(col("tags"), None),
          lit(" "), col("__cnt").cast("string"), tsSuffix(col("__ts"))).as("line")))
    val distLines = distAgg
      .select(col("__full"), col("tags"),
        explode(array(bucketLines: _*)).as("b"))
      .select(col("__full"), col("tags"), col("b.line").as("line"),
        col("b.__i").cast("long").as("__sub"))

    // family order: HELP, TYPE, then samples by (labels, bucket index)
    val samples = scalars.unionByName(sets).unionByName(distLines)
    val w = Window.partitionBy(col("__full"))
      .orderBy(col("tags").asc_nulls_first, col("__sub"))
    val orderedSamples = samples
      .select(col("__full"),
        (row_number().over(w) + 1L).as("ord"), col("line"))

    headers.select(col("__full").as("fullname"), col("ord"), col("line"))
      .unionByName(orderedSamples
        .select(col("__full").as("fullname"), col("ord"), col("line")))
  }

  /** Parse prometheus text-exposition lines back into flat-model rows —
    * the inverse of [[exposition]] (reference
    * `lib/prometheus-parser/src/{lib,line}.rs` parse_text + the
    * `src/sources/prometheus/parser.rs` reparse: counter groups →
    * absolute counters, gauge/untyped → absolute gauges — "gauges are
    * always absolute"). A sample associates with the most recent
    * `# TYPE` whose name prefixes it AND whose kind admits the suffix
    * (`""` for simple kinds, `_bucket`/`_sum`/`_count` for histogram,
    * `""`/`_sum`/`_count` for summary — GroupKind::try_push); anything
    * else opens its own untyped group, exactly the parser's fallback.
    *
    * Model narrowing (documented): the flat metric model carries one
    * numeric value per row, so histogram/summary groups surface in
    * exposition COMPONENT form — the `_bucket` (cumulative `le`),
    * `_sum`, `_count`, and quantile rows themselves, value_type
    * `gauge`, with `group_name`/`group_kind` naming the family — where
    * the reference re-aggregates them into native histogram values.
    *
    * Input: any frame plus (line, streamId, pos) columns — grouping
    * state is per `streamId` ordered by `pos` (one scrape body = one
    * stream; the window shuffles once on the stream id, the per-line
    * parse is a narrow projection). Output rows: (name, tags, kind,
    * value_type, value, tstamp_ms, group_name, group_kind); malformed
    * sample lines, comments and headers drop.
    */
  def parseExposition(df: DataFrame, line: Column, streamId: Column,
                      pos: Column): DataFrame = {
    val u = "__px_"
    def c(n: String) = col(u + n)
    val nameRe = "[a-zA-Z_:][a-zA-Z0-9_:]*"
    val typeRe = s"^# TYPE ($nameRe) (counter|gauge|histogram|summary|untyped)[ \\t]*$$"
    val sampleRe = s"^($nameRe)(?:\\{(.*)\\})?[ \\t]+([^ \\t]+)(?:[ \\t]+(-?[0-9]+))?[ \\t]*$$"
    val s1 = df.select(streamId.as(u + "sid"), pos.as(u + "pos"),
      line.as(u + "line"))
    val s2 = s1.withColumns(Map(
      u + "tname" -> nullif(regexp_extract(c("line"), typeRe, 1), lit("")),
      u + "tkind" -> nullif(regexp_extract(c("line"), typeRe, 2), lit("")),
      u + "mname" -> nullif(regexp_extract(c("line"), sampleRe, 1), lit("")),
      u + "lblob" -> regexp_extract(c("line"), sampleRe, 2),
      u + "vraw" -> regexp_extract(c("line"), sampleRe, 3),
      u + "tsraw" -> nullif(regexp_extract(c("line"), sampleRe, 4), lit(""))))
    // group state: the latest TYPE header at or before this line
    val w = Window.partitionBy(c("sid")).orderBy(c("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val s3 = s2.withColumns(Map(
      u + "gname" -> last(c("tname"), ignoreNulls = true).over(w),
      u + "gkind" -> last(c("tkind"), ignoreNulls = true).over(w)))
      .filter(c("mname").isNotNull)
    val s4 = s3.withColumn(u + "suffix",
      when(c("gname").isNotNull && c("mname").startsWith(c("gname")),
        c("mname").substr(length(c("gname")) + 1, lit(1000000))))
    val inGroup = c("suffix").isNotNull && (
      when(c("gkind").isin("counter", "gauge", "untyped"), c("suffix") === "")
        .when(c("gkind") === "histogram",
          c("suffix").isin("_bucket", "_sum", "_count"))
        .otherwise(c("suffix").isin("", "_sum", "_count")))
    val s5 = s4.withColumns(Map(
      u + "grp" -> when(inGroup, c("gname")).otherwise(c("mname")),
      u + "gk" -> when(inGroup, c("gkind")).otherwise(lit("untyped")),
      // label blob -> canonical sorted `k=v` multiset; the unescape is
      // the exact inverse of escTag (one left-to-right pass over
      // backslash pairs, so `\\"` sequences resolve correctly)
      u + "pairs" -> regexp_extract_all(c("lblob"),
        lit("([a-zA-Z_][a-zA-Z0-9_]*)=\"((?:\\\\.|[^\"\\\\])*)\""), lit(0))))
    val tags = when(size(c("pairs")) > 0,
      array_join(sort_array(transform(c("pairs"), p =>
        concat(regexp_extract(p, "^([^=]*)=", 1), lit("="),
          regexp_replace(regexp_extract(p, "^[^=]*=\"(.*)\"$", 1),
            "\\\\([\"\\\\])", "$1")))), ","))
    val value =
      when(c("vraw").isin("+Inf", "Inf"), lit(Double.PositiveInfinity))
        .when(c("vraw") === "-Inf", lit(Double.NegativeInfinity))
        .when(c("vraw") === "NaN", lit(Double.NaN))
        .otherwise(c("vraw").try_cast("double"))
    s5.select(
      c("mname").as("name"),
      tags.as("tags"),
      lit("absolute").as("kind"),
      when(c("gk") === "counter", "counter").otherwise("gauge")
        .as("value_type"),
      value.as("value"),
      c("tsraw").try_cast("bigint").as("tstamp_ms"),
      c("grp").as("group_name"),
      c("gk").as("group_kind"))
      .filter(col("value").isNotNull)
  }
}
