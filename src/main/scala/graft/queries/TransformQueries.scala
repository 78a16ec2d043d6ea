package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

import graft.Oracle
import graft.operators._
import graft.plans.Pipeline
import graft.sources.Tables

/** Typed rows for the Script (lua-analog) oracle query — top-level
  * because Spark encoders cannot be generated for inner classes.
  */
final case class ScriptTurn(conv_id: String, turn_idx: Int, level: String)
final case class ScriptOut(conv_id: String, turn_idx: Int, errs: Long)

/** Oracle-gated queries covering the reference's transform inventory
  * (SURVEY.md §2.1). Each `spark` entry has a matching DuckDB statement
  * in `oracle` with identical column names and values.
  */
object TransformQueries {

  /** Unique, sortable per-turn sequence key (iso-ts + conv + turn) used
    * wherever "last/first seen" needs a deterministic total order that
    * both engines can compare identically (structs don't port).
    */
  private def seqCol: Column =
    concat_ws("#", date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
      col("conv_id"), lpad(col("turn_idx").cast("string"), 6, "0"))
  private val seqSql =
    s"${Oracle.fmtIso("ts")} || '#' || conv_id || '#' || lpad(CAST(turn_idx AS STRING), 6, '0')"

  private def parsed(s: SparkSession, dir: String): DataFrame =
    Pipeline.build(s, dir).parsed

  // ---------------------------------------------------------- filter
  private def qFilter(s: SparkSession, dir: String): DataFrame =
    Filter(parsed(s, dir), col("level") =!= "info")
      .select(col("conv_id"), col("turn_idx"), col("level"), col("latency_ms"))
      .orderBy("conv_id", "turn_idx")

  // ---------------------------------------------------------- sample
  private def qSample(s: SparkSession, dir: String): DataFrame =
    Sample.byKey(Tables.transcript(s, dir),
        expr("CAST(substring(conv_id, 6) AS BIGINT)"), 10)
      .select(col("conv_id"), col("turn_idx"), col("sample_rate"))
      .orderBy("conv_id", "turn_idx")

  /** Ratio counter sampling (sample/transform.rs:64-73): Bresenham
    * accumulator per conv — 0.3 keeps 3 of every 10 turns, evenly
    * spaced, a rate > the 1-in-N mode can't express. Closed-form IEEE
    * double arithmetic on both engines (see Sample.byRatio doc).
    */
  private def qSampleRatio(s: SparkSession, dir: String): DataFrame =
    Sample.byRatio(Tables.transcript(s, dir),
        Seq(col("conv_id")), Seq(col("turn_idx")), 0.3)
      .select(col("conv_id"), col("turn_idx"), col("sample_rate"))
      .orderBy("conv_id", "turn_idx")

  /** Exclude bypass on the counter path (sample/transform.rs:147-155,
    * exclude precedes the counter increment): system turns pass
    * unstamped and consume no quota, so the 1-in-5 position counts
    * non-system turns only. Fully oracle-portable — the gate is a
    * running count, no engine hash.
    */
  private def qSampleExclude(s: SparkSession, dir: String): DataFrame =
    Sample.configured(Tables.transcript(s, dir), None, col("conv_id"),
        Seq(col("turn_idx")), Left(5), Some(col("role") === "system"),
        "sample_rate")
      .select(col("conv_id"), col("turn_idx"), col("sample_rate"))
      .orderBy("conv_id", "turn_idx")

  // ---------------------------------------------------------- throttle
  private def qThrottle(s: SparkSession, dir: String): DataFrame =
    Throttle(parsed(s, dir), col("tool_p"), col("ts"),
        threshold = 2, windowSecs = 86400,
        order = Seq(col("ts"), col("conv_id"), col("turn_idx")))
      .select(col("conv_id"), col("turn_idx"), col("tool_p"))
      .orderBy("conv_id", "turn_idx")

  // ---------------------------------------------------------- dedupe
  private def qDedupe(s: SparkSession, dir: String): DataFrame =
    Dedupe.keepFirst(parsed(s, dir),
        matchCols = Seq(col("role"), col("level"), col("tool_p")),
        order = Seq(col("conv_id"), col("turn_idx")))
      .select(col("conv_id"), col("turn_idx"), col("role"), col("level"), col("tool_p"))
      .orderBy("conv_id", "turn_idx")

  /** LRU-bounded dedupe (dedupe/common.rs:32-34): key of moderate
    * cardinality over `events` so both behaviors occur — adjacent
    * repeats dropped, long-gap repeats re-emitted after ≥4 distinct
    * intervening keys.
    */
  private def qDedupeLru(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.table(s, dir, "events").select(col("event_id"),
      concat(col("event_type"), lit("-"), col("user_id") % 40).as("k"))
    Dedupe.keepFirstLru(ev, Seq(col("k")), col("event_id"), numEvents = 4)
      .orderBy("event_id")
  }

  /** Timed dedupe, refresh_on_drop = true mode (dedupe/
    * timed_transform.rs:32-54): every sighting refreshes the entry, so
    * an event survives iff its key's PREVIOUS occurrence is at least
    * max_age older — one lag window, portable to the oracle. The
    * refresh=false chain mode is spec-verified against a sequential
    * model (OperatorSpec) — its recurrence has no portable SQL.
    */
  private def qDedupeTimed(s: SparkSession, dir: String): DataFrame = {
    // ts IS NOT NULL on BOTH sides: the operator's null-time semantics
    // ("entry never expires") have no single-window SQL analog, so the
    // oracle pair is pinned on the timed contract alone
    val ev = Tables.table(s, dir, "events").filter(col("ts").isNotNull)
      .select(col("event_id"), col("ts"),
        concat(col("event_type"), lit("-"), col("user_id") % 40).as("k"))
    Dedupe.keepFirstTimed(ev, Seq(col("k")), col("ts"), col("event_id"),
        maxAgeMs = 3600000L, refreshOnDrop = true)
      .select(col("event_id"), col("k")).orderBy("event_id")
  }

  // ---------------------------------------------------------- reduce
  private def qReduce(s: SparkSession, dir: String): DataFrame =
    parsed(s, dir).groupBy(col("conv_id")).agg(
        Reduce.Strategy.discard(col("text"), col("turn_idx")).as("first_text"),
        Reduce.Strategy.retain(col("level"), col("turn_idx")).as("last_level"),
        sum(col("latency_ms")).cast("long").as("total_latency"),
        max(col("latency_ms")).as("max_latency"),
        min(col("latency_ms")).as("min_latency"),
        Reduce.Strategy.concatNewline(col("text"), col("turn_idx")).as("merged_text"),
        array_join(Reduce.Strategy.flatUnique(col("tool_p")), ",").as("tools"))
      .orderBy("conv_id")

  // ---------------------------------------------------------- reduce sessions
  private def qSessions(s: SparkSession, dir: String): DataFrame =
    Reduce.sessionIds(parsed(s, dir), Seq(col("conv_id")), col("turn_idx"),
        endsWhen = Some(col("level") === "error"), maxEvents = None)
      .groupBy(col("conv_id"), col("session_id").cast("long").as("session_id"))
      .agg(count(lit(1)).as("n_turns"),
        min(col("turn_idx")).as("first_turn"),
        max(col("turn_idx")).as("last_turn"))
      .orderBy("conv_id", "session_id")

  // ---------------------------------------------------------- context window
  private def qContextWindow(s: SparkSession, dir: String): DataFrame =
    ContextWindow(parsed(s, dir), key = Seq(col("conv_id")), ord = col("turn_idx"),
        flushWhen = col("level") === "error", numBefore = 2, numAfter = 1)
      .select(col("conv_id"), col("turn_idx"), col("level"))
      .orderBy("conv_id", "turn_idx")

  // ---------------------------------------------------------- log_to_metric
  private def metricRules: Seq[Metrics.MetricRule] = Seq(
    Metrics.MetricRule("counter", lit("turns_total"), lit(1.0),
      tags = Seq("level" -> col("level"))),
    Metrics.MetricRule("counter", lit("latency_total"), col("latency_ms"),
      tags = Seq("tool" -> col("tool_p"))),
    Metrics.MetricRule("gauge", lit("latency_last"), col("latency_ms"),
      tags = Seq("role" -> col("role")), kind = "absolute"))

  /** Metric rows carrying the deterministic seq key for ordering —
    * the one-pass explode operator with `seq` riding as passthrough.
    */
  private def metricRowsDirect(s: SparkSession, dir: String): DataFrame =
    Metrics.logToMetric(parsed(s, dir), metricRules, col("ts"),
        passthrough = Seq("seq" -> seqCol))
      .select(col("name"), col("tags"), col("kind"), col("value_type"),
        col("value"), col("ts"), col("seq"))

  private def qLogToMetric(s: SparkSession, dir: String): DataFrame =
    metricRowsDirect(s, dir)
      .select(col("name"), col("tags"), col("kind"), col("value_type"),
        col("value"), col("seq"))
      .orderBy("name", "seq")

  /** all_metrics mode: the log IS the metric (log_to_metric.rs:783-859).
    * Shapes metric-formed rows from `parsed` with deliberate malformed
    * rows on every drop path — null name (info turns), invalid kind
    * (roles beyond user/assistant), absent arms (null latency) — and
    * converts 1:1.
    */
  private def qLogToMetricAll(s: SparkSession, dir: String): DataFrame = {
    val p = parsed(s, dir)
    Metrics.logToMetricAll(p,
        ts = col("ts"),
        name = when(col("level") === "info", lit(null))
          .otherwise(concat(lit("turn."), col("level"))),
        kind = when(col("role") === "user", lit("incremental"))
          .when(col("role") === "assistant", lit("absolute"))
          .otherwise(lit("bogus")),
        arms = Seq(
          "counter" -> when(col("tool_p") =!= "none", col("latency_ms")),
          "gauge"   -> col("latency_ms")),
        tags = Some(map(lit("lvl"), col("level"), lit("role"), col("role"))),
        passthrough = Seq("seq" -> seqCol))
      .select(col("name"), col("tags"), col("kind"), col("value_type"),
        col("value"), col("seq"))
      .orderBy("name", "seq")
  }

  private def qMetricAgg(s: SparkSession, dir: String): DataFrame =
    Metrics.aggregateMetrics(metricRowsDirect(s, dir), windowSecs = 86400,
        ord = col("seq"))
      .orderBy("name", "tags", "win")

  private def qMetricToLog(s: SparkSession, dir: String): DataFrame =
    Metrics.metricToLog(metricRowsDirect(s, dir))
      .select(col("name"), col("tags"), col("message"), col("seq"))
      .orderBy("name", "seq")

  // ------------------------------------------------- histogram / summary
  private val HistBuckets = Seq(100.0, 250.0, 500.0, 750.0)
  private val SummaryQuantiles = Seq(0.5, 0.9, 0.99)

  private def qMetricHist(s: SparkSession, dir: String): DataFrame =
    Metrics.histogramAgg(parsed(s, dir), col("latency_ms"), HistBuckets,
        keys = Seq(col("role"),
          Aggregate.windowStart(col("ts"), 86400).as("win")))
      .orderBy("role", "win")

  private def qMetricSummary(s: SparkSession, dir: String): DataFrame =
    Metrics.summaryAgg(parsed(s, dir), col("latency_ms"), SummaryQuantiles,
        keys = Seq(col("role"),
          Aggregate.windowStart(col("ts"), 86400).as("win")))
      .orderBy("role", "win")

  // ---------------------------------------------------------- incremental_to_absolute
  private def qIncToAbs(s: SparkSession, dir: String): DataFrame =
    Metrics.incrementalToAbsolute(
        Tables.table(s, dir, "events")
          .withColumn("v", col("value").cast("decimal(18,2)")),
        series = Seq(col("user_id")), ord = col("event_id"), value = col("v"))
      .select(col("event_id"), col("user_id"),
        col("abs_value").cast("double").as("abs_value"), col("kind"))
      .orderBy("event_id")

  // ---------------------------------------------------------- tag_cardinality_limit
  private def qTagLimit(s: SparkSession, dir: String): DataFrame =
    Metrics.tagCardinalityLimit(
        Tables.table(s, dir, "events")
          .withColumn("user_tag", col("user_id").cast("string")),
        tag = "user_tag", ord = col("event_id"), valueLimit = 10,
        dropEvent = false)
      .select(col("event_id"), col("user_tag"))
      .orderBy("event_id")

  // ---------------------------------------------------------- trace_to_log
  /** Trace-shaped frame: every turn as a span with an id envelope. */
  private def traceFrame(s: SparkSession, dir: String): DataFrame =
    Tables.transcript(s, dir)
      .withColumn("trace_id", concat(lit("tr-"), col("conv_id")))
      .withColumn("span_id", concat_ws("-", col("conv_id"), col("turn_idx")))
      .withColumn("parent_span_id",
        when(col("turn_idx") > 0,
          concat_ws("-", col("conv_id"), col("turn_idx") - 1)))

  private def qTraceToLog(s: SparkSession, dir: String): DataFrame =
    Stamp.traceToLog(traceFrame(s, dir))
      .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"),
        col("text"))
      .orderBy("conv_id", "turn_idx")

  // ---------------------------------------------------------- metadata stamp
  /** Single source of truth for BOTH the Spark stamp and the oracle. */
  private val metadataFixture: ListMap[String, String] = ListMap(
    "instance_id"       -> "i-0graft5678",
    "availability_zone" -> "us-east-1a",
    "ami_id"            -> "ami-graft42")

  private def qMetadata(s: SparkSession, dir: String): DataFrame =
    Stamp.withMetadata(Tables.transcript(s, dir), metadataFixture)
      .select(col("conv_id") +: col("turn_idx") +:
        metadataFixture.keys.toSeq.map(col): _*)
      .orderBy("conv_id", "turn_idx")

  // ---------------------------------------------------------- date-range enrich
  /** BetweenDates enrichment fixture: per-role release eras, disjoint
    * per key so the exactly-one-match contract holds (reference
    * lib/enrichment/src/lib.rs:25-31,53-56). Shared with the oracle.
    */
  private val releaseEras: Seq[(String, String, String, String)] =
    for {
      role <- Seq("user", "assistant", "tool", "system")
      (from, to, v) <- Seq(
        ("1992-01-01 00:00:00", "1994-12-31 23:59:59", "v1"),
        ("1995-01-01 00:00:00", "1999-12-31 23:59:59", "v2"))
    } yield (role, from, to, s"${role}_$v")

  private def qEnrichBetween(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val table = releaseEras.toDF("role", "from_str", "to_str", "release")
      .withColumn("valid_from", to_timestamp(col("from_str")))
      .withColumn("valid_to", to_timestamp(col("to_str")))
      .drop("from_str", "to_str")
    Enrich.lookupBetween(Tables.transcript(s, dir), table, Seq("role"),
        col("ts"), "valid_from", "valid_to")
      .select(col("conv_id"), col("turn_idx"), col("role"), col("release"))
      .orderBy("conv_id", "turn_idx")
  }

  // ---------------------------------------------------------- wildcard enrich
  /** Wildcard-fallback fixture: handlers for tools 0-5 plus a '*'
    * default row; tools 6-11 and NULL-tool turns fall through to it
    * (reference src/enrichment_tables/file.rs:337-346). Shared with the
    * oracle.
    */
  private val handlerRows: Seq[(String, String, Int)] =
    (0 to 5).map(i => (s"tool_$i", s"handler_$i", (i + 1) * 10)) :+
      (("*", "handler_default", 5))

  private def qEnrichWildcard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val table = handlerRows.toDF("tool", "handler", "quota")
    Enrich.lookupWithWildcard(Tables.transcript(s, dir), table,
        Seq("tool"), "*")
      .select(col("conv_id"), col("turn_idx"), col("tool"),
        col("handler"), col("quota"))
      .orderBy("conv_id", "turn_idx")
  }

  // ---------------------------------------------------------- script (lua analog)
  /** A "script" with keyed state: running error count per conversation
    * emitted with every turn, plus a summary event (turn_idx = -1) on
    * key flush — the canonical lua-transform example (stateful counter
    * + shutdown emit) under `Script.transformByKey`.
    */
  private def qScript(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val turns = parsed(s, dir)
      .select(col("conv_id"), col("turn_idx"), col("level")).as[ScriptTurn]
    Script.transformByKey(turns, (t: ScriptTurn) => t.conv_id,
        Seq(col("turn_idx")))(
        _ => 0L)(
        (errs, t) => {
          val e2 = errs + (if (t.level == "error") 1L else 0L)
          (e2, Seq(ScriptOut(t.conv_id, t.turn_idx, e2)))
        })(
        (k, errs) => Seq(ScriptOut(k, -1, errs)))
      .toDF()
      .orderBy("conv_id", "turn_idx")
  }

  // ---------------------------------------------------------- geoip / cidr
  /** Disjoint-network fixture (an "exported MMDB"); shared with the
    * oracle, which derives each network's [start, end] aton range
    * INDEPENDENTLY in Scala (integer math) rather than mirroring the
    * Spark expressions.
    */
  private val geoRows: Seq[(String, String, String)] = Seq(
    ("10.0.0.0/9",     "US", "nyc"),
    ("10.128.0.0/9",   "DE", "ber"),
    ("172.16.0.0/12",  "FR", "par"),
    ("192.168.0.0/16", "JP", "tyo"))

  private def cidrRange(cidr: String): (Long, Long) = {
    val Array(a, p) = cidr.split("/")
    val net = a.split("\\.").map(_.toLong).reduce(_ * 256 + _)
    val size = 1L << (32 - p.toInt)
    val start = net / size * size
    (start, start + size - 1)
  }

  /** Synthetic per-event IP: two /9 hits, one guaranteed miss (8.8.*),
    * one /16 hit — exercises match and no-match paths.
    */
  private def ipCol: Column =
    when(col("event_id") % 4 === 3,
      concat(lit("192.168."), col("user_id") % 256, lit("."), col("event_id") % 256))
    .when(col("event_id") % 4 === 2,
      concat(lit("8.8."), col("user_id") % 256, lit("."), col("event_id") % 256))
    .otherwise(
      concat(lit("10."), col("user_id") % 256, lit("."), col("event_id") % 256, lit(".9")))
  private val ipSql =
    """CASE WHEN event_id % 4 = 3 THEN '192.168.' || (user_id % 256) || '.' || (event_id % 256)
       WHEN event_id % 4 = 2 THEN '8.8.' || (user_id % 256) || '.' || (event_id % 256)
       ELSE '10.' || (user_id % 256) || '.' || (event_id % 256) || '.9' END"""

  private def qEnrichGeoip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val table = geoRows.toDF("cidr", "country", "city")
    Enrich.lookupCidr(
        Tables.table(s, dir, "events").withColumn("ip", ipCol),
        col("ip"), table)
      .select(col("event_id"), col("ip"), col("country"), col("city"))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------- aggregate modes
  private def qAggModes(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.table(s, dir, "events")
      .withColumn("vd", col("value").cast("decimal(18,2)"))
    val win = Aggregate.windowStart(col("ts"), 86400).as("win")
    val n = count(lit(1))
    val sx = sum(col("vd")).cast("double")
    val sx2 = sum(col("vd") * col("vd")).cast("double")
    e.groupBy(col("event_type"), win).agg(
        n.as("n"),
        sum(col("vd")).cast("double").as("sum_value"),
        max(col("value")).as("max_value"),
        min(col("value")).as("min_value"),
        (sx / n).as("mean_value"),
        sqrt((sx2 * n - sx * sx) / (n * n)).as("stdev_value"),
        max_by(col("value"), col("ts")).as("latest_value"))
      .orderBy("event_type", "win")
  }

  /** Auto (the reference DEFAULT): metric kind derived deterministically
    * from event_id so both engines see the same absolute/incremental
    * split; ord = event_id (unique). Decimal sums for cross-engine
    * float determinism, cast to double at the edge.
    */
  private def qAggAuto(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.table(s, dir, "events")
      .withColumn("vd", col("value").cast("decimal(18,2)"))
      .withColumn("kind",
        when(col("event_id") % 5 === 0, "absolute").otherwise("incremental"))
    Aggregate.tumbling(e, keys = Seq(col("event_type")), ts = col("ts"),
        value = col("vd"), mode = Aggregate.Auto, windowSecs = 86400,
        orderCol = Some(col("event_id")), kind = Some(col("kind")))
      .withColumn("value", col("value").cast("double"))
      .orderBy("event_type", "win")
  }

  private def qAggDiff(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.table(s, dir, "events")
    Aggregate.tumbling(e, keys = Seq(col("event_type")), ts = col("ts"),
        value = col("value"), mode = Aggregate.Diff, windowSecs = 86400,
        orderCol = Some(col("ts")))
      .orderBy("event_type", "win")
  }

  // ======================================================== registry
  val spark: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q_filter"         -> (qFilter _),
    "q_sample"         -> (qSample _),
    "q_sample_ratio"   -> (qSampleRatio _),
    "q_sample_exclude" -> (qSampleExclude _),
    "q_throttle"       -> (qThrottle _),
    "q_dedupe"         -> (qDedupe _),
    "q_dedupe_lru"     -> (qDedupeLru _),
    "q_dedupe_timed"   -> (qDedupeTimed _),
    "q_reduce"         -> (qReduce _),
    "q_sessions"       -> (qSessions _),
    "q_context_window" -> (qContextWindow _),
    "q_log_to_metric"  -> (qLogToMetric _),
    "q_log_to_metric_all" -> (qLogToMetricAll _),
    "q_metric_agg"     -> (qMetricAgg _),
    "q_metric_to_log"  -> (qMetricToLog _),
    "q_metric_hist"    -> (qMetricHist _),
    "q_metric_summary" -> (qMetricSummary _),
    "q_inc_to_abs"     -> (qIncToAbs _),
    "q_tag_limit"      -> (qTagLimit _),
    "q_agg_modes"      -> (qAggModes _),
    "q_agg_auto"       -> (qAggAuto _),
    "q_agg_diff"       -> (qAggDiff _),
    "q_trace_to_log"   -> (qTraceToLog _),
    "q_metadata"       -> (qMetadata _),
    "q_enrich_between" -> (qEnrichBetween _),
    "q_enrich_wildcard" -> (qEnrichWildcard _),
    "q_enrich_geoip"   -> (qEnrichGeoip _),
    "q_script"         -> (qScript _)
  )

  // DuckDB oracle -------------------------------------------------------

  /** metric rows CTE (union of the three rules over parsed). */
  private val metricsCte: String = {
    def rule(name: String, tagK: String, tagV: String, kind: String,
             vtype: String, value: String) =
      s"""SELECT '$name' AS name, '$tagK=' || $tagV AS tags, '$kind' AS kind,
         '$vtype' AS value_type, CAST($value AS DOUBLE) AS value, ts,
         $seqSql AS seq FROM parsed"""
    s"""metrics AS (
${rule("turns_total", "level", "level", "incremental", "counter", "1.0")}
UNION ALL ${rule("latency_total", "tool", "tool_p", "incremental", "counter", "latency_ms")}
UNION ALL ${rule("latency_last", "role", "role", "absolute", "gauge", "latency_ms")}
)"""
  }

  private def winSql(ts: String, secs: Long) =
    s"CAST(floor(epoch($ts) / $secs) * $secs AS BIGINT)"

  val oracle: ListMap[String, String] = ListMap(
    "q_filter" -> Oracle.q(
      "SELECT conv_id, turn_idx, level, latency_ms FROM parsed WHERE level <> 'info' ORDER BY conv_id, turn_idx",
      Seq(Oracle.parsedCte)),
    "q_sample" -> Oracle.q(
      "SELECT conv_id, turn_idx, 10 AS sample_rate FROM transcript WHERE CAST(substring(conv_id, 6) AS BIGINT) % 10 = 0 ORDER BY conv_id, turn_idx"),
    // same IEEE double ops as Sample.byRatio: (1 - r) folded at plan
    // time, k promoted bigint->double exactly, one multiply + add +
    // floor per side — the engines agree bit-for-bit.
    "q_sample_ratio" -> Oracle.q(
      """SELECT conv_id, turn_idx, CAST(0.3 AS DOUBLE) AS sample_rate FROM (
         SELECT conv_id, turn_idx,
           row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS k
         FROM transcript) t
         WHERE floor((1 - CAST(0.3 AS DOUBLE)) + k * CAST(0.3 AS DOUBLE))
             > floor((1 - CAST(0.3 AS DOUBLE)) + (k - 1) * CAST(0.3 AS DOUBLE))
         ORDER BY conv_id, turn_idx"""),
    // running count of non-excluded rows = the reference counter that
    // excluded events never increment; both engines compute it with the
    // same ROWS-bounded window sum
    "q_sample_exclude" -> Oracle.q(
      """SELECT conv_id, turn_idx,
           CASE WHEN role = 'system' THEN NULL ELSE 5 END AS sample_rate
         FROM (
           SELECT conv_id, turn_idx, role,
             sum(CASE WHEN role = 'system' THEN 0 ELSE 1 END)
               OVER (PARTITION BY conv_id ORDER BY turn_idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS kn
           FROM transcript) t
         WHERE role = 'system' OR (kn - 1) % 5 = 0
         ORDER BY conv_id, turn_idx"""),
    "q_throttle" -> Oracle.q(
      s"""SELECT conv_id, turn_idx, tool_p FROM (
         SELECT conv_id, turn_idx, tool_p,
           row_number() OVER (PARTITION BY tool_p, ${winSql("ts", 86400)}
             ORDER BY ts, conv_id, turn_idx) AS rn
         FROM parsed) t WHERE rn <= 2 ORDER BY conv_id, turn_idx""",
      Seq(Oracle.parsedCte)),
    "q_dedupe" -> Oracle.q(
      """SELECT conv_id, turn_idx, role, level, tool_p FROM (
         SELECT conv_id, turn_idx, role, level, tool_p,
           row_number() OVER (PARTITION BY role, level, tool_p
             ORDER BY conv_id, turn_idx) AS rn
         FROM parsed) t WHERE rn = 1 ORDER BY conv_id, turn_idx""",
      Seq(Oracle.parsedCte)),
    "q_dedupe_lru" -> Oracle.q(
      """SELECT event_id, k FROM lru_p WHERE prev IS NULL
         UNION ALL SELECT event_id, k FROM lru_c WHERE cnt >= 4
         ORDER BY event_id""",
      Seq(
        "lru_ev AS (SELECT event_id, event_type || '-' || (user_id % 40) AS k FROM events)",
        """lru_p AS (SELECT event_id, k,
           lag(event_id) OVER (PARTITION BY k ORDER BY event_id) AS prev FROM lru_ev)""",
        "lru_d AS (SELECT * FROM lru_p WHERE prev IS NOT NULL)",
        """lru_c AS (SELECT d.event_id, d.k, count(t.event_id) AS cnt
               FROM lru_d d LEFT JOIN lru_p t
                 ON t.event_id > d.prev AND t.event_id < d.event_id
                AND coalesce(t.prev, -1) <= d.prev
               GROUP BY d.event_id, d.k)""")),
    "q_dedupe_timed" -> Oracle.q(
      """SELECT event_id, k FROM (
           SELECT event_id, k,
             CAST(epoch_ms(ts) AS BIGINT) - lag(CAST(epoch_ms(ts) AS BIGINT))
               OVER (PARTITION BY k ORDER BY ts, event_id) AS gap
           FROM td_ev) t
         WHERE gap IS NULL OR gap >= 3600000 ORDER BY event_id""",
      Seq("td_ev AS (SELECT event_id, ts, event_type || '-' || (user_id % 40) AS k FROM events WHERE ts IS NOT NULL)")),
    "q_reduce" -> Oracle.q(
      """SELECT conv_id,
         min_by(text, turn_idx) AS first_text,
         max_by(level, turn_idx) AS last_level,
         CAST(sum(latency_ms) AS BIGINT) AS total_latency,
         max(latency_ms) AS max_latency,
         min(latency_ms) AS min_latency,
         string_agg(text, chr(10) ORDER BY turn_idx) AS merged_text,
         string_agg(DISTINCT tool_p, ',' ORDER BY tool_p) AS tools
         FROM parsed GROUP BY conv_id ORDER BY conv_id""",
      Seq(Oracle.parsedCte)),
    "q_sessions" -> Oracle.q(
      """SELECT conv_id, CAST(session_id AS BIGINT) AS session_id,
         CAST(count(*) AS BIGINT) AS n_turns,
         min(turn_idx) AS first_turn, max(turn_idx) AS last_turn
         FROM (SELECT conv_id, turn_idx,
           coalesce(sum(CASE WHEN level = 'error' THEN 1 ELSE 0 END)
             OVER (PARTITION BY conv_id ORDER BY turn_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS session_id
           FROM parsed) t
         GROUP BY 1, 2 ORDER BY conv_id, session_id""",
      Seq(Oracle.parsedCte)),
    "q_context_window" -> Oracle.q(
      """SELECT conv_id, turn_idx, level FROM (
         SELECT conv_id, turn_idx, level,
           max(CASE WHEN level = 'error' THEN 1 ELSE 0 END)
             OVER (PARTITION BY conv_id ORDER BY turn_idx
                   ROWS BETWEEN 1 PRECEDING AND 2 FOLLOWING) AS near
         FROM parsed) t WHERE near = 1 ORDER BY conv_id, turn_idx""",
      Seq(Oracle.parsedCte)),
    "q_log_to_metric" -> Oracle.q(
      "SELECT name, tags, kind, value_type, value, seq FROM metrics ORDER BY name, seq",
      Seq(Oracle.parsedCte, metricsCte)),
    // all_metrics drop paths mirrored: null name, kind outside the two
    // valid values, no parseable arm. First-non-null-arm precedence:
    // counter when tool_p set, else gauge.
    "q_log_to_metric_all" -> Oracle.q(
      s"""SELECT name, tags, kind, value_type, value, seq FROM (
         SELECT CASE WHEN level = 'info' THEN NULL ELSE 'turn.' || level END AS name,
           'lvl=' || level || ',role=' || role AS tags,
           CASE WHEN role = 'user' THEN 'incremental'
                WHEN role = 'assistant' THEN 'absolute'
                ELSE 'bogus' END AS kind,
           CASE WHEN tool_p <> 'none' AND latency_ms IS NOT NULL THEN 'counter'
                WHEN latency_ms IS NOT NULL THEN 'gauge' END AS value_type,
           CAST(latency_ms AS DOUBLE) AS value,
           $seqSql AS seq
         FROM parsed) t
         WHERE name IS NOT NULL AND kind IN ('absolute','incremental')
           AND value IS NOT NULL
         ORDER BY name, seq""",
      Seq(Oracle.parsedCte)),
    "q_metric_agg" -> Oracle.q(
      s"""SELECT name, tags, kind, value_type, ${winSql("ts", 86400)} AS win,
         CAST(count(*) AS BIGINT) AS n,
         sum(CASE WHEN value_type IN ('counter','distribution') THEN value END) AS sum_value,
         max_by(CASE WHEN value_type = 'gauge' THEN value END, seq) AS last_value,
         CAST(count(DISTINCT CASE WHEN value_type = 'set' THEN value END) AS BIGINT) AS distinct_values
         FROM metrics GROUP BY 1, 2, 3, 4, 5 ORDER BY name, tags, win""",
      Seq(Oracle.parsedCte, metricsCte)),
    "q_metric_to_log" -> Oracle.q(
      """SELECT name, tags,
         'metric name=' || name || ' kind=' || kind || ' type=' || value_type
           || ' tags={' || tags || '}' || ' value=' || CAST(value AS STRING) AS message,
         seq FROM metrics ORDER BY name, seq""",
      Seq(Oracle.parsedCte, metricsCte)),
    "q_metric_hist" -> Oracle.q(
      s"""SELECT role, ${winSql("ts", 86400)} AS win,
         ${HistBuckets.zipWithIndex.map { case (ub, i) =>
           val in =
             if (i == 0) s"latency_ms <= $ub"
             else s"latency_ms > ${HistBuckets(i - 1)} AND latency_ms <= $ub"
           s"CAST(sum(CASE WHEN $in THEN 1 ELSE 0 END) AS BIGINT) AS bucket_$i"
         }.mkString(", ")},
         CAST(sum(CASE WHEN latency_ms > ${HistBuckets.last} THEN 1 ELSE 0 END) AS BIGINT) AS bucket_inf,
         CAST(count(latency_ms) AS BIGINT) AS n,
         CAST(sum(latency_ms) AS DOUBLE) AS sum_value
         FROM parsed GROUP BY 1, 2 ORDER BY role, win""",
      Seq(Oracle.parsedCte)),
    "q_metric_summary" -> Oracle.q(
      s"""SELECT role, ${winSql("ts", 86400)} AS win,
         ${SummaryQuantiles.map(q =>
           s"round(quantile_cont(latency_ms, ${q}e0), 6) AS q_${(q * 100).round.toInt}")
           .mkString(", ")},
         CAST(count(latency_ms) AS BIGINT) AS n,
         CAST(sum(latency_ms) AS DOUBLE) AS sum_value
         FROM parsed GROUP BY 1, 2 ORDER BY role, win""",
      Seq(Oracle.parsedCte)),
    "q_inc_to_abs" ->
      """SELECT event_id, user_id,
         CAST(sum(CAST(value AS DECIMAL(18,2)))
           OVER (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS abs_value,
         'absolute' AS kind
         FROM events ORDER BY event_id""",
    "q_tag_limit" ->
      """WITH ranked AS (
           SELECT CAST(user_id AS STRING) AS v, min(event_id) AS f
           FROM events GROUP BY 1),
         keepv AS (
           SELECT v FROM (SELECT v, row_number() OVER (ORDER BY f, v) AS r
                          FROM ranked) t WHERE r <= 10)
         SELECT e.event_id,
           CASE WHEN k.v IS NOT NULL THEN CAST(e.user_id AS STRING) END AS user_tag
         FROM events e LEFT JOIN keepv k ON CAST(e.user_id AS STRING) = k.v
         ORDER BY e.event_id""",
    "q_agg_modes" ->
      s"""SELECT event_type, ${winSql("ts", 86400)} AS win,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
         max(value) AS max_value,
         min(value) AS min_value,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean_value,
         sqrt((CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) * count(*)
               - CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) * CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE))
              / (count(*) * count(*))) AS stdev_value,
         max_by(value, ts) AS latest_value
         FROM events GROUP BY 1, 2 ORDER BY event_type, win""",
    "q_agg_auto" ->
      s"""WITH ev AS (
           SELECT event_type, CAST(value AS DECIMAL(18,2)) AS vd,
             ${winSql("ts", 86400)} AS win, event_id,
             CASE WHEN event_id % 5 = 0 THEN 'absolute' ELSE 'incremental' END AS kind
           FROM events),
         marked AS (
           SELECT *, max(CASE WHEN kind = 'absolute' THEN event_id END)
             OVER (PARTITION BY event_type, win) AS last_abs
           FROM ev)
         SELECT event_type, win, CAST(sum(vd) AS DOUBLE) AS value
         FROM marked
         WHERE (kind = 'absolute' AND event_id = last_abs)
            OR (kind = 'incremental' AND (last_abs IS NULL OR event_id > last_abs))
         GROUP BY 1, 2 ORDER BY event_type, win""",
    "q_agg_diff" ->
      s"""WITH latest AS (
           SELECT event_type, ${winSql("ts", 86400)} AS win,
             max_by(value, ts) AS value
           FROM events GROUP BY 1, 2)
         SELECT event_type, win,
           value - coalesce(lag(value) OVER (PARTITION BY event_type ORDER BY win), 0.0) AS value
         FROM latest ORDER BY event_type, win""",
    "q_trace_to_log" -> Oracle.q(
      // unwrap = drop the envelope: the log projection of the trace frame
      "SELECT conv_id, turn_idx, role, tool, text FROM transcript ORDER BY conv_id, turn_idx"),
    "q_metadata" -> Oracle.q(
      s"""SELECT conv_id, turn_idx,
         ${metadataFixture.map { case (k, v) => s"'$v' AS $k" }.mkString(", ")}
         FROM transcript ORDER BY conv_id, turn_idx"""),
    "q_enrich_between" -> Oracle.q(
      """SELECT t.conv_id, t.turn_idx, t.role, e.release
         FROM transcript t LEFT JOIN eras e
           ON t.role = e.role AND t.ts >= e.valid_from AND t.ts <= e.valid_to
         ORDER BY t.conv_id, t.turn_idx""",
      Seq(s"""eras AS (SELECT * FROM (VALUES ${releaseEras.map { case (r, f, to, v) =>
          s"('$r', TIMESTAMP '$f', TIMESTAMP '$to', '$v')"
        }.mkString(",")}) AS t(role, valid_from, valid_to, release))""")),
    "q_enrich_wildcard" -> Oracle.q(
      """SELECT t.conv_id, t.turn_idx, t.tool,
         CASE WHEN l.hit THEN l.handler ELSE w.handler END AS handler,
         CASE WHEN l.hit THEN l.quota ELSE w.quota END AS quota
         FROM transcript t
         LEFT JOIN lut l ON t.tool = l.tool
         LEFT JOIN (SELECT handler, quota FROM lut WHERE tool = '*') w ON TRUE
         ORDER BY t.conv_id, t.turn_idx""",
      Seq(s"""lut AS (SELECT *, TRUE AS hit FROM (VALUES ${handlerRows.map {
          case (t, h, q) => s"('$t', '$h', $q)"
        }.mkString(",")}) AS v(tool, handler, quota))""")),
    "q_enrich_geoip" ->
      s"""WITH geo AS (SELECT * FROM (VALUES ${geoRows.map { case (c, co, ci) =>
           val (s0, e0) = cidrRange(c)
           s"('$co', '$ci', CAST($s0 AS BIGINT), CAST($e0 AS BIGINT))"
         }.mkString(",")}) AS t(country, city, r_start, r_end)),
         e AS (SELECT event_id, $ipSql AS ip FROM events),
         a AS (SELECT event_id, ip,
                 CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
                 + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
                 + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
                 + CAST(string_split(ip, '.')[4] AS BIGINT) AS aton
               FROM e)
         SELECT a.event_id, a.ip, g.country, g.city
         FROM a LEFT JOIN geo g ON a.aton >= g.r_start AND a.aton <= g.r_end
         ORDER BY a.event_id""",
    "q_script" -> Oracle.q(
      """SELECT conv_id, turn_idx, errs FROM (
           SELECT conv_id, turn_idx,
             CAST(sum(CASE WHEN level = 'error' THEN 1 ELSE 0 END)
               OVER (PARTITION BY conv_id ORDER BY turn_idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS errs
           FROM parsed
           UNION ALL
           SELECT conv_id, -1 AS turn_idx,
             CAST(sum(CASE WHEN level = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errs
           FROM parsed GROUP BY conv_id
         ) t ORDER BY conv_id, turn_idx""",
      Seq(Oracle.parsedCte))
  )
}
