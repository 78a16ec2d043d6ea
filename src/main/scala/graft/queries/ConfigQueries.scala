package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

import graft.Oracle
import graft.config.{Frame, Topology}
import graft.config.VrlCompile.EventMeta
import graft.sources.Tables

/** Oracle-gated queries whose pipelines are built FROM CONFIG FILES
  * (TOML topology + VRL programs) rather than the Scala Column API —
  * the reference's primary UX (config loading `src/config/builder.rs`,
  * remap `src/transforms/remap.rs:58-135`). The DuckDB oracle mirrors
  * each config stage in portable SQL, so a hash match proves the
  * config → Catalyst compilation end to end, not just the operators.
  */
object ConfigQueries {

  /** Bundled flagship topology (also asserted against
    * `Pipeline.logLineGrok` by ConfigPipelineSpec).
    */
  val FlagshipResource = "/graft/topology/flagship.toml"

  def resourceText(path: String): String = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing resource $path")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Transcript as a config Frame: event fields + the non-event
    * arrival-order column (deterministic per turn — order-insensitive
    * transforms ignore it, and nothing in this topology is
    * order-sensitive).
    */
  private def transcriptFrame(s: SparkSession, dir: String): Frame = {
    val t = Tables.transcript(s, dir)
    Frame(
      t.withColumn(Topology.SeqCol, xxhash64(col("conv_id"), col("turn_idx"))),
      EventMeta.fromSchema(t.schema))
  }

  private val ports = Seq("errors", "slow", "_unmatched")

  /** parse (VRL parse_grok, drop_on_error) → filter → route, all from
    * the bundled TOML. Output: the three route ports re-unioned under a
    * `port` label.
    */
  private def qConfigPipeline(s: SparkSession, dir: String): DataFrame = {
    val topo = Topology.load(resourceText(FlagshipResource))
    val out = topo.run(Map("transcript" -> transcriptFrame(s, dir)))
    // the bare route name is the ONE-PASS tagged multicast view (port
    // column): reading it instead of unioning the per-port frames keeps
    // the grok parse at one evaluation per row instead of one per port
    // (measured 5.3 s -> sub-second warm at sf0.1)
    out("by_class").df
      .filter(col("port").isin(ports: _*))
      .select(
        col("conv_id"), col("turn_idx").cast("int").as("turn_idx"),
        col("role"), col("level"), col("tool_p"),
        col("latency_ms").cast("bigint").as("latency_ms"), col("port"))
      .orderBy("conv_id", "turn_idx", "port")
  }

  private val portSelect =
    "SELECT conv_id, turn_idx, role, level, tool_p, CAST(latency_ms AS BIGINT) AS latency_ms"

  private val oracleConfigPipeline: String = Oracle.q(
    "SELECT * FROM cfg_routed ORDER BY conv_id, turn_idx, port",
    Seq(
      Oracle.parsedCte,
      "filtered AS (SELECT * FROM parsed WHERE level <> 'info')",
      s"""cfg_routed AS (
         $portSelect, 'errors' AS port FROM filtered WHERE coalesce(level = 'error', false)
         UNION ALL $portSelect, 'slow' AS port FROM filtered WHERE coalesce(latency_ms >= 800, false)
         UNION ALL $portSelect, '_unmatched' AS port FROM filtered
           WHERE NOT coalesce(level = 'error', false) AND NOT coalesce(latency_ms >= 800, false)
       )"""))

  // ------------------------------------------------- enrichment + closure
  /** Deterministic lookup CSV for the config enrichment table — the
    * same rows the oracle inlines as VALUES (one source of truth: this
    * constant).
    */
  private val RoleRows: Seq[(String, String, Int)] = Seq(
    ("user", "ingress", 1), ("assistant", "model", 2),
    ("tool", "runtime", 4), ("system", "control", 3))

  private def rolesCsvPath(): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_roles_lookup.csv")
    val content = "role,team,weight\n" +
      RoleRows.map { case (r, t, w) => s"$r,$t,$w" }.mkString("", "\n", "\n")
    java.nio.file.Files.write(p, content.getBytes("UTF-8"))
    p.toString
  }

  /** Enrichment-table lookup + an enumeration closure, end-to-end from
    * config: `get_enrichment_table_record` compiles to a literal lookup
    * map (broadcast-join-equivalent, zero shuffles) and the closure to a
    * Spark HOF — the whole remap stays one narrow projection.
    */
  private def qConfigEnrich(s: SparkSession, dir: String): DataFrame = {
    val topo = Topology.load(
      s"""
        |[enrichment_tables.roles]
        |  type = "file"
        |  [enrichment_tables.roles.file]
        |    path = "${rolesCsvPath()}"
        |    [enrichment_tables.roles.file.encoding]
        |      type = "csv"
        |[transforms.enrich]
        |  inputs = ["transcript"]
        |  type = "remap"
        |  source = '''
        |    .rec = get_enrichment_table_record!("roles", {"role": .role})
        |    .team = string!(.rec.team)
        |    .wscore = to_int!(string!(.rec.weight)) * strlen!(.text)
        |    .nv = length(filter(chunks(downcase(.text), 1)) -> |_i, ch| { includes(["a", "e", "i", "o", "u"], ch) })
        |  '''
        |""".stripMargin)
    val out = topo.run(Map("transcript" -> transcriptFrame(s, dir)))
    out("enrich").df.select(
      col("conv_id"), col("turn_idx").cast("int").as("turn_idx"),
      col("role"), col("team"),
      col("wscore").cast("bigint").as("wscore"),
      col("nv").cast("bigint").as("nv"))
      .orderBy("conv_id", "turn_idx")
  }

  private val oracleConfigEnrich: String = Oracle.q(
    """SELECT conv_id, CAST(turn_idx AS INT) AS turn_idx, role, team,
       CAST(weight * length(text) AS BIGINT) AS wscore,
       CAST(len(regexp_extract_all(lower(text), '[aeiou]')) AS BIGINT) AS nv
       FROM transcript JOIN role_lookup USING (role)
       ORDER BY conv_id, turn_idx""",
    Seq(
      "role_lookup AS (SELECT * FROM (VALUES " +
        RoleRows.map { case (r, t, w) => s"('$r','$t',$w)" }.mkString(", ") +
        ") AS t(role, team, weight))"))

  // ------------------------------------------- metric pipeline from config
  /** log_to_metric ([[metrics]] rules: 1-per-event counter + gauge,
    * templated tags) → aggregate (mode auto, daily event-time windows),
    * both built FROM TOML — the reference's flagship metric topology
    * (log_to_metric.rs + aggregate.rs) driven by config. `__seq` is
    * `event_id` (unique), so the auto mode's last-absolute pick is
    * deterministic and the oracle can mirror it with a window rank.
    */
  private def qConfigMetrics(s: SparkSession, dir: String): DataFrame = {
    import graft.config.VrlCompile.{VFloat, VStr, VTime}
    val e = Tables.table(s, dir, "events")
    val frame = Frame(
      e.select(col("event_type"), col("value").cast("double").as("value"),
        col("ts"), col("event_id").cast("long").as(Topology.SeqCol)),
      EventMeta(ListMap("event_type" -> VStr, "value" -> VFloat, "ts" -> VTime), None))
    val topo = Topology.load(
      """
        |[transforms.l2m]
        |  inputs = ["events"]
        |  type = "log_to_metric"
        |  [[transforms.l2m.metrics]]
        |    type = "counter"
        |    field = "event_type"
        |    name = "ev_total"
        |    [transforms.l2m.metrics.tags]
        |      type = "{{event_type}}"
        |  [[transforms.l2m.metrics]]
        |    type = "gauge"
        |    field = "value"
        |    name = "val"
        |    [transforms.l2m.metrics.tags]
        |      type = "{{event_type}}"
        |[transforms.agg]
        |  inputs = ["l2m"]
        |  type = "aggregate"
        |  interval_ms = 86400000
        |  mode = "auto"
        |""".stripMargin)
    topo.run(Map("events" -> frame))("agg").df
      .select(col("name"), col("tags"), col("kind"), col("value_type"),
        col("value"), unix_timestamp(col("ts")).as("win"))
      .orderBy("name", "tags", "win")
  }

  private val oracleConfigMetrics: String = {
    val win = "CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT)"
    s"""WITH m AS (
         -- counter field = event_type: null => row skipped; gauge rows
         -- keep going but a null-rendered type tag drops to '' tags
         SELECT 'ev_total' AS name, 'type=' || event_type AS tags,
           'incremental' AS kind, 'counter' AS value_type,
           1.0 AS value, ts, event_id, $win AS win
         FROM events WHERE event_type IS NOT NULL
         UNION ALL
         SELECT 'val', COALESCE('type=' || event_type, ''), 'absolute', 'gauge',
           CAST(value AS DOUBLE), ts, event_id, $win
         FROM events WHERE value IS NOT NULL
       ),
       counters AS (
         SELECT name, tags, kind, value_type,
           CAST(sum(value) AS DOUBLE) AS value, win
         FROM m WHERE kind = 'incremental'
         GROUP BY name, tags, kind, value_type, win
       ),
       gauges AS (
         SELECT name, tags, kind, value_type, value, win FROM (
           SELECT *, row_number() OVER (
             PARTITION BY name, tags, value_type, win
             ORDER BY ts DESC, event_id DESC) AS rn
           FROM m WHERE kind = 'absolute') WHERE rn = 1
       )
       SELECT * FROM counters UNION ALL SELECT * FROM gauges
       ORDER BY name, tags, win"""
  }

  // ----------------------------------------- tag_cardinality_limit
  /** log_to_metric (typed + templated tags) → tag_cardinality_limit
    * (drop_tag, value_limit 3) from TOML. `__seq` = event_id, so
    * first-seen order is deterministic and the oracle mirrors the
    * per-key first-3 kept set with a window rank.
    */
  private def qConfigTagLimit(s: SparkSession, dir: String): DataFrame = {
    import graft.config.VrlCompile.{VFloat, VStr, VTime}
    val e = Tables.table(s, dir, "events")
    val frame = Frame(
      e.select(col("event_type"), col("user_id").cast("string").as("uid"),
        col("value").cast("double").as("value"), col("ts"),
        col("event_id").cast("long").as(Topology.SeqCol)),
      EventMeta(ListMap("event_type" -> VStr, "uid" -> VStr,
        "value" -> VFloat, "ts" -> VTime), None))
    val topo = Topology.load(
      """
        |[transforms.l2m]
        |  inputs = ["events"]
        |  type = "log_to_metric"
        |  [[transforms.l2m.metrics]]
        |    type = "counter"
        |    field = "event_type"
        |    name = "ev"
        |    [transforms.l2m.metrics.tags]
        |      type = "{{event_type}}"
        |      user = "{{uid}}"
        |[transforms.capped]
        |  inputs = ["l2m"]
        |  type = "tag_cardinality_limit"
        |  value_limit = 3
        |  limit_exceeded_action = "drop_tag"
        |""".stripMargin)
    topo.run(Map("events" -> frame))("capped").df
      .select(col(Topology.SeqCol).as("event_id"), col("tags"))
      .orderBy("event_id")
  }

  private val oracleConfigTagLimit: String =
    """WITH m AS (
         SELECT event_type, CAST(user_id AS VARCHAR) AS uid, event_id
         FROM events
         WHERE event_type IS NOT NULL),  -- counter field null => row skipped (FieldNotFound)
       pairs AS (
         SELECT 'type' AS k, event_type AS v, event_id FROM m
         UNION ALL
         -- a null-rendered tag is DROPPED before the limiter ever sees
         -- it: a null uid must not occupy a kept slot
         SELECT 'user', uid, event_id FROM m WHERE uid IS NOT NULL),
       first_seen AS (SELECT k, v, min(event_id) AS f FROM pairs GROUP BY k, v),
       kept AS (SELECT k, v FROM (
         SELECT *, row_number() OVER (PARTITION BY k ORDER BY f, v) AS rn
         FROM first_seen) WHERE rn <= 3)
       SELECT m.event_id,
         concat_ws(',',
           CASE WHEN kt.v IS NOT NULL THEN 'type=' || m.event_type END,
           CASE WHEN ku.v IS NOT NULL THEN 'user=' || m.uid END) AS tags
       FROM m
       LEFT JOIN kept kt ON kt.k = 'type' AND kt.v = m.event_type
       LEFT JOIN kept ku ON ku.k = 'user' AND ku.v = m.uid
       ORDER BY event_id"""

  // ------------------------------------------------- window (context)
  /** window (context filter) from TOML over the transcript: flush_when
    * tool match, -1/+2 context per conv_id, forward_when bypass for
    * system turns (they consume no buffer slot). `__seq` = turn_idx —
    * per-conversation order, which is all the sharded buffer needs.
    */
  private def qConfigWindow(s: SparkSession, dir: String): DataFrame = {
    import graft.config.VrlCompile.{VInt, VStr}
    val t = Tables.transcript(s, dir)
    val frame = Frame(
      t.select(col("conv_id"), col("turn_idx").cast("int").as("turn_idx"),
        col("role"), col("tool"), col("turn_idx").cast("long").as(Topology.SeqCol)),
      EventMeta(ListMap("conv_id" -> VStr, "turn_idx" -> VInt,
        "role" -> VStr, "tool" -> VStr), None))
    val topo = Topology.load(
      """
        |[transforms.ctx]
        |  inputs = ["transcript"]
        |  type = "window"
        |  flush_when = '.tool == "tool_3"'
        |  forward_when = '.role == "system"'
        |  num_events_before = 1
        |  num_events_after = 2
        |  group_by = ["conv_id"]
        |""".stripMargin)
    topo.run(Map("transcript" -> frame))("ctx").df
      .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"))
      .orderBy("conv_id", "turn_idx")
  }

  private val oracleConfigWindow: String = Oracle.q(
    """SELECT conv_id, turn_idx, role, tool FROM (
         SELECT conv_id, turn_idx, role, tool,
           max(CASE WHEN coalesce(tool = 'tool_3', false) THEN 1 ELSE 0 END)
             OVER (PARTITION BY conv_id ORDER BY turn_idx
                   ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS keep
         FROM base WHERE role <> 'system') WHERE keep = 1
       UNION ALL
       SELECT conv_id, turn_idx, role, tool FROM base WHERE role = 'system'
       ORDER BY conv_id, turn_idx""",
    Seq("base AS (SELECT conv_id, CAST(turn_idx AS INT) AS turn_idx, role, tool FROM transcript)"))

  /** `lua` transform end-to-end from config: a v2 `hooks.process`
    * script (real Lua on the graft.lua VM, one VM per partition)
    * reshapes each transcript turn — `#` length, `string.upper`,
    * `string.gsub`, field delete, arithmetic filter on `%`, a shared
    * table reference (`local log = event.log`), and the emit gate —
    * then the rebuilt frame round-trips the `ts` timestamp through the
    * time-table convention. The DuckDB oracle mirrors every step in
    * portable SQL, so a hash match proves script semantics, the event
    * bridge, and schema re-inference together.
    */
  private val luaToml =
    """
      |[transforms.shape]
      |  inputs = []
      |  type = "lua"
      |  version = "2"
      |  hooks.process = '''
      |    function (event, emit)
      |      local log = event.log
      |      log.text_len = #log.text
      |      log.role_up = string.upper(log.role)
      |      log.text = string.gsub(log.text, " ", "_")
      |      log.tool = nil
      |      if log.turn_idx % 2 == 0 then
      |        emit(event)
      |      end
      |    end
      |  '''
      |""".stripMargin

  private val isoFmt = "yyyy-MM-dd'T'HH:mm:ss'Z'"

  private def qConfigLua(s: SparkSession, dir: String): DataFrame = {
    val topo = Topology.load(luaToml)
    val out = topo.run(Map("shape" -> transcriptFrame(s, dir)))("shape")
    out.df.select(
      col("conv_id"),
      col("turn_idx").cast("long").as("turn_idx"),
      col("role_up"),
      col("text_len").cast("long").as("text_len"),
      col("text"),
      date_format(col("ts"), isoFmt).as("ts_iso"))
      .orderBy("conv_id", "turn_idx")
  }

  private val oracleConfigLua = Oracle.q(
    s"""SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
       upper(role) AS role_up,
       CAST(length(text) AS BIGINT) AS text_len,
       replace(text, ' ', '_') AS text,
       ${Oracle.fmtIso("ts")} AS ts_iso
       FROM transcript WHERE turn_idx % 2 = 0
       ORDER BY conv_id, turn_idx""")

  /** `static_metrics` config SOURCE unioned with log_to_metric output
    * and aggregated (mode auto) — the reference's observability-demo
    * shape (a configured-baseline gauge/counter merged with derived
    * event counters). Proves from config text: the static_metrics
    * source → flat metric model, multi-input transform union across a
    * source frame and a transform frame, and auto aggregation over the
    * union. Static rows carry a NULL event-time (the deterministic
    * engine stamps no wall clock), so their window is NULL — mirrored
    * literally in the oracle.
    */
  private def qConfigObserve(s: SparkSession, dir: String): DataFrame = {
    import graft.config.VrlCompile.{VFloat, VStr, VTime}
    val e = Tables.table(s, dir, "events")
    val frame = Frame(
      e.select(col("event_type"), col("value").cast("double").as("value"),
        col("ts"), col("event_id").cast("long").as(Topology.SeqCol)),
      EventMeta(ListMap("event_type" -> VStr, "value" -> VFloat, "ts" -> VTime), None))
    val topo = Topology.load(
      """
        |[sources.sm]
        |  type = "static_metrics"
        |  namespace = "demo"
        |  [[sources.sm.metrics]]
        |    name = "capacity"
        |    kind = "absolute"
        |    [sources.sm.metrics.value.gauge]
        |      value = 64.0
        |    [sources.sm.metrics.tags]
        |      pool = "default"
        |  [[sources.sm.metrics]]
        |    name = "restarts"
        |    kind = "incremental"
        |    [sources.sm.metrics.value.counter]
        |      value = 2.0
        |    [sources.sm.metrics.tags]
        |      pool = "default"
        |[transforms.l2m]
        |  inputs = ["events"]
        |  type = "log_to_metric"
        |  [[transforms.l2m.metrics]]
        |    type = "counter"
        |    field = "event_type"
        |    name = "ev_total"
        |    [transforms.l2m.metrics.tags]
        |      type = "{{event_type}}"
        |[transforms.agg]
        |  inputs = ["sm", "l2m"]
        |  type = "aggregate"
        |  interval_ms = 86400000
        |  mode = "auto"
        |""".stripMargin)
    val src = topo.loadSources(s)
    topo.run(src + ("events" -> frame))("agg").df
      .select(col("name"), col("namespace"), col("tags"), col("kind"),
        col("value_type"), col("value"), unix_timestamp(col("ts")).as("win"))
      .orderBy("name", "tags", "win")
  }

  private val oracleConfigObserve: String = {
    val win = "CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT)"
    s"""WITH counters AS (
         SELECT 'ev_total' AS name, CAST(NULL AS VARCHAR) AS namespace,
           'type=' || event_type AS tags,
           'incremental' AS kind, 'counter' AS value_type,
           CAST(count(*) AS DOUBLE) AS value, $win AS win
         FROM events WHERE event_type IS NOT NULL
         GROUP BY event_type, $win
       ),
       static AS (
         SELECT 'capacity' AS name, 'demo' AS namespace,
           'pool=default' AS tags, 'absolute' AS kind, 'gauge' AS value_type,
           CAST(64.0 AS DOUBLE) AS value, CAST(NULL AS BIGINT) AS win
         UNION ALL
         SELECT 'restarts', 'demo', 'pool=default', 'incremental', 'counter',
           CAST(2.0 AS DOUBLE), CAST(NULL AS BIGINT)
       )
       SELECT * FROM counters UNION ALL SELECT * FROM static
       ORDER BY name, tags, win"""
  }

  /** `exec` config source end-to-end with a DETERMINISTIC command:
    * a fixed printf through the kv decode chain (bytes codec → remap
    * parse_key_value), selecting only the machine-independent columns
    * (stream + parsed fields; pid/host are real but excluded). Proves
    * the exec source's line capture, stream tagging, and codec path
    * against literal DuckDB rows.
    */
  private def qConfigExec(s: SparkSession, dir: String): DataFrame = {
    val topo = Topology.load(
      """
        |[sources.cmd]
        |  type = "exec"
        |  mode = "scheduled"
        |  command = ["/bin/sh", "-c", "printf 'k=a v=1\\nk=b v=2\\nk=c v=3\\n'; echo 'boom' >&2"]
        |[transforms.parse]
        |  inputs = ["cmd"]
        |  type = "remap"
        |  source = '''
        |    if .stream == "stdout" {
        |      kv = parse_key_value!(.message)
        |      .k = to_string!(kv.k)
        |      .v = to_int!(kv.v)
        |    }
        |  '''
        |""".stripMargin)
    val src = topo.loadSources(s)
    topo.run(src)("parse").df
      .select(col("stream"), col("message"), col("k"),
        col("v").cast("long").as("v"))
      .orderBy("stream", "message")
  }

  private val oracleConfigExec: String =
    """SELECT * FROM (VALUES
         ('stdout', 'k=a v=1', 'a', CAST(1 AS BIGINT)),
         ('stdout', 'k=b v=2', 'b', CAST(2 AS BIGINT)),
         ('stdout', 'k=c v=3', 'c', CAST(3 AS BIGINT)),
         ('stderr', 'boom', CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT))
       ) AS t(stream, message, k, v)
       ORDER BY stream, message"""

  /** `syslog` config source end-to-end: a framed capture derived from
    * `events` (even event_ids octet-counted per RFC 6587, odd ones
    * newline-framed — the sniff handles both), written as a multi-file
    * text dir (each part file framed independently — the parallel
    * unit at scale), replayed through `type = "syslog"` → RFC 5424
    * parse → a filter dropping the empty separator frames the text
    * writer's record terminator leaves after counted payloads. The
    * oracle recomputes every parsed field directly from `events` —
    * an independent derivation, no string parsing shared.
    */
  private def qConfigSyslog(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.table(s, dir, "events")
    val line = concat(
      lit("<"), (col("user_id") % 8 + 9).cast("int"), lit(">1 "),
      date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
      lit(" host-"), col("user_id") % 5,
      lit(" "), col("event_type"), lit(" "), col("event_id") % 100,
      lit(" ID"), col("event_id") % 10, lit(" - event "), col("event_id"))
    val wire = e.select(
      when(col("event_id") % 2 === 0,
        concat(octet_length(line).cast("string"), lit(" "), line))
        .otherwise(line).as("value"))
    val out = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_syslog_capture")
    // the replay's parallelism IS the file count (one framer state
    // machine per capture file): a single-file capture would frame on
    // one core regardless of cluster size
    wire.repartition(32).write.mode("overwrite").text(out.getAbsolutePath)
    val topo = Topology.load(
      s"""
         |[sources.logs]
         |  type = "syslog"
         |  path = "${out.getAbsolutePath}"
         |[transforms.ok]
         |  inputs = ["logs"]
         |  type = "filter"
         |  condition = '.appname != null'
         |""".stripMargin)
    topo.run(topo.loadSources(s))("ok").df
      .select(
        element_at(split(col("message"), " "), 2).cast("bigint").as("event_id"),
        col("appname"), col("hostname"), col("severity"), col("facility"),
        col("version"), col("procid"), col("msgid"), col("message"),
        date_format(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("ts_iso"),
        col("host"), col("source_type"))
      .orderBy("event_id")
  }

  private val oracleConfigSyslog: String =
    """SELECT event_id,
         event_type AS appname,
         'host-' || (user_id % 5) AS hostname,
         CASE (user_id % 8 + 9) % 8
           WHEN 0 THEN 'emerg' WHEN 1 THEN 'alert' WHEN 2 THEN 'crit'
           WHEN 3 THEN 'err' WHEN 4 THEN 'warning' WHEN 5 THEN 'notice'
           WHEN 6 THEN 'info' ELSE 'debug' END AS severity,
         CASE (user_id % 8 + 9) // 8
           WHEN 1 THEN 'user' ELSE 'mail' END AS facility,
         CAST(1 AS BIGINT) AS version,
         CAST(event_id % 100 AS VARCHAR) AS procid,
         'ID' || (event_id % 10) AS msgid,
         'event ' || event_id AS message,
         strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS ts_iso,
         'host-' || (user_id % 5) AS host,
         'syslog' AS source_type
       FROM events ORDER BY event_id"""

  /** `opentelemetry` config source, batch capture-replay arm: every
    * event row becomes one protobuf ExportLogsServiceRequest frame
    * (resource service.name attribute, one log record carrying
    * time / severity number+text / body / an event_type attribute),
    * length-framed into one capture file per partition (the replay's
    * parallel unit), then decoded back by `type = "opentelemetry"`.
    * The oracle recomputes every decoded field arithmetically from
    * `events` — the only byte path is the protobuf round-trip, so a
    * wire-offset or framing bug breaks the match.
    */
  private def qConfigOtlp(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.table(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        // ts is TIMESTAMP_NTZ in the parquet; the session is pinned
        // UTC, so the cast is the identity instant DuckDB's epoch_us
        // computes on the same naive value
        unix_micros(col("ts").cast("timestamp")).as("tmicros"))
      .as[(Long, Long, String, Long)]
    val out = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_otlp_capture")
    if (out.exists()) out.listFiles().foreach(_.delete())
    out.mkdirs()
    e.repartition(32).foreachPartition {
      it: Iterator[(Long, Long, String, Long)] =>
        import graft.functions.ProtoWire.Writer
        def u8(x: String) = x.getBytes("UTF-8")
        val sevNames = Seq("TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL")
        val buf = new java.io.ByteArrayOutputStream()
        it.foreach { case (eventId, userId, eventType, tmicros) =>
          val body = new Writer; body.writeLenDelim(1, u8(s"event $eventId"))
          val attrVal = new Writer; attrVal.writeLenDelim(1, u8(eventType))
          val attr = new Writer
          attr.writeLenDelim(1, u8("event_type"))
          attr.writeLenDelim(2, attrVal.toBytes)
          val rec = new Writer
          rec.writeTag(1, 1).writeFixed64(tmicros * 1000L)
          rec.writeTag(2, 0).writeVarint(eventId % 24 + 1)
          rec.writeLenDelim(3, u8(sevNames((eventId % 6).toInt)))
          rec.writeLenDelim(5, body.toBytes)
          rec.writeLenDelim(6, attr.toBytes)
          val resAttrVal = new Writer
          resAttrVal.writeLenDelim(1, u8(s"svc-${userId % 5}"))
          val resAttr = new Writer
          resAttr.writeLenDelim(1, u8("service.name"))
          resAttr.writeLenDelim(2, resAttrVal.toBytes)
          val res = new Writer; res.writeLenDelim(1, resAttr.toBytes)
          val scopeLogs = new Writer; scopeLogs.writeLenDelim(2, rec.toBytes)
          val resourceLogs = new Writer
          resourceLogs.writeLenDelim(1, res.toBytes)
          resourceLogs.writeLenDelim(2, scopeLogs.toBytes)
          val frame = new Writer().writeLenDelim(1, resourceLogs.toBytes).toBytes
          // 4-byte big-endian length prefix (length_delimited default)
          buf.write(Array[Byte](
            ((frame.length >> 24) & 0xff).toByte,
            ((frame.length >> 16) & 0xff).toByte,
            ((frame.length >> 8) & 0xff).toByte,
            (frame.length & 0xff).toByte))
          buf.write(frame)
        }
        if (buf.size() > 0) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          java.nio.file.Files.write(
            new java.io.File(out, f"part-$pid%05d.bin").toPath, buf.toByteArray)
        }
        ()
    }
    val topo = Topology.load(
      s"""
         |[sources.otel]
         |  type = "opentelemetry"
         |  path = "${out.getAbsolutePath}"
         |  [sources.otel.framing]
         |    method = "length_delimited"
         |""".stripMargin)
    topo.loadSources(s)("otel").df
      .select(
        col("resourceLogs").getItem(0).getField("scopeLogs").getItem(0)
          .getField("logRecords").getItem(0).as("r"),
        col("resourceLogs").getItem(0).getField("resource")
          .getField("attributes").getItem(0).getField("value")
          .getField("stringValue").as("service"))
      .select(
        element_at(split(col("r.body.stringValue"), " "), 2)
          .cast("bigint").as("event_id"),
        col("r.timeUnixNano").as("time_nanos"),
        col("r.severityNumber").as("severity_number"),
        col("r.severityText").as("severity_text"),
        col("r.body.stringValue").as("body"),
        col("r.attributes").getItem(0).getField("value")
          .getField("stringValue").as("event_type"),
        col("service"))
      .orderBy("event_id")
  }

  private val oracleConfigOtlp: String =
    """SELECT event_id,
         CAST(epoch_us(ts) AS BIGINT) * 1000 AS time_nanos,
         event_id % 24 + 1 AS severity_number,
         CASE event_id % 6
           WHEN 0 THEN 'TRACE' WHEN 1 THEN 'DEBUG' WHEN 2 THEN 'INFO'
           WHEN 3 THEN 'WARN' WHEN 4 THEN 'ERROR' ELSE 'FATAL'
         END AS severity_text,
         'event ' || event_id AS body,
         event_type,
         'svc-' || (user_id % 5) AS service
       FROM events ORDER BY event_id"""

  /** `fluent` config source, batch capture-replay arm: every event row
    * becomes one forward-protocol msgpack message — even event_ids in
    * Message mode `[tag, EventTime, record]`, odd ones in Forward mode
    * `[tag, [[EventTime, record]]]` (both wire shapes decode through
    * the same kernel) — packed into one capture file per partition.
    * EventTime nanos use exact quarter-seconds so the double epoch
    * math is bit-stable across engines. The oracle recomputes every
    * decoded column from `events`; the only byte path is the msgpack
    * round-trip.
    */
  private def qConfigFluent(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.table(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_seconds(col("ts").cast("timestamp")).as("tsec"))
      .as[(Long, Long, String, Long)]
    val out = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_fluent_capture")
    if (out.exists()) out.listFiles().foreach(_.delete())
    out.mkdirs()
    e.repartition(32).foreachPartition {
      it: Iterator[(Long, Long, String, Long)] =>
        import graft.functions.MsgPack.Writer
        val buf = new java.io.ByteArrayOutputStream()
        it.foreach { case (eventId, userId, eventType, tsec) =>
          val ns = (eventId % 4) * 250000000L
          def rec(): Array[Byte] = new Writer().writeMapHeader(3)
            .writeStr("msg").writeStr(s"event $eventId")
            .writeStr("user").writeLong(userId)
            .writeStr("lvl").writeLong(eventId % 8).toBytes
          if (eventId % 2 == 0) {
            // Message mode
            buf.write(new Writer().writeArrayHeader(3)
              .writeStr(s"app.$eventType").writeEventTime(tsec, ns).toBytes)
            buf.write(rec())
          } else {
            // Forward mode, one entry
            buf.write(new Writer().writeArrayHeader(2)
              .writeStr(s"app.$eventType").toBytes)
            buf.write(new Writer().writeArrayHeader(1).toBytes)
            buf.write(new Writer().writeArrayHeader(2)
              .writeEventTime(tsec, ns).toBytes)
            buf.write(rec())
          }
        }
        if (buf.size() > 0) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          java.nio.file.Files.write(
            new java.io.File(out, f"part-$pid%05d.msgpack").toPath,
            buf.toByteArray)
        }
        ()
    }
    val topo = Topology.load(
      s"""
         |[sources.fwd]
         |  type = "fluent"
         |  path = "${out.getAbsolutePath}"
         |""".stripMargin)
    topo.loadSources(s)("fwd").df
      .select(
        element_at(split(col("msg"), " "), 2).cast("bigint").as("event_id"),
        col("tag"), col("msg"), col("user"), col("lvl"),
        unix_millis(col("timestamp")).as("time_ms"))
      .orderBy("event_id")
  }

  private val oracleConfigFluent: String =
    """SELECT event_id,
         'app.' || event_type AS tag,
         'event ' || event_id AS msg,
         user_id AS "user",
         event_id % 8 AS lvl,
         CAST(epoch_us(ts) // 1000000 AS BIGINT) * 1000
           + (event_id % 4) * 250 AS time_ms
       FROM events ORDER BY event_id"""

  /** `logstash` config source, batch capture-replay arm: every event
    * row becomes one lumberjack v2 json frame, every third wrapped in
    * its own zlib compressed frame (both wire paths through the same
    * kernel, identical decoded rows). `@timestamp` carries the event
    * time at second precision and parses into the `timestamp` column.
    * The oracle recomputes every decoded field from `events`.
    */
  private def qConfigLogstash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.table(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("iso"))
      .as[(Long, Long, String)]
    val out = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_logstash_capture")
    if (out.exists()) out.listFiles().foreach(_.delete())
    out.mkdirs()
    e.repartition(32).foreachPartition { it: Iterator[(Long, Long, String)] =>
      def u32(v: Long): Array[Byte] = Array[Byte](
        ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      val buf = new java.io.ByteArrayOutputStream()
      it.foreach { case (eventId, userId, iso) =>
        val payload =
          (s"""{"msg":"event $eventId","user":$userId,""" +
            s""""lvl":${eventId % 8},"@timestamp":"$iso"}""").getBytes("UTF-8")
        val frame = Array[Byte]('2', 'J') ++ u32(eventId % 1000000) ++
          u32(payload.length.toLong) ++ payload
        if (eventId % 3 == 0) {
          val deflater = new java.util.zip.Deflater()
          deflater.setInput(frame); deflater.finish()
          val cbuf = new Array[Byte](frame.length * 2 + 64)
          val n = deflater.deflate(cbuf)
          deflater.end()
          buf.write(Array[Byte]('2', 'C'))
          buf.write(u32(n.toLong))
          buf.write(cbuf, 0, n)
        } else buf.write(frame)
      }
      if (buf.size() > 0) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        java.nio.file.Files.write(
          new java.io.File(out, f"part-$pid%05d.lumberjack").toPath,
          buf.toByteArray)
      }
      ()
    }
    val topo = Topology.load(
      s"""
         |[sources.beats]
         |  type = "logstash"
         |  path = "${out.getAbsolutePath}"
         |""".stripMargin)
    topo.loadSources(s)("beats").df
      .select(
        element_at(split(col("msg"), " "), 2).cast("bigint").as("event_id"),
        col("msg"), col("user"), col("lvl"),
        unix_millis(col("timestamp")).as("time_ms"),
        col("source_type"))
      .orderBy("event_id")
  }

  private val oracleConfigLogstash: String =
    """SELECT event_id,
         'event ' || event_id AS msg,
         user_id AS "user",
         event_id % 8 AS lvl,
         CAST(epoch_us(ts) // 1000000 AS BIGINT) * 1000 AS time_ms,
         'logstash' AS source_type
       FROM events ORDER BY event_id"""

  val spark: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q_config_pipeline" -> (qConfigPipeline _),
    "q_config_enrich" -> (qConfigEnrich _),
    "q_config_metrics" -> (qConfigMetrics _),
    "q_config_tag_limit" -> (qConfigTagLimit _),
    "q_config_window" -> (qConfigWindow _),
    "q_config_lua" -> (qConfigLua _),
    "q_config_observe" -> (qConfigObserve _),
    "q_config_exec" -> (qConfigExec _),
    "q_config_syslog" -> (qConfigSyslog _),
    "q_config_otlp" -> (qConfigOtlp _),
    "q_config_fluent" -> (qConfigFluent _),
    "q_config_logstash" -> (qConfigLogstash _)
  )

  val oracle: ListMap[String, String] = ListMap(
    "q_config_pipeline" -> oracleConfigPipeline,
    "q_config_enrich" -> oracleConfigEnrich,
    "q_config_metrics" -> oracleConfigMetrics,
    "q_config_tag_limit" -> oracleConfigTagLimit,
    "q_config_window" -> oracleConfigWindow,
    "q_config_lua" -> oracleConfigLua,
    "q_config_observe" -> oracleConfigObserve,
    "q_config_exec" -> oracleConfigExec,
    "q_config_syslog" -> oracleConfigSyslog,
    "q_config_otlp" -> oracleConfigOtlp,
    "q_config_fluent" -> oracleConfigFluent,
    "q_config_logstash" -> oracleConfigLogstash
  )
}
