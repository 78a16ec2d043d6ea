package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.immutable.ListMap

import graft.Oracle
import graft.functions.Parsers
import graft.sources.Tables

/** Oracle-gated queries for the codec/parse surface (SURVEY.md §2.6-2.7).
  *
  * Each query synthesizes a wire-format line deterministically from the
  * `events` table columns (ints/strings only — double→string formatting
  * is not portable across engines), parses it back, and outputs the
  * extracted typed fields. The construction SQL is mirrored per dialect;
  * the grok-based extraction regex is the SAME compiled pattern in both
  * engines (single source of truth, like Oracle.parsedCte).
  */
object ParserQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "events")

  private val isoFmt = "yyyy-MM-dd'T'HH:mm:ss'Z'"

  // ---------------------------------------------------------- parse_json
  private def qParseJson(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("j", Parsers.parseJson(col("props"),
        StructType(Seq(StructField("k", IntegerType)))))
      .select(col("event_id"), col("j").getField("k").as("k"))
      .orderBy("event_id")

  // ---------------------------------------------------------- parse_key_value
  private def kvLine: Column = concat(
    lit("user="), col("user_id"),
    lit(" type="), col("event_type"),
    lit(" value="), floor(col("value")).cast("long"))

  private def qParseKv(s: SparkSession, dir: String): DataFrame = {
    val m = Parsers.parseKeyValue(kvLine)
    events(s, dir).select(
        col("event_id"),
        m.getItem("user").cast("long").as("user"),
        m.getItem("type").as("type"),
        m.getItem("value").cast("long").as("value_int"))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------- parse_csv
  private def csvLine: Column = concat_ws(",",
    col("event_id"), col("event_type"), col("user_id"))

  private def qParseCsv(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("etype", StringType),
      StructField("uid", LongType)))
    events(s, dir)
      .withColumn("c", Parsers.parseCsv(csvLine, schema))
      .select(col("c.id").as("id"), col("c.etype").as("etype"),
        col("c.uid").as("uid"))
      .orderBy("id")
  }

  // ---------------------------------------------------------- parse_url
  private def urlLine: Column = concat(
    lit("https://svc.example.com/api/"), col("event_type"),
    lit("/v1?u="), col("user_id"), lit("&k="), floor(col("value")).cast("long"))

  private def qParseUrl(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
        col("event_id"),
        Parsers.urlHost(urlLine).as("host"),
        Parsers.urlPath(urlLine).as("path"),
        Parsers.urlQueryParam(urlLine, "u").cast("long").as("u"),
        Parsers.urlQueryParam(urlLine, "k").cast("long").as("k"))
      .orderBy("event_id")

  // ---------------------------------------------------------- parse_syslog
  private def syslogLine: Column = concat(
    lit("<"), (col("user_id") % 8 + 9).cast("int"), lit(">1 "),
    date_format(col("ts"), isoFmt), lit(" host-"), col("user_id") % 5,
    lit(" "), col("event_type"), lit(" "), col("event_id") % 100,
    lit(" ID"), col("event_id") % 10, lit(" - event "), col("event_id"))

  private def qParseSyslog(s: SparkSession, dir: String): DataFrame = {
    val g = Parsers.syslog5424
    val cols = g.columns(syslogLine).toMap
    events(s, dir).select(
        col("event_id"),
        cols("pri").cast("int").as("pri"),
        cols("sts").as("sts"),
        cols("hostname").as("hostname"),
        cols("appname").as("appname"),
        cols("procid").cast("int").as("procid"),
        cols("msgid").as("msgid"),
        cols("message").as("message"))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------- parse_apache_log
  private def apacheLine: Column = concat(
    lit("10.0."), col("user_id") % 256, lit(".1 - frank ["),
    date_format(col("ts"), "dd/MMM/yyyy:HH:mm:ss"), lit(" +0000] \"GET /"),
    col("event_type"), lit(" HTTP/1.1\" "),
    when(col("event_type") === "error", 500).otherwise(200), lit(" "),
    floor(col("value") * 100).cast("long"))

  private def qParseApache(s: SparkSession, dir: String): DataFrame = {
    val g = Parsers.apacheCommon
    val cols = g.columns(apacheLine).toMap
    events(s, dir).select(
        col("event_id"),
        cols("client").as("client"),
        cols("atime").as("atime"),
        cols("method").as("method"),
        cols("apath").as("apath"),
        cols("status").cast("int").as("status"),
        // nullif before the cast: CLFSIZE admits the '-' placeholder,
        // which must read as null, not an ANSI cast error
        nullif(cols("bytes"), lit("-")).cast("long").as("bytes"))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------- parse_nginx
  private def nginxLine: Column = concat(
    lit("10.0."), col("user_id") % 256, lit(".1 - alice ["),
    date_format(col("ts"), "dd/MMM/yyyy:HH:mm:ss"), lit(" +0000] \"GET /"),
    col("event_type"), lit(" HTTP/1.1\" "),
    when(col("event_type") === "error", 500).otherwise(200), lit(" "),
    floor(col("value") * 100).cast("long"),
    lit(" \"https://ref.example.com/p"), col("user_id") % 10,
    lit("\" \"agent/"), col("event_id") % 5, lit("\""))

  private def qParseNginx(s: SparkSession, dir: String): DataFrame = {
    val g = Parsers.nginxCombined
    val cols = g.columns(nginxLine).toMap
    events(s, dir).select(
        col("event_id"),
        cols("remote_addr").as("remote_addr"),
        cols("remote_user").as("remote_user"),
        cols("time_local").as("time_local"),
        cols("method").as("method"),
        cols("request_path").as("request_path"),
        cols("status").cast("int").as("status"),
        nullif(cols("body_bytes"), lit("-")).cast("long").as("body_bytes"),
        cols("referer").as("referer"),
        cols("agent").as("agent"))
      .orderBy("event_id")
  }

  private def nginxErrLine: Column = concat(
    date_format(col("ts"), "yyyy/MM/dd HH:mm:ss"), lit(" ["),
    element_at(array(lit("error"), lit("warn"), lit("crit")),
      (col("event_id") % 3 + 1).cast("int")),
    lit("] "), col("user_id"), lit("#"), col("user_id") % 8,
    lit(": *"), col("event_id"), lit(" open() failed ev "), col("event_id"))

  private def qParseNginxErr(s: SparkSession, dir: String): DataFrame = {
    val g = Parsers.nginxError
    val cols = g.columns(nginxErrLine).toMap
    events(s, dir).select(
        col("event_id"),
        cols("etime").as("etime"),
        cols("elevel").as("elevel"),
        cols("pid").cast("long").as("pid"),
        cols("tid").cast("long").as("tid"),
        cols("cid").cast("long").as("cid"),
        cols("emsg").as("emsg"))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------- influx line protocol
  /** encode → parse round-trip; oracle derives expectations from the
    * source columns (independent check).
    */
  private def qInflux(s: SparkSession, dir: String): DataFrame = {
    val line = Parsers.encodeInflux(
      col("event_type"),
      tags = Seq(
        "host"   -> concat(lit("h"), col("user_id") % 5),
        "region" -> concat(lit("r"), col("user_id") % 3)),
      fields = Seq(
        "count" -> concat((col("event_id") % 97).cast("string"), lit("i")),
        "value" -> concat(floor(col("value") * 100).cast("long").cast("string"), lit("i"))),
      tsNanos = unix_timestamp(col("ts")) * lit(1000000000L))
    events(s, dir).select(
        col("event_id"),
        Parsers.influxMeasurement(line).as("measurement"),
        Parsers.influxTags(line).getItem("host").as("host"),
        Parsers.influxTags(line).getItem("region").as("region"),
        Parsers.influxInt(Parsers.influxFields(line).getItem("count")).as("count"),
        Parsers.influxInt(Parsers.influxFields(line).getItem("value")).as("value_int"),
        (Parsers.influxTsNanos(line) / lit(1000000000L)).cast("long").as("ts_sec"))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------- parse_glog
  private def glogLine: Column = concat(
    element_at(array(lit("I"), lit("W"), lit("E"), lit("F")),
      (col("event_id") % 4 + 1).cast("int")),
    lit("0817 02:34:56."), lpad((col("event_id") % 1000000).cast("string"), 6, "0"),
    lit(" "), col("user_id"), lit(" reactor"), col("event_id") % 7,
    lit(".cc:"), col("event_id") % 997, lit("] msg "), col("event_id"))

  private def qParseGlog(s: SparkSession, dir: String): DataFrame = {
    val g = Parsers.glog
    val cols = g.columns(glogLine).toMap
    events(s, dir).select(
        col("event_id"),
        cols("glevel").as("glevel"),
        cols("gtime").as("gtime"),
        cols("threadid").cast("long").as("threadid"),
        cols("gfile").as("gfile"),
        cols("gline").cast("int").as("gline"),
        cols("gmsg").as("gmsg"))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------- gelf
  /** encode → parse round-trip; the oracle derives the expected fields
    * straight from the source columns (independent check).
    */
  private def qGelf(s: SparkSession, dir: String): DataFrame = {
    val enc = Parsers.encodeGelf(
      concat(lit("host-"), col("user_id") % 5), col("event_type"),
      col("user_id").cast("double"), (col("event_id") % 8).cast("int"))
    val p = Parsers.parseGelf(enc)
    events(s, dir).select(
        col("event_id"),
        p.getField("version").as("version"),
        p.getField("host").as("host"),
        p.getField("short_message").as("short_message"),
        p.getField("timestamp").cast("long").as("ts_sec"),
        p.getField("level").as("level"))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------- cef
  private def qCef(s: SparkSession, dir: String): DataFrame = {
    val cef = Parsers.encodeCef("graft", "pipeline", "1.0",
      (col("event_id") % 100).cast("string"), col("event_type"),
      (col("event_id") % 10).cast("string"),
      Seq("src" -> concat(lit("10.0.0."), col("user_id") % 256),
        "cnt" -> (col("event_id") % 7).cast("string")))
    events(s, dir).select(
        col("event_id"),
        Parsers.cefHeader(cef, 4).cast("int").as("sig_id"),
        Parsers.cefHeader(cef, 5).as("name"),
        Parsers.cefHeader(cef, 6).cast("int").as("severity"),
        Parsers.cefExtension(cef).getItem("src").as("src"),
        Parsers.cefExtension(cef).getItem("cnt").cast("int").as("cnt"))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------- statsd
  /** statsd/DogStatsD lines cycling the five wire arms: plain counter,
    * sampled+tagged counter, gauge (absolute and `+`-signed
    * incremental, with a space in the key exercising sanitization),
    * sampled timer (ms→seconds, weight-2 samples), set. The oracle
    * recomputes every decoded field arithmetically — no parsing
    * shared.
    */
  private def statsdLine: Column = {
    val i = col("event_id")
    val e = col("event_type")
    when(i % 5 === 0, concat(lit("req_"), e, lit(":"), i % 50, lit("|c")))
      .when(i % 5 === 1, concat(lit("req_"), e, lit(":"), i % 50,
        lit("|c|@0.5|#region:eu,env:prod")))
      .when(i % 5 === 2, concat(lit("temp "), e, lit(":"),
        when(i % 2 === 1, lit("+")).otherwise(lit("")), i % 40, lit("|g")))
      .when(i % 5 === 3, concat(lit("lat_"), e, lit(":"), i % 100, lit("|ms|@0.5")))
      .otherwise(concat(lit("users_"), e, lit(":"), i % 7, lit("|s")))
  }

  private def qStatsd(s: SparkSession, dir: String): DataFrame = {
    // the staged form: the one-Column parse tree re-embeds shared
    // subtrees ~450x per row (see StatsdCodec.withParsed)
    // no filter(m.isNotNull): predicate pushdown would alias-substitute
    // m through every stage, re-embedding the whole parse tree in the
    // Filter; the explode below already drops null-m rows (a null
    // weight makes sequence() null, and exploding a null array emits
    // nothing)
    graft.functions.StatsdCodec
      .withParsed(events(s, dir).select(col("event_id"), statsdLine.as("__l")),
        col("__l"), "m")
      .drop("__l")
      .select(col("event_id"), col("m.name").as("name"),
        col("m.kind").as("kind"), col("m.value_type").as("value_type"),
        col("m.value").as("value"), col("m.tags").as("tags"),
        explode(when(col("m.weight") >= 1, sequence(lit(1L), col("m.weight"))))
          .as("sample"))
      .orderBy("event_id", "sample")
  }

  private val statsdOracleSql: String =
    """WITH base AS (
         SELECT event_id, event_type, event_id % 5 AS arm FROM events
       ), rows_w AS (
         SELECT b.*, s.sample FROM base b
         JOIN (SELECT 1 AS sample UNION ALL SELECT 2) s
           ON s.sample <= (CASE WHEN b.arm = 3 THEN 2 ELSE 1 END)
       )
       SELECT event_id,
         CASE arm
           WHEN 0 THEN 'req_' || event_type
           WHEN 1 THEN 'req_' || event_type
           WHEN 2 THEN 'temp_' || event_type
           WHEN 3 THEN 'lat_' || event_type
           ELSE 'users_' || event_type END AS name,
         CASE WHEN arm = 2 AND event_id % 2 = 0 THEN 'absolute'
              ELSE 'incremental' END AS kind,
         CASE arm WHEN 0 THEN 'counter' WHEN 1 THEN 'counter'
           WHEN 2 THEN 'gauge' WHEN 3 THEN 'distribution'
           ELSE 'set' END AS value_type,
         CASE arm
           WHEN 0 THEN CAST(event_id % 50 AS DOUBLE)
           WHEN 1 THEN CAST(event_id % 50 AS DOUBLE) * 2.0
           WHEN 2 THEN CAST(event_id % 40 AS DOUBLE)
           WHEN 3 THEN CAST(event_id % 100 AS DOUBLE) * 0.001
           ELSE CAST(event_id % 7 AS DOUBLE) END AS value,
         CASE WHEN arm = 1 THEN 'env=prod,region=eu' END AS tags,
         CAST(sample AS BIGINT) AS sample
       FROM rows_w ORDER BY event_id, sample"""

  // ------------------------------------------------- prometheus text
  /** A deterministic absolute scrape snapshot (counter family with
    * per-service labels, one escaped-quote label value, a gauge, a set
    * family, a distribution spread across the default buckets in exact
    * 0.25 steps so double→string formatting is portable), rendered to
    * exposition lines. The oracle string-builds the same lines —
    * headers, label sorting, cumulative `le` counts — in DuckDB.
    */
  private def promFixture(s: SparkSession, dir: String): DataFrame = {
    val i = col("event_id")
    val e = events(s, dir)
    val counters = e.groupBy(col("event_type")).agg(
      sum(i % 10).cast("double").as("value"))
      .select(lit("requests").as("name"), lit("app").as("namespace"),
        concat(lit("svc="), col("event_type")).as("tags"),
        lit("absolute").as("kind"), lit("counter").as("value_type"),
        col("value"))
    // every family is multi-series (per-host gauge, per-svc set) so no
    // exposition group has a constant key — a single-series family
    // would funnel its final agg into one partition (bounded by
    // map-side combine, but needlessly flagged at scale); the
    // null-tags/bare-name rendering arm keeps spec coverage in
    // StatsdPromSpec
    val gauge = e.groupBy((i % 3).as("host"))
      .agg(sum(i % 4).cast("double").as("value"))
      .select(lit("queue_depth").as("name"),
        lit(null).cast("string").as("namespace"),
        concat(lit("host="), col("host"), lit(",path=a\"b")).as("tags"),
        lit("absolute").as("kind"),
        lit("gauge").as("value_type"), col("value"))
    val sets = e.select(lit("users").as("name"), lit("app").as("namespace"),
      concat(lit("svc="), col("event_type")).as("tags"),
      lit("absolute").as("kind"),
      lit("set").as("value_type"), (i % 13).cast("double").as("value"))
    val dist = e.select(lit("latency").as("name"), lit("app").as("namespace"),
      concat(lit("svc="), col("event_type")).as("tags"),
      lit("absolute").as("kind"), lit("distribution").as("value_type"),
      ((i % 20) * lit(0.25)).cast("double").as("value"))
    counters.unionByName(gauge).unionByName(sets).unionByName(dist)
      .withColumn("ts", lit(null).cast("timestamp"))
  }

  private def qPrometheus(s: SparkSession, dir: String): DataFrame =
    graft.operators.Prometheus.exposition(promFixture(s, dir))
      .orderBy("fullname", "ord")

  /** render → parse ROUND-TRIP: the exposition of the same fixture fed
    * back through `Prometheus.parseExposition` (the prometheus_scrape
    * source's decoder). The oracle recomputes every parsed row
    * arithmetically from `events` — counter/gauge/set values, the
    * unescaped `path=a"b` label, and the cumulative `le` component
    * rows — so a renderer/parser asymmetry (escaping, value format,
    * group association) breaks the match.
    */
  private def qPromRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val rendered = graft.operators.Prometheus.exposition(promFixture(s, dir))
    graft.operators.Prometheus.parseExposition(
        rendered, col("line"), col("fullname"), col("ord"))
      .select(col("name"), col("tags"), col("kind"), col("value_type"),
        col("value"), col("group_name"), col("group_kind"))
      .orderBy("name", "tags")
  }

  private val prometheusOracleSql: String = {
    // cumulative le counts: one conditional sum per default bucket
    val buckets = graft.operators.Prometheus.DefaultBuckets
    val bucketSel = buckets.zipWithIndex.map { case (b, ix) =>
      val bs = if (b == b.floor) b.toLong.toString else b.toString
      s"SELECT $ix AS sub, 'app_latency_bucket{le=\"$bs\",svc=\"' || event_type || '\"} ' || " +
        s"CAST(sum(CASE WHEN (event_id % 20) * 0.25 <= $b THEN 1 ELSE 0 END) AS VARCHAR) AS line, " +
        "'svc=' || event_type AS tags FROM events GROUP BY event_type"
    }.mkString("\n UNION ALL ")
    s"""WITH fams AS (
         SELECT 'app_requests' AS fullname, 0 AS ord, '# HELP app_requests requests' AS line
         UNION ALL SELECT 'app_requests', 1, '# TYPE app_requests counter'
         UNION ALL SELECT 'queue_depth', 0, '# HELP queue_depth queue_depth'
         UNION ALL SELECT 'queue_depth', 1, '# TYPE queue_depth gauge'
         UNION ALL SELECT 'app_users', 0, '# HELP app_users users'
         UNION ALL SELECT 'app_users', 1, '# TYPE app_users gauge'
         UNION ALL SELECT 'app_latency', 0, '# HELP app_latency latency'
         UNION ALL SELECT 'app_latency', 1, '# TYPE app_latency histogram'
       ), counter_samples AS (
         SELECT 'app_requests' AS fullname, 'svc=' || event_type AS tags, 0 AS sub,
           'app_requests{svc="' || event_type || '"} ' ||
             regexp_replace(CAST(CAST(sum(event_id % 10) AS DOUBLE) AS VARCHAR), '\\.0$$', '') AS line
         FROM events GROUP BY event_type
       ), gauge_samples AS (
         SELECT 'queue_depth' AS fullname,
           'host=' || CAST(event_id % 3 AS VARCHAR) || ',path=a"b' AS tags, 0 AS sub,
           'queue_depth{host="' || CAST(event_id % 3 AS VARCHAR) || '",path="a\\"b"} ' ||
             regexp_replace(CAST(CAST(sum(event_id % 4) AS DOUBLE) AS VARCHAR), '\\.0$$', '') AS line
         FROM events GROUP BY event_id % 3
       ), set_samples AS (
         SELECT 'app_users' AS fullname, 'svc=' || event_type AS tags, 0 AS sub,
           'app_users{svc="' || event_type || '"} ' ||
             CAST(count(DISTINCT event_id % 13) AS VARCHAR) AS line
         FROM events GROUP BY event_type
       ), dist_bucketed AS (
         $bucketSel
       ), dist_inf AS (
         SELECT ${buckets.size} AS sub,
           'app_latency_bucket{le="+Inf",svc="' || event_type || '"} ' ||
             CAST(count(*) AS VARCHAR) AS line,
           'svc=' || event_type AS tags
         FROM events GROUP BY event_type
       ), dist_sum AS (
         SELECT ${buckets.size + 1} AS sub,
           'app_latency_sum{svc="' || event_type || '"} ' ||
             regexp_replace(CAST(sum((event_id % 20) * CAST(0.25 AS DOUBLE)) AS VARCHAR), '\\.0$$', '') AS line,
           'svc=' || event_type AS tags
         FROM events GROUP BY event_type
       ), dist_cnt AS (
         SELECT ${buckets.size + 2} AS sub,
           'app_latency_count{svc="' || event_type || '"} ' ||
             CAST(count(*) AS VARCHAR) AS line,
           'svc=' || event_type AS tags
         FROM events GROUP BY event_type
       ), dist_samples AS (
         SELECT 'app_latency' AS fullname, tags, sub, line FROM dist_bucketed
         UNION ALL SELECT 'app_latency', tags, sub, line FROM dist_inf
         UNION ALL SELECT 'app_latency', tags, sub, line FROM dist_sum
         UNION ALL SELECT 'app_latency', tags, sub, line FROM dist_cnt
       ), samples AS (
         SELECT * FROM counter_samples UNION ALL SELECT * FROM gauge_samples
         UNION ALL SELECT * FROM set_samples UNION ALL SELECT * FROM dist_samples
       ), ordered AS (
         SELECT fullname,
           ROW_NUMBER() OVER (PARTITION BY fullname
             ORDER BY tags NULLS FIRST, sub) + 1 AS ord,
           line
         FROM samples
       )
       SELECT fullname, CAST(ord AS BIGINT) AS ord, line FROM fams
       UNION ALL SELECT fullname, ord, line FROM ordered
       ORDER BY fullname, ord"""
  }

  /** The roundtrip oracle recomputes the PARSED rows directly from
    * `events` — an independent derivation sharing nothing with either
    * the renderer or the parser.
    */
  private val promRoundtripOracleSql: String = {
    val buckets = graft.operators.Prometheus.DefaultBuckets
    val bucketSel = buckets.map { b =>
      val bs = if (b == b.floor) b.toLong.toString else b.toString
      s"""SELECT 'app_latency_bucket' AS name,
            'le=$bs,svc=' || event_type AS tags,
            'gauge' AS value_type,
            CAST(sum(CASE WHEN (event_id % 20) * 0.25 <= $b THEN 1 ELSE 0 END) AS DOUBLE) AS value,
            'app_latency' AS group_name, 'histogram' AS group_kind
          FROM events GROUP BY event_type"""
    }.mkString("\n UNION ALL ")
    s"""WITH parsed AS (
         SELECT 'app_requests' AS name, 'svc=' || event_type AS tags,
           'counter' AS value_type, CAST(sum(event_id % 10) AS DOUBLE) AS value,
           'app_requests' AS group_name, 'counter' AS group_kind
         FROM events GROUP BY event_type
         UNION ALL
         SELECT 'queue_depth', 'host=' || CAST(event_id % 3 AS VARCHAR) || ',path=a"b',
           'gauge', CAST(sum(event_id % 4) AS DOUBLE), 'queue_depth', 'gauge'
         FROM events GROUP BY event_id % 3
         UNION ALL
         SELECT 'app_users', 'svc=' || event_type,
           'gauge', CAST(count(DISTINCT event_id % 13) AS DOUBLE), 'app_users', 'gauge'
         FROM events GROUP BY event_type
         UNION ALL
         $bucketSel
         UNION ALL
         SELECT 'app_latency_bucket', 'le=+Inf,svc=' || event_type,
           'gauge', CAST(count(*) AS DOUBLE), 'app_latency', 'histogram'
         FROM events GROUP BY event_type
         UNION ALL
         SELECT 'app_latency_sum', 'svc=' || event_type,
           'gauge', CAST(sum((event_id % 20) * CAST(0.25 AS DOUBLE)) AS DOUBLE),
           'app_latency', 'histogram'
         FROM events GROUP BY event_type
         UNION ALL
         SELECT 'app_latency_count', 'svc=' || event_type,
           'gauge', CAST(count(*) AS DOUBLE), 'app_latency', 'histogram'
         FROM events GROUP BY event_type
       )
       SELECT name, tags, 'absolute' AS kind, value_type, value,
         group_name, group_kind
       FROM parsed ORDER BY name, tags"""
  }

  // ---------------------------------------------------------- encode
  private def qEncode(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
        col("event_id"),
        Parsers.encodeLogfmt(Seq(
          "id" -> col("event_id"),
          "etype" -> col("event_type"),
          "msg" -> concat(lit("event "), col("event_id")))).as("logfmt"),
        Parsers.encodeJson(Seq(
          "id" -> col("event_id"),
          "etype" -> col("event_type"))).as("json"))
      .orderBy("event_id")

  val spark: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q_parse_json"   -> (qParseJson _),
    "q_parse_kv"     -> (qParseKv _),
    "q_parse_csv"    -> (qParseCsv _),
    "q_parse_url"    -> (qParseUrl _),
    "q_parse_syslog" -> (qParseSyslog _),
    "q_parse_apache" -> (qParseApache _),
    "q_parse_nginx"  -> (qParseNginx _),
    "q_parse_nginx_err" -> (qParseNginxErr _),
    "q_influx"       -> (qInflux _),
    "q_parse_glog"   -> (qParseGlog _),
    "q_gelf"         -> (qGelf _),
    "q_cef"          -> (qCef _),
    "q_encode"       -> (qEncode _),
    "q_statsd"       -> (qStatsd _),
    "q_prometheus"   -> (qPrometheus _),
    "q_prom_roundtrip" -> (qPromRoundtrip _)
  )

  // ====================================================== DuckDB oracle

  private def re(c: graft.functions.Grok.Compiled, line: String, group: Int) =
    s"regexp_extract($line, ${Oracle.lit(c.regex)}, $group)"

  private val kvLineSql =
    "'user=' || user_id || ' type=' || event_type || ' value=' || CAST(floor(value) AS BIGINT)"
  private val urlLineSql =
    "'https://svc.example.com/api/' || event_type || '/v1?u=' || user_id || '&k=' || CAST(floor(value) AS BIGINT)"
  private val syslogLineSql =
    "'<' || (user_id % 8 + 9) || '>1 ' || strftime(ts, '%Y-%m-%dT%H:%M:%SZ') || ' host-' || (user_id % 5)" +
      " || ' ' || event_type || ' ' || (event_id % 100) || ' ID' || (event_id % 10) || ' - event ' || event_id"
  private val apacheLineSql =
    "'10.0.' || (user_id % 256) || '.1 - frank [' || strftime(ts, '%d/%b/%Y:%H:%M:%S') || ' +0000] \"GET /'" +
      " || event_type || ' HTTP/1.1\" ' || (CASE WHEN event_type = 'error' THEN 500 ELSE 200 END)" +
      " || ' ' || CAST(floor(value * 100) AS BIGINT)"

  private val nginxLineSql =
    "'10.0.' || (user_id % 256) || '.1 - alice [' || strftime(ts, '%d/%b/%Y:%H:%M:%S') || ' +0000] \"GET /'" +
      " || event_type || ' HTTP/1.1\" ' || (CASE WHEN event_type = 'error' THEN 500 ELSE 200 END)" +
      " || ' ' || CAST(floor(value * 100) AS BIGINT)" +
      " || ' \"https://ref.example.com/p' || (user_id % 10) || '\" \"agent/' || (event_id % 5) || '\"'"

  private val nginxErrLineSql =
    "strftime(ts, '%Y/%m/%d %H:%M:%S') || ' ['" +
      " || (CASE event_id % 3 WHEN 0 THEN 'error' WHEN 1 THEN 'warn' ELSE 'crit' END)" +
      " || '] ' || user_id || '#' || (user_id % 8) || ': *' || event_id" +
      " || ' open() failed ev ' || event_id"

  private val glogLineSql =
    "(CASE event_id % 4 WHEN 0 THEN 'I' WHEN 1 THEN 'W' WHEN 2 THEN 'E' ELSE 'F' END)" +
      " || '0817 02:34:56.' || lpad(CAST(event_id % 1000000 AS VARCHAR), 6, '0')" +
      " || ' ' || user_id || ' reactor' || (event_id % 7) || '.cc:' || (event_id % 997)" +
      " || '] msg ' || event_id"

  val oracle: ListMap[String, String] = {
    val sys = Parsers.syslog5424
    val sysG = sys.fields.zipWithIndex.toMap.map { case (f, i) => f -> (i + 1) }
    val ap = Parsers.apacheCommon
    val apG = ap.fields.zipWithIndex.toMap.map { case (f, i) => f -> (i + 1) }
    val gl = Parsers.glog
    val glG = gl.fields.zipWithIndex.toMap.map { case (f, i) => f -> (i + 1) }
    val ng = Parsers.nginxCombined
    val ngG = ng.fields.zipWithIndex.toMap.map { case (f, i) => f -> (i + 1) }
    val ne = Parsers.nginxError
    val neG = ne.fields.zipWithIndex.toMap.map { case (f, i) => f -> (i + 1) }
    ListMap(
      "q_parse_json" ->
        "SELECT event_id, CAST(props->>'$.k' AS INT) AS k FROM events ORDER BY event_id",
      "q_parse_kv" ->
        s"""WITH l AS (SELECT event_id, $kvLineSql AS line FROM events)
           SELECT event_id,
             TRY_CAST(regexp_extract(line, 'user=([^ ]+)', 1) AS BIGINT) AS user,
             regexp_extract(line, 'type=([^ ]+)', 1) AS type,
             TRY_CAST(regexp_extract(line, 'value=([^ ]+)', 1) AS BIGINT) AS value_int
           FROM l ORDER BY event_id""",
      "q_parse_csv" ->
        """SELECT CAST(string_split(line, ',')[1] AS BIGINT) AS id,
             string_split(line, ',')[2] AS etype,
             CAST(string_split(line, ',')[3] AS BIGINT) AS uid
           FROM (SELECT event_id || ',' || event_type || ',' || user_id AS line
                 FROM events) ORDER BY id""",
      "q_parse_url" ->
        s"""WITH l AS (SELECT event_id, $urlLineSql AS line FROM events)
           SELECT event_id,
             regexp_extract(line, '^https?://([^/?#]+)', 1) AS host,
             regexp_extract(line, '^https?://[^/?#]+([^?#]*)', 1) AS path,
             TRY_CAST(regexp_extract(line, '[?&]u=([^&]*)', 1) AS BIGINT) AS u,
             TRY_CAST(regexp_extract(line, '[?&]k=([^&]*)', 1) AS BIGINT) AS k
           FROM l ORDER BY event_id""",
      "q_parse_syslog" ->
        s"""WITH l AS (SELECT event_id, $syslogLineSql AS line FROM events)
           SELECT event_id,
             CAST(${re(sys, "line", sysG("pri"))} AS INT) AS pri,
             ${re(sys, "line", sysG("sts"))} AS sts,
             ${re(sys, "line", sysG("hostname"))} AS hostname,
             ${re(sys, "line", sysG("appname"))} AS appname,
             CAST(${re(sys, "line", sysG("procid"))} AS INT) AS procid,
             ${re(sys, "line", sysG("msgid"))} AS msgid,
             ${re(sys, "line", sysG("message"))} AS message
           FROM l ORDER BY event_id""",
      "q_parse_apache" ->
        s"""WITH l AS (SELECT event_id, $apacheLineSql AS line FROM events)
           SELECT event_id,
             ${re(ap, "line", apG("client"))} AS client,
             ${re(ap, "line", apG("atime"))} AS atime,
             ${re(ap, "line", apG("method"))} AS method,
             ${re(ap, "line", apG("apath"))} AS apath,
             CAST(${re(ap, "line", apG("status"))} AS INT) AS status,
             CAST(${re(ap, "line", apG("bytes"))} AS BIGINT) AS bytes
           FROM l ORDER BY event_id""",
      "q_parse_nginx" ->
        s"""WITH l AS (SELECT event_id, $nginxLineSql AS line FROM events)
           SELECT event_id,
             ${re(ng, "line", ngG("remote_addr"))} AS remote_addr,
             ${re(ng, "line", ngG("remote_user"))} AS remote_user,
             ${re(ng, "line", ngG("time_local"))} AS time_local,
             ${re(ng, "line", ngG("method"))} AS method,
             ${re(ng, "line", ngG("request_path"))} AS request_path,
             CAST(${re(ng, "line", ngG("status"))} AS INT) AS status,
             CAST(${re(ng, "line", ngG("body_bytes"))} AS BIGINT) AS body_bytes,
             ${re(ng, "line", ngG("referer"))} AS referer,
             ${re(ng, "line", ngG("agent"))} AS agent
           FROM l ORDER BY event_id""",
      "q_parse_nginx_err" ->
        s"""WITH l AS (SELECT event_id, $nginxErrLineSql AS line FROM events)
           SELECT event_id,
             ${re(ne, "line", neG("etime"))} AS etime,
             ${re(ne, "line", neG("elevel"))} AS elevel,
             CAST(${re(ne, "line", neG("pid"))} AS BIGINT) AS pid,
             CAST(${re(ne, "line", neG("tid"))} AS BIGINT) AS tid,
             CAST(${re(ne, "line", neG("cid"))} AS BIGINT) AS cid,
             ${re(ne, "line", neG("emsg"))} AS emsg
           FROM l ORDER BY event_id""",
      "q_parse_glog" ->
        s"""WITH l AS (SELECT event_id, user_id, $glogLineSql AS line FROM events)
           SELECT event_id,
             ${re(gl, "line", glG("glevel"))} AS glevel,
             ${re(gl, "line", glG("gtime"))} AS gtime,
             CAST(${re(gl, "line", glG("threadid"))} AS BIGINT) AS threadid,
             ${re(gl, "line", glG("gfile"))} AS gfile,
             CAST(${re(gl, "line", glG("gline"))} AS INT) AS gline,
             ${re(gl, "line", glG("gmsg"))} AS gmsg
           FROM l ORDER BY event_id""",
      "q_influx" ->
        """SELECT event_id,
             event_type AS measurement,
             'h' || (user_id % 5) AS host,
             'r' || (user_id % 3) AS region,
             CAST(event_id % 97 AS BIGINT) AS count,
             CAST(floor(value * 100) AS BIGINT) AS value_int,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
           FROM events ORDER BY event_id""",
      "q_gelf" ->
        """SELECT event_id, '1.1' AS version,
             'host-' || (user_id % 5) AS host,
             event_type AS short_message,
             user_id AS ts_sec,
             CAST(event_id % 8 AS INT) AS level
           FROM events ORDER BY event_id""",
      "q_cef" ->
        """SELECT event_id,
             CAST(event_id % 100 AS INT) AS sig_id,
             event_type AS name,
             CAST(event_id % 10 AS INT) AS severity,
             '10.0.0.' || (user_id % 256) AS src,
             CAST(event_id % 7 AS INT) AS cnt
           FROM events ORDER BY event_id""",
      "q_encode" ->
        """SELECT event_id,
             'id=' || event_id || ' etype=' || event_type
               || ' msg="event ' || event_id || '"' AS logfmt,
             '{"id":' || event_id || ',"etype":"' || event_type || '"}' AS json
           FROM events ORDER BY event_id""",
      "q_statsd" -> statsdOracleSql,
      "q_prometheus" -> prometheusOracleSql,
      "q_prom_roundtrip" -> promRoundtripOracleSql
    )
  }
}
