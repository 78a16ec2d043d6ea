package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

import graft.functions.{Etld, Vrl, VrlParsers}
import graft.sources.Tables

/** Oracle-gated queries for the VRL long-tail batch (SURVEY.md §2.7
  * row 58): parse_tokens / parse_linux_authorization / parse_bytes /
  * parse_etld / parse_cbor / parse_ruby_hash (q_stdlib_parse3), the AWS
  * log parsers (q_aws_logs), and the misc tier — format_int/number,
  * syslog maps, ANSI strip, base16, percent, punycode, haversine, unix
  * timestamps (q_stdlib_misc2).
  *
  * Input lines are SYNTHESIZED from `events` columns, so the DuckDB
  * oracle derives every expected value independently from the same base
  * columns — the parser is checked against construction, not against a
  * mirrored expression. Functions with no portable DuckDB analog
  * (seahash, community_id, hmac, lz4/snappy, mime_q, uuid_v7) are
  * covered by Stdlib2Spec's reference-vector pins instead.
  */
object Stdlib2Queries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "events")

  private def e: Column = col("event_id")
  private def u: Column = col("user_id")

  // ------------------------------------------------------ q_stdlib_parse3

  private def tokLine: Column = concat(lit("alpha \""), col("event_type"),
    lit(" "), u, lit("\" [grp "), e % 7, lit("] tail"))

  private def authDay: Column = e % 27 + 1
  private def authLine: Column = concat(lit("Mar "), authDay,
    lit(" 01:02:03 host"), u % 5, lit(" sshd["), e % 9999 + 1,
    lit("]: Accepted password for user"), u)

  private def bytesStr: Column = concat(e % 9 + 1, lit("MiB"))

  private def etldHost: Column = concat(lit("svc"), u % 10,
    element_at(array(lit(".example.co.uk"), lit(".github.io"),
      lit(".foo.ck"), lit(".internal.lan")), (e % 4 + 1).cast("int")))

  /** {"a": n} for n < 24 — one CBOR map, key "a", tiny uint value. */
  private def cborHex: Column = concat(lit("a16161"), lpad(hex(e % 24), 2, "0"))

  private def rubyStr: Column =
    concat(lit("{ \"k\" => "), u, lit(", :s => nil }"))

  private def qStdlibParse3(s: SparkSession, dir: String): DataFrame = {
    val toks = VrlParsers.parseTokens(tokLine)
    val auth = VrlParsers.parseLinuxAuthorization(authLine)
    val etld = Etld.parseEtld(etldHost, plusParts = 1)
    events(s, dir).select(
        e.as("event_id"),
        element_at(toks, 2).as("tok_quoted"),
        element_at(toks, 3).as("tok_bracket"),
        size(toks).as("n_toks"),
        auth.getField("appname").as("auth_app"),
        auth.getField("hostname").as("auth_host"),
        auth.getField("procid").as("auth_pid"),
        auth.getField("message").as("auth_msg"),
        auth.getField("timestamp").as("auth_ts"),
        VrlParsers.parseBytes(bytesStr, unit = "B").as("mib_bytes"),
        etld.getField("etld").as("etld"),
        etld.getField("etld_plus").as("etld_plus"),
        etld.getField("known_suffix").cast("int").as("etld_known"),
        Vrl.parseCbor(unhex(cborHex)).as("cbor_json"),
        Vrl.parseRubyHash(rubyStr).as("ruby_json"))
      .orderBy("event_id")
  }

  // ------------------------------------------------------ q_aws_logs

  private def albLine: Column = concat(
    lit("http 2024-01-01T00:00:00.000000Z app/lb/1 10.0."), u % 256,
    lit("."), e % 256, lit(":3456 - 0.000 0.001 0.000 "),
    lit(200) + (e % 3) * 100, lit(" 200 "), e % 1000, lit(" "), u % 5000,
    lit(" \"GET http://site.example/e"), e,
    lit(" HTTP/1.1\" \"curl/8.1\" - - arn:tg \"Root="), e,
    lit("\" \"-\" \"-\" 0 2024-01-01T00:00:00.000000Z \"forward\" \"-\" \"-\" \"-\" \"-\" \"-\" \"-\""))

  private def vpcLine: Column = concat_ws(" ",
    lit("2"), lit("123456789010"), concat(lit("eni-"), e),
    concat(lit("10.1."), u % 256, lit(".5")), lit("10.2.0.9"),
    lit(1024) + e % 100, lit("443"), lit("6"), e % 50, u % 9999,
    lit("1431280876"), lit("1431280934"),
    when(e % 2 === 0, "ACCEPT").otherwise("REJECT"), lit("OK"))

  private def qAwsLogs(s: SparkSession, dir: String): DataFrame = {
    // materialize each parsed struct ONCE: struct(...).getField(k)
    // inside a single projection is rewritten by
    // SimplifyExtractValueOps into k standalone copies of the
    // tokenizing regex (measured 6.3 s vs sub-second at sf0.1). Two
    // projections fix it: CollapseProject refuses to merge when merging
    // would duplicate a non-cheap expression, so the inner select
    // evaluates each parser exactly once per row.
    val parsed = events(s, dir).select(
      e.as("event_id"),
      VrlParsers.parseAwsAlbLog(albLine).as("alb"),
      VrlParsers.parseAwsVpcFlowLog(vpcLine).as("vpc"))
    parsed.select(
        col("event_id"),
        col("alb.client_host").as("alb_client"),
        col("alb.elb_status_code").as("alb_status"),
        col("alb.received_bytes").as("alb_rb"),
        col("alb.sent_bytes").as("alb_sb"),
        col("alb.request_method").as("alb_method"),
        col("alb.request_url").as("alb_url"),
        col("alb.user_agent").as("alb_ua"),
        col("alb.trace_id").as("alb_trace"),
        col("alb.target_processing_time").as("alb_tpt"),
        col("vpc.srcaddr").as("vpc_src"),
        col("vpc.srcport").as("vpc_sport"),
        col("vpc.packets").as("vpc_packets"),
        col("vpc.action").as("vpc_action"))
      .orderBy("event_id")
  }

  // ------------------------------------------------------ q_stdlib_misc2

  private def msg: Column = concat(lit("m"), e, lit("-"), col("event_type"))
  private def fmtVal: Column = u * 1000 + e % 1000 + lit(0.25)
  private def ansiIn: Column =
    concat(lit("\u001b[31m"), col("event_type"), lit("\u001b[0m ok"))
  private def punyIn: Column = element_at(array(lit("café.com"),
    lit("münchen.de"), lit("plain.org")), (e % 3 + 1).cast("int"))
  private def lat1: Column = (u % 90).cast("double")
  private def lon1: Column = (e % 180).cast("double")
  private def lat2: Column = ((u + 10) % 90).cast("double")
  private def lon2: Column = ((e + 20) % 180).cast("double")

  private def qStdlibMisc2(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
        e.as("event_id"),
        Vrl.formatInt(e, 16).as("fmt_hex"),
        Vrl.formatNumber(fmtVal, 2).as("fmt_num"),
        Vrl.toSyslogLevel(e % 8).as("syslog_level"),
        Vrl.toSyslogSeverity(Vrl.toSyslogLevel(e % 8)).as("syslog_sev_rt"),
        Vrl.toSyslogFacility(e % 24).as("syslog_fac"),
        Vrl.toSyslogFacilityCode(Vrl.toSyslogFacility(e % 24)).as("syslog_fac_rt"),
        Vrl.stripAnsiEscapeCodes(ansiIn).as("ansi_stripped"),
        Vrl.encodeBase16(msg).as("b16"),
        Vrl.decodeBase16(Vrl.encodeBase16(msg)).as("b16_rt"),
        Vrl.encodePercent(concat(col("event_type"), lit(" ?"))).as("pct"),
        Vrl.decodePercent(Vrl.encodePercent(concat(col("event_type"), lit(" ?")))).as("pct_rt"),
        Vrl.encodePunycode(punyIn).as("puny"),
        round(Vrl.haversine(lat1, lon1, lat2, lon2).getField("distance"), 4)
          .as("hav_km"),
        date_format(Vrl.fromUnixTimestamp(lit(1700000000L) + e),
          "yyyy-MM-dd'T'HH:mm:ss'Z'").as("unix_iso"),
        Vrl.toUnixTimestamp(Vrl.fromUnixTimestamp(lit(1700000000L) + e))
          .as("unix_rt"))
      .orderBy("event_id")

  // ------------------------------------------------------ q_user_agent

  private val uaFixtures = Seq(
    "Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.6099.109 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Safari/605.1.15",
    "Mozilla/5.0 (Windows NT 6.1; rv:102.0) Gecko/20100101 Firefox/102.0",
    "Mozilla/5.0 (Windows NT 10.0; Trident/7.0; rv:11.0) like Gecko",
    "curl/8.4.0",
    "weirdclient/0")

  private def uaCol: Column = element_at(
    array(uaFixtures.map(lit): _*), (e % 7 + 1).cast("int"))

  private def qUserAgent(s: SparkSession, dir: String): DataFrame = {
    val p = graft.functions.UserAgent.parse(uaCol)
    events(s, dir).select(
        e.as("event_id"),
        p.getField("family").as("ua_family"),
        p.getField("major").as("ua_major"),
        p.getField("minor").as("ua_minor"))
      .orderBy("event_id")
  }

  // ------------------------------------------------------ q_native_json

  private def qNativeJson(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.NativeJson
    val vt = when(e % 2 === 0, "counter").otherwise("gauge")
    val kind = when(e % 2 === 0, "incremental").otherwise("absolute")
    val enc = NativeJson.encodeMetric(concat(lit("m"), e % 5),
      map(lit("tool"), col("event_type")), kind, vt, e + lit(0.5))
    events(s, dir).select(
        e.as("event_id"),
        enc.as("native_line"),
        NativeJson.eventKind(enc).as("arm"),
        NativeJson.decode(enc).getField("metric").getField("name").as("rt_name"),
        coalesce(
          NativeJson.decode(enc).getField("metric").getField("counter").getField("value"),
          NativeJson.decode(enc).getField("metric").getField("gauge").getField("value"))
          .as("rt_value"))
      .orderBy("event_id")
  }

  val spark: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q_stdlib_parse3" -> (qStdlibParse3 _),
    "q_aws_logs"      -> (qAwsLogs _),
    "q_stdlib_misc2"  -> (qStdlibMisc2 _),
    "q_user_agent"    -> (qUserAgent _),
    "q_native_json"   -> (qNativeJson _)
  )

  // ====================================================== DuckDB oracle

  val oracle: ListMap[String, String] = ListMap(
    "q_stdlib_parse3" ->
      """SELECT event_id,
           event_type || ' ' || user_id AS tok_quoted,
           'grp ' || (event_id % 7) AS tok_bracket,
           4 AS n_toks,
           'sshd' AS auth_app,
           'host' || (user_id % 5) AS auth_host,
           CAST(event_id % 9999 + 1 AS BIGINT) AS auth_pid,
           'Accepted password for user' || user_id AS auth_msg,
           '2024-03-' || lpad(CAST(event_id % 27 + 1 AS VARCHAR), 2, '0')
             || 'T01:02:03Z' AS auth_ts,
           CAST((event_id % 9 + 1) * 1048576 AS DOUBLE) AS mib_bytes,
           CASE event_id % 4 WHEN 0 THEN 'co.uk' WHEN 1 THEN 'github.io'
             WHEN 2 THEN 'foo.ck' ELSE 'lan' END AS etld,
           CASE event_id % 4
             WHEN 0 THEN 'example.co.uk'
             WHEN 1 THEN 'svc' || (user_id % 10) || '.github.io'
             WHEN 2 THEN 'svc' || (user_id % 10) || '.foo.ck'
             ELSE 'internal.lan' END AS etld_plus,
           CASE WHEN event_id % 4 = 3 THEN 0 ELSE 1 END AS etld_known,
           '{"a":' || (event_id % 24) || '}' AS cbor_json,
           '{"k":' || user_id || ',"s":null}' AS ruby_json
         FROM events ORDER BY event_id""",
    "q_aws_logs" ->
      """SELECT event_id,
           '10.0.' || (user_id % 256) || '.' || (event_id % 256) || ':3456' AS alb_client,
           CAST(200 + (event_id % 3) * 100 AS VARCHAR) AS alb_status,
           CAST(event_id % 1000 AS BIGINT) AS alb_rb,
           CAST(user_id % 5000 AS BIGINT) AS alb_sb,
           'GET' AS alb_method,
           'http://site.example/e' || event_id AS alb_url,
           'curl/8.1' AS alb_ua,
           'Root=' || event_id AS alb_trace,
           CAST(0.001 AS DOUBLE) AS alb_tpt,
           '10.1.' || (user_id % 256) || '.5' AS vpc_src,
           CAST(1024 + event_id % 100 AS BIGINT) AS vpc_sport,
           CAST(event_id % 50 AS BIGINT) AS vpc_packets,
           CASE WHEN event_id % 2 = 0 THEN 'ACCEPT' ELSE 'REJECT' END AS vpc_action
         FROM events ORDER BY event_id""",
    "q_stdlib_misc2" ->
      """SELECT event_id,
           printf('%x', event_id) AS fmt_hex,
           format('{:,}', CAST(user_id * 1000 + event_id % 1000 AS BIGINT))
             || '.25' AS fmt_num,
           CASE event_id % 8 WHEN 0 THEN 'emerg' WHEN 1 THEN 'alert'
             WHEN 2 THEN 'crit' WHEN 3 THEN 'err' WHEN 4 THEN 'warning'
             WHEN 5 THEN 'notice' WHEN 6 THEN 'info' ELSE 'debug' END AS syslog_level,
           CAST(event_id % 8 AS INT) AS syslog_sev_rt,
           CASE event_id % 24 WHEN 0 THEN 'kern' WHEN 1 THEN 'user'
             WHEN 2 THEN 'mail' WHEN 3 THEN 'daemon' WHEN 4 THEN 'auth'
             WHEN 5 THEN 'syslog' WHEN 6 THEN 'lpr' WHEN 7 THEN 'news'
             WHEN 8 THEN 'uucp' WHEN 9 THEN 'cron' WHEN 10 THEN 'authpriv'
             WHEN 11 THEN 'ftp' WHEN 12 THEN 'ntp' WHEN 13 THEN 'security'
             WHEN 14 THEN 'console' WHEN 15 THEN 'solaris-cron'
             ELSE 'local' || (event_id % 24 - 16) END AS syslog_fac,
           CAST(event_id % 24 AS INT) AS syslog_fac_rt,
           event_type || ' ok' AS ansi_stripped,
           lower(hex(encode('m' || event_id || '-' || event_type))) AS b16,
           'm' || event_id || '-' || event_type AS b16_rt,
           event_type || '%20%3F' AS pct,
           event_type || ' ?' AS pct_rt,
           CASE event_id % 3 WHEN 0 THEN 'xn--caf-dma.com'
             WHEN 1 THEN 'xn--mnchen-3ya.de' ELSE 'plain.org' END AS puny,
           round(2 * 6371.0088 * asin(sqrt(
             pow(sin(radians(CAST((user_id + 10) % 90 AS DOUBLE)
                   - CAST(user_id % 90 AS DOUBLE)) / 2), 2)
             + cos(radians(CAST(user_id % 90 AS DOUBLE)))
               * cos(radians(CAST((user_id + 10) % 90 AS DOUBLE)))
               * pow(sin(radians(CAST((event_id + 20) % 180 AS DOUBLE)
                     - CAST(event_id % 180 AS DOUBLE)) / 2), 2))), 4) AS hav_km,
           strftime(to_timestamp(1700000000 + event_id),
             '%Y-%m-%dT%H:%M:%SZ') AS unix_iso,
           CAST(1700000000 + event_id AS BIGINT) AS unix_rt
         FROM events ORDER BY event_id""",
    "q_user_agent" ->
      // expected (family, major, minor) per fixture written out directly
      // — an independent statement of what uap-core says each UA is
      """SELECT event_id,
           CASE event_id % 7 WHEN 0 THEN 'Chrome' WHEN 1 THEN 'Edge'
             WHEN 2 THEN 'Safari' WHEN 3 THEN 'Firefox' WHEN 4 THEN 'IE'
             WHEN 5 THEN 'curl' ELSE 'Other' END AS ua_family,
           CASE event_id % 7 WHEN 0 THEN '120' WHEN 1 THEN '120'
             WHEN 2 THEN '17' WHEN 3 THEN '102' WHEN 4 THEN '11'
             WHEN 5 THEN '8' ELSE NULL END AS ua_major,
           CASE event_id % 7 WHEN 0 THEN '0' WHEN 1 THEN '0'
             WHEN 2 THEN '1' WHEN 3 THEN '0' WHEN 4 THEN '0'
             WHEN 5 THEN '4' ELSE NULL END AS ua_minor
         FROM events ORDER BY event_id""",
    "q_native_json" ->
      // the exact native_json line constructed independently by string
      // concatenation — checks the encoder's key order, arm selection,
      // float rendering, and the decode round-trip
      """SELECT event_id,
           '{"metric":{"name":"m' || (event_id % 5) || '","kind":"'
             || CASE WHEN event_id % 2 = 0 THEN 'incremental' ELSE 'absolute' END
             || '","'
             || CASE WHEN event_id % 2 = 0 THEN 'counter' ELSE 'gauge' END
             || '":{"value":' || CAST(event_id + 0.5 AS VARCHAR)
             || '},"tags":{"tool":"' || event_type || '"}}}' AS native_line,
           'metric' AS arm,
           'm' || (event_id % 5) AS rt_name,
           CAST(event_id + 0.5 AS DOUBLE) AS rt_value
         FROM events ORDER BY event_id"""
  )
}
