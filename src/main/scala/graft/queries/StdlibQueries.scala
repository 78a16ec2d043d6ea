package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

import graft.functions.{SearchSyntax, Template, Vrl}
import graft.operators.LineAgg
import graft.sources.Tables

/** Oracle-gated queries for the remaining VRL-stdlib surface
  * (SURVEY.md §2.7), line_agg (§2.9), templates (§2.9) and the
  * Datadog-search condition syntax (§2.2).
  *
  * Inputs are synthesized deterministically from `events` columns.
  * Where possible the DuckDB oracle DERIVES the expected value
  * independently (e.g. CIDR membership from the octet range, base64
  * round-trip back to the source string) instead of mirroring the
  * Spark expression — a stronger check than expression translation.
  */
object StdlibQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "events")

  // ---------------------------------------------------------- line_agg
  private def logLine: Column =
    when(col("event_id") % 4 === 0, concat(lit("ERROR boom "), col("event_id")))
      .otherwise(concat(lit("  at frame "), col("event_id")))

  private def qLineAgg(s: SparkSession, dir: String): DataFrame = {
    val src = events(s, dir).select(
      (col("user_id") % 8).as("key"), col("event_id").as("line_no"),
      logLine.as("line"))
    LineAgg.merge(src, col("key"), col("line_no"), col("line"),
        "^\\s", LineAgg.ContinueThrough)
      .orderBy("key", "grp")
  }

  // ---------------------------------------------------------- parse_duration
  private def durCol: Column = element_at(
    array(lit("250ms"), lit("1.5s"), lit("2m"), lit("1h"), lit("3d"), lit("75us")),
    (col("event_id") % 6 + 1).cast("int"))

  private def qParseDuration(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
        col("event_id"), durCol.as("dur"),
        Vrl.parseDuration(durCol).as("dur_s"),
        Vrl.parseDuration(durCol, "ms").as("dur_ms"))
      .orderBy("event_id")

  // ---------------------------------------------------------- ip math
  private def ipCol: Column = concat_ws(".",
    lit(10), col("user_id") % 256, col("event_id") % 256, lit(7))

  private def qIp(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
        col("event_id"), ipCol.as("ip"),
        Vrl.ipAton(ipCol).as("ip_num"),
        Vrl.ipNtoa(Vrl.ipAton(ipCol)).as("ip_rt"),
        Vrl.ipCidrContains(lit("10.64.0.0/10"), ipCol).cast("int").as("in_cidr"))
      .orderBy("event_id")

  // ---------------------------------------------------------- redact / sieve
  private def piiLine: Column = concat(
    lit("user "), col("user_id"), lit(" card 1234-5678-9012 ip 10.0.0."),
    col("event_id") % 256, lit(" ok"))

  private def qRedactSieve(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
        col("event_id"),
        Vrl.redact(piiLine, "[0-9]{4}-[0-9]{4}-[0-9]{4}").as("redacted"),
        Vrl.sieve(piiLine, "[a-z]+", "-").as("sieved"))
      .orderBy("event_id")

  // ---------------------------------------------------------- case conversion
  private def snakeSrc: Column =
    concat(lit("evt_"), col("event_type"), lit("_v"), col("event_id") % 3)

  private def qStringCase(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
        col("event_id"),
        Vrl.camelcase(snakeSrc).as("camel"),
        Vrl.pascalcase(snakeSrc).as("pascal"),
        Vrl.snakecase(Vrl.camelcase(snakeSrc)).as("snake_rt"),
        Vrl.kebabcase(Vrl.camelcase(snakeSrc)).as("kebab"))
      .orderBy("event_id")

  // ---------------------------------------------------------- template
  private val pathTemplate = "logs/{{ event_type }}/%Y-%m-%d/part-{{ user_id }}.json"

  private def qTemplate(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
        col("event_id"),
        Template.compile(pathTemplate, col("ts")).as("path"))
      .orderBy("event_id")

  // ---------------------------------------------------------- search syntax
  private val searchQuery =
    "\"clic\" OR (event_type:err* user_id:>100) OR event_type:[signup TO view]"

  private def qSearch(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .filter(SearchSyntax.compile(searchQuery, col("event_type")))
      .select(col("event_id"), col("event_type"), col("user_id"))
      .orderBy("event_id")

  // ---------------------------------------------------------- codecs/hashes
  private def msgCol: Column =
    concat(lit("msg-"), col("event_id"), lit(":"), col("event_type"))

  private def qCodecHash(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
        col("event_id"),
        Vrl.encodeBase64(msgCol).as("b64"),
        Vrl.decodeBase64(Vrl.encodeBase64(msgCol)).as("b64_rt"),
        Vrl.md5Hex(msgCol).as("md5"),
        Vrl.sha256Hex(msgCol).as("sha256"))
      .orderBy("event_id")

  // ---------------------------------------------------------- misc stdlib
  private def uaCol: Column = element_at(array(
    lit("Mozilla/5.0 Chrome/120.0"), lit("Mozilla/5.0 Firefox/115.0"),
    lit("curl/8.1"), lit("Mozilla/5.0 Safari/604.1 Version/17"),
    lit("SomeBot/1.0")), (col("event_id") % 5 + 1).cast("int"))
  private def qsCol: Column =
    concat(lit("a="), col("user_id"), lit("&b="), col("event_type"))
  private def hexCol: Column = concat(lit("ff"), col("event_id") % 10)

  private def qStdlibMisc(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
        col("event_id"),
        Vrl.userAgentFamily(uaCol).as("ua_family"),
        element_at(Vrl.parseQueryString(qsCol), "a").cast("long").as("qs_a"),
        element_at(Vrl.parseQueryString(qsCol), "b").as("qs_b"),
        Vrl.parseInt(hexCol, 16).as("hex_val"))
      .orderBy("event_id")

  // ----------------------------------------------- string stdlib tier 2
  /** truncate / strip_whitespace / replace / starts_with / levenshtein /
    * reverse / repeat (VRL string.cue family) — each a direct Spark
    * builtin; the oracle computes the same value from the raw columns.
    */
  private def qStdlibStrings(s: SparkSession, dir: String): DataFrame = {
    val padded = concat(lit("  "), col("event_type"), lit("-"),
      col("event_id").cast("string"), lit("  "))
    events(s, dir).select(
        col("event_id"),
        substring(col("event_type"), 1, 4).as("truncated"),
        trim(padded).as("stripped"),
        regexp_replace(col("event_type"), "[aeiou]", "_").as("replaced"),
        col("event_type").startsWith("c").cast("int").as("starts_c"),
        levenshtein(col("event_type"), lit("click")).as("lev_click"),
        reverse(col("event_type")).as("reversed"),
        repeat(lit("*"), (col("event_id") % 5 + 1).cast("int")).as("stars"))
      .orderBy("event_id")
  }

  val spark: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q_line_agg"       -> (qLineAgg _),
    "q_stdlib_strings" -> (qStdlibStrings _),
    "q_parse_duration" -> (qParseDuration _),
    "q_ip"             -> (qIp _),
    "q_redact_sieve"   -> (qRedactSieve _),
    "q_string_case"    -> (qStringCase _),
    "q_template"       -> (qTemplate _),
    "q_search"         -> (qSearch _),
    "q_codec_hash"     -> (qCodecHash _),
    "q_stdlib_misc"    -> (qStdlibMisc _)
  )

  // ====================================================== DuckDB oracle

  private val logLineSql =
    "CASE WHEN event_id % 4 = 0 THEN 'ERROR boom ' || event_id ELSE '  at frame ' || event_id END"
  private val durSql =
    "CASE event_id % 6 WHEN 0 THEN '250ms' WHEN 1 THEN '1.5s' WHEN 2 THEN '2m' WHEN 3 THEN '1h' WHEN 4 THEN '3d' ELSE '75us' END"
  private val durReSql = """'^\s*([0-9]*\.?[0-9]+)\s*(ns|us|µs|ms|s|m|h|d)\s*$'"""
  private val piiLineSql =
    "'user ' || user_id || ' card 1234-5678-9012 ip 10.0.0.' || (event_id % 256) || ' ok'"
  private val msgSql = "'msg-' || event_id || ':' || event_type"

  val oracle: ListMap[String, String] = ListMap(
    "q_line_agg" ->
      s"""WITH src AS (
           SELECT user_id % 8 AS key, event_id AS line_no, $logLineSql AS line
           FROM events),
         marked AS (
           SELECT *, CASE WHEN NOT regexp_matches(line, '^\\s') THEN 1
                          WHEN row_number() OVER (PARTITION BY key ORDER BY line_no) = 1 THEN 1
                          ELSE 0 END AS start
           FROM src),
         g AS (
           SELECT *, sum(start) OVER (PARTITION BY key ORDER BY line_no
             ROWS UNBOUNDED PRECEDING) AS grp
           FROM marked)
         SELECT key, CAST(grp AS BIGINT) AS grp, min(line_no) AS first_line_no,
           count(*) AS n_lines,
           string_agg(line, chr(10) ORDER BY line_no) AS text
         FROM g GROUP BY key, grp ORDER BY key, grp""",
    "q_parse_duration" ->
      s"""WITH l AS (SELECT event_id, $durSql AS dur FROM events),
         p AS (SELECT event_id, dur,
           TRY_CAST(regexp_extract(dur, $durReSql, 1) AS DOUBLE) AS num,
           regexp_extract(dur, $durReSql, 2) AS unit FROM l),
         f AS (SELECT event_id, dur, num *
           (CASE unit WHEN 'ns' THEN 1e-9 WHEN 'us' THEN 1e-6 WHEN 'ms' THEN 1e-3
             WHEN 's' THEN 1e0 WHEN 'm' THEN 6e1 WHEN 'h' THEN 36e2
             ELSE 864e2 END) AS dur_s FROM p)
         SELECT event_id, dur, dur_s, dur_s / 1e-3 AS dur_ms
         FROM f ORDER BY event_id""",
    "q_ip" ->
      // ip_num / in_cidr derived from the octets, NOT from the Spark
      // formula; ip_rt must round-trip back to the source string
      """SELECT event_id,
           '10.' || (user_id % 256) || '.' || (event_id % 256) || '.7' AS ip,
           10 * 16777216 + (user_id % 256) * 65536 + (event_id % 256) * 256 + 7 AS ip_num,
           '10.' || (user_id % 256) || '.' || (event_id % 256) || '.7' AS ip_rt,
           CAST((user_id % 256) BETWEEN 64 AND 127 AS INT) AS in_cidr
         FROM events ORDER BY event_id""",
    "q_redact_sieve" ->
      s"""SELECT event_id,
           regexp_replace($piiLineSql, '[0-9]{4}-[0-9]{4}-[0-9]{4}', '[REDACTED]', 'g') AS redacted,
           array_to_string(regexp_extract_all($piiLineSql, '[a-z]+'), '-') AS sieved
         FROM events ORDER BY event_id""",
    "q_string_case" ->
      // derived directly from event_type, not via the Spark regex chain
      """SELECT event_id,
           'evt' || upper(substring(event_type, 1, 1)) || substring(event_type, 2)
             || 'V' || (event_id % 3) AS camel,
           'Evt' || upper(substring(event_type, 1, 1)) || substring(event_type, 2)
             || 'V' || (event_id % 3) AS pascal,
           'evt_' || event_type || '_v' || (event_id % 3) AS snake_rt,
           'evt-' || event_type || '-v' || (event_id % 3) AS kebab
         FROM events ORDER BY event_id""",
    "q_template" ->
      """SELECT event_id,
           'logs/' || event_type || '/' || strftime(ts, '%Y-%m-%d')
             || '/part-' || user_id || '.json' AS path
         FROM events ORDER BY event_id""",
    "q_search" ->
      """SELECT event_id, event_type, user_id FROM events
         WHERE event_type LIKE '%clic%'
            OR (event_type LIKE 'err%' AND user_id > 100)
            OR (event_type >= 'signup' AND event_type <= 'view')
         ORDER BY event_id""",
    "q_codec_hash" ->
      s"""SELECT event_id,
           base64(encode($msgSql)) AS b64,
           $msgSql AS b64_rt,
           md5($msgSql) AS md5,
           sha256($msgSql) AS sha256
         FROM events ORDER BY event_id""",
    "q_stdlib_misc" ->
      """SELECT event_id,
           CASE event_id % 5 WHEN 0 THEN 'Chrome' WHEN 1 THEN 'Firefox'
             WHEN 2 THEN 'curl' WHEN 3 THEN 'Safari' ELSE 'Other' END AS ua_family,
           user_id AS qs_a,
           event_type AS qs_b,
           4080 + (event_id % 10) AS hex_val
         FROM events ORDER BY event_id""",
    "q_stdlib_strings" ->
      """SELECT event_id,
           substr(event_type, 1, 4) AS truncated,
           trim('  ' || event_type || '-' || CAST(event_id AS STRING) || '  ') AS stripped,
           regexp_replace(event_type, '[aeiou]', '_', 'g') AS replaced,
           CAST(starts_with(event_type, 'c') AS INT) AS starts_c,
           CAST(levenshtein(event_type, 'click') AS INT) AS lev_click,
           reverse(event_type) AS reversed,
           repeat('*', CAST(event_id % 5 + 1 AS INT)) AS stars
         FROM events ORDER BY event_id"""
  )
}
