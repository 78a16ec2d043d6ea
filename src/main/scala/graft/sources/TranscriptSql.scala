package graft.sources

/** SQL dialect targets for the shared derivation queries.
  *
  * The correctness gate runs every query twice: once through Spark, once
  * through DuckDB (the driver's oracle). The synthetic transcript table —
  * the reference's event stream, shape per BASELINE.json `input_hint`:
  * (conv_id, turn_idx, role, text, tool, ts) — must therefore be derivable
  * bit-identically in BOTH engines. We keep a single parameterized SQL
  * definition and render it per dialect; only timestamp arithmetic and
  * strftime formatting differ.
  *
  * This mirrors the reference's seeded synthetic source
  * (reference: src/sources/demo_logs.rs:104-135 — templated log lines at a
  * rate, fixed seed): here the "seed" is the driver's deterministic
  * lineitem table, and every derived column is a pure integer/string
  * function of its key columns.
  */
sealed trait Dialect
object Dialect {
  /** Spark SQL (executed via spark.sql on temp views). */
  case object Spark extends Dialect
  /** DuckDB SQL (shipped to the driver's oracle via SparkEntry.oracleSql). */
  case object Duck extends Dialect
}

object TranscriptSql {
  import Dialect._

  /** ts + secs seconds (integer column). */
  def tsAdd(d: Dialect, ts: String, secs: String): String = d match {
    case Spark => s"timestampadd(SECOND, $secs, $ts)"
    case Duck  => s"($ts + INTERVAL ($secs) SECOND)"
  }

  /** Format a timestamp as ISO-8601 seconds + literal Z (UTC session tz). */
  def fmtIso(d: Dialect, ts: String): String = d match {
    case Spark => s"""date_format($ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")"""
    case Duck  => s"strftime($ts, '%Y-%m-%dT%H:%M:%SZ')"
  }

  /** Parse an ISO-8601 `...Z` string back to a (naive, UTC) timestamp. */
  def parseIso(d: Dialect, col: String): String = d match {
    case Spark => s"""to_timestamp($col, "yyyy-MM-dd'T'HH:mm:ss'Z'")"""
    case Duck  => s"strptime($col, '%Y-%m-%dT%H:%M:%SZ')"
  }

  /** Regex partial-match predicate. */
  def reMatch(d: Dialect, col: String, patternSqlLit: String): String = d match {
    case Spark => s"$col rlike $patternSqlLit"
    case Duck  => s"regexp_matches($col, $patternSqlLit)"
  }

  /** The transcript tables CTEs. Requires a `lineitem` relation in scope.
    *
    * Derivation rules (all deterministic integer arithmetic on key columns;
    * uniqueness of the ORDER BY tuple verified against the driver data):
    *  - conv_id  = 'conv-<l_orderkey>' (one conversation per order)
    *  - turn_idx = dense 0..n-1 per conversation (stable-order key)
    *  - role     ~ user .40 / assistant .40 / tool .15 / system .05
    *  - tool     = one of 12 tools for assistant/tool roles, else NULL
    *  - ts       = l_shipdate + turn_idx seconds
    *  - text     = grok-parseable log line; ~5% deliberately malformed
    *               (exercises the remap `dropped` error channel,
    *               reference: src/transforms/remap.rs:494-553)
    */
  def transcriptCtes(d: Dialect): String = {
    s"""li AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_shipdate,
         CAST(row_number() OVER (PARTITION BY l_orderkey
              ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice)
              - 1 AS INT) AS turn_idx
  FROM lineitem
),
t0 AS (
  SELECT
    'conv-' || CAST(l_orderkey AS STRING) AS conv_id,
    turn_idx,
    CASE WHEN (l_partkey + l_linenumber) % 20 < 8  THEN 'user'
         WHEN (l_partkey + l_linenumber) % 20 < 16 THEN 'assistant'
         WHEN (l_partkey + l_linenumber) % 20 < 19 THEN 'tool'
         ELSE 'system' END AS role,
    CAST((l_suppkey + l_linenumber) % 12 AS INT) AS tool_id,
    CAST((l_orderkey * 31 + l_linenumber) % 10 AS INT) AS lvl_sel,
    ((l_orderkey + 7 * l_linenumber) % 20) = 0 AS malformed,
    CAST((l_partkey * 7 + l_orderkey) % 1000 AS INT) AS latency_ms,
    ${tsAdd(d, "l_shipdate", "turn_idx")} AS ts
  FROM li
),
t1 AS (
  SELECT conv_id, turn_idx, role,
    CASE WHEN role IN ('assistant','tool')
         THEN 'tool_' || CAST(tool_id AS STRING) ELSE NULL END AS tool,
    CASE WHEN lvl_sel < 6 THEN 'info'
         WHEN lvl_sel < 9 THEN 'warn' ELSE 'error' END AS level,
    malformed, latency_ms, ts,
    'turn ' || CAST(turn_idx AS STRING) || ' of ' || conv_id || ' by ' || role AS msg
  FROM t0
),
transcript AS (
  SELECT conv_id, turn_idx, role, tool, ts,
    CASE WHEN malformed
      THEN ${fmtIso(d, "ts")} || ' BOGUS msg="' || msg || '"'
      ELSE ${fmtIso(d, "ts")} || ' ' || level || ' tool=' || coalesce(tool, 'none')
           || ' latency_ms=' || CAST(latency_ms AS STRING)
           || ' msg="' || msg || '"'
    END AS text
  FROM t1
)"""
  }

  /** Full statement: transcript CTEs + caller CTEs + final select. */
  def withTranscript(d: Dialect, extraCtes: Seq[String], select: String): String = {
    val ctes = (transcriptCtes(d) +: extraCtes).mkString(",\n")
    s"WITH $ctes\n$select"
  }
}
