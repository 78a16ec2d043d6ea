package graft

import graft.plans.Pipeline
import graft.sources.{Dialect, TranscriptSql}

/** Builders for the DuckDB oracle SQL matching each Spark query.
  *
  * One source of truth per artifact: the grok regex comes from the same
  * compiled pattern Spark executes, the enrichment VALUES from the same
  * Scala rows the broadcast table is built from, the route predicates
  * from Pipeline.routeConditionSql.
  */
object Oracle {
  import Dialect.Duck

  def lit(s: String): String = "'" + s.replace("'", "''") + "'"

  private val re = lit(Pipeline.compiledGrok.regex)

  /** Parsed port: group order fixed by Grok.Compiled.fields =
    * (ts_str, level, tool_p, latency_ms, msg).
    *
    * TRY_CAST, not CAST, on extracted numerics: on matched rows the
    * group is all-digits so the values are identical, but DuckDB may
    * evaluate the projection SPECULATIVELY on rows its scan has not
    * yet filtered (observed at sf0.1 row counts), where the extract is
    * '' and a plain CAST aborts the whole statement.
    */
  val parsedCte: String =
    s"""parsed AS (
  SELECT conv_id, turn_idx, role, tool, ts, text,
    regexp_extract(text, $re, 1) AS ts_str,
    regexp_extract(text, $re, 2) AS level,
    regexp_extract(text, $re, 3) AS tool_p,
    TRY_CAST(regexp_extract(text, $re, 4) AS INT) AS latency_ms,
    regexp_extract(text, $re, 5) AS msg
  FROM transcript WHERE regexp_matches(text, $re)
)"""

  val enrichedCtes: Seq[String] = Seq(
    parsedCte,
    Pipeline.enrichValuesCte,
    """enriched AS (
  SELECT p.*, e.team, e.cost_tier
  FROM parsed p LEFT JOIN enrich e
    ON (CASE WHEN p.tool_p = 'none' THEN NULL ELSE p.tool_p END) = e.tool
   AND p.role = e.role
)""")

  /** Multicast route: UNION ALL of per-port selects; unmatched = rows
    * where every condition is false-or-null (matching Spark `when`
    * null-as-false semantics).
    */
  val routedCte: String = {
    val conds = Pipeline.routeConditionSql
    val ports = conds.map { case (name, c) =>
      s"SELECT enriched.*, '$name' AS port FROM enriched WHERE coalesce($c, false)"
    }
    val unmatched =
      s"SELECT enriched.*, '${graft.operators.Route.UnmatchedPort}' AS port FROM enriched WHERE " +
        conds.values.map(c => s"NOT coalesce($c, false)").mkString(" AND ")
    (ports.toSeq :+ unmatched).mkString("routed AS (\n", "\nUNION ALL ", "\n)")
  }

  def q(select: String, extras: Seq[String] = Nil): String =
    TranscriptSql.withTranscript(Duck, extras, select)

  def fmtIso(ts: String): String = TranscriptSql.fmtIso(Duck, ts)
}
