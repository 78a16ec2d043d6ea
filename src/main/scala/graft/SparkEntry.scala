package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

import graft.plans.Pipeline
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a matching DuckDB statement in
  * `oracleSql`; both run against the same parquet tables at the given
  * scale dir (the transcript table is derived inside both engines from
  * `lineitem` via the shared dialect SQL in TranscriptSql, so the oracle
  * sees bit-identical input).
  */
object SparkEntry {

  private val isoFmt = "yyyy-MM-dd'T'HH:mm:ss'Z'"
  private def tsIso(c: Column): Column = date_format(c, isoFmt).as("ts_iso")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.build(spark, "/root/testdata/sf0.001").aggregated

  // ---- Spark-side queries --------------------------------------------

  private def qTranscript(s: SparkSession, dir: String): DataFrame =
    Tables.transcript(s, dir)
      .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"),
        tsIso(col("ts")), col("text"))
      .orderBy("conv_id", "turn_idx")

  private def qParse(s: SparkSession, dir: String): DataFrame =
    Pipeline.build(s, dir).parsed
      .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"),
        col("text"), col("ts_str"), col("level"), col("tool_p"),
        col("latency_ms"), col("msg"))
      .orderBy("conv_id", "turn_idx")

  private def qParseDropped(s: SparkSession, dir: String): DataFrame =
    Pipeline.build(s, dir).dropped
      .select(col("conv_id"), col("turn_idx"), col("text"),
        col("dropped_reason"), col("dropped_component_id"),
        col("dropped_component_kind"))
      .orderBy("conv_id", "turn_idx")

  private def qEnrich(s: SparkSession, dir: String): DataFrame =
    Pipeline.build(s, dir).enriched
      .select(col("conv_id"), col("turn_idx"), col("role"), col("tool_p"),
        col("level"), col("latency_ms"), col("team"), col("cost_tier"))
      .orderBy("conv_id", "turn_idx")

  private def qRoute(s: SparkSession, dir: String): DataFrame =
    Pipeline.build(s, dir).routed
      .select(col("port"), col("conv_id"), col("turn_idx"), col("role"),
        col("level"), col("latency_ms"), col("team"), col("cost_tier"))
      .orderBy("conv_id", "turn_idx", "port")

  private def qExclusiveRoute(s: SparkSession, dir: String): DataFrame = {
    val st = Pipeline.build(s, dir)
    graft.operators.Route.exclusive(st.enriched, Pipeline.routeConditions)
      .select(col("port"), col("conv_id"), col("turn_idx"), col("level"),
        col("latency_ms"))
      .orderBy("conv_id", "turn_idx")
  }

  private def qPipelineAgg(s: SparkSession, dir: String): DataFrame =
    Pipeline.build(s, dir).aggregated
      .orderBy("port", "role", "win")

  private def qLineitemAgg(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.table(s, dir, "lineitem")
    val qty = col("l_quantity").cast("decimal(18,2)")
    val price = col("l_extendedprice").cast("decimal(18,2)")
    val disc = col("l_discount").cast("decimal(18,4)")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(qty).cast("double").as("sum_qty"),
        sum(price).cast("double").as("sum_base_price"),
        sum(price * (lit(1).cast("decimal(18,4)") - disc)).cast("double").as("sum_disc_price"),
        count(lit(1)).as("n_rows"),
        (sum(qty).cast("double") / count(lit(1))).as("avg_qty"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(
    "q_transcript"      -> (qTranscript _),
    "q_parse"           -> (qParse _),
    "q_parse_dropped"   -> (qParseDropped _),
    "q_enrich"          -> (qEnrich _),
    "q_route"           -> (qRoute _),
    "q_exclusive_route" -> (qExclusiveRoute _),
    "q_pipeline_agg"    -> (qPipelineAgg _),
    "q1_agg"            -> (qLineitemAgg _)
  ) ++ graft.queries.TransformQueries.spark ++ graft.queries.TrainingQueries.spark ++
    graft.queries.ParserQueries.spark ++ graft.queries.StdlibQueries.spark ++
    graft.queries.Stdlib2Queries.spark ++ graft.queries.ConfigQueries.spark ++
    graft.queries.CodecQueries.spark

  // ---- DuckDB oracle -------------------------------------------------

  def oracleSql: Map[String, String] = {
    val exCase = Pipeline.routeConditionSql
      .map { case (n, c) => s"WHEN $c THEN '$n'" }
      .mkString("CASE ", " ", " ELSE '_unmatched' END")
    ListMap(
      "q_transcript" -> Oracle.q(
        s"SELECT conv_id, turn_idx, role, tool, ${Oracle.fmtIso("ts")} AS ts_iso, text FROM transcript ORDER BY conv_id, turn_idx"),
      "q_parse" -> Oracle.q(
        "SELECT conv_id, turn_idx, role, tool, text, ts_str, level, tool_p, latency_ms, msg FROM parsed ORDER BY conv_id, turn_idx",
        Seq(Oracle.parsedCte)),
      "q_parse_dropped" -> Oracle.q(
        s"""SELECT conv_id, turn_idx, text,
           'source must match exactly one pattern' AS dropped_reason,
           'parse_log_line' AS dropped_component_id,
           'transform' AS dropped_component_kind
           FROM transcript WHERE NOT regexp_matches(text, ${Oracle.lit(Pipeline.compiledGrok.regex)})
           ORDER BY conv_id, turn_idx"""),
      "q_enrich" -> Oracle.q(
        "SELECT conv_id, turn_idx, role, tool_p, level, latency_ms, team, cost_tier FROM enriched ORDER BY conv_id, turn_idx",
        Oracle.enrichedCtes),
      "q_route" -> Oracle.q(
        "SELECT port, conv_id, turn_idx, role, level, latency_ms, team, cost_tier FROM routed ORDER BY conv_id, turn_idx, port",
        Oracle.enrichedCtes :+ Oracle.routedCte),
      "q_exclusive_route" -> Oracle.q(
        s"SELECT $exCase AS port, conv_id, turn_idx, level, latency_ms FROM enriched ORDER BY conv_id, turn_idx",
        Oracle.enrichedCtes),
      "q_pipeline_agg" -> Oracle.q(
        s"""SELECT port, role,
           CAST(floor(epoch(ts) / ${Pipeline.WindowSecs}) * ${Pipeline.WindowSecs} AS BIGINT) AS win,
           CAST(count(*) AS BIGINT) AS n_turns,
           CAST(sum(latency_ms) AS BIGINT) AS sum_latency,
           max(latency_ms) AS max_latency,
           CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
           FROM routed GROUP BY 1, 2, 3 ORDER BY port, role, win""",
        Oracle.enrichedCtes :+ Oracle.routedCte),
      "q1_agg" ->
        """SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
           FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus"""
    ) ++ graft.queries.TransformQueries.oracle ++ graft.queries.TrainingQueries.oracle ++
      graft.queries.ParserQueries.oracle ++ graft.queries.StdlibQueries.oracle ++
      graft.queries.Stdlib2Queries.oracle ++ graft.queries.ConfigQueries.oracle ++
      graft.queries.CodecQueries.oracle
  }
}
