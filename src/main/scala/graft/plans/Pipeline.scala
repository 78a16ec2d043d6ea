package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

import graft.functions.Grok
import graft.operators.{Aggregate, Enrich, Parse, Route, Telemetry}
import graft.sources.Tables

/** The north-star pipeline: parse → enrich → route → aggregate over the
  * transcript table (conv_id, turn_idx, role, text, tool, ts).
  *
  * Mirrors the reference topology syslog → remap(parse_regex) →
  * log_to_metric → sink (regression/cases/syslog_regex_logs2metric_
  * ddmetrics/vector/vector.yaml:21-35) with Vector `route` fan-out
  * (src/transforms/route.rs) in the middle.
  *
  * Every stage is a narrow or single-shuffle declarative transform:
  *   scan (parquet, pruned) → regexp parse (codegen) → broadcast join
  *   (no shuffle) → multicast explode (narrow) → hash aggregate
  *   (ONE shuffle on (port, role, win)).
  */
object Pipeline {

  /** Grok pattern of the well-formed transcript log line. */
  val logLineGrok: String =
    "%{TIMESTAMP_ISO8601:ts_str} %{LOGLEVEL:level} tool=%{NOTSPACE:tool_p}" +
      " latency_ms=%{INT:latency_ms} msg=\"%{DATA:msg}\""

  lazy val compiledGrok: Grok.Compiled = Grok.compile(logLineGrok)

  /** Enrichment fixture: the single source of truth for BOTH the Spark
    * broadcast table and the DuckDB oracle's VALUES CTE (rendered by
    * `enrichValuesCte`). Keyed on (tool, role) — unique by construction
    * (reference exactly-one-match, lib/enrichment/src/lib.rs:53-56).
    */
  val enrichRows: Seq[(String, String, String, String)] =
    for {
      i <- 0 until 12
      r <- Seq("assistant", "tool")
    } yield {
      val team = s"team_${(i + (if (r == "assistant") 0 else 1)) % 4}"
      val tier = ((i * 2 + r.length) % 3) match {
        case 0 => "low"; case 1 => "mid"; case _ => "high"
      }
      (s"tool_$i", r, team, tier)
    }

  def enrichTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    enrichRows.toDF("tool", "role", "team", "cost_tier")
  }

  /** DuckDB/Spark-compatible VALUES CTE body for the same rows. */
  def enrichValuesCte: String = {
    val rows = enrichRows
      .map { case (t, r, tm, c) => s"('$t','$r','$tm','$c')" }
      .mkString(",")
    s"enrich AS (SELECT * FROM (VALUES $rows) AS t(tool, role, team, cost_tier))"
  }

  /** Route conditions over the parsed+enriched frame. Multicast: a row
    * can land in several ports (e.g. errors ∧ slow).
    */
  def routeConditions: ListMap[String, Column] = ListMap(
    "errors"     -> (col("level") === "error"),
    "tool_calls" -> col("tool").isNotNull,
    "slow"       -> (col("latency_ms") >= 800),
    "premium"    -> (col("cost_tier") === "high")
  )

  /** Same conditions as oracle SQL predicates (DuckDB + Spark dialect). */
  val routeConditionSql: ListMap[String, String] = ListMap(
    "errors"     -> "level = 'error'",
    "tool_calls" -> "tool IS NOT NULL",
    "slow"       -> "latency_ms >= 800",
    "premium"    -> "cost_tier = 'high'"
  )

  final case class Stages(
      transcript: DataFrame,
      parsed: DataFrame,
      dropped: DataFrame,
      enriched: DataFrame,
      routed: DataFrame,
      aggregated: DataFrame,
      /** the parse fan-out parent both ports filter — the persist point */
      taggedParse: DataFrame)

  val WindowSecs = 600L

  /** Build every stage of the pipeline off the transcript at `dir`.
    *
    * The TAGGED parse frame is persisted: it is the fan-out point every
    * downstream consumer re-reads — the primary side (enrich, route
    * ports, metric rules) AND the dropped channel are both filters of
    * it, and Spark's cache manager substitutes the cached fragment
    * into any later plan containing it — one scan + one regex pass
    * total instead of one per consumer (persisting only the primary
    * port would leave every dropped-channel action a full re-scan).
    * `buildFrom` (the bench scaling entry) deliberately does NOT
    * persist, so the measured scaling job does all of its work every
    * run.
    */
  def build(spark: SparkSession, dir: String): Stages = {
    stagesCache.keys.filter(_._1.sparkContext.isStopped)
      .foreach(stagesCache.remove)
    stagesCache.getOrElseUpdate((spark, dir), {
      val st = buildFrom(spark, Tables.transcript(spark, dir))
      st.taggedParse.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      st
    })
  }

  /** One Stages per (session, dir): repeated `build` calls reuse the
    * SAME persisted parsed frame instead of re-creating an identical
    * plan and re-calling persist on it (CacheManager deduplicated the
    * storage anyway, but the re-registration was noisy and the
    * re-analysis wasted planning time per query).
    */
  private val stagesCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Stages]

  def buildFrom(spark: SparkSession, transcript: DataFrame): Stages = {
    val ports = Parse.grok(
      transcript, col("text"), compiledGrok,
      componentId = "parse_log_line",
      typing = Map(
        "latency_ms" -> ((c: Column) => c.cast("int")),
        "ts_str"     -> ((c: Column) => c) // kept as string; ts_parsed below
      ))
    // in-flight per-component telemetry (internal_events analog):
    // observe() counters are accumulator-backed — same pass, no extra
    // scan — and pair with the sink-side lineage manifest to cover the
    // north rule's "per-partition lineage AND metrics"
    val parsed = Telemetry.component(
      ports.primary
        .withColumn("ts_parsed", to_timestamp(col("ts_str"), "yyyy-MM-dd'T'HH:mm:ss'Z'")),
      "parse")

    // join key is the PARSED tool (tool_p); role from the typed column.
    val enriched = Telemetry.component(
      Enrich.lookup(
        parsed.withColumn("tool_join", when(col("tool_p") === "none", lit(null)).otherwise(col("tool_p"))),
        Pipeline.enrichTable(spark)
          .withColumnRenamed("tool", "tool_join"),
        Seq("tool_join", "role")).drop("tool_join"),
      "enrich",
      extra = Seq(sum(when(col("team").isNotNull, 1L).otherwise(0L))
        .as("events_matched")))

    val routed = Telemetry.routedSent(
      Route.tagged(enriched, routeConditions),
      routeConditions.keys.toSeq :+ graft.operators.Route.UnmatchedPort)

    val aggregated = routed
      .groupBy(col("port"), col("role"),
        Aggregate.windowStart(col("ts"), WindowSecs).as("win"))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(col("latency_ms")).cast("long").as("sum_latency"),
        max(col("latency_ms")).as("max_latency"),
        countDistinct(col("conv_id")).as("n_convs"))

    Stages(transcript, parsed, ports.dropped, enriched, routed, aggregated,
      ports.tagged)
  }
}
