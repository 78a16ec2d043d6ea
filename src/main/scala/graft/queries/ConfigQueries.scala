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
    ports.map { p =>
      out(s"by_class.$p").df.select(
        col("conv_id"), col("turn_idx").cast("int").as("turn_idx"),
        col("role"), col("level"), col("tool_p"),
        col("latency_ms").cast("bigint").as("latency_ms"), lit(p).as("port"))
    }.reduce(_ unionAll _).orderBy("conv_id", "turn_idx", "port")
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

  val spark: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q_config_pipeline" -> (qConfigPipeline _)
  )

  val oracle: ListMap[String, String] = ListMap(
    "q_config_pipeline" -> oracleConfigPipeline
  )
}
