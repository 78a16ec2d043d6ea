package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet tables plus the derived transcript
  * table (the engine's primary input, see TranscriptSql).
  */
object Tables {
  val tpch: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register `names` as temp views backed by parquet at `dir`. */
  def registerViews(spark: SparkSession, dir: String, names: Seq[String]): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))

  /** The transcript table (conv_id, turn_idx, role, tool, ts, text),
    * derived deterministically from `lineitem` — see TranscriptSql for why
    * this goes through SQL (bit-parity with the DuckDB oracle).
    *
    * The derivation (scan + per-conversation row_number window + text
    * synthesis) is the shared source stage of every query, so it is
    * persisted once per (session, scale dir) — the engine-level analog
    * of materializing a source view instead of re-deriving it per
    * consumer. At 100 TB this stage would be a real table written once;
    * MEMORY_AND_DISK keeps the sandbox honest about spill.
    */
  def transcript(spark: SparkSession, dir: String): DataFrame = {
    evictStopped()
    transcriptCache.getOrElseUpdate((spark, dir), {
      registerViews(spark, dir, Seq("lineitem"))
      spark.sql(TranscriptSql.withTranscript(
          Dialect.Spark, Nil, "SELECT * FROM transcript"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })
  }

  /** Drop cache entries whose owning session has stopped — their cached
    * blocks died with the session's executors; only the map entry (and
    * its retained plan) would otherwise leak in a long-lived driver
    * hosting many sessions.
    */
  private def evictStopped(): Unit =
    transcriptCache.keys
      .filter(_._1.sparkContext.isStopped)
      .foreach(transcriptCache.remove)

  private val transcriptCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
}
