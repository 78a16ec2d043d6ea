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
    */
  def transcript(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir, Seq("lineitem"))
    spark.sql(TranscriptSql.withTranscript(
      Dialect.Spark, Nil, "SELECT * FROM transcript"))
  }
}
