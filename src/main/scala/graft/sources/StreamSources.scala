package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamReader

/** External streaming source wiring (reference src/sources/kafka.rs and
  * friends — SURVEY §2.4). The reference's 43 source modules are mostly
  * network/broker plumbing that Structured Streaming's connector
  * ecosystem subsumes: a source HERE is a `readStream.format(...)`
  * configuration plus a decode projection, nothing more.
  *
  * The sandbox ships no broker and no spark-sql-kafka connector jar, so
  * `.load()` on the returned reader is jar-gated exactly like the
  * Iceberg TableIO path; the CONFIG surface (what the reference calls
  * the source's config struct, kafka.rs:119-172) and the wire-schema
  * decode are real and spec-verified.
  */
object StreamSources {

  /** The reference's kafka source config surface
    * (src/sources/kafka.rs:119-172: bootstrap_servers, topics, offset
    * reset, rate limits), mapped onto the Spark connector's options.
    */
  final case class KafkaConfig(
      bootstrapServers: String,
      topics: Seq[String],
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None,
      failOnDataLoss: Boolean = true)

  /** Configure (NOT start) a Kafka streaming read. */
  def kafkaReader(spark: SparkSession, cfg: KafkaConfig): DataStreamReader = {
    val r = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", cfg.bootstrapServers)
      .option("subscribe", cfg.topics.mkString(","))
      .option("startingOffsets", cfg.startingOffsets)
      .option("failOnDataLoss", cfg.failOnDataLoss.toString)
    cfg.maxOffsetsPerTrigger.fold(r)(n => r.option("maxOffsetsPerTrigger", n.toString))
  }

  /** Decode the Kafka wire schema (key/value binary + metadata — the
    * connector's fixed output schema) into the string-payload shape the
    * pipeline's parse stage consumes. Works on ANY frame with the wire
    * schema, so it is testable without a broker.
    */
  def decodeKafka(df: DataFrame): DataFrame =
    df.select(
      col("key").cast("string").as("key"),
      col("value").cast("string").as("text"),
      col("topic"), col("partition"), col("offset"),
      col("timestamp").as("ts"))
}
