package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

import graft.functions.{ArrowCodec, AvroCodec}
import graft.sources.Tables

/** Oracle rows for the binary codecs (SURVEY.md §2.6 rows 43/46 —
  * avro + arrow, formerly jar-gated / missing).
  *
  * Two kinds of evidence, both portable:
  *   - q_avro pins the avro BINARY itself: for a record whose varints are
  *     all single-byte (short tag string, n < 64 so zigzag(n) < 128), the
  *     datum hex is reconstructible in DuckDB by concatenation —
  *     an independent statement of the avro spec's zigzag/length-prefix
  *     wire format, not a mirrored expression — plus a typed round-trip
  *     through encode -> parse on a second, richer record.
  *   - q_arrow proves the distributed encode -> decode identity: rows ->
  *     partition-local IPC stream blobs -> rows, hashed against the plain
  *     projection by the oracle. The IPC framing itself (stream magic,
  *     EOS, batch bounds) is pinned byte-level in CodecBinarySpec where
  *     DuckDB has no reach.
  */
object CodecQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "events")

  private def e: Column = col("event_id")

  // ------------------------------------------------------------ q_avro

  /** Single-byte-varint record: hex is oracle-reconstructible. */
  private val TagSchema =
    """{"type":"record","name":"T","fields":[
      {"name":"tag","type":"string"},
      {"name":"n","type":"long"}]}"""

  /** Richer record for the typed round-trip leg. */
  private val TurnSchema =
    """{"type":"record","name":"Turn","fields":[
      {"name":"tag","type":"string"},
      {"name":"uid","type":"long"},
      {"name":"val","type":"double"},
      {"name":"flag","type":"boolean"},
      {"name":"note","type":["null","string"],"default":null}]}"""

  private def qAvro(s: SparkSession, dir: String): DataFrame = {
    val tagDatum = AvroCodec.encodeAvro(
      struct(col("event_type").as("tag"), (e % 32).as("n")), TagSchema)
    val turnDatum = AvroCodec.encodeAvro(
      struct(
        col("event_type").as("tag"),
        col("user_id").as("uid"),
        col("value").as("val"),
        (e % 2 === 0).as("flag"),
        when(e % 5 === 0, lit(null: String)).otherwise(col("event_type")).as("note")),
      TurnSchema)
    val rt = AvroCodec.parseAvro(turnDatum, TurnSchema)
    events(s, dir).select(
        e.as("event_id"),
        lower(hex(tagDatum)).as("avro_hex"),
        rt.getField("tag").as("rt_tag"),
        rt.getField("uid").as("rt_uid"),
        rt.getField("val").as("rt_val"),
        rt.getField("flag").cast("int").as("rt_flag"),
        rt.getField("note").as("rt_note"))
      .orderBy("event_id")
  }

  // ------------------------------------------------------------ q_arrow

  private def qArrow(s: SparkSession, dir: String): DataFrame = {
    val base = events(s, dir)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val blobs = ArrowCodec.encodeStream(base, batchSize = 256)
    ArrowCodec.decodeStream(blobs, "arrow_ipc", base.schema)
      .select(
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("ts_iso"),
        col("event_type"),
        col("value"))
      .orderBy("event_id")
  }

  val spark: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q_avro"  -> (qAvro _),
    "q_arrow" -> (qArrow _)
  )

  // ====================================================== DuckDB oracle

  val oracle: ListMap[String, String] = ListMap(
    "q_avro" ->
      // datum = varint(zigzag(len(tag))) + tag-bytes + varint(zigzag(n)):
      // all varints single-byte by construction (len<=8, n<32)
      """SELECT event_id,
           lower(lpad(hex(length(event_type) * 2), 2, '0')
             || hex(encode(event_type))
             || lpad(hex(2 * (event_id % 32)), 2, '0')) AS avro_hex,
           event_type AS rt_tag,
           user_id AS rt_uid,
           "value" AS rt_val,
           CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS rt_flag,
           CASE WHEN event_id % 5 = 0 THEN NULL ELSE event_type END AS rt_note
         FROM events ORDER BY event_id""",
    "q_arrow" ->
      """SELECT event_id,
           strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS ts_iso,
           event_type,
           "value"
         FROM events ORDER BY event_id"""
  )
}
