package graft.config

import scala.collection.immutable.ListMap

import org.apache.spark.sql.functions._

/** Process-wide registry backing `[enrichment_tables.*.type = "memory"]`
  * (reference src/enrichment_tables/memory/table.rs): a writable
  * key-value cache that components WRITE into by routing events at it
  * and VRL reads with `get_enrichment_table_record(name, {"key": k})`.
  *
  * Write semantics are the reference's exactly (table.rs:151-199
  * handle_value): each written event contributes one cache entry PER
  * TOP-LEVEL FIELD — the field name is the key, the rendered field
  * value the cached value — with last-write-wins replacement and the
  * TTL clock reset on replace. Reads return `{key, value, ttl}` with
  * `ttl` the remaining lifetime (table.rs:63-80 as_object_map);
  * expired entries stop resolving.
  *
  * The registry is process-global and keyed by table name so the cache
  * OUTLIVES one topology evaluation — the batch contract is
  * "writes settle before reads": a run (or streaming drain) that
  * feeds the table makes its entries visible to every later
  * compilation, mirroring the reference's live cache across a running
  * topology's lifetime. Lookup tables are in-memory data by contract
  * (same stance as the CSV tables), so the cache lives driver-side;
  * the DataFrame-faced [[graft.streaming.MemoryTable]] remains the
  * scale path for join-shaped enrichment.
  */
object MemoryCache {

  final case class Entry(value: String, updateMillis: Long, ttlSecs: Long)

  private val tables =
    scala.collection.concurrent.TrieMap[
      String, scala.collection.mutable.LinkedHashMap[String, Entry]]()

  def upsertFields(table: String, fields: Seq[(String, String)],
                   ttlSecs: Long, nowMillis: Long = System.currentTimeMillis()): Unit =
    synchronized {
      val t = tables.getOrElseUpdate(table,
        scala.collection.mutable.LinkedHashMap.empty)
      fields.foreach { case (k, v) => t(k) = Entry(v, nowMillis, ttlSecs) }
    }

  /** Routes a frame into the cache: rows in `__seq` order, each
    * top-level event field an entry. Containers render as JSON,
    * scalars as their display form (the CSV-table convention — VRL
    * consumers cast). Driver-side collect is the semantic: the
    * reference cache is a process-local map.
    */
  def upsertFrame(table: String, frame: Frame, ttlSecs: Long): Unit = {
    val df = frame.df
    val cols = df.schema.fields.filter(_.name != Topology.SeqCol)
    val rendered = cols.map { f =>
      f.dataType match {
        case org.apache.spark.sql.types.StringType => col(s"`${f.name}`")
        case _: org.apache.spark.sql.types.StructType |
             _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.MapType =>
          to_json(col(s"`${f.name}`"))
        case org.apache.spark.sql.types.TimestampType =>
          date_format(col(s"`${f.name}`"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        case _ => col(s"`${f.name}`").cast("string")
      }
    }
    val ordered = df.orderBy(col(Topology.SeqCol)).select(rendered.toSeq: _*)
    ordered.collect().foreach { row =>
      val fields = cols.indices.flatMap { i =>
        if (row.isNullAt(i)) None else Some(cols(i).name -> row.getString(i))
      }
      upsertFields(table, fields, ttlSecs)
    }
  }

  /** Live entries as VRL lookup rows `{key, value, ttl}`. */
  def snapshot(table: String,
               nowMillis: Long = System.currentTimeMillis()): Seq[ListMap[String, String]] =
    synchronized {
      tables.get(table).toSeq.flatMap(_.collect {
        case (k, e) if (nowMillis - e.updateMillis) / 1000 <= e.ttlSecs =>
          ListMap("key" -> k, "value" -> e.value,
            "ttl" -> (e.ttlSecs - (nowMillis - e.updateMillis) / 1000).toString)
      })
    }

  /** Test isolation. */
  def drop(table: String): Unit = synchronized { tables.remove(table); () }
}
