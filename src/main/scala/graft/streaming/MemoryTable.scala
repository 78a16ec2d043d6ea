package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The reference's `memory` enrichment table
  * (`src/enrichment_tables/memory/table.rs:110`, also a sink at `:394`
  * and a source via `memory/source.rs`, per-key TTL in
  * `memory/config.rs:31-35`): a writable key-value cache that streams
  * write into, readers join against, and entries of which expire.
  *
  * Spark re-expression: micro-batch upserts via
  * `writeStream.foreachBatch(sink)` — each batch merges
  * last-write-wins per key into a persisted snapshot; `snapshot` is
  * the source face (broadcast-join it as an enrichment side);
  * `expire(now)` applies the TTL. At production scale the snapshot is
  * a Delta/Iceberg table with MERGE + snapshot reads — this in-memory
  * variant mirrors the reference's process-local cache and keeps the
  * same three faces.
  */
final class MemoryTable(spark: SparkSession, schema: StructType,
                        keyCols: Seq[String], tsCol: String,
                        ttlSecs: Option[Long] = None) {

  // internal generation stamp: breaks ts ties ACROSS upserts in favor of
  // the newer write (true last-write-wins for same-ts rows in different
  // micro-batches). WITHIN one micro-batch two same-key same-ts rows
  // share a gen and a DataFrame carries no write order, so that last tie
  // is broken deterministically on the value columns below — a stable
  // pick across runs rather than whichever row the shuffle delivers
  // first (fully identical rows are indistinguishable either way).
  private val genCol = "__gen"
  @volatile private var gen = 0L

  @volatile private var state: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .withColumn(genCol, lit(0L))

  private def latestPerKey(df: DataFrame): DataFrame = {
    val valueTiebreak = schema.fieldNames
      .filterNot(f => keyCols.contains(f) || f == tsCol)
      .map(f => col(f).desc)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).desc +: col(genCol).desc +: valueTiebreak: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Last-write-wins merge of a batch into the snapshot. Materializes
    * the new snapshot before dropping the old one so readers never see
    * a partial state. `localCheckpoint` (eager) both persists the
    * snapshot and TRUNCATES its plan lineage — without it each merge's
    * plan references the previous snapshot's plan and the analyzer
    * stack-overflows after a few thousand micro-batches (superseded
    * checkpoint blocks are released by Spark's ContextCleaner once the
    * old snapshot is unreferenced).
    *
    * DURABILITY: `localCheckpoint` stores blocks with reliable=false —
    * losing an executor that holds snapshot blocks makes the snapshot
    * unrecoverable. That matches the reference's semantics (an
    * in-PROCESS enrichment cache dies with the process,
    * src/enrichment_tables/memory.rs) and is safe in local mode; a
    * multi-executor deployment that needs the cache to survive executor
    * loss should set `sparkContext.setCheckpointDir` and swap in
    * reliable `checkpoint()` here.
    */
  def upsert(batch: DataFrame): Unit = synchronized {
    gen += 1
    val stamped = batch.select(schema.fieldNames.map(col): _*)
      .withColumn(genCol, lit(gen))
    state = latestPerKey(state.unionByName(stamped))
      .localCheckpoint(true)
  }

  /** The sink face: plug into `writeStream.foreachBatch(mt.sink)`. */
  def sink: (DataFrame, Long) => Unit = (batch, _) => upsert(batch)

  /** The source/enrichment face: the current consistent snapshot. */
  def snapshot: DataFrame = state.drop(genCol)

  /** Drop entries older than the TTL relative to `now`. */
  def expire(now: Timestamp): Unit = ttlSecs.foreach { ttl =>
    synchronized {
      state = state
        .filter(col(tsCol) >= lit(new Timestamp(now.getTime - ttl * 1000L)))
        .localCheckpoint(true)
    }
  }

  /** Enrich `df` against the snapshot (left join on the key columns,
    * broadcast — the cache is small by contract, like the reference's
    * in-process map).
    */
  def enrich(df: DataFrame): DataFrame =
    df.join(broadcast(snapshot.drop(tsCol)), keyCols, "left")
}
