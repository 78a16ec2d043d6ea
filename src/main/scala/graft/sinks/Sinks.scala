package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sink layer: table-format abstraction, route fan-out writes, and the
  * per-partition lineage + metrics checkpoint that makes jobs resumable.
  *
  * Reference mapping (SURVEY.md §2.5):
  *  - templated file paths (`/logs/%Y/{{ field }}.log`,
  *    src/sinks/file/mod.rs:51-70) → `partitionBy(cols)` dynamic
  *    partitioning — one shuffle-free fan-out write instead of N jobs;
  *  - batching/retry/ack machinery (sinks/util/, finalization.rs) →
  *    Spark's task commit protocol — NOT reimplemented;
  *  - end-to-end acknowledgements → the lineage manifest written AFTER
  *    the data commit: a partition listed in the manifest is durable,
  *    exactly like Vector's checkpoint-after-ack
  *    (lib/file-source-common/src/checkpointer.rs:44).
  *
  * The north rule's Iceberg tables are a format knob: `TableIO` has a
  * parquet implementation (tests/bench — no Iceberg runtime jar in this
  * sandbox) and an Iceberg implementation that activates when the
  * runtime jar + catalog config are present. Resume uses dynamic
  * partition overwrite as the sandbox analog of Iceberg's atomic
  * snapshot replace.
  */
trait TableIO {
  def write(df: DataFrame, target: String, partitionBy: Seq[String],
            mode: SaveMode): Unit
  def read(spark: SparkSession, target: String): DataFrame
}

/** Parquet directories with dynamic partition overwrite — partition-
  * level idempotent rewrite (the resume primitive).
  */
object ParquetIO extends TableIO {
  def write(df: DataFrame, target: String, partitionBy: Seq[String],
            mode: SaveMode): Unit = {
    val w = df.write
      .option("partitionOverwriteMode", "dynamic")
      .mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(target)
  }
  def read(spark: SparkSession, target: String): DataFrame =
    spark.read.parquet(target)
}

/** Iceberg tables (target = catalog table identifier). Requires the
  * iceberg-spark-runtime jar + catalog conf; absent in this sandbox, so
  * this path is exercised only when the classpath provides it.
  */
object IcebergIO extends TableIO {
  def write(df: DataFrame, target: String, partitionBy: Seq[String],
            mode: SaveMode): Unit = {
    val w = df.writeTo(target)
    mode match {
      case SaveMode.Overwrite => w.overwritePartitions()
      case _                  => w.append()
    }
  }
  def read(spark: SparkSession, target: String): DataFrame =
    spark.read.table(target)
}

/** Route fan-out + lineage/metrics checkpoint + resume. */
object MultiSink {

  /** Write the tagged route output in ONE pass, dynamically partitioned
    * by port (reference: route fan-out to per-port sinks). The write is
    * shuffle-free: each task appends to the partitions it sees.
    */
  def writeRouted(routed: DataFrame, dir: String,
                  io: TableIO = ParquetIO,
                  mode: SaveMode = SaveMode.Overwrite): Unit =
    io.write(routed, dir, Seq("port"), mode)

  /** Per-port lineage + metrics rows computed from the data itself —
    * the distributed analog of Vector's per-component telemetry
    * (src/internal_events/) + checkpoint positions. One hash-agg over
    * the frame; no driver-side iteration. `n_convs` is
    * approx_count_distinct: the count is telemetry (resume keys off
    * port PRESENCE, not counts), and the exact distinct's Expand +
    * second exchange would double the manifest pass over the committed
    * data for a number nobody consumes exactly.
    */
  def manifestFor(routed: DataFrame, jobId: String): DataFrame =
    routed.groupBy(col("port"))
      .agg(
        count(lit(1)).as("n_rows"),
        approx_count_distinct(col("conv_id")).as("n_convs"),
        min(col("turn_idx")).as("min_turn"),
        max(col("turn_idx")).as("max_turn"),
        date_format(min(col("ts")), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("min_ts"),
        date_format(max(col("ts")), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("max_ts"))
      .withColumn("job_id", lit(jobId))

  /** Checkpointed write: data partitions first, manifest second. The
    * manifest is the commit record — on failure between the two writes,
    * the affected ports are simply absent from the manifest and will be
    * rewritten on resume (idempotent via dynamic partition overwrite).
    *
    * The manifest is computed FROM THE COMMITTED FILES, not from the
    * in-memory routed frame: (a) it then records what is actually
    * durable — the property a checkpoint exists to witness; (b) the
    * read-back is a column-pruned scan of 4 small columns, while the
    * alternative (persist the routed frame, write it, re-aggregate the
    * cache) moves the full event payload through the block store twice
    * — measured 0.68 scaling efficiency at bench scale vs ≥0.8 without
    * the persist (cache spill dominates the small-cluster run).
    *
    * The read-back is SCOPED to the ports this run actually routed (a
    * broadcast semi-join on the routed frame's distinct ports): when
    * dataDir is reused across jobs, partitions committed by EARLIER
    * jobs must not be stamped with this jobId — completedPorts/resume
    * would otherwise treat ports this job never wrote as committed for
    * it, and the min/max stats would cover data it didn't produce.
    * Partition pruning turns the semi-join into a pruned scan: only
    * this run's port directories are read.
    */
  def writeWithCheckpoint(routed: DataFrame, dataDir: String,
                          manifestDir: String, jobId: String,
                          io: TableIO = ParquetIO): Unit = {
    writeRouted(routed, dataDir, io)
    val committed = io.read(routed.sparkSession, dataDir)
      .join(broadcast(routed.select("port").distinct()), Seq("port"), "left_semi")
    io.write(manifestFor(committed, jobId), manifestDir, Seq.empty, SaveMode.Append)
  }

  /** Ports already committed for `jobId` according to the manifest. */
  def completedPorts(spark: SparkSession, manifestDir: String,
                     jobId: String, io: TableIO = ParquetIO): Set[String] =
    try io.read(spark, manifestDir)
      .filter(col("job_id") === jobId)
      .select("port").distinct()
      .collect().map(_.getString(0)).toSet
    catch { case _: Exception => Set.empty }

  /** Resume a partially-committed job: rewrite ONLY the ports missing
    * from the manifest. Returns the ports that were (re)written.
    * Dynamic partition overwrite makes the rewrite idempotent — a
    * half-written partition from the failed run is replaced whole.
    */
  def resume(routed: DataFrame, dataDir: String, manifestDir: String,
             jobId: String, io: TableIO = ParquetIO): Set[String] = {
    val spark = routed.sparkSession
    val done = completedPorts(spark, manifestDir, jobId, io)
    val todo = routed.filter(!col("port").isin(done.toSeq: _*)).persist()
    try {
      val ports = todo.select("port").distinct().collect()
        .map(_.getString(0)).toSet
      if (ports.nonEmpty) {
        io.write(todo, dataDir, Seq("port"), SaveMode.Overwrite)
        io.write(manifestFor(todo, jobId), manifestDir, Seq.empty, SaveMode.Append)
      }
      ports
    } finally { todo.unpersist(); () }
  }
}
