package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
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
  /** Sink compression: zstd — ~35% fewer bytes than snappy on this
    * text-heavy payload. Measured (tools/WriteBench, incl. a tmpfs
    * control): the sandbox write path is CPU-bound, and zstd's extra
    * compression CPU still lands at-or-below snappy's write-included
    * walls in like-for-like runs — so the archival codec wins on bytes
    * without losing wall. On a real cluster sink (object store / NVMe)
    * the byte saving additionally buys back bandwidth.
    */
  val Compression = "zstd"
  def write(df: DataFrame, target: String, partitionBy: Seq[String],
            mode: SaveMode): Unit = {
    val w = df.write
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", Compression)
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
    *
    * The stats columns are computed only when the frame carries them —
    * the config front-end points this manifest at arbitrary sink
    * schemas, where a missing `conv_id`/`turn_idx`/`ts` yields a null
    * stat, not an analysis error. Resume keys off port presence, so
    * nulls here cost nothing.
    */
  def manifestFor(routed: DataFrame, jobId: String): DataFrame = {
    val cols = routed.columns.toSet
    def ifHas(c: String)(agg: => Column, orElse: Column): Column =
      if (cols.contains(c)) agg else orElse
    routed.groupBy(col("port"))
      .agg(
        count(lit(1)).as("n_rows"),
        ifHas("conv_id")(approx_count_distinct(col("conv_id")),
          lit(null).cast("long")).as("n_convs"),
        ifHas("turn_idx")(min(col("turn_idx")), lit(null).cast("int")).as("min_turn"),
        ifHas("turn_idx")(max(col("turn_idx")), lit(null).cast("int")).as("max_turn"),
        ifHas("ts")(date_format(min(col("ts")), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
          lit(null).cast("string")).as("min_ts"),
        ifHas("ts")(date_format(max(col("ts")), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
          lit(null).cast("string")).as("max_ts"))
      .withColumn("job_id", lit(jobId))
  }

  /** Footer-statistics manifest: the same per-port lineage row computed
    * from the committed files' PARQUET FOOTERS — row counts and column
    * min/max come from file metadata, so the checkpoint costs a
    * metadata pass instead of re-scanning the written rows (the
    * Iceberg/Delta manifest model, and the at-scale default: the exact
    * path below re-reads the pruned data columns, which at 100 TB is a
    * second full pass over the sink). Two deltas vs [[manifestFor]],
    * both documented: `n_convs` is null (distinct counts are not
    * derivable from footers; resume keys off port presence, and the
    * count is telemetry), and the stats are exact only because parquet
    * writes true min/max for these physical types (int64/timestamp) —
    * binary columns would need truncation-aware handling.
    */
  def manifestFromFooters(spark: SparkSession, dataDir: String,
                          ports: Set[String], jobId: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(dataDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = ports.toSeq.flatMap { p =>
      val d = new Path(dataDir, s"port=$p")
      if (fs.exists(d))
        fs.listStatus(d).toSeq.filter(_.getPath.getName.endsWith(".parquet"))
          .map(st => (p, st.getPath.toString))
      else Seq.empty
    }
    // ship the DRIVER's hadoop conf to the tasks: a bare task-local
    // Configuration() drops every spark.hadoop.* setting (s3a
    // credentials/endpoint, non-default fs.defaultFS), which would fail
    // every footer read on a cluster whose sink FS is configured
    // through Spark conf
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val rows = spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.size, 64)))
      .map { case (port, path) =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new Path(path), confBc.value.value)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          import scala.jdk.CollectionConverters._
          var n = 0L
          var minT = Long.MaxValue; var maxT = Long.MinValue
          var minTs = Long.MaxValue; var maxTs = Long.MinValue
          reader.getFooter.getBlocks.asScala.foreach { b =>
            n += b.getRowCount
            b.getColumns.asScala.foreach { c =>
              val st = c.getStatistics
              if (st != null && st.hasNonNullValue) {
                c.getPath.toDotString match {
                  case "turn_idx" =>
                    minT = math.min(minT, st.genericGetMin.asInstanceOf[Number].longValue)
                    maxT = math.max(maxT, st.genericGetMax.asInstanceOf[Number].longValue)
                  case "ts" =>
                    minTs = math.min(minTs, st.genericGetMin.asInstanceOf[Number].longValue)
                    maxTs = math.max(maxTs, st.genericGetMax.asInstanceOf[Number].longValue)
                  case _ => ()
                }
              }
            }
          }
          (port, n, minT, maxT, minTs, maxTs)
        } finally reader.close()
      }
    // Sentinels survive when a file carries no turn_idx/ts stats at all
    // (config-front-end sinks have arbitrary schemas) — null them out
    // rather than let the int cast overflow under ANSI mode.
    def defined(c: String, sentinel: Long): Column =
      when(col(c) =!= sentinel, col(c))
    spark.createDataFrame(rows).toDF(
        "port", "n_rows", "min_t", "max_t", "min_us", "max_us")
      .groupBy(col("port"))
      .agg(
        sum(col("n_rows")).as("n_rows"),
        lit(null).cast("long").as("n_convs"),
        min(defined("min_t", Long.MaxValue)).cast("int").as("min_turn"),
        max(defined("max_t", Long.MinValue)).cast("int").as("max_turn"),
        date_format(timestamp_micros(min(defined("min_us", Long.MaxValue))),
          "yyyy-MM-dd'T'HH:mm:ss'Z'").as("min_ts"),
        date_format(timestamp_micros(max(defined("max_us", Long.MinValue))),
          "yyyy-MM-dd'T'HH:mm:ss'Z'").as("max_ts"))
      .withColumn("job_id", lit(jobId))
  }

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
  /** Returns THIS run's manifest frame (already appended to
    * `manifestDir`). Callers needing "rows written by this run" must
    * aggregate the returned frame, not re-read the manifest dir: the
    * dir accumulates one batch per run (append), so a dir-wide
    * sum(n_rows) for a job_id double-counts on every re-run even though
    * the data itself was partition-overwritten.
    */
  def writeWithCheckpoint(routed: DataFrame, dataDir: String,
                          manifestDir: String, jobId: String,
                          io: TableIO = ParquetIO,
                          footerStats: Boolean = false,
                          knownPorts: Option[Set[String]] = None): DataFrame = {
    writeRouted(routed, dataDir, io)
    val manifest =
      if (footerStats && (io eq ParquetIO)) {
        // at-scale path: lineage from the committed files' footers —
        // still scoped to this run's ports, no data re-read. The port
        // set is STATIC for a route topology (condition names +
        // _unmatched) — pass it via knownPorts; deriving it from the
        // frame re-executes the whole upstream pipeline for a handful
        // of strings (measured 3-12 s at bench scale).
        val ports = knownPorts.getOrElse(
          routed.select("port").distinct().collect().map(_.getString(0)).toSet)
        manifestFromFooters(routed.sparkSession, dataDir, ports, jobId)
      } else {
        // knownPorts short-circuits the semi-join here too: deriving the
        // port set from the frame re-executes the whole upstream
        // pipeline for a handful of static strings
        val committed = knownPorts match {
          case Some(ports) =>
            io.read(routed.sparkSession, dataDir)
              .filter(col("port").isin(ports.toSeq: _*))
          case None =>
            io.read(routed.sparkSession, dataDir)
              .join(broadcast(routed.select("port").distinct()), Seq("port"), "left_semi")
        }
        manifestFor(committed, jobId)
      }
    // one compute: persist over the write + snapshot, then return a
    // LOCAL copy (one row per port — driver-sized by construction) so
    // the caller's aggregation neither re-runs the manifest plan nor
    // pins executor storage
    manifest.persist()
    try {
      io.write(manifest, manifestDir, Seq.empty, SaveMode.Append)
      routed.sparkSession.createDataFrame(
        java.util.Arrays.asList(manifest.collect(): _*), manifest.schema)
    } finally { manifest.unpersist(); () }
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
