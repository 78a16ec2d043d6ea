package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.Pipeline
import graft.sources.Tables

/** Debug main: time the checkpointed fan-out write under different
  * parquet compression codecs at two parallelism levels — the knob
  * study behind the sink-stage scaling numbers in BENCH/BASELINE.md.
  * Usage: WriteBench <sfDir> [replicas] [codec,codec,...]
  */
object WriteBench {

  private def session(cpus: Int, codec: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-writebench-$cpus-$codec")
      .config("spark.sql.shuffle.partitions", cpus * 2)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", codec)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("WB_MAXPART", "128m"))
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
        sys.env.getOrElse("WB_COMMITTER", "1"))
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(8)
    val codecs = args.lift(2).map(_.split(",").toSeq)
      .getOrElse(Seq("snappy", "zstd", "lz4"))

    // prepare once (untimed), snappy input
    val prep = session(16, "snappy")
    val inputDir = Files.createTempDirectory("graft-writebench-in").toString
    Tables.transcript(prep, sfDir)
      .crossJoin(broadcast(prep.range(replicas).select(col("id").as("replica"))))
      .withColumn("conv_id", concat_ws("-", col("replica"), col("conv_id")))
      .drop("replica")
      .repartition(64, col("conv_id"))
      .write.mode("overwrite").parquet(inputDir)
    val n = prep.read.parquet(inputDir).count()
    prep.stop()
    println(s"input: $n turns")

    def run(cpus: Int, codec: String): (Double, Long) = {
      val spark = session(cpus, codec)
      try {
        // WB_OUT_BASE=/dev/shm isolates the disk floor: same job, same
        // bytes, but the sink lands on tmpfs — the control experiment
        // for "is the write stage disk-bound or CPU-bound".
        val out = sys.env.get("WB_OUT_BASE") match {
          case Some(base) => Files.createTempDirectory(
            java.nio.file.Paths.get(base), s"graft-writebench-$cpus-$codec")
          case None => Files.createTempDirectory(s"graft-writebench-$cpus-$codec")
        }
        val t0 = System.nanoTime()
        val st = Pipeline.buildFrom(spark, spark.read.parquet(inputDir))
        graft.sinks.MultiSink.writeRouted(st.routed, s"$out/data")
        val tData = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val footer = sys.env.get("WB_FOOTER").isDefined
        val manifest = if (footer) {
          val ports = Pipeline.routeConditions.keys.toSet +
            graft.operators.Route.UnmatchedPort
          graft.sinks.MultiSink.manifestFromFooters(
            spark, s"$out/data", ports, s"wb-$cpus-$codec")
        } else {
          val committed = spark.read.parquet(s"$out/data")
            .join(broadcast(st.routed.select("port").distinct()), Seq("port"), "left_semi")
          graft.sinks.MultiSink.manifestFor(committed, s"wb-$cpus-$codec")
        }
        graft.sinks.ParquetIO.write(manifest,
          s"$out/manifest", Seq.empty, org.apache.spark.sql.SaveMode.Append)
        val tMan = (System.nanoTime() - t1) / 1e9
        println(f"  [$codec cpus=$cpus] data=$tData%.2f s manifest=$tMan%.2f s")
        val sec = tData + tMan
        val bytes = org.apache.commons.io.FileUtils.sizeOfDirectory(
          new java.io.File(s"$out/data"))
        org.apache.commons.io.FileUtils.deleteQuietly(out.toFile)
        (sec, bytes)
      } finally spark.stop()
    }

    // JIT warmup, discarded
    run(16, codecs.head)
    codecs.foreach { c =>
      val (s4, b) = run(4, c)
      val (s16, _) = run(16, c)
      println(f"$c%-8s N=4: $s4%7.2f s   4N=16: $s16%7.2f s   eff=${s4 / (4 * s16)}%.3f   bytes=${b / 1e6}%.0f MB")
    }
  }
}
