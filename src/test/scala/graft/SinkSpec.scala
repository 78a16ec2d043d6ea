package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.plans.Pipeline
import graft.sinks.{MultiSink, ParquetIO}

/** Sink + lineage-checkpoint specs: fan-out write, manifest metrics,
  * resume of a partially-committed job.
  */
class SinkSpec extends SparkSpec {

  private lazy val routed = Pipeline.build(spark, sfDir).routed

  private def tmp(): String =
    Files.createTempDirectory("graft-sink").toString

  test("routed fan-out write partitions by port; data round-trips") {
    val dir = tmp()
    MultiSink.writeRouted(routed, dir)
    val back = ParquetIO.read(spark, dir)
    assert(back.count() == routed.count())
    val ports = back.select("port").distinct().collect().map(_.getString(0)).toSet
    assert(ports == routed.select("port").distinct().collect().map(_.getString(0)).toSet)
    // physical layout: one subdirectory per port (dynamic partitioning)
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("port=")).toSet
    assert(subdirs == ports.map(p => s"port=$p"))
  }

  test("footer-stats manifest matches the exact data-scan manifest (minus n_convs)") {
    val dir = tmp()
    MultiSink.writeRouted(routed, dir)
    val ports = routed.select("port").distinct().collect().map(_.getString(0)).toSet
    val cols = Seq("port", "n_rows", "min_turn", "max_turn", "min_ts", "max_ts")
    val exact = MultiSink.manifestFor(ParquetIO.read(spark, dir), "jf")
      .select(cols.head, cols.tail: _*).orderBy("port").collect().toSeq
    val footer = MultiSink.manifestFromFooters(spark, dir, ports, "jf")
      .select(cols.head, cols.tail: _*).orderBy("port").collect().toSeq
    assert(footer == exact)
    // n_convs is the documented footer-mode gap (not derivable from
    // file metadata; resume keys off port presence)
    assert(MultiSink.manifestFromFooters(spark, dir, ports, "jf")
      .filter(col("n_convs").isNotNull).count() == 0)
  }

  test("exact-path checkpoint honors knownPorts (no pipeline re-execution for the port list)") {
    import spark.implicits._
    val dataDir = tmp(); val manifestDir = tmp()
    val ports = routed.select("port").distinct().collect().map(_.getString(0)).toSet
    MultiSink.writeWithCheckpoint(routed, dataDir, manifestDir, "jkp",
      footerStats = false, knownPorts = Some(ports))
    val m = ParquetIO.read(spark, manifestDir).filter(col("job_id") === "jkp")
    assert(m.select("port").distinct().collect().map(_.getString(0)).toSet == ports)
    val exact = MultiSink.manifestFor(ParquetIO.read(spark, dataDir), "jkp")
      .select("port", "n_rows").orderBy("port").collect().toSeq
    assert(m.select("port", "n_rows").orderBy("port").collect().toSeq == exact)
  }

  test("manifests degrade to null stats on non-transcript schemas") {
    // the config front-end points checkpointed sinks at arbitrary
    // schemas: absent conv_id/turn_idx/ts must yield null stats, not an
    // analysis error (exact path) or an ANSI sentinel overflow on the
    // Long.MaxValue/MinValue footer accumulators (footer path)
    import spark.implicits._
    val df = Seq(("a", 1.0), ("b", 2.0), ("a", 3.0))
      .toDF("port", "value")
    val exact = MultiSink.manifestFor(df, "j")
      .orderBy("port").collect()
    assert(exact.map(r => r.getAs[String]("port") -> r.getAs[Long]("n_rows")).toSeq
      == Seq("a" -> 2L, "b" -> 1L))
    assert(exact.forall(r => r.isNullAt(r.fieldIndex("min_turn"))
      && r.isNullAt(r.fieldIndex("min_ts"))))
    val dataDir = tmp(); val manifestDir = tmp()
    MultiSink.writeWithCheckpoint(df, dataDir, manifestDir, "j2",
      footerStats = true)
    val footer = ParquetIO.read(spark, manifestDir).orderBy("port").collect()
    assert(footer.map(r => r.getAs[String]("port") -> r.getAs[Long]("n_rows")).toSeq
      == Seq("a" -> 2L, "b" -> 1L))
    assert(footer.forall(r => r.isNullAt(r.fieldIndex("min_turn"))
      && r.isNullAt(r.fieldIndex("min_ts"))))
  }

  test("manifest carries per-port lineage + metrics") {
    val m = MultiSink.manifestFor(routed, "job1").collect()
      .map(r => r.getAs[String]("port") -> r.getAs[Long]("n_rows")).toMap
    val expected = routed.groupBy("port").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == expected)
  }

  test("checkpointed write + resume: only missing ports are rewritten") {
    val dataDir = tmp(); val manifestDir = tmp()
    MultiSink.writeWithCheckpoint(routed, dataDir, manifestDir, "job2")
    assert(MultiSink.resume(routed, dataDir, manifestDir, "job2").isEmpty)

    // simulate a run that died before committing the 'errors' port:
    // drop its manifest rows and corrupt its data partition
    val m = ParquetIO.read(spark, manifestDir)
      .filter(col("port") =!= "errors")
    val manifestDir2 = tmp()
    ParquetIO.write(m, manifestDir2, Seq.empty,
      org.apache.spark.sql.SaveMode.Overwrite)
    val errDir = new java.io.File(s"$dataDir/port=errors")
    errDir.listFiles().foreach(_.delete()) // half-written partition

    val rewritten = MultiSink.resume(routed, dataDir, manifestDir2, "job2")
    assert(rewritten == Set("errors"))
    // after resume the data is complete again
    val back = ParquetIO.read(spark, dataDir)
    assert(back.count() == routed.count())
    assert(MultiSink.resume(routed, dataDir, manifestDir2, "job2").isEmpty)
  }
}
