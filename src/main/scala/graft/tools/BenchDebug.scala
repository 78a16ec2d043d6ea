package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.Pipeline

/** Scratch: decompose the scaling job to find the non-scaling part.
  * Usage: BenchDebug <inputDir prepared by Bench> <cpus>
  */
object BenchDebug {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val a = f
    println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
  }
  def main(args: Array[String]): Unit = {
    val inputDir = args(0)
    val cpus = args(1).toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus * 2)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val in = spark.read.parquet(inputDir)
    def scanOnly() = in.agg(sum(length(col("text")))).collect()
    def parseOnly() = {
      val g = Pipeline.compiledGrok
      in.filter(g.matches(col("text")))
        .select(g.columns(col("text")).map { case (n, c) => c.as(n) }: _*)
        .agg(sum(length(col("msg"))), sum(col("latency_ms").cast("long"))).collect()
    }
    def noDistinct() = {
      val st = Pipeline.buildFrom(spark, in)
      st.routed.groupBy(col("port"), col("role"),
          graft.operators.Aggregate.windowStart(col("ts"), 600).as("win"))
        .agg(count(lit(1)), sum(col("latency_ms"))).count()
    }
    def full() = Pipeline.buildFrom(spark, in).aggregated.count()
    // finer separations: where between parse and aggregate does the
    // wall go? enriched/routed counts are narrow (no shuffle); aggNoTel
    // rebuilds the aggregate over a telemetry-free routed frame
    def enrichedCount() = Pipeline.buildFrom(spark, in).enriched.count()
    def routedCount() = Pipeline.buildFrom(spark, in).routed.count()
    val fullOnly = args.length > 2 && args(2) == "fullOnly"
    val stages = args.length > 2 && args(2) == "stages"
    if (stages) {
      enrichedCount(); routedCount()
      (1 to 2).foreach { i =>
        t(s"enrichedCount#$i")(enrichedCount())
        t(s"routedCount#$i")(routedCount())
      }
      spark.stop(); return
    }
    // route-stage A/B: HOF-filter array vs codegen concat; with and
    // without the observe() CollectMetrics node
    if (args.length > 2 && args(2) == "route") {
      import graft.operators.Route
      import scala.collection.immutable.ListMap
      def base() = Pipeline.buildFrom(spark, in).enriched
      val conds = Pipeline.routeConditions
      def hofNoTel() = Route.tagged(base(), conds).count()
      def concatNoTel() = {
        val arrays = conds.map { case (n, c) =>
          when(coalesce(c, lit(false)), array(lit(n)))
            .otherwise(array().cast("array<string>"))
        }.toSeq
        val matched = concat(arrays: _*)
        val ports = when(size(matched) === 0,
          array(lit(Route.UnmatchedPort))).otherwise(matched)
        base().withColumn("port", explode(ports)).count()
      }
      def hofTel() = graft.operators.Telemetry.routedSent(
        Route.tagged(base(), conds),
        conds.keys.toSeq :+ Route.UnmatchedPort).count()
      hofNoTel(); concatNoTel(); hofTel()
      (1 to 2).foreach { i =>
        t(s"hofNoTel#$i")(hofNoTel())
        t(s"concatNoTel#$i")(concatNoTel())
        t(s"hofTel#$i")(hofTel())
      }
      spark.stop(); return
    }
    if (fullOnly) {
      full()
      (1 to 2).foreach(i => t(s"full#$i")(full()))
    } else {
      // warmups
      scanOnly(); parseOnly(); noDistinct(); full()
      (1 to 2).foreach { i =>
        t(s"scanOnly#$i")(scanOnly())
        t(s"parseOnly#$i")(parseOnly())
        t(s"noDistinct#$i")(noDistinct())
        t(s"full#$i")(full())
      }
    }
    spark.stop()
  }
}
