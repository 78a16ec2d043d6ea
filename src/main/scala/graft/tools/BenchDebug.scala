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
    val fullOnly = args.length > 2 && args(2) == "fullOnly"
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
