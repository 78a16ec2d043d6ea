package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scratch: materialize the Bench scaling-job input (inflated transcript
  * table) to a given directory so BenchDebug probes can reuse it without
  * re-running the whole bench. Usage: PrepInput <sfDir> <outDir> [replicas]
  */
object PrepInput {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val replicas = if (args.length > 2) args(2).toInt else 128
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.transcript(spark, sfDir)
    val inflated = base
      .crossJoin(broadcast(spark.range(replicas).select(col("id").as("replica"))))
      .withColumn("conv_id", concat_ws("-", col("replica"), col("conv_id")))
      .drop("replica")
      .repartition(64, col("conv_id"))
    inflated.write.mode("overwrite").parquet(outDir)
    println(s"rows=${spark.read.parquet(outDir).count()}")
    spark.stop()
  }
}
