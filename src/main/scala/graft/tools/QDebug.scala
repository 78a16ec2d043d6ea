package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: replicate graft.Bench's part-1 per-query session exactly
  * (coalesce disabled, shuffle.partitions = 2x cores) and time the
  * named queries once each in the given order — to reproduce per-query
  * timings the driver's bench reports.
  * Usage: QDebug <sfDir> <query>...
  */
object QDebug {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val names = args.drop(1)
    val cpus = 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus * 2)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.transcript(spark, dir).count()
    for (n <- names) {
      val t0 = System.nanoTime()
      val cnt = graft.SparkEntry.queries(n)(spark, dir).count()
      println(f"$n: ${(System.nanoTime() - t0) / 1e9}%.2f s ($cnt rows)")
    }
    spark.stop()
  }
}
