package graft.tools
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val names = args.drop(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names; rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val cnt = graft.SparkEntry.queries(n)(spark, dir).count()
      println(f"$n rep$rep: ${(System.nanoTime()-t0)/1e9}%.2f s ($cnt rows)")
    }
  }
}
