package graft.tools
import org.apache.spark.sql.SparkSession
/** Plan audit for an arbitrary registered query: ExplainQ <sfDir> <query>... */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.drop(1)) {
      println(s"==== $q ====")
      graft.SparkEntry.queries(q)(spark, args(0)).explain("formatted")
    }
    spark.stop()
  }
}
