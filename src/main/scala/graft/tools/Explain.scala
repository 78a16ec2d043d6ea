package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints formatted physical plans of the flagship
  * pipeline stages so shuffle count / pushdown / broadcast decisions
  * can be reviewed per round (usage:
  * `tools/run_main.sh graft.tools.Explain [sfDir]`).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val st = graft.plans.Pipeline.build(spark, sfDir)
    println("==== aggregated (end-to-end) ====")
    st.aggregated.explain("formatted")
    println("==== parsed, 2-col projection (pruning/pushdown check) ====")
    st.parsed.select("conv_id", "level").explain("formatted")
    spark.stop()
  }
}
