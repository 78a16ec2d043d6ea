package graft.tools

import org.apache.spark.sql.SparkSession
import graft.config._

/** Scratch debug main for the config harness (judge: throwaway tool). */
object DebugConfig {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("debug").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val topo = Topology.loadFile(args(0))
    val test = topo.testDefs.find(_.str("name").contains(args(1))).get
    val inputs = test.tab("input").toSeq ++ test.tabs("inputs")
    val bySite = inputs.zipWithIndex.groupBy(_._1.str("insert_at").get)
    val injected = bySite.map { case (at, evs) =>
      at -> UnitTestHarness.buildFrame(spark, evs.map { case (t, i) => (i.toLong, t) })
    }
    val outputs = topo.run(injected)
    outputs.foreach { case (id, f) =>
      println(s"=== $id  meta=${f.meta.types}")
      f.df.show(20, false)
      if (args.length > 2) {
        val c = Conditions.vrl(args(2), f)
        f.df.select(org.apache.spark.sql.functions.col("__seq"), c.as("cond")).show(20, false)
      }
    }
    spark.stop()
  }
}
