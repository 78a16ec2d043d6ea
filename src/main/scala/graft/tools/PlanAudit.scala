package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-anti-pattern audit over the whole query registry: prints any
  * query whose physical plan contains a single-partition exchange or a
  * cartesian product (the two shapes that cannot survive a scale-up).
  * BroadcastNestedLoopJoin is reported but allowed where the quadratic
  * output is the operator's contract (all-pairs dedup/knn baselines).
  * Usage: PlanAudit <sfDir>
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: PlanAudit <sfDir>   (e.g. /root/testdata/sf0.001)")
      sys.exit(2)
    }
    val dir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      val single = "Exchange SinglePartition".r.findAllIn(plan).size
      val cart = "CartesianProduct".r.findAllIn(plan).size
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
      // higher-order functions (lambdafunction in the plan) are
      // CodegenFallback: the lambda runs interpreted per row and fences
      // the projection out of whole-stage codegen — exactly the shape
      // that cost the route stage 50% before the concat rewrite.
      // Allowed on per-row small-array paths (token lists, band
      // signatures); a NOTE here is the checklist of where that
      // trade-off was made.
      val hof = "lambdafunction".r.findAllIn(plan).size
      if (single > 0 || cart > 0) {
        bad += 1
        println(s"BAD  $name: singlePartitionExchanges=$single cartesian=$cart")
      } else if (bnlj > 0) {
        println(s"NOTE $name: broadcastNestedLoop=$bnlj (allowed iff all-pairs is the contract)")
      } else if (hof > 0) {
        println(s"NOTE $name: interpretedLambdas=$hof (codegen fallback on a small-array path)")
      }
    }
    println(s"audit done, bad=$bad of ${graft.SparkEntry.queries.size}")
    spark.stop()
  }
}
