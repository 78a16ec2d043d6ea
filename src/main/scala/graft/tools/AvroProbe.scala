package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.struct

/** Scratch: does the avro codec actually evaluate in this sandbox
  * (Spark 4 moved org.apache.spark.sql.avro.functions into
  * spark-sql-api, but the expression implementation may still need the
  * spark-avro module)?
  */
object AvroProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.avro.functions._
    val df = Seq(("a", 1L), ("b", 2L)).toDF("s", "n")
    try {
      val enc = df.select(to_avro(struct($"s", $"n")).as("av"))
      val schema =
        """{"type":"record","name":"r","fields":[
          |{"name":"s","type":"string"},{"name":"n","type":"long"}]}""".stripMargin
      val out = enc.select(from_avro($"av", schema).as("r"))
        .select("r.s", "r.n").collect()
      println("AVRO_OK " + out.mkString(","))
    } catch {
      case e: Throwable =>
        println("AVRO_FAIL " + e.getClass.getName + ": " +
          String.valueOf(e.getMessage).take(300))
    }
    spark.stop()
  }
}
