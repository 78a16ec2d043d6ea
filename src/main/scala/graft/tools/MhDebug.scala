package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextDedup
import graft.functions.PortableHash
object MhDebug {
  def t[A](n: String)(f: => A): A = { val t0 = System.nanoTime(); val a = f; println(f"$n: ${(System.nanoTime()-t0)/1e9}%.2f s"); a }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(args(0) + "/documents.parquet")
    val sh = t("shingles+distinct") {
      val s = TextDedup.shingles(docs, col("doc_id"), col("text"), 3).select(col("id"), col("shingle")).distinct()
      println("  rows=" + s.count()); s
    }
    val hashed = sh.select(col("id"), PortableHash.h60(col("shingle")).as("h"))
    t("hash+64 min aggs") {
      val fam = PortableHash.family(64)
      val aggs = fam.map { case (i, a, b) => min(PortableHash.perm(col("h"), a, b)).as(s"mh$i") }
      hashed.groupBy(col("id")).agg(aggs.head, aggs.tail: _*).count()
    }
    t("full minhashLsh") {
      TextDedup.minhashLsh(docs, col("doc_id"), col("text"), 3, 64, 8, 0.6).count()
    }
    t("full again (warm)") {
      TextDedup.minhashLsh(docs, col("doc_id"), col("text"), 3, 64, 8, 0.6).count()
    }
  }
}
