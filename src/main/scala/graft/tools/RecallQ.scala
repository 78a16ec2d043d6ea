package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Scratch: measure sign-LSH / IVF recall vs brute force on the real
  * embeddings table at a scale dir, across parameter settings.
  * Usage: RecallQ <sfDir>
  */
object RecallQ {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val embs = graft.sources.Tables.table(spark, dir, "embeddings")
    val brute = Similarity.bruteForceTopK(embs, embs, col("vec_id"), col("embedding"), 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (b <- Seq(6, 8); r <- Seq(1, 2)) {
      val t0 = System.nanoTime()
      val lsh = Similarity.signLshTopK(embs, col("vec_id"), col("embedding"), 5, b, r)
        .select("qid", "nid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"lsh b=$b radius=$r recall=${(lsh & brute).size.toDouble / brute.size}%.3f probes=${Similarity.probeMasks(b, r).size} time=$sec%.1f s")
    }
    for (b <- Seq(6, 8); q <- Seq(3, 4, 5)) {
      val t0 = System.nanoTime()
      val lsh = Similarity.signLshTopK(embs, col("vec_id"), col("embedding"), 5, b,
          confidenceBits = q)
        .select("qid", "nid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"lsh b=$b confbits=$q recall=${(lsh & brute).size.toDouble / brute.size}%.3f probes=${1 << q} time=$sec%.1f s")
    }
    for (c <- Seq(32, 64); p <- Seq(4, 8)) {
      val t0 = System.nanoTime()
      val ivf = Similarity.ivfTopK(embs, col("vec_id"), col("embedding"), 5, c, p)
        .select("qid", "nid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"ivf c=$c probe=$p recall=${(ivf & brute).size.toDouble / brute.size}%.3f time=$sec%.1f s")
    }
    spark.stop()
  }
}
