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
    val sh = t("shingles+hash+distinct") {
      val s = TextDedup.shingles(docs, col("doc_id"), col("text"), 3)
        .select(col("id"), PortableHash.h60(col("shingle")).as("h")).distinct()
      println("  rows=" + s.count()); s
    }
    t("64 min aggs") {
      val fam = PortableHash.family(64)
      val aggs = fam.map { case (i, a, b) => min(PortableHash.perm(col("h"), a, b)).as(s"mh$i") }
      sh.groupBy(col("id")).agg(aggs.head, aggs.tail: _*).count()
    }
    t("full minhashLsh") {
      TextDedup.minhashLsh(docs, col("doc_id"), col("text"), 3, 64, 8, 0.6).count()
    }
    t("full again (warm)") {
      TextDedup.minhashLsh(docs, col("doc_id"), col("text"), 3, 64, 8, 0.6).count()
    }
    // stage decomposition on warm caches (registry params: k=64, r=4)
    val fam = PortableHash.family(64)
    val minAggs = fam.map { case (i, a, b) =>
      min(PortableHash.perm(col("h"), a, b)).as(s"mh$i") }
    val hsh = sh
    val sig = t("warm: sig agg") {
      val s = hsh.groupBy(col("id")).agg(minAggs.head, minAggs.tail: _*)
      s.count(); s
    }
    val bandStructs = (0 until 64 / 4).map { j =>
      struct(lit(j).as("band"),
        concat_ws(":", (j * 4 until (j + 1) * 4)
          .map(i => col(s"mh$i").cast("string")): _*).as("bsig")) }
    val bandsFlat = sig
      .select(col("id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("id"), col("bs.band").as("band"), col("bs.bsig").as("bsig"))
    val cand = t("warm: band self-join + distinct") {
      val c = bandsFlat.as("x").join(bandsFlat.as("y"),
          col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig") &&
            col("x.id") < col("y.id"))
        .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
      println("  cand=" + c.count()); c
    }
    t("warm: verify joins") {
      val sizes = hsh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
      val shB = hsh.select(col("id").as("bid"), col("h").as("hb"))
      cand
        .join(hsh.withColumnRenamed("id", "a").withColumnRenamed("h", "ha"), "a")
        .join(shB, col("b") === col("bid") && col("ha") === col("hb"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
        .join(sizes.withColumnRenamed("id", "a").withColumnRenamed("n_sh", "na"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("n_sh", "nb"), "b")
        .count()
    }
  }
}
