package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - `bruteForceTopK`: the exact baseline — full cross join, cosine
  *    per pair, windowed top-k. Quadratic; correct; the recall oracle
  *    for the bucketed variant. At 100 TB this only runs on sampled
  *    slices.
  *  - `signLshTopK`: the scale path — axis-sign LSH (random-hyperplane
  *    LSH with coordinate hyperplanes; deterministic and portable): the
  *    bucket key is the sign pattern of the first `b` dimensions. Equal
  *    buckets co-locate similar vectors; the join is an equi-join on
  *    the bucket key (linear shuffle), with top-k within bucket. Probing
  *    only the home bucket trades recall for a 2^b-fold cut in pair
  *    count; multiprobe (flipping low-|x| bits) is the standard recall
  *    knob left as a parameter.
  *
  * All arithmetic in double after an explicit cast; cosine rounded to
  * 6dp so both engines agree bit-for-bit in the correctness gate.
  */
object Similarity {

  /** (id, v: array<double>, norm) projection. */
  def prep(df: DataFrame, id: Column, vec: Column): DataFrame =
    df.select(id.as("id"), transform(vec, x => x.cast("double")).as("v"))
      .withColumn("norm",
        sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)))

  private def cosine(xv: Column, yv: Column, xn: Column, yn: Column): Column =
    round(
      aggregate(zip_with(xv, yv, (p, q) => p * q), lit(0.0), (a, x) => a + x)
        / (xn * yn), 6)

  /** Exact top-k cosine neighbors for every query row (queries = rows of
    * `queries` DF, corpus = rows of `df`). Ties broken by neighbor id.
    */
  def bruteForceTopK(df: DataFrame, queries: DataFrame, id: Column,
                     vec: Column, k: Int): DataFrame = {
    val c = prep(df, id, vec)
    val q = prep(queries, id, vec)
      .select(col("id").as("qid"), col("v").as("qv"), col("norm").as("qn"))
    val sims = q.join(c, col("qid") =!= col("id"))
      .select(col("qid"), col("id").as("nid"),
        cosine(col("qv"), col("v"), col("qn"), col("norm")).as("cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("nid"))
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Sign-pattern bucket key over the first `b` dimensions:
    * Σ_{j<b} (v[j] > 0) << j. Portable (no hash) and deterministic.
    */
  def signBucket(v: Column, b: Int): Column =
    (0 until b).map { j =>
      when(element_at(v, j + 1) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed ANN with hamming-1 multiprobe: each query probes its
    * own sign bucket plus the `b` buckets one bit-flip away (the
    * standard multiprobe recall knob — flipping the least-confident
    * hyperplane first generalizes this; here all b flips are probed).
    * Output schema matches bruteForceTopK (qid, nid, cosine, rank) —
    * recall vs. the exact baseline is the quality metric.
    *
    * Scale shape: corpus keeps ONE row per vector; only the query side
    * explodes ×(b+1). The join stays an equi-join on the bucket key —
    * shuffle linear in (b+1)·|Q| + |corpus|, never quadratic.
    */
  /** IVF (inverted-file) ANN: partition the corpus into `nCentroids`
    * Voronoi cells, search only the `nProbe` cells nearest each query.
    *
    * Centroids are a deterministic pseudo-random sample (the
    * `nCentroids` rows with the smallest portable id-hash) — the
    * random-init step of k-means; Lloyd refinement is an offline
    * batch job at production scale and does not change the plan shape
    * here. Assignment and probing are a crossJoin against the
    * BROADCAST centroid set (C rows — constant) + one window per side,
    * then an equi-join on the cell id: shuffle linear in
    * nProbe·|Q| + |corpus|, never quadratic. Each corpus vector lives
    * in exactly one cell, so no candidate dedup is needed.
    * Output schema matches bruteForceTopK; recall vs. the exact
    * baseline is the quality metric (nProbe is the knob).
    */
  def ivfTopK(df: DataFrame, id: Column, vec: Column,
              k: Int, nCentroids: Int, nProbe: Int): DataFrame = {
    val c = prep(df, id, vec)
    val cents = c
      .withColumn("hkey", graft.functions.PortableHash.h60(col("id").cast("string")))
      .orderBy(col("hkey"), col("id")).limit(nCentroids)
      .select(col("id").as("cid"), col("v").as("cv"), col("norm").as("cn"))
    val centSims = c.crossJoin(broadcast(cents))
      .select(col("id"), col("v"), col("norm"), col("cid"),
        cosine(col("v"), col("cv"), col("norm"), col("cn")).as("csim"))
    val cw = Window.partitionBy(col("id")).orderBy(col("csim").desc, col("cid"))
    val ranked = centSims.withColumn("crank", row_number().over(cw))
    val assigned = ranked.filter(col("crank") === 1)
      .select(col("cid").as("cell"), col("id"), col("v"), col("norm"))
    val probes = ranked.filter(col("crank") <= nProbe)
      .select(col("cid").as("cell"), col("id").as("qid"),
        col("v").as("qv"), col("norm").as("qn"))
    val sims = probes.join(assigned, Seq("cell"))
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id").as("nid"),
        cosine(col("qv"), col("v"), col("qn"), col("norm")).as("cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("nid"))
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  def signLshTopK(df: DataFrame, id: Column, vec: Column,
                  k: Int, b: Int, multiprobe: Boolean = true): DataFrame = {
    val c = prep(df, id, vec).withColumn("bucket", signBucket(col("v"), b))
    val probes =
      if (!multiprobe) array(col("bucket"))
      else array(col("bucket") +:
        (0 until b).map(j => col("bucket").bitwiseXOR(lit(1L << j))): _*)
    val q = c.select(col("id").as("qid"), col("v").as("qv"),
      col("norm").as("qn"), explode(probes).as("bucket"))
    val sims = q.join(c, Seq("bucket"))
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id").as("nid"),
        cosine(col("qv"), col("v"), col("qn"), col("norm")).as("cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("nid"))
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
