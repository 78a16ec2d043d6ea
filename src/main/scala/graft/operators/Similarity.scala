package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.VectorOps
import org.apache.spark.sql.graftvec.CacheOps._

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
  *    the bucket key, so the SHUFFLE is linear in corpus size — but the
  *    candidate-pair evaluation after the join is ~(#probes)·N²/2^b,
  *    which degrades quadratically if `b` is held fixed while N grows.
  *    At scale `b` must grow with log₂(N) (keeping expected bucket
  *    occupancy ~constant) with `probeRadius` as the recall knob;
  *    the defaults here are sized for the test corpus.
  *
  * Cosine/norm arithmetic runs through `VectorOps.dot` — a codegen'd
  * primitive-double loop (the declarative `aggregate(zip_with(...))`
  * form evaluates interpreted, ~20x slower per pair). All arithmetic in
  * double after an explicit cast; cosine rounded to 6dp so both engines
  * agree bit-for-bit in the correctness gate.
  */
object Similarity {

  /** (id, v: array<double>, norm) projection. */
  def prep(df: DataFrame, id: Column, vec: Column): DataFrame =
    df.select(id.as("id"), transform(vec, x => x.cast("double")).as("v"))
      .withColumn("norm", sqrt(VectorOps.dot(col("v"), col("v"))))

  private def cosine(xv: Column, yv: Column, xn: Column, yn: Column): Column =
    round(VectorOps.dot(xv, yv) / (xn * yn), 6)

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

  /** XOR masks for blind multiprobe at hamming distance <= `radius`
    * from the home bucket (radius 0 = home only; 1 adds the b
    * single-bit flips; 2 adds the b(b-1)/2 double flips). Shared with
    * the DuckDB oracle generator so both engines probe the identical
    * bucket set.
    */
  def probeMasks(b: Int, radius: Int): Seq[Long] = {
    val r1 = if (radius >= 1) (0 until b).map(j => 1L << j) else Seq.empty
    val r2 =
      if (radius >= 2)
        for { i <- 0 until b; j <- i + 1 until b } yield (1L << i) | (1L << j)
      else Seq.empty
    0L +: (r1 ++ r2)
  }

  /** Query-dependent multiprobe (Lv et al., VLDB'07): a neighbor's sign
    * pattern differs from the query's almost only in the dimensions
    * where |v[j]| is small (the point sits near those hyperplanes), so
    * instead of blindly probing every hamming-r bucket, probe exactly
    * the 2^q buckets reachable by flipping any subset of the query's
    * `q` LEAST-CONFIDENT bits. Returns the array-of-probe-buckets
    * column (home bucket XOR each mask), evaluated by the codegen'd
    * `graftvec.VectorExpressions.ProbeBuckets` kernel — the Column-DSL
    * sort/transform formulation ran interpreted and re-embedded its
    * ranked subtree once per mask bit.
    *
    * Confidence order is (|v[j]| asc, j asc) — a total order both
    * engines compute identically (the oracle recomputes it with a
    * struct sort), so the probe set is deterministic and portable.
    */
  def confidenceProbeBuckets(v: Column, bucket: Column, b: Int, q: Int): Column = {
    // q > b would read past the dimension range (null probe buckets
    // that silently vanish in the equi-join, eating recall with no
    // error); b > 52 breaks oracles that recompute 2^l via doubles
    require(q <= b, s"confidence bits q=$q must be <= hash bits b=$b")
    require(b <= 52, s"hash bits b=$b must be <= 52 (oracle pow-based bit math)")
    org.apache.spark.sql.graftvec.VectorExpressions.probeBuckets(v, bucket, b, q)
  }

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
              k: Int, nCentroids: Int, nProbe: Int,
              centroids: Option[DataFrame] = None): DataFrame = {
    val c = prep(df, id, vec)
    val cents = centroids.getOrElse(ivfInitCentroids(df, id, vec, nCentroids))
    val centSims = c.crossJoin(broadcast(cents))
      .select(col("id"), col("v"), col("norm"), col("cid"),
        cosine(col("v"), col("cv"), col("norm"), col("cn")).as("csim"))
    val cw = Window.partitionBy(col("id")).orderBy(col("csim").desc, col("cid"))
    // persisted: assignment (crank=1) and probing (crank<=nProbe) both
    // derive from this ranked frame — without the cache each side
    // re-runs the corpus×centroid cosine pass and its window sort.
    val ranked = centSims.withColumn("crank", row_number().over(cw))
      .filter(col("crank") <= math.max(nProbe, 1))
      .persistOnce()
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

  /** LSH-bucketed ANN with hamming-`probeRadius` multiprobe: each query
    * probes its own sign bucket plus every bucket within `probeRadius`
    * bit flips (`probeMasks`). Output schema matches bruteForceTopK
    * (qid, nid, cosine, rank) — recall vs. the exact baseline is the
    * quality metric.
    *
    * Scale shape: corpus keeps ONE row per vector; only the query side
    * explodes ×|probeMasks|. The join is an equi-join on the bucket key
    * (linear shuffle); candidate-pair work is |probes|·N²/2^b, so keep
    * bucket occupancy bounded by growing `b` with log₂(N) — see the
    * object doc.
    */
  /** The deterministic hash-sampled centroid init used by `ivfTopK`,
    * exposed so refinement can iterate on it. Output: (cid, cv, cn).
    */
  def ivfInitCentroids(df: DataFrame, id: Column, vec: Column,
                       nCentroids: Int): DataFrame =
    prep(df, id, vec)
      .withColumn("hkey", graft.functions.PortableHash.h60(col("id").cast("string")))
      .orderBy(col("hkey"), col("id")).limit(nCentroids)
      .select(col("id").as("cid"), col("v").as("cv"), col("norm").as("cn"))

  /** One Lloyd iteration of spherical k-means over the IVF centroid
    * set: assign every vector to its nearest centroid (broadcast
    * centroids — the same linear shape as `ivfTopK`'s assignment), then
    * replace each centroid with its cell's element-wise mean. Empty
    * cells drop. At production scale this loops offline until centroid
    * movement < eps; each iteration is one broadcast join + one
    * (cell, dimension) hash-agg — linear in corpus size, no quadratic
    * term, and the refined set feeds `ivfTopK` unchanged.
    */
  def ivfRefineCentroids(df: DataFrame, id: Column, vec: Column,
                         cents: DataFrame): DataFrame = {
    val c = prep(df, id, vec)
    val centSims = c.crossJoin(broadcast(cents))
      .select(col("id"), col("v"), col("cid"),
        cosine(col("v"), col("cv"), col("norm"), col("cn")).as("csim"))
    val cw = Window.partitionBy(col("id")).orderBy(col("csim").desc, col("cid"))
    val assigned = centSims.withColumn("crank", row_number().over(cw))
      .filter(col("crank") === 1)
    val means = assigned
      .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos")).agg(avg(col("x")).as("m"))
      .groupBy(col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("cv"))
    means.withColumn("cn", sqrt(graft.functions.VectorOps.dot(col("cv"), col("cv"))))
  }

  /** The offline IVF TRAINING LOOP: iterate `ivfRefineCentroids` until
    * the largest centroid L2 movement drops below `eps` or `maxIters`
    * is hit. Each round is one broadcast-assign + one hash-agg over the
    * corpus (linear, same shape as a single refine); between rounds the
    * centroid TABLE (nCentroids rows — config-sized, like MLlib's
    * KMeans model state) is collected to cut the growing lineage and to
    * compute movement driver-side. Returns the trained centroids for
    * `ivfTopK(centroids = Some(...))`.
    */
  def ivfTrainCentroids(df: DataFrame, id: Column, vec: Column,
                        nCentroids: Int, maxIters: Int = 10,
                        eps: Double = 1e-4): DataFrame = {
    val spark = df.sparkSession
    var cents = ivfInitCentroids(df, id, vec, nCentroids)
    var prev = cents.collect().map(r =>
      r.get(0).toString -> r.getAs[scala.collection.Seq[Double]]("cv")).toMap
    var iter = 0
    var moved = Double.MaxValue
    while (iter < maxIters && moved >= eps) {
      val next = ivfRefineCentroids(df, id, vec, cents)
      val rows = next.collect()
      val cur = rows.map(r =>
        r.get(0).toString -> r.getAs[scala.collection.Seq[Double]]("cv")).toMap
      moved = cur.map { case (cid, cv) =>
        prev.get(cid) match {
          case Some(pv) =>
            math.sqrt(cv.zip(pv).map { case (a, b) => (a - b) * (a - b) }.sum)
          case None => Double.MaxValue // re-seeded/renamed cell: keep going
        }
      }.foldLeft(0.0)(math.max)
      cents = spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(rows: _*)), next.schema)
      prev = cur
      iter += 1
    }
    cents
  }

  def signLshTopK(df: DataFrame, id: Column, vec: Column,
                  k: Int, b: Int, probeRadius: Int = 1,
                  confidenceBits: Int = 0): DataFrame = {
    // persisted: `c` is both the corpus side of the bucket join and the
    // base of the query-probe explode — one embedding scan + norm pass
    // instead of two. One row per vector (narrower than the raw table).
    val c = prep(df, id, vec).withColumn("bucket", signBucket(col("v"), b))
      .persistOnce()
    // the probe array is built XOR-folded (no transform() lambda: HOFs
    // are CodegenFallback and would fence the hottest stage out of
    // whole-stage codegen); `bucket` is a leaf attribute of the cached
    // frame, so the blind-probe array's per-element XOR embeds no tree
    val probes =
      if (confidenceBits > 0)
        confidenceProbeBuckets(col("v"), col("bucket"), b, confidenceBits)
      else array(probeMasks(b, probeRadius)
        .map(m => col("bucket").bitwiseXOR(lit(m))): _*)
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
