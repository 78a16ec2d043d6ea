package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

import graft.functions.PortableHash
import org.apache.spark.sql.graftvec.CacheOps._

/** Document-corpus deduplication — the training-data-pipeline extension
  * of Vector's per-event `dedupe` transform (src/transforms/dedupe/) to
  * corpus scale: exact, n-gram Jaccard, MinHash+LSH, SimHash, and
  * embedding-cosine near-dup.
  *
  * Scale design (the point of each variant):
  *  - exact: one shuffle on the normalized-text hash; group sizes are
  *    tiny (true dup clusters), no skew risk beyond AQE's reach.
  *  - ngramPairs: exact Jaccard via a shingle-inverted-index self-join —
  *    quadratic in per-shingle posting-list length; correct baseline and
  *    the verifier for the approximate variants. At 100 TB this is only
  *    run AFTER LSH banding has cut candidates to near-linear.
  *  - minhashLsh: the scale path. Signature build is a narrow
  *    explode + one hash-agg (map-side combined); banding turns the
  *    all-pairs problem into equi-join on (band, signature) — shuffle is
  *    linear in corpus size, candidate verification linear in true-pair
  *    count. This is the standard web-dedup pipeline (GPL-free
  *    formulation straight from Broder's paper).
  *  - simhash: constant-size (one long) fingerprint per doc; hamming
  *    ball join via bit_count — here paired brute-force for oracle
  *    parity; at scale, block on rotated prefixes (pigeonhole) the same
  *    way bands work for minhash.
  *  - embeddingPairs: cosine near-dup over dense vectors; brute force
  *    baseline here, LSH/IVF bucketing in Similarity.scala for scale.
  */
object TextDedup {

  /** Word n-gram shingles: (id, shingle) rows, distinct per doc.
    * Narrow: explode + windowed concat — no shuffle until the consumer
    * aggregates. `text` is whitespace-tokenized (the corpus contract).
    */
  def shingles(df: DataFrame, id: Column, text: Column, n: Int): DataFrame = {
    val toks = df.select(id.as("id"), split(text, " ").as("toks"))
    // shingle i = toks[i..i+n-1]; slice is 1-based
    toks
      .select(col("id"), col("toks"),
        explode(when(size(col("toks")) >= n,
          sequence(lit(1), size(col("toks")) - (n - 1)))
          .otherwise(array().cast("array<int>"))).as("pos"))
      .select(col("id"), col("pos"),
        array_join(slice(col("toks"), col("pos"), lit(n)), " ").as("shingle"))
  }

  /** Exact dedupe by a key expression (hash-groupBy): keep the row with
    * the smallest `order` per key. The 100 TB shape: shuffle on
    * md5(key) — uniform by construction; cluster sizes bounded by true
    * duplication.
    */
  def exact(df: DataFrame, key: Column, order: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Benchmark decontamination: flag every corpus document sharing at
    * least one word n-gram with a held-out evaluation set (the
    * 13-gram-overlap rule of GPT-3 appendix C / The Pile — n is a
    * parameter; tests use the corpus ShingleN).
    *
    * Output: (id, contaminated) for every corpus row — callers drop
    * `contaminated = 1` rows (kept as a flag so audits can count them).
    *
    * 100 TB shape: the benchmark shingle set is EVAL-set-sized (MBs to
    * low GBs — orders of magnitude under the corpus), so it broadcasts;
    * the corpus side is then one map-side LEFT SEMI probe per shingle —
    * no corpus-sized shuffle anywhere. The only exchanges are the
    * benchmark-side distinct (tiny) and the distinct over HIT ids
    * (bounded by the contamination rate, not the corpus). Shingles are
    * compared as 60-bit portable hashes like the rest of the dedup
    * family: longs beat multi-word strings through the broadcast and
    * the probe, and the oracle hashes identically so any collision is
    * engine-identical.
    */
  def decontaminate(corpus: DataFrame, id: Column, text: Column,
                    bench: DataFrame, benchText: Column, n: Int): DataFrame = {
    val benchGrams = shingles(bench, lit(0L), benchText, n)
      .select(PortableHash.h60(col("shingle")).as("h")).distinct()
    val hits = shingles(corpus, id, text, n)
      .select(col("id"), PortableHash.h60(col("shingle")).as("h"))
      .join(broadcast(benchGrams), Seq("h"), "left_semi")
      .select(col("id")).distinct()
    corpus.select(id.as("id"))
      .join(broadcast(hits.withColumn("__hit", lit(1))), Seq("id"), "left")
      .select(col("id"), coalesce(col("__hit"), lit(0)).as("contaminated"))
  }

  /** Duplicate-cluster resolution: connected components over the
    * near-dup PAIR graph (the step after minhashLsh/simhashPairs/
    * embeddingPairs that turns pair lists into per-document keep/drop
    * decisions). Output: (id, cluster) for EVERY document — cluster is
    * the component's minimum id (the canonical survivor); documents in
    * no pair are singleton clusters of themselves.
    *
    * Algorithm: iterative min-label propagation to a fixpoint —
    * label(v) ← min(label(v), min over neighbors) each round, stopping
    * when a round changes nothing (counted exactly, not guessed).
    * Rounds needed = component diameter. Near-dup components are
    * near-cliques (every member shares most shingles, so LSH emits
    * most cross pairs), giving 2-4 rounds in practice; `maxIters`
    * bounds adversarial chains.
    *
    * 100 TB shape: the edge list is the PAIRS output — orders of
    * magnitude smaller than the corpus — so every round is one
    * edge-sized shuffle join + hash-agg, and the label frame is one
    * row per document id (two narrow columns). Each round persists its
    * label frame and unpersists the previous one: without the persist
    * the iterative join re-evaluates the whole lineage each round
    * (the classic iterative-DataFrame pitfall).
    */
  def duplicateClusters(docs: DataFrame, id: Column, pairs: DataFrame,
                        maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col("a"), col("b"))
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
      .persistOnce()
    var cached = docs.select(id.as("id")).distinct()
      .withColumn("cluster", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = cached
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIters) {
      val prop = edges.join(labels, edges("b") === labels("id"))
        .groupBy(edges("a").as("nid")).agg(min(col("cluster")).as("nb"))
      // the convergence check folds into the SAME materialization: the
      // propagation join carries the previous label alongside the new
      // one, so `changed` is a filter-count over the cached frame —
      // one action and one join per round, not a second labels-vs-next
      // equi-join. Rounds remain ∝ component diameter (fine for the
      // near-clique components LSH/jaccard pairs produce; pathological
      // long chains would need pointer-jumping, out of contract here).
      val next = labels.as("l")
        .join(prop, col("l.id") === col("nid"), "left")
        .select(col("l.id").as("id"), col("l.cluster").as("old"),
          least(col("l.cluster"), coalesce(col("nb"), col("l.cluster")))
            .as("cluster"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = next.filter(col("cluster") =!= col("old")).count()
      cached.unpersist(false)
      cached = next
      labels = next.select(col("id"), col("cluster"))
      i += 1
    }
    labels
  }

  /** The distinct (id, shingle-HASH) set, persisted: every consumer
    * (signature build, size counts, verification joins) re-reads it —
    * without the persist each read is a fresh scan + dedup shuffle.
    * Shingles are reduced to their 60-bit portable hash BEFORE the
    * distinct: the dedup shuffle then moves 8-byte longs instead of
    * multi-word strings and every downstream join compares longs —
    * measured ~2x on the whole minhash chain. Collision probability is
    * ~|shingles|²/2^61 (vanishing), and because the ORACLE hashes with
    * the identical md5-prefix, any collision is engine-identical — the
    * correctness gate stays bit-exact, not just approximately right.
    * MEMORY_AND_DISK; eviction under pressure degrades to recompute.
    */
  private def distinctShingles(df: DataFrame, id: Column, text: Column,
                               n: Int): DataFrame =
    shingles(df, id, text, n)
      .select(col("id"), PortableHash.h60(col("shingle")).as("h")).distinct()
      .persistOnce()

  /** Exact n-gram Jaccard similarity for every pair sharing >=1 shingle.
    * Output: (a, b, inter, na, nb, jaccard) with a < b.
    *
    * `maxShingleDf` defuses the stop-shingle skew bomb: a shingle shared
    * by f documents contributes f·(f-1)/2 rows to the self-join, so ONE
    * corpus-hot boilerplate shingle (f ~ O(corpus)) is quadratic even
    * though every pair it seeds is junk. With the cap, CANDIDATE pairs
    * are generated only from shingles with document frequency <= cap,
    * and the Jaccard is then verified over the FULL shingle sets — so
    * every reported (a, b, inter, na, nb, jaccard) is still the exact
    * uncapped value. A qualifying pair (jaccard >= t, hence sharing
    * inter >= t/(1+t)·(na+nb) shingles) is lost ONLY if every one of
    * those shared shingles is corpus-hot (df > cap) — i.e. the pair's
    * entire intersection is boilerplate, in which case it is exactly the
    * junk the cap exists to drop. Pick cap >> the largest true-duplicate
    * cluster size: a real near-dup pair then always shares a sub-cap
    * (content) shingle and the pair set is invariant — the
    * TrainingSpec proves both the invariance and the join-row collapse
    * on a hot-shingle corpus.
    */
  def ngramPairs(df: DataFrame, id: Column, text: Column, n: Int,
                 threshold: Double,
                 maxShingleDf: Option[Long] = None): DataFrame = {
    val sh = distinctShingles(df, id, text, n)
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val inter = maxShingleDf match {
      case None =>
        sh.as("x").join(sh.as("y"),
            col("x.h") === col("y.h") && col("x.id") < col("y.id"))
          .groupBy(col("x.id").as("a"), col("y.id").as("b"))
          .agg(count(lit(1)).as("inter"))
      case Some(cap) =>
        // split postings at the cap: HOT shingles (df > cap) are the
        // few boilerplate ones; COLD carry the content
        val dfs = sh.groupBy(col("h")).agg(count(lit(1)).as("__df"))
        // persisted: cold feeds BOTH sides of the candidate self-join —
        // without the persist each side recomputes the df agg + join
        // over the full shingle set (2× the dominant scan). Same
        // size-class as `sh` (it IS sh minus the few hot postings).
        val cold = sh.join(dfs.filter(col("__df") <= cap).select(col("h")), Seq("h"))
          .persistOnce()
        val hotSh = sh.join(dfs.filter(col("__df") > cap).select(col("h")), Seq("h"))
        // candidate pairs + their COLD intersection in one pass — the
        // cold self-join IS the intersection count (sh is distinct), no
        // re-verification join needed. Persisted: referenced by the
        // hot-intersection build AND the final cold+hot merge; pair
        // rows are few (true near-dup candidates), recompute is the
        // whole self-join.
        val coldInter = cold.as("x").join(cold.as("y"),
            col("x.h") === col("y.h") && col("x.id") < col("y.id"))
          .groupBy(col("x.id").as("a"), col("y.id").as("b"))
          .agg(count(lit(1)).as("__inter_cold"))
          .persistOnce()
        // HOT intersection only for the candidates: join each pair to
        // its two hot-posting lists (rows ~ |cand| × hot-shingles/doc —
        // zero when the corpus has no hot shingles). inter = cold + hot
        // is EXACT for every candidate; a pair whose entire
        // intersection is hot never becomes a candidate (the documented
        // boilerplate-only exclusion).
        val hotInter = coldInter.select(col("a"), col("b"))
          .join(hotSh.select(col("id").as("a"), col("h")), Seq("a"))
          .join(hotSh.select(col("id").as("b"), col("h")), Seq("b", "h"))
          .groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("__inter_hot"))
        coldInter.join(hotInter, Seq("a", "b"), "left")
          .select(col("a"), col("b"),
            (col("__inter_cold") + coalesce(col("__inter_hot"), lit(0L))).as("inter"))
    }
    inter
      .join(sizes.withColumnRenamed("id", "a").withColumnRenamed("n_sh", "na"), "a")
      .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("n_sh", "nb"), "b")
      .withColumn("jaccard",
        round(col("inter") / (col("na") + col("nb") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("inter"), col("na"), col("nb"), col("jaccard"))
  }

  /** Banded LSH candidate pairs verified with exact Jaccard.
    * k hashes in bands of r rows; pairs agreeing on any full band are
    * candidates; candidates are verified against the exact shingle
    * Jaccard and filtered at `threshold`.
    *
    * Signature build is ONE hash-agg over the shingle rows: the k
    * permutations are plan-time constants, so all k minhashes are k
    * `min()` aggregates in a single map-side-combined groupBy — the
    * shuffle stays linear in #shingles (a per-row k-fanout join here
    * would multiply the shuffle by k, the dominant cost at corpus
    * scale). Bands then explode narrowly (k/r small structs per doc).
    */
  def minhashLsh(df: DataFrame, id: Column, text: Column, n: Int,
                 k: Int, r: Int, threshold: Double): DataFrame = {
    // k = bands × r exactly: integer-division bands would silently waste
    // the trailing k % r minhashes (recall lower than the k paid for),
    // and r > k would build ZERO bands — an empty result, not an error
    require(r >= 1 && k >= r && k % r == 0,
      s"minhash k ($k) must be a positive multiple of band rows r ($r)")
    val fam = PortableHash.family(k)
    val sh = distinctShingles(df, id, text, n)
    val minAggs = fam.map { case (i, a, b) =>
      min(PortableHash.perm(col("h"), a, b)).as(s"mh$i")
    }
    // persisted: the band explode feeds BOTH sides of the candidate
    // self-join, and without the persist each side re-runs the k-min
    // aggregation over the full shingle set (the chain's dominant
    // scan). Size is #docs × k longs — orders of magnitude smaller
    // than the shingle set it summarizes.
    val sig = sh.groupBy(col("id")).agg(minAggs.head, minAggs.tail: _*)
      .persistOnce()
    // band j signature: ':'-concat of minhashes j*r .. j*r+r-1 (hash order)
    val bandStructs = (0 until k / r).map { j =>
      struct(lit(j).as("band"),
        concat_ws(":", (j * r until (j + 1) * r)
          .map(i => col(s"mh$i").cast("string")): _*).as("bsig"))
    }
    val bandsFlat = sig
      .select(col("id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("id"), col("bs.band").as("band"), col("bs.bsig").as("bsig"))
    val cand = bandsFlat.as("x").join(bandsFlat.as("y"),
        col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    // verify candidates with exact jaccard (over the hashed shingle set)
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val shB = sh.select(col("id").as("bid"), col("h").as("hb"))
    val inter = cand
      .join(sh.withColumnRenamed("id", "a").withColumnRenamed("h", "ha"), "a")
      .join(shB, col("b") === col("bid") && col("ha") === col("hb"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "a").withColumnRenamed("n_sh", "na"), "a")
      .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("n_sh", "nb"), "b")
      .withColumn("jaccard",
        round(col("inter") / (col("na") + col("nb") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** SimHash fingerprint (B<=60 bits) over the distinct word-`n`-gram
    * shingle set: bit j of the fingerprint is set iff
    * Σ_features (bit_j(h60(feature)) ? 1 : -1) > 0. Shingle features
    * (not single words) so that small-vocabulary corpora still
    * discriminate — the feature space is the n-gram space.
    * Output: (id, simhash).
    */
  def simhash(df: DataFrame, id: Column, text: Column, bits: Int,
              n: Int): DataFrame = {
    // shares the persisted hashed-shingle set with the jaccard/minhash
    // family (same canonical plan → one cache entry serves all)
    val toks = distinctShingles(df, id, text, n)
    val bitSums = (0 until bits).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"s$j")
    }
    val agg = toks.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until bits).map { j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col("id"), fp.as("simhash"))
  }

  /** SimHash near-dup pairs within `maxHamming` (brute-force pairing —
    * O(n²), only for tiny corpora / oracle cross-checks; use
    * `simhashPairsBlocked` everywhere else).
    */
  def simhashPairs(fps: DataFrame, maxHamming: Int): DataFrame =
    fps.as("x").join(fps.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)

  /** EXACT simhash pairing at scale via pigeonhole blocking: split the
    * `bits`-bit fingerprint into maxHamming+1 contiguous blocks — any
    * pair within `maxHamming` differing bits must agree EXACTLY on at
    * least one block, so an equi-join per block finds every true pair
    * (no false negatives); candidates are then verified with the full
    * hamming distance. Same result set as `simhashPairs`, but the join
    * is an equi-shuffle on (block, value) — candidate count scales with
    * bucket collision mass, not n². The standard trick from Manku et
    * al.'s web near-dup detection paper.
    */
  def simhashPairsBlocked(fps: DataFrame, bits: Int, maxHamming: Int): DataFrame = {
    val nb = maxHamming + 1
    val blocks = (0 until nb).map { j =>
      val lo = j * bits / nb
      val hi = (j + 1) * bits / nb
      struct(lit(j).as("blk"),
        shiftright(col("simhash"), lo).bitwiseAND(lit((1L << (hi - lo)) - 1)).as("bv"))
    }
    // persisted: feeds both sides of the block equi-join; without it
    // each side re-runs the upstream simhash aggregation (a bit-sum agg
    // over the full shingle set). nb×#docs rows — tiny.
    val exploded = fps
      .select(col("id"), col("simhash"), explode(array(blocks: _*)).as("b"))
      .select(col("id"), col("simhash"), col("b.blk").as("blk"), col("b.bv").as("bv"))
      .persistOnce()
    exploded.as("x").join(exploded.as("y"),
        col("x.blk") === col("y.blk") && col("x.bv") === col("y.bv") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Embedding-cosine near-duplicates: pairs with cosine >= threshold.
    * Vectors are cast to double before any arithmetic so both engines
    * sum in double precision; the result is rounded for portability.
    *
    * Fully distributed: the pair join is a broadcast-nested-loop on
    * `a < b` (the smaller side broadcasts; candidate evaluation runs on
    * executors — no driver collect), and the per-pair cosine is the
    * codegen'd `VectorOps.dot` loop. All-pairs exact cosine is
    * inherently quadratic in comparisons — at 100 TB this exact form
    * runs only on bucketed candidates (sign-LSH / IVF from Similarity,
    * the same banding pattern `minhashLsh` uses); its quadratic-output
    * contract is the semantics, not an implementation accident.
    */
  def embeddingPairs(df: DataFrame, id: Column, vec: Column,
                     threshold: Double): DataFrame = {
    val v = df.select(id.as("id"),
      transform(vec, x => x.cast("double")).as("v"))
    // persisted: both sides of the pair join read this frame — one
    // embedding scan + norm pass instead of two (one row per vector).
    // zero-norm vectors (padding / failed embeds) are excluded: their
    // cosine is 0/0, which under ANSI mode is a DIVIDE_BY_ZERO job
    // abort, not a null — and no defined cosine can pass the gate
    // anyway. NaN norms (corrupt input) fail the > 0 gate too.
    val n = v.withColumn("norm",
      sqrt(graft.functions.VectorOps.dot(col("v"), col("v"))))
      .filter(col("norm") > 0)
      .persistOnce()
    val pairs = n.as("x").join(n.as("y"), col("x.id") < col("y.id"))
    pairs.select(
        col("x.id").as("a"), col("y.id").as("b"),
        round(
          graft.functions.VectorOps.dot(col("x.v"), col("y.v")) /
            (col("x.norm") * col("y.norm")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Same result as `embeddingPairs`, computed as a dense driver-side
    * kernel (collects the matrix, broadcasts it, loops primitive
    * doubles). SPEC-LEVEL CROSS-CHECK ONLY — the driver collect caps it
    * at corpora that fit the driver heap; the registered query path is
    * the distributed `embeddingPairs` (codegen'd `VectorOps.dot`, which
    * closed the ~20x interpreted-HOF gap that originally motivated this
    * kernel). Summation order (left-to-right, then round-half-up to
    * 6dp) matches the declarative form exactly, so results are
    * bit-identical and the equality spec pins both.
    */
  def embeddingPairsKernel(df: DataFrame, id: Column, vec: Column,
                           threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df
      .select(id.cast("long").as("id"),
        transform(vec, x => x.cast("double")).as("v"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    val ids = rows.map(_._1)
    val vecs = rows.map(_._2)
    val norms = vecs.map { a =>
      var s = 0.0; var k = 0
      while (k < a.length) { s += a(k) * a(k); k += 1 }
      math.sqrt(s)
    }
    val bc = spark.sparkContext.broadcast((ids, vecs, norms))
    val n = ids.length
    spark.range(n.toLong)
      .repartition(math.min(spark.sparkContext.defaultParallelism * 4, math.max(n, 1)))
      .as[Long]
      .flatMap { i0 =>
        val (ids, vecs, norms) = bc.value
        val i = i0.toInt
        val vi = vecs(i); val ni = norms(i)
        (i + 1 until ids.length).iterator.flatMap { j =>
          val vj = vecs(j)
          var s = 0.0; var k = 0
          while (k < vi.length) { s += vi(k) * vj(k); k += 1 }
          // zero-norm vectors (padding/failed embeds): 0/0 is NaN and
          // BigDecimal(NaN) THROWS — skip the pair, matching the
          // distributed path where the null cosine fails the >= gate
          val denom = ni * norms(j)
          if (denom == 0.0) Iterator.empty
          else {
            val c = BigDecimal(s / denom)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            if (c >= threshold) Iterator.single((ids(i), ids(j), c))
            else Iterator.empty
          }
        }
      }
      .toDF("a", "b", "cosine")
  }
}
