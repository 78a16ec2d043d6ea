package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

import graft.functions.PortableHash
import graft.operators.{Similarity, TextAnalysis, TextDedup}
import graft.sources.Tables

/** Oracle-gated queries for the training-data-pipeline operators
  * (dedup family, similarity search, text analysis) over the driver's
  * `documents` and `embeddings` tables.
  *
  * Every Spark query here has a DuckDB statement computing the exact
  * same values: hashes via PortableHash (md5-prefix — identical in both
  * engines), float arithmetic forced to double + round(6).
  */
object TrainingQueries {

  // MinHash/LSH configuration (shared between Spark and oracle).
  val ShingleN = 3
  val MinhashK = 64
  val BandR = 4
  val JaccardThreshold = 0.5
  /** Stop-shingle document-frequency cap for ngram candidate
    * generation (TextDedup.ngramPairs doc). 64 >> the corpus's largest
    * true-dup cluster; measured max shingle df is 7 (sf0.01) / 25
    * (sf0.1), so the pair set is provably invariant at test scale while
    * the cap bounds the join at corpus scale where boilerplate df grows
    * with N.
    */
  val NgramMaxDf = 64L
  val SimhashBits = 32
  val SimhashMaxHamming = 4
  val CosineDupThreshold = 0.4
  val TopK = 5
  val LshBits = 6
  /** Query-dependent multiprobe (Lv et al.): flip any subset of the 5
    * least-confident sign bits → 32 probes, recall ≈0.73 vs brute top-5
    * on the synthetic corpus (blind hamming-2's 22 probes gave 0.58).
    */
  val LshConfidenceBits = 5
  val IvfCentroids = 32
  val IvfProbe = 4
  val WinnowN = 3
  val WinnowW = 4

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")
  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")

  // ---------------------------------------------------------- exact dedupe
  // Key = first 8 words (normalized prefix) — hash-groupBy keep-first.
  private def qDedupExact(s: SparkSession, dir: String): DataFrame =
    TextDedup.exact(
        docs(s, dir).withColumn("key",
          array_join(slice(split(col("text"), " "), 1, 8), " ")),
        col("key"), col("doc_id"))
      .select(col("doc_id"), col("key"))
      .orderBy("doc_id")

  // ---------------------------------------------------------- ngram jaccard
  private def qDedupNgram(s: SparkSession, dir: String): DataFrame =
    TextDedup.ngramPairs(docs(s, dir), col("doc_id"), col("text"),
        ShingleN, JaccardThreshold, maxShingleDf = Some(NgramMaxDf))
      .orderBy("a", "b")

  // ---------------------------------------------------------- decontaminate
  /** Benchmark = every 23rd doc (deterministic eval-set stand-in);
    * corpus = the rest, flagged on any shared word-{ShingleN}-gram.
    */
  private def qDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    TextDedup.decontaminate(
        d.filter(col("doc_id") % 23 =!= 0), col("doc_id"), col("text"),
        d.filter(col("doc_id") % 23 === 0), col("text"), ShingleN)
      .select(col("id").as("doc_id"), col("contaminated"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------- dup clusters
  /** Connected components over the minhash-LSH pair graph: every doc
    * labelled with its duplicate cluster (min id; singletons keep
    * their own id). The keep/drop resolution step of near-dedup.
    */
  private def qDedupClusters(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val pairs = TextDedup.minhashLsh(d, col("doc_id"), col("text"),
      ShingleN, MinhashK, BandR, JaccardThreshold)
    TextDedup.duplicateClusters(d, col("doc_id"), pairs)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------- repetition
  /** Gopher-style repetition filters: top-bigram and duplicate-trigram
    * token fractions.
    */
  private def qRepetition(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionSignals(docs(s, dir), col("doc_id"), col("text"),
        topN = 2, dupN = 3)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")

  // ---------------------------------------------------------- mix sampling
  /** Deterministic source-stratified mix: named per-source keep rates +
    * a default — the dataset-mixing step of a training pipeline.
    */
  val MixFractions: Map[String, Double] =
    Map("src0" -> 0.8, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.0)
  val MixDefault = 0.1
  private def qMixSample(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.stratifiedSample(docs(s, dir), col("source"), col("doc_id"),
        MixFractions, MixDefault)
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")

  // ---------------------------------------------------------- minhash lsh
  private def qDedupMinhash(s: SparkSession, dir: String): DataFrame =
    TextDedup.minhashLsh(docs(s, dir), col("doc_id"), col("text"),
        ShingleN, MinhashK, BandR, JaccardThreshold)
      .orderBy("a", "b")

  // ---------------------------------------------------------- simhash
  private def qSimhash(s: SparkSession, dir: String): DataFrame =
    TextDedup.simhash(docs(s, dir), col("doc_id"), col("text"), SimhashBits,
        ShingleN)
      .select(col("id").as("doc_id"), col("simhash"))
      .orderBy("doc_id")

  private def qSimhashPairs(s: SparkSession, dir: String): DataFrame =
    TextDedup.simhashPairsBlocked(
        TextDedup.simhash(docs(s, dir), col("doc_id"), col("text"), SimhashBits,
          ShingleN),
        SimhashBits, SimhashMaxHamming)
      .orderBy("a", "b")

  // ---------------------------------------------------------- embedding dup
  // Declarative distributed plan (no driver collect); the dense
  // `embeddingPairsKernel` stays as a spec-level cross-check only.
  private def qDedupEmbed(s: SparkSession, dir: String): DataFrame =
    TextDedup.embeddingPairs(embs(s, dir), col("vec_id"), col("embedding"),
        CosineDupThreshold)
      .orderBy("a", "b")

  // ---------------------------------------------------------- knn
  /** Brute-force queries restricted to vec_id % 25 == 0 (coverage at
    * sf0.01, bounded quadratic cost at bench scale).
    */
  private def qKnnBrute(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    Similarity.bruteForceTopK(e, e.filter(col("vec_id") % 25 === 0),
        col("vec_id"), col("embedding"), TopK)
      .orderBy("qid", "rank")
  }

  private def qKnnLsh(s: SparkSession, dir: String): DataFrame =
    Similarity.signLshTopK(embs(s, dir), col("vec_id"), col("embedding"),
        TopK, LshBits, confidenceBits = LshConfidenceBits)
      .orderBy("qid", "rank")

  private def qKnnIvf(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(embs(s, dir), col("vec_id"), col("embedding"),
        TopK, IvfCentroids, IvfProbe)
      .orderBy("qid", "rank")

  // ---------------------------------------------------------- text analysis
  private def qLangId(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.withLanguageId(docs(s, dir), col("text"))
      .select(col("doc_id") +:
        TextAnalysis.langProfiles.map { case (l, _) => col(s"s_$l") }
        :+ col("lang_pred"): _*)
      .orderBy("doc_id")

  private def qTextQuality(s: SparkSession, dir: String): DataFrame = {
    val sig = TextAnalysis.qualitySignals(col("text"))
    docs(s, dir).select(
        col("doc_id") +: sig.map { case (n, c) => c.as(n) }
          :+ TextAnalysis.qualityScore(col("text")).as("quality"): _*)
      .orderBy("doc_id")
  }

  private def qTokenCount(s: SparkSession, dir: String): DataFrame = {
    val tc = TextAnalysis.tokenCounts(col("text"))
    docs(s, dir).select(
        col("doc_id") +: tc.map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------- multimodal
  private def qMultimodal(s: SparkSession, dir: String): DataFrame =
    graft.operators.Multimodal.featureColumns(
        graft.operators.Multimodal.fromDocuments(docs(s, dir)))
      .orderBy("id")

  private def qFrameSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Multimodal.frameSample(
        graft.operators.Multimodal.fromDocuments(docs(s, dir)),
        frameBytes = 32, stride = 4)
      .orderBy("id", "frame_idx")

  /** REAL media decode: synthesize actual BMP (even doc_id) / WAV (odd)
    * payloads, then parse headers + sample data back out distributed.
    * The oracle recomputes every feature ARITHMETICALLY from the
    * generation parameters — the only path from bytes to width /
    * sample-rate / channel-mean on the Spark side is the binary parse,
    * so a header-offset or row-stride bug breaks the match.
    */
  private def qMediaDecode(s: SparkSession, dir: String): DataFrame =
    graft.operators.Multimodal.decodeMedia(
        graft.operators.Multimodal.synthesizeMedia(docs(s, dir)))
      .toDF().orderBy("id")

  private def qFingerprint(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.winnowingFingerprints(docs(s, dir), col("doc_id"),
        col("text"), WinnowN, WinnowW)
      .select(col("id").as("doc_id"), col("fp"))
      .orderBy("doc_id", "fp")

  /** The composed training-data-prep pipeline a real corpus job runs —
    * exact dedup → language filter → quality gate → token annotation →
    * deterministic shard sample — end-to-end in ONE plan: dedup's
    * key-hash exchange is the only DATA shuffle (with a map-side
    * WindowGroupLimit pruning each partition to rank-1 candidates
    * before it); every later stage is a narrow filter/projection fused
    * into the same whole-stage-codegen span. The trailing range
    * exchange is the oracle-determinism orderBy, not pipeline work —
    * at 100 TB the job is one scan + one shuffle.
    */
  private def qTrainingPrep(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).withColumn("key",
      array_join(slice(split(col("text"), " "), 1, 8), " "))
    val deduped = TextDedup.exact(base, col("key"), col("doc_id"))
    val toks = TextAnalysis.tokenCounts(col("text")).toMap
    TextAnalysis.withLanguageId(deduped, col("text"))
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .filter(col("lang_pred") === "en" && col("quality") >= 0.5)
      .filter(col("doc_id") % 2 === 0) // deterministic 1-in-2 shard sample
      .select(col("doc_id"), col("lang_pred"), col("quality"),
        toks("ws_tokens").as("ws_tokens"),
        toks("bpeish_tokens").as("bpeish_tokens"))
      .orderBy("doc_id")
  }

  val spark: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q_training_prep" -> (qTrainingPrep _),
    "q_dedup_exact"   -> (qDedupExact _),
    "q_dedup_ngram"   -> (qDedupNgram _),
    "q_decontaminate" -> (qDecontaminate _),
    "q_repetition"    -> (qRepetition _),
    "q_mix_sample"    -> (qMixSample _),
    "q_dedup_minhash" -> (qDedupMinhash _),
    "q_dedup_clusters" -> (qDedupClusters _),
    "q_simhash"       -> (qSimhash _),
    "q_simhash_pairs" -> (qSimhashPairs _),
    "q_dedup_embed"   -> (qDedupEmbed _),
    "q_knn_brute"     -> (qKnnBrute _),
    "q_knn_lsh"       -> (qKnnLsh _),
    "q_knn_ivf"       -> (qKnnIvf _),
    "q_lang_id"       -> (qLangId _),
    "q_text_quality"  -> (qTextQuality _),
    "q_token_count"   -> (qTokenCount _),
    "q_fingerprint"   -> (qFingerprint _),
    "q_multimodal"    -> (qMultimodal _),
    "q_frame_sample"  -> (qFrameSample _),
    "q_media_decode"  -> (qMediaDecode _)
  )

  // ====================================================== DuckDB oracle

  private val P = PortableHash.P
  private def h60(e: String) = PortableHash.h60Sql(e)

  /** Distinct word-ngram shingles of documents: sh(id, pos, shingle). */
  private def shinglesCte(n: Int): String =
    s"""toks AS (SELECT doc_id AS id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT id, pos, array_to_string(t[pos:pos+${n - 1}], ' ') AS shingle
  FROM (SELECT id, t,
          unnest(generate_series(1, greatest(len(t) - ${n - 1}, 0))) AS pos
        FROM toks)
)"""

  /** Distinct HASHED shingles — mirrors TextDedup.distinctShingles
    * (hash before distinct; identical md5-prefix hash in both engines,
    * so any collision is engine-identical).
    */
  private val shd = s"shd AS (SELECT DISTINCT id, ${h60("shingle")} AS h FROM sh)"
  private val sizesCte = "sizes AS (SELECT id, count(*) AS n_sh FROM shd GROUP BY 1)"

  private def jaccardSelect(candSrc: String): String =
    s"""inter AS (
  SELECT x.id AS a, y.id AS b, count(*) AS inter
  FROM $candSrc
  GROUP BY 1, 2
),
pairs AS (
  SELECT a, b, inter, sa.n_sh AS na, sb.n_sh AS nb,
    round(CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.id = inter.a
  JOIN sizes sb ON sb.id = inter.b
)"""

  private def minhashCtes: String = {
    val hfRows = PortableHash.family(MinhashK)
      .map { case (i, a, b) => s"($i,$a,$b)" }.mkString(",")
    s"""hf AS (SELECT * FROM (VALUES $hfRows) AS t(i, a, b)),
sig AS (
  SELECT id, i, min(((h % $P) * CAST(a AS BIGINT) + b) % $P) AS mh
  FROM shd, hf GROUP BY 1, 2
),
bands AS (
  SELECT id, i // $BandR AS band,
         string_agg(CAST(mh AS VARCHAR), ':' ORDER BY i) AS bsig
  FROM sig GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT x.id AS a, y.id AS b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.bsig = y.bsig AND x.id < y.id
)"""
  }

  private def simhashCtes: String = {
    val bitSums = (0 until SimhashBits)
      .map(j => s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j")
      .mkString(", ")
    val fp = (0 until SimhashBits)
      .map(j => s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")
    s"""${shinglesCte(ShingleN)},
$shd,
bits AS (SELECT id, $bitSums FROM shd GROUP BY 1),
fp AS (SELECT id AS doc_id, CAST($fp AS BIGINT) AS simhash FROM bits)"""
  }

  /** embeddings as double vectors with norms. */
  private val vecCte =
    """v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
vn AS (
  SELECT vec_id, v,
    sqrt(list_sum(list_transform(v, x -> x * x))) AS norm
  FROM v
)"""

  private val cosineExpr =
    "round(list_sum(list_transform(list_zip(x.v, y.v), p -> p[1] * p[2])) / (x.norm * y.norm), 6)"

  private def w(ctes: Seq[String], select: String) =
    s"WITH ${ctes.mkString(",\n")}\n$select"

  // language-ID SQL mirroring TextAnalysis.languageId
  private def langScoreSql(words: Seq[String]): String = {
    val inList = words.map(x => s"'$x'").mkString(",")
    s"CAST(len(list_filter(string_split(text, ' '), t -> t IN ($inList))) AS BIGINT)"
  }

  val oracle: ListMap[String, String] = ListMap(
    "q_training_prep" -> {
      val scores = TextAnalysis.langProfiles
        .map { case (l, ws) => s"${langScoreSql(ws)} AS s_$l" }.mkString(", ")
      val langs = TextAnalysis.langProfiles.map(_._1)
      val pred = langs.init.zipWithIndex.map { case (l, i) =>
        val rest = langs.drop(i + 1).map(x => s"s_$x")
        val g = if (rest.size == 1) rest.head else s"greatest(${rest.mkString(",")})"
        s"WHEN s_$l >= $g THEN '$l'"
      }.mkString("CASE ", " ", s" ELSE '${langs.last}' END")
      w(Seq(
        """tk AS (SELECT doc_id, text,
             array_to_string(string_split(text, ' ')[1:8], ' ') AS key
           FROM documents)""",
        """td AS (SELECT doc_id, text FROM (
             SELECT doc_id, text,
               row_number() OVER (PARTITION BY key ORDER BY doc_id) AS rn
             FROM tk) WHERE rn = 1)""",
        s"tl AS (SELECT doc_id, text, $scores FROM td)",
        s"""tq AS (SELECT doc_id, text, $pred AS lang_pred,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(string_split(text, ' '),
               t -> t IN ('the','a','of','and','to','in','is','that'))) AS BIGINT) AS stop_hits,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
           FROM tl)"""),
        """SELECT doc_id, lang_pred,
           round((least(CAST(n_tokens AS DOUBLE) / 32.0, 1.0)
                  + round(CAST(n_uniq AS DOUBLE) / n_tokens, 6)
                  + least(round(CAST(stop_hits AS DOUBLE) / n_tokens, 6) * 5.0, 1.0)) / 3.0, 6) AS quality,
           CAST(n_tokens AS BIGINT) AS ws_tokens,
           CAST(list_sum(list_transform(
             regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'),
             p -> CAST(ceil(CAST(length(p) AS DOUBLE) / 4.0) AS BIGINT))) AS BIGINT) AS bpeish_tokens
           FROM tq
           WHERE lang_pred = 'en'
             AND round((least(CAST(n_tokens AS DOUBLE) / 32.0, 1.0)
                  + round(CAST(n_uniq AS DOUBLE) / n_tokens, 6)
                  + least(round(CAST(stop_hits AS DOUBLE) / n_tokens, 6) * 5.0, 1.0)) / 3.0, 6) >= 0.5
             AND doc_id % 2 = 0
           ORDER BY doc_id""")
    },
    "q_dedup_exact" -> w(Seq(
      """k AS (SELECT doc_id,
           array_to_string(string_split(text, ' ')[1:8], ' ') AS key
         FROM documents)""",
      """r AS (SELECT doc_id, key,
           row_number() OVER (PARTITION BY key ORDER BY doc_id) AS rn FROM k)"""),
      "SELECT doc_id, key FROM r WHERE rn = 1 ORDER BY doc_id"),

    "q_dedup_ngram" -> w(Seq(shinglesCte(ShingleN), shd, sizesCte,
      // capped candidate generation + exact verify over full sets —
      // mirrors TextDedup.ngramPairs(maxShingleDf)
      s"""cold AS (SELECT shd.* FROM shd JOIN (
           SELECT h FROM shd GROUP BY h HAVING count(*) <= $NgramMaxDf) ch
           ON shd.h = ch.h),
cand AS (SELECT DISTINCT x.id AS a, y.id AS b
         FROM cold x JOIN cold y ON x.h = y.h AND x.id < y.id)""",
      jaccardSelect(
        "cand JOIN shd x ON x.id = cand.a JOIN shd y ON y.id = cand.b AND x.h = y.h")),
      s"""SELECT a, b, inter, na, nb, jaccard FROM pairs
         WHERE jaccard >= $JaccardThreshold ORDER BY a, b"""),

    "q_dedup_clusters" -> ("WITH RECURSIVE " + Seq(
      shinglesCte(ShingleN), shd, sizesCte, minhashCtes,
      jaccardSelect(
        "cand JOIN shd x ON x.id = cand.a JOIN shd y ON y.id = cand.b AND x.h = y.h"),
      s"""dup AS (SELECT a, b FROM pairs WHERE jaccard >= $JaccardThreshold),
e AS (SELECT a, b FROM dup UNION SELECT b, a FROM dup),
reach AS (
  SELECT doc_id AS id, doc_id AS r FROM documents
  UNION
  SELECT e.a AS id, reach.r FROM e JOIN reach ON reach.id = e.b
)""").mkString(",\n") +
      """
SELECT id AS doc_id, min(r) AS cluster
FROM reach GROUP BY id ORDER BY doc_id"""),

    "q_repetition" -> {
      def gramCte(tag: String, n: Int) =
        s"""g$tag AS (
  SELECT id, ${h60(s"array_to_string(t[pos:pos+${n - 1}], ' ')")} AS h
  FROM (SELECT id, t,
          unnest(generate_series(1, greatest(len(t) - ${n - 1}, 0))) AS pos
        FROM toks)),
c$tag AS (SELECT id, h, count(*) AS c FROM g$tag GROUP BY 1, 2)"""
      w(Seq(
        "toks AS (SELECT doc_id AS id, string_split(text, ' ') AS t FROM documents)",
        gramCte("2", 2),
        gramCte("3", 3),
        "t2 AS (SELECT id, max(c) AS topc FROM c2 GROUP BY 1)",
        """d3 AS (SELECT id, sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup,
             sum(c) AS tot FROM c3 GROUP BY 1)""",
        """nt AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT)
             AS n_tokens FROM documents)"""),
        """SELECT nt.doc_id, nt.n_tokens,
           round(CAST(COALESCE(t2.topc * 2, 0) AS DOUBLE) / nt.n_tokens, 6)
             AS top_ngram_frac,
           round(CAST(COALESCE(d3.dup, 0) AS DOUBLE)
             / greatest(COALESCE(d3.tot, 0), 1), 6) AS dup_ngram_frac
         FROM nt
         LEFT JOIN t2 ON t2.id = nt.doc_id
         LEFT JOIN d3 ON d3.id = nt.doc_id
         ORDER BY nt.doc_id"""
      )
    },

    "q_mix_sample" -> {
      // integer thresholds, precomputed — same boundary semantics as
      // TextAnalysis.stratifiedSample (a `* 1e6` double comparison
      // could split boundary hashes across engines)
      def thr(f: Double): Long = math.round(f * 1000000L)
      val cases = MixFractions.toSeq.sortBy(_._1)
        .map { case (g, f) => s"WHEN source = '$g' THEN ${thr(f)}" }.mkString(" ")
      s"""SELECT doc_id, source FROM documents
         WHERE ${h60("source || ':' || CAST(doc_id AS VARCHAR)")} % 1000000
           < (CASE $cases ELSE ${thr(MixDefault)} END)
         ORDER BY doc_id"""
    },

    "q_decontaminate" -> w(Seq(shinglesCte(ShingleN), shd,
      "bg AS (SELECT DISTINCT h FROM shd WHERE id % 23 = 0)",
      """hits AS (SELECT DISTINCT id FROM shd
           WHERE id % 23 <> 0 AND h IN (SELECT h FROM bg))"""),
      """SELECT d.doc_id,
           CAST(CASE WHEN h.id IS NULL THEN 0 ELSE 1 END AS INTEGER) AS contaminated
         FROM documents d LEFT JOIN hits h ON h.id = d.doc_id
         WHERE d.doc_id % 23 <> 0 ORDER BY d.doc_id"""),

    "q_dedup_minhash" -> w(Seq(shinglesCte(ShingleN), shd, sizesCte, minhashCtes,
      jaccardSelect(
        "cand JOIN shd x ON x.id = cand.a JOIN shd y ON y.id = cand.b AND x.h = y.h")),
      s"""SELECT a, b, jaccard FROM pairs
         WHERE jaccard >= $JaccardThreshold ORDER BY a, b"""),

    "q_simhash" -> w(Seq(simhashCtes),
      "SELECT doc_id, simhash FROM fp ORDER BY doc_id"),

    "q_simhash_pairs" -> w(Seq(simhashCtes),
      s"""SELECT x.doc_id AS a, y.doc_id AS b,
         CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
         FROM fp x JOIN fp y ON x.doc_id < y.doc_id
         WHERE bit_count(xor(x.simhash, y.simhash)) <= $SimhashMaxHamming
         ORDER BY a, b"""),

    "q_dedup_embed" -> w(Seq(vecCte),
      s"""SELECT x.vec_id AS a, y.vec_id AS b, $cosineExpr AS cosine
         FROM vn x JOIN vn y ON x.vec_id < y.vec_id
         WHERE $cosineExpr >= $CosineDupThreshold
         ORDER BY a, b"""),

    "q_knn_brute" -> w(Seq(vecCte,
      s"""sims AS (
         SELECT x.vec_id AS qid, y.vec_id AS nid, $cosineExpr AS cosine
         FROM vn x JOIN vn y ON x.vec_id % 25 = 0 AND x.vec_id <> y.vec_id)""",
      """ranked AS (
         SELECT qid, nid, cosine,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS INT) AS rank
         FROM sims)"""),
      s"SELECT qid, nid, cosine, rank FROM ranked WHERE rank <= $TopK ORDER BY qid, rank"),

    "q_knn_lsh" -> w(Seq(vecCte,
      s"""bk AS (
         SELECT vec_id, v, norm,
           ${(0 until LshBits).map(j => s"(CASE WHEN v[${j + 1}] > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")} AS bucket
         FROM vn)""",
      s"""lc AS (
         SELECT vec_id, v, norm, bucket,
           list_sort(list_transform(generate_series(0, ${LshBits - 1}),
             j -> {'a': abs(v[j+1]), 'j': j})) AS ranked
         FROM bk)""",
      s"""pb AS (
         SELECT vec_id, v, norm, bucket,
           ${(0 until LshConfidenceBits).map(i =>
             s"CAST(pow(2.0, CAST(ranked[${i + 1}].j AS DOUBLE)) AS BIGINT) AS pb$i")
             .mkString(", ")}
         FROM lc)""",
      s"""qp AS (
         SELECT vec_id, v, norm,
           unnest([${(0 until (1 << LshConfidenceBits)).map { t =>
             val is = (0 until LshConfidenceBits).filter(i => (t & (1 << i)) != 0)
             if (is.isEmpty) "bucket"
             else s"xor(bucket, ${is.map(i => s"pb$i").mkString(" + ")})"
           }.mkString(", ")}]) AS bucket
         FROM pb)""",
      s"""sims AS (
         SELECT x.vec_id AS qid, y.vec_id AS nid, $cosineExpr AS cosine
         FROM qp x JOIN bk y ON x.bucket = y.bucket AND x.vec_id <> y.vec_id)""",
      """ranked AS (
         SELECT qid, nid, cosine,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS INT) AS rank
         FROM sims)"""),
      s"SELECT qid, nid, cosine, rank FROM ranked WHERE rank <= $TopK ORDER BY qid, rank"),

    "q_knn_ivf" -> w(Seq(vecCte,
      s"""cents AS (
         SELECT vec_id AS cid, v AS cv, cn FROM (
           SELECT vec_id, v,
             sqrt(list_sum(list_transform(v, e -> e * e))) AS cn,
             ${h60("CAST(vec_id AS VARCHAR)")} AS hkey
           FROM v) t
         ORDER BY hkey, vec_id LIMIT $IvfCentroids)""",
      s"""csims AS (
         SELECT x.vec_id AS id, x.v AS v, x.norm AS norm, c.cid,
           round(list_sum(list_transform(list_zip(x.v, c.cv), p -> p[1] * p[2]))
             / (x.norm * c.cn), 6) AS csim
         FROM vn x CROSS JOIN cents c)""",
      """cranked AS (
         SELECT id, v, norm, cid,
           row_number() OVER (PARTITION BY id ORDER BY csim DESC, cid) AS crank
         FROM csims)""",
      """assigned AS (SELECT cid AS cell, id, v, norm FROM cranked WHERE crank = 1)""",
      s"""probes AS (SELECT cid AS cell, id AS qid, v AS qv, norm AS qn
         FROM cranked WHERE crank <= $IvfProbe)""",
      """sims AS (
         SELECT p.qid, a.id AS nid,
           round(list_sum(list_transform(list_zip(p.qv, a.v), z -> z[1] * z[2]))
             / (p.qn * a.norm), 6) AS cosine
         FROM probes p JOIN assigned a ON p.cell = a.cell AND p.qid <> a.id)""",
      """ranked AS (
         SELECT qid, nid, cosine,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS INT) AS rank
         FROM sims)"""),
      s"SELECT qid, nid, cosine, rank FROM ranked WHERE rank <= $TopK ORDER BY qid, rank"),

    "q_lang_id" -> {
      val scores = TextAnalysis.langProfiles
        .map { case (l, ws) => s"${langScoreSql(ws)} AS s_$l" }.mkString(", ")
      val langs = TextAnalysis.langProfiles.map(_._1)
      val pred = langs.init.zipWithIndex.map { case (l, i) =>
        val rest = langs.drop(i + 1).map(x => s"s_$x")
        val g = if (rest.size == 1) rest.head else s"greatest(${rest.mkString(",")})"
        s"WHEN s_$l >= $g THEN '$l'"
      }.mkString("CASE ", " ", s" ELSE '${langs.last}' END")
      w(Seq(s"s AS (SELECT doc_id, $scores FROM documents)"),
        s"SELECT doc_id, s_de, s_en, s_es, s_fr, s_zh, $pred AS lang_pred FROM s ORDER BY doc_id")
    },

    "q_text_quality" -> w(Seq(
      """q AS (SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(list_filter(string_split(text, ' '),
             t -> t IN ('the','a','of','and','to','in','is','that'))) AS BIGINT) AS stop_hits,
           CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS non_alnum,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
         FROM documents)"""),
      """SELECT doc_id, n_tokens, n_chars,
         round(CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens, 6) AS mean_tok_len,
         round(CAST(stop_hits AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
         round(CAST(non_alnum AS DOUBLE) / n_chars, 6) AS punct_ratio,
         round(CAST(n_uniq AS DOUBLE) / n_tokens, 6) AS uniq_ratio,
         round((least(CAST(n_tokens AS DOUBLE) / 32.0, 1.0)
                + round(CAST(n_uniq AS DOUBLE) / n_tokens, 6)
                + least(round(CAST(stop_hits AS DOUBLE) / n_tokens, 6) * 5.0, 1.0)) / 3.0, 6) AS quality
         FROM q ORDER BY doc_id"""),

    "q_token_count" ->
      """SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
         CAST(list_sum(list_transform(
           regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'),
           p -> CAST(ceil(CAST(length(p) AS DOUBLE) / 4.0) AS BIGINT))) AS BIGINT) AS bpeish_tokens
         FROM documents ORDER BY doc_id""",

    "q_multimodal" ->
      """SELECT doc_id AS id,
         ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         substr(hex(encode(text)), 1, 16) AS head_hex,
         CAST((doc_id % 8 + 1) * 64 AS INT) AS width,
         CAST((doc_id % 6 + 1) * 64 AS INT) AS height
         FROM documents ORDER BY id""",

    "q_media_decode" ->
      """SELECT doc_id AS id,
         CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS format,
         CAST(CASE WHEN doc_id % 2 = 0
           THEN 54 + (((3 * (doc_id % 8 + 1) + 3) // 4) * 4) * (doc_id % 5 + 1)
           ELSE 44 + (doc_id % 50 + 10) * 2 END AS BIGINT) AS n_bytes,
         CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 8 + 1 ELSE 0 END AS INT) AS width,
         CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 5 + 1 ELSE 0 END AS INT) AS height,
         CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 8000 * (doc_id % 3 + 1) END AS INT) AS sample_rate_hz,
         CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS INT) AS channels,
         CAST(CASE WHEN doc_id % 2 = 0 THEN 24 ELSE 16 END AS INT) AS bits,
         CAST(CASE WHEN doc_id % 2 = 0 THEN (doc_id % 8 + 1) * (doc_id % 5 + 1)
              ELSE doc_id % 50 + 10 END AS BIGINT) AS n_samples,
         CASE WHEN doc_id % 2 = 0 THEN 0.0
              ELSE (doc_id % 50 + 10) * 1000.0 / (8000 * (doc_id % 3 + 1)) END AS duration_ms,
         CASE WHEN doc_id % 2 = 0 THEN CAST((7 * doc_id) % 256 AS DOUBLE)
              ELSE CAST((doc_id % 200) * 100 - 10000 AS DOUBLE) END AS mean_signal
         FROM documents ORDER BY id""",

    "q_frame_sample" ->
      """WITH m AS (
           SELECT doc_id AS id, hex(encode(text)) AS hx,
             CAST(ceil(octet_length(encode(text)) / 32.0) AS INT) AS n_frames
           FROM documents),
         f AS (
           SELECT id, hx, unnest(generate_series(0, n_frames - 1)) AS frame_idx
           FROM m WHERE n_frames > 0)
         SELECT id, CAST(frame_idx AS INT) AS frame_idx,
           substr(hx, frame_idx * 64 + 1, 64) AS frame_hex
         FROM f WHERE frame_idx % 4 = 0 ORDER BY id, frame_idx""",

    "q_fingerprint" -> w(Seq(shinglesCte(WinnowN),
      s"""sh2 AS (SELECT id, pos, ${h60("shingle")} AS h FROM sh),
         fps AS (
           SELECT DISTINCT doc_id, fp FROM (
             SELECT id AS doc_id, pos,
               min(h) OVER (PARTITION BY id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING) AS fp,
               count(*) OVER (PARTITION BY id) AS n
             FROM sh2) t
           WHERE pos <= greatest(n - ${WinnowW - 1}, 1))"""),
      "SELECT doc_id, fp FROM fps ORDER BY doc_id, fp")
  )
}
