package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.PortableHash

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * These extend the reference's VRL string/parse surface
  * (website/cue/reference/remap/functions/ — parse_tokens.cue,
  * strlen.cue, contains.cue, …) to corpus-curation semantics. Every
  * scoring function is a pure, codegen-friendly column expression —
  * no UDFs, so the whole stage stays inside WholeStageCodegen and
  * scales as a narrow map over the corpus.
  */
object TextAnalysis {

  /** Per-language discriminative stopword profiles for the n-gram/
    * stopword language-ID heuristic. Deterministic and engine-portable
    * (the oracle re-implements the same argmax in SQL).
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ein", "mit"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por"),
    "fr" -> Seq("le", "la", "de", "et", "un", "que", "pour", "dans"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1")
  )

  /** Language-ID: per-language stopword hit count over the token
    * multiset; winner = max count, ties broken alphabetically (stable
    * argmax). Adds `s_<lang>` score columns plus `predCol` to `df`.
    *
    * STAGED on purpose: a Column-tuple formulation of the argmax fold
    * re-embeds every score subtree once per fold level (the Column DSL
    * has no sharing — bestS doubles each step, ~16 copies of the last
    * filter() by five languages, all CodegenFallback lambdas). Here
    * each score is a real projection column evaluated once per row,
    * and the argmax is a linear when-chain over leaf attributes
    * (alphabetical order, `=== max` — first match wins ties).
    */
  def withLanguageId(df: DataFrame, text: Column,
                     predCol: String = "lang_pred"): DataFrame = {
    val u = "__lid_"
    val s1 = df.withColumn(u + "toks", split(text, " "))
    val s2 = s1.withColumns(scala.collection.immutable.ListMap(
      langProfiles.map { case (lang, words) =>
        (s"s_$lang") -> size(filter(col(u + "toks"),
          t => words.map(w => t === w).reduce(_ || _))).cast("long")
      }: _*))
    val langs = langProfiles.map(_._1) // alphabetical by construction
    val s3 = s2.withColumn(u + "mx", greatest(langs.map(l => col(s"s_$l")): _*))
    val pred = langs.init.foldRight(lit(langs.last): Column) { (l, acc) =>
      when(col(s"s_$l") === col(u + "mx"), lit(l)).otherwise(acc)
    }
    s3.withColumn(predCol, pred).drop(u + "toks", u + "mx")
  }

  /** Quality-signal columns over a text column. All ratios in [0,1],
    * rounded for cross-engine comparability.
    */
  def qualitySignals(text: Column): Seq[(String, Column)] = {
    val toks = split(text, " ")
    val nTok = size(toks).cast("long")
    val nChars = length(text).cast("long")
    val stop = Seq("the", "a", "of", "and", "to", "in", "is", "that")
    val stopHits = size(filter(toks, t => stop.map(w => t === w).reduce(_ || _)))
    val nonAlnum = length(regexp_replace(text, "[A-Za-z0-9 ]", ""))
    val meanTokLen = round((nChars - (nTok - 1)).cast("double") / nTok, 6)
    Seq(
      "n_tokens" -> nTok,
      "n_chars" -> nChars,
      "mean_tok_len" -> meanTokLen,
      "stopword_ratio" -> round(stopHits.cast("double") / nTok, 6),
      "punct_ratio" -> round(nonAlnum.cast("double") / nChars, 6),
      "uniq_ratio" -> round(size(array_distinct(toks)).cast("double") / nTok, 6)
    )
  }

  /** Composite quality score in [0,1]: penalize very short/long docs,
    * low lexical diversity, missing stopwords. A fixed, documented
    * formula (the point is the shape of the pipeline, not the exact
    * weights — swap per corpus).
    */
  def qualityScore(text: Column): Column = {
    val s = qualitySignals(text).toMap
    val lenScore = least(s("n_tokens").cast("double") / 32.0, lit(1.0))
    val divScore = s("uniq_ratio")
    val stopScore = least(s("stopword_ratio") * 5.0, lit(1.0))
    round((lenScore + divScore + stopScore) / 3.0, 6)
  }

  /** Token counts: whitespace tokens and BPE-ish subword count (runs of
    * letters / digits / single non-alnum, each run counted ceil(len/4)
    * — the standard "~4 chars per token" estimator made exact and
    * portable).
    */
  def tokenCounts(text: Column): Seq[(String, Column)] = {
    val ws = size(split(text, " ")).cast("long")
    val pieces = regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0))
    val bpeish = aggregate(pieces, lit(0L),
      (acc, p) => acc + ceil(length(p).cast("double") / 4.0).cast("long"))
    Seq("ws_tokens" -> ws, "bpeish_tokens" -> bpeish)
  }

  /** Repetition-based quality signals (the Gopher/MassiveText repetition
    * filters, Rae et al. 2021 §A1.1, token-fraction form): per document,
    *   - `top_ngram_frac`: tokens covered by the single most frequent
    *     word `topN`-gram, as a fraction of the doc's tokens — high
    *     values mean one boilerplate phrase dominates;
    *   - `dup_ngram_frac`: fraction of `dupN`-gram POSITIONS whose gram
    *     occurs more than once in the doc — high values mean looping /
    *     copy-paste text.
    * Output: (id, n_tokens, top_ngram_frac, dup_ngram_frac), every doc
    * kept (docs too short for a gram score 0).
    *
    * 100 TB shape: two explode → hash-agg chains keyed by (doc, gram)
    * then (doc) — map-side partial aggregation, per-doc key space, no
    * window functions, final joins on the doc id. Grams hash to 60-bit
    * longs before the shuffle like the dedup family.
    */
  def repetitionSignals(df: DataFrame, id: Column, text: Column,
                        topN: Int = 2, dupN: Int = 3): DataFrame = {
    def gramStats(n: Int) = TextDedup.shingles(df, id, text, n)
      .select(col("id"), PortableHash.h60(col("shingle")).as("h"))
      .groupBy(col("id"), col("h")).agg(count(lit(1)).as("c"))
    val top = gramStats(topN).groupBy(col("id"))
      .agg(max(col("c")).as("__top"))
    val dup = gramStats(dupN).groupBy(col("id"))
      .agg(sum(when(col("c") > 1, col("c")).otherwise(0L)).as("__dup"),
           sum(col("c")).as("__tot"))
    val nTok = size(split(text, " ")).cast("long")
    df.select(id.as("id"), nTok.as("n_tokens"))
      .join(top, Seq("id"), "left")
      .join(dup, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        round(coalesce(col("__top") * topN, lit(0L)).cast("double") /
          col("n_tokens"), 6).as("top_ngram_frac"),
        round(coalesce(col("__dup"), lit(0L)).cast("double") /
          greatest(coalesce(col("__tot"), lit(0L)), lit(1L)), 6)
          .as("dup_ngram_frac"))
  }

  /** Deterministic stratified sampling for dataset mixing: keep each
    * row with the probability assigned to its `group` value (source /
    * domain weights when composing a training mix). The keep decision
    * is a pure hash of (group, key) — reproducible across runs,
    * engines, and partitionings, unlike `rand()`-based sampling — so
    * the oracle, a resumed job, and a re-partitioned cluster all
    * select the identical rows.
    *
    * 100 TB shape: a single codegen'd map-side filter — no shuffle, no
    * driver state; fractions ride the plan as a literal CASE.
    */
  def stratifiedSample(df: DataFrame, group: Column, key: Column,
                       fractions: Map[String, Double],
                       default: Double = 0.0): DataFrame = {
    val u = pmod(PortableHash.h60(concat(group, lit(":"), key.cast("string"))),
      lit(1000000L))
    // the threshold is an INTEGER computed once per fraction — a
    // row-side `u < frac * 1e6` double comparison would put boundary
    // hashes on different sides in engines that evaluate the literal
    // in exact decimal (0.8 is not binary-exact)
    def thr(f: Double): Long = math.round(f * 1000000L)
    val cut = fractions.foldLeft(lit(thr(default))) { case (acc, (g, f)) =>
      when(group === g, lit(thr(f))).otherwise(acc)
    }
    df.filter(u < cut)
  }

  /** Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    * hash every `n`-gram shingle, slide a window of `w` consecutive
    * shingle hashes, keep each window's minimum; the distinct kept
    * hashes are the document's fingerprints. Output: (id, fp) rows.
    *
    * Scale: narrow explode + per-doc window min (shuffle on doc id
    * only), fingerprint count per doc ~ 2·len/w — a tunable sketch of
    * the corpus for plagiarism/near-dup detection.
    */
  def winnowingFingerprints(df: DataFrame, id: Column, text: Column,
                            n: Int, w: Int): DataFrame = {
    val sh = TextDedup.shingles(df, id, text, n)
      .select(col("id"), col("pos"), PortableHash.h60(col("shingle")).as("h"))
    val win = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(0, w - 1)
    // FULL windows only (pos <= nShingles-w+1): the trailing truncated
    // frames select hashes the winnowing scheme never emits — the last
    // shingle unconditionally, and an ascending tail wholesale —
    // inflating density past the ~2·len/w contract and colliding
    // documents on non-fingerprints. A doc shorter than w keeps its one
    // whole-doc window (pos 1): the global minimum, per the paper's
    // short-document degenerate case. Same partition shuffle: the count
    // rides the existing per-doc window.
    val nSh = count(lit(1)).over(Window.partitionBy(col("id")))
    sh.withColumn("fp", min(col("h")).over(win))
      .withColumn("__n", nSh)
      .filter(col("pos") <= greatest(col("__n") - (w - 1), lit(1)))
      .select(col("id"), col("fp")).distinct()
  }
}
