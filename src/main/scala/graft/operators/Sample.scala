package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vector `sample` transform.
  *
  * Reference: src/transforms/sample/transform.rs:56-89 — modes:
  * 1-in-`rate` modulo counter, or consistent key-based sampling via
  * `key_field` (equal keys always sample together); `group_by` gives each
  * group its own counter; `exclude` bypasses sampling; kept events get a
  * `sample_rate` field stamped on them (transform.rs:205).
  *
  * Spark-first notes: the counter mode's "every Nth event" has no stable
  * meaning under distributed, unordered execution, so the batch analog
  * imposes an explicit order (row_number over the group) — same selection
  * on the same logical stream. Key mode is a pure narrow projection
  * (hash/modulo of the key), infinitely scalable.
  */
object Sample {

  /** Consistent key sampling: keep rows whose key hashes into bucket 0 of
    * `rate`. `keyNum` must be a deterministic numeric expression — for
    * cross-engine verifiability we use an explicit numeric key rather
    * than an engine hash (Vector uses seahash; any uniform deterministic
    * map satisfies the semantics).
    */
  def byKey(df: DataFrame, keyNum: Column, rate: Int,
            exclude: Option[Column] = None): DataFrame = {
    requireRate(rate)
    val keep = pmod(keyNum, lit(rate)) === 0
    stampKept(df, keep, exclude, lit(rate))
  }

  /** rate >= 1, validated at PLAN time: pmod(x, 0) is null under
    * non-ANSI evaluation, so an unvalidated rate=0 (a config typo)
    * would silently drop every row instead of failing like the
    * reference's config check.
    */
  private def requireRate(rate: Int): Unit =
    require(rate >= 1, s"sample rate must be >= 1, got $rate")

  /** Keep `keep || exclude` rows; stamp sample_rate ONLY on rows kept by
    * sampling — the reference's exclude branch emits the event BEFORE
    * the stamp (transform.rs:147-155), so excluded events carry no
    * sample_rate (null here, the columnar analog of an absent field).
    */
  private def stampKept(df: DataFrame, keep: Column,
                        exclude: Option[Column], rate: Column): DataFrame =
    exclude match {
      case None => df.filter(keep).withColumn("sample_rate", rate)
      case Some(e) =>
        df.filter(e || keep).withColumn("sample_rate",
          when(e, lit(null)).otherwise(rate))
    }

  /** Hash-of-key variant (xxhash64) — the scale path when no numeric key
    * exists. Not oracle-verifiable (engine-specific hash) but ratio-tested.
    */
  def byKeyHash(df: DataFrame, key: Column, rate: Int): DataFrame = {
    requireRate(rate)
    df.filter(pmod(xxhash64(key), lit(rate)) === 0)
      .withColumn("sample_rate", lit(rate))
  }

  /** Reference-exact keyed rate sampling: keep rows whose seahash of the
    * key is an exact (unsigned) multiple of `rate`
    * (sample/transform.rs:82-90 `hash_within_ratio`, Rate arm —
    * `seahash::hash(value).is_multiple_of(rate)`). Our [[graft.functions.Vrl.seahash]]
    * returns the u64 in signed-long bits; the unsigned modulo is computed
    * as `u = 2*(h>>>1) + (h&1)`, so
    * `u mod n = (2*((h>>>1) mod n) + (h&1)) mod n` — pure long math, no
    * BigInt, stays in codegen. Not DuckDB-oracle-portable (seahash is not
    * a DuckDB builtin) — spec-verified against `Long.remainderUnsigned`.
    */
  def byKeySeahash(df: DataFrame, key: Column, rate: Int,
                   exclude: Option[Column] = None): DataFrame = {
    requireRate(rate)
    stampKept(df, seahashKeepRate(key, rate), exclude, lit(rate))
  }

  /** Unsigned `seahash(key) % rate == 0` in signed-long math (see
    * [[byKeySeahash]] doc for the u64 decomposition).
    */
  private def seahashKeepRate(key: Column, rate: Int): Column = {
    val h = graft.functions.Vrl.seahash(key)
    pmod(
      pmod(shiftrightunsigned(h, 1), lit(rate.toLong)) * 2 + h.bitwiseAND(lit(1L)),
      lit(rate.toLong)) === 0
  }

  /** Unsigned `seahash(key) <= (ratio * 2^64) as u64` via sign-bit flip
    * (see [[byKeyRatio]] doc).
    */
  private def seahashKeepRatio(key: Column, ratio: Double): Column = {
    val thr = ratioThresholdBits(ratio)
    graft.functions.Vrl.seahash(key).bitwiseXOR(lit(Long.MinValue)) <=
      lit(thr ^ Long.MinValue)
  }

  /** Reference-exact keyed ratio sampling (sample/transform.rs:41-54,
    * `new_ratio` + Ratio arm of `hash_within_ratio`): keep rows whose
    * seahash of the key is `<=` (unsigned) the threshold
    * `(ratio * u64::MAX as f64) as u64`. Unsigned `<=` over signed-long
    * bits is the standard sign-bit flip. Spec-verified against
    * `Long.compareUnsigned`; equal keys always sample together, and the
    * kept fraction approaches `ratio` on uniformly-hashed keys.
    */
  def byKeyRatio(df: DataFrame, key: Column, ratio: Double,
                 exclude: Option[Column] = None): DataFrame =
    stampKept(df, seahashKeepRatio(key, ratio), exclude, lit(ratio))

  /** Rust `(ratio * (u64::MAX as u128) as f64) as u64`
    * (sample/transform.rs:52): f64→u64 truncates toward zero and
    * SATURATES at the type bounds, returned here in signed-long bits.
    * `u64::MAX as f64` rounds up to 2^64 exactly, hence the constant.
    */
  private[graft] def ratioThresholdBits(ratio: Double): Long = {
    val two63 = 9.223372036854775808e18 // 2^63 exact
    val d = ratio * 1.8446744073709551616e19 // ratio * 2^64
    if (d.isNaN || d <= 0.0) 0L
    else if (d >= 1.8446744073709551616e19) -1L // saturate to u64::MAX
    else if (d >= two63) (d - two63).toLong | Long.MinValue
    else d.toLong
  }

  /** Counter mode: keep every `rate`-th row per group in `order` order.
    * Matches the reference's per-group independent counters
    * (sample/transform.rs group_by).
    */
  def counter(df: DataFrame, groupBy: Seq[Column], order: Seq[Column],
              rate: Int): DataFrame = {
    requireRate(rate)
    val w = Window.partitionBy(groupBy: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(pmod(col("__rn") - 1, lit(rate)) === 0)
      .drop("__rn")
      .withColumn("sample_rate", lit(rate))
  }

  /** Ratio counter mode (sample/transform.rs:64-73, Ratio arm of
    * `increment`): the reference runs a per-group error accumulator —
    * start at `1 - ratio`, add `ratio` per event, emit on crossing 1.0 —
    * i.e. Bresenham sampling that keeps `1 + floor((k-1)·ratio)` of the
    * first `k` events, evenly spaced, for ANY ratio including > 1/2
    * (which 1-in-N `rate` cannot express). The batch analog is the
    * closed form over the group row_number `k`:
    * keep iff `floor((1-r) + k·r) > floor((1-r) + (k-1)·r)`.
    * All arithmetic is plain IEEE double on both engines, so the row set
    * is DuckDB-oracle-portable. Divergence contract vs the reference:
    * at ratios whose keep boundary lands within an ulp of an integer
    * (e.g. 0.3 at k=11: the exact rational crossing is 0.7+11·0.3=4.0),
    * the reference's RUNNING float accumulator drifts off the exact
    * crossing and keeps k=12 where the closed form keeps k=11 — a
    * one-position shift; prefix keep-COUNTS (`1+floor((k-1)·r)`) agree
    * everywhere, and at ratios without such boundary hits (0.13, 0.25,
    * 0.5, 0.77, 1.0, …) the row sets are identical (pinned by the
    * replay test in OperatorSpec). Stamps `sample_rate` with
    * the ratio (the reference stamps `rate.to_string()` — same value,
    * numeric column here like the rate modes).
    */
  def byRatio(df: DataFrame, groupBy: Seq[Column], order: Seq[Column],
              ratio: Double): DataFrame = {
    require(ratio > 0.0 && ratio <= 1.0,
      s"sample ratio must be in (0, 1], got $ratio") // InvalidRatio, config.rs:25-28
    val w = Window.partitionBy(groupBy: _*).orderBy(order: _*)
    val k = row_number().over(w).cast("double")
    val base = lit(1.0) - lit(ratio) // runtime subtraction: same IEEE op the oracle SQL performs
    df.withColumn("__keep",
        floor(base + k * lit(ratio)) > floor(base + (k - lit(1.0)) * lit(ratio)))
      .filter(col("__keep")).drop("__keep")
      .withColumn("sample_rate", lit(ratio))
  }

  /** The FULL config surface of the reference transform
    * (sample/config.rs:45-95, transform.rs:92-155) in one plan:
    *
    *  - `exclude` rows bypass sampling entirely — emitted unstamped and,
    *    critically, WITHOUT consuming counter quota (the reference's
    *    exclude check precedes both the hash gate and the counter
    *    increment).
    *  - rows where `key` is present gate on the seahash of the key's
    *    string form (rate: unsigned multiple-of; ratio: unsigned
    *    threshold) — equal keys always sample together.
    *  - rows without the key (or with no `key` configured) fall back to
    *    the per-`group` counter, whose position counts only
    *    non-excluded keyless rows ("the event is sampled
    *    independently", config.rs:68-71). Rate: every Nth such row;
    *    ratio: the same Bresenham closed form as [[byRatio]].
    *  - kept-by-sampling rows are stamped into `rateKey`
    *    (`sample_rate_key`, config.rs:79-81); empty string = no stamp.
    *
    * One window over (group, order) — the same single shuffle as
    * [[counter]]; the keyed gate is a narrow projection on top.
    */
  def configured(df: DataFrame, key: Option[Column], group: Column,
                 order: Seq[Column], mode: Either[Int, Double],
                 exclude: Option[Column], rateKey: String): DataFrame = {
    mode match {
      case Left(rate) => requireRate(rate)
      case Right(ratio) => require(ratio > 0.0 && ratio <= 1.0,
        s"sample ratio must be in (0, 1], got $ratio")
    }
    // a null condition value (missing field) is "not excluded", not
    // three-valued — otherwise `null || keep=false` would DROP the row
    val ex = exclude.map(e => coalesce(e, lit(false))).getOrElse(lit(false))
    val keyPresent = key.map(_.isNotNull).getOrElse(lit(false))
    val keyedKeep = key.map { k =>
      val ks = k.cast("string") // the reference hashes to_string_lossy()
      mode match {
        case Left(rate)   => seahashKeepRate(ks, rate)
        case Right(ratio) => seahashKeepRatio(ks, ratio)
      }
    }.getOrElse(lit(false))
    // position among non-excluded keyless rows of the group (1-based)
    val w = Window.partitionBy(group).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kn = sum(when(!ex && !keyPresent, 1L).otherwise(0L)).over(w)
    val counterKeep = mode match {
      case Left(rate) => pmod(kn - 1, lit(rate.toLong)) === 0
      case Right(ratio) =>
        val base = lit(1.0) - lit(ratio)
        val kd = kn.cast("double")
        floor(base + kd * lit(ratio)) > floor(base + (kd - lit(1.0)) * lit(ratio))
    }
    val keep = ex || when(keyPresent, keyedKeep).otherwise(counterKeep)
    val stampVal = mode match {
      case Left(rate) => lit(rate); case Right(ratio) => lit(ratio)
    }
    val kept = df.withColumn("__keep", keep).filter(col("__keep")).drop("__keep")
    if (rateKey.isEmpty) kept
    else kept.withColumn(rateKey, when(ex, lit(null)).otherwise(stampVal))
  }
}
