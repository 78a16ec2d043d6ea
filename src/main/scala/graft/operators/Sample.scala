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
    val keep = pmod(keyNum, lit(rate)) === 0
    val cond = exclude.map(e => e || keep).getOrElse(keep)
    df.filter(cond).withColumn("sample_rate", lit(rate))
  }

  /** Hash-of-key variant (xxhash64) — the scale path when no numeric key
    * exists. Not oracle-verifiable (engine-specific hash) but ratio-tested.
    */
  def byKeyHash(df: DataFrame, key: Column, rate: Int): DataFrame =
    df.filter(pmod(xxhash64(key), lit(rate)) === 0)
      .withColumn("sample_rate", lit(rate))

  /** Counter mode: keep every `rate`-th row per group in `order` order.
    * Matches the reference's per-group independent counters
    * (sample/transform.rs group_by).
    */
  def counter(df: DataFrame, groupBy: Seq[Column], order: Seq[Column],
              rate: Int): DataFrame = {
    val w = Window.partitionBy(groupBy: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(pmod(col("__rn") - 1, lit(rate)) === 0)
      .drop("__rn")
      .withColumn("sample_rate", lit(rate))
  }
}
