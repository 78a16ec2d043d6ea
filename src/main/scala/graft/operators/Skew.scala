package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hot-key (skew) handling: salted repartition and salted two-phase
  * aggregation for hot `conv_id` keys, plus the AQE knobs.
  *
  * The reference has no shuffle (single-node, per-component FIFO), so
  * this is pure Spark engineering per the north rule: a Zipf-heavy
  * conv_id distribution sends some conversations to one reducer;
  * salting splits a hot key across `saltBuckets` partitions and
  * re-merges in a second, tiny aggregation over the salted partials.
  *
  * When to use which:
  *  - plain shuffle + AQE skew split (`enableAqeSkew`) — joins and
  *    sort-based ops; AQE splits oversized partitions at runtime.
  *  - `saltedAggregate` — groupBy over a skewed key where partial
  *    aggregation doesn't collapse the hot key early enough (e.g.
  *    collect_list / exact distinct per key).
  *  - `saltedRepartition` — spread a hot key before a stateful
  *    per-partition op (window functions that only need per-salt
  *    locality, custom mapPartitions).
  */
object Skew {

  /** Standard AQE skew configuration (session-wide). */
  def enableAqeSkew(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
  }

  /** Deterministic salt in [0, saltBuckets): spreads a key's rows by a
    * stable secondary column (NOT rand() — keeps the pipeline
    * replayable/verifiable; here turn_idx or any uniform column).
    */
  def salt(by: Column, saltBuckets: Int): Column =
    pmod(hash(by), lit(saltBuckets))

  /** Repartition on (key, salt): a hot key spreads over saltBuckets
    * partitions instead of one.
    */
  def saltedRepartition(df: DataFrame, key: Column, saltBy: Column,
                        saltBuckets: Int, numPartitions: Int): DataFrame =
    // the helper column is dropped after the exchange (the physical row
    // spread survives the projection) — callers keep their schema
    df.withColumn("__salt", salt(saltBy, saltBuckets))
      .repartition(numPartitions, key, col("__salt"))
      .drop("__salt")

  /** Two-phase salted aggregation: phase 1 aggregates per
    * (key, salt) — the hot key's load spreads across saltBuckets
    * reducers; phase 2 merges the (tiny) per-salt partials per key.
    *
    * `partial` must be decomposable: phase-2 `merge` expressions
    * re-aggregate phase-1 outputs (sum/sum, count→sum, max/max, ...).
    */
  def saltedAggregate(
      df: DataFrame,
      key: Seq[Column],
      saltBy: Column,
      saltBuckets: Int,
      partial: Seq[Column],   // aggregates over raw rows, aliased
      merge: Seq[Column]      // aggregates over phase-1 columns, aliased
  ): DataFrame = {
    val phase1 = df
      .withColumn("__salt", salt(saltBy, saltBuckets))
      .groupBy(key :+ col("__salt"): _*)
      .agg(partial.head, partial.tail: _*)
    phase1
      .groupBy(key: _*)
      .agg(merge.head, merge.tail: _*)
  }
}
