package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vector `dedupe` transform (batch analog).
  *
  * Reference: src/transforms/dedupe/transform.rs:76-121 — drop events
  * whose selected (`match`) or all-but-ignored (`ignore`) field values
  * were already seen; comparison is TYPE-TAGGED (int 1 != string "1",
  * transform.rs:54-65) over an LRU cache of `cache.num_events`
  * (default 5000, dedupe/common.rs:32-34).
  *
  * Batch divergences, documented: (1) "seen before" needs an order — we
  * use an explicit stable order and keep the FIRST occurrence (the
  * reference keeps the first-arriving); (2) the cache is exact, not LRU
  * (an LRU admits re-emission after eviction; exact dedupe is the
  * fixpoint of that semantics). Type-tagging is free: Spark columns are
  * typed, so 1 and "1" never compare equal.
  *
  * Scale: one shuffle on the match columns. For streaming, use
  * `dropDuplicatesWithinWatermark` (see graft.streaming).
  */
object Dedupe {

  /** Keep the first row per distinct value of `matchCols`, first by
    * `order` (must be a total order for determinism).
    */
  def keepFirst(df: DataFrame, matchCols: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(matchCols: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** `ignore` mode: dedupe on every column EXCEPT the given ones. */
  def ignoring(df: DataFrame, ignore: Seq[String], order: Seq[Column]): DataFrame =
    keepFirst(df, df.columns.filterNot(ignore.contains).map(col).toSeq, order)
}
