package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vector `throttle` transform (batch analog).
  *
  * Reference: src/transforms/throttle/transform.rs:22-53 — token bucket
  * per templated key: at most `threshold` events per `window_secs`;
  * events matching `exclude` bypass the limiter.
  *
  * Batch semantics: within each (key, tumbling event-time window) keep
  * the first `threshold` events in stable order. The reference's
  * governor quota is wall-clock; event-time is the deterministic,
  * replay-safe equivalent (same divergence note as Aggregate).
  * One shuffle on (key, window); the rank is computed per partition
  * group — no global sort.
  */
object Throttle {
  def apply(
      df: DataFrame,
      key: Column,
      ts: Column,
      threshold: Int,
      windowSecs: Long,
      order: Seq[Column],
      exclude: Option[Column] = None): DataFrame = {
    val win = Aggregate.windowStart(ts, windowSecs)
    val w = Window.partitionBy(key, win).orderBy(order: _*)
    val kept = col("__rank") <= threshold
    val cond = exclude.map(e => e || kept).getOrElse(kept)
    df.withColumn("__rank", row_number().over(w))
      .filter(cond)
      .drop("__rank")
  }
}
