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
    exclude match {
      case None =>
        df.withColumn("__rank", row_number().over(w))
          .filter(col("__rank") <= threshold)
          .drop("__rank")
      case Some(e) =>
        // excluded events BYPASS the limiter without consuming quota
        // (transform.rs:102-130: the exclude check happens before
        // limiter.check_key) — so the rank counts non-excluded rows
        // only; a plain row_number would let excluded rows push later
        // events over the threshold
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        df.withColumn("__rank", sum(when(e, 0).otherwise(1)).over(wRun))
          .filter(e || col("__rank") <= threshold)
          .drop("__rank")
    }
  }
}
