package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vector `window` transform — context-window filter (`grep -B/-A` for
  * event streams).
  *
  * Reference: src/transforms/window/transform.rs:13-94 — ring buffer of
  * `num_events_before`; when `flush_when` matches, the buffer + the
  * matching event + the next `num_events_after` are emitted;
  * `forward_when` events always pass through.
  *
  * Spark-first: the ring buffer IS a bounded window frame. A match at
  * position m emits rows [m-before, m+after]; therefore row r is kept
  * iff a match exists in [r-after, r+before] — the frame direction
  * flips: `max(flag) OVER (... ROWS BETWEEN after PRECEDING AND before
  * FOLLOWING)`. One shuffle on the key; no state machine, no driver
  * loops.
  */
object ContextWindow {
  def apply(
      df: DataFrame,
      key: Seq[Column],
      ord: Column,
      flushWhen: Column,
      numBefore: Int,
      numAfter: Int,
      forwardWhen: Option[Column] = None): DataFrame = {
    def frameKeep(d: DataFrame): DataFrame = {
      val w = Window.partitionBy(key: _*).orderBy(ord)
        .rowsBetween(-numAfter.toLong, numBefore.toLong)
      val nearMatch = max(when(flushWhen, 1).otherwise(0)).over(w) === 1
      d.withColumn("__keep", nearMatch).filter(col("__keep")).drop("__keep")
    }
    forwardWhen match {
      case None => frameKeep(df)
      case Some(f) =>
        // the reference checks forward_when FIRST (transform.rs:51-66):
        // a forwarded event bypasses the ring buffer — it consumes no
        // before/after context slot and never acts as a flush match
        // (even if flush_when also matches it). So the frame runs over
        // the NON-forwarded rows only, and forwarded rows union back in.
        val fwd = coalesce(f, lit(false))
        frameKeep(df.filter(!fwd)).unionByName(df.filter(fwd))
    }
  }
}
