package graft.operators

import org.apache.spark.sql.{Column, Dataset, Encoder}

/** The reference's generic-scripting escape hatch — the `lua` transform
  * (src/transforms/lua/v2/mod.rs:28-62: an init source, a per-event
  * process hook emitting 0..n events, and a shutdown hook flushing
  * final state) — re-expressed as typed Dataset harnesses. Spark-first,
  * the "script" is a Scala closure compiled into the job: identical
  * lifecycle semantics, JVM speed, no interpreter in the hot loop.
  *
  * Two state scopes:
  *  - per PARTITION (`transform`): init once per partition, fold state
  *    across the partition's events in order, flush when exhausted —
  *    the direct analog of the reference's per-worker Lua VM (whose
  *    state is worker-local in exactly the same way). Use for
  *    aggregation-ish scripts where partition-local state is the
  *    semantics (counters flushed as periodic events, batch
  *    assembly, ...).
  *  - per KEY (`transformByKey`): state scoped to a key, events
  *    delivered in an explicit, total sort order — what Lua users build
  *    by hand when they key a table on an event field, but
  *    deterministic under any partitioning because the order is part of
  *    the contract. One shuffle on the key; state never leaves the
  *    executor (`flatMapSortedGroups` — the sort rides the shuffle,
  *    no extra exchange).
  *
  * At 100 TB: `transform` is embarrassingly parallel; `transformByKey`
  * scales with key cardinality like any keyed aggregation (skewed keys
  * are the caller's salt-or-split decision, same as groupBy).
  */
object Script {

  /** Partition-scoped lifecycle: `init` once per partition, `onEvent`
    * folds state and emits 0..n outputs per input, `flush` emits final
    * outputs after the last event of the partition.
    */
  def transform[T, S, U: Encoder](ds: Dataset[T])(init: () => S)(
      onEvent: (S, T) => (S, IterableOnce[U]))(
      flush: S => IterableOnce[U]): Dataset[U] =
    ds.mapPartitions { it =>
      var s = init()
      val main = it.flatMap { t =>
        val (s2, out) = onEvent(s, t); s = s2; out.iterator
      }
      // ++ evaluates its operand lazily, so flush sees the final state
      main ++ new Iterator[U] {
        private lazy val tail = flush(s).iterator
        def hasNext: Boolean = tail.hasNext
        def next(): U = tail.next()
      }
    }

  /** Key-scoped lifecycle: one state per key, events in `sortCols`
    * order within the key, `flush` emits after the key's last event.
    */
  def transformByKey[T, K: Encoder, S, U: Encoder](
      ds: Dataset[T], keyFn: T => K, sortCols: Seq[Column])(
      init: K => S)(
      onEvent: (S, T) => (S, IterableOnce[U]))(
      flush: (K, S) => IterableOnce[U]): Dataset[U] =
    ds.groupByKey(keyFn).flatMapSortedGroups(sortCols: _*) { (k, it) =>
      var s = init(k)
      val main = it.flatMap { t =>
        val (s2, out) = onEvent(s, t); s = s2; out.iterator
      }
      main ++ new Iterator[U] {
        private lazy val tail = flush(k, s).iterator
        def hasNext: Boolean = tail.hasNext
        def next(): U = tail.next()
      }
    }
}
