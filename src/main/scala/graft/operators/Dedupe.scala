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

  /** EXACT batch replay of the reference's LRU-bounded cache
    * (dedupe/transform.rs:76-84 over `LruCache::new(num_events)`,
    * default 5000, dedupe/common.rs:32-34): an event is DROPPED iff its
    * key is currently cached; every event — kept or dropped — refreshes
    * the key's recency (`cache.put` on both paths); a key falls out
    * once `numEvents` other distinct keys were touched after it, and
    * its next occurrence is RE-EMITTED.
    *
    * Distributed formulation (no sequential scan): with `ord` a unique
    * total order and prev(i) = the key's previous occurrence (lag over
    * the key partition), the cache holds the `numEvents` most recently
    * touched distinct keys, so event i is re-emitted iff at least
    * `numEvents` distinct keys were touched in (prev(i), i). A key's
    * FIRST touch inside that gap is precisely a row m with
    * prevOcc(m) <= prev(i) < m (later touches have prevOcc inside the
    * gap), so the distinct count is a plain row count over
    * { m : prev(i) < m < i, prevOcc(m) <= prev(i) } — one lag window
    * (shuffle on the key) + one range self-join over DUPLICATE gaps.
    *
    * The gap scan is a BUCKETED band join (an interval-stabbing join):
    * touches carry bucket = floor(ord / bucketSize); each duplicate
    * explodes into the buckets its gap covers and joins on bucket
    * EQUALITY before the range refine — SortMergeJoin, never a nested
    * loop. Cost: Σ gap-length over duplicate events (+ one bucket of
    * slack each) — proportional to re-emission pressure, not n². First
    * occurrences never join; duplicate-dense streams (the operator's
    * use case) have short gaps. `keepFirst` is the exact fixpoint when
    * bounded-cache re-emission is NOT wanted. `ord` must be integral
    * (bucket arithmetic) and unique.
    */
  def keepFirstLru(df: DataFrame, matchCols: Seq[Column], ord: Column,
                   numEvents: Int, bucketSize: Long = 256L): DataFrame = {
    require(numEvents > 0, "numEvents must be positive")
    val w = Window.partitionBy(matchCols: _*).orderBy(ord)
    val withPrev = df.withColumn("__ord", ord.cast("long"))
      .withColumn("__prev", lag(col("__ord"), 1).over(w))
    // all events as recency probes: (touch position, its own reach-back)
    val touches = withPrev.select(col("__ord").as("__m"),
      col("__prev").as("__m_prev"),
      floor(col("__ord") / bucketSize).as("__bkt"))
    val firsts = withPrev.filter(col("__prev").isNull)
    val dups = withPrev.filter(col("__prev").isNotNull)
      .withColumn("__bkt", explode(when(col("__prev") + 1 > col("__ord") - 1,
          array().cast("array<long>"))
        .otherwise(sequence(floor((col("__prev") + 1) / bucketSize),
          floor((col("__ord") - 1) / bucketSize)))))
    // distinct keys touched in (prev, ord) == rows m with
    // m_prev <= prev < m < ord; each m lives in exactly one bucket, so
    // the bucket-exploded join never double-counts
    val counted = dups.alias("d").join(touches.alias("t"),
        col("t.__bkt") === col("d.__bkt") &&
          col("t.__m") > col("d.__prev") && col("t.__m") < col("d.__ord") &&
          (col("t.__m_prev").isNull || col("t.__m_prev") <= col("d.__prev")),
        "inner")
      .groupBy(withPrev.columns.map(c => col("d." + c)).toIndexedSeq: _*)
      .agg(count(col("t.__m")).as("__evicted_by"))
      .filter(col("__evicted_by") >= numEvents)
      .drop("__evicted_by")
    firsts.unionByName(counted).drop("__ord", "__prev")
  }

  /** The reference's TIMED cache (`time_settings`, dedupe/
    * timed_transform.rs:32-54): a duplicate is dropped iff its key's
    * cache entry is younger than `max_age_ms` (STRICT — an event
    * exactly max_age later is kept and re-inserts); with
    * `refresh_on_drop = true` every sighting (kept or dropped)
    * refreshes the entry, with `false` only kept events do.
    *
    * Batch analog: event time stands in for the reference's wall
    * clock (same convention as the batch throttle window). The cache
    * is exact/unbounded like `keepFirst` — the reference additionally
    * bounds it by LRU `num_events`; combine with `keepFirstLru` when
    * that re-emission matters.
    *
    * Shapes: `refresh_on_drop = true` means drop iff the key's
    * PREVIOUS occurrence is younger than max_age — one lag window,
    * fully parallel. `refresh_on_drop = false` ages against the last
    * KEPT occurrence — a per-key greedy chain (kept(i) decides
    * kept(i+1)), so it runs as repartition-by-key +
    * sortWithinPartitions + a streaming per-partition scan with O(1)
    * state — no per-key buffering, one shuffle, same as any keyed
    * stateful op. A null event time never expires its entry
    * (conservative: age unknown ⇒ treated as younger than max_age).
    */
  def keepFirstTimed(df: DataFrame, matchCols: Seq[Column], ts: Column,
                     ord: Column, maxAgeMs: Long,
                     refreshOnDrop: Boolean): DataFrame = {
    require(maxAgeMs > 0, "maxAgeMs must be positive")
    val tsMs = unix_millis(ts.cast("timestamp"))
    if (refreshOnDrop) {
      val w = Window.partitionBy(matchCols: _*).orderBy(tsMs.asc_nulls_first, ord)
      df.withColumn("__prev_gap", tsMs - lag(tsMs, 1).over(w))
        .withColumn("__first", lag(lit(1), 1).over(w).isNull)
        .filter(col("__first") || col("__prev_gap") >= maxAgeMs)
        .drop("__prev_gap", "__first")
    } else {
      val keyed = df
        .withColumn("__key", to_json(struct(
          matchCols.zipWithIndex.map { case (c, i) => c.as(s"k$i") }: _*)))
        .withColumn("__ts_ms", tsMs)
        .withColumn("__ord", ord.cast("long"))
      val schema = keyed.schema
      val (ki, ti) = (schema.fieldIndex("__key"), schema.fieldIndex("__ts_ms"))
      import org.apache.spark.sql.Row
      val scanned = keyed
        .repartition(col("__key"))
        .sortWithinPartitions(col("__key"), col("__ts_ms").asc_nulls_first,
          col("__ord"))
        .mapPartitions { it =>
          var curKey: String = null
          var lastKept: Option[Long] = None
          it.filter { r: Row =>
            val k = r.getString(ki)
            if (k != curKey) { curKey = k; lastKept = None }
            val t = if (r.isNullAt(ti)) None else Some(r.getLong(ti))
            val keep = lastKept match {
              case None => true
              case Some(lk) => t.exists(_ - lk >= maxAgeMs)
            }
            if (keep) lastKept = t.orElse(Some(Long.MaxValue))
            keep
          }
        }(org.apache.spark.sql.Encoders.row(schema))
      scanned.drop("__key", "__ts_ms", "__ord")
    }
  }

}
