package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.classic.ClassicConversions._
import org.apache.spark.storage.StorageLevel

/** Cache registration that is idempotent across repeated operator
  * calls.
  *
  * graft operators persist the intermediate frames that feed both
  * sides of a self-join (TextDedup signatures, Similarity buckets, …).
  * Those operators are plain functions: every invocation rebuilds the
  * same logical plan, and a bare `.persist()` on a plan whose
  * canonicalized form is already registered makes `CacheManager` log
  * a "Asked to cache already cached data" warning per call — hundreds
  * of them across a bench/verify sweep, drowning real warnings. The
  * cache itself is fine (registration is deduplicated); only the
  * re-registration attempt is noise.
  *
  * `persistOnce` consults the session's `CacheManager` (a
  * `private[sql]` seam, hence this shim package — same pattern as the
  * expression shims next door) and only registers plans that are not
  * already cached. Behavior is otherwise identical to `.persist(level)`.
  */
object CacheOps {

  /** Register `df` at `level` unless its canonicalized plan is already
    * cached; returns `df` either way (downstream reads hit the cache
    * through plan substitution, exactly as with a direct persist).
    */
  def persistOnce[T](df: Dataset[T],
                     level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    val classic = df.queryExecution.sparkSession
    if (classic.sharedState.cacheManager.lookupCachedData(classic, df.queryExecution.normalized).isEmpty)
      df.persist(level)
    else df
  }

  /** Postfix form: `df.persistOnce()`. */
  implicit class PersistOnceOps[T](private val df: Dataset[T]) extends AnyVal {
    def persistOnce(level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] =
      CacheOps.persistOnce(df, level)
  }
}
