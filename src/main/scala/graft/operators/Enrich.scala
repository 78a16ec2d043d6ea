package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Enrichment-table lookup as a broadcast hash join.
  *
  * Reference: lib/enrichment/src/lib.rs:51-90 — `find_table_row` with
  * Equals / BetweenDates / FromDate / ToDate conditions (all ANDed),
  * exactly-one-match semantics (errors on 0 or >1 matches, lib.rs:53-56),
  * optional case-insensitive compare (enrichment_tables/file.rs:306-332)
  * and a pre-built hash index (lib.rs:78-83).
  *
  * Spark-first: the hash index IS the broadcast hash join; projection
  * pushdown (`select` arg) is Catalyst column pruning. The one semantic
  * Spark doesn't give us — exactly-one-match — is enforced eagerly at
  * table load (`validateUnique`): a duplicate-key lookup table fails fast
  * instead of silently exploding rows, which is the property that makes a
  * left join semantics-equivalent to the reference's lookup.
  */
object Enrich {

  /** Fail fast if `keys` are not unique in the lookup table. Cheap: runs
    * on the (small, broadcastable) lookup side only.
    */
  def validateUnique(lookup: DataFrame, keys: Seq[String]): DataFrame = {
    val dup = lookup.groupBy(keys.map(col): _*).count().filter(col("count") > 1)
    val d = dup.limit(1).collect()
    require(d.isEmpty,
      s"enrichment table key ${keys.mkString("(", ",", ")")} not unique: ${d.mkString}")
    lookup
  }

  /** Equi-key lookup join. `caseInsensitive` folds string keys to lower
    * case on both sides (reference Case::Insensitive).
    */
  def lookup(
      events: DataFrame,
      table: DataFrame,
      keys: Seq[String],
      caseInsensitive: Boolean = false): DataFrame = {
    val t = validateUnique(table, keys)
    if (!caseInsensitive) events.join(broadcast(t), keys, "left")
    else {
      val fold = (df: DataFrame) => keys.foldLeft(df)((d, k) =>
        d.withColumn(s"__k_$k", lower(col(k))))
      val le = fold(events)
      val lt = fold(t).drop(keys: _*)
      val cond = keys.map(k => le(s"__k_$k") === lt(s"__k_$k")).reduce(_ && _)
      le.join(broadcast(lt), cond, "left")
        .drop(keys.map(k => s"__k_$k"): _*)
    }
  }

  /** Lookup with an additional date-range condition: equi keys AND
    * ts BETWEEN validFrom AND validTo (inclusive — reference
    * Condition::BetweenDates, lib/enrichment/src/lib.rs:25-31). The small
    * side is broadcast, so the range predicate rides the hash join as a
    * post-probe filter — no shuffle, no cartesian blow-up at scale.
    */
  def lookupBetween(
      events: DataFrame,
      table: DataFrame,
      keys: Seq[String],
      ts: Column,
      validFrom: String,
      validTo: String): DataFrame = {
    val t = broadcast(table)
    val cond = keys.map(k => events(k) === t(k)).reduce(_ && _) &&
      ts >= t(validFrom) && ts <= t(validTo)
    keys.foldLeft(events.join(t, cond, "left"))((d, k) => d.drop(t(k)))
      .drop(t(validFrom)).drop(t(validTo))
  }
}
