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
    if (!caseInsensitive)
      events.join(broadcast(validateUnique(table, keys)), keys, "left")
    else {
      val fold = (df: DataFrame) => keys.foldLeft(df)((d, k) =>
        d.withColumn(s"__k_$k", lower(col(k))))
      // uniqueness must be checked on the FOLDED keys: 'ABC' and 'abc'
      // are distinct raw keys but collide after lower(), and a probe
      // would silently match (and duplicate the event on) both rows
      val lt = validateUnique(fold(table), keys.map(k => s"__k_$k"))
        .drop(keys: _*)
      val le = fold(events)
      val cond = keys.map(k => le(s"__k_$k") === lt(s"__k_$k")).reduce(_ && _)
      le.join(broadcast(lt), cond, "left")
        .drop(keys.map(k => s"__k_$k"): _*)
    }
  }

  /** Equi-key lookup with a wildcard fallback row (reference
    * src/enrichment_tables/file.rs:337-346 and the indexed path at
    * :499-523): probe the exact key first; if no row matches, probe
    * once more with EVERY key replaced by the wildcard value. (Per-key
    * partial wildcard matches exist only on the reference's un-indexed
    * sequential scan; the indexed path — and this operator — is the
    * two-level exact-then-all-wildcard fallback.)
    *
    * Shape: one broadcast hash join for the exact probe plus one
    * broadcast join against the <=1-row wildcard slice (the constant
    * join key folds away, so Catalyst plans it as a
    * BroadcastNestedLoopJoin — against a <=1-row broadcast side that
    * is constant work per event row, the degenerate case PlanAudit
    * flags for review and this doc explicitly allows), then a per-row
    * hit flag decides which side supplies ALL
    * enrich columns — a NULL inside a matched row is NOT back-filled
    * column-wise from the wildcard row, because the reference's
    * fallback is per-row, not per-column. No shuffle at any scale.
    */
  def lookupWithWildcard(
      events: DataFrame,
      table: DataFrame,
      keys: Seq[String],
      wildcard: String): DataFrame = {
    val t = validateUnique(table, keys)
    val enrichCols = t.columns.filterNot(keys.contains).toSeq
    val exact = events.join(
      broadcast(t.withColumn("__hit", lit(true))), keys, "left")
    val wcRow = t.filter(keys.map(col(_) === lit(wildcard)).reduce(_ && _))
      .select(enrichCols.map(c => col(c).as(s"__wc_$c")): _*)
      .withColumn("__one", lit(1))
    val joined = exact.withColumn("__one", lit(1))
      .join(broadcast(wcRow), Seq("__one"), "left")
    enrichCols.foldLeft(joined) { (d, c) =>
      d.withColumn(c,
          when(col("__hit"), col(c)).otherwise(col(s"__wc_$c")))
        .drop(s"__wc_$c")
    }.drop("__hit", "__one")
  }

  /** GeoIP-style CIDR enrichment (reference
    * src/enrichment_tables/geoip.rs, mmdb.rs — broadcast MMDB +
    * per-event network lookup). No MMDB reader exists in this sandbox,
    * so the table is plain (cidr, attrs...) rows — semantically an
    * exported MMDB. Like MaxMind exports, networks are DISJOINT by
    * contract, so a range hit is unique (exactly-one-match for free).
    *
    * Scale shape: the naive `aton(ip) BETWEEN start AND end` join is a
    * BroadcastNestedLoopJoin — O(|events|·|table|) comparisons per
    * event batch. Instead every CIDR explodes into the /`bucketBits`
    * prefixes it covers (table side only — small, and a /8 still only
    * makes 2^8 rows at the default /16 bucket) and each event computes
    * its own prefix: the join becomes an EQUI broadcast hash join (O(1)
    * probe per event) with the range check as a post-probe filter.
    */
  def lookupCidr(
      events: DataFrame,
      ip: Column,
      table: DataFrame,
      cidrCol: String = "cidr",
      bucketBits: Int = 16): DataFrame = {
    import graft.functions.Vrl
    val shift = 1L << (32 - bucketBits)
    // try_element_at/try_cast + the 0..32 prefix gate (the ipCidrContains
    // pattern): a malformed table row — no "/", garbage or out-of-range
    // prefix — degrades to null __start/__end, and explode(sequence(null,
    // null)) drops it, instead of an ANSI-mode job abort or a
    // 2^(32-plen) sequence bomb from a bogus prefix
    val parts = split(col(cidrCol), "/")
    val net = Vrl.ipAton(try_element_at(parts, lit(1)))
    val plenRaw = try_element_at(parts, lit(2)).try_cast("int")
    val plen = when(plenRaw.between(0, 32), plenRaw)
    val size = pow(lit(2.0), lit(32) - plen).cast("long")
    val t = table
      .withColumn("__start", floor(net / size).cast("long") * size)
      .withColumn("__end", col("__start") + size - 1)
      .withColumn("__bkt", explode(sequence(
        floor(col("__start") / shift).cast("long"),
        floor(col("__end") / shift).cast("long"))))
    val e = events.withColumn("__aton", Vrl.ipAton(ip))
      .withColumn("__bkt", floor(col("__aton") / shift).cast("long"))
    e.join(broadcast(t),
        e("__bkt") === t("__bkt") &&
          col("__aton") >= col("__start") && col("__aton") <= col("__end"),
        "left")
      .drop(t("__bkt"))
      .drop("__aton", "__bkt", "__start", "__end")
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
    // the exactly-one-match contract every other variant enforces via
    // validateUnique: for ranges, per-key intervals must not overlap, or
    // an event in the overlap joins (and duplicates into) BOTH rows.
    // Cheap — sort-check on the small lookup side only.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col(validFrom))
    val bad = table
      .withColumn("__prev_end", lag(col(validTo), 1).over(w))
      .filter(col("__prev_end").isNotNull && col(validFrom) <= col("__prev_end"))
      .limit(1).collect()
    require(bad.isEmpty,
      s"enrichment table ranges overlap on ${keys.mkString("(", ",", ")")}: ${bad.mkString}")
    val t = broadcast(table)
    val cond = keys.map(k => events(k) === t(k)).reduce(_ && _) &&
      ts >= t(validFrom) && ts <= t(validTo)
    keys.foldLeft(events.join(t, cond, "left"))((d, k) => d.drop(t(k)))
      .drop(t(validFrom)).drop(t(validTo))
  }
}
