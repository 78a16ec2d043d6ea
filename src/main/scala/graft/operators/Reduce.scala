package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Vector `reduce` transform: stateful group-merge with per-field merge
  * strategies.
  *
  * Reference: src/transforms/reduce/transform.rs:264-310 (grouping by
  * `group_by` discriminant) + merge_strategy.rs:17-55 — strategies:
  * Discard (first), Retain (last), Sum, Max, Min, Array, Concat (space),
  * ConcatNewline, ConcatRaw, ShortestArray, LongestArray, FlatUnique.
  *
  * Batch semantics: a session that ends on `ends_when` / `max_events`
  * becomes a sub-group cut computed with a running flag over the ordered
  * group (see `sessionIds`); pure strategies map to built-in aggregates
  * — all partial-aggregation (map-side combine) friendly except the
  * ordered concats, which sort tiny per-group arrays post-agg rather
  * than sorting the whole relation.
  */
object Reduce {

  /** Merge strategies over a value column within groups. Ordered
    * strategies take the value ordered by `ord` (a sortable column,
    * unique within group for determinism).
    */
  object Strategy {
    /** first value in order — reference Discard */
    def discard(v: Column, ord: Column): Column = min_by(v, ord)
    /** last value in order — reference Retain */
    def retain(v: Column, ord: Column): Column = max_by(v, ord)
    def sumS(v: Column): Column = sum(v)
    def maxS(v: Column): Column = max(v)
    def minS(v: Column): Column = min(v)
    /** all values, in order — reference Array. The sort comparator
      * reads ONLY the order key: the default struct comparator would
      * also compare `v`, which fails analysis for un-orderable value
      * types (VARIANT — e.g. a reduce field whose inputs mix types).
      * `ord` is unique within the group, so o-only ordering is total.
      */
    def array(v: Column, ord: Column): Column =
      transform(
        array_sort(
          collect_list(struct(ord.as("o"), v.as("v"))),
          (l, r) => when(l.getField("o") < r.getField("o"), -1)
            .when(l.getField("o") > r.getField("o"), 1)
            .otherwise(0)),
        x => x.getField("v"))
    def concat(v: Column, ord: Column): Column =
      array_join(array(v, ord), " ")
    def concatNewline(v: Column, ord: Column): Column =
      array_join(array(v, ord), "\n")
    def concatRaw(v: Column, ord: Column, sep: String): Column =
      array_join(array(v, ord), sep)
    /** distinct SCALAR values — the scalar arm of reference FlatUnique;
      * sorted for determinism. Array-typed fields must go through
      * [[flatUniqueArray]] (collect_set over arrays would yield distinct
      * ARRAYS, not distinct elements). */
    def flatUnique(v: Column): Column = array_sort(collect_set(v))
    /** distinct elements across array values — the array arm of
      * reference FlatUnique (deeper nesting pre-flattened by the
      * caller); sorted for determinism. */
    def flatUniqueArray(v: Column): Column =
      array_sort(array_distinct(flatten(collect_list(v))))
    def shortestArray(v: Column): Column = ShortestLongest.shortest(v)
    def longestArray(v: Column): Column = ShortestLongest.longest(v)
  }

  /** Session cut ids per group: a new session starts at the first row
    * and after every row matching `endsWhen` (reference ends_when closes
    * the CURRENT session including the matching row,
    * reduce/transform.rs:223) or when `maxEvents` is reached.
    * `startsWhen` (reduce/config.rs:102-106) cuts BEFORE the matching
    * row: the previous session flushes WITHOUT it and the matching row
    * opens the next session. Returns df + `session_id` column
    * (0-based and consecutive per group without `startsWhen`; with it,
    * ids stay distinct-and-monotone but may skip when an end cut and a
    * start cut coincide — grouping semantics are unaffected).
    */
  def sessionIds(
      df: DataFrame,
      groupBy: Seq[Column],
      ord: Column,
      endsWhen: Option[Column],
      maxEvents: Option[Int],
      startsWhen: Option[Column] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupBy: _*).orderBy(ord)
    val endFlag = endsWhen.map(c => when(c, 1).otherwise(0)).getOrElse(lit(0))
    val startFlag = startsWhen.map(c => when(c, 1).otherwise(0)).getOrElse(lit(0))
    // session = count of ends strictly BEFORE this row (the ending row
    // belongs to the session it closes) + count of starts AT or before
    // it (a starting row belongs to the session it opens)
    val prevEnds = coalesce(
      sum(endFlag).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0))
    val inclStarts = coalesce(
      sum(startFlag).over(w.rowsBetween(Window.unboundedPreceding, 0)), lit(0))
    val base = df.withColumn("__ends_before", prevEnds + inclStarts)
    maxEvents match {
      case None => base.withColumn("session_id", col("__ends_before")).drop("__ends_before")
      case Some(m) =>
        // within each ends_when-session, cut every m rows
        val w2 = Window.partitionBy(groupBy :+ col("__ends_before"): _*).orderBy(ord)
        base.withColumn("session_id",
            concat_ws(":", col("__ends_before"),
              floor((row_number().over(w2) - 1) / m)))
          .drop("__ends_before")
    }
  }

  /** Typed Aggregators for Shortest/LongestArray — no built-in exists
    * (min_by on array length with deterministic tie-break on content).
    */
  object ShortestLongest {
    private val seqEnc: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
    private def agg(pickShort: Boolean) =
      new Aggregator[Seq[String], Seq[String], Seq[String]] {
        def zero: Seq[String] = null
        private def cmp(a: Seq[String], b: Seq[String]): Int = {
          val c = a.length.compareTo(b.length)
          if (c != 0) c
          else scala.math.Ordering.Implicits
            .seqOrdering[Seq, String](scala.math.Ordering.String).compare(a, b)
        }
        private def better(a: Seq[String], b: Seq[String]): Seq[String] =
          if (a == null) b else if (b == null) a
          else if (pickShort == (cmp(a, b) <= 0)) a else b
        def reduce(buf: Seq[String], in: Seq[String]): Seq[String] = better(buf, in)
        def merge(a: Seq[String], b: Seq[String]): Seq[String] = better(a, b)
        def finish(r: Seq[String]): Seq[String] = r
        def bufferEncoder: Encoder[Seq[String]] = seqEnc
        def outputEncoder: Encoder[Seq[String]] = seqEnc
      }
    def shortest(v: Column): Column = udaf(agg(pickShort = true), seqEnc).apply(v)
    def longest(v: Column): Column = udaf(agg(pickShort = false), seqEnc).apply(v)
  }
}
