package graft.config

import scala.collection.immutable.ListMap
import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Toml._
import VrlAst.VrlUnsupported
import VrlCompile._

/** Result of one `[[tests]]` entry: `errors` empty = pass; `skipped`
  * set = the test exercises a VRL feature outside the supported subset
  * (reported, not failed — the documented-skip contract).
  */
final case class TestResult(name: String, errors: Seq[String],
                            skipped: Option[String] = None) {
  def passed: Boolean = errors.isEmpty && skipped.isEmpty
}

/** The `vector test` harness re-expressed over Spark: builds the input
  * events each `[[tests.inputs]]` block declares (insert_at + raw /
  * log_fields / vrl / metric forms), pushes them through the config
  * topology,
  * and checks every `[[tests.outputs]]` block's conditions plus
  * `no_outputs_from` — an output check passes when EACH of its
  * conditions is satisfied by at least one event from the
  * extract_from target (conditions are checked independently; no
  * single event needs to satisfy them all), matching the reference
  * sink's per-condition clear-on-first-match loop
  * (src/config/unit_test/unit_test_components.rs:214-227; test schema
  * src/config/mod.rs:407-425, 550-599).
  */
object UnitTestHarness {

  import Topology.SeqCol

  /** Deterministic base for the default `timestamp` field the reference
    * stamps on synthesized log events; successive inputs get successive
    * seconds so timestamp windows are observable.
    */
  private val BaseEpoch = 1600000000L

  def runFile(spark: SparkSession, path: String): Seq[TestResult] =
    run(spark, Topology.loadFile(path))

  def run(spark: SparkSession, topo: Topology): Seq[TestResult] =
    topo.testDefs.map(t => runOne(spark, topo, t))

  def runOne(spark: SparkSession, topo: Topology, test: TTab): TestResult = {
    val name = test.str("name").getOrElse("<unnamed>")
    try {
      val inputs: Seq[TTab] = test.tab("input").toSeq ++ test.tabs("inputs")
      if (inputs.isEmpty) return TestResult(name, Seq("test has no inputs"))

      val bySite = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[(Long, TTab)]]
      inputs.zipWithIndex.foreach { case (in, i) =>
        val at = in.str("insert_at").getOrElse(
          return TestResult(name, Seq(s"input $i has no insert_at")))
        bySite.getOrElseUpdate(at, mutable.ArrayBuffer.empty) += ((i.toLong, in))
      }
      val injected = bySite.map { case (at, evs) =>
        at -> buildFrame(spark, evs.toSeq)
      }.toMap

      val outputs = topo.run(injected)
      val errors = mutable.ArrayBuffer.empty[String]

      test.tabs("outputs").zipWithIndex.foreach { case (out, ci) =>
        val ids: Seq[String] = out.get("extract_from") match {
          case Some(TStr(s)) => Seq(s)
          case Some(TArr(xs)) => xs.collect { case TStr(s) => s }
          case _ => Seq.empty
        }
        if (ids.isEmpty) errors += s"check[$ci]: no extract_from"
        else {
          // AnyCondition is untagged in the reference (conditions/
          // mod.rs:185-207): a bare string is VRL shorthand, a table
          // carries an explicit type — accept both forms in one array;
          // anything else fails THIS test loudly (the reference's
          // deserializer rejects such values, never skips them)
          val conds: Seq[V] = out.get("conditions") match {
            case Some(TArr(xs)) => xs.map {
              case s: TStr => s
              case t: TTab => t
              case other => throw new IllegalArgumentException(
                s"check[$ci]: condition must be a string or a table, got $other")
            }
            case _ => Seq.empty
          }
          val frames = ids.flatMap(outputs.get).filterNot(_.isEmpty)
          if (frames.isEmpty)
            errors += s"check[$ci] for ${ids.mkString(",")}: no events received"
          else if (conds.nonEmpty) {
            // reference semantics: EACH condition must be satisfied by at
            // least one received event (unit_test_components.rs:214-227)
            val satisfied = Array.fill(conds.length)(false)
            frames.foreach { frame =>
              val flags = frame.df.agg(
                count(lit(1)).as("__n"),
                conds.zipWithIndex.map { case (c, i) =>
                  max(when(Conditions.compile(Some(c), frame), 1).otherwise(0)).as(s"__c$i")
                }: _*).collect()(0)
              conds.indices.foreach { i =>
                if (flags.getInt(i + 1) == 1) satisfied(i) = true
              }
            }
            conds.indices.foreach { i =>
              if (!satisfied(i))
                errors += s"check[$ci] condition[$i] for ${ids.mkString(",")}: no event matched"
            }
          }
        }
      }

      test.strArr("no_outputs_from").foreach { id =>
        if (outputs.get(id).exists(f => !f.isEmpty))
          errors += s"expected no events from $id"
      }

      TestResult(name, errors.toSeq)
    } catch {
      case VrlUnsupported(f) => TestResult(name, Nil, Some(f))
      // any other per-test failure (VRL syntax error, bad config shape,
      // analysis error) fails THAT test and lets the rest of the file
      // run — `vector test` reports per-test errors, it doesn't abort
      // the harness
      case scala.util.control.NonFatal(e) =>
        TestResult(name, Seq(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
    }
  }

  // --------------------------------------------------- input building
  /** One insert site's events, in arrival order, as a typed Frame. */
  private[graft] def buildFrame(spark: SparkSession, evs: Seq[(Long, TTab)]): Frame = {
    val frames = evs.map { case (seq, in) =>
      in.str("type").getOrElse(if (in.get("source").isDefined) "vrl" else "raw") match {
        case "vrl" =>
          val src = in.str("source").getOrElse(
            throw new IllegalArgumentException("vrl input without source"))
          val empty = Frame(
            spark.range(1).select(lit(seq).as(SeqCol)),
            EventMeta(ListMap.empty, None))
          val r = VrlCompile.remap(empty.df, empty.meta, VrlAst.parse(src),
            RemapOpts(), Seq(SeqCol), wrapScalar = false)
          withDefaultTimestamp(Frame(r.df, r.meta), seq)
        case "raw" | "log" =>
          val tree: TTab = in.str("value") match {
            case Some(v) =>
              val t = TTab.empty; t.entries("message") = TStr(v); t
            case None =>
              nestDotted(in.tab("log_fields").getOrElse(TTab.empty))
          }
          withDefaultTimestamp(oneRow(spark, seq, tree), seq)
        case "metric" =>
          val m = in.tab("metric").getOrElse(throw new IllegalArgumentException(
            "input type 'metric' requires the field 'metric'"))
          metricRow(spark, seq, m)
        case other => throw VrlUnsupported(s"test input type $other")
      }
    }
    Topology.unionFrames(frames)
  }

  /** `type = "metric"` input (reference TestInput.metric,
    * src/config/mod.rs:576-579, built at unit_test/mod.rs:656): one
    * metric event in the flat-model shape ([[Topology.MetricMeta]]), so
    * tests can insert directly at metric-side transforms (aggregate,
    * tag_cardinality_limit, metric_to_log, incremental_to_absolute)
    * without a synthetic log_to_metric upstream. `counter`/`gauge` arms
    * carry a scalar `value`; the collection-valued arms (set members,
    * distribution samples, histogram/summary/sketch) have no flat-model
    * literal and report as documented skips. Tags canonicalize to the
    * sorted `k=v,k=v` string, same as the metric operators; the
    * absent-tags metric keeps a null tags column (reference
    * `tags: Option::None`).
    */
  private def metricRow(spark: SparkSession, seq: Long, m: TTab): Frame = {
    val name = m.str("name").getOrElse(
      throw new IllegalArgumentException("metric input without name"))
    val kind = m.str("kind").getOrElse(
      throw new IllegalArgumentException("metric input without kind"))
    if (kind != "incremental" && kind != "absolute")
      throw new IllegalArgumentException(
        s"metric kind $kind (absolute|incremental)")
    Seq("set", "distribution", "aggregated_histogram", "aggregated_summary",
        "sketch").foreach { a =>
      if (m.get(a).isDefined) throw VrlUnsupported(
        s"metric test input $a arm (collection values have no flat-model literal)")
    }
    val (vt, vTab) = Seq("counter", "gauge").flatMap(a => m.tab(a).map(a -> _)) match {
      case Seq(one) => one
      case _ => throw new IllegalArgumentException(
        "metric input needs exactly one of [metric.counter] / [metric.gauge]")
    }
    val value: Double = vTab.get("value") match {
      case Some(TFloat(d)) => d
      case Some(TInt(n)) => n.toDouble
      case _ => throw new IllegalArgumentException(
        s"metric $vt without a numeric value")
    }
    // canonical order sorts by KEY (the metric operators rebuild tags
    // via sort_array(map_entries(...)), key-first): sorting the joined
    // "k=v" strings would diverge when one key prefixes another
    // ("a-b=y" < "a=x" since '-' < '=')
    val tags: Option[String] = m.tab("tags").map(_.entries.toSeq.map {
      case (k, TStr(v)) => k -> v
      case (k, _) => throw new IllegalArgumentException(
        s"metric tag $k must be a string")
    }.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(","))
    val ts: Column = m.str("timestamp")
      .map(t => to_timestamp(lit(t)))
      .getOrElse(timestamp_seconds(lit(BaseEpoch + seq)))
    val df = spark.range(1).select(
      lit(seq).as(SeqCol),
      lit(name).as("name"),
      m.str("namespace").map(lit(_)).getOrElse(lit(null)).cast("string").as("namespace"),
      tags.map(lit(_)).getOrElse(lit(null)).cast("string").as("tags"),
      lit(kind).as("kind"),
      lit(vt).as("value_type"),
      lit(value).cast("double").as("value"),
      ts.as("ts"))
    Frame(df, Topology.MetricMeta, metric = true)
  }

  private def withDefaultTimestamp(f: Frame, seq: Long): Frame =
    if (f.meta.types.contains("timestamp") || f.meta.rootT.isDefined) f
    else Frame(
      f.df.withColumn("timestamp", timestamp_seconds(lit(BaseEpoch + seq))),
      EventMeta(f.meta.types + ("timestamp" -> VTime), None))

  /** Vector log_fields keys are event PATHS: `"a.b.c" = 1` nests,
    * `"arr[0]" = "x"` builds arrays (missing indices pad with null),
    * and `"a.\"b.c\"" = 1` quotes a segment whose NAME contains a dot
    * (reference path grammar — tests/behavior/transforms/reduce.toml
    * concat_array, remap.toml remap_quoted_path).
    */
  private[config] def nestDotted(flat: TTab): TTab = {
    val out = TTab.empty
    flat.entries.foreach { case (k, v) =>
      val leaf = v match {
        case tt: TTab => nestDotted(tt)
        case other => other
      }
      setPath(out, parseFieldPath(k), leaf, k)
    }
    out
  }

  /** `a."b.c"[0].d` → Left(a), Left(b.c), Right(0), Left(d). */
  private[config] def parseFieldPath(key: String): List[Either[String, Int]] = {
    def fail(msg: String) = throw new IllegalArgumentException(
      s"log_fields path '$key': $msg")
    val segs = List.newBuilder[Either[String, Int]]
    var i = 0
    while (i < key.length) {
      key(i) match {
        case '.' => i += 1
        case '"' =>
          val sb = new StringBuilder
          i += 1
          while (i < key.length && key(i) != '"') {
            if (key(i) == '\\' && i + 1 < key.length) { sb += key(i + 1); i += 2 }
            else { sb += key(i); i += 1 }
          }
          if (i >= key.length) fail("unterminated quoted segment")
          i += 1
          segs += Left(sb.result())
        case '[' =>
          val j = key.indexOf(']', i)
          if (j < 0) fail("unterminated index")
          val n = key.substring(i + 1, j)
          if (n.isEmpty || !n.forall(_.isDigit)) fail(s"bad index [$n]")
          segs += Right(n.toInt)
          i = j + 1
        case _ =>
          val start = i
          while (i < key.length && key(i) != '.' && key(i) != '[') i += 1
          segs += Left(key.substring(start, i))
      }
    }
    val out = segs.result()
    if (out.isEmpty) fail("empty path")
    out
  }

  /** Set `v` at `segs` under `root`, creating tables/arrays on the way;
    * a name/index conflict with an existing value fails loudly.
    */
  private def setPath(root: TTab, segs: List[Either[String, Int]], v: V,
                      key: String): Unit = {
    def fail(msg: String) = throw new IllegalArgumentException(
      s"log_fields path '$key': $msg")
    def set(cur: Option[V], rest: List[Either[String, Int]]): V = rest match {
      case Nil => cur match {
        case None | Some(TNull) => v
        case Some(_) => fail("duplicate leaf")
      }
      case Left(n) :: tail =>
        val t = cur match {
          case None => TTab.empty
          case Some(tt: TTab) => tt
          case Some(_) => fail(s"segment $n conflicts with a non-object value")
        }
        t.entries(n) = set(t.entries.get(n), tail)
        t
      case Right(ix) :: tail =>
        val items = cur match {
          case None => Vector.empty[V]
          case Some(TArr(xs)) => xs
          case Some(_) => fail(s"index [$ix] conflicts with a non-array value")
        }
        val padded = items.padTo(ix + 1, TNull: V)
        TArr(padded.updated(ix,
          set(Some(padded(ix)).filterNot(_ == TNull), tail)))
    }
    segs match {
      case Left(n) :: tail => root.entries(n) = set(root.entries.get(n), tail)
      case _ => fail("path must start with a field name")
    }
  }

  private def oneRow(spark: SparkSession, seq: Long, tree: TTab): Frame = {
    val fields = tree.entries.toSeq.map { case (n, v) => n -> typedLit(v) }
    val cols = lit(seq).as(SeqCol) +: fields.map { case (n, cv) => cv.col.as(n) }
    Frame(spark.range(1).select(cols: _*),
      EventMeta(ListMap(fields.map { case (n, cv) => n -> cv.t }: _*), None))
  }

  /** TOML value → typed literal column (ints are VRL integers, inline
    * tables nest to structs, arrays stay typed when homogeneous).
    */
  private[config] def typedLit(v: V): CV = v match {
    case TNull => CV(lit(null).cast("string"), VNullT)
    case TStr(s) => CV(lit(s), VStr)
    case TInt(n) => CV(lit(n), VInt)
    case TFloat(d) => CV(lit(d), VFloat)
    case TBool(b) => CV(lit(b), VBool)
    case t: TTab =>
      val fields = t.entries.toSeq.map { case (n, fv) => n -> typedLit(fv) }
      CV(struct(fields.map { case (n, cv) => cv.col.as(n) }: _*),
        VObj(ListMap(fields.map { case (n, cv) => n -> cv.t }: _*)))
    case TArr(items) =>
      val cvs = items.map(typedLit)
      val nonNull = cvs.map(_.t).filterNot(_ == VNullT).distinct
      val scalar = Set[VT](VStr, VInt, VFloat, VBool)
      if (nonNull.size <= 1 && nonNull.headOption.forall(scalar)) {
        // a null ELEMENT is a VALUE inside a VRL array (it keeps its
        // index and counts toward length) — type it to the element
        // type rather than dropping it
        val elemT = nonNull.headOption.getOrElse(VStr)
        CV(array(cvs.map(cv =>
          if (cv.t == VNullT) lit(null).cast(Topology.toSpark(elemT)) else cv.col): _*),
          VArrOf(elemT))
      } else
        CV(struct(cvs.zipWithIndex.map { case (cv, i) => cv.col.as(s"_$i") }: _*),
          VHet(cvs.map(_.t)))
  }
}
