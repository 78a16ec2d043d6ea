package graft.config

import scala.collection.immutable.ListMap
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import Toml._
import Topology.SeqCol
import VrlCompile._

/** One-shot VRL evaluation: JSON events in, transformed events out —
  * the batch-scoped analog of the reference's `vector vrl` REPL verb
  * (src/cli.rs:348, which delegates to the VRL crate's CLI with the
  * full stdlib loaded). The program compiles ONCE into Catalyst
  * columns — the same remap kernel the topology front-end uses — and
  * all events evaluate as a single Spark job, so a paste-sized check
  * here exercises exactly the plan a production topology would run.
  */
object VrlRunner {

  private val mapper = new ObjectMapper()

  /** Evaluate `program` over one JSON object per input line; returns
    * the primary-output events as JSON lines in input order, plus the
    * dropped-channel events (error/abort reroutes) separately.
    */
  def eval(spark: SparkSession, program: String, lines: Seq[String],
           opts: RemapOpts = RemapOpts()): (Seq[String], Seq[String]) =
    evalAst(spark, VrlAst.parse(program), lines, opts)

  /** Same as `eval` but over a pre-parsed (possibly rewritten) AST —
    * the cue-example corpus harness appends a result-capture statement
    * before evaluating (CueCorpus).
    */
  def evalAst(spark: SparkSession, ast: VrlAst.Program, lines: Seq[String],
              opts: RemapOpts = RemapOpts(),
              tables: Map[String, EnrichTableData] = Map.empty,
              secrets: Map[String, org.apache.spark.sql.Column] = Map.empty)
      : (Seq[String], Seq[String]) = {
    val nonEmpty = lines.zipWithIndex.filter(_._1.trim.nonEmpty)
    require(nonEmpty.nonEmpty, "no input events")
    val frames = nonEmpty.map { case (line, i) =>
      val node =
        try mapper.readTree(line)
        catch { case e: Exception => throw new IllegalArgumentException(
          s"line ${i + 1}: ${e.getMessage}") }
      if (node == null || !node.isObject)
        throw new IllegalArgumentException(s"line ${i + 1}: expected a JSON object")
      jsonRow(spark, i.toLong, node)
    }
    val in = Topology.unionFrames(frames)
    val r = VrlCompile.remap(in.df, in.meta, ast, opts, Seq(SeqCol),
      tables = tables, secrets = secrets)
    (render(r.df, r.meta), r.dropped.map(d => render(d, in.meta)).getOrElse(Nil))
  }

  private def render(df: org.apache.spark.sql.DataFrame, meta: EventMeta): Seq[String] = {
    // a whole-event replacement with a DYNAMIC value (`. = parse_json!
    // (...)`) leaves fields empty and carries the event in the __root
    // column — render that value, not the (empty) field struct. The
    // array wrap-and-strip gives every root type (object, array,
    // scalar, null) its exact JSON form; to_json has no scalar overload
    if (meta.rootT.isDefined)
      return df.orderBy(col(SeqCol))
        .select(to_json(array(col("__root")),
          java.util.Map.of("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")).as("j"))
        .collect().toSeq.map { r =>
          val s = r.getString(0); s.substring(1, s.length - 1)
        }
    // VBytes renders as its (lossy) UTF-8 string form — VRL's display of
    // a byte-string — not to_json's base64-of-binary; timestamps render
    // at micro precision (Spark's storage precision; to_json's default
    // truncates to millis, losing real data for the comparator).
    val evCols = meta.types.toSeq.map {
      case (c, VrlCompile.VBytes) => col(s"`$c`").cast("string").as(c)
      // an empty object/tuple has no struct representation (its column
      // is the null literal) — render the {} / [] it denotes
      case (c, VrlCompile.VObj(f)) if f.isEmpty =>
        try_parse_json(lit("{}")).as(c)
      case (c, VrlCompile.VHet(ts)) if ts.isEmpty =>
        try_parse_json(lit("[]")).as(c)
      case (c, _) => col(s"`$c`")
    }
    df.orderBy(col(SeqCol))
      .select(to_json(struct(evCols: _*),
        java.util.Map.of("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")).as("j"))
      .collect().toSeq.map(_.getString(0))
  }

  /** One JSON object → a one-row typed frame (via the same TOML-value
    * literal mapping the unit-test harness uses). JSON nulls drop the
    * field — VRL reads a missing field as null, so semantics match.
    */
  private def jsonRow(spark: SparkSession, seq: Long, node: JsonNode): Frame = {
    val tab = toV(node).asInstanceOf[TTab]
    val fields = tab.entries.toSeq.map { case (n, v) =>
      n -> UnitTestHarness.typedLit(v) }
    val cols = lit(seq).as(SeqCol) +: fields.map { case (n, cv) => cv.col.as(n) }
    Frame(spark.range(1).select(cols: _*),
      EventMeta(ListMap(fields.map { case (n, cv) => n -> cv.t }: _*), None))
  }

  private def toV(n: JsonNode): V =
    if (n.isObject) {
      val t = TTab.empty
      n.fields().asScala.foreach { e =>
        if (!e.getValue.isNull) t.entries(e.getKey) = toV(e.getValue)
      }
      t
    }
    // a null ARRAY ELEMENT is a value (it keeps its index and counts
    // toward length); only null OBJECT FIELDS drop (missing ≡ null)
    else if (n.isArray) TArr(n.elements().asScala.map(e =>
      if (e.isNull) TNull else toV(e)).toVector)
    else if (n.isTextual) TStr(n.asText())
    else if (n.isBoolean) TBool(n.asBoolean())
    else if (n.isIntegralNumber && n.canConvertToLong) TInt(n.asLong())
    else if (n.isNumber) TFloat(n.asDouble())
    else TStr(n.asText())
}
