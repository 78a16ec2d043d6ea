package graft.config

import scala.collection.immutable.ListMap

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{JsonNodeFactory, ObjectNode}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.lua.{LuaAst, LuaEventBridge}
import graft.lua.LuaInterp
import graft.lua.LuaInterp.{LV, LNil, LBool, LInt, LNum, LStr, LTable, LFn, LClosure, LUserData, LuaError, VM, toDisplay}
import Topology.SeqCol
import VrlCompile._

/** The `lua` transform from config — the reference's generic-scripting
  * escape hatch (src/transforms/lua/mod.rs: untagged v1/v2 config;
  * v1/mod.rs: a per-event `source` chunk over a path-keyed `event`
  * global; v2/mod.rs: `source` + `hooks.init/process/shutdown` with an
  * `emit` callback), executed on the from-scratch [[graft.lua]] VM.
  *
  * Execution model: one VM per PARTITION (`mapPartitions`), the
  * distributed analog of the reference's one-`mlua::Lua`-per-transform
  * worker — `init` runs before the partition's first event, `process`
  * per event in `__seq` order, `shutdown` after its last (so state
  * scope and flush semantics match the library Script harness,
  * operators/Script.scala, which the reference row already maps to).
  * Lifecycle is therefore per-partition, not per-stream: a shutdown
  * hook that emits a summary event emits one PER PARTITION — documented
  * divergence, and exactly what a multi-worker Vector deployment does
  * per worker.
  *
  * Events cross the JVM/VM boundary as Jackson trees with the
  * [[LuaEventBridge]] conventions (v2 `{log = …}`/`{metric = …}`
  * tables, v1 path-keyed userdata, timestamps as `os.date("!*t")`
  * tables). Emitted events re-enter Spark through schema inference
  * over the emitted JSON — the analog of the reference resetting the
  * schema definition to `Definition::default` after a lua transform
  * (v1/mod.rs:60-73: "Lua causes the type definition to be reset").
  *
  * Not supported (refused at load, never silently ignored): `timers`
  * (no periodic wall-clock in batch execution; the streaming analog is
  * the Script-harness flush), `search_dirs`/`require` (no module
  * loading in a distributed task), and mixed log+metric emission from
  * one transform (the config engine's frames are single-typed).
  */
object LuaTransform {

  private val IsoFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  final case class LuaCfg(version: Int, source: Option[String],
                          hookInit: Option[String], hookProcess: Option[String],
                          hookShutdown: Option[String])

  def parseCfg(name: String, cfg: Toml.TTab): LuaCfg = {
    if (cfg.tabs("timers").nonEmpty || cfg.tab("timers").nonEmpty)
      throw VrlAst.VrlUnsupported(s"lua $name: timers (batch execution has no periodic clock)")
    if (cfg.strArr("search_dirs").nonEmpty)
      throw VrlAst.VrlUnsupported(s"lua $name: search_dirs/require (no module loading in tasks)")
    val hooks = cfg.tab("hooks")
    val version = cfg.str("version") match {
      case Some("1") => 1
      case Some("2") => 2
      case Some(other) => throw new IllegalArgumentException(
        s"lua $name: version $other (1|2)")
      // untagged config: hooks present → v2, bare source → v1
      // (mod.rs LuaConfig untagged enum tries V1's shape first)
      case None => if (hooks.isDefined) 2 else 1
    }
    val c = LuaCfg(version, cfg.str("source"),
      hooks.flatMap(_.str("init")), hooks.flatMap(_.str("process")),
      hooks.flatMap(_.str("shutdown")))
    if (version == 1 && c.source.isEmpty)
      throw new IllegalArgumentException(s"lua $name: v1 requires source")
    if (version == 2 && c.hookProcess.isEmpty)
      throw new IllegalArgumentException(s"lua $name: v2 requires hooks.process")
    // fail fast on unparsable Lua at LOAD (the reference builds the VM
    // and evaluates the code at config build, surfacing InvalidLua)
    c.source.foreach(LuaAst.parse)
    if (version == 2)
      (c.hookInit.toSeq ++ c.hookProcess.toSeq ++ c.hookShutdown.toSeq)
        .foreach(h => LuaAst.parse("return " + h))
    c
  }

  // -------------------------------------------------- frame → JSON in
  /** Serialize event fields to one JSON object per row; top-level and
    * nested timestamps ride as `{"__graft_ts": iso}` wrappers so the
    * bridge can hand Lua real time-tables.
    */
  private def toJsonCol(df: DataFrame, meta: EventMeta): Column = {
    def wrap(c: Column, t: VT): Column = t match {
      case VTime => struct(date_format(c, IsoFmt).as(LuaEventBridge.TsKey))
      case VObj(fs) => when(c.isNotNull,
        struct(fs.map { case (n, ft) => wrap(c.getField(n), ft).as(n) }.toSeq: _*))
      case VHet(ts) => when(c.isNotNull,
        struct(ts.zipWithIndex.map { case (ft, i) =>
          wrap(c.getField(s"_$i"), ft).as(s"_$i") }: _*))
      case VArrOf(et) => transform(c, x => wrap(x, et))
      case VBytes => c.cast("string")
      case _ => c
    }
    val evCols = meta.types.toSeq.map {
      case (n, VObj(f)) if f.isEmpty => try_parse_json(lit("{}")).as(n)
      case (n, VHet(ts)) if ts.isEmpty => try_parse_json(lit("[]")).as(n)
      case (n, t) => wrap(df.col(s"`$n`"), t).as(n)
    }
    to_json(struct(evCols: _*), java.util.Map.of("timestampFormat", IsoFmt))
  }

  // ------------------------------------------------------ the runner
  /** Run the transform over a frame; returns the output frame. */
  def apply(name: String, cfg: Toml.TTab, in: Frame): Frame = {
    val c = parseCfg(name, cfg)
    if (c.version == 1 && in.metric)
      throw new IllegalArgumentException(
        s"lua $name: v1 accepts log events only (reference Input::log())")
    val spark = in.df.sparkSession
    import spark.implicits._

    val jsonIn: DataFrame = in.df.select(col(SeqCol).cast("long").as("s"),
      toJsonCol(in.df, in.meta).as("j"))
    val isMetricIn = in.metric
    val (version, source, hookI, hookP, hookS) =
      (c.version, c.source, c.hookInit, c.hookProcess, c.hookShutdown)

    // persisted (session-scoped, like the topology's fan-out persists):
    // the interpreter pass must run ONCE — the kind-split below and the
    // downstream consumers all read this frame, and schema inference
    // already forces a materialization
    val outRows = jsonIn.as[(Long, String)].mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else runPartition(it, version, source, hookI, hookP, hookS, isMetricIn)
    }.toDF("s", "k", "j").persist()

    val logRows = outRows.filter(col("k") === "L").select("s", "j")
    val metricRows = outRows.filter(col("k") === "M").select("s", "j")
    val (nLog, nMetric) = (logRows.count(), metricRows.count())
    if (nLog > 0 && nMetric > 0) throw new IllegalArgumentException(
      s"lua $name: emitted both log ($nLog) and metric ($nMetric) events — " +
        "single-typed output frames only; split into two lua transforms")
    if (nMetric > 0) metricFrame(metricRows)
    else if (nLog > 0) logFrame(logRows)
    else Frame(spark.range(0).select(col("id").as(SeqCol)),
      EventMeta(ListMap.empty, None), in.metric)
  }

  /** Rebuild a log frame: schema inference over the emitted JSON, then
    * timestamp-marker structs become real timestamp columns.
    */
  private def logFrame(rows: DataFrame): Frame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val inferred = spark.read.json(rows.as[(Long, String)].map { case (s, j) =>
      s"""{"$SeqCol":$s,"__e":$j}"""
    })
    val eType = inferred.schema.find(_.name == "__e").map(_.dataType)
    eType match {
      case Some(st: StructType) =>
        def fix(c: Column, dt: DataType): Column = dt match {
          case s: StructType if s.fields.length == 1 &&
              s.fields.head.name == LuaEventBridge.TsKey =>
            to_timestamp(c.getField(LuaEventBridge.TsKey), IsoFmt)
          case s: StructType =>
            when(c.isNotNull, struct(s.fields.toSeq.map(f =>
              fix(c.getField(f.name), f.dataType).as(f.name)): _*))
          case ArrayType(e, _) => transform(c, x => fix(x, e))
          case _ => c
        }
        val ev = st.fields.toSeq.map(f =>
          fix(col("__e").getField(f.name), f.dataType).as(f.name))
        val out = inferred.select(col(SeqCol) +: ev: _*)
        Frame(out, EventMeta.fromSchema(
          StructType(out.schema.fields.filterNot(_.name == SeqCol))))
      case _ =>
        Frame(inferred.select(col(SeqCol)), EventMeta(ListMap.empty, None))
    }
  }

  /** Rebuild a metric frame straight into the flat model — the emitted
    * metric JSON is bridge-shaped (fixed keys), no inference needed.
    */
  private def metricFrame(rows: DataFrame): Frame = {
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("namespace", StringType),
      StructField("tags", StringType), StructField("kind", StringType),
      StructField("value_type", StringType), StructField("value", DoubleType),
      StructField("ts", StringType)))
    val e = from_json(col("j"), schema)
    val out = rows.select(
      col("s").as(SeqCol),
      e.getField("name").as("name"), e.getField("namespace").as("namespace"),
      e.getField("tags").as("tags"), e.getField("kind").as("kind"),
      e.getField("value_type").as("value_type"), e.getField("value").as("value"),
      to_timestamp(e.getField("ts"), IsoFmt).as("ts"))
    Frame(out, Topology.MetricMeta, metric = true)
  }

  // ------------------------------------------------ per-partition VM
  /** Returns (seq, kind, json) rows. Errors in a hook drop that event
    * (reference: LuaScriptError → filtered out) and surface on stderr.
    */
  private def runPartition(it: Iterator[(Long, String)], version: Int,
                           source: Option[String], hookInit: Option[String],
                           hookProcess: Option[String], hookShutdown: Option[String],
                           metricIn: Boolean): Iterator[(Long, String, String)] = {
    val mapper = new ObjectMapper()
    val vm = new VM()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]

    // Per-event emission budget — an unbounded emit loop in a hook
    // must fail the task, not OOM the executor
    val MaxEmit = 1 << 20

    def emitEvent(seq: Long, ev: LV): Unit = {
      if (out.length >= MaxEmit)
        throw LuaError(LStr(s"emit limit ($MaxEmit events) exceeded"))
      ev match {
        case t: LTable =>
          val log = t.rawGet(LStr("log"))
          val metric = t.rawGet(LStr("metric"))
          (log, metric) match {
            case (lt: LTable, LNil) =>
              out += ((seq, "L", mapper.writeValueAsString(LuaEventBridge.luaToJson(lt))))
            case (LNil, mt: LTable) =>
              out += ((seq, "M", mapper.writeValueAsString(metricToFlat(mt))))
            case _ => throw LuaError(LStr(
              "Event should contain either \"log\" or \"metric\" key at the top level"))
          }
        case other => throw LuaError(LStr(
          s"emitted event should be a Lua table, got ${LuaInterp.typeName(other)}"))
      }
    }

    if (version == 1) {
      val chunk = LuaAst.parse(source.get)
      it.flatMap { case (seq, json) =>
        val n0 = out.length
        try {
          val root = mapper.readTree(json).asInstanceOf[ObjectNode]
          val ev = new LuaEventBridge.V1Event(root, UnitTestHarness.parseFieldPath)
          vm.globals.rawSet(LStr("event"), ev.toUserData)
          vm.exec(chunk)
          vm.globals.rawGet(LStr("event")) match {
            case _: LUserData =>
              out += ((seq, "L", mapper.writeValueAsString(root)))
            case LNil => () // event = nil drops (v1/mod.rs:160-166)
            case other => throw LuaError(LStr(
              s"global `event` must stay an event or nil, got ${LuaInterp.typeName(other)}"))
          }
        } catch {
          case LuaError(v) =>
            System.err.println(s"[lua] script error (event dropped): ${toDisplay(v)}")
        }
        val emitted = out.slice(n0, out.length).toVector
        out.remove(n0, out.length - n0)
        emitted
      }
    } else {
      source.foreach(s => vm.exec(LuaAst.parse(s)))
      // hook strings resolve like the reference: inline function
      // expression OR the name of a global defined by `source`
      def hook(code: Option[String]): Option[LV] =
        code.map(c => vm.evalExpr(c) match {
          case f @ (_: LFn | _: LClosure) => f
          case other => throw LuaError(LStr(
            s"hook must evaluate to a function, got ${LuaInterp.typeName(other)}"))
        })
      val hInit = hook(hookInit)
      val hProcess = hook(hookProcess).get
      val hShutdown = hook(hookShutdown)
      var emitSeq = 0L
      val emitFn = LFn("emit", { args =>
        emitEvent(emitSeq, args.headOption.getOrElse(LNil)); Nil
      })
      var initRun = false

      val main = it.flatMap { case (seq, json) =>
        val n0 = out.length
        emitSeq = seq
        try {
          if (!initRun) {
            initRun = true
            hInit.foreach(f => vm.callValue(f, Seq(emitFn)))
          }
          val node = mapper.readTree(json)
          val evTable = new LTable
          if (metricIn)
            evTable.rawSet(LStr("metric"), flatToMetric(node.asInstanceOf[ObjectNode]))
          else
            evTable.rawSet(LStr("log"), LuaEventBridge.jsonToLua(node))
          vm.callValue(hProcess, Seq(evTable, emitFn))
        } catch {
          case LuaError(v) =>
            System.err.println(s"[lua] hook error (event dropped): ${toDisplay(v)}")
            out.remove(n0, out.length - n0)
        }
        val emitted = out.slice(n0, out.length).toVector
        out.remove(n0, out.length - n0)
        emitted
      }
      // shutdown events carry a seq past every input's (within the
      // partition) so arrival order stays consistent
      main ++ new Iterator[(Long, String, String)] {
        private lazy val tail: Iterator[(Long, String, String)] = {
          val n0 = out.length
          try hShutdown.foreach { f =>
            emitSeq = Long.MaxValue / 2
            vm.callValue(f, Seq(emitFn))
          } catch {
            case LuaError(v) =>
              System.err.println(s"[lua] shutdown error: ${toDisplay(v)}")
              out.remove(n0, out.length - n0)
          }
          out.slice(n0, out.length).toVector.iterator
        }
        def hasNext: Boolean = tail.hasNext
        def next(): (Long, String, String) = tail.next()
      }
    }
  }

  // ------------------------------------------- metric table ⇄ flat row
  private val F = JsonNodeFactory.instance

  /** Flat-model JSON row → the reference's lua metric table
    * (metric.rs IntoLua: name/namespace/timestamp/tags/kind + value
    * arm). Only counter/gauge exist in the flat model.
    */
  private def flatToMetric(n: ObjectNode): LTable = {
    val t = new LTable
    def strField(k: String): Option[String] =
      Option(n.get(k)).filterNot(_.isNull).map(_.asText())
    t.rawSet(LStr("name"), strField("name").map(LStr).getOrElse(
      throw LuaError(LStr("metric event without name"))))
    strField("namespace").foreach(v => t.rawSet(LStr("namespace"), LStr(v)))
    Option(n.get("ts")).filter(LuaEventBridge.isTsMarker).foreach { m =>
      t.rawSet(LStr("timestamp"), LuaEventBridge.tsTable(
        LuaEventBridge.parseIso(m.get(LuaEventBridge.TsKey).asText())))
    }
    strField("tags").filter(_.nonEmpty).foreach { tags =>
      val tt = new LTable
      tags.split(',').foreach { kv =>
        val i = kv.indexOf('=')
        if (i > 0) tt.rawSet(LStr(kv.substring(0, i)), LStr(kv.substring(i + 1)))
      }
      t.rawSet(LStr("tags"), tt)
    }
    t.rawSet(LStr("kind"), LStr(strField("kind").getOrElse("absolute")))
    val value = Option(n.get("value")).filterNot(_.isNull).map(_.asDouble()).getOrElse(
      throw LuaError(LStr("metric event without value")))
    val arm = new LTable
    arm.rawSet(LStr("value"), LNum(value))
    strField("value_type").getOrElse("gauge") match {
      case "counter" => t.rawSet(LStr("counter"), arm)
      case "gauge" => t.rawSet(LStr("gauge"), arm)
      case other => throw LuaError(LStr(
        s"metric type $other has no per-row lua form (counter|gauge)"))
    }
    t
  }

  /** Lua metric table → flat-model JSON (metric.rs FromLua order:
    * counter, gauge first; the collection arms have no flat form and
    * refuse loudly).
    */
  private def metricToFlat(t: LTable): ObjectNode = {
    val o = F.objectNode()
    t.rawGet(LStr("name")) match {
      case LStr(s) => o.set[com.fasterxml.jackson.databind.JsonNode]("name", F.textNode(s))
      case _ => throw LuaError(LStr("metric table needs a string `name`"))
    }
    t.rawGet(LStr("namespace")) match {
      case LStr(s) => o.set[com.fasterxml.jackson.databind.JsonNode]("namespace", F.textNode(s)); ()
      case _ => ()
    }
    t.rawGet(LStr("kind")) match {
      case LNil => o.put("kind", "absolute"); ()
      case LStr(k @ ("absolute" | "incremental")) => o.put("kind", k); ()
      case other => throw LuaError(LStr(
        "Metric kind should be either \"incremental\" or \"absolute\""))
    }
    t.rawGet(LStr("timestamp")) match {
      case ts: LTable if LuaEventBridge.isTsTable(ts) =>
        val m = F.objectNode()
        m.put(LuaEventBridge.TsKey,
          LuaEventBridge.IsoFmt.format(LuaEventBridge.tableToInstant(ts)))
        o.set[com.fasterxml.jackson.databind.JsonNode]("ts", m)
        ()
      case _ => ()
    }
    t.rawGet(LStr("tags")) match {
      case tt: LTable =>
        val kvs = tt.m.toSeq.collect { case (LStr(k), v) => k -> toDisplay(v) }
        o.put("tags", kvs.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(","))
        ()
      case _ => ()
    }
    def arm(k: String): Option[Double] = t.rawGet(LStr(k)) match {
      case at: LTable => at.rawGet(LStr("value")) match {
        case LInt(i) => Some(i.toDouble)
        case LNum(d) => Some(d)
        case _ => throw LuaError(LStr(s"$k.value must be a number"))
      }
      case _ => None
    }
    arm("counter").map("counter" -> _)
      .orElse(arm("gauge").map("gauge" -> _)) match {
      case Some((vt, v)) =>
        o.put("value_type", vt)
        o.put("value", v)
        ()
      case None =>
        val collection = Seq("set", "distribution", "aggregated_histogram",
          "aggregated_summary", "sketch").find(k => t.rawGet(LStr(k)) != LNil)
        throw LuaError(LStr(collection match {
          case Some(k) => s"metric arm $k has no flat-model form in this engine"
          case None => "metric table needs a counter or gauge arm"
        }))
    }
    o
  }
}
