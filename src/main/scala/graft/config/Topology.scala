package graft.config

import scala.collection.immutable.ListMap
import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Toml._
import VrlAst.{SegName, VrlUnsupported}
import VrlCompile._

/** An event batch flowing through a config-built topology: a DataFrame
  * plus the tracked VRL types of its event fields. The frame also
  * carries a non-event `__seq` column (arrival order) used by
  * order-sensitive transforms (dedupe first-wins, reduce sessions,
  * sample counters); it is never visible to VRL programs.
  */
final case class Frame(df: DataFrame, meta: EventMeta,
                       metric: Boolean = false) {
  def isEmpty: Boolean = df.isEmpty
}

/** Config-driven pipeline front-end: a TOML topology of `[transforms.*]`
  * blocks (the reference's primary UX — config loading in
  * `src/config/builder.rs`, transform registration per type) compiled
  * into the SAME Spark operators the Scala API exposes. Nothing is
  * interpreted per event: each transform's config compiles once into
  * Catalyst columns.
  *
  * Supported transform types cover the reference's registry
  * (src/transforms/mod.rs): remap (VRL program via `source`/`file`,
  * drop_on_error / drop_on_abort / reroute_dropped with a `.dropped`
  * port — src/transforms/remap.rs:58-135), filter, route (multicast
  * ports + `_unmatched`), exclusive_route (first-match ports), dedupe
  * (fields.match / fields.ignore), reduce (group_by, ends_when,
  * max_events, merge_strategies), sample, throttle, log_to_metric
  * ([[metrics]] rules + all_metrics), metric_to_log, aggregate (all 9
  * modes over event-time windows), incremental_to_absolute,
  * tag_cardinality_limit (exact mode), window (with the group_by
  * sharding extension), trace_to_log, aws_ec2_metadata (mock_values
  * record). `lua` has no config form here — per-event scripting is the
  * typed Script harness on the library surface (operators/Script).
  * Metric-shaped frames carry `metric = true` so the is_log/is_metric
  * conditions and the metric-only transforms type-check at plan time.
  */
final class Topology(val root: TTab, fileDir: Option[String] = None) {

  import Topology._

  // SECRET[backend.key] interpolation runs FIRST — before any other
  // option is read — exactly like the reference's config loading
  // (secrets resolve on the raw config before deserialization)
  Secrets.interpolate(root, resolvePath)

  /** Listening ingest endpoints opened by `loadStreamingSources`
    * (syslog / http_server): exposed so a caller can learn ephemeral
    * bound ports and must be closed with [[closeIngest]] when the
    * streaming run ends (the reference's source shutdown).
    */
  val ingestListeners: scala.collection.mutable.Buffer[graft.streaming.IngestListener] =
    scala.collection.mutable.Buffer.empty
  def closeIngest(): Unit = { ingestListeners.foreach(_.close()); ingestListeners.clear() }

  // true while executeStreaming evaluates: relaxes batch-only
  // ordering refusals whose streaming analogs are handled elsewhere
  @volatile private var streamingEval = false

  // the reference's GLOBAL `timezone` option (inherited by every remap,
  // src/config/mod.rs): this engine compiles everything UTC — honoring
  // a non-UTC zone silently wrong is worse than refusing at load
  root.str("timezone").filterNot(_ == "UTC").foreach(z =>
    throw VrlUnsupported(s"global timezone $z (UTC-only compile)"))

  /** Config paths resolve relative to the TOML file's directory (the
    * reference's behavior for config-adjacent files); absolute paths
    * pass through untouched — `Paths.get(dir, "/abs")` would silently
    * RELATIVIZE them (Java joins the components), which broke any
    * loadFile'd config pointing at an absolute data/output location.
    */
  private def resolvePath(p: String): String = {
    val path = java.nio.file.Paths.get(p)
    if (path.isAbsolute) p
    else fileDir.map(d => java.nio.file.Paths.get(d).resolve(path).toString)
      .getOrElse(p)
  }

  val transforms: ListMap[String, TTab] =
    root.tab("transforms") match {
      case Some(t) =>
        ListMap(t.entries.toSeq.collect { case (n, tab: TTab) => n -> tab }: _*)
      case None => ListMap.empty
    }

  // deny_unknown_fields, like the reference's serde configs: a typo'd
  // option (`windows_secs`) or an option this engine does not honor
  // (`metric_to_log.host_tag`) must fail the LOAD — the reference
  // rejects it at deserialization, before any event flows — never
  // silently fall back to a default. Checked here (construction) so it
  // fires even for transforms that never receive input, and so the
  // unit-test harness's per-test error catch can't swallow it.
  transforms.foreach { case (name, cfg) =>
    cfg.str("type").foreach { ttype =>
      TransformKeys.get(ttype).foreach { allowed =>
        val unknown = cfg.entries.keySet -- allowed -- Set("type", "inputs")
        if (unknown.nonEmpty) throw new IllegalArgumentException(
          s"transform $name (type $ttype): unknown option(s) " +
            s"${unknown.toSeq.sorted.mkString(", ")} — supported: " +
            allowed.toSeq.sorted.mkString(", "))
      }
    }
  }

  def testDefs: Vector[TTab] = root.tabs("tests")

  /** `[enrichment_tables.<name>]` blocks (reference
    * src/enrichment_tables/file.rs config shape): CSV files loaded
    * driver-side at topology build — lookup tables are in-memory data
    * by contract, exposed to VRL via get_enrichment_table_record /
    * find_enrichment_table_records.
    */
  private val fileEnrichTables: Map[String, EnrichTableData] =
    root.tab("enrichment_tables") match {
      case Some(t) => t.entries.toSeq.collect {
        case (n, tab: TTab) if !tab.str("type").contains("memory") =>
          tab.str("type") match {
            case Some("file") =>
              val file = tab.tab("file").getOrElse(
                throw new IllegalArgumentException(s"enrichment table $n: no [file]"))
              val path = file.str("path").getOrElse(
                throw new IllegalArgumentException(s"enrichment table $n: no path"))
              val delim = file.tab("encoding").flatMap(_.str("delimiter"))
                .map(_.head).getOrElse(',')
              n -> loadCsvTable(resolvePath(path), delim)
            case other =>
              throw VrlUnsupported(s"enrichment table type ${other.getOrElse("?")}")
          }
      }.toMap
      case None => Map.empty
    }

  /** `type = "memory"` enrichment tables (reference
    * src/enrichment_tables/memory/): name → (ttl secs, writer inputs).
    * Knobs that would silently change semantics if ignored
    * (max_byte_size eviction, ttl_field override, source_config
    * re-emission) are refused; flush/scan intervals are liveness knobs
    * of the continuous machine and accepted unused.
    */
  val memoryTableDefs: Map[String, (Long, Vector[String])] =
    root.tab("enrichment_tables") match {
      case Some(t) => t.entries.toSeq.collect {
        case (n, tab: TTab) if tab.str("type").contains("memory") =>
          Seq("max_byte_size", "ttl_field", "source_config").foreach { k =>
            if (tab.entries.contains(k)) throw VrlUnsupported(
              s"enrichment table $n: memory $k (honoring it changes " +
                "lookup semantics; not implemented)")
          }
          n -> (tab.long("ttl").getOrElse(600L), tab.strArr("inputs"))
      }.toMap
      case None => Map.empty
    }

  /** The VRL-visible lookup tables: static file tables + a LIVE
    * snapshot of each memory table (rebuilt per compilation — the
    * batch analog of the reference's concurrent cache reads).
    */
  def enrichmentTables: Map[String, EnrichTableData] =
    fileEnrichTables ++ memoryTableDefs.keys.map { n =>
      n -> EnrichTableData(MemoryCache.snapshot(n))
    }

  /** Evaluate the DAG. `injected` supplies an input batch per transform
    * name (the unit-test harness's insert_at, or a source mapping);
    * declared `inputs` naming other transforms wire internal edges;
    * input names that match no transform (external sources) resolve
    * against `injected` under that name. Returns every produced output
    * id — `name` or `name.port` — to its frame.
    */
  def run(injected: Map[String, Frame]): Map[String, Frame] = {
    // memory enrichment tables: writes settle before reads in a
    // bounded batch — each table's declared inputs (source frames)
    // upsert into the process cache NOW, so every later compile reads
    // the post-write snapshot. An input naming a transform would need
    // the reference's concurrent live-read semantics, which a batch
    // evaluation cannot promise — refused, not reordered silently.
    memoryTableDefs.foreach { case (tname, (ttl, inputs)) =>
      inputs.foreach { in =>
        if (transforms.contains(rootOf(in))) {
          // the STREAMING path consumes transform outputs through its
          // own checkpointed foreachBatch writer (startStreamingSinks)
          if (!streamingEval) throw VrlUnsupported(
            s"enrichment table $tname: memory input '$in' is a transform " +
              "(batch runs settle cache writes before reads — feed memory " +
              "tables from sources, or run the writer topology first)")
        } else injected.get(in) match {
          // streaming source inputs ALSO go through the foreachBatch
          // writer — a driver-side settle would collect() a streaming
          // frame and crash the query at start
          case Some(f) =>
            if (!streamingEval) MemoryCache.upsertFrame(tname, f, ttl)
          case None => throw new IllegalArgumentException(
            s"enrichment table $tname: memory input '$in' matches no " +
              "source or transform (typo?)")
        }
      }
    }
    val outputs = mutable.LinkedHashMap.empty[String, Frame]
    val done = mutable.Set.empty[String]
    var progress = true
    while (done.size < transforms.size && progress) {
      progress = false
      for ((name, cfg) <- transforms if !done(name)) {
        val declared = cfg.strArr("inputs")
        val internal = declared.filter(d => transforms.contains(rootOf(d)))
        if (internal.forall(r => done(rootOf(r)))) {
          val fromEdges = declared.flatMap { d =>
            outputs.get(d).orElse(if (transforms.contains(rootOf(d))) None
                                  else injected.get(d))
          }
          val frames = fromEdges ++ injected.get(name).filter(_ => !declared.contains(name))
          if (frames.nonEmpty) {
            val in = unionFrames(frames)
            applyTransform(name, cfg, in).foreach { case (port, f) =>
              outputs(if (port.isEmpty) name else s"$name.$port") = f
            }
          }
          done += name
          progress = true
        }
      }
    }
    if (done.size < transforms.size)
      throw new IllegalArgumentException(
        s"topology cycle or missing input among ${transforms.keySet -- done}")
    outputs.toMap
  }

  // ----------------------------------------------------------- apply
  private def applyTransform(name: String, cfg: TTab, in: Frame): Seq[(String, Frame)] =
    cfg.str("type").getOrElse(
      throw new IllegalArgumentException(s"transform $name has no type")) match {

      case "remap" =>
        // `timezone` feeds zone-less timestamp parsing in the
        // reference's runtime (remap.rs:109); this engine compiles
        // everything UTC — honoring a non-UTC zone silently wrong is
        // worse than refusing
        cfg.str("timezone").filterNot(_ == "UTC").foreach(z =>
          throw VrlUnsupported(s"remap $name: timezone $z (UTC-only compile)"))
        // `files` concatenates multiple VRL programs in order
        // (remap.rs:88: "their contents are merged"); exactly ONE of
        // source/file/files may be set — silently preferring one would
        // run the wrong program (the reference errors too)
        val srcForms = Seq(
          cfg.str("source"),
          cfg.str("file").map(readRelative),
          { val fs = cfg.strArr("files")
            if (fs.isEmpty) None else Some(fs.map(readRelative).mkString("\n")) }
        ).flatten
        if (srcForms.length > 1) throw new IllegalArgumentException(
          s"remap $name: provide exactly one of source/file/files")
        val src = srcForms.headOption
          .getOrElse(throw new IllegalArgumentException(s"remap $name: no source/file/files"))
        val prog = VrlAst.parse(src)
        val opts = RemapOpts(
          dropOnError = cfg.bool("drop_on_error").getOrElse(false),
          dropOnAbort = cfg.bool("drop_on_abort").getOrElse(true),
          rerouteDropped = cfg.bool("reroute_dropped").getOrElse(false))
        // metric frames run the program over the VRL metric view (tags
        // as a map, .type/.timestamp names) and reassemble the flat
        // model after; the dropped port carries the ORIGINAL event
        // (reference semantics), which is already flat
        val roots = if (in.metric) Some(metricVrlRoots(in.df)) else None
        val r = VrlCompile.remap(in.df, in.meta, prog, opts, Seq(SeqCol),
          enrichmentTables, roots)
        val outFrame =
          if (in.metric) metricVrlUnview(r.df, r.meta)
          else Frame(r.df, r.meta)
        Seq("" -> outFrame) ++
          r.dropped.map(d => "dropped" -> Frame(d, in.meta, in.metric))

      case "filter" =>
        Seq("" -> in.copy(df = in.df.filter(Conditions.compile(cfg.get("condition"), in, enrichmentTables))))

      case "route" =>
        val routes = cfg.tab("route").getOrElse(
          throw new IllegalArgumentException(s"route $name: no route table"))
        val compiled = ListMap(routes.entries.toSeq.map { case (port, v) =>
          port -> Conditions.compile(Some(v), in, enrichmentTables)
        }: _*)
        // ONE tagged pass (Route.tagged: per-row matching-port array +
        // explode), not one filter per port: a consumer reading all P
        // ports (the normal sink fan-out) would otherwise re-execute the
        // whole upstream P+1 times — the multicast scan amplification
        // that kills at scale. Also fixes null-condition semantics: a
        // condition erroring to NULL is a no-match -> `_unmatched`
        // (route.rs check_all semantics), whereas filter(!anyMatch)
        // dropped such rows from every port. The bare transform name
        // exposes the tagged frame itself (`port` column — the
        // partitionBy("port") sink shape); Vector has no bare-name route
        // output, so this is a Spark-native extension, and the per-port
        // names keep reference semantics.
        // reroute_unmatched = false DROPS unmatched events instead of
        // routing them to `_unmatched` (route.rs:24,52 — default true):
        // they must vanish from the bare-name tagged frame too, or a
        // sink on it would still carry them
        val reroute = cfg.bool("reroute_unmatched").getOrElse(true)
        val tagged0 = graft.operators.Route.tagged(in.df, compiled)
        val tagged =
          if (reroute) tagged0
          else tagged0.filter(col("port") =!= graft.operators.Route.UnmatchedPort)
        // the bare-name frame physically carries `port`; its meta must
        // say so, or downstream VRL resolves `.port` to null and (worse)
        // a downstream remap's materialize silently drops the column
        val taggedMeta = EventMeta(in.meta.types + ("port" -> VStr), in.meta.rootT)
        Seq("" -> Frame(tagged, taggedMeta, in.metric)) ++
          (compiled.keys.toSeq ++
            (if (reroute) Seq(graft.operators.Route.UnmatchedPort) else Nil)).map { p =>
            p -> in.copy(df = tagged.filter(col("port") === p).drop("port"))
          }

      case "exclusive_route" =>
        // ONE first-match-wins pass (Route.exclusive's when-chain), not
        // one filter per port: same multicast-scan-amplification fix as
        // `route` above, and a condition erroring to NULL falls through
        // to the next route / `_unmatched` (the filter-chain form's
        // `!prior` went null and silently dropped such rows from every
        // port). Bare name = the tagged frame, per-port names filter it.
        val conds = ListMap(cfg.tabs("routes").map { r =>
          val nm = r.str("name").getOrElse(
            throw new IllegalArgumentException(s"exclusive_route $name: route without name"))
          nm -> Conditions.compile(r.get("condition"), in, enrichmentTables)
        }: _*)
        val tagged = graft.operators.Route.exclusive(in.df, conds)
        val taggedMeta = EventMeta(in.meta.types + ("port" -> VStr), in.meta.rootT)
        Seq("" -> Frame(tagged, taggedMeta, in.metric)) ++
          (conds.keys.toSeq :+ graft.operators.Route.UnmatchedPort).map { p =>
            p -> in.copy(df = tagged.filter(col("port") === p).drop("port"))
          }

      case "dedupe" =>
        // an EXPLICIT [cache] must not silently degrade to the exact
        // fixpoint: the LRU replay (Dedupe.keepFirstLru) needs a unique
        // integral arrival order, and the config frames' `__seq` is a
        // content hash (identical duplicates share it by design)
        if (cfg.tab("cache").isDefined) throw VrlUnsupported(
          s"dedupe $name: [cache] num_events (bounded-LRU re-emission " +
            "needs a unique arrival column — use Dedupe.keepFirstLru on " +
            "the library surface; config dedupe is the exact fixpoint)")
        val fieldsTab = cfg.tab("fields")
        val env = envFromDf(in.df, in.meta)
        val dedupeKeys: Seq[Column] = fieldsTab.flatMap(_.get("match")) match {
          case Some(TArr(paths)) =>
            paths.collect { case TStr(p) => dedupeKey(env, p) }
          case _ if fieldsTab.isDefined =>
            // ignore semantics: every event field except the listed ones
            val ignore = fieldsTab.map(_.strArr("ignore")).getOrElse(Vector.empty).toSet
            in.meta.types.keys.filterNot(ignore).map(p => dedupeKey(env, p)).toSeq
          case _ =>
            // no [fields] table at all: the reference defaults to
            // MatchFields on the log-schema triple (dedupe/common.rs:88,
            // default_match_fields :106-118) — NOT all fields; events
            // missing one of the three compare on null there, same as a
            // log without the key
            Seq("message", "host", "timestamp").map(p => dedupeKey(env, p))
        }
        val timeCfg = cfg.tab("time_settings").map { t =>
          val maxAge = t.long("max_age_ms").getOrElse(
            throw new IllegalArgumentException(
              s"dedupe $name: [time_settings] needs max_age_ms"))
          (maxAge, t.bool("refresh_on_drop").getOrElse(false))
        }
        if (in.df.isStreaming) {
          if (timeCfg.isDefined) throw VrlUnsupported(
            s"dedupe $name: [time_settings] on a streaming source " +
              "(use withWatermark + dropDuplicatesWithinWatermark via " +
              "graft.streaming for age-bounded streaming dedupe)")
          // streaming: arrival-order first-wins via dropDuplicates —
          // the semantics the reference's LRU cache approximates, with
          // exact (unbounded) state instead of a bounded cache
          val tmp = dedupeKeys.zipWithIndex.map { case (k, i) => (s"__dk$i", k) }
          val withK = tmp.foldLeft(in.df) { case (d, (n, c)) => d.withColumn(n, c) }
          Seq("" -> in.copy(df =
            withK.dropDuplicates(tmp.map(_._1)).drop(tmp.map(_._1): _*)))
        } else timeCfg match {
          case Some((maxAge, refresh)) =>
            // timed cache (dedupe/timed_transform.rs): the event's
            // `timestamp` field is the batch analog of the reference's
            // wall clock — the SAME clock the batch throttle window
            // resolves, never "whichever time-typed column comes first
            // in the schema" (reordering upstream columns must not
            // change dedupe results)
            if (!in.meta.types.get("timestamp").contains(VTime))
              throw new IllegalArgumentException(
                s"dedupe $name: [time_settings] needs a timestamp-typed " +
                  "`timestamp` field (the batch analog ages against event time)")
            val tsCol = col("timestamp")
            Seq("" -> in.copy(df = graft.operators.Dedupe.keepFirstTimed(
              in.df, dedupeKeys, tsCol, col(SeqCol), maxAge, refresh)))
          case None =>
            Seq("" -> in.copy(df =
              graft.operators.Dedupe.keepFirst(in.df, dedupeKeys, Seq(col(SeqCol)))))
        }

      case "reduce" =>
        requireBatch(in, "reduce")
        Seq("" -> reduce(name, cfg, in))

      case "sample" =>
        requireBatch(in, "sample")
        val rateOpt = cfg.long("rate")
        val ratioOpt = cfg.dbl("ratio")
        // exactly-one-of, mirroring SampleError::InvalidConfiguration
        // (sample/config.rs:31-35); `rate` absent defaults to 10 for
        // backward compatibility with earlier graft configs.
        if (rateOpt.isDefined && ratioOpt.isDefined)
          throw new IllegalArgumentException(
            s"sample $name: provide either 'rate' or 'ratio', not both (sample/config.rs:31-35)")
        val env = envFromDf(in.df, in.meta)
        // group_by is a TEMPLATE like throttle's key_field
        // (sample/config.rs:91) — see templateOrPath
        val group = cfg.str("group_by").map(p => templateOrPath(env,
          resolveField(env, Seq(SegName("timestamp"))).col, p)).getOrElse(lit(1))
        // full reference surface (sample/config.rs): key_field hashes
        // rows into consistent sample-together buckets, exclude bypasses
        // without consuming counter quota, sample_rate_key renames (or
        // "" suppresses) the stamp
        val keyOpt = cfg.str("key_field").map(p =>
          resolveField(env, parsePathStr(p)).col)
        val excl = cfg.get("exclude").map(v =>
          Conditions.compile(Some(v), in, enrichmentTables))
        val rateKey = cfg.str("sample_rate_key").getOrElse("sample_rate")
        val mode: Either[Int, Double] = ratioOpt match {
          case Some(r) => Right(r)
          case None    => Left(rateOpt.getOrElse(10L).toInt)
        }
        val out = graft.operators.Sample.configured(
          in.df, keyOpt, group, Seq(col(SeqCol)), mode, excl, rateKey)
        val stampT = if (mode.isRight) VFloat else VInt
        val types =
          if (rateKey.isEmpty) in.meta.types else in.meta.types + (rateKey -> stampT)
        Seq("" -> Frame(out, EventMeta(types, in.meta.rootT), in.metric))

      case "throttle" =>
        val threshold = cfg.long("threshold").getOrElse(
          throw new IllegalArgumentException(s"throttle $name: no threshold")).toInt
        val windowSecs = cfg.long("window_secs").getOrElse(60L)
        val env = envFromDf(in.df, in.meta)
        val ts = resolveField(env, Seq(SegName("timestamp"))).col
        // key_field is a TEMPLATE (`key_field = "{{ bucket }}"`,
        // throttle/transform.rs:25,110-118) — see templateOrPath; a
        // failed render keys into the shared null bucket, the
        // reference's None-key rate limiter
        val key = cfg.str("key_field").map(p => templateOrPath(env, ts, p))
          .getOrElse(lit(1))
        // exclude bypasses the limiter without consuming quota
        // (throttle/config.rs:60-61, transform.rs:102-130)
        val thrExcl = cfg.get("exclude").map(v =>
          Conditions.compile(Some(v), in, enrichmentTables))
        if (in.df.isStreaming) {
          // the reference throttle IS a continuous token bucket; the
          // cross-batch form (StreamOps.throttle: per-window counters
          // in flatMapGroupsWithState) is its native home. The event
          // rides a JSON envelope through the typed stateful op and is
          // re-typed with its own schema on the way out; excluded rows
          // bypass on a separate union branch, never consuming quota.
          val sp = in.df.sparkSession
          import sp.implicits._
          val schema = in.df.schema
          val gated = thrExcl.map(e =>
            in.df.filter(!coalesce(e, lit(false)))).getOrElse(in.df)
          // a null key is its own bucket (matching the batch window's
          // null partition), not merged with any string key: every
          // real value gets a "v" prefix, null gets bare NUL — disjoint
          // by construction (a cast string CAN contain NUL, so a
          // sentinel alone wouldn't be collision-free)
          val keyed = gated.select(
            when(key.isNull, lit("\u0000"))
              .otherwise(concat(lit("v"), key.cast("string"))).as("key"),
            coalesce(unix_timestamp(ts), lit(0L)).as("epochSec"),
            to_json(struct(gated.columns.map(c => col(s"`$c`")).toSeq: _*))
              .as("payload"))
            .as[graft.streaming.StreamOps.Keyed]
          val kept = graft.streaming.StreamOps
            .throttle(keyed, threshold, windowSecs)
            .select(from_json(col("payload"), schema).as("__e"))
            .select(col("__e.*"))
          val out = thrExcl.map(e => kept.unionByName(
            in.df.filter(coalesce(e, lit(false))))).getOrElse(kept)
          Seq("" -> in.copy(df = out))
        } else
          Seq("" -> in.copy(df = graft.operators.Throttle(
            in.df, key, ts, threshold, windowSecs, Seq(col(SeqCol)), thrExcl)))

      case "log_to_metric" =>
        Seq("" -> logToMetricConfig(name, cfg, in))

      case "metric_to_log" =>
        // metric → structured log (src/transforms/metric_to_log.rs):
        // the flat metric columns stay addressable as log fields and a
        // canonical rendered `message` line is added. Narrow — streams.
        requireMetricFrame(name, "metric_to_log", in)
        Seq("" -> Frame(graft.operators.Metrics.metricToLog(in.df),
          EventMeta(in.meta.types + ("message" -> VStr), None)))

      case "aggregate" =>
        if (in.df.isStreaming) {
          // graft extension: `watermark = "<delay>"` turns the same
          // tumbling event-time windows into a Structured Streaming
          // aggregation (append mode — a window flushes once the
          // watermark passes its end, the reference's interval flush
          // re-expressed in event time). Without it, refuse with the
          // contract spelled out rather than let the sink start fail.
          val delay = cfg.str("watermark").getOrElse(throw VrlUnsupported(
            "aggregate on a streaming source needs watermark = \"<delay>\" " +
              "(e.g. \"30 seconds\"): event-time windows flush when the " +
              "watermark passes (graft extension)"))
          Seq("" -> aggregateStreamingConfig(name, cfg, in, delay))
        } else
          Seq("" -> aggregateConfig(name, cfg, in))

      case "incremental_to_absolute" =>
        requireBatch(in, "incremental_to_absolute")
        requireMetricFrame(name, "incremental_to_absolute", in)
        val out = graft.operators.Metrics.incrementalToAbsolute(
            in.df,
            series = Seq(col("name"), col("namespace"), col("tags"),
              col("value_type")),
            ord = struct(col("ts"), col(SeqCol)),
            value = col("value"), kind = Some(col("kind")))
          .withColumn("value", col("abs_value"))
          .select(col(SeqCol) +:
            in.meta.types.keys.toSeq.map(n => col(s"`$n`")): _*)
        Seq("" -> in.copy(df = out))

      case "tag_cardinality_limit" =>
        requireBatch(in, "tag_cardinality_limit")
        requireMetricFrame(name, "tag_cardinality_limit", in)
        Seq("" -> in.copy(df = tagLimitConfig(name, cfg, in.df)))

      case "window" =>
        requireBatch(in, "window")
        val flush = Conditions.compile(Some(cfg.get("flush_when").getOrElse(
          throw new IllegalArgumentException(s"window $name: no flush_when"))),
          in, enrichmentTables)
        val fwd = cfg.get("forward_when")
          .map(v => Conditions.compile(Some(v), in, enrichmentTables))
        val before = cfg.long("num_events_before").getOrElse(100L).toInt
        val after = cfg.long("num_events_after").getOrElse(0L).toInt
        // the reference buffers ONE global ring (window/transform.rs) —
        // a total-order scan, i.e. a single partition at any scale. The
        // distributed form shards the buffer per key; require the
        // (graft-extension) group_by rather than silently planning a
        // single-partition window.
        val groupBy = cfg.strArr("group_by")
        if (groupBy.isEmpty) throw VrlUnsupported(
          "window without group_by: the reference's single global ring " +
            "buffer is a one-partition total-order scan; declare " +
            "group_by = [\"<key>\"] to shard it (graft extension)")
        val wEnv = envFromDf(in.df, in.meta)
        val keys = groupBy.map(p => resolveField(wEnv, parsePathStr(p)).col)
        Seq("" -> in.copy(df = graft.operators.ContextWindow(
          in.df, keys, col(SeqCol), flush, before, after, fwd)))

      case "trace_to_log" =>
        // envelope-drop projection (src/transforms/trace_to_log.rs);
        // absent envelope fields are a no-op, as in the reference
        val envelope = Seq("trace_id", "span_id", "parent_span_id")
          .filter(in.meta.types.contains)
        Seq("" -> Frame(graft.operators.Stamp.traceToLog(in.df, envelope),
          EventMeta(in.meta.types -- envelope, in.meta.rootT), in.metric))

      case "aws_ec2_metadata" =>
        // the reference polls IMDS on a refresh interval
        // (aws_ec2_metadata.rs:98-140) and stamps the current record on
        // every event; a batch cluster has no IMDS endpoint, so the
        // record arrives inline as [transforms.<n>.mock_values] (the
        // graft analog of the driver-side refresh loop's one-row state)
        // and `fields` filters it exactly like the reference's knob.
        val values: Seq[(String, String)] = cfg.tab("mock_values") match {
          case Some(t) => t.entries.toSeq.collect { case (k, TStr(v)) => k -> v }
          case None => throw VrlUnsupported(
            "aws_ec2_metadata without [transforms.<n>.mock_values] " +
              "(no IMDS on a batch cluster; supply the metadata record " +
              "inline or use graft.operators.Stamp.withMetadata)")
        }
        if (cfg.str("namespace").exists(_.nonEmpty))
          throw VrlUnsupported("aws_ec2_metadata namespace prefix (flat field model)")
        val fieldsFilter = cfg.strArr("fields")
        val kept =
          if (fieldsFilter.isEmpty) values
          else values.filter(v => fieldsFilter.contains(v._1))
        Seq("" -> Frame(
          graft.operators.Stamp.withMetadata(in.df, ListMap(kept: _*)),
          EventMeta(in.meta.types ++ kept.map(_._1 -> VStr), in.meta.rootT),
          in.metric))

      case "lua" =>
        // per-event scripting on the from-scratch Lua VM (graft.lua);
        // one VM per partition, init/process/shutdown lifecycle —
        // see LuaTransform's doc for the exact reference mapping
        Seq("" -> LuaTransform(name, cfg, in))

      case other => throw VrlUnsupported(s"transform type $other")
    }

  // ----------------------------------------------------------- metrics

  private def requireMetricFrame(name: String, t: String, in: Frame): Unit = {
    val missing = MetricMeta.types.keys.filterNot(in.meta.types.contains)
    if (!in.metric || missing.nonEmpty)
      throw new IllegalArgumentException(
        s"$t $name: input is not a metric stream" +
          (if (missing.nonEmpty) s" (missing: ${missing.mkString(", ")})" else "") +
          " — put a log_to_metric transform upstream")
  }

  /** Config-driven log_to_metric (src/transforms/log_to_metric.rs config
    * shape): `[[metrics]]` rules — counter (kind/increment_by_value),
    * gauge (absolute), set, histogram/summary (per-event distribution
    * samples, value.rs) — with templated name/namespace/tags, or
    * `all_metrics = true` (the log IS the metric). Output is the flat
    * [[MetricMeta]] frame; set members ride the numeric `value` column
    * (string sets need the library surface, Metrics.logToMetric).
    * Missing-field / unparseable-value rows are skipped per rule, the
    * reference's FieldNotFound / ParseFloatError skip semantics.
    */
  private def logToMetricConfig(name: String, cfg: TTab, in: Frame): Frame = {
    val env = envFromDf(in.df, in.meta)
    val tsCol: Column =
      Seq("timestamp", "ts").find(f => in.meta.types.get(f).contains(VTime))
        .map(f => in.df.col(s"`$f`"))
        .getOrElse(lit(null).cast("timestamp"))
    if (cfg.bool("all_metrics").getOrElse(false)) {
      Seq("set", "distribution", "histogram", "summary").foreach { arm =>
        if (in.meta.types.contains(arm)) throw VrlUnsupported(
          s"all_metrics $arm arm (collection values live on the " +
            "aggregation side: Metrics.histogramAgg/summaryAgg)")
      }
      val arms = Seq("counter", "gauge").flatMap { arm =>
        in.meta.types.get(arm).map(_ =>
          arm -> resolveField(env, parsePathStr(s"$arm.value")).col)
      }
      if (arms.isEmpty) throw new IllegalArgumentException(
        s"log_to_metric $name: all_metrics with no counter/gauge arm fields")
      val tags: Option[Column] = in.meta.types.get("tags").map {
        case VMap => in.df.col("tags")
        case VObj(fs) => map(fs.keys.toSeq.flatMap(k =>
          Seq(lit(k), in.df.col("tags").getField(k).cast("string"))): _*)
        case other => throw VrlUnsupported(s"all_metrics tags of type $other")
      }
      val ns = in.meta.types.get("namespace")
        .map(_ => in.df.col("namespace").cast("string"))
        .getOrElse(lit(null).cast("string"))
      val out = graft.operators.Metrics.logToMetricAll(in.df, ts = tsCol,
        name = in.df.col("name"), kind = in.df.col("kind"),
        arms = arms, tags = tags, namespace = ns,
        passthrough = Seq(SeqCol -> col(SeqCol)))
      Frame(out, MetricMeta, metric = true)
    } else {
      val rules = cfg.tabs("metrics")
      if (rules.isEmpty) throw new IllegalArgumentException(
        s"log_to_metric $name: no [[metrics]] rules (or all_metrics = true)")
      // render-STRICT template: null referenced fields make the whole
      // render null — the reference's TemplateRenderingError (a failed
      // name render skips the event via the operator's name filter; a
      // failed tag render drops that tag; a failed namespace render
      // leaves the metric namespace-less). Template.compile alone
      // coalesces null fields to "", which would emit `k=` tags the
      // reference never produces.
      def template(t: String): Column = {
        val rendered = graft.functions.Template.compile(
          t, tsCol, f => resolveField(env, parsePathStr(f)).col.cast("string"))
        graft.functions.Template.fields(t) match {
          case Seq() => rendered
          case refs => when(refs.map(f =>
            resolveField(env, parsePathStr(f)).col.isNotNull).reduce(_ && _), rendered)
        }
      }
      import graft.operators.Metrics.MetricRule
      val compiled = rules.map { m =>
        val mtype = m.str("type").getOrElse(throw new IllegalArgumentException(
          s"log_to_metric $name: rule without type"))
        val fieldPath = m.str("field").getOrElse(
          throw new IllegalArgumentException(s"log_to_metric $name: rule without field"))
        if (fieldPath.contains("{{")) throw VrlUnsupported("templated metric field path")
        val fv = resolveField(env, parsePathStr(fieldPath))
        val v = fv.col
        val nameCol = m.str("name").map(template).getOrElse(lit(fieldPath))
        val nsCol = m.str("namespace").map(template)
          .getOrElse(lit(null)).cast("string")
        val tags: Seq[(String, Column)] = m.tab("tags").map(_.entries.toSeq.map {
          case (k, _) if k.contains("{{") => throw VrlUnsupported("templated tag key")
          case (k, TStr(t)) => k -> template(t)
          case (k, _) => throw VrlUnsupported(s"multi-valued tag $k (flat k=v model)")
        }).getOrElse(Nil)
        val numV = v.cast("string").try_cast("double")
        mtype match {
          case "counter" =>
            val kind = m.str("kind").getOrElse("incremental")
            if (kind != "incremental" && kind != "absolute")
              throw new IllegalArgumentException(
                s"log_to_metric $name: counter kind $kind (absolute|incremental)")
            if (m.bool("increment_by_value").getOrElse(false))
              MetricRule("counter", nameCol, numV, tags, kind, nsCol)
            else // the field must still be PRESENT: 1-per-event counts
                 // skip rows missing it (FieldNotFound, :432)
              MetricRule("counter", nameCol, when(v.isNotNull, lit(1.0)), tags, kind, nsCol)
          case "gauge" => MetricRule("gauge", nameCol, numV, tags, "absolute", nsCol)
          case "set" =>
            // gauge/histogram rows with unparseable values SKIP — that
            // is the reference's ParseFloatError path. A set member is
            // NEVER parsed there (any value becomes a string member),
            // so silently dropping a string-typed set field would be a
            // divergence, not an error analog: refuse at plan time.
            fv.t match {
              case VInt | VFloat | VAny => ()
              case t => throw VrlUnsupported(s"set rule over a $t field " +
                "(the flat model's set members ride the numeric value " +
                "column; cast in a remap upstream or use Metrics.logToMetric)")
            }
            MetricRule("set", nameCol, numV, tags, "incremental", nsCol)
          case "histogram" | "summary" =>
            MetricRule("distribution", nameCol, numV, tags, "incremental", nsCol)
          case other => throw VrlUnsupported(s"metric type $other")
        }
      }
      val out = graft.operators.Metrics.logToMetric(in.df, compiled, ts = tsCol,
        passthrough = Seq(SeqCol -> col(SeqCol)))
      Frame(out, MetricMeta, metric = true)
    }
  }

  /** Config-driven aggregate (src/transforms/aggregate.rs): tumbling
    * EVENT-time windows of `interval_ms` per metric series, one mode
    * (the processing-time flush divergence is documented on
    * [[graft.operators.Aggregate]]). Series identity here includes
    * `value_type` (and for Count, `kind`): the reference keys on
    * (name, namespace, tags) and errors conflicting updates away
    * (AggregateUpdateFailed) when one series mixes kinds or value
    * types; grouping on the full identity is the deterministic batch
    * analog — identical output on well-formed streams, no
    * order-dependent error path on mixed ones. Mode ↔ kind filters
    * follow aggregate.rs record(): sum = incremental only; latest/diff/
    * max/min = absolute only; mean/stdev = absolute gauges only;
    * count = both kinds, emitting counters; auto = sum-incremental /
    * last-absolute.
    */
  private def aggregateConfig(name: String, cfg: TTab, in: Frame): Frame = {
    requireMetricFrame(name, "aggregate", in)
    val intervalMs = cfg.long("interval_ms").getOrElse(10000L)
    if (intervalMs <= 0 || intervalMs % 1000 != 0) throw VrlUnsupported(
      s"aggregate interval_ms $intervalMs (event-time windows are whole seconds here)")
    val secs = intervalMs / 1000
    import graft.operators.Aggregate
    val df = in.df
    val series = Seq(col("name"), col("namespace"), col("tags"), col("value_type"))
    val ord = struct(col("ts"), col(SeqCol))
    def run(d: DataFrame, m: Aggregate.Mode, kindOut: String): DataFrame =
      Aggregate.tumbling(d, series, col("ts"), col("value"), m, secs, Some(ord))
        .withColumn("kind", lit(kindOut))
    val absOnly = df.filter(col("kind") === "absolute")
    val agg = cfg.str("mode").getOrElse("auto").toLowerCase match {
      case "auto" =>
        Aggregate.tumblingAutoKind(df, series, col("ts"), col("value"),
          secs, ord, col("kind"))
      case "sum" => run(df.filter(col("kind") === "incremental"), Aggregate.Sum, "incremental")
      case "latest" => run(absOnly, Aggregate.Latest, "absolute")
      case "diff" => run(absOnly, Aggregate.Diff, "absolute")
      case "count" =>
        Aggregate.tumbling(df,
            Seq(col("name"), col("namespace"), col("tags"), col("kind")),
            col("ts"), col("value"), Aggregate.Count, secs, Some(ord))
          .withColumn("value_type", lit("counter"))
      case "max" => run(absOnly, Aggregate.Max, "absolute")
      case "min" => run(absOnly, Aggregate.Min, "absolute")
      case "mean" =>
        run(absOnly.filter(col("value_type") === "gauge"), Aggregate.Mean, "absolute")
      case "stdev" =>
        run(absOnly.filter(col("value_type") === "gauge"), Aggregate.Stdev, "absolute")
      case other => throw VrlUnsupported(s"aggregate mode $other")
    }
    // window start becomes the flushed metric's event time; a content
    // hash re-seeds `__seq` (an aggregated row has no arrival identity)
    val shaped = agg
      .withColumn("ts", col("win").cast("timestamp"))
      .withColumn("value", col("value").cast("double"))
      .drop("win")
    val cols = MetricMeta.types.keys.toSeq
    val out = shaped
      .withColumn(SeqCol, xxhash64(cols.map(c => col(s"`$c`")): _*))
      .select(col(SeqCol) +: cols.map(c => col(s"`$c`")): _*)
    Frame(out, MetricMeta, metric = true)
  }

  /** [[aggregateConfig]]'s streaming form: the same per-series tumbling
    * windows as a watermarked Structured Streaming aggregation (append
    * mode). State per (series, window) is one agg buffer, dropped once
    * the watermark passes — bounded by live series × in-flight windows
    * regardless of throughput. Modes needing cross-window or in-window
    * ORDER state beyond an aggregate buffer (auto's last-absolute
    * scan, diff's previous-window lag) refuse; sum/count/max/min/mean/
    * stdev/latest map 1:1 onto streaming-safe aggregates (latest =
    * max_by on the (ts, __seq) struct — a plain agg buffer).
    */
  private def aggregateStreamingConfig(name: String, cfg: TTab, in: Frame,
                                       delay: String): Frame = {
    requireMetricFrame(name, "aggregate", in)
    val intervalMs = cfg.long("interval_ms").getOrElse(10000L)
    if (intervalMs <= 0 || intervalMs % 1000 != 0) throw VrlUnsupported(
      s"aggregate interval_ms $intervalMs (event-time windows are whole seconds here)")
    val secs = intervalMs / 1000
    val dfw = in.df.withWatermark("ts", delay)
    val winCol = window(col("ts"), s"$secs seconds")
    val series = Seq(col("name"), col("namespace"), col("tags"), col("value_type"))
    val ord = struct(col("ts"), col(SeqCol))
    def grouped(d: DataFrame, keys: Seq[Column]) = d.groupBy(keys :+ winCol.as("__w"): _*)
    val absOnly = dfw.filter(col("kind") === "absolute")
    def withKind(d: DataFrame, k: String) = d.withColumn("kind", lit(k))
    val agg = cfg.str("mode").getOrElse("auto").toLowerCase match {
      case "sum" => withKind(
        grouped(dfw.filter(col("kind") === "incremental"), series)
          .agg(sum(col("value")).as("value")), "incremental")
      case "count" =>
        grouped(dfw, Seq(col("name"), col("namespace"), col("tags"), col("kind")))
          .agg(count(lit(1)).as("value"))
          .withColumn("value_type", lit("counter"))
      case "latest" => withKind(
        grouped(absOnly, series).agg(max_by(col("value"), ord).as("value")), "absolute")
      case "max" => withKind(grouped(absOnly, series).agg(max(col("value")).as("value")), "absolute")
      case "min" => withKind(grouped(absOnly, series).agg(min(col("value")).as("value")), "absolute")
      case "mean" => withKind(
        grouped(absOnly.filter(col("value_type") === "gauge"), series)
          .agg((sum(col("value")) / count(col("value"))).as("value")), "absolute")
      case "stdev" => withKind(
        grouped(absOnly.filter(col("value_type") === "gauge"), series)
          .agg(stddev_pop(col("value")).as("value")), "absolute")
      case other => throw VrlUnsupported(
        s"aggregate mode $other on a streaming source (auto/diff need " +
          "order state beyond an aggregate buffer)")
    }
    val shaped = agg
      .withColumn("ts", col("__w.start"))
      .withColumn("value", col("value").cast("double"))
      .drop("__w")
    val cols = MetricMeta.types.keys.toSeq
    val out = shaped
      .withColumn(SeqCol, xxhash64(cols.map(c => col(s"`$c`")): _*))
      .select(col(SeqCol) +: cols.map(c => col(s"`$c`")): _*)
    Frame(out, MetricMeta, metric = true)
  }

  /** Config-driven tag_cardinality_limit
    * (src/transforms/tag_cardinality_limit/config.rs): per tag KEY, the
    * first `value_limit` distinct values (first-seen = min `__seq`, the
    * deterministic batch analog of arrival order) are accepted; beyond
    * that, drop_tag strips the offending tag and drop_event drops the
    * row. `per_metric_limits` overrides follow the reference's tracking
    * partition (mod.rs:30-56, 130-141): a metric matching an override's
    * name (+ optional namespace) tracks its tag sets under its OWN
    * group with its own limit/action; everything else shares the global
    * group. Runs over the flat frame's canonical tags string: parse to
    * a map, judge per entry, rebuild (sorted — the canonical form). Tag
    * values containing '=' or ',' are outside the canonical string form
    * (the typed-column operator Metrics.tagCardinalityLimit is the
    * general path).
    *
    * Shuffle shape: first-seen is one map-side-combined (group, key,
    * value) hash agg; the rank window partitions on (group, tag key)
    * and its foldable rank bound gets a map-side partial top-K
    * (InferWindowGroupLimit), so no unbounded value domain funnels
    * through one partition. Only the KEPT pairs — ≤ |groups| × |keys| ×
    * value_limit, the same bounded state the reference's per-key
    * HashSets hold in one process — reach the driver, becoming a
    * broadcast-literal lookup map. Past [[Topology.TagLimitBroadcastCap]]
    * kept pairs the transform switches to [[tagLimitJoined]], the fully
    * distributed join form — no driver materialization at any config.
    */
  private def tagLimitConfig(name: String, cfg: TTab, df: DataFrame): DataFrame = {
    def modeOf(t: TTab): Unit = t.str("mode").foreach {
      case "exact" => ()
      case other => throw VrlUnsupported(s"tag_cardinality_limit mode $other " +
        "(exact tracking is strictly tighter than the bloom cache)")
    }
    // clamp: a >2^31 config value must not truncate negative via toInt
    def limitOf(t: TTab): Int = {
      val l = t.long("value_limit").getOrElse(500L)
      require(l >= 0, s"tag_cardinality_limit: negative value_limit $l")
      math.min(l, Int.MaxValue.toLong).toInt
    }
    def dropEventOf(t: TTab): Boolean =
      t.str("limit_exceeded_action").getOrElse("drop_tag") match {
        case "drop_tag" => false
        case "drop_event" => true
        case other => throw new IllegalArgumentException(s"limit_exceeded_action $other")
      }
    modeOf(cfg)
    // per-override groups "g0","g1",… + the shared global group ""
    final case class Grp(id: String, limit: Int, dropEvent: Boolean)
    val overrides: Seq[(Column, Grp)] =
      cfg.tab("per_metric_limits").map(_.entries.toSeq.collect {
        case (mName, t: TTab) => (mName, t)
      }).getOrElse(Nil).zipWithIndex.map { case ((mName, t), i) =>
        modeOf(t)
        val cond = t.str("namespace") match {
          case Some(ns) => col("name") === mName && col("namespace") === ns
          case None => col("name") === mName
        }
        cond -> Grp(s"g$i", limitOf(t), dropEventOf(t))
      }
    val global = Grp("", limitOf(cfg), dropEventOf(cfg))
    val grps = overrides.map(_._2) :+ global
    val grpCol: Column = overrides.foldRight(lit(global.id)) {
      case ((cond, g), rest) => when(cond, lit(g.id)).otherwise(rest)
    }
    val limitLit = typedLit(grps.map(g => g.id -> g.limit).toMap)

    val hasTags = col("tags").isNotNull && col("tags") =!= ""
    val entries = expr("str_to_map(tags, ',', '=')")
    val firstSeen = df.filter(hasTags)
      .select(grpCol.as("__g"), explode(entries).as(Seq("__k0", "__v0")),
        col(SeqCol).as("__ord"))
      // a bare tag ("host" with no '=') parses to a null map value;
      // normalize to "" everywhere (here, in the lambdas, in the
      // rebuild) so three-valued logic can't silently drop in-limit
      // rows and the driver sort never sees null
      .select(col("__g"), col("__k0").as("__k"),
        coalesce(col("__v0"), lit("")).as("__v"), col("__ord"))
      .groupBy(col("__g"), col("__k"), col("__v"))
      .agg(min(col("__ord")).as("__first"))
    // The rank window alone would put one KEY's whole distinct-value
    // domain in one task — unbounded for a high-cardinality key (user
    // ids). The FOLDABLE `<= maxLimit` conjunct lets Catalyst's
    // InferWindowGroupLimit (SPARK-37099) insert a map-side partial
    // top-K below the window's shuffle — each mapper emits at most
    // maxLimit rows per (group, key) — and the non-foldable per-group
    // bound then applies exactly on the survivors.
    import org.apache.spark.sql.expressions.Window
    val maxLimit = lit(grps.map(_.limit).max)
    val limitOfG = element_at(limitLit, col("__g"))
    val ranked = firstSeen.withColumn("__rank",
      row_number().over(Window
        .partitionBy(col("__g"), col("__k")).orderBy(col("__first"), col("__v"))))
    val keptDf = ranked
      .filter(col("__rank") <= maxLimit && col("__rank") <= limitOfG)
      .select(col("__g"), col("__k"), col("__v"))
    val cap = Topology.TagLimitBroadcastCap
    val keptRows = keptDf.limit(cap + 1).collect()
    if (keptRows.length > cap)
      // kept set too big for a driver literal: the fully distributed
      // join path (below) — same semantics, two more shuffles
      return tagLimitJoined(df, keptDf, grpCol, hasTags, entries,
        grps.filter(_.dropEvent).map(_.id), grps.filterNot(_.dropEvent).map(_.id))
    // composite (group, key) literal-map key; '=' can never appear
    // in a canonical tag key (it terminates the key)
    val kept: Map[String, Seq[String]] =
      keptRows.map(r => (r.getString(0) + "=" + r.getString(1), r.getString(2))).toSeq
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    val keptLit = typedLit(kept)
    // try_element_at: under ANSI mode a plain element_at THROWS on a
    // missing map key (e.g. value_limit = 0 leaves the map empty);
    // coalesce(v, "") mirrors the bare-tag normalization above
    def allowed(g: Column, k: Column, v: Column): Column =
      array_contains(coalesce(
        try_element_at(keptLit, concat(g, lit("="), k)),
        typedLit(Seq.empty[String])), coalesce(v, lit("")))

    val dropEventIds = grps.filter(_.dropEvent).map(_.id)
    val g = grpCol
    val violates = hasTags && exists(map_entries(entries),
      e => !allowed(g, e.getField("key"), e.getField("value")))
    val filtered =
      if (dropEventIds.isEmpty) df
      else df.filter(!(g.isin(dropEventIds.map(x => x: Any): _*) && violates))
    val dropTagIds = grps.filterNot(_.dropEvent).map(_.id)
    if (dropTagIds.isEmpty) filtered
    else {
      val rebuilt = array_join(transform(
        filter(sort_array(map_entries(entries)),
          e => allowed(g, e.getField("key"), e.getField("value"))),
        e => concat_ws("=", e.getField("key"), e.getField("value"))), ",")
      filtered.withColumn("tags",
        when(hasTags && g.isin(dropTagIds.map(x => x: Any): _*), rebuilt)
          .otherwise(col("tags")))
    }
  }

  /** The distributed arm of config tag_cardinality_limit, taken when
    * the kept set exceeds [[Topology.TagLimitBroadcastCap]]: instead of
    * a driver literal, exploded tag entries LEFT-join the kept-pair
    * frame on (group, key, value) and re-aggregate per row — two extra
    * shuffles (the join and the per-row groupBy), both on bounded keys,
    * nothing driver-sized. Identical semantics to the broadcast arm
    * (the spec runs both on the same input and diffs). The input is
    * persisted because the row id (`monotonically_increasing_id`) is
    * nondeterministic under recomputation and the frame feeds both the
    * explode and the final join-back.
    */
  private def tagLimitJoined(df: DataFrame, keptDf: DataFrame, grpCol: Column,
                             hasTags: Column, entries: Column,
                             dropEventIds: Seq[String],
                             dropTagIds: Seq[String]): DataFrame = {
    val withId = df.withColumn("__rid", monotonically_increasing_id())
      .withColumn("__g", grpCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the returned plan consumes the cache lazily, so it cannot be
    // unpersisted here. A long-lived session running many tag-limit
    // configs would accumulate pinned partitions, so the leak is
    // bounded by a FIFO of the most recent caches — NOT by eagerly
    // unpersisting the single previous one, which would let a second
    // concurrent topology evaluation on the same SparkSession release
    // a cache an in-flight plan still depends on (reintroducing the
    // monotonically_increasing_id nondeterminism the persist exists to
    // prevent). More than TagLimitCacheKeep simultaneously-in-flight
    // tag-limit join plans is the documented bound.
    Topology.synchronized {
      Topology.tagLimitCaches.enqueue(withId)
      while (Topology.tagLimitCaches.size > Topology.TagLimitCacheKeep)
        Topology.tagLimitCaches.dequeue().unpersist(blocking = false)
    }
    // normalized __v ("" for bare tags) drives the membership check,
    // the ORIGINAL __v0 drives the rebuild (concat_ws skips a null so
    // a bare tag rebuilds as "host", not "host=") — mirroring the
    // broadcast arm's coalesce-for-lookup / raw-for-rebuild split
    val ex = withId.filter(hasTags)
      .select(col("__rid"), col("__g"), explode(entries).as(Seq("__k", "__v0")))
      .withColumn("__v", coalesce(col("__v0"), lit("")))
    val marked = ex.join(keptDf.withColumn("__ok", lit(true)),
      Seq("__g", "__k", "__v"), "left")
    val perRow = marked.groupBy(col("__rid")).agg(
      max(when(col("__ok").isNull, 1).otherwise(0)).as("__viol"),
      array_join(transform(array_sort(collect_list(
          when(col("__ok").isNotNull, struct(col("__k"), col("__v0"))))),
        e => concat_ws("=", e.getField("__k"), e.getField("__v0"))), ",")
        .as("__rebuilt"))
    val joined = withId.join(perRow, Seq("__rid"), "left")
    val viol = coalesce(col("__viol") === 1, lit(false))
    val filtered = if (dropEventIds.isEmpty) joined
      else joined.filter(!(col("__g").isin(dropEventIds.map(x => x: Any): _*) && viol))
    val out = if (dropTagIds.isEmpty) filtered
      else filtered.withColumn("tags",
        when(hasTags && col("__g").isin(dropTagIds.map(x => x: Any): _*),
          coalesce(col("__rebuilt"), lit(""))).otherwise(col("tags")))
    out.drop("__rid", "__g", "__viol", "__rebuilt")
  }

  /** Transforms whose batch form depends on a global arrival order
    * (window over `__seq`) refuse on a streaming frame rather than
    * compile a plan Spark would reject at query start with an opaque
    * error; their cross-batch stateful forms live in
    * `graft.streaming.StreamOps` (token-bucket throttle, session
    * reduce, watermarked dedupe) for callers on the library surface.
    */
  /** Template-valued config options (throttle `key_field`, sample
    * `group_by` — both `Template` in the reference): a value with
    * template tokens compiles render-STRICT (a null referenced field
    * fails the whole render → null, the reference's
    * TemplateRenderingError → None); a bare string stays a field path
    * — the reference would render it as a constant (one shared
    * bucket/group, same as omitting the option — a useless config),
    * so the path reading is the only useful one.
    */
  private def templateOrPath(env: Env, ts: Column, p: String): Column =
    if (graft.functions.Template.isTemplate(p)) {
      val rendered = graft.functions.Template.compile(
        p, ts, f => resolveField(env, parsePathStr(f)).col.cast("string"))
      graft.functions.Template.fields(p) match {
        case Seq() => rendered
        case refs => when(refs.map(f =>
          resolveField(env, parsePathStr(f)).col.isNotNull)
          .reduce(_ && _), rendered)
      }
    } else resolveField(env, parsePathStr(p)).col

  private def requireBatch(in: Frame, t: String): Unit =
    if (in.df.isStreaming)
      throw VrlUnsupported(s"transform type '$t' on a streaming source " +
        "(cross-batch ordered state: use graft.streaming.StreamOps)")

  /** Type-tagged portable dedupe key for one match path: JSON encoding
    * distinguishes `1` / `"1"` / `{"c":"d"}` the way the reference's
    * typed match keys do (src/transforms/dedupe/common.rs).
    */
  private def dedupeKey(env: Env, path: String): Column = {
    val cv = resolveField(env, parsePathStr(path))
    to_json(struct(cv.col.as("v")))
  }

  // ----------------------------------------------------------- reduce
  /** Config-driven reduce: group_by + ends_when/max_events session cuts
    * + per-field merge strategies with the reference's defaults —
    * numbers sum, timestamps window to (field, field_end), everything
    * else keeps the first present value
    * (src/transforms/reduce/transform.rs:85-127, merge_strategy.rs).
    */
  private def reduce(name: String, cfg: TTab, in: Frame): Frame = {
    val env = envFromDf(in.df, in.meta)
    val groupPaths = cfg.strArr("group_by")
    val groupCols = groupPaths.map(p => resolveField(env, parsePathStr(p)).col)
    val endsWhen = cfg.get("ends_when").map(v => Conditions.compile(Some(v), in, enrichmentTables))
    val startsWhen = cfg.get("starts_when").map(v => Conditions.compile(Some(v), in, enrichmentTables))
    // reference reduce/config.rs build(): setting both is a config error
    if (endsWhen.isDefined && startsWhen.isDefined)
      throw new IllegalArgumentException(
        s"reduce $name: ends_when and starts_when are mutually exclusive")
    val maxEvents = cfg.long("max_events").map(_.toInt)
    val strategies: Map[String, String] = cfg.tab("merge_strategies") match {
      case Some(t) => t.entries.toSeq.collect { case (k, TStr(s)) => k -> s }.toMap
      case None => Map.empty
    }

    // group keys materialized under reserved names so the post-agg
    // projection can't collide with same-named event fields
    val cut = graft.operators.Reduce.sessionIds(
        in.df, groupCols, col(SeqCol), endsWhen, maxEvents, startsWhen)
      .withColumns(groupPaths.indices.map(i => s"__g$i" -> groupCols(i)).toMap)
    val gKeys = groupPaths.indices.map(i => col(s"__g$i")) :+ col("session_id")
    val ord = col(SeqCol)
    val groupSet = groupPaths.toSet
    import graft.operators.Reduce.Strategy

    def firstPresent(v: Column): Column = min_by(v, when(v.isNotNull, ord))

    val aggs = mutable.ArrayBuffer.empty[Column]
    val outTypes = mutable.ArrayBuffer.empty[(String, VT)]
    in.meta.types.foreach { case (n, t) =>
      val v = in.df.col(s"`$n`")
      if (groupSet(n)) {
        aggs += first(col(s"__g${groupPaths.indexOf(n)}")).as(n)
        outTypes += (n -> t)
      } else strategies.get(n) match {
        case Some(s) =>
          val (c, ot) = s match {
            case "discard" => (Strategy.discard(v, ord), t)
            case "retain" => (Strategy.retain(v, ord), t)
            case "sum" => (Strategy.sumS(v), t)
            case "max" => (Strategy.maxS(v), t)
            case "min" => (Strategy.minS(v), t)
            case "array" => (Strategy.array(v, ord), VHetFromArray(t))
            case "concat" => t match {
              // reference Concat appends ARRAY fields element-wise
              // (merge_strategy.rs Concat on Value::Array); the
              // space-join applies to strings only. Null rows (field
              // absent on that event) contribute nothing.
              case VArrOf(e) =>
                (flatten(filter(Strategy.array(v, ord), x => x.isNotNull)),
                  VArrOf(e))
              case _ => (Strategy.concat(v.cast("string"), ord), VStr)
            }
            case "concat_newline" => (Strategy.concatNewline(v.cast("string"), ord), VStr)
            case "concat_raw" => (Strategy.concatRaw(v.cast("string"), ord, ""), VStr)
            case "flat_unique" =>
              // reference FlatUnique flattens nested values: an array
              // field contributes its ELEMENTS to the distinct set, not
              // the arrays themselves
              def arrDepth(tt: VT): Int =
                tt match { case VArrOf(e) => 1 + arrDepth(e); case _ => 0 }
              def arrElem(tt: VT): VT =
                tt match { case VArrOf(e) => arrElem(e); case e => e }
              val d = arrDepth(t)
              if (d == 0) (Strategy.flatUnique(v), VHetFromArray(t))
              else {
                val flatV = (1 until d).foldLeft(v)((c, _) => flatten(c))
                (Strategy.flatUniqueArray(flatV), VHetFromArray(arrElem(t)))
              }
            case "shortest_array" => (Strategy.shortestArray(v.cast("array<string>")), VArrOf(VStr))
            case "longest_array" => (Strategy.longestArray(v.cast("array<string>")), VArrOf(VStr))
            case other => throw VrlUnsupported(s"merge strategy $other")
          }
          aggs += c.as(n); outTypes += (n -> ot)
        case None => t match {
          case VInt | VFloat =>
            aggs += sum(v).cast(if (t == VInt) "bigint" else "double").as(n)
            outTypes += (n -> t)
          case VTime =>
            aggs += min(v).as(n); outTypes += (n -> VTime)
            aggs += max(v).as(s"${n}_end"); outTypes += (s"${n}_end" -> VTime)
          case _ =>
            aggs += firstPresent(v).as(n); outTypes += (n -> t)
        }
      }
    }
    val grouped = cut
      .groupBy(gKeys: _*)
      .agg(min(ord).as(SeqCol), aggs.toSeq: _*)
      .select(col(SeqCol) +: outTypes.toSeq.map { case (n, _) => col(s"`$n`") }: _*)
    Frame(grouped, EventMeta(ListMap(outTypes.toSeq: _*), None), in.metric)
  }

  private def VHetFromArray(elem: VT): VT = VArrOf(elem)

  // --------------------------------------------------- sources / sinks

  val sources: ListMap[String, TTab] =
    root.tab("sources") match {
      case Some(t) =>
        ListMap(t.entries.toSeq.collect { case (n, tab: TTab) => n -> tab }: _*)
      case None => ListMap.empty
    }

  val sinkDefs: ListMap[String, TTab] =
    root.tab("sinks") match {
      case Some(t) =>
        ListMap(t.entries.toSeq.collect { case (n, tab: TTab) => n -> tab }: _*)
      case None => ListMap.empty
    }

  // ----------------------------------------------------------- graph

  /** An `inputs` entry addresses `component` or `component.port`; the
    * port splits off only when the root names a declared component
    * (the reference parses ports against known outputs the same way).
    */
  private def edgeOf(input: String): (String, Option[String]) = {
    val i = input.indexOf('.')
    if (i > 0 && (transforms.contains(input.take(i)) || sources.contains(input.take(i))))
      (input.take(i), Some(input.drop(i + 1)))
    else (input, None)
  }

  private def edges(id: String, cfg: TTab, dot: Boolean): Seq[String] =
    cfg.strArr("inputs").map { in =>
      edgeOf(in) match {
        case (c, Some(p)) if dot => s"""  "$c" -> "$id" [label="$p"]"""
        case (c, None) if dot    => s"""  "$c" -> "$id""""
        case (c, Some(p))        => s"  $c -->|$p| $id"
        case (c, None)           => s"  $c --> $id"
      }
    }

  /** `vector graph` DOT rendering (src/graph.rs:122-188): sources are
    * trapezium nodes, transforms diamond, sinks invtrapezium; edges
    * carry the output port as a label when an input addresses
    * `component.port`. Pure config — no Spark session, no data.
    */
  def toDot: String = {
    val lines =
      sources.keys.map(id => s"""  "$id" [shape="trapezium"]""") ++
      transforms.flatMap { case (id, cfg) =>
        s"""  "$id" [shape="diamond"]""" +: edges(id, cfg, dot = true)
      } ++
      sinkDefs.flatMap { case (id, cfg) =>
        s"""  "$id" [shape="invtrapezium"]""" +: edges(id, cfg, dot = true)
      }
    ("digraph {" +: lines.toSeq :+ "}").mkString("\n")
  }

  /** `vector graph --format mermaid` (src/graph.rs:190-230). */
  def toMermaid: String = {
    val lines =
      Seq("", "  %% Sources") ++
      sources.keys.map(id => s"  $id[/$id/]") ++
      Seq("", "  %% Transforms") ++
      transforms.flatMap { case (id, cfg) =>
        s"  $id{$id}" +: edges(id, cfg, dot = false)
      } ++
      Seq("", "  %% Sinks") ++
      sinkDefs.flatMap { case (id, cfg) =>
        s"  $id[\\$id\\]" +: edges(id, cfg, dot = false)
      }
    ("flowchart TD;" +: lines).mkString("\n")
  }

  /** `[sources.<name>]` blocks -> input frames (the config analog of
    * the reference's source components, scoped to what a batch table
    * engine can honestly provide):
    *   - `type = "parquet"` (path): a typed table scan — the Spark
    *     analog of the reference's structured inputs;
    *   - `type = "file"` (path): text lines into a `message` field with
    *     `decoding.codec = "bytes"` semantics (src/sources/file/) —
    *     structured codecs are remap's job downstream, exactly like a
    *     `decoding.codec = bytes` + remap pipeline in the reference.
    * The non-event `__seq` arrival column is a content hash: a batch
    * table has no arrival order, so order-sensitive transforms get a
    * DETERMINISTIC tiebreak rather than a partition-dependent one.
    */
  def loadSources(spark: org.apache.spark.sql.SparkSession): Map[String, Frame] =
    sources.map { case (name, cfg) =>
      // lazy: demo_logs has no path
      lazy val path = resolvePath(cfg.str("path").getOrElse(
        throw new IllegalArgumentException(s"source $name: no path")))
      val frame = cfg.str("type") match {
        case Some("demo_logs") => demoLogs(spark, name, cfg)
        case Some("exec") => execSource(spark, name, cfg)
        case Some("http_client") => httpClientSource(spark, name, cfg)
        case Some("prometheus_scrape") =>
          prometheusScrapeSource(spark, name, cfg)
        case Some("host_metrics") => hostMetrics(spark, name, cfg)
        case Some("static_metrics") => staticMetrics(spark, name, cfg)
        case Some("parquet") =>
          val df = spark.read.parquet(path)
          val seq = xxhash64(df.columns.map(c => col(s"`$c`")).toSeq: _*)
          Frame(df.withColumn(SeqCol, seq), EventMeta.fromSchema(df.schema))
        case Some("socket") =>
          // a socket is a continuous byte stream; a bounded batch
          // evaluation has nothing to connect to "once" — the
          // streaming path (Cli run-stream) carries it
          throw VrlUnsupported(s"source $name: socket is streaming-only " +
            "(use Cli run-stream; batch runs read files/tables)")
        case Some("http_server") =>
          throw VrlUnsupported(s"source $name: http_server is " +
            "streaming-only (a push listener has no bounded batch " +
            "form — use Cli run-stream)")
        case Some("splunk_hec") =>
          throw VrlUnsupported(s"source $name: splunk_hec is " +
            "streaming-only (a push listener has no bounded batch " +
            "form — use Cli run-stream)")
        case Some("datadog_agent") =>
          throw VrlUnsupported(s"source $name: datadog_agent is " +
            "streaming-only (a push listener has no bounded batch " +
            "form — use Cli run-stream)")
        case Some("prometheus_remote_write") =>
          throw VrlUnsupported(s"source $name: prometheus_remote_write is " +
            "streaming-only (a push listener has no bounded batch " +
            "form — use Cli run-stream)")
        case Some("heroku_logs") =>
          throw VrlUnsupported(s"source $name: heroku_logs is " +
            "streaming-only (a push listener has no bounded batch " +
            "form — use Cli run-stream)")
        case Some("aws_kinesis_firehose") =>
          throw VrlUnsupported(s"source $name: aws_kinesis_firehose is " +
            "streaming-only (a push listener has no bounded batch " +
            "form — use Cli run-stream)")
        case Some("websocket") =>
          throw VrlUnsupported(s"source $name: websocket is " +
            "streaming-only (a live connection has no bounded batch " +
            "form — use Cli run-stream)")
        case Some("vector") =>
          throw VrlUnsupported(s"source $name: the vector source's gRPC " +
            "transport (no gRPC/HTTP2 stack in this engine — interop " +
            "with a live Vector via a socket/udp source with " +
            "decoding.codec = \"native_json\", the tested " +
            "vector-to-vector path)")
        case Some("kafka") =>
          throw VrlUnsupported(s"source $name: kafka is streaming-only " +
            "(a broker subscription has no bounded batch form — use " +
            "Cli run-stream)")
        case Some("internal_metrics") =>
          // reference src/sources/internal_metrics.rs: the process's
          // own counters re-enter the topology as metric events, so a
          // config can monitor itself. The registry accumulates from
          // sink deliveries (writeSinks) and Dataset.observe harvests
          // (Telemetry.Registry.harvest); this source snapshots it as
          // a flat metric frame. Totals are ABSOLUTE monotonic
          // counters, namespace `vector` by default, component under
          // the reference's `component_id` tag.
          graft.operators.Telemetry.Registry.harvest(spark)
          val ns = cfg.str("namespace").getOrElse("vector")
          val rows = graft.operators.Telemetry.Registry.snapshot()
          val now = java.sql.Timestamp.from(java.time.Instant.now())
          import spark.implicits._
          val df = rows.toDF("__c", "name", "value").select(
            col("name"),
            lit(ns).as("namespace"),
            concat(lit("component_id="), col("__c")).as("tags"),
            lit("absolute").as("kind"),
            lit("counter").as("value_type"),
            col("value").cast("double").as("value"),
            lit(now).cast("timestamp").as("ts"),
            xxhash64(col("__c"), col("name")).as(SeqCol))
          Frame(df, MetricMeta, metric = true)
        case Some("internal_logs") =>
          // reference src/sources/internal_logs.rs: the running
          // instance's own log events re-enter the topology. The
          // reference subscribes to its tracing layer; here components
          // record through Telemetry.Logs at the same emission points
          // (sink deliveries, source loads) and this source snapshots
          // the buffer. Stamps mirror the run loop: `host` under
          // host_key (default "host", "" suppresses) and `pid` under
          // pid_key (default "pid"), internal_logs.rs:104-109,190-196.
          val hostKey = cfg.str("host_key").getOrElse("host")
          val pidKey = cfg.str("pid_key").getOrElse("pid")
          val hostName = java.net.InetAddress.getLocalHost.getHostName
          val pid = ProcessHandle.current().pid()
          val entries = graft.operators.Telemetry.Logs.snapshot()
          import spark.implicits._
          val base = entries.zipWithIndex.map { case (e, i) =>
            (e.message, e.level, e.target, e.ts, i.toLong)
          }.toDF("message", "level", "target", "timestamp", SeqCol)
          val stamped0 = if (hostKey.nonEmpty)
            base.withColumn(hostKey, lit(hostName)) else base
          val stamped = if (pidKey.nonEmpty)
            stamped0.withColumn(pidKey, lit(pid)) else stamped0
          val meta = ListMap("message" -> VStr, "level" -> VStr,
            "target" -> VStr, "timestamp" -> VTime) ++
            (if (hostKey.nonEmpty) ListMap(hostKey -> VStr) else ListMap.empty[String, VT]) ++
            (if (pidKey.nonEmpty) ListMap(pidKey -> VInt) else ListMap.empty[String, VT])
          Frame(stamped.select(meta.keys.map(k => col(s"`$k`")).toSeq :+ col(SeqCol): _*),
            EventMeta(meta, None))
        case Some("syslog") =>
          // reference src/sources/syslog.rs: a listening daemon
          // (tcp/udp/unix). The STREAMING path listens on a real TCP
          // socket; a bounded batch run replays a capture file through
          // the same octet-counting-with-newline-fallback framer
          // (RFC 6587; octet_counting.rs) — the identical state
          // machine, minus the connection.
          if (cfg.str("path").isEmpty) throw VrlUnsupported(
            s"source $name: syslog listening is streaming-only " +
              "(use Cli run-stream; batch runs replay a capture file via `path`)")
          val maxLen = cfg.long("max_length").getOrElse(102400L).toInt
          val lines = framedMessages(spark, path,
            () => new Framing.OctetCounting(maxLen))
          // no connection in a replay: host is the parsed hostname only
          syslogDecode(lines.df, peer = Some(lit(null).cast("string")))
        case Some("fluent") =>
          // reference src/sources/fluent/mod.rs: a forward-protocol
          // listener. STREAMING binds the real TCP port; a bounded
          // batch run replays a msgpack capture through the identical
          // decoder (with record-schema inference the static streaming
          // schema can't offer).
          if (cfg.str("path").isEmpty) throw VrlUnsupported(
            s"source $name: fluent listening is streaming-only " +
              "(use Cli run-stream; batch runs replay a capture file via `path`)")
          fluentFileSource(spark, name, path)
        case Some("logstash") =>
          // beats/lumberjack capture replay: one decode state machine
          // per capture file through the same Lumberjack kernel the
          // live listener uses, fields schema-inferred; `timestamp` =
          // the event's parsed @timestamp (no receipt time in a
          // bounded replay — determinism), `host` = the event's own
          // host field (no peer).
          if (cfg.str("path").isEmpty) throw VrlUnsupported(
            s"source $name: logstash listening is streaming-only " +
              "(use Cli run-stream; batch runs replay a capture file via `path`)")
          logstashFileSource(spark, name, path)
        case Some("opentelemetry") =>
          // reference src/sources/opentelemetry/: a listening OTLP
          // endpoint. The STREAMING path binds the real OTLP/HTTP
          // listener (loadStreamingSources); a bounded batch run
          // replays a capture file of protobuf export-request frames
          // through the same decoder — `bytes` framing one request per
          // file by default, length/varint framing packing many (the
          // same framing set the otlp decoding codec takes).
          refuseOtlpGrpc(name, cfg)
          if (cfg.str("path").isEmpty) throw VrlUnsupported(
            s"source $name: opentelemetry listening is streaming-only " +
              "(use Cli run-stream; batch runs replay a capture file via `path`)")
          val framingTab = cfg.tab("framing")
          val method = framingTab.flatMap(_.str("method")).getOrElse("bytes")
          otlpFileSource(spark, name, path,
            Framing.builder(method, framingTab, s"source $name"))
        case Some("file") if cfg.tab("decoding")
          .flatMap(_.str("codec")).contains("otlp") =>
          // otlp is the one BINARY decoding codec (protobuf frames):
          // it takes its own path where frames stay bytes end-to-end —
          // the text path would mangle them through UTF-8. Default
          // framing is `bytes` (one file = one Export*ServiceRequest),
          // the reference's default_stream_framing for Otlp
          // (decoding/mod.rs:407); length/varint framing packs many.
          if (cfg.tab("multiline").isDefined) throw VrlUnsupported(
            s"source $name: multiline composes over text lines, not otlp frames")
          val framingTab = cfg.tab("framing")
          val method = framingTab.flatMap(_.str("method")).getOrElse("bytes")
          otlpFileSource(spark, name, path,
            Framing.builder(method, framingTab, s"source $name"))
        case Some("file") =>
          val codec = cfg.tab("decoding").flatMap(_.str("codec")).getOrElse("bytes")
          val framingTab = cfg.tab("framing")
          val framingMethod = framingTab.flatMap(_.str("method"))
            .getOrElse("newline_delimited")
          val explicitFraming = framingTab.isDefined &&
            (framingMethod != "newline_delimited" ||
              framingTab.exists(_.tab("newline_delimited").isDefined))
          if (explicitFraming && cfg.tab("multiline").isDefined)
            throw VrlUnsupported(
              s"source $name: multiline composes over newline framing " +
                s"only (framing.method = $framingMethod)")
          val linesFrame: Frame = if (explicitFraming)
            framedMessages(spark, path,
              Framing.builder(framingMethod, framingTab, s"source $name"))
          else cfg.tab("multiline") match {
            case Some(ml) =>
              // the file source's multiline aggregation
              // (src/sources/util/multiline_config.rs: start_pattern /
              // condition_pattern / mode / timeout_ms) over the EXACT
              // line_agg state machine (LineAgg.mergeWithStart).
              // wholetext + posexplode recovers the per-file line order
              // a parallel text scan can't promise; `timeout_ms` is a
              // liveness knob of the continuous machine — a bounded
              // batch always drains, so it is accepted and unused.
              def req(k: String) = ml.str(k).getOrElse(
                throw new IllegalArgumentException(
                  s"source $name: multiline needs $k"))
              val mode = req("mode") match {
                case "continue_through" => graft.operators.LineAgg.ContinueThrough
                case "continue_past" => graft.operators.LineAgg.ContinuePast
                case "halt_before" => graft.operators.LineAgg.HaltBefore
                case "halt_with" => graft.operators.LineAgg.HaltWith
                case other => throw new IllegalArgumentException(
                  s"source $name: multiline mode $other")
              }
              import spark.implicits._
              // \n\z, not \n$: Java-regex $ also matches BEFORE a final
              // line terminator, so "line1\n\n".replaceAll("\\n$","")
              // strips BOTH newlines and loses the trailing blank
              // line-event. \r?\n keeps CRLF files byte-identical to
              // the Hadoop line reader the non-multiline path uses.
              val lines = spark.read.option("wholetext", true).text(path)
                .select(input_file_name().as("key"),
                  posexplode(split(regexp_replace(col("value"), "\r?\n\\z", ""), "\r?\n")))
                .select(col("key"), col("pos").cast("long").as("lineNo"),
                  col("col").as("line"))
                .as[graft.operators.LineAgg.InLine]
              val merged = graft.operators.LineAgg.mergeWithStart(
                lines, req("start_pattern"), req("condition_pattern"), mode)
              val df = merged.toDF.select(col("text").as("message"))
              Frame(df.withColumn(SeqCol, xxhash64(col("message"))),
                EventMeta(ListMap("message" -> VStr), None))
            case None =>
              val df = spark.read.text(path).withColumnRenamed("value", "message")
              Frame(df.withColumn(SeqCol, xxhash64(col("message"))),
                EventMeta(ListMap("message" -> VStr), None))
          }
          decodeLines(spark, name, codec, linesFrame)
        case other =>
          throw VrlUnsupported(s"source $name: type ${other.getOrElse("?")}")
      }
      // internal_logs' own load is not recorded — the reference's run
      // loop likewise must not emit logs it would then receive
      if (!cfg.str("type").contains("internal_logs"))
        graft.operators.Telemetry.Logs.record("INFO", s"sources.$name",
          s"Source loaded. type=${cfg.str("type").getOrElse("?")}")
      name -> frame
    }

  /** `decoding.codec` for the file source, mirroring the reference's
    * decoding formats (lib/codecs/src/decoding/format/):
    *   - `bytes` (default): lines as a `message` field;
    *   - `json`: Spark's batch schema inference over the line set —
    *     decoded fields become top-level TYPED columns (json.rs puts
    *     the object's fields at the event root);
    *   - `syslog`: RFC 5424 via the same kernel as parse_syslog —
    *     the static fields syslog.rs inserts (message, timestamp,
    *     hostname, severity, facility, version, appname, msgid,
    *     procid) as typed columns + `structured_data` as a dynamic
    *     value (the Vector-namespace placement; the legacy namespace's
    *     SDID-at-root keys are data-dependent and have no static
    *     column form);
    *   - `gelf`: version/host/message(short_message)/timestamp/level
    *     (gelf.rs); underscore-prefixed additional fields need remap;
    *   - `influxdb`: line protocol → METRIC frame, one metric per
    *     field — name `<measurement>_<field>`, kind absolute, gauge
    *     value, canonical sorted tags (influxdb.rs, same shape as VRL
    *     parse_influxdb and the [[MetricMeta]] flat model).
    * Everything decodes as narrow codegen'd projections; `__seq` stays
    * a content hash (batch tables have no arrival order).
    */
  private def decodeLines(spark: org.apache.spark.sql.SparkSession,
                          name: String, codec: String, lines: Frame,
                          keep: Seq[(String, VT)] = Nil): Frame = {
    val msg = col("message")
    val keepCols = keep.map { case (n, _) => col(s"`$n`") }
    codec match {
      case "bytes" => lines
      case "json" =>
        if (keep.nonEmpty) throw VrlUnsupported(
          s"source $name: json decoding cannot carry request envelope " +
            "fields (inferred schema) — use bytes + remap parse_json")
        import spark.implicits._
        val df = spark.read.json(lines.df.select(msg).as[String])
        val seq = xxhash64(df.columns.map(c => col(s"`$c`")).toSeq: _*)
        Frame(df.withColumn(SeqCol, seq), EventMeta.fromSchema(df.schema))
      case "syslog" => syslogDecode(lines.df, peer = None, keep = keep)
      case "gelf" =>
        // staged: one parse per row, not one per extracted field
        val g = col("__gelf")
        // envelope fields colliding with decoded names would duplicate
        // columns (http_server always stamps `host` = peer): the
        // decoded value wins, with the envelope host as the FALLBACK —
        // the same precedence the syslog source gives its parsed
        // hostname over the connection peer
        val produced = Set("version", "host", "message", "timestamp", "level")
        val keepSafe = keep.filterNot(k => produced.contains(k._1))
        val keepColsSafe = keepSafe.map { case (n, _) => col(s"`$n`") }
        val hostCol = if (keep.exists(_._1 == "host"))
          coalesce(g.getField("host"), col("host")).as("host")
        else g.getField("host").as("host")
        val df = lines.df
          .withColumn("__gelf", graft.functions.Parsers.parseGelf(msg))
          .select(Seq(
          g.getField("version").as("version"),
          hostCol,
          g.getField("short_message").as("message"),
          timestamp_micros((g.getField("timestamp") * 1000000L).cast("long"))
            .as("timestamp"),
          g.getField("level").cast("bigint").as("level")) ++
          keepColsSafe :+ col(SeqCol): _*)
        Frame(df, EventMeta(ListMap(
          "version" -> VStr, "host" -> VStr, "message" -> VStr,
          "timestamp" -> VTime, "level" -> VInt) ++
          ListMap(keepSafe: _*), None))
      case "influxdb" =>
        if (keep.nonEmpty) throw VrlUnsupported(
          s"source $name: influxdb decoding emits metric events — " +
            "request envelope fields have no metric-model slot")
        import graft.functions.Parsers
        val m = nullif(Parsers.influxMeasurement(msg), lit(""))
        val tagStr = array_join(transform(
          filter(sort_array(map_entries(Parsers.influxTags(msg))),
            e => e.getField("value").isNotNull),
          e => concat_ws("=", e.getField("key"), e.getField("value"))), ",")
        val ts = timestamp_micros((Parsers.influxTsNanos(msg)
          .cast("decimal(38,0)") / lit(1000).cast("decimal(38,0)")).cast("long"))
        val df = lines.df
          .select(m.as("__m"), tagStr.as("tags"), ts.as("ts"), col(SeqCol),
            explode(Parsers.influxFields(msg)).as(Seq("__k", "__raw")))
          .select(
            concat(col("__m"), lit("_"), col("__k")).as("name"),
            lit(null).cast("string").as("namespace"),
            col("tags"),
            lit("absolute").as("kind"),
            lit("gauge").as("value_type"),
            when(col("__raw") === "true", 1.0)
              .when(col("__raw") === "false", 0.0)
              .otherwise(regexp_replace(col("__raw"), "[iu]$", "")
                .try_cast("double")).as("value"),
            col("ts"),
            xxhash64(col(SeqCol), col("__k")).as(SeqCol))
          // non-numeric (string) field values cannot be modelled as a
          // gauge — skipped, like influxdb.rs's FieldValue::String arm
          .filter(col("name").isNotNull && col("value").isNotNull)
        Frame(df, MetricMeta, metric = true)
      case "statsd" =>
        if (keep.nonEmpty) throw VrlUnsupported(
          s"source $name: statsd decoding emits metric events — " +
            "request envelope fields have no metric-model slot")
        // statsd/DogStatsD lines → flat metric frame
        // (src/sources/statsd/parser.rs — see StatsdCodec). A sampled
        // distribution (`|ms|@0.1`) weights its sample 1/rate times:
        // the flat model is one row per sample, so the weight explodes
        // into that many rows (samples![val => rate as u32]).
        // no filter(m.isNotNull): pushdown would alias-substitute m's
        // whole parse tree into the Filter; the weight explode below
        // drops null-m rows (null weight -> null sequence -> no rows)
        val df = graft.functions.StatsdCodec
          .withParsed(lines.df.select(msg, col(SeqCol)), msg, "m")
          .select(col("m"), col(SeqCol))
          .select(
            col("m.name").as("name"),
            lit(null).cast("string").as("namespace"),
            col("m.tags").as("tags"),
            col("m.kind").as("kind"),
            col("m.value_type").as("value_type"),
            col("m.value").as("value"),
            lit(null).cast("timestamp").as("ts"),
            col(SeqCol), col("m.weight").as("__w"))
          .select(col("name"), col("namespace"), col("tags"), col("kind"),
            col("value_type"), col("value"), col("ts"),
            // weight 0 (sample rate > 1, parser.rs `as u32`) must emit
            // ZERO rows; bare sequence(1, 0) would descend [1,0]
            explode(when(col("__w") >= 1, sequence(lit(1L), col("__w"))))
              .as("__i"), col(SeqCol))
          .select(col("name"), col("namespace"), col("tags"), col("kind"),
            col("value_type"), col("value"), col("ts"),
            xxhash64(col(SeqCol), col("__i")).as(SeqCol))
        Frame(df, MetricMeta, metric = true)
      case "native_json" =>
        // Vector's own event interchange (vector-to-vector transport:
        // a socket/http sink encoding native_json feeding this source;
        // lib/codecs/src/decoding/format/native_json.rs). This arm is
        // the METRIC interchange face: the metric envelope has a
        // static schema, so it decodes into flat metric rows under a
        // streaming-safe plan. Log/trace envelopes are schemaless BY
        // DESIGN (Kind::json()) — a static streaming schema cannot
        // hold them, so those rows DROP here (documented narrowing);
        // route log streams through `bytes` + remap `parse_json!` (the
        // batch file source's `json` codec infers them generically).
        // Flat-model narrowing within metrics, same trades as statsd:
        // set members decode numerically (non-numeric drop),
        // distribution samples explode ×rate, and the aggregated
        // histogram/summary/sketch arms drop (no single-value row
        // form; DDSketch lives in SketchExpressions for the engine's
        // own aggregation).
        if (keep.nonEmpty) throw VrlUnsupported(
          s"source $name: native_json decoding cannot carry request " +
            "envelope fields — use bytes + remap parse_json")
        val env = graft.functions.NativeJson.decode(msg)
        val df = lines.df
          .withColumn("__m", env.getField("metric"))
          .filter(col("__m").isNotNull)
          .select(
            col("__m").getField("name").as("name"),
            col("__m").getField("namespace").as("namespace"),
            when(col("__m").getField("tags").isNotNull,
              array_join(sort_array(transform(
                map_entries(col("__m").getField("tags")),
                e => concat(e.getField("key"), lit("="),
                  e.getField("value")))), ",")).as("tags"),
            col("__m").getField("kind").as("kind"),
            col("__m").getField("timestamp").try_cast("timestamp").as("ts"),
            col("__m").getField("counter").getField("value").as("__cv"),
            col("__m").getField("gauge").getField("value").as("__gv"),
            col("__m").getField("set").getField("values").as("__sv"),
            col("__m").getField("distribution").getField("samples").as("__ds"),
            col(SeqCol))
          .select(col("name"), col("namespace"), col("tags"), col("kind"),
            col("ts"),
            explode(
              when(col("__cv").isNotNull, array(struct(
                lit("counter").as("vt"), col("__cv").as("value"), lit(1L).as("w"))))
              .when(col("__gv").isNotNull, array(struct(
                lit("gauge").as("vt"), col("__gv").as("value"), lit(1L).as("w"))))
              .when(col("__sv").isNotNull, filter(transform(col("__sv"),
                v => struct(lit("set").as("vt"),
                  v.try_cast("double").as("value"), lit(1L).as("w"))),
                s => s.getField("value").isNotNull))
              .when(col("__ds").isNotNull, transform(col("__ds"),
                s => struct(lit("distribution").as("vt"),
                  s.getField("value").as("value"),
                  coalesce(s.getField("rate"), lit(1L)).as("w"))))
            ).as("__e"), col(SeqCol))
          .select(col("name"), col("namespace"), col("tags"), col("kind"),
            col("__e.vt").as("value_type"), col("__e.value").as("value"),
            col("ts"),
            explode(when(col("__e.w") >= 1,
              sequence(lit(1L), col("__e.w")))).as("__i"), col(SeqCol))
          .select(col("name"), col("namespace"), col("tags"), col("kind"),
            col("value_type"), col("value"), col("ts"),
            xxhash64(col(SeqCol), col("__i")).as(SeqCol))
        Frame(df, MetricMeta, metric = true)
      case other =>
        throw VrlUnsupported(s"source $name: decoding codec $other (use remap)")
    }
  }

  /** The RFC 5424 decode shared by `decoding.codec = "syslog"` and the
    * `syslog` SOURCE type. `peer` (the connection's remote address, when
    * there is one) adds the source's enrichment columns
    * (src/sources/syslog.rs:400-434 enrich_syslog_event): `host` =
    * parsed hostname, falling back to the peer address, and
    * `source_type = "syslog"`.
    */
  private def syslogDecode(dfIn0: DataFrame, peer: Option[Column],
                           keep: Seq[(String, VT)] = Nil): Frame = {
    val msg = col("message")
    // stage the parse as a real projection column: the Column DSL has
    // no sharing, so referencing the parse tree once per extracted
    // field would re-embed it ~13x per row (CollapseProject keeps a
    // non-cheap producer consumed more than once)
    val dfIn = dfIn0.withColumn("__syslog_v", VrlParsers.syslog(msg).cv.col)
    val v = col("__syslog_v")
    def s(n: String) = try_variant_get(v, s"$$.$n", "string")
    val statics = Seq("message", "timestamp", "hostname", "severity",
      "facility", "version", "appname", "msgid", "procid")
    val sd = try_parse_json(to_json(map_filter(
      try_variant_get(v, "$", "map<string, variant>"),
      (k, _x) => !statics.map(lit(_) === k).reduce(_ || _))))
    val base = Seq(
      s("message").as("message"),
      s("timestamp").cast("timestamp").as("timestamp"),
      s("hostname").as("hostname"),
      s("severity").as("severity"),
      s("facility").as("facility"),
      try_variant_get(v, "$.version", "bigint").as("version"),
      s("appname").as("appname"),
      s("msgid").as("msgid"),
      s("procid").as("procid"),
      sd.as("structured_data"))
    val extra = peer.toSeq.flatMap(p => Seq(
      coalesce(s("hostname"), p).as("host"),
      lit("syslog").as("source_type")))
    val keepCols = keep.map { case (n, _) => col(s"`$n`") }
    val df = dfIn.select(base ++ extra ++ keepCols :+ col(SeqCol): _*)
    val extraT = if (peer.isDefined)
      ListMap("host" -> VStr, "source_type" -> VStr) else ListMap.empty[String, VT]
    Frame(df, EventMeta(ListMap(
      "message" -> VStr, "timestamp" -> VTime, "hostname" -> VStr,
      "severity" -> VStr, "facility" -> VStr, "version" -> VInt,
      "appname" -> VStr, "msgid" -> VStr, "procid" -> VStr,
      "structured_data" -> VAny) ++ extraT ++ ListMap(keep: _*), None))
  }

  /** Byte-stream sources with a non-newline `[framing]`: whole files
    * framed by one state machine per file (framing is sequential
    * WITHIN a stream; the parallel unit IS the stream — at scale each
    * capture file frames in its own task, so a directory of captures
    * uses the full cluster; `binaryFile` never splits a file, which is
    * exactly the isolation the framer needs). Frames decode as UTF-8
    * `message` strings for the codec layer, `__seq` the content hash
    * like every batch line source.
    */
  /** `decoding.codec = "otlp"` over a file replay: binary frames cut by
    * the configured framing, each decoded with the signal-priority
    * OTLP decoder (OtlpCodec; reference decoding/format/otlp.rs) into
    * ONE event whose single field is the resourceLogs /
    * resourceMetrics / resourceSpans tree — typed through the same
    * schema-inference the json codec uses, `__seq` a content hash of
    * the decoded tree. Invalid frames drop (the reference's per-frame
    * error + continue).
    */
  /** `type = "fluent"` batch arm: replay a capture file (or dir) of
    * forward-protocol msgpack bytes through the same decoder the live
    * TCP listener uses. Record fields are schemaless by design, so the
    * batch arm infers their schema like the json codec, with `tag` /
    * `timestamp` / `source_type` as the envelope (envelope names win a
    * record-field collision — documented). One decode state machine
    * per capture file; a malformed stream keeps what decoded before
    * sync was lost (the listener's drop-connection analog).
    */
  private def fluentFileSource(spark: org.apache.spark.sql.SparkSession,
                               name: String, path: String): Frame = {
    import spark.implicits._
    val entries = spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
      .flatMap { bytes =>
        val out = Seq.newBuilder[(String, Option[Double], String)]
        var o = 0
        var ok = true
        while (ok && o < bytes.length) {
          try {
            val (m, next) = graft.functions.Fluent.decodeMessage(bytes, o)
            m.entries.foreach(e => out += ((e.tag, e.tsecs, e.record)))
            o = next
          } catch {
            case _: graft.functions.MsgPack.Truncated |
                 _: IllegalArgumentException => ok = false
          }
        }
        out.result()
      }.toDF("tag", "tsecs", "record")
    val schema = spark.read.json(entries.select("record").as[String]).schema
    val recordFields = schema.fieldNames.toSeq
      .filterNot(Set("tag", "timestamp", "source_type"))
    val df = entries.select(
      col("tag"),
      timestamp_seconds(col("tsecs")).as("timestamp"),
      lit("fluent").as("source_type"),
      from_json(col("record"), schema).as("__e"),
      xxhash64(col("tag"), col("record")).as(SeqCol))
      .select(Seq(col("tag"), col("timestamp"), col("source_type")) ++
        recordFields.map(f => col(s"__e.`$f`").as(f)) :+ col(SeqCol): _*)
    Frame(df, EventMeta(
      ListMap("tag" -> (VStr: VT), "timestamp" -> (VTime: VT),
        "source_type" -> (VStr: VT)) ++
        EventMeta.fromSchema(org.apache.spark.sql.types.StructType(
          schema.fields.filter(f => recordFields.contains(f.name)))).types,
      None))
  }

  /** `type = "logstash"` batch arm: replay beats/lumberjack capture
    * files through the [[graft.functions.Lumberjack]] kernel with
    * field-schema inference. The event's own `@timestamp` parses into
    * `timestamp` (nullable — a replay stamps no receipt time); a
    * malformed stream keeps what decoded before sync was lost.
    */
  private def logstashFileSource(spark: org.apache.spark.sql.SparkSession,
                                 name: String, path: String): Frame = {
    import spark.implicits._
    val entries = spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
      .flatMap { bytes =>
        val out = Seq.newBuilder[String]
        var o = 0
        var ok = true
        while (ok && o < bytes.length) {
          try {
            val (frames, next) = graft.functions.Lumberjack.decodeOne(bytes, o)
            frames.foreach(f => out += f.fields)
            o = next
          } catch {
            case _: graft.functions.Lumberjack.Truncated |
                 _: IllegalArgumentException => ok = false
          }
        }
        out.result()
      }.toDF("fields")
    val schema = spark.read.json(entries.select("fields").as[String]).schema
    val recordFields = schema.fieldNames.toSeq
      .filterNot(Set("timestamp", "source_type"))
    val df = entries.select(
      try_to_timestamp(get_json_object(col("fields"), "$.@timestamp"))
        .as("timestamp"),
      lit("logstash").as("source_type"),
      from_json(col("fields"), schema).as("__e"),
      xxhash64(col("fields")).as(SeqCol))
      .select(Seq(col("timestamp"), col("source_type")) ++
        recordFields.map(f => col(s"__e.`$f`").as(f)) :+ col(SeqCol): _*)
    Frame(df, EventMeta(
      ListMap("timestamp" -> (VTime: VT), "source_type" -> (VStr: VT)) ++
        EventMeta.fromSchema(org.apache.spark.sql.types.StructType(
          schema.fields.filter(f => recordFields.contains(f.name)))).types,
      None))
  }

  /** The opentelemetry source's gRPC arm (config.rs `grpc.address`,
    * grpc.rs tonic services) needs an HTTP/2 + gRPC stack this engine
    * does not carry — refused loudly, like kafka's jar gate, never
    * silently ignored.
    */
  private def refuseOtlpGrpc(name: String, cfg: TTab): Unit =
    if (cfg.tab("grpc").isDefined) throw VrlUnsupported(
      s"source $name: grpc transport (no gRPC/HTTP2 stack in this " +
        s"engine — use OTLP/HTTP: [sources.$name.http] address, and " +
        "point SDKs at http://host:port/v1/<signal>)")

  private def otlpFileSource(spark: org.apache.spark.sql.SparkSession,
                             name: String, path: String,
                             framerB: () => Framing.Framer): Frame = {
    import spark.implicits._
    val lines = spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
      .flatMap(bytes => framerB().frameAll(bytes))
      .toDF("frame")
      .select(graft.functions.OtlpCodec.parseOtlp(col("frame")).as("line"))
      .filter(col("line").isNotNull)
    val ds = lines.as[String]
    val schema = spark.read.json(ds).schema // one inference pass
    val df = lines.select(
      from_json(col("line"), schema).as("__e"),
      xxhash64(col("line")).as(SeqCol))
      .select(schema.fieldNames.map(f => col(s"__e.`$f`").as(f)).toSeq
        :+ col(SeqCol): _*)
    Frame(df, EventMeta.fromSchema(
      org.apache.spark.sql.types.StructType(schema.fields)))
  }

  private def framedMessages(spark: org.apache.spark.sql.SparkSession,
                             path: String,
                             framerB: () => Framing.Framer): Frame = {
    import spark.implicits._
    val df = spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
      .flatMap(bytes => framerB().frameAll(bytes).map(new String(_, "UTF-8")))
      .toDF("message")
    Frame(df.withColumn(SeqCol, xxhash64(col("message"))),
      EventMeta(ListMap("message" -> VStr), None))
  }

  /** `type = "demo_logs"` (reference src/sources/demo_logs.rs): fake
    * log lines for testing and demos, no external data. Formats:
    * `shuffle` (lines + sequence), `apache_common`, `apache_error`,
    * `syslog` (RFC 5424), `bsd_syslog` (RFC 3164), `json` — the
    * reference's OutputFormat set. `count` bounds the batch (the
    * reference's knob; its usize::MAX default becomes 1000 here — a
    * table source can't be endless). The reference draws from fakedata's
    * RNG; here every pick hashes the row index, so the SAME config
    * always generates the SAME table (replayable demos, stable tests)
    * and `__seq` is the true generation order. Lines parse back with
    * the matching parse_* functions (apache_common ↔ parse_apache_log,
    * syslog ↔ parse_syslog).
    */
  private def demoLogs(spark: org.apache.spark.sql.SparkSession,
                       name: String, cfg: TTab): Frame = {
    val count = cfg.long("count").getOrElse(1000L)
    val id = col("id")
    def h(salt: Int): Column = abs(xxhash64(id, lit(salt)))
    def pick(arr: Seq[String], salt: Int): Column =
      element_at(typedLit(arr), pmod(h(salt), lit(arr.size)).cast("int") + 1)
    // the generated lines hardcode Z/+0000 zone designators, so the
    // wall-clock text must be UTC regardless of the session timezone
    // (date_format renders in spark.sql.session.timeZone): shift the
    // instant by -offset(session) so the session-local rendering shows
    // the UTC wall clock
    val sessionTz = spark.conf.get("spark.sql.session.timeZone")
    val ts = to_utc_timestamp(
      timestamp_seconds(lit(1600000000L) + id), sessionTz)
    val users = Seq("frank", "alice", "bob", "carol", "-")
    val methods = Seq("GET", "POST", "PUT", "DELETE", "HEAD")
    val paths = Seq("/index.html", "/api/v1/users", "/static/app.js",
      "/health", "/search?q=spark", "/apache_pb.gif")
    val codes = Seq("200", "200", "200", "301", "404", "500")
    val hosts = Seq("web-01", "web-02", "db-01", "cache-01")
    val apps = Seq("nginx", "app", "kernel", "sshd")
    val msgs = Seq("Connection established", "Request processed",
      "Cache miss", "Retrying upstream", "Shutting down worker")
    val ip = concat(lit("192.168."), pmod(h(2), lit(256)), lit("."), pmod(h(3), lit(256)))
    val msg = cfg.str("format").getOrElse("json") match {
      case "shuffle" =>
        val lines = cfg.strArr("lines")
        if (lines.isEmpty) throw new IllegalArgumentException(
          s"source $name: shuffle format needs lines") // ShuffleDemoLogsItemsEmpty
        val base = pick(lines, 1)
        if (cfg.bool("sequence").getOrElse(false))
          concat(id.cast("string"), lit(" "), base)
        else base
      case "apache_common" =>
        concat(ip, lit(" - "), pick(users, 4),
          lit(" ["), date_format(ts, "dd/MMM/yyyy:HH:mm:ss +0000"),
          lit("] \""), pick(methods, 5), lit(" "), pick(paths, 6),
          lit(" HTTP/1.0\" "), pick(codes, 7), lit(" "), pmod(h(8), lit(10000)))
      case "apache_error" =>
        concat(lit("["), date_format(ts, "EEE MMM dd HH:mm:ss yyyy"),
          lit("] [error] [client "), ip, lit("] "), pick(msgs, 9))
      case "syslog" =>
        concat(lit("<"), pmod(h(10), lit(191)), lit(">1 "),
          date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"), lit(" "),
          pick(hosts, 11), lit(" "), pick(apps, 12), lit(" "),
          pmod(h(13), lit(9999)), lit(" ID"), pmod(h(14), lit(999)),
          lit(" - "), pick(msgs, 15))
      case "bsd_syslog" =>
        concat(lit("<"), pmod(h(10), lit(191)), lit(">"),
          date_format(ts, "MMM dd HH:mm:ss"), lit(" "), pick(hosts, 11),
          lit(" "), pick(apps, 12), lit("["), pmod(h(13), lit(9999)),
          lit("]: "), pick(msgs, 15))
      case "json" =>
        to_json(struct(
          ip.as("host"), lit("-").as("user-identifier"),
          date_format(ts, "dd/MMM/yyyy:HH:mm:ss +0000").as("datetime"),
          pick(methods, 5).as("method"), pick(paths, 6).as("request"),
          lit("HTTP/1.1").as("protocol"), pick(codes, 7).as("status"),
          pmod(h(8), lit(10000)).cast("string").as("bytes"),
          pick(paths, 16).as("referer")))
      case other => throw VrlUnsupported(s"source $name: demo_logs format $other")
    }
    Frame(spark.range(count).select(msg.as("message"), id.as(SeqCol)),
      EventMeta(ListMap("message" -> VStr), None))
  }

  /** `type = "exec"` (reference src/sources/exec/mod.rs): run a command
    * and decode its output with the shared decoding codecs
    * ([[decodeLines]]), then stamp the exec metadata the reference adds
    * per LOG event with insert-if-empty semantics (handle_event,
    * mod.rs:666-719): `stream` (stdout|stderr, STREAM_KEY), `pid`,
    * `host`, and `command`. Batch semantics = ONE scheduled run
    * (`mode = "scheduled"`; `exec_interval_secs`, default 60, doubles
    * as the reference's run timeout — a command still running after it
    * is killed and the load fails); `streaming` mode (the
    * restart-forever lifecycle) is refused. The command runs ON THE
    * DRIVER at load: the reference's exec is likewise a single-host
    * source whose output is command-sized, not corpus-sized. `__seq`
    * is the true line arrival order. No ingest wall-clock timestamp is
    * stamped (deterministic engine — same stance as the file source).
    * Non-`bytes` codecs decode stdout only: `include_stderr` (default
    * true, like the reference) must be disabled there, since a decoded
    * frame can't carry per-line stream tags through schema inference.
    */
  private def execSource(spark: org.apache.spark.sql.SparkSession,
                         name: String, cfg: TTab): Frame = {
    cfg.str("mode").getOrElse("scheduled") match {
      case "scheduled" => ()
      case "streaming" => throw VrlUnsupported(
        s"source $name: exec streaming mode (a bounded batch runs the " +
          "command once; use scheduled)")
      case other => throw new IllegalArgumentException(
        s"source $name: exec mode $other (scheduled|streaming)")
    }
    val command = cfg.strArr("command")
    require(command.nonEmpty, s"source $name: exec needs a command")
    val includeStderr = cfg.bool("include_stderr").getOrElse(true)
    val codec = cfg.tab("decoding").flatMap(_.str("codec")).getOrElse("bytes")
    if (codec != "bytes" && includeStderr) throw VrlUnsupported(
      s"source $name: include_stderr with decoding codec $codec " +
        "(structured decoding can't tag lines per stream; set " +
        "include_stderr = false)")
    val timeoutSecs = cfg.tab("scheduled").flatMap(_.long("exec_interval_secs"))
      .getOrElse(60L)

    val pb = new ProcessBuilder(command: _*)
    cfg.str("working_directory").foreach(d =>
      pb.directory(new java.io.File(resolvePath(d))))
    if (cfg.bool("clear_environment").getOrElse(false)) pb.environment().clear()
    cfg.tab("environment").foreach(_.entries.foreach {
      case (k, TStr(v)) => pb.environment().put(k, v)
      case (k, other) => throw new IllegalArgumentException(
        s"source $name: environment.$k must be a string, got $other")
    })
    val proc = pb.start()
    proc.getOutputStream.close() // stdin not needed (mod.rs:663)
    // drain BOTH pipes on reader threads (sequential reads deadlock
    // once the unread pipe's buffer fills) so the MAIN thread owns the
    // timed wait — a command that hangs while holding its pipes open
    // must still be killed after exec_interval_secs
    def drain(in: java.io.InputStream) = {
      val ref = new java.util.concurrent.atomic.AtomicReference[Vector[String]](Vector.empty)
      val t = new Thread(() => {
        val src = scala.io.Source.fromInputStream(in, "UTF-8")
        try ref.set(src.getLines().toVector)
        catch { case _: java.io.IOException => () } // killed mid-read
        finally src.close()
      })
      t.setDaemon(true); t.start()
      (ref, t)
    }
    val (outRef, outT) = drain(proc.getInputStream)
    val (errRef, errT) = drain(proc.getErrorStream)
    if (!proc.waitFor(timeoutSecs, java.util.concurrent.TimeUnit.SECONDS)) {
      proc.destroyForcibly()
      throw new IllegalStateException(
        s"source $name: command ${command.head} exceeded exec_interval_secs=" +
          s"$timeoutSecs and was killed")
    }
    outT.join(10000); errT.join(10000)
    val pid = proc.pid()

    import spark.implicits._
    val tagged: Seq[(String, String, Long)] =
      (outRef.get().map((_, "stdout")) ++
        (if (includeStderr) errRef.get().map((_, "stderr")) else Vector.empty))
        .zipWithIndex.map { case ((line, stream), i) => (line, stream, i.toLong) }
    val lines = tagged.toDF("message", "__stream", SeqCol)
    // bytes is the identity codec: keep the per-line stream tag as a
    // real column (a typedLit seq→tag map would inline an output-sized
    // literal into the plan); structured codecs re-infer rows, so they
    // run stdout-only (guarded above) and tag a constant
    val decoded =
      if (codec == "bytes")
        Frame(lines.withColumnRenamed("__stream", "stream"),
          EventMeta(ListMap("message" -> VStr, "stream" -> VStr), None))
      else decodeLines(spark, name, codec,
        Frame(lines.drop("__stream"), EventMeta(ListMap("message" -> VStr), None)))
    if (decoded.metric) decoded // handle_event stamps logs only
    else {
      val streamCol = lit("stdout")
      val host = java.net.InetAddress.getLocalHost.getHostName
      val stamps: Seq[(String, Column, VT)] = Seq(
        ("stream", streamCol, VStr),
        ("pid", lit(pid), VInt),
        ("host", lit(host), VStr),
        ("command", typedLit(command), VArrOf(VStr)))
      val missing = stamps.filterNot { case (c, _, _) => decoded.df.columns.contains(c) }
      Frame(
        missing.foldLeft(decoded.df) { case (d, (c, v, _)) => d.withColumn(c, v) },
        EventMeta(decoded.meta.types ++ missing.map { case (c, _, t) => c -> t },
          decoded.meta.rootT))
    }
  }

  /** `type = "http_client"` (reference src/sources/http_client/
    * client.rs): call an endpoint and decode the response into events.
    * Batch semantics = ONE scrape (`scrape_interval_secs` is the
    * continuous poll cadence, accepted and unused); the response body
    * is newline-framed (the reference's default_framing_message_based
    * per response becomes per line here — the codecs are line codecs)
    * and runs through the shared decoding codecs. `query` parameters
    * (static `key = ["v", …]` lists) and `headers` (same shape) are
    * applied to the request; `method` defaults to GET; `auth` is
    * refused like the http sink (credential handling out of scope,
    * accepting-then-ignoring would scrape unauthenticated). A non-2xx
    * status fails the load loudly — the batch analog of the
    * reference's scrape-error event drop, made visible. No
    * source_type/ingest-timestamp stamps (deterministic engine).
    */
  private def httpClientSource(spark: org.apache.spark.sql.SparkSession,
                               name: String, cfg: TTab): Frame = {
    if (cfg.tab("auth").isDefined) throw VrlUnsupported(
      s"source $name: http_client auth (credential handling out of scope)")
    val endpoint = cfg.str("endpoint").getOrElse(
      throw new IllegalArgumentException(s"source $name: no endpoint"))
    require(endpoint.startsWith("http://") || endpoint.startsWith("https://"),
      s"source $name: endpoint '$endpoint' must be http(s)://")
    val method = cfg.str("method").getOrElse("get").toUpperCase
    val allowed = Set("GET", "HEAD", "POST", "PUT", "DELETE", "OPTIONS", "PATCH")
    if (!allowed(method)) throw new IllegalArgumentException(
      s"source $name: method $method")
    def multi(key: String): Seq[(String, String)] =
      cfg.tab(key).toSeq.flatMap(_.entries.toSeq).flatMap {
        case (k, TStr(v)) => Seq(k -> v)
        case (k, arr: TArr) => arr.items.map {
          case TStr(v) => k -> v
          case other => throw new IllegalArgumentException(
            s"source $name: $key.$k entries must be strings, got $other")
        }
        case (k, other) => throw new IllegalArgumentException(
          s"source $name: $key.$k must be a string or string array, got $other")
      }
    val enc = (s: String) =>
      java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
    val qs = multi("query").map { case (k, v) => s"${enc(k)}=${enc(v)}" }
    val uri = if (qs.isEmpty) endpoint
      else endpoint + (if (endpoint.contains("?")) "&" else "?") + qs.mkString("&")

    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10)).build()
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(uri))
      .timeout(java.time.Duration.ofSeconds(
        cfg.long("scrape_timeout_secs").getOrElse(5L)))
      .method(method, java.net.http.HttpRequest.BodyPublishers.noBody())
    multi("headers").foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(),
      java.net.http.HttpResponse.BodyHandlers.ofString(
        java.nio.charset.StandardCharsets.UTF_8))
    if (resp.statusCode() < 200 || resp.statusCode() >= 300)
      throw new IllegalStateException(
        s"source $name: $method $endpoint returned HTTP ${resp.statusCode()}")

    import spark.implicits._
    val lines = resp.body().split("\r?\n").toSeq.filter(_.nonEmpty)
      .zipWithIndex.map { case (l, i) => (l, i.toLong) }
    val codec = cfg.tab("decoding").flatMap(_.str("codec")).getOrElse("bytes")
    decodeLines(spark, name, codec,
      Frame(lines.toDF("message", SeqCol),
        EventMeta(ListMap("message" -> VStr), None)))
  }

  /** `type = "prometheus_scrape"` (reference
    * src/sources/prometheus/scrape.rs): scrape each configured
    * exposition endpoint once per batch evaluation (the http_client
    * one-scrape stance; `scrape_interval_secs` accepted, unused) and
    * parse the text through `Prometheus.parseExposition` — the exact
    * inverse of the prometheus_exporter sink. Emits absolute
    * flat-model metric rows: counter groups as counters, gauge /
    * untyped as gauges, histogram/summary groups in exposition
    * component form (the parser's documented model narrowing).
    *
    * `instance_tag` (default `instance` = the endpoint authority) and
    * `endpoint_tag` (default `endpoint` = the full URL) stamp every
    * row; with `honor_labels = false` (the default) a scraped label
    * colliding with either tag is renamed `exported_<name>`, with
    * `true` the scraped label wins and the stamp is skipped for that
    * row — Prometheus' honor_labels semantics (scrape.rs:81-86).
    */
  private def prometheusScrapeSource(spark: org.apache.spark.sql.SparkSession,
                                     name: String, cfg: TTab): Frame = {
    if (cfg.tab("auth").isDefined) throw VrlUnsupported(
      s"source $name: prometheus_scrape auth (credential handling out " +
        "of scope — front with a proxy)")
    val endpoints = cfg.strArr("endpoints")
    if (endpoints.isEmpty) throw new IllegalArgumentException(
      s"source $name: no endpoints")
    endpoints.foreach(e => require(
      e.startsWith("http://") || e.startsWith("https://"),
      s"source $name: endpoint '$e' must be http(s)://"))
    val instanceTag = cfg.str("instance_tag").orElse(Some("instance"))
      .filter(_.nonEmpty)
    val endpointTag = cfg.str("endpoint_tag").orElse(Some("endpoint"))
      .filter(_.nonEmpty)
    val honorLabels = cfg.bool("honor_labels").getOrElse(false)
    val timeout = cfg.long("scrape_timeout_secs").getOrElse(5L)
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10)).build()
    import spark.implicits._
    val perEndpoint = endpoints.map { ep =>
      val resp = client.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(ep))
          .timeout(java.time.Duration.ofSeconds(timeout)).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString(
          java.nio.charset.StandardCharsets.UTF_8))
      if (resp.statusCode() < 200 || resp.statusCode() >= 300)
        throw new IllegalStateException(
          s"source $name: GET $ep returned HTTP ${resp.statusCode()}")
      val authority = java.net.URI.create(ep).getAuthority
      val lines = resp.body().split("\r?\n").toSeq
        .zipWithIndex.map { case (l, i) => (l, i.toLong) }
      val parsed = graft.operators.Prometheus.parseExposition(
        lines.toDF("line", "pos"), col("line"), lit(ep), col("pos"))
      val extras: Seq[(String, String)] =
        instanceTag.map(_ -> authority).toSeq ++ endpointTag.map(_ -> ep)
      val extraKeys = extras.map(_._1)
      val tagArr = when(col("tags").isNotNull, split(col("tags"), ","))
        .otherwise(array().cast("array<string>"))
      val renamed =
        if (honorLabels || extraKeys.isEmpty) tagArr
        else transform(tagArr, t =>
          when(regexp_extract(t, "^([^=]*)=", 1)
            .isin(extraKeys.map(x => x: Any): _*),
            concat(lit("exported_"), t)).otherwise(t))
      val withExtras = extras.foldLeft(renamed) { case (acc, (k, v)) =>
        val stamp = array(lit(s"$k=$v"))
        if (honorLabels)
          // scraped label wins: stamp only the rows that lack it
          when(exists(tagArr,
            t => regexp_extract(t, "^([^=]*)=", 1) === k), acc)
            .otherwise(concat(acc, stamp))
        else concat(acc, stamp)
      }
      parsed.select(
        col("name"),
        lit(null).cast("string").as("namespace"),
        when(size(withExtras) > 0,
          array_join(sort_array(withExtras), ",")).as("tags"),
        col("kind"), col("value_type"), col("value"),
        timestamp_millis(col("tstamp_ms")).as("ts"))
    }
    val df = perEndpoint.reduce(_ unionByName _)
    val stamped = df.withColumn(SeqCol, xxhash64(
      col("name"), col("tags"), col("value"), col("ts")))
    Frame(stamped, MetricMeta, metric = true)
  }

  /** `type = "host_metrics"` (reference src/sources/host_metrics/):
    * scrape the host. Batch = ONE scrape (`scrape_interval_secs`
    * accepted, unused). Collectors implemented from /proc — `cpu`
    * (cpu_seconds_total counters tagged mode∈{idle, io_wait, nice,
    * system, user} + cpu index, exactly the reference's Linux mode set,
    * cpu.rs:27-41, plus the logical_cpus/physical_cpus gauges),
    * `memory` (memory_*_bytes gauges from /proc/meminfo), `load`
    * (load1/5/15, mod.rs:432-450), `host` (uptime + boot_time),
    * `filesystem`, `network`, `disk`, `process`, `cgroups` (v1/v2/
    * hybrid detection + recursive hierarchy walk, cgroups.rs:226-283),
    * and `tcp` (per-state connection counts + queued bytes; the
    * reference queries netlink sock_diag, tcp.rs:28-57 — this engine
    * reads the same kernel state from /proc/net/tcp[6], the portable
    * JVM path) — the full collector set; unknown names are refused
    * loudly. Every metric is kind ABSOLUTE with `collector` and
    * `host` tags stamped (MetricsBuffer.tags, mod.rs:506-512),
    * namespace default "host" (mod.rs:185-187). `ts` stays null like
    * every deterministic-engine source; the VALUES themselves are
    * inherently scrape-time-dependent, so this source is spec-gated
    * (shape/positivity), never oracle-gated.
    */
  private def hostMetrics(spark: org.apache.spark.sql.SparkSession,
                          name: String, cfg: TTab): Frame = {
    val supported = Seq("cpu", "memory", "load", "host", "filesystem",
      "network", "disk", "process", "cgroups", "tcp")
    val collectors = {
      val c = cfg.strArr("collectors")
      if (c.isEmpty) supported else c
    }
    collectors.filterNot(supported.contains) match {
      case Seq() => ()
      case bad => throw VrlUnsupported(
        s"source $name: host_metrics collector(s) ${bad.mkString(", ")} " +
          s"(implemented here: ${supported.mkString(", ")})")
    }
    val ns = cfg.str("namespace").getOrElse("host")
    val hostName = java.net.InetAddress.getLocalHost.getHostName
    def readProc(p: String): Seq[String] = {
      val src = scala.io.Source.fromFile(p, "UTF-8")
      try src.getLines().toVector finally src.close()
    }
    def tags(collector: String, extra: Seq[(String, String)] = Nil): String =
      ((("collector" -> collector) +: ("host" -> hostName) +: extra)
        .sortBy(_._1).map { case (k, v) => s"$k=$v" }).mkString(",")

    val out = Vector.newBuilder[(String, String, String, Double)]
    // (name, tags, value_type, value); kind is absolute throughout
    if (collectors.contains("cpu")) {
      val cpuLines = readProc("/proc/stat").filter(_.matches("cpu\\d+ .*"))
      cpuLines.zipWithIndex.foreach { case (line, idx) =>
        val f = line.trim.split("\\s+")
        // /proc/stat: user nice system idle iowait … in USER_HZ (100/s)
        def secs(i: Int): Double = f(i).toDouble / 100.0
        val t = (m: String) => tags("cpu", Seq("mode" -> m, "cpu" -> idx.toString))
        out += (("cpu_seconds_total", t("idle"), "counter", secs(4)))
        out += (("cpu_seconds_total", t("io_wait"), "counter", secs(5)))
        out += (("cpu_seconds_total", t("nice"), "counter", secs(2)))
        out += (("cpu_seconds_total", t("system"), "counter", secs(3)))
        out += (("cpu_seconds_total", t("user"), "counter", secs(1)))
      }
      out += (("logical_cpus", tags("cpu"), "gauge", cpuLines.size.toDouble))
      // physical = distinct (physical id, core id); a probe failure is
      // skipped like the reference's filter_result, not fatal
      try {
        val info = readProc("/proc/cpuinfo")
        def vals(k: String) = info.filter(_.startsWith(k))
          .map(_.split(":").last.trim)
        val phys = vals("physical id").zip(vals("core id")).distinct.size
        if (phys > 0)
          out += (("physical_cpus", tags("cpu"), "gauge", phys.toDouble))
      } catch { case _: Exception => () }
    }
    if (collectors.contains("memory")) {
      val mem = readProc("/proc/meminfo").flatMap { l =>
        l.split(":") match {
          case Array(k, v) => Some(k.trim ->
            v.trim.split("\\s+").head.toDouble * 1024.0) // kB -> bytes
          case _ => None
        }
      }.toMap
      def emit(metric: String, key: String): Unit = mem.get(key).foreach(v =>
        out += ((metric, tags("memory"), "gauge", v)))
      emit("memory_total_bytes", "MemTotal")
      emit("memory_free_bytes", "MemFree")
      emit("memory_available_bytes", "MemAvailable")
      emit("memory_active_bytes", "Active")
      emit("memory_inactive_bytes", "Inactive")
      emit("memory_buffers_bytes", "Buffers")
      emit("memory_cached_bytes", "Cached")
      emit("memory_shared_bytes", "Shmem")
      for (t <- mem.get("MemTotal"); f <- mem.get("MemFree"))
        out += (("memory_used_bytes", tags("memory"), "gauge", t - f))
      emit("memory_swap_total_bytes", "SwapTotal")
      emit("memory_swap_free_bytes", "SwapFree")
      for (t <- mem.get("SwapTotal"); f <- mem.get("SwapFree"))
        out += (("memory_swap_used_bytes", tags("memory"), "gauge", t - f))
    }
    if (collectors.contains("load")) {
      val f = readProc("/proc/loadavg").head.trim.split("\\s+")
      out += (("load1", tags("load"), "gauge", f(0).toDouble))
      out += (("load5", tags("load"), "gauge", f(1).toDouble))
      out += (("load15", tags("load"), "gauge", f(2).toDouble))
    }
    if (collectors.contains("host")) {
      val up = readProc("/proc/uptime").head.trim.split("\\s+").head.toDouble
      out += (("uptime", tags("host"), "gauge", up))
      readProc("/proc/stat").find(_.startsWith("btime ")).foreach(l =>
        out += (("boot_time", tags("host"), "gauge",
          l.split("\\s+")(1).toDouble)))
    }
    if (collectors.contains("filesystem")) {
      // one row set per real mount (filesystem.rs:105-132): total/free/
      // used bytes + used_ratio, tagged device/filesystem/mountpoint.
      // /proc/mounts supplies the device + fs type; FileStore supplies
      // the sizes. Pseudo filesystems (zero-size) are skipped like the
      // reference's FilterList defaults; probe failures skip the mount
      // (filter_result), never the scrape.
      val mounts = readProc("/proc/mounts").flatMap(_.trim.split("\\s+") match {
        case Array(dev, mount, fsType, _*) => Some((dev, mount, fsType))
        case _ => None
      })
      // overmounts repeat a mountpoint; the LAST entry is the visible
      // one (and the one FileStore resolves to)
      mounts.groupBy(_._2).map(_._2.last).toSeq.sortBy(_._2).foreach {
        case (dev, mount, fsType) =>
            try {
              val store = java.nio.file.Files.getFileStore(
                java.nio.file.Paths.get(mount))
              val total = store.getTotalSpace.toDouble
              if (total > 0) {
                val free = store.getUnallocatedSpace.toDouble
                val t = tags("filesystem", Seq("device" -> dev,
                  "filesystem" -> fsType, "mountpoint" -> mount))
                out += (("filesystem_free_bytes", t, "gauge", free))
                out += (("filesystem_total_bytes", t, "gauge", total))
                out += (("filesystem_used_bytes", t, "gauge", total - free))
                out += (("filesystem_used_ratio", t, "gauge",
                  (total - free) / total))
              }
            } catch { case _: Exception => () }
      }
    }

    if (collectors.contains("network")) {
      // /proc/net/dev: iface | rx bytes pkts errs drop … | tx bytes
      // pkts errs drop …; the reference's seven counters (network.rs)
      readProc("/proc/net/dev").drop(2).foreach { line =>
        line.split(":") match {
          case Array(dev, rest) =>
            val f = rest.trim.split("\\s+").map(_.toDouble)
            if (f.length >= 12) {
              val t = tags("network", Seq("device" -> dev.trim))
              out += (("network_receive_bytes_total", t, "counter", f(0)))
              out += (("network_receive_packets_total", t, "counter", f(1)))
              out += (("network_receive_errs_total", t, "counter", f(2)))
              out += (("network_transmit_bytes_total", t, "counter", f(8)))
              out += (("network_transmit_packets_total", t, "counter", f(9)))
              out += (("network_transmit_errs_total", t, "counter", f(10)))
              out += (("network_transmit_packets_drop_total", t, "counter", f(11)))
            }
          case _ => ()
        }
      }
    }
    if (collectors.contains("disk")) {
      // /proc/diskstats: maj min name reads_completed _ sectors_read _
      // writes_completed _ sectors_written …; sectors are 512 B by
      // contract of this file regardless of the device's block size
      readProc("/proc/diskstats").foreach { line =>
        val f = line.trim.split("\\s+")
        if (f.length >= 10) {
          val t = tags("disk", Seq("device" -> f(2)))
          out += (("disk_reads_completed_total", t, "counter", f(3).toDouble))
          out += (("disk_read_bytes_total", t, "counter", f(5).toDouble * 512))
          out += (("disk_writes_completed_total", t, "counter", f(7).toDouble))
          out += (("disk_written_bytes_total", t, "counter", f(9).toDouble * 512))
        }
      }
    }

    if (collectors.contains("process")) {
      // per-process gauges/counter (process.rs:20-56) tagged
      // pid/name/command, filtered by `[sources.<n>.process]`
      // includes/excludes GLOB patterns on the process name (the
      // FilterList shape). process_cpu_usage is the LIFETIME-average
      // cpu share in percent — a single scrape has no second sample,
      // so the reference's instantaneous % (sysinfo refresh delta)
      // becomes the honest one-shot analog; documented divergence.
      val pcfg = cfg.tab("process")
      def globs(key: String): Seq[java.util.regex.Pattern] =
        pcfg.toSeq.flatMap(_.strArr(key)).map(g =>
          java.util.regex.Pattern.compile(
            g.flatMap {
              case '*' => ".*"
              case '?' => "."
              case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
              case c => c.toString
            }))
      val inc = globs("includes")
      val exc = globs("excludes")
      def matches(pname: String): Boolean =
        (inc.isEmpty || inc.exists(_.matcher(pname).matches())) &&
          !exc.exists(_.matcher(pname).matches())
      val hz = 100.0 // USER_HZ; /proc stat times are in jiffies
      val pageSize = 4096.0
      val uptime = readProc("/proc/uptime").head.trim.split("\\s+").head.toDouble
      new java.io.File("/proc").listFiles((_, n) => n.forall(_.isDigit))
        .toSeq.sortBy(_.getName.toLong).foreach { dir =>
          try {
            val stat = readProc(s"${dir.getPath}/stat").head
            // comm may contain spaces/parens: split around the (...)
            val open = stat.indexOf('(')
            val close = stat.lastIndexOf(')')
            val pname = stat.substring(open + 1, close)
            if (matches(pname)) {
              val f = stat.substring(close + 2).split("\\s+")
              // post-comm fields, 0-based: utime=11 stime=12
              // starttime=19 vsize=20 rss=21
              val cpuSecs = (f(11).toDouble + f(12).toDouble) / hz
              val runtime = math.max(0.0, uptime - f(19).toDouble / hz)
              val cmd = // NUL-separated argv, space-joined like process.rs
                try readProc(s"${dir.getPath}/cmdline").headOption
                  .getOrElse("").replace('\u0000', ' ').trim
                catch { case _: Exception => "" }
              val t = tags("process", Seq("pid" -> dir.getName,
                "name" -> pname, "command" -> cmd))
              out += (("process_cpu_usage", t, "gauge",
                if (runtime > 0) 100.0 * cpuSecs / runtime else 0.0))
              out += (("process_memory_usage", t, "gauge",
                f(21).toDouble * pageSize))
              out += (("process_memory_virtual_usage", t, "gauge",
                f(20).toDouble))
              out += (("process_runtime", t, "counter", runtime))
            }
          } catch { case _: Exception => () } // raced exit: skip the pid
        }
    }

    if (collectors.contains("cgroups")) {
      // cgroup hierarchy walk (cgroups.rs). Mode detection :226-283:
      // hybrid if BASE/unified/cgroup.controllers exists, modern if
      // BASE/cgroup.controllers, legacy if BASE/cpu is a directory.
      // Modern dirs carry cpu.stat + memory.current + memory.stat;
      // legacy splits the walk into the memory/ subtree (memory files
      // only) and the cpu/ subtree (cpu files only) (:97-116); hybrid
      // scans both. Per-file absence skips that metric set, never the
      // scrape (filter_result), and v1 stat files simply lack the
      // usage_usec/anon keys so those default to 0 like the
      // define_stat_struct parser.
      val ccfg = cfg.tab("cgroups")
      val base = ccfg.flatMap(_.str("base_dir")).getOrElse("/sys/fs/cgroup")
      val levels = ccfg.flatMap(_.long("levels")).getOrElse(100L).toInt
      val rootName = ccfg.flatMap(_.str("base")).getOrElse("/")
      def isFile(p: String) = new java.io.File(p).isFile
      def statKeys(p: String): Map[String, Double] =
        try readProc(p).flatMap(_.trim.split("\\s+") match {
          case Array(k, v) => try Some(k -> v.toDouble) catch { case _: NumberFormatException => None }
          case _ => None
        }).toMap
        catch { case _: Exception => Map.empty }
      def emitGroup(dir: java.io.File, cname: String, loadCpu: Boolean,
                    loadMem: Boolean): Unit = {
        val t = tags("cgroups", Seq("cgroup" -> cname))
        val cpuStat = new java.io.File(dir, "cpu.stat")
        if (loadCpu && cpuStat.isFile) {
          val s = statKeys(cpuStat.getPath)
          out += (("cgroup_cpu_usage_seconds_total", t, "counter",
            s.getOrElse("usage_usec", 0.0) * 1e-6))
          out += (("cgroup_cpu_user_seconds_total", t, "counter",
            s.getOrElse("user_usec", 0.0) * 1e-6))
          out += (("cgroup_cpu_system_seconds_total", t, "counter",
            s.getOrElse("system_usec", 0.0) * 1e-6))
        }
        if (loadMem) {
          val cur = new java.io.File(dir, "memory.current")
          if (cur.isFile)
            try out += (("cgroup_memory_current_bytes", t, "gauge",
              readProc(cur.getPath).head.trim.toDouble))
            catch { case _: Exception => () }
          val memStat = new java.io.File(dir, "memory.stat")
          if (memStat.isFile) {
            val s = statKeys(memStat.getPath)
            out += (("cgroup_memory_anon_bytes", t, "gauge", s.getOrElse("anon", 0.0)))
            out += (("cgroup_memory_file_bytes", t, "gauge", s.getOrElse("file", 0.0)))
            out += (("cgroup_memory_anon_active_bytes", t, "gauge", s.getOrElse("active_anon", 0.0)))
            out += (("cgroup_memory_anon_inactive_bytes", t, "gauge", s.getOrElse("inactive_anon", 0.0)))
            out += (("cgroup_memory_file_active_bytes", t, "gauge", s.getOrElse("active_file", 0.0)))
            out += (("cgroup_memory_file_inactive_bytes", t, "gauge", s.getOrElse("inactive_file", 0.0)))
          }
        }
      }
      def recurse(dir: java.io.File, cname: String, level: Int,
                  loadCpu: Boolean, loadMem: Boolean): Unit = {
        emitGroup(dir, cname, loadCpu, loadMem)
        if (level < levels) {
          val kids = Option(dir.listFiles).getOrElse(Array.empty)
            .filter(_.isDirectory).sortBy(_.getName)
          kids.foreach { k =>
            val childName = if (cname.endsWith("/")) cname + k.getName
              else cname + "/" + k.getName
            recurse(k, childName, level + 1, loadCpu, loadMem)
          }
        }
      }
      def scanModern(b: String): Unit = {
        val root = new java.io.File(b, if (rootName == "/") "" else rootName)
        if (root.isDirectory) recurse(root, rootName, 1, loadCpu = true, loadMem = true)
      }
      def scanLegacy(b: String): Unit = {
        val sub = if (rootName == "/") "" else "/" + rootName.stripPrefix("/")
        val mem = new java.io.File(b, "memory" + sub)
        if (mem.isDirectory) recurse(mem, rootName, 1, loadCpu = false, loadMem = true)
        val cpu = new java.io.File(b, "cpu" + sub)
        if (cpu.isDirectory) recurse(cpu, rootName, 1, loadCpu = true, loadMem = false)
      }
      if (isFile(s"$base/unified/cgroup.controllers")) {
        scanLegacy(base); scanModern(s"$base/unified")
      } else if (isFile(s"$base/cgroup.controllers")) scanModern(base)
      else if (new java.io.File(base, "cpu").isDirectory) scanLegacy(base)
      // no cgroup base detected: emit nothing, like the reference's None
    }

    if (collectors.contains("tcp")) {
      // per-state connection gauges + queued bytes (tcp.rs:28-57). The
      // reference dumps netlink sock_diag; the identical kernel state
      // is exposed at /proc/net/tcp[6] (st hex = the same 1..11 state
      // codes, tx_queue:rx_queue hex pair), which the JVM can read
      // without a native netlink socket. IPv6 is included only when
      // /proc/net/if_inet6 exists, mirroring tcp.rs:21,219.
      val stateNames = Map(1 -> "established", 2 -> "syn_sent",
        3 -> "syn_recv", 4 -> "fin_wait1", 5 -> "fin_wait2",
        6 -> "time_wait", 7 -> "close", 8 -> "close_wait",
        9 -> "last_ack", 10 -> "listen", 11 -> "closing")
      val counts = scala.collection.mutable.Map.empty[String, Double]
      var txQ = 0.0; var rxQ = 0.0
      val files = Seq("/proc/net/tcp") ++
        (if (new java.io.File("/proc/net/if_inet6").isFile) Seq("/proc/net/tcp6") else Nil)
      files.foreach { f =>
        try readProc(f).drop(1).foreach { line =>
          val p = line.trim.split("\\s+")
          if (p.length >= 5) {
            stateNames.get(Integer.parseInt(p(3), 16)).foreach(s =>
              counts(s) = counts.getOrElse(s, 0.0) + 1.0)
            p(4).split(":") match {
              case Array(tx, rx) =>
                txQ += java.lang.Long.parseLong(tx, 16).toDouble
                rxQ += java.lang.Long.parseLong(rx, 16).toDouble
              case _ => ()
            }
          }
        } catch { case _: Exception => () }
      }
      counts.toSeq.sortBy(_._1).foreach { case (s, c) =>
        out += (("tcp_connections_total", tags("tcp", Seq("state" -> s)), "gauge", c))
      }
      out += (("tcp_tx_queued_bytes_total", tags("tcp"), "gauge", txQ))
      out += (("tcp_rx_queued_bytes_total", tags("tcp"), "gauge", rxQ))
    }

    val rows = out.result().zipWithIndex.map { case ((n, t, vt, v), i) =>
      (n, ns, t, "absolute", vt, v, i.toLong)
    }
    val df = spark.createDataFrame(rows)
      .toDF("name", "namespace", "tags", "kind", "value_type", "value", SeqCol)
      .withColumn("ts", lit(null).cast("timestamp"))
      .select(col("name"), col("namespace"), col("tags"), col("kind"),
        col("value_type"), col("value"), col("ts"), col(SeqCol))
    Frame(df, MetricMeta, metric = true)
  }

  /** `type = "static_metrics"` (reference src/sources/static_metrics.rs):
    * emit the metrics defined in configuration. Batch = ONE emission
    * (`interval_secs` is a liveness knob of the continuous source,
    * accepted and unused). Each `[[sources.<n>.metrics]]` entry carries
    * `name`, `kind` (absolute|incremental), `value.counter.value` or
    * `value.gauge.value`, and a `tags` table (rendered canonical-
    * sorted, like every metric frame here); `namespace` defaults to
    * "static" (static_metrics.rs:85). Set/distribution/histogram
    * values are refused — the flat metric model carries scalar values
    * only, and silently coercing a set to a gauge would change
    * semantics. `ts` is null: the reference stamps Utc::now per
    * emission, which a deterministic engine must not.
    */
  private def staticMetrics(spark: org.apache.spark.sql.SparkSession,
                            name: String, cfg: TTab): Frame = {
    val ns = cfg.str("namespace").getOrElse("static")
    val rows = cfg.tabs("metrics").zipWithIndex.map { case (m, i) =>
      val mName = m.str("name").getOrElse(throw new IllegalArgumentException(
        s"source $name: metrics[$i] needs a name"))
      val kind = m.str("kind").getOrElse(throw new IllegalArgumentException(
        s"source $name: metric $mName needs a kind")) match {
        case k @ ("absolute" | "incremental") => k
        case other => throw new IllegalArgumentException(
          s"source $name: metric $mName kind $other (absolute|incremental)")
      }
      val value = m.tab("value").getOrElse(throw new IllegalArgumentException(
        s"source $name: metric $mName needs a value"))
      def req(arm: TTab, which: String): Double = arm.dbl("value").getOrElse(
        throw new IllegalArgumentException(
          s"source $name: metric $mName $which arm needs a numeric 'value'"))
      val (vt, v) = (value.tab("counter"), value.tab("gauge")) match {
        case (Some(c), None) => ("counter", req(c, "counter"))
        case (None, Some(g)) => ("gauge", req(g, "gauge"))
        case _ => throw VrlUnsupported(
          s"source $name: metric $mName value " +
            s"${value.entries.keys.mkString(",")} (counter|gauge arms only " +
            "— the flat metric model has no set/distribution encoding)")
      }
      val tags = m.tab("tags").toSeq.flatMap(_.entries.toSeq).map {
        case (k, TStr(tv)) => k -> tv
        case (k, other) => throw new IllegalArgumentException(
          s"source $name: metric $mName tag $k must be a string, got $other")
      }.sortBy(_._1).map { case (k, tv) => s"$k=$tv" }.mkString(",")
      (mName, ns, tags, kind, vt, v, i.toLong)
    }
    val df = spark.createDataFrame(rows)
      .toDF("name", "namespace", "tags", "kind", "value_type", "value", SeqCol)
      .withColumn("ts", lit(null).cast("timestamp"))
      .select(col("name"), col("namespace"), col("tags"), col("kind"),
        col("value_type"), col("value"), col("ts"), col(SeqCol))
    Frame(df, MetricMeta, metric = true)
  }

  /** `[sinks.<name>]` blocks: write each sink's input frames.
    *   - `type = "parquet"`: optional `partition_by` columns; an
    *     optional `[sinks.<n>.checkpoint] manifest = <dir>` adds the
    *     lineage manifest (footer-statistics when partitioned by port);
    *   - `type = "file"`: one encoded line per event; `encoding.codec`
    *     picks json (default) / logfmt / csv / text / gelf /
    *     native_json — see [[encodedLine]].
    * Returns sink name -> rows written.
    */
  def writeSinks(outputs: Map[String, Frame]): Map[String, Long] =
    sinkDefs.map { case (name, cfg) =>
      val in = sinkInput(name, cfg, outputs)
      val df = in.df.drop(SeqCol)
      // lazy: the console sink has no path
      lazy val path = resolvePath(cfg.str("path").getOrElse(
        throw new IllegalArgumentException(s"sink $name: no path")))
      // rows-written is counted from the WRITTEN output, never by a
      // df.count() before the write: the frame is an uncached
      // source->transform plan, and a pre-count would execute the whole
      // topology once per sink just to report a number (2× the compute
      // and input I/O; 3× on the manifest branch). A read-back count of
      // parquet scans zero columns (metadata-sized), and of the json
      // text sink scans only the written bytes.
      val n = cfg.str("type") match {
        case Some("parquet") =>
          val parts = cfg.strArr("partition_by")
          cfg.tab("checkpoint").flatMap(_.str("manifest")) match {
            case Some(manifestDir) if parts == Seq("port") =>
              // sum THIS run's manifest batch (the returned frame) — a
              // dir-wide sum over job_id would double-count on re-runs
              // against a persistent manifest dir, since every run
              // APPENDS a batch while the data is partition-overwritten
              graft.sinks.MultiSink.writeWithCheckpoint(
                df, path, manifestDir, name,
                footerStats = true,
                knownPorts = None) // port set not static here: one collect over the written frame
                .agg(coalesce(sum(col("n_rows")), lit(0L))).head().getLong(0)
            case Some(manifestDir) =>
              graft.sinks.ParquetIO.write(df, path, parts,
                org.apache.spark.sql.SaveMode.Overwrite)
              val written = graft.sinks.ParquetIO.read(df.sparkSession, path)
              graft.sinks.ParquetIO.write(
                graft.sinks.MultiSink.manifestFor(written, name),
                manifestDir, Seq.empty, org.apache.spark.sql.SaveMode.Append)
              written.count()
            case None =>
              graft.sinks.ParquetIO.write(df, path, parts,
                org.apache.spark.sql.SaveMode.Overwrite)
              graft.sinks.ParquetIO.read(df.sparkSession, path).count()
          }
        case Some("file") =>
          val line = encodedLine(name, in, cfg.tab("encoding"))
          // a null line is a per-event encode failure (e.g. CEF
          // severity out of range) — dropped, like the reference's
          // encoder error path, never written as a blank line
          in.df.select(line.as("value")).where(col("value").isNotNull)
            .write.mode(org.apache.spark.sql.SaveMode.Overwrite).text(path)
          df.sparkSession.read.text(path).count()
        case Some("console") => writeConsole(name, cfg, in)
        case Some("socket") =>
          val (sockMode, host, port) = socketSinkAddr(name, cfg)
          val line = encodedLine(name, in, cfg.tab("encoding"))
          val values =
            in.df.select(line.as("value")).where(col("value").isNotNull)
          if (sockMode == "udp")
            graft.sinks.SocketSink.writeDatagrams(values, host, port)
          else graft.sinks.SocketSink.writeLines(values, host, port)
        case Some("http") =>
          val line = encodedLine(name, in, cfg.tab("encoding"))
          graft.sinks.HttpSink.writeLines(
            in.df.select(line.as("value")).where(col("value").isNotNull),
            httpSinkCfg(name, cfg))
        case Some("blackhole") => blackhole(name, cfg, in)
        case Some("prometheus_exporter") =>
          // reference src/sinks/prometheus/exporter.rs SERVES the
          // current metric state to scrapers; the bounded-batch analog
          // renders the same exposition text to `path` (one scrape
          // snapshot). `address` would imply a live listener — refused
          // rather than silently written to disk.
          if (cfg.str("address").isDefined) throw VrlUnsupported(
            s"sink $name: prometheus_exporter address (a live scrape " +
              "listener is a continuous-service concern; the batch " +
              "form renders one snapshot to `path`)")
          if (!in.metric) throw new IllegalArgumentException(
            s"sink $name: prometheus_exporter needs metric events " +
              "(feed it from log_to_metric/aggregate)")
          val buckets = cfg.arr("buckets").collect {
            case TFloat(d) => d
            case TInt(n) => n.toDouble
          } match { case Vector() => graft.operators.Prometheus.DefaultBuckets
                    case bs => bs }
          val lines = graft.operators.Prometheus.exposition(
            in.df, cfg.str("default_namespace"), buckets)
            .orderBy("fullname", "ord")
          lines.select(col("line").as("value")).coalesce(1)
            .write.mode(org.apache.spark.sql.SaveMode.Overwrite).text(path)
          df.sparkSession.read.text(path).count()
        case Some("vector") =>
          throw VrlUnsupported(s"sink $name: the vector sink's gRPC " +
            "transport (no gRPC/HTTP2 stack — interop with a live " +
            "Vector via a socket sink with encoding.codec = " +
            "\"native_json\", the tested vector-to-vector path)")
        case other => throw VrlUnsupported(s"sink $name: type ${other.getOrElse("?")}")
      }
      // the reference's component_sent_events_total internal counter:
      // every delivered batch feeds the internal_metrics registry
      graft.operators.Telemetry.Registry.add(
        name, "component_sent_events_total", n.toDouble)
      // ...and its "Events sent." style trace line feeds internal_logs
      graft.operators.Telemetry.Logs.record("INFO", s"sinks.$name",
        s"Events sent. count=$n")
      name -> n
    }

  /** `type = "blackhole"` (reference src/sinks/blackhole/): consume and
    * discard, counting events and their estimated JSON-encoded bytes —
    * the reference's throughput-meter sink (every regression topology
    * ends in one). One distributed count+sum aggregation; the summary
    * line (`events_collected` / `raw_bytes_collected`, sink.rs:65-79)
    * goes to stderr when `print_interval_secs` > 0 — in a bounded
    * batch the single final report IS the interval report. `rate` (a
    * consumption throttle) is accepted and unused: a batch job has no
    * pacing to enforce.
    */
  private def blackhole(name: String, cfg: TTab, in: Frame): Long = {
    val printSecs = cfg.long("print_interval_secs").getOrElse(0L)
    val df = in.df.drop(SeqCol)
    val bytes = length(to_json(struct(df.columns.map(c => col(s"`$c`")).toSeq: _*)))
    val row = df.agg(count(lit(1)).as("n"),
      coalesce(sum(bytes.cast("long")), lit(0L)).as("b")).head()
    if (printSecs > 0)
      System.err.println(s"sink $name: events_collected=${row.getLong(0)} " +
        s"raw_bytes_collected=${row.getLong(1)}")
    row.getLong(0)
  }

  /** `type = "http"` sink options (reference src/sinks/http/config.rs):
    * `uri` (literal, not a template here), `method`, `request.headers`,
    * `payload_prefix`/`payload_suffix`, `batch.max_events`. `auth` is
    * refused — credential handling is out of this engine's scope, and
    * accepting-then-ignoring it would ship events unauthenticated.
    */
  private def httpSinkCfg(name: String, cfg: TTab): graft.sinks.HttpSink.Config = {
    if (cfg.tab("auth").isDefined) throw VrlUnsupported(
      s"sink $name: http auth (credential handling out of scope)")
    val uri = cfg.str("uri").getOrElse(
      throw new IllegalArgumentException(s"sink $name: no uri"))
    require(uri.startsWith("http://") || uri.startsWith("https://"),
      s"sink $name: uri '$uri' must be http(s)://")
    val method = cfg.str("method").getOrElse("post").toLowerCase
    val allowed = Set("get", "head", "post", "put", "delete", "options", "patch")
    if (!allowed(method)) throw new IllegalArgumentException(
      s"sink $name: method $method (${allowed.toSeq.sorted.mkString("|")})")
    val headers = cfg.tab("request").flatMap(_.tab("headers")).toSeq
      .flatMap(_.entries.toSeq).collect { case (k, TStr(v)) => k -> v }
    val maxEvents = cfg.tab("batch").flatMap(_.long("max_events"))
      .map(_.toInt).getOrElse(1000)
    require(maxEvents > 0, s"sink $name: batch.max_events must be positive")
    graft.sinks.HttpSink.Config(uri, method, headers, maxEvents,
      cfg.str("payload_prefix").getOrElse(""),
      cfg.str("payload_suffix").getOrElse(""))
  }

  /** `type = "socket"` sink address (reference src/sinks/socket.rs:
    * mode tcp|udp|unix_*, address): tcp stream mode only — every
    * partition connects and writes newline-framed encoded events
    * ([[graft.sinks.SocketSink]]).
    */
  private def socketSinkAddr(name: String, cfg: TTab): (String, String, Int) = {
    val mode = cfg.str("mode").getOrElse("tcp")
    if (mode != "tcp" && mode != "udp") throw VrlUnsupported(
      s"sink $name: socket mode $mode (tcp stream + udp datagram modes)")
    val (h, p) = splitHostPort(name, cfg.str("address").getOrElse(
      throw new IllegalArgumentException(s"sink $name: no address")))
    (mode, h, p)
  }

  private def splitHostPort(component: String, addr: String): (String, Int) = {
    val i = addr.lastIndexOf(':')
    require(i > 0 && i < addr.length - 1 && addr.drop(i + 1).forall(_.isDigit),
      s"$component: address '$addr' must be host:port")
    (addr.take(i), addr.drop(i + 1).toInt)
  }

  /** A sink's input frame: declared `inputs` resolved against the
    * produced outputs and unioned — shared by write, dry-run, and
    * streaming so the three paths can't drift.
    */
  private def sinkInput(name: String, cfg: TTab,
                        outputs: Map[String, Frame]): Frame = {
    val inputIds = cfg.strArr("inputs")
    require(inputIds.nonEmpty, s"sink $name: no inputs")
    unionFrames(inputIds.map(id => outputs.getOrElse(id,
      throw new IllegalArgumentException(s"sink $name: unknown input $id"))))
  }

  /** Resolve every sink's inputs, schema, codec, and required options
    * WITHOUT writing — the sink half of `vector validate`. Transform
    * plans were already forced by `run` (compilation is plan building;
    * nothing executes until a sink action). Returns the sink count.
    */
  def dryRunSinks(outputs: Map[String, Frame]): Int = {
    sinkDefs.foreach { case (name, cfg) =>
      val in = sinkInput(name, cfg, outputs)
      def path(): Unit = if (cfg.str("path").isEmpty)
        throw new IllegalArgumentException(s"sink $name: no path")
      cfg.str("type") match {
        case Some("parquet") =>
          path()
          // check against the EVENT columns: writeSinks drops __seq
          // before partitionBy, so it must not validate here either
          cfg.strArr("partition_by").foreach(p =>
            if (p == SeqCol || !in.df.drop(SeqCol).columns.contains(p))
              throw new IllegalArgumentException(
                s"sink $name: partition_by column '$p' not in the input schema"))
        case Some("file") =>
          path()
          encodedLine(name, in, cfg.tab("encoding"))
        case Some("console") =>
          encodedLine(name, in, cfg.tab("encoding"))
        case Some("socket") =>
          socketSinkAddr(name, cfg)
          encodedLine(name, in, cfg.tab("encoding"))
        case Some("http") =>
          httpSinkCfg(name, cfg)
          encodedLine(name, in, cfg.tab("encoding"))
        case Some("blackhole") => ()
        case Some("prometheus_exporter") =>
          path()
          if (!in.metric) throw new IllegalArgumentException(
            s"sink $name: prometheus_exporter needs metric events " +
              "(feed it from log_to_metric/aggregate)")
        case other => throw VrlUnsupported(s"sink $name: type ${other.getOrElse("?")}")
      }
    }
    sinkDefs.size
  }

  /** `type = "console"` (reference src/sinks/console/): encoded lines to
    * the driver's stdout/stderr per `target`. A debug device by
    * contract — lines stream through `toLocalIterator` (one partition
    * buffered at a time, never the whole frame), but stdout is still
    * one process; don't point a 100 TB fan-out at it.
    */
  private def writeConsole(name: String, cfg: TTab, in: Frame): Long = {
    val line = encodedLine(name, in, cfg.tab("encoding"))
    val outStream = cfg.str("target").getOrElse("stdout") match {
      case "stdout" => System.out
      case "stderr" => System.err
      case other => throw new IllegalArgumentException(s"sink $name: target $other")
    }
    var n = 0L
    val it = in.df.select(line.as("value"))
      .where(col("value").isNotNull).toLocalIterator()
    while (it.hasNext) { outStream.println(it.next().getString(0)); n += 1 }
    n
  }

  /** One encoded line per event for a `type = "file"` sink — the
    * reference's sink codecs (lib/codecs/src/encoding/format/): json
    * (default), logfmt, csv (RFC-4180 quoting, event fields in schema
    * order, no header row), text (the `message` field), gelf
    * (host/message/timestamp required, level optional → 1), and
    * native_json (log or metric arm picked by the frame's event type).
    * Every codec is a narrow column expression, so the encode rides the
    * sink's own scan — no extra pass, no UDF.
    */
  private def encodedLine(sinkName: String, in: Frame,
                          encoding: Option[TTab]): Column = {
    val codec: Option[String] = encoding.flatMap(_.str("codec"))
    val df = in.df
    // a DYNAMIC-root frame (`. = parse_json!(...)`) has no static event
    // columns: json encodes the root value itself (array wrap-and-strip
    // gives every root type its exact JSON form); the column-shaped
    // codecs have nothing static to encode and refuse rather than
    // silently writing empty lines
    if (in.meta.rootT.isDefined) {
      codec.getOrElse("json") match {
        case "json" =>
          // same micro timestampFormat as VrlRunner.render, so a
          // root event prints identically through both paths
          val wrapped = to_json(array(df.col("__root")),
            java.util.Map.of("timestampFormat",
              "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"))
          return wrapped.substr(lit(2), length(wrapped) - 2)
        case other => throw VrlUnsupported(
          s"sink $sinkName: codec $other over a dynamic-root event " +
            "(whole-event replacement with a dynamic value) — use json, " +
            "or project typed fields before the sink")
      }
    }
    val fields: Seq[(String, Column)] =
      in.meta.types.keys.toSeq.map(n => n -> df.col(s"`$n`"))
    def need(f: String): Column = {
      if (!in.meta.types.contains(f)) throw new IllegalArgumentException(
        s"sink $sinkName: codec ${codec.getOrElse("?")} needs event field '$f'")
      df.col(s"`$f`")
    }
    codec.getOrElse("json") match {
      case "json" => to_json(struct(fields.map { case (n, c) => c.as(n) }: _*))
      case "logfmt" => graft.functions.Parsers.encodeLogfmt(fields)
      case "csv" =>
        val cells = fields.map { case (_, c) =>
          val s = coalesce(c.cast("string"), lit(""))
          when(s.rlike("[\",\n\r]"),
            concat(lit("\""), regexp_replace(s, "\"", "\"\""), lit("\"")))
            .otherwise(s)
        }
        concat_ws(",", cells: _*)
      case "text" => need("message").cast("string")
      case "gelf" =>
        val ts = Seq("timestamp", "ts")
          .find(f => in.meta.types.get(f).contains(VTime))
          .map(f => df.col(s"`$f`")).getOrElse(throw new IllegalArgumentException(
            s"sink $sinkName: codec gelf needs a timestamp/ts event field"))
        val level = in.meta.types.get("level")
          .map(_ => df.col("level").cast("string").try_cast("int"))
          .getOrElse(lit(null).cast("int"))
        graft.functions.Parsers.encodeGelf(
          need("host"), need("message"), ts, coalesce(level, lit(1)))
      case "native_json" =>
        if (in.metric)
          // tags ride the flat frame as the canonical `k=v,...` string;
          // the native_json wire format carries them as an OBJECT map
          // (native_json.rs MetricTags) — encodeMetric takes the map
          graft.functions.NativeJson.encodeMetric(df.col("name"),
            when(df.col("tags").isNotNull,
              str_to_map(df.col("tags"), lit(","), lit("="))),
            df.col("kind"), df.col("value_type"), df.col("value"))
        else graft.functions.NativeJson.encodeLog(fields)
      case "cef" =>
        // encoding/format/cef.rs: device_* are literal config strings
        // (length-validated), severity/name are EVENT FIELD PATHS
        // (severity must read 0..10), `extensions` maps extension keys
        // to event field paths
        val o = encoding.flatMap(_.tab("cef")).getOrElse(
          throw new IllegalArgumentException(
            s"sink $sinkName: codec cef needs an [encoding.cef] table"))
        def devStr(k: String, maxLen: Int): String = {
          val v = o.str(k).getOrElse(throw new IllegalArgumentException(
            s"sink $sinkName: [encoding.cef] needs $k"))
          if (v.length > maxLen || v.contains("|")) throw new IllegalArgumentException(
            s"sink $sinkName: [encoding.cef] $k must be <= $maxLen chars, no '|'")
          v
        }
        o.str("version").foreach {
          case "V0" | "0" => ()
          case other => throw VrlUnsupported(
            s"sink $sinkName: CEF version $other (V0 only)")
        }
        val sevPath = o.str("severity").getOrElse("cef.severity")
        val namePath = o.str("name").getOrElse("cef.name")
        val env2 = envFromDf(df, in.meta)
        def pathCol(p: String): Column = resolveField(env2, parsePathStr(p)).col
        val sev = pathCol(sevPath).cast("string").try_cast("int")
        // cef.rs escape_header/escape_extension: backslash first, then
        // the section-delimiting character
        def escHeader(c: Column): Column =
          regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "\\|", "\\\\|")
        def escExt(c: Column): Column =
          regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "=", "\\\\=")
        val exts = o.tab("extensions").map(_.entries.toSeq).getOrElse(Nil).map {
          case (k, TStr(p)) => k -> escExt(pathCol(p).cast("string"))
          case (k, other) => throw new IllegalArgumentException(
            s"sink $sinkName: [encoding.cef.extensions] $k must be a " +
              s"field-path string, got $other")
        }
        // null/out-of-range severity -> null line; the sink drops it
        // (cef.rs treats it as an encode error and skips the event).
        // A null name renders as an EMPTY header section, not a
        // dropped one (concat_ws would silently remove the section and
        // shift every later field left).
        when(sev.isNull || sev < 0 || sev > 10, lit(null).cast("string"))
          .otherwise(graft.functions.Parsers.encodeCef(
            devStr("device_vendor", 63), devStr("device_product", 63),
            devStr("device_version", 31),
            sigId = lit(devStr("device_event_class_id", 1023)),
            name = escHeader(coalesce(pathCol(namePath).cast("string"), lit(""))),
            severity = sev.cast("string"),
            extension = exts))
      case other => throw VrlUnsupported(s"sink $sinkName: encoding codec $other")
    }
  }

  /** Whole-config execution: sources -> transform DAG -> sinks. The
    * reference's `vector run` lifecycle (SURVEY §3.1) collapsed to one
    * batch evaluation.
    */
  /** Output frames worth persisting before the sink actions — the
    * multicast fan-out points where, without a persist, EVERY consuming
    * sink's action re-runs the whole upstream source → transform chain
    * (the reference clones events to each output in one pass,
    * fanout.rs; SURVEY §9's route row makes the same one-pass promise).
    * Two cases:
    *   - any EXACT output id consumed by ≥2 declared inputs;
    *   - a route/exclusive_route consumed ≥2 times counting port refs:
    *     only THOSE transforms' port frames are narrow filters over the
    *     primary output, so caching the primary serves every port.
    *     (remap's `dropped` branch filters the transform's INPUT, not
    *     its primary — caching the primary would not serve it, so
    *     `name` + `name.dropped` fan-outs deliberately don't qualify.)
    * Sources are excluded: re-scanning columnar input is cheaper at
    * scale than materializing the raw scan to executor disk.
    */
  private[graft] def sharedRoots: Set[String] = {
    val refs = (transforms.values ++ sinkDefs.values)
      .flatMap(_.strArr("inputs")).toSeq
    val exact = refs.groupBy(identity).collect {
      case (r, uses) if uses.size >= 2 && transforms.contains(rootOf(r)) => r
    }.toSet
    val routeFan = refs.groupBy(rootOf).collect {
      case (r, uses) if uses.size >= 2 && transforms.get(r)
        .flatMap(_.str("type")).exists(Set("route", "exclusive_route")) => r
    }.toSet
    exact ++ routeFan
  }

  def execute(spark: org.apache.spark.sql.SparkSession): Map[String, Long] = {
    val src = loadSources(spark)
    val outs = run(src)
    // persist fan-out frames before the sink actions: Spark's cache
    // manager matches by canonicalized plan, so every sink whose plan
    // contains the shared subtree reads the cached data — one upstream
    // evaluation total, not one per sink
    val cached = sharedRoots.toSeq.flatMap(outs.get).map { f =>
      f.df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    // sinks may consume a source directly (passthrough topology);
    // transform outputs win on name collision
    try writeSinks(src ++ outs)
    finally cached.foreach(_.unpersist(false))
  }

  // ------------------------------------------------------- streaming

  /** Streaming sources: the same `[sources]` blocks as file-watching
    * streams (the reference's continuous source lifecycle,
    * src/sources/file/). Parquet needs an explicit schema on a
    * streaming scan — probed from a metadata-only batch read of the
    * same path. `__seq` is the same content hash as the batch path: a
    * deterministic tiebreak, not an arrival counter.
    */
  def loadStreamingSources(spark: org.apache.spark.sql.SparkSession): Map[String, Frame] =
    sources.map { case (name, cfg) =>
      // refuse by TYPE before the path requirement: a path-less
      // demo_logs config would otherwise get a misleading "no path"
      if (cfg.str("type").contains("demo_logs"))
        throw VrlUnsupported(s"source $name: demo_logs is batch-only " +
          "(a bounded generated table; use Cli run, or a rate source " +
          "via graft.streaming.StreamOps for an endless stream)")
      if (cfg.str("type").contains("exec"))
        throw VrlUnsupported(s"source $name: exec is batch-only here " +
          "(one scheduled run per Cli run invocation; the reference's " +
          "interval/restart lifecycle needs a continuous driver)")
      if (cfg.str("type").contains("static_metrics"))
        throw VrlUnsupported(s"source $name: static_metrics is " +
          "batch-only here (one emission per Cli run invocation)")
      if (cfg.str("type").contains("http_client"))
        throw VrlUnsupported(s"source $name: http_client is batch-only " +
          "here (one scrape per Cli run invocation; the continuous " +
          "poll cadence needs a custom streaming source)")
      if (cfg.str("type").contains("host_metrics"))
        throw VrlUnsupported(s"source $name: host_metrics is batch-only " +
          "here (one scrape per Cli run invocation)")
      // lazy: the socket source has an address, not a path
      lazy val path = resolvePath(cfg.str("path").getOrElse(
        throw new IllegalArgumentException(s"source $name: no path")))
      // a streaming file source watches a DIRECTORY; a config pointing
      // at one file (the batch form accepts both) becomes the parent
      // dir + an exact-name glob filter
      lazy val (dir, globFilter) = {
        val f = new java.io.File(path)
        if (f.isFile) (f.getParent, Some(f.getName)) else (path, None)
      }
      def filtered[R](r: org.apache.spark.sql.streaming.DataStreamReader) =
        globFilter.fold(r)(g => r.option("pathGlobFilter", g))
      val frame = cfg.str("type") match {
        case Some("parquet") =>
          val schema = spark.read.parquet(path).schema
          val df = filtered(spark.readStream.schema(schema)).parquet(dir)
          val seq = xxhash64(df.columns.map(c => col(s"`$c`")).toSeq: _*)
          Frame(df.withColumn(SeqCol, seq), EventMeta.fromSchema(schema))
        case Some("syslog") =>
          // the reference's listening syslog daemon
          // (src/sources/syslog.rs): bind `address`, accept
          // connections, octet-counting framing with newline fallback
          // per connection (RFC 6587), RFC 5424 decode, `host` +
          // `source_type` enrichment with the peer address as the
          // hostname fallback. `port 0` binds ephemeral —
          // `activeIngest` exposes the bound port.
          val mode = cfg.str("mode").getOrElse("tcp")
          if (mode != "tcp" && mode != "udp") throw VrlUnsupported(
            s"source $name: syslog mode $mode (tcp + udp — unix " +
              "datagrams have no JVM listener analog here)")
          val addr = cfg.str("address").getOrElse(
            throw new IllegalArgumentException(s"source $name: no address"))
          val (host, port) = splitHostPort(name, addr)
          val maxLen = cfg.long("max_length").getOrElse(102400L).toInt
          // udp (RFC 5426): one message per datagram, no octet
          // counting on the wire — the newline framer per datagram
          // accepts both bare and newline-terminated payloads
          val ingest: graft.streaming.IngestListener =
            if (mode == "udp")
              new graft.streaming.UdpIngest(spark, host, port,
                () => new Framing.NewlineDelimited(Some(maxLen)))
            else
              new graft.streaming.TcpIngest(spark, host, port,
                () => new Framing.OctetCounting(maxLen))
          ingestListeners += ingest
          syslogDecode(
            ingest.df.withColumn(SeqCol, xxhash64(col("message"))),
            peer = Some(col("peer")))
        case Some("vector") =>
          throw VrlUnsupported(s"source $name: the vector source's gRPC " +
            "transport (no gRPC/HTTP2 stack in this engine — interop " +
            "with a live Vector via a socket/udp source with " +
            "decoding.codec = \"native_json\", the tested " +
            "vector-to-vector path)")
        case Some("websocket") =>
          // reference src/sources/websocket/: CONNECT to an endpoint
          // and emit every received message through framing + codec —
          // the reference's own client direction, onto the JDK
          // websocket client. `initial_message` sent on connect; the
          // custom application-level ping/pong knobs are liveness
          // options accepted unused (standard pings are answered by
          // the client automatically); auth refused loudly.
          if (cfg.tab("auth").isDefined) throw VrlUnsupported(
            s"source $name: websocket auth (no credential handling " +
              "in this engine — front with a proxy)")
          val wsUri = cfg.str("uri").getOrElse(
            throw new IllegalArgumentException(s"source $name: no uri"))
          require(wsUri.startsWith("ws://") || wsUri.startsWith("wss://"),
            s"source $name: uri '$wsUri' must be ws(s)://")
          val codec = cfg.tab("decoding").flatMap(_.str("codec")).getOrElse("bytes")
          if (codec == "json") throw VrlUnsupported(
            s"source $name: json decoding on a websocket source " +
              "(inference needs a batch line set — use bytes + remap parse_json)")
          val framingTab = cfg.tab("framing")
          val fMethod = framingTab.flatMap(_.str("method"))
            .getOrElse("bytes") // one ws message = one event by default
          val ingest = new graft.streaming.WsIngest(spark, wsUri,
            cfg.str("initial_message"),
            Framing.builder(fMethod, framingTab, s"source $name"))
          ingestListeners += ingest
          decodeLines(spark, name, codec,
            Frame(ingest.df.select(col("message"))
              .withColumn(SeqCol, xxhash64(col("message"))),
              EventMeta(ListMap("message" -> VStr), None)))
        case Some("kafka") =>
          // reference src/sources/kafka.rs: config surface maps onto
          // the Spark Kafka connector (StreamSources.kafkaReader). The
          // sandbox ships no spark-sql-kafka jar, so `.load()` is
          // jar-gated: with the connector on the classpath this is a
          // live subscription; without it the DataSource lookup fails
          // and the refusal names the missing jar instead of
          // surfacing a bare ClassNotFoundException.
          val servers = cfg.str("bootstrap_servers").getOrElse(
            throw new IllegalArgumentException(
              s"source $name: no bootstrap_servers"))
          val topics = cfg.strArr("topics")
          if (topics.isEmpty) throw new IllegalArgumentException(
            s"source $name: no topics")
          val kcfg = graft.sources.StreamSources.KafkaConfig(
            bootstrapServers = servers,
            topics = topics,
            startingOffsets = cfg.str("auto_offset_reset") match {
              case Some("latest") | Some("end") => "latest"
              case _ => "earliest"
            })
          val reader = graft.sources.StreamSources.kafkaReader(spark, kcfg)
          val wire =
            try reader.load()
            catch { case e: Exception
                if e.getMessage != null &&
                  (e.getMessage.contains("Failed to find") ||
                   e.getMessage.contains("kafka")) =>
              throw VrlUnsupported(s"source $name: kafka needs the " +
                "spark-sql-kafka connector jar on the classpath " +
                s"(DataSource lookup failed: ${e.getMessage.linesIterator.next()})")
            }
          val decoded = graft.sources.StreamSources.decodeKafka(wire)
            .withColumnRenamed("text", "message")
          val codec = cfg.tab("decoding").flatMap(_.str("codec")).getOrElse("bytes")
          decodeLines(spark, name, codec,
            Frame(decoded.withColumn(SeqCol,
              xxhash64(col("topic"), col("partition"), col("offset"))),
              EventMeta(ListMap("key" -> VStr, "message" -> VStr,
                "topic" -> VStr, "partition" -> VInt, "offset" -> VInt,
                "ts" -> VTime), None)))
        case Some("http_server") =>
          // reference src/sources/http_server.rs: receive request
          // bodies on a bound listener, frame each body (newline by
          // default, any [framing] method), stamp the request envelope
          // — path under `path_key`, the LISTED headers and
          // query_parameters as fields (a streaming schema is static,
          // so the reference's `*` wildcard capture is refused, not
          // silently narrowed), peer as `host`. `auth` refused loudly
          // like the http sink.
          if (cfg.tab("auth").isDefined) throw VrlUnsupported(
            s"source $name: auth (no credential handling in this " +
              "engine — front with a proxy)")
          val addr = cfg.str("address").getOrElse(
            throw new IllegalArgumentException(s"source $name: no address"))
          val (host, port) = splitHostPort(name, addr)
          val codec = cfg.tab("decoding").flatMap(_.str("codec")).getOrElse("bytes")
          val framingTab = cfg.tab("framing")
          val fMethod = framingTab.flatMap(_.str("method"))
            .getOrElse("newline_delimited")
          val framerB = Framing.builder(fMethod, framingTab, s"source $name")
          val hpath = cfg.str("path").getOrElse("/")
          val strict = cfg.bool("strict_path").getOrElse(true)
          val httpMethod = cfg.str("method").getOrElse("POST")
          val respCode = cfg.long("response_code").getOrElse(200L).toInt
          val headers = cfg.strArr("headers")
          val qps = cfg.strArr("query_parameters")
          if ((headers ++ qps).exists(_.contains("*"))) throw VrlUnsupported(
            s"source $name: wildcard envelope capture (a streaming " +
              "schema is static — list header/parameter names explicitly)")
          val pathKey = cfg.str("path_key").getOrElse("path")
          val ingest = new graft.streaming.HttpIngest(spark, host, port,
            hpath, strict, httpMethod, respCode, framerB)
          ingestListeners += ingest
          val stamped = ingest.df.select(Seq(
            col("message"), col("rpath").as(pathKey)) ++
            headers.map(h => element_at(col("headers"), lit(h.toLowerCase)).as(h)) ++
            qps.map(qp => element_at(col("query"), lit(qp)).as(qp)) ++
            Seq(col("peer").as("host"), lit("http_server").as("source_type")): _*)
            .withColumn(SeqCol, xxhash64(col("message")))
          val envelope: Seq[(String, VT)] =
            Seq(pathKey -> (VStr: VT)) ++
              headers.map(_ -> (VStr: VT)) ++ qps.map(_ -> (VStr: VT)) ++
              Seq("host" -> (VStr: VT), "source_type" -> (VStr: VT))
          decodeLines(spark, name, codec,
            Frame(stamped, EventMeta(
              ListMap(((("message" -> (VStr: VT))) +: envelope): _*), None)),
            keep = envelope)
        case Some("aws_kinesis_firehose") =>
          // reference src/sources/aws_kinesis_firehose/: the HTTP
          // endpoint Firehose delivery streams POST to — base64
          // records (auto/gzip/none compression), framed by the
          // configured framing, stamped with request_id/source_arn/
          // request timestamp; the protocol's JSON responses. Access
          // key VALIDATION refused loudly (credential surface); the
          // header is accepted and discarded.
          if (cfg.str("access_key").isDefined ||
            cfg.get("access_keys").isDefined ||
            cfg.bool("store_access_key").contains(true))
            throw VrlUnsupported(
              s"source $name: access-key validation/storage (no " +
                "credential handling in this engine — front with a proxy)")
          val fhAddr = cfg.str("address").getOrElse(
            throw new IllegalArgumentException(s"source $name: no address"))
          val (fhHost, fhPort) = splitHostPort(name, fhAddr)
          val comp = cfg.str("compression").getOrElse("auto")
          if (!Set("auto", "gzip", "none")(comp))
            throw new IllegalArgumentException(
              s"source $name: compression $comp (auto|gzip|none)")
          val framingTab = cfg.tab("framing")
          val fMethod = framingTab.flatMap(_.str("method"))
            .getOrElse("newline_delimited")
          val ingest = new graft.streaming.FirehoseIngest(spark, fhHost,
            fhPort, comp, Framing.builder(fMethod, framingTab, s"source $name"))
          ingestListeners += ingest
          val stamped = ingest.df.select(
            col("message"),
            col("requestId").as("request_id"),
            col("sourceArn").as("source_arn"),
            timestamp_millis(col("tsms")).as("timestamp"),
            lit("aws_kinesis_firehose").as("source_type"))
            .withColumn(SeqCol, xxhash64(col("message"), col("request_id")))
          Frame(stamped, EventMeta(ListMap(
            "message" -> VStr, "request_id" -> VStr, "source_arn" -> VStr,
            "timestamp" -> VTime, "source_type" -> VStr), None))
        case Some("heroku_logs") =>
          // reference src/sources/heroku_logs.rs: the Logplex drain —
          // newline-separated logplex lines per POST, the
          // Logplex-Msg-Count contract, per-line
          // timestamp/host/app_name/proc_id fields, listed
          // query_parameters as envelope stamps (wildcard refused —
          // static streaming schema), auth refused loudly.
          if (cfg.tab("auth").isDefined) throw VrlUnsupported(
            s"source $name: auth (no credential handling in this " +
              "engine — front with a proxy)")
          val hkAddr = cfg.str("address").getOrElse(
            throw new IllegalArgumentException(s"source $name: no address"))
          val (hkHost, hkPort) = splitHostPort(name, hkAddr)
          val qps = cfg.strArr("query_parameters")
          if (qps.exists(_.contains("*"))) throw VrlUnsupported(
            s"source $name: wildcard query_parameters (a streaming " +
              "schema is static — list parameter names explicitly)")
          val ingest = new graft.streaming.HerokuIngest(spark, hkHost, hkPort)
          ingestListeners += ingest
          val stamped = ingest.df.select(Seq(
            col("message"),
            try_to_timestamp(col("tsIso")).as("timestamp"),
            col("host"), col("appName").as("app_name"),
            col("procId").as("proc_id")) ++
            qps.map(qp => element_at(col("query"), lit(qp)).as(qp)) ++
            Seq(lit("heroku_logs").as("source_type")): _*)
            .withColumn(SeqCol, xxhash64(col("message"), col("timestamp")))
          Frame(stamped, EventMeta(ListMap(
            Seq("message" -> (VStr: VT), "timestamp" -> (VTime: VT),
              "host" -> (VStr: VT), "app_name" -> (VStr: VT),
              "proc_id" -> (VStr: VT)) ++
              qps.map(_ -> (VStr: VT)) ++
              Seq("source_type" -> (VStr: VT)): _*), None))
        case Some("prometheus_remote_write") =>
          // reference src/sources/prometheus/remote_write.rs: accept
          // remote-write POSTs (snappy prompb WriteRequest) into flat
          // absolute metric rows — the inverse-direction complement of
          // prometheus_scrape (same family rules and narrowing).
          val rwAddr = cfg.str("address").getOrElse(
            throw new IllegalArgumentException(s"source $name: no address"))
          val (rwHost, rwPort) = splitHostPort(name, rwAddr)
          val rwPath = cfg.str("path").getOrElse("/")
          val ingest = new graft.streaming.RemoteWriteIngest(
            spark, rwHost, rwPort, rwPath)
          ingestListeners += ingest
          val stamped = ingest.df.select(
            col("name"),
            lit(null).cast("string").as("namespace"),
            col("tags"),
            lit("absolute").as("kind"),
            col("valueType").as("value_type"), col("value"),
            timestamp_millis(col("tsms")).as("ts"))
            .withColumn(SeqCol, xxhash64(
              col("name"), col("tags"), col("value"), col("ts")))
          Frame(stamped, MetricMeta, metric = true)
        case Some("datadog_agent") =>
          // reference src/sources/datadog_agent/: the agent-facing
          // endpoint. One listener serves ONE typed frame here, so
          // exactly one arm must be enabled: `disable_logs = true`
          // gives the metric face (/api/v1/series JSON + /api/v2/
          // series protobuf), `disable_metrics = true` (the default
          // when neither is set) the log face (/v1/input,
          // /api/v2/logs). Sketches answer 501 (no sketch row in the
          // flat model); dd-api-key is accepted and discarded (no
          // credential handling, no store_api_key passthrough).
          val ddAddr = cfg.str("address").getOrElse(
            throw new IllegalArgumentException(s"source $name: no address"))
          val (ddHost, ddPort) = splitHostPort(name, ddAddr)
          val disableLogs = cfg.bool("disable_logs").getOrElse(false)
          val disableMetrics = cfg.bool("disable_metrics").getOrElse(false)
          if (disableLogs && disableMetrics) throw new IllegalArgumentException(
            s"source $name: both arms disabled")
          if (!disableLogs && !disableMetrics && cfg.bool("multiple_outputs").isDefined)
            throw VrlUnsupported(s"source $name: multiple_outputs (one typed " +
              "frame per source — run a logs source and a metrics source)")
          val wantLogs = !disableLogs
          val ingest = new graft.streaming.DatadogIngest(
            spark, ddHost, ddPort, wantLogs)
          ingestListeners += ingest
          if (wantLogs) {
            val stamped = ingest.df.select(
              col("message"), col("status"),
              coalesce(timestamp_millis(col("tsms")), current_timestamp())
                .as("timestamp"),
              coalesce(col("hostname"), col("peer")).as("hostname"),
              col("service"), col("ddsource"), col("ddtags"),
              lit("datadog_agent").as("source_type"))
              .withColumn(SeqCol, xxhash64(col("message"), col("timestamp")))
            Frame(stamped, EventMeta(ListMap(
              "message" -> VStr, "status" -> VStr, "timestamp" -> VTime,
              "hostname" -> VStr, "service" -> VStr, "ddsource" -> VStr,
              "ddtags" -> VStr, "source_type" -> VStr), None))
          } else {
            val stamped = ingest.df.select(
              col("name"),
              lit(null).cast("string").as("namespace"),
              col("tags"), col("kind"),
              col("valueType").as("value_type"), col("value"),
              timestamp_seconds(col("tsec")).as("ts"))
              .withColumn(SeqCol, xxhash64(
                col("name"), col("tags"), col("value"), col("ts")))
            Frame(stamped, MetricMeta, metric = true)
          }
        case Some("logstash") =>
          // reference src/sources/logstash.rs: the beats/lumberjack
          // listener. Fields are schemaless → canonical JSON under
          // `message`; `timestamp` = the event's parsed @timestamp
          // else receipt time (handle_events' legacy arm); `host` =
          // the event's own host field else the peer (InsertIfEmpty).
          val addr = cfg.str("address").getOrElse(
            throw new IllegalArgumentException(s"source $name: no address"))
          val (host, port) = splitHostPort(name, addr)
          val ingest = new graft.streaming.LogstashIngest(spark, host, port)
          ingestListeners += ingest
          val stamped = ingest.df.select(
            col("fields").as("message"),
            coalesce(
              try_to_timestamp(get_json_object(col("fields"), "$.@timestamp")),
              current_timestamp()).as("timestamp"),
            coalesce(get_json_object(col("fields"), "$.host"), col("peer"))
              .as("host"),
            lit("logstash").as("source_type"))
            .withColumn(SeqCol, xxhash64(col("message")))
          Frame(stamped, EventMeta(ListMap(
            "message" -> VStr, "timestamp" -> VTime,
            "host" -> VStr, "source_type" -> VStr), None))
        case Some("fluent") =>
          // the live forward-protocol listener: record JSON under
          // `message` (schemaless by design — static streaming schema;
          // parse_json structures it downstream, the batch replay arm
          // infers the real schema), tag/timestamp/host/source_type
          // stamps. A sender chunk option is acked in-band.
          val addr = cfg.str("address").getOrElse(
            throw new IllegalArgumentException(s"source $name: no address"))
          val (host, port) = splitHostPort(name, addr)
          val ingest = new graft.streaming.FluentIngest(spark, host, port)
          ingestListeners += ingest
          val stamped = ingest.df.select(
            col("record").as("message"), col("tag"),
            coalesce(timestamp_seconds(col("tsecs")), current_timestamp())
              .as("timestamp"),
            col("peer").as("host"), lit("fluent").as("source_type"))
            .withColumn(SeqCol, xxhash64(col("message"), col("tag")))
          Frame(stamped, EventMeta(ListMap(
            "message" -> VStr, "tag" -> VStr, "timestamp" -> VTime,
            "host" -> VStr, "source_type" -> VStr), None))
        case Some("splunk_hec") =>
          // reference src/sources/splunk_hec/mod.rs: the Splunk HTTP
          // Event Collector endpoint (event + raw + health services,
          // Splunk's response contract). Events carry the HEC
          // envelope as columns; object events ride as canonical JSON
          // under `message` (static streaming schema — parse_json
          // downstream). Token auth refused loudly like every
          // credential surface.
          if (cfg.str("token").isDefined || cfg.get("valid_tokens").isDefined)
            throw VrlUnsupported(
              s"source $name: HEC token auth (no credential handling " +
                "in this engine — front with a proxy)")
          val addr = cfg.str("address").getOrElse(
            throw new IllegalArgumentException(s"source $name: no address"))
          val (host, port) = splitHostPort(name, addr)
          val ingest = new graft.streaming.HecIngest(spark, host, port)
          ingestListeners += ingest
          val stamped = ingest.df.select(
            col("message"), col("channel"), col("source"), col("sourcetype"),
            col("index"), col("fields"),
            // envelope host wins, peer is the fallback (build_event's
            // host extractor over the connection address)
            coalesce(col("host"), col("peer")).as("host"),
            // Time::Provided, else the reference stamps receipt time
            coalesce(timestamp_seconds(col("tsecs")), current_timestamp())
              .as("timestamp"),
            lit("splunk_hec").as("source_type"))
            .withColumn(SeqCol, xxhash64(col("message"), col("timestamp")))
          Frame(stamped, EventMeta(ListMap(
            "message" -> VStr, "channel" -> VStr, "source" -> VStr,
            "sourcetype" -> VStr, "index" -> VStr, "fields" -> VStr,
            "host" -> VStr, "timestamp" -> VTime,
            "source_type" -> VStr), None))
        case Some("opentelemetry") =>
          // reference src/sources/opentelemetry/{config,http}.rs: the
          // OTLP/HTTP listener (`:4318` shape) with POST
          // /v1/{logs,metrics,traces} routes, each decoding its
          // signal's Export*ServiceRequest protobuf. The decoded tree
          // is data-shaped, and a streaming schema is static, so each
          // request emits ONE event carrying the canonical OTLP/JSON
          // under `message` plus `signal`/`host`/`source_type` stamps
          // — parse_json in a remap structures it downstream (the
          // batch capture-replay arm infers the real schema).
          refuseOtlpGrpc(name, cfg)
          val addr = cfg.tab("http").flatMap(_.str("address")).getOrElse(
            throw new IllegalArgumentException(
              s"source $name: no [sources.$name.http] address"))
          val (host, port) = splitHostPort(name, addr)
          val ingest = new graft.streaming.OtlpIngest(spark, host, port)
          ingestListeners += ingest
          val stamped = ingest.df.select(
            col("message"), col("signal"), col("peer").as("host"),
            lit("opentelemetry").as("source_type"))
            .withColumn(SeqCol, xxhash64(col("message")))
          Frame(stamped, EventMeta(ListMap(
            "message" -> VStr, "signal" -> VStr,
            "host" -> VStr, "source_type" -> VStr), None))
        case Some("socket") =>
          // reference src/sources/socket/mod.rs: mode tcp|udp|unix_*,
          // address, decoding codec. TCP stream mode maps onto Spark's
          // socket reader (newline-framed text lines), with one honest
          // divergence: the reference LISTENS on `address` while
          // Spark's reader CONNECTS to it — the config points at the
          // line-producing endpoint. Datagram modes have no Spark
          // analog and are refused.
          val mode = cfg.str("mode").getOrElse("tcp")
          if (mode != "tcp" && mode != "udp") throw VrlUnsupported(
            s"source $name: socket mode $mode (tcp stream + udp " +
              "datagram modes — unix sockets have no JVM listener here)")
          val addr = cfg.str("address").getOrElse(
            throw new IllegalArgumentException(s"source $name: no address"))
          val (host, port) = splitHostPort(name, addr)
          val codec = cfg.tab("decoding").flatMap(_.str("codec")).getOrElse("bytes")
          if (codec == "json") throw VrlUnsupported(
            s"source $name: json decoding on a socket source " +
              "(inference needs a batch line set — use bytes + remap parse_json)")
          val df = if (mode == "udp") {
            // reference src/sources/socket/udp.rs: BIND the address,
            // frame each datagram as its own complete stream (the
            // statsd/syslog UDP shape; chunked_gelf reassembles
            // across datagrams inside UdpIngest)
            val framingTab = cfg.tab("framing")
            val fMethod = framingTab.flatMap(_.str("method"))
              .getOrElse("newline_delimited")
            val ingest = new graft.streaming.UdpIngest(spark, host, port,
              Framing.builder(fMethod, framingTab, s"source $name"))
            ingestListeners += ingest
            ingest.df.select(col("message"))
          } else
            // tcp keeps the documented divergence: the reference
            // LISTENS on `address` while Spark's reader CONNECTS to it
            spark.readStream.format("socket")
              .option("host", host).option("port", port)
              .load().withColumnRenamed("value", "message")
          decodeLines(spark, name, codec,
            Frame(df.withColumn(SeqCol, xxhash64(col("message"))),
              EventMeta(ListMap("message" -> VStr), None)))
        case Some("file") =>
          val codec = cfg.tab("decoding").flatMap(_.str("codec")).getOrElse("bytes")
          // json is batch-only: schema inference needs the full line set
          // (a stream must declare its schema up front)
          if (codec == "json") throw VrlUnsupported(
            s"source $name: json decoding on a streaming file source " +
              "(inference needs the batch line set — use Cli run, or " +
              "bytes + remap parse_json)")
          // never silently ignore a configured aggregation: the batch
          // path runs the exact state machine (LineAgg.mergeWithStart);
          // the cross-batch form is StreamOps.lineAgg on the library
          // surface (ContinueThrough + flush timeout)
          if (cfg.tab("multiline").isDefined) throw VrlUnsupported(
            s"source $name: multiline on a streaming file source " +
              "(use Cli run for the exact batch machine, or " +
              "graft.streaming.StreamOps.lineAgg)")
          val df = filtered(spark.readStream).text(dir)
            .withColumnRenamed("value", "message")
          decodeLines(spark, name, codec,
            Frame(df.withColumn(SeqCol, xxhash64(col("message"))),
              EventMeta(ListMap("message" -> VStr), None)))
        case other =>
          throw VrlUnsupported(s"source $name: type ${other.getOrElse("?")}")
      }
      name -> frame
    }

  /** Start every sink as its own checkpointed streaming query.
    * Per-sink query isolation is Structured Streaming's multi-sink
    * contract — each query tracks its own offsets under
    * `<checkpointRoot>/<sink>`, so one slow sink never stalls another
    * and a killed job resumes each sink from ITS recorded position.
    * The `[checkpoint] manifest` option is batch-only here: the
    * streaming checkpoint already IS the lineage record (offsets +
    * file manifest), so a second manifest would be a divergent copy.
    */
  def startStreamingSinks(outputs: Map[String, Frame], checkpointRoot: String)
      : Seq[(String, org.apache.spark.sql.streaming.StreamingQuery)] = {
    // memory enrichment tables consume their inputs as a sink-shaped
    // query: each micro-batch upserts into the process cache
    // (memory/table.rs handle_value), checkpointed like any sink so a
    // resumed run replays only unseen batches
    val memQueries = memoryTableDefs.toSeq.flatMap { case (tname, (ttl, inputs)) =>
      inputs.flatMap(in => outputs.get(in).map((in, _))).map { case (in, f) =>
        val meta = f.meta
        val q = f.df.writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            MemoryCache.upsertFrame(tname, Frame(batch, meta), ttl); ()
          }
          .option("checkpointLocation", s"$checkpointRoot/__mem_${tname}_$in")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        s"__mem_$tname" -> q
      }
    }
    memQueries ++ sinkDefs.toSeq.map { case (name, cfg) =>
      val in = sinkInput(name, cfg, outputs)
      val df = in.df.drop(SeqCol)
      // lazy: the console sink has no path
      lazy val path = resolvePath(cfg.str("path").getOrElse(
        throw new IllegalArgumentException(s"sink $name: no path")))
      if (cfg.tab("checkpoint").flatMap(_.str("manifest")).isDefined)
        throw VrlUnsupported(
          s"sink $name: [checkpoint] manifest in streaming mode (the query checkpoint is the lineage)")
      val trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()
      val q = cfg.str("type") match {
        case Some("parquet") =>
          val parts = cfg.strArr("partition_by")
          val w = df.writeStream.format("parquet")
            .option("path", path)
            .option("checkpointLocation", s"$checkpointRoot/$name")
            .trigger(trigger)
          (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).start()
        case Some("file") =>
          val line = encodedLine(name, in, cfg.tab("encoding"))
          in.df.select(line.as("value")).where(col("value").isNotNull)
            .writeStream.format("text")
            .option("path", path)
            .option("checkpointLocation", s"$checkpointRoot/$name")
            .trigger(trigger)
            .start()
        case Some("console") =>
          val line = encodedLine(name, in, cfg.tab("encoding"))
          in.df.select(line.as("value")).where(col("value").isNotNull)
            .writeStream.format("console")
            .option("truncate", "false")
            .option("checkpointLocation", s"$checkpointRoot/$name")
            .trigger(trigger)
            .start()
        case Some("socket") =>
          // the streaming form of the socket sink: each micro-batch
          // fans out through the same per-partition writer (TCP lines
          // or one UDP datagram per event), with the query checkpoint
          // recording which source offsets have been delivered
          // (at-least-once across restarts)
          val (sockMode, host, port) = socketSinkAddr(name, cfg)
          val line = encodedLine(name, in, cfg.tab("encoding"))
          in.df.select(line.as("value")).where(col("value").isNotNull)
            .writeStream
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
              if (sockMode == "udp")
                graft.sinks.SocketSink.writeDatagrams(batch, host, port)
              else graft.sinks.SocketSink.writeLines(batch, host, port)
              ()
            }
            .option("checkpointLocation", s"$checkpointRoot/$name")
            .trigger(trigger)
            .start()
        case Some("http") =>
          val hc = httpSinkCfg(name, cfg)
          val line = encodedLine(name, in, cfg.tab("encoding"))
          in.df.select(line.as("value")).where(col("value").isNotNull)
            .writeStream
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
              graft.sinks.HttpSink.writeLines(batch, hc); ()
            }
            .option("checkpointLocation", s"$checkpointRoot/$name")
            .trigger(trigger)
            .start()
        case Some("blackhole") =>
          // the streaming meter: per-micro-batch counts to stderr when
          // print_interval_secs > 0 (the batch cadence stands in for
          // the reporting interval)
          val printSecs = cfg.long("print_interval_secs").getOrElse(0L)
          val sinkName = name
          df.writeStream
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
              val n = batch.count()
              if (printSecs > 0)
                System.err.println(
                  s"sink $sinkName: batch=$id events_collected=$n")
              ()
            }
            .option("checkpointLocation", s"$checkpointRoot/$name")
            .trigger(trigger)
            .start()
        case other => throw VrlUnsupported(s"sink $name: type ${other.getOrElse("?")}")
      }
      name -> q
    }
  }

  /** Whole-config STREAMING execution: the reference's continuous
    * `vector run` lifecycle, drained with Trigger.AvailableNow — each
    * invocation processes exactly the source files not yet recorded in
    * the checkpoint, then stops. Re-running with the same
    * `checkpointRoot` after new files land processes ONLY the new
    * files (resume-from-checkpoint at the topology level). Returns
    * sink -> input rows processed THIS run (0 on a fully-caught-up
    * re-run), which is why it reports progress counts rather than a
    * read-back count of the (cumulative, append-mode) sink directory.
    */
  def executeStreaming(spark: org.apache.spark.sql.SparkSession,
                       checkpointRoot: String): Map[String, Long] = {
    // the progress buffer is a RING (numRecentProgressUpdates, default
    // 100): a drain of more micro-batches than that would silently
    // under-report the per-run row count. Widen it for the drain and
    // restore after — reading the buffer after awaitTermination is
    // synchronous, unlike a StreamingQueryListener.
    val key = "spark.sql.streaming.numRecentProgressUpdates"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "100000")
    try {
      streamingEval = true
      val src = loadStreamingSources(spark)
      val queries = startStreamingSinks(src ++ run(src), checkpointRoot)
      queries.map { case (name, q) =>
        q.awaitTermination()
        name -> q.recentProgress.map(_.numInputRows).sum
      }.toMap
    } finally {
      streamingEval = false
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  private def readRelative(p: String): String = {
    val f = java.nio.file.Paths.get(resolvePath(p))
    new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
  }
}

object Topology {

  /** Kept-pair count above which config tag_cardinality_limit switches
    * from the broadcast-literal lookup to the distributed join path
    * (var: test seam — specs drop it to force the join path on small
    * data; production leaves the default).
    */
  private[graft] var TagLimitBroadcastCap: Int = 1000000

  /** The join arm's live persisted inputs, newest last (see
    * tagLimitJoined): a FIFO so a concurrent evaluation can't release
    * a cache another in-flight plan still reads.
    */
  private val tagLimitCaches = scala.collection.mutable.Queue.empty[DataFrame]
  private val TagLimitCacheKeep = 8

  /** Arrival-order column carried alongside event fields. */
  val SeqCol = "__seq"

  /** The component registry (`vector list`, src/list.rs): every `type`
    * string the dispatchers accept — sources (`loadSources`),
    * transforms (`applyTransform`), sinks (`writeSinks`/`dryRunSinks`),
    * enrichment tables (`enrichmentTables`). Kept adjacent to the
    * dispatch matches; update together (CliSurfaceSpec cross-checks).
    */
  val SourceTypes: Seq[String] = Seq(
    "demo_logs", "exec", "file", "host_metrics", "http_client",
    "aws_kinesis_firehose", "datadog_agent", "fluent", "heroku_logs",
    "http_server", "internal_logs", "internal_metrics", "kafka",
    "logstash", "opentelemetry", "parquet", "prometheus_remote_write",
    "prometheus_scrape", "socket", "splunk_hec", "static_metrics",
    "syslog", "websocket")
  /** Per-type allowed option keys (deny_unknown_fields). Keys the
    * engine reads, plus reference options that are semantics-neutral
    * here and accepted unused: remap `runtime` (implementation knob);
    * reduce `expire_after_ms`/`flush_period_ms` (liveness timers — a
    * bounded batch always drains; the streaming forms honor them);
    * throttle `internal_metrics` (extra telemetry);
    * incremental_to_absolute `cache` (bounds per-series state — the
    * batch normalization is exact, strictly tighter);
    * aws_ec2_metadata's IMDS plumbing (endpoint/refresh/proxy/required
    * — the record arrives inline via mock_values). Options that would
    * CHANGE semantics if honored (metric_to_log host_tag /
    * metric_tag_values, remap metric_tag_values, …) are NOT listed, so
    * they fail the load instead of silently compiling differently.
    */
  private val TransformKeys: Map[String, Set[String]] = Map(
    "remap" -> Set("source", "file", "files", "timezone", "drop_on_error",
      "drop_on_abort", "reroute_dropped", "runtime"),
    "filter" -> Set("condition"),
    "route" -> Set("route", "reroute_unmatched"),
    "exclusive_route" -> Set("routes"),
    "dedupe" -> Set("fields", "cache", "time_settings"),
    "reduce" -> Set("group_by", "merge_strategies", "ends_when",
      "starts_when", "max_events", "expire_after_ms", "flush_period_ms",
      "end_every_period_ms"),
    "sample" -> Set("rate", "ratio", "key_field", "group_by", "exclude",
      "sample_rate_key"),
    "throttle" -> Set("threshold", "window_secs", "key_field", "exclude",
      "internal_metrics"),
    "aggregate" -> Set("interval_ms", "mode", "watermark"),
    "log_to_metric" -> Set("metrics", "all_metrics"),
    "metric_to_log" -> Set.empty,
    "incremental_to_absolute" -> Set("cache"),
    "tag_cardinality_limit" -> Set("mode", "value_limit",
      "limit_exceeded_action", "per_metric_limits", "cache_size_per_key"),
    "trace_to_log" -> Set.empty,
    "aws_ec2_metadata" -> Set("mock_values", "fields", "namespace", "tags",
      "endpoint", "refresh_interval_secs", "refresh_timeout_secs", "proxy",
      "required"),
    "window" -> Set("flush_when", "forward_when", "num_events_before",
      "num_events_after", "group_by"),
    "lua" -> Set("version", "source", "hooks", "timers", "search_dirs",
      "metric_tag_values"))

  val TransformTypes: Seq[String] = Seq(
    "aggregate", "aws_ec2_metadata", "dedupe", "exclusive_route", "filter",
    "incremental_to_absolute", "log_to_metric", "lua", "metric_to_log",
    "reduce", "remap", "route", "sample", "tag_cardinality_limit",
    "throttle", "trace_to_log", "window")
  val SinkTypes: Seq[String] = Seq(
    "blackhole", "console", "file", "http", "parquet",
    "prometheus_exporter", "socket")
  val EnrichmentTableTypes: Seq[String] = Seq("file", "memory")

  /** The flat metric-event schema every metric-side transform exchanges
    * (SURVEY §1.3; reference lib/vector-core/src/event/metric/): name,
    * namespace, tags (canonical `k=v,k=v` string), kind
    * (absolute|incremental), value_type (counter|gauge|set|
    * distribution), value, ts.
    */
  private[config] val MetricMeta: EventMeta = EventMeta(ListMap(
    "name" -> VStr, "namespace" -> VStr, "tags" -> VStr, "kind" -> VStr,
    "value_type" -> VStr, "value" -> VFloat, "ts" -> VTime), None)

  /** The VRL-facing view of a metric event: remap programs and
    * conditions on a metric see `.name .namespace .tags` (a MAP)
    * `.kind .type .timestamp`, matching the reference's metric event
    * shape in VRL (tests/behavior/transforms/remap.toml
    * `remap_metrics`), while the flat model stores tags as the
    * canonical sorted `k=v,…` string and the type under `value_type`.
    * Bindings are expressions over `df`'s columns, so a condition
    * compiled with them still evaluates against the original frame.
    */
  private[config] def metricVrlRoots(df: DataFrame): ListMap[String, CV] = ListMap(
    "name" -> CV(df.col("name"), VStr),
    "namespace" -> CV(df.col("namespace"), VStr),
    "tags" -> CV(when(df.col("tags").isNotNull,
      str_to_map(df.col("tags"), lit(","), lit("="))), VMap),
    "kind" -> CV(df.col("kind"), VStr),
    "type" -> CV(df.col("value_type"), VStr),
    "value" -> CV(df.col("value"), VFloat),
    "timestamp" -> CV(df.col("ts"), VTime))

  /** Inverse of [[metricVrlRoots]] after a remap: reassemble the flat
    * metric model from the remapped view columns. Every metric field
    * must survive the program with a compatible type — the reference
    * likewise rejects remaps that break the metric schema rather than
    * emitting a half-metric.
    */
  private[config] def metricVrlUnview(df: DataFrame, meta: EventMeta): Frame = {
    val known = Set("name", "namespace", "tags", "kind", "type", "value",
      "timestamp")
    val extra = meta.types.keySet -- known
    if (extra.nonEmpty) throw new IllegalArgumentException(
      s"remap on metrics set non-metric field(s) ${extra.toSeq.sorted.mkString(", ")}" +
        " — a metric event has no free-form fields (use .tags.<k>)")
    def req(n: String): VT = meta.types.getOrElse(n,
      throw new IllegalArgumentException(
        s"remap on metrics removed required metric field $n"))
    def strCol(n: String): Column = req(n) match {
      case VStr | VNullT => df.col(s"`$n`").cast("string")
      case other => throw new IllegalArgumentException(
        s"remap on metrics: field $n must stay a string, got $other")
    }
    val tagsCol = req("tags") match {
      case VMap =>
        val m = df.col("tags")
        when(m.isNotNull, array_join(transform(sort_array(map_entries(m)),
          e => concat_ws("=", e.getField("key"), e.getField("value"))), ","))
      case VNullT => lit(null).cast("string")
      case other => throw new IllegalArgumentException(
        s"remap on metrics: tags must stay a map, got $other")
    }
    val valueCol = req("value") match {
      case VFloat | VInt => df.col("value").cast("double")
      case other => throw new IllegalArgumentException(
        s"remap on metrics: value must stay numeric, got $other")
    }
    val tsCol = req("timestamp") match {
      case VTime => df.col("timestamp")
      case other => throw new IllegalArgumentException(
        s"remap on metrics: timestamp must stay a timestamp, got $other")
    }
    Frame(df.select(
      df.col(SeqCol),
      strCol("name").as("name"),
      strCol("namespace").as("namespace"),
      tagsCol.as("tags"),
      strCol("kind").as("kind"),
      strCol("type").as("value_type"),
      valueCol.as("value"),
      tsCol.as("ts")), MetricMeta, metric = true)
  }

  /** `$VAR` env interpolation runs on the raw text before parsing,
    * like the reference's prepare_input (src/config/loading/mod.rs).
    */
  def load(text: String): Topology =
    new Topology(Toml.parse(EnvVars.interpolate(text)))

  /** Loads TOML, JSON, or YAML by file extension (the reference's
    * multi-format config loader, src/config/format.rs).
    */
  def loadFile(path: String): Topology = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    new Topology(ConfigFormats.parseFile(path, EnvVars.interpolate(text)),
      Some(java.nio.file.Paths.get(path).toAbsolutePath.getParent.toString))
  }

  private def rootOf(id: String): String = id.split('.').head

  private[config] def parsePathStr(p: String): Seq[VrlAst.PathSeg] = {
    // accept the VRL-style `.field` spelling of a config path: without
    // the strip, ".k" split to ["", "k"] and the empty head resolved to
    // a MISSING field — turning e.g. a dedupe key constant (one
    // survivor from the whole stream) instead of failing
    val norm = if (p.startsWith(".")) p.drop(1) else p
    val segs = norm.split('.').toSeq
    require(norm.nonEmpty && segs.forall(_.nonEmpty), s"bad field path '$p'")
    segs.map(SegName(_))
  }

  /** Minimal RFC-4180 CSV reader (driver-side, lookup-table-sized
    * inputs): quoted fields, doubled-quote escapes, header row.
    */
  private[config] def loadCsvTable(path: String, delim: Char): EnrichTableData = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    val lines = text.split("\r?\n").toVector.filter(_.nonEmpty)
    if (lines.isEmpty) return EnrichTableData(Nil)
    def fields(line: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      val sb = new StringBuilder
      var inQ = false
      var i = 0
      while (i < line.length) {
        val ch = line.charAt(i)
        if (inQ) {
          if (ch == '"' && i + 1 < line.length && line.charAt(i + 1) == '"') { sb += '"'; i += 1 }
          else if (ch == '"') inQ = false
          else sb += ch
        } else if (ch == '"') inQ = true
        else if (ch == delim) { out += sb.result(); sb.clear() }
        else sb += ch
        i += 1
      }
      out += sb.result()
      out.result()
    }
    val header = fields(lines.head)
    EnrichTableData(lines.tail.map(l => ListMap(header.zip(fields(l)): _*)))
  }

  // ------------------------------------------------- frame unification
  /** Union frames by field name: equal types keep their type, int/float
    * widens, struct-vs-struct unions fieldwise, anything else widens to
    * VARIANT — the plan-time analogue of the reference's dynamic events.
    */
  private[config] def unionFrames(frames: Seq[Frame]): Frame = {
    require(frames.nonEmpty)
    if (frames.length == 1) return frames.head
    val names = frames.flatMap(_.meta.types.keys).distinct
    val unified: ListMap[String, VT] = ListMap(names.map { n =>
      n -> frames.flatMap(_.meta.types.get(n)).reduce(unifyT)
    }: _*)
    val dfs = frames.map { f =>
      val cols = unified.map { case (n, t) =>
        f.meta.types.get(n) match {
          case Some(ft) => adapt(CV(f.df.col(s"`$n`"), ft), t).as(n)
          case None => lit(null).cast(toSpark(t)).as(n)
        }
      }.toSeq
      f.df.select(col(SeqCol) +: cols: _*)
    }
    Frame(dfs.reduce(_ union _), EventMeta(unified, None),
      metric = frames.forall(_.metric))
  }

  private[config] def unifyT(a: VT, b: VT): VT =
    if (a == b) a
    else (a, b) match {
      case (VNullT, x) => x
      case (x, VNullT) => x
      case (VInt, VFloat) | (VFloat, VInt) => VFloat
      case (VObj(fa), VObj(fb)) =>
        val keys = (fa.keys ++ fb.keys).toSeq.distinct
        VObj(ListMap(keys.map { k =>
          k -> ((fa.get(k), fb.get(k)) match {
            case (Some(x), Some(y)) => unifyT(x, y)
            case (Some(x), None) => x
            case (None, Some(y)) => y
            case _ => VNullT
          })
        }: _*))
      case _ => VAny
    }

  private[config] def adapt(cv: CV, target: VT): Column =
    if (cv.t == target) cv.col
    else (cv.t, target) match {
      case (VNullT, t) => lit(null).cast(toSpark(t))
      case (VInt, VFloat) => cv.col.cast("double")
      case (VObj(fa), VObj(fb)) =>
        struct(fb.map { case (k, t) =>
          (fa.get(k) match {
            case Some(ft) => adapt(CV(cv.col.getField(k), ft), t)
            case None => lit(null).cast(toSpark(t))
          }).as(k)
        }.toSeq: _*)
      case (_, VAny) => VrlCompile.toVariant(cv)
      case (a, b) => throw VrlUnsupported(s"cannot adapt $a to $b")
    }

  private[config] def toSpark(t: VT): DataType = t match {
    case VStr => StringType
    case VBytes => BinaryType
    case VInt => LongType
    case VFloat => DoubleType
    case VBool => BooleanType
    case VTime => TimestampType
    case VNullT => StringType
    case VAny => VariantType
    case VArrOf(e) => ArrayType(toSpark(e))
    case VHet(ts) =>
      StructType(ts.zipWithIndex.map { case (et, i) => StructField(s"_$i", toSpark(et)) })
    case VObj(fs) =>
      StructType(fs.map { case (n, ft) => StructField(n, toSpark(ft)) }.toSeq)
    case VMap => MapType(StringType, StringType)
  }
}

/** Vector-style conditions over a Frame: `vrl` programs, the `is_log` /
  * `is_metric` type guards (the config path models log events), and
  * bare-string VRL shorthand (reference: src/conditions/mod.rs).
  */
object Conditions {
  def compile(v: Option[Toml.V], in: Frame,
              tables: Map[String, EnrichTableData] = Map.empty): Column = v match {
    case Some(TStr(src)) => vrl(src, in, tables)
    case Some(t: TTab) =>
      t.str("type").getOrElse("vrl") match {
        case "vrl" => vrl(t.str("source").getOrElse(
          throw new IllegalArgumentException("vrl condition without source")), in, tables)
        case "is_log" => lit(!in.metric)
        case "is_metric" => lit(in.metric)
        case "is_trace" => lit(false)
        case "datadog_search" =>
          val q = t.str("source").getOrElse(
            throw new IllegalArgumentException("datadog_search condition without source"))
          graft.functions.SearchSyntax.compile(q, in.df.col("message"),
            n => in.df.col(s"`$n`"))
        case other => throw VrlUnsupported(s"condition type $other")
      }
    case _ => throw new IllegalArgumentException("missing condition")
  }

  def vrl(src: String, in: Frame,
          tables: Map[String, EnrichTableData] = Map.empty): Column =
    VrlCompile.condition(in.df, in.meta, VrlAst.parse(src), tables,
      if (in.metric) Some(Topology.metricVrlRoots(in.df)) else None)
}
