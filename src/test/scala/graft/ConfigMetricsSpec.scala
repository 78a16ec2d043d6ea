package graft

import org.apache.spark.sql.functions._

import graft.config._
import graft.config.VrlCompile.{EventMeta, VFloat, VObj, VStr, VTime}
import graft.config.VrlAst.VrlUnsupported

import scala.collection.immutable.ListMap

/** Config front-end coverage for the metric-side transforms
  * (log_to_metric, aggregate, metric_to_log, incremental_to_absolute,
  * tag_cardinality_limit) plus window / trace_to_log / aws_ec2_metadata
  * — the reference transform types that previously had only the Scala
  * operator surface. Semantics pinned against the reference sources
  * cited in Topology.scala.
  */
class ConfigMetricsSpec extends SparkSpec {

  import spark.implicits._

  private def logFrame: Frame = {
    val df = Seq(
      ("h1", "200", "12.5", "2024-01-01T00:00:01", 1L),
      ("h1", "500", "80.0", "2024-01-01T00:00:02", 2L),
      ("h2", "200", "abc", "2024-01-01T00:00:03", 3L),
      ("h2", null.asInstanceOf[String], "5.0", "2024-01-01T00:00:11", 4L))
      .toDF("host", "status", "duration", "ts_str", Topology.SeqCol)
      .withColumn("timestamp", to_timestamp(col("ts_str")))
    Frame(df, EventMeta(ListMap(
      "host" -> VStr, "status" -> VStr, "duration" -> VStr,
      "timestamp" -> VTime), None))
  }

  private val metricFields = ListMap(
    "name" -> VStr, "namespace" -> VStr, "tags" -> VStr, "kind" -> VStr,
    "value_type" -> VStr, "value" -> VFloat, "ts" -> VTime)

  /** A hand-built metric frame (what log_to_metric emits). */
  private def metricFrame(rows: Seq[(String, String, String, String, String, Double, String, Long)]): Frame = {
    val df = rows
      .toDF("name", "namespace", "tags", "kind", "value_type", "value", "ts_str", Topology.SeqCol)
      .withColumn("ts", to_timestamp(col("ts_str"))).drop("ts_str")
    Frame(df, EventMeta(metricFields, None), metric = true)
  }

  test("log_to_metric rules: counter skip-on-missing-field, gauge parse-error skip, templated tags") {
    val topo = Topology.load(
      """
        |[transforms.l2m]
        |  inputs = ["src"]
        |  type = "log_to_metric"
        |  [[transforms.l2m.metrics]]
        |    type = "counter"
        |    field = "status"
        |    name = "status_total"
        |    namespace = "svc"
        |    [transforms.l2m.metrics.tags]
        |      status = "{{status}}"
        |      host = "{{host}}"
        |  [[transforms.l2m.metrics]]
        |    type = "gauge"
        |    field = "duration"
        |""".stripMargin)
    val out = topo.run(Map("src" -> logFrame))("l2m")
    assert(out.metric, "log_to_metric output must be a metric frame")
    val rows = out.df.orderBy("name", Topology.SeqCol)
      .select("name", "namespace", "tags", "kind", "value_type", "value")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getDouble(5))).toSeq
    assert(rows == Seq(
      // gauge: "abc" fails the float parse (row skipped); default name = field path
      ("duration", null, "", "absolute", "gauge", 12.5),
      ("duration", null, "", "absolute", "gauge", 80.0),
      ("duration", null, "", "absolute", "gauge", 5.0),
      // counter: row with null status is skipped (FieldNotFound), value 1 per event
      ("status_total", "svc", "status=200,host=h1", "incremental", "counter", 1.0),
      ("status_total", "svc", "status=500,host=h1", "incremental", "counter", 1.0),
      ("status_total", "svc", "status=200,host=h2", "incremental", "counter", 1.0)), rows.toString)
  }

  test("log_to_metric tag whose template hits a null field is DROPPED, not rendered as k=") {
    // row 4 has null status: a gauge on duration still emits, but its
    // status tag must vanish (render_tags TemplateRenderingError skip)
    val topo = Topology.load(
      """
        |[transforms.l2m]
        |  inputs = ["src"]
        |  type = "log_to_metric"
        |  [[transforms.l2m.metrics]]
        |    type = "gauge"
        |    field = "duration"
        |    name = "dur"
        |    [transforms.l2m.metrics.tags]
        |      status = "{{status}}"
        |      host = "{{host}}"
        |""".stripMargin)
    val rows = topo.run(Map("src" -> logFrame))("l2m").df
      .orderBy(Topology.SeqCol).select("tags").collect().map(_.getString(0)).toSeq
    assert(rows == Seq("status=200,host=h1", "status=500,host=h1", "host=h2"), rows.toString)
  }

  test("log_to_metric increment_by_value counter sums the field; kind override honored") {
    val topo = Topology.load(
      """
        |[transforms.l2m]
        |  inputs = ["src"]
        |  type = "log_to_metric"
        |  [[transforms.l2m.metrics]]
        |    type = "counter"
        |    field = "duration"
        |    name = "dur_total"
        |    increment_by_value = true
        |    kind = "absolute"
        |""".stripMargin)
    val out = topo.run(Map("src" -> logFrame))("l2m").df
      .select("kind", "value").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(out.toSet == Set(("absolute", 12.5), ("absolute", 80.0), ("absolute", 5.0)))
  }

  test("aggregate auto from config: sum-incremental, last-absolute, per-series windows") {
    val topo = Topology.load(
      """
        |[transforms.l2m]
        |  inputs = ["src"]
        |  type = "log_to_metric"
        |  [[transforms.l2m.metrics]]
        |    type = "gauge"
        |    field = "duration"
        |    name = "dur"
        |[transforms.agg]
        |  inputs = ["l2m"]
        |  type = "aggregate"
        |  interval_ms = 10000
        |""".stripMargin)
    val out = topo.run(Map("src" -> logFrame))("agg")
    assert(out.metric)
    val rows = out.df.orderBy("ts")
      .select(col("name"), col("kind"), col("value_type"), col("value"),
        unix_timestamp(col("ts")).as("win"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getDouble(3), r.getLong(4))).toSeq
    // window [0,10): absolutes 12.5 then 80.0 -> last absolute wins
    assert(rows == Seq(
      ("dur", "absolute", "gauge", 80.0, 1704067200L),
      ("dur", "absolute", "gauge", 5.0, 1704067210L)), rows.toString)
  }

  test("aggregate mode/kind filters follow aggregate.rs record(): sum=incremental, latest=absolute, mean=absolute gauges, count=both") {
    val in = metricFrame(Seq(
      ("m", "ns", "", "incremental", "counter", 2.0, "2024-01-01T00:00:01", 1L),
      ("m", "ns", "", "incremental", "counter", 3.0, "2024-01-01T00:00:02", 2L),
      ("m", "ns", "", "absolute", "gauge", 10.0, "2024-01-01T00:00:03", 3L),
      ("m", "ns", "", "absolute", "gauge", 20.0, "2024-01-01T00:00:04", 4L)))
    def run(mode: String) = Topology.load(
      s"""
        |[transforms.a]
        |  inputs = ["src"]
        |  type = "aggregate"
        |  interval_ms = 60000
        |  mode = "$mode"
        |""".stripMargin).run(Map("src" -> in))("a").df
      .select("kind", "value_type", "value")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq

    assert(run("sum") == Seq(("incremental", "counter", 5.0)))
    assert(run("latest") == Seq(("absolute", "gauge", 20.0)))
    assert(run("mean") == Seq(("absolute", "gauge", 15.0)))
    assert(run("max") == Seq(("absolute", "gauge", 20.0)))
    assert(run("count").toSet == Set(
      ("incremental", "counter", 2.0), ("absolute", "counter", 2.0)))
    // auto: last absolute (20.0) + incrementals after it (none)
    assert(run("auto").toSet == Set(
      ("incremental", "counter", 5.0), ("absolute", "gauge", 20.0)))
  }

  test("aggregate refuses non-metric input and sub-second intervals") {
    val bad = intercept[IllegalArgumentException] {
      Topology.load(
        """
          |[transforms.a]
          |  inputs = ["src"]
          |  type = "aggregate"
          |""".stripMargin).run(Map("src" -> logFrame))
    }
    assert(bad.getMessage.contains("log_to_metric"), bad.getMessage)
    val badMs = intercept[VrlUnsupported] {
      Topology.load(
        """
          |[transforms.a]
          |  inputs = ["src"]
          |  type = "aggregate"
          |  interval_ms = 500
          |""".stripMargin).run(Map("src" ->
        metricFrame(Seq(("m", "ns", "", "incremental", "counter", 1.0, "2024-01-01T00:00:01", 1L)))))
    }
    assert(badMs.getMessage.contains("interval_ms"))
  }

  test("metric_to_log renders the canonical message and keeps flat fields addressable") {
    val in = metricFrame(Seq(
      ("m", "ns", "a=1", "incremental", "counter", 2.0, "2024-01-01T00:00:01", 1L)))
    val topo = Topology.load(
      """
        |[transforms.m2l]
        |  inputs = ["src"]
        |  type = "metric_to_log"
        |[transforms.sel]
        |  inputs = ["m2l"]
        |  type = "remap"
        |  source = '''
        |    .msg2 = string!(.message)
        |  '''
        |""".stripMargin)
    val out = topo.run(Map("src" -> in))
    assert(!out("m2l").metric, "metric_to_log output is a log frame")
    val msg = out("sel").df.select("msg2").head.getString(0)
    assert(msg == "metric name=m kind=incremental type=counter tags={a=1} value=2.0", msg)
  }

  test("incremental_to_absolute: per-series running sum, absolutes pass through") {
    val in = metricFrame(Seq(
      ("m", "ns", "", "incremental", "counter", 2.0, "2024-01-01T00:00:01", 1L),
      ("m", "ns", "", "incremental", "counter", 3.0, "2024-01-01T00:00:02", 2L),
      ("g", "ns", "", "absolute", "gauge", 7.0, "2024-01-01T00:00:03", 3L)))
    val out = Topology.load(
      """
        |[transforms.abs]
        |  inputs = ["src"]
        |  type = "incremental_to_absolute"
        |""".stripMargin).run(Map("src" -> in))("abs").df
      .orderBy(Topology.SeqCol)
      .select("name", "kind", "value")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out == Seq(("m", "absolute", 2.0), ("m", "absolute", 5.0),
      ("g", "absolute", 7.0)), out.toString)
  }

  test("tag_cardinality_limit drop_tag strips past-limit values; drop_event drops the row; tag-less rows untouched") {
    val in = metricFrame(Seq(
      ("m", "ns", "env=a", "incremental", "counter", 1.0, "2024-01-01T00:00:01", 1L),
      ("m", "ns", "env=b,svc=x", "incremental", "counter", 1.0, "2024-01-01T00:00:02", 2L),
      ("m", "ns", null, "incremental", "counter", 1.0, "2024-01-01T00:00:03", 3L)))
    def topo(action: String) = Topology.load(
      s"""
        |[transforms.t]
        |  inputs = ["src"]
        |  type = "tag_cardinality_limit"
        |  value_limit = 1
        |  limit_exceeded_action = "$action"
        |  mode = "exact"
        |""".stripMargin)
    val tagged = topo("drop_tag").run(Map("src" -> in))("t").df
      .orderBy(Topology.SeqCol).select("tags").collect().map(_.getString(0)).toSeq
    // env=b is the second distinct env value (limit 1) -> tag dropped;
    // svc=x is svc's first value -> kept; null tags untouched
    assert(tagged == Seq("env=a", "svc=x", null), tagged.toString)

    val kept = topo("drop_event").run(Map("src" -> in))("t").df
      .orderBy(Topology.SeqCol).select(Topology.SeqCol).collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L, 3L), kept.toString)
  }

  test("tag_cardinality_limit join path (kept set past the broadcast cap) matches the literal path") {
    // a richer input: several keys, a shared-group override, bare tags
    val in = metricFrame((1 to 40).map { i =>
      val tags = i % 5 match {
        case 0 => s"env=e${i % 7},svc=s${i % 3}"
        case 1 => s"host" // bare tag
        case 2 => s"env=e${i % 7}"
        case 3 => null
        case _ => s"svc=s${i % 11},user=u$i"
      }
      (if (i % 4 == 0) "special" else "m", "ns", tags,
        "incremental", "counter", 1.0, f"2024-01-01T00:00:$i%02d", i.toLong)
    })
    def run(action: String) = Topology.load(
      s"""
        |[transforms.t]
        |  inputs = ["src"]
        |  type = "tag_cardinality_limit"
        |  value_limit = 3
        |  limit_exceeded_action = "$action"
        |  [transforms.t.per_metric_limits.special]
        |    value_limit = 1
        |    limit_exceeded_action = "drop_tag"
        |""".stripMargin).run(Map("src" -> in))("t").df
      .orderBy(Topology.SeqCol)
      .select(col(Topology.SeqCol), col("tags"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    for (action <- Seq("drop_tag", "drop_event")) {
      val viaLiteral = run(action)
      val old = Topology.TagLimitBroadcastCap
      val viaJoin = try { Topology.TagLimitBroadcastCap = 2; run(action) }
        finally Topology.TagLimitBroadcastCap = old
      assert(viaJoin == viaLiteral, s"$action: join path diverged\n" +
        s"join:    $viaJoin\nliteral: $viaLiteral")
      assert(viaLiteral.nonEmpty)
    }
  }

  test("window from config: flush_when context -B/+A per group, forward_when bypasses") {
    val df = Seq(
      ("h1", "info", 1L), ("h1", "info", 2L), ("h1", "error", 3L),
      ("h1", "info", 4L), ("h1", "info", 5L),
      ("h2", "info", 6L), ("h2", "fwd", 7L))
      .toDF("host", "level", Topology.SeqCol)
    val in = Frame(df, EventMeta(ListMap("host" -> VStr, "level" -> VStr), None))
    val out = Topology.load(
      """
        |[transforms.w]
        |  inputs = ["src"]
        |  type = "window"
        |  flush_when = '.level == "error"'
        |  forward_when = '.level == "fwd"'
        |  num_events_before = 1
        |  num_events_after = 1
        |  group_by = ["host"]
        |""".stripMargin).run(Map("src" -> in))("w").df
      .select(Topology.SeqCol).collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(2L, 3L, 4L, 7L), out.toString)

    val noKey = intercept[VrlUnsupported] {
      Topology.load(
        """
          |[transforms.w]
          |  inputs = ["src"]
          |  type = "window"
          |  flush_when = '.level == "error"'
          |""".stripMargin).run(Map("src" -> in))
    }
    assert(noKey.getMessage.contains("group_by"))
  }

  test("trace_to_log drops the envelope; aws_ec2_metadata stamps mock_values under fields filter") {
    val df = Seq(("t1", "s1", "p1", "hello", 1L))
      .toDF("trace_id", "span_id", "parent_span_id", "message", Topology.SeqCol)
    val in = Frame(df, EventMeta(ListMap("trace_id" -> VStr, "span_id" -> VStr,
      "parent_span_id" -> VStr, "message" -> VStr), None))
    val out = Topology.load(
      """
        |[transforms.t2l]
        |  inputs = ["src"]
        |  type = "trace_to_log"
        |[transforms.meta]
        |  inputs = ["t2l"]
        |  type = "aws_ec2_metadata"
        |  fields = ["instance-id"]
        |  [transforms.meta.mock_values]
        |    instance-id = "i-123"
        |    region = "us-east-1"
        |""".stripMargin).run(Map("src" -> in))
    val t2l = out("t2l")
    assert(t2l.meta.types.keySet == Set("message"))
    val stamped = out("meta")
    assert(stamped.meta.types.keySet == Set("message", "instance-id"))
    val row = stamped.df.select("message", "`instance-id`").head
    assert((row.getString(0), row.getString(1)) == ("hello", "i-123"))
  }

  test("log_to_metric all_metrics from config: arm precedence, malformed drops, tags object") {
    val df = Seq(
      ("c1", "incremental", Some(2.0), None: Option[Double], Map("a" -> "1"), 1L),
      ("g1", "absolute", None, Some(7.5), Map.empty[String, String], 2L),
      (null.asInstanceOf[String], "incremental", Some(1.0), None, Map.empty[String, String], 3L),
      ("bad", "bogus", Some(1.0), None, Map.empty[String, String], 4L))
      .toDF("name", "kind", "cv", "gv", "tags", Topology.SeqCol)
      .select(col("name"), col("kind"),
        struct(col("cv").as("value")).as("counter"),
        struct(col("gv").as("value")).as("gauge"),
        col("tags"), col(Topology.SeqCol))
    val in = Frame(df, EventMeta(ListMap(
      "name" -> VStr, "kind" -> VStr,
      "counter" -> VObj(ListMap("value" -> VFloat)),
      "gauge" -> VObj(ListMap("value" -> VFloat)),
      "tags" -> VrlCompile.VMap), None))
    val out = Topology.load(
      """
        |[transforms.l2m]
        |  inputs = ["src"]
        |  type = "log_to_metric"
        |  all_metrics = true
        |""".stripMargin).run(Map("src" -> in))("l2m")
    assert(out.metric)
    val rows = out.df.orderBy(Topology.SeqCol)
      .select("name", "tags", "kind", "value_type", "value")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getDouble(4))).toSeq
    // null name and bogus kind drop; counter arm wins when present
    assert(rows == Seq(
      ("c1", "a=1", "incremental", "counter", 2.0),
      ("g1", "", "absolute", "gauge", 7.5)), rows.toString)
  }

  test("tag_cardinality_limit per_metric_limits: override tracks its own group with its own limit/action") {
    // global limit 1 (drop_tag); metric "special" overrides to limit 2
    // with drop_event. Reference mod.rs:130-141: overridden metrics
    // track tag sets under their own key, everything else shares one
    // global pool — so special's env values don't consume global slots.
    val in = metricFrame(Seq(
      ("plain", "ns", "env=a", "incremental", "counter", 1.0, "2024-01-01T00:00:01", 1L),
      ("plain", "ns", "env=b", "incremental", "counter", 1.0, "2024-01-01T00:00:02", 2L),
      ("special", "ns", "env=x", "incremental", "counter", 1.0, "2024-01-01T00:00:03", 3L),
      ("special", "ns", "env=y", "incremental", "counter", 1.0, "2024-01-01T00:00:04", 4L),
      ("special", "ns", "env=z", "incremental", "counter", 1.0, "2024-01-01T00:00:05", 5L)))
    val out = Topology.load(
      """
        |[transforms.t]
        |  inputs = ["src"]
        |  type = "tag_cardinality_limit"
        |  value_limit = 1
        |  limit_exceeded_action = "drop_tag"
        |  [transforms.t.per_metric_limits.special]
        |    value_limit = 2
        |    limit_exceeded_action = "drop_event"
        |""".stripMargin).run(Map("src" -> in))("t").df
      .orderBy(Topology.SeqCol).select("name", "tags")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // plain: env=b is past the global limit -> tag dropped;
    // special: env=z is its THIRD distinct value (limit 2) -> row dropped
    assert(out == Seq(
      ("plain", "env=a"), ("plain", ""),
      ("special", "env=x"), ("special", "env=y")), out.toString)
  }

  test("tag_cardinality_limit hostile edges: bare tags round-trip, value_limit = 0 drops instead of throwing") {
    // bare tag "flag" (no '='): parses to a null map value — must not
    // trip three-valued logic (drop_event keeping in-limit rows) and
    // must round-trip bare through the drop_tag rebuild
    val in = metricFrame(Seq(
      ("m", "ns", "flag", "incremental", "counter", 1.0, "2024-01-01T00:00:01", 1L),
      ("m", "ns", "flag,env=a", "incremental", "counter", 1.0, "2024-01-01T00:00:02", 2L)))
    def run(limit: Int, action: String) = Topology.load(
      s"""
        |[transforms.t]
        |  inputs = ["src"]
        |  type = "tag_cardinality_limit"
        |  value_limit = $limit
        |  limit_exceeded_action = "$action"
        |""".stripMargin).run(Map("src" -> in))("t").df
      .orderBy(Topology.SeqCol).select("tags").collect().map(_.getString(0)).toSeq
    assert(run(5, "drop_event") == Seq("flag", "flag,env=a"))
    assert(run(5, "drop_tag") == Seq("flag", "env=a,flag"))
    // empty kept map (ANSI element_at would throw): all tags drop
    assert(run(0, "drop_tag") == Seq("", ""))
    assert(run(0, "drop_event") == Seq())
  }

  test("reduce starts_when from config cuts a new session AT the matching event; exclusive with ends_when") {
    val df = Seq(
      ("k", "begin", "a", 1L), ("k", "line", "b", 2L),
      ("k", "begin", "c", 3L), ("k", "line", "d", 4L))
      .toDF("g", "marker", "payload", Topology.SeqCol)
    val in = Frame(df, EventMeta(ListMap(
      "g" -> VStr, "marker" -> VStr, "payload" -> VStr), None))
    val out = Topology.load(
      """
        |[transforms.r]
        |  inputs = ["src"]
        |  type = "reduce"
        |  group_by = ["g"]
        |  starts_when = '.marker == "begin"'
        |  [transforms.r.merge_strategies]
        |    payload = "concat"
        |""".stripMargin).run(Map("src" -> in))("r").df
      .orderBy(Topology.SeqCol).select("payload").collect().map(_.getString(0)).toSeq
    assert(out == Seq("a b", "c d"), out.toString)

    val both = intercept[IllegalArgumentException] {
      Topology.load(
        """
          |[transforms.r]
          |  inputs = ["src"]
          |  type = "reduce"
          |  starts_when = '.marker == "begin"'
          |  ends_when = '.marker == "end"'
          |""".stripMargin).run(Map("src" -> in))
    }
    assert(both.getMessage.contains("mutually exclusive"))
  }

  test("is_metric / is_log route conditions see the frame's event type") {
    val in = metricFrame(Seq(
      ("m", "ns", "", "incremental", "counter", 1.0, "2024-01-01T00:00:01", 1L)))
    val out = Topology.load(
      """
        |[transforms.split]
        |  inputs = ["src"]
        |  type = "route"
        |  [transforms.split.route]
        |    [transforms.split.route.metrics]
        |      type = "is_metric"
        |    [transforms.split.route.logs]
        |      type = "is_log"
        |""".stripMargin).run(Map("src" -> in))
    assert(out("split.metrics").df.count() == 1)
    assert(out("split.logs").df.count() == 0)
  }
}
