package graft.config

/** `vector generate` (src/generate.rs:118-250): turn a pipeline
  * expression like `parquet/remap,filter/console` into a runnable TOML
  * config skeleton. Fragments are divided by `/` or `|`
  * (sources / transforms / sinks), components inside a fragment by
  * commas, and a component may carry a custom name as `name:type`
  * (default names `source{i}` / `transform{i}` / `sink{i}`,
  * generate.rs:142-155). Inputs wire automatically: the first
  * transform consumes every source, each later transform the previous
  * one, and every sink the final transform (or the sources when there
  * are none) — the reference's `TransformInputsStrategy::Auto`.
  * Each component gets the minimal example options its graft
  * dispatcher requires, so the output parses and plan-validates.
  */
object Generate {

  private val sourceExample: Map[String, Seq[String]] = Map(
    "demo_logs" -> Seq("""format = "apache_common"""", "count = 100"),
    "socket" -> Seq("""mode = "tcp"""", """address = "127.0.0.1:9000""""),
    "file" -> Seq("""path = "path/to/logs.txt""""),
    "parquet" -> Seq("""path = "path/to/table.parquet""""),
    "exec" -> Seq("""mode = "scheduled"""", """command = ["echo", "hello"]"""),
    "http_client" -> Seq("""endpoint = "http://127.0.0.1:8080/metrics""""),
    "host_metrics" -> Seq("""collectors = ["cpu", "memory", "load", "host"]"""),
    "static_metrics" -> Seq.empty)

  private def transformExample(name: String, t: String): Seq[String] = t match {
    case "remap" => Seq("""source = ".generated = true"""")
    case "filter" => Seq("""condition = "exists(.message)"""")
    case "route" => Seq(
      s"[transforms.$name.route]",
      """  errors = '.level == "error"'""")
    case "exclusive_route" => Seq(
      s"[[transforms.$name.routes]]",
      """  name = "errors"""",
      """  condition = '.level == "error"'""")
    case "dedupe" => Seq(
      s"[transforms.$name.fields]",
      """  match = ["message"]""")
    case "reduce" => Seq("""group_by = ["request_id"]""")
    case "sample" => Seq("rate = 10")
    case "throttle" => Seq("threshold = 100", "window_secs = 60")
    case "log_to_metric" => Seq(
      s"[[transforms.$name.metrics]]",
      """  type = "counter"""",
      """  field = "message"""",
      """  name = "event_total"""")
    case "aggregate" => Seq("interval_ms = 10000", """mode = "auto"""")
    case "tag_cardinality_limit" =>
      Seq("value_limit = 500", """limit_exceeded_action = "drop_tag"""")
    case "window" => Seq(
      """flush_when = "exists(.error)"""",
      "num_events_before = 2",
      """group_by = ["host"]""")
    case "aws_ec2_metadata" => Seq(
      s"[transforms.$name.mock_values]",
      """  instance-id = "i-1234"""")
    case "lua" => Seq(
      """version = "2"""",
      "hooks.process = \"\"\"",
      "  function (event, emit)",
      "    event.log.generated = true",
      "    emit(event)",
      "  end",
      "\"\"\"")
    case _ => Seq.empty // metric_to_log, trace_to_log, incremental_to_absolute
  }

  private def sinkExample(name: String, t: String): Seq[String] = t match {
    case "parquet" => Seq("""path = "path/to/out.parquet"""")
    case "file" => Seq(
      """path = "path/to/out.jsonl"""",
      s"[sinks.$name.encoding]",
      """  codec = "json"""")
    case "console" => Seq(
      """target = "stdout"""",
      s"[sinks.$name.encoding]",
      """  codec = "json"""")
    case "socket" => Seq(
      """mode = "tcp"""",
      """address = "127.0.0.1:9001"""",
      s"[sinks.$name.encoding]",
      """  codec = "json"""")
    case "http" => Seq(
      """uri = "http://127.0.0.1:8080/ingest"""",
      s"[sinks.$name.encoding]",
      """  codec = "json"""")
    case _ => Seq.empty
  }

  private val SafeName = "[A-Za-z0-9_-]+".r

  /** Split one fragment into (name, type) pairs. */
  private def components(fragment: String, defaultPrefix: String): Seq[(String, String)] =
    fragment.split(',').map(_.trim).filter(_.nonEmpty).zipWithIndex.toSeq.map {
      case (expr, i) =>
        expr.indexOf(':') match {
          case -1 => (s"$defaultPrefix$i", expr)
          case 0 => throw new IllegalArgumentException(
            s"failed to generate $defaultPrefix '$expr': empty name is not allowed")
          case c => (expr.take(c), expr.drop(c + 1))
        }
    }

  def example(expression: String): String = {
    val fragments = expression.split(Array('|', '/')).toSeq.padTo(3, "")
    if (fragments.length > 3) throw new IllegalArgumentException(
      s"expected at most 3 fragments (sources/transforms/sinks), got ${fragments.length}")
    val sources = components(fragments(0), "source")
    val transforms = components(fragments(1), "transform")
    val sinks = components(fragments(2), "sink")

    def known(kind: String, reg: Seq[String], cs: Seq[(String, String)]): Unit =
      cs.foreach { case (n, t) =>
        if (!reg.contains(t)) throw new IllegalArgumentException(
          s"unknown $kind type '$t' for '$n' (available: ${reg.mkString(", ")})")
      }
    known("source", Topology.SourceTypes, sources)
    known("transform", Topology.TransformTypes, transforms)
    known("sink", Topology.SinkTypes, sinks)

    // duplicate names would emit two [transforms.x] headers that the
    // TOML parser silently merges into one broken component; unsafe
    // characters would emit unparseable headers — refuse both with
    // exit-2-able errors instead of printing a corrupt skeleton
    val names = (sources ++ transforms ++ sinks).map(_._1)
    names.foreach { n =>
      if (!SafeName.pattern.matcher(n).matches()) throw new IllegalArgumentException(
        s"component name '$n' must match [A-Za-z0-9_-]+")
    }
    names.diff(names.distinct).distinct.foreach { n =>
      throw new IllegalArgumentException(s"duplicate component name '$n'")
    }

    val out = Vector.newBuilder[String]
    sources.foreach { case (n, t) =>
      out += s"[sources.$n]"
      out += s"""  type = "$t""""
      sourceExample.getOrElse(t, Nil).foreach(l => out += s"  $l")
      out += ""
    }
    val sourceNames = sources.map(_._1)
    transforms.zipWithIndex.foreach { case ((n, t), i) =>
      val inputs = if (i == 0) sourceNames else Seq(transforms(i - 1)._1)
      out += s"[transforms.$n]"
      out += s"  inputs = [${inputs.map(s => s""""$s"""").mkString(", ")}]"
      out += s"""  type = "$t""""
      transformExample(n, t).foreach(l => out += s"  $l")
      out += ""
    }
    val sinkInputs =
      if (transforms.nonEmpty) Seq(transforms.last._1) else sourceNames
    sinks.foreach { case (n, t) =>
      out += s"[sinks.$n]"
      out += s"  inputs = [${sinkInputs.map(s => s""""$s"""").mkString(", ")}]"
      out += s"""  type = "$t""""
      sinkExample(n, t).foreach(l => out += s"  $l")
      out += ""
    }
    out.result().mkString("\n")
  }
}
