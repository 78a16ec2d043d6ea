package graft.config

import org.apache.spark.sql.SparkSession

/** Command-line entry points for the config front-end — the analog of
  * the reference binary's two main verbs (SURVEY §3.1, §3.3):
  *
  *   `graft.config.Cli run <topology.toml>`  — load a TOML topology
  *     (sources → transforms → sinks), execute it as one batch
  *     evaluation, print rows written per sink. Mirrors `vector run`
  *     (src/app.rs:171-243) with the lifecycle collapsed to a single
  *     Spark job; exit 0 on success.
  *
  *   `graft.config.Cli test <topology.toml>`  — run the `[[tests]]`
  *     blocks (insert_at / extract_from / no_outputs_from / VRL
  *     conditions) through `UnitTestHarness` and print one line per
  *     test. Mirrors `vector test` (src/config/unit_test/mod.rs:103);
  *     exit 1 if any test fails (documented-skip results don't fail).
  *
  * Spark config comes from the environment when run via spark-submit;
  * standalone runs get a local session sized by SPARK_GRAFT_CPUS.
  */
object Cli {

  private def session(): SparkSession = {
    val builder = SparkSession.builder()
      .appName("graft-config")
      .config("spark.sql.session.timeZone", "UTC")
    // only force a master when none is supplied (spark-submit sets one)
    if (sys.props.get("spark.master").isEmpty && sys.env.get("MASTER").isEmpty) {
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
      builder.master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus * 2)
        .config("spark.ui.enabled", "false")
    }
    val s = builder.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val usage =
      "usage: graft.config.Cli run|test|validate <topology.toml> | run-stream <topology.toml> <checkpointDir> | graph <topology.toml> [dot|mermaid] | list [text|json] | generate <expression> | vrl <program|program.vrl> [events.jsonl]"
    // `graph`/`list`/`generate` are pure config (src/graph.rs, list.rs,
    // generate.rs): no Spark session, no data — render and exit before
    // a JVM-wide session ever spins up
    if (args.headOption.contains("graph")) {
      if (args.length < 2 || args.length > 3) { System.err.println(usage); sys.exit(2) }
      val topo = Topology.loadFile(args(1))
      args.lift(2).getOrElse("dot") match {
        case "dot" => println(topo.toDot)
        case "mermaid" => println(topo.toMermaid)
        case other => System.err.println(s"unknown format '$other'\n$usage"); sys.exit(2)
      }
      return
    }
    if (args.headOption.contains("list")) {
      if (args.length > 2) { System.err.println(usage); sys.exit(2) }
      val sections = Seq(
        "Sources" -> Topology.SourceTypes,
        "Transforms" -> Topology.TransformTypes,
        "Sinks" -> Topology.SinkTypes,
        "Enrichment tables" -> Topology.EnrichmentTableTypes)
      args.lift(1).getOrElse("text") match {
        case "text" =>
          sections.zipWithIndex.foreach { case ((title, names), i) =>
            if (i > 0) println()
            println(s"$title:")
            names.foreach(n => println(s"- $n"))
          }
        case "json" =>
          // same EncodedList keys as the reference (list.rs:23-28)
          val keys = Seq("sources", "transforms", "sinks", "enrichment_tables")
          println(keys.zip(sections).map { case (k, (_, names)) =>
            s""""$k":[${names.map(n => s""""$n"""").mkString(",")}]"""
          }.mkString("{", ",", "}"))
        case other => System.err.println(s"unknown format '$other'\n$usage"); sys.exit(2)
      }
      return
    }
    if (args.headOption.contains("generate")) {
      if (args.length != 2) { System.err.println(usage); sys.exit(2) }
      try println(Generate.example(args(1)))
      catch {
        case e: IllegalArgumentException =>
          System.err.println(e.getMessage); sys.exit(2)
      }
      return
    }
    // exact arity per verb: `run x ckptDir` (meant run-stream?) must
    // exit 2, not silently batch-overwrite sinks the user believed
    // were incrementally maintained
    val arityOk = args.headOption match {
      case Some("run-stream") => args.length == 3
      case Some("vrl") => args.length == 2 || args.length == 3
      case _ => args.length == 2
    }
    if (!arityOk) { System.err.println(usage); sys.exit(2) }
    val spark = session()
    try {
      args(0) match {
        case "run" =>
          val written = Topology.loadFile(args(1)).execute(spark)
          written.foreach { case (sink, n) => println(s"sink $sink: $n rows") }
        case "validate" =>
          // `vector validate`: schema-probe the sources, compile every
          // transform's Catalyst plan and every sink's codec/options —
          // no sink action runs. Any config error surfaces here with
          // the component named, before a cluster is ever involved.
          try {
            val topo = Topology.loadFile(args(1))
            val src = topo.loadSources(spark)
            val outs = topo.run(src)
            val sinks = topo.dryRunSinks(src ++ outs)
            println(s"OK: ${topo.transforms.size} transforms, " +
              s"${outs.size} outputs, $sinks sinks")
          } catch {
            case e: Exception =>
              System.err.println(s"validation error: ${e.getMessage}")
              sys.exit(1)
          }
        case "run-stream" =>
          // the reference's continuous lifecycle, drained with
          // Trigger.AvailableNow: each invocation processes exactly the
          // source files not yet in the checkpoint, then exits — rerun
          // after new files land to process only those
          if (args.length != 3) { System.err.println(usage); sys.exit(2) }
          val processed = Topology.loadFile(args(1)).executeStreaming(spark, args(2))
          processed.foreach { case (sink, n) => println(s"sink $sink: $n rows this run") }
        case "vrl" =>
          // one-shot `vector vrl` analog (src/cli.rs:348): program from
          // a .vrl file or the literal argument; one JSON event per
          // line from the given file, or stdin when omitted
          val progArg = args(1)
          val progPath = java.nio.file.Paths.get(progArg)
          val program =
            if (java.nio.file.Files.isRegularFile(progPath))
              new String(java.nio.file.Files.readAllBytes(progPath), "UTF-8")
            else progArg
          val lines: Seq[String] = args.lift(2) match {
            case Some(f) =>
              scala.jdk.CollectionConverters.ListHasAsScala(
                java.nio.file.Files.readAllLines(
                  java.nio.file.Paths.get(f))).asScala.toSeq
            case None =>
              Iterator.continually(scala.io.StdIn.readLine())
                .takeWhile(_ != null).toSeq
          }
          // reroute dropped so aborted/errored events surface on
          // stderr instead of vanishing (with the default opts the
          // dropped channel is never populated)
          val (out, dropped) = VrlRunner.eval(spark, program, lines,
            VrlCompile.RemapOpts(rerouteDropped = true))
          out.foreach(println)
          dropped.foreach(d => System.err.println(s"dropped: $d"))
        case "test" =>
          val results = UnitTestHarness.runFile(spark, args(1))
          var failed = 0
          results.foreach { r =>
            val status = r match {
              case _ if r.passed           => "pass"
              case _ if r.skipped.nonEmpty => s"skip (${r.skipped.get})"
              case _                       => failed += 1; "FAIL"
            }
            println(s"test '${r.name}': $status")
            r.errors.foreach(e => println(s"  $e"))
          }
          println(s"${results.count(_.passed)} passed, " +
            s"${results.count(_.skipped.nonEmpty)} skipped, $failed failed")
          if (failed > 0) sys.exit(1)
        case other =>
          System.err.println(s"unknown verb '$other'\n$usage"); sys.exit(2)
      }
    } finally spark.stop()
  }
}
