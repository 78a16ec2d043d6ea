package graft.tools

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.config.CueCorpus

/** Debug driver for the cue stdlib-example corpus (CueCorpus).
  *
  *   CueRun parse            — parse all 200 files, print counts
  *   CueRun run [substr]     — run examples (optionally filtered by
  *                             function-name substring), print failures
  */
object CueRun {

  val dir = "/root/reference/website/cue/reference/remap/functions"

  /** The doc examples' relative resource paths (`resources/…desc`,
    * schema files, grok alias files) are relative to the reference's
    * VRL test-harness root — point the compile-time file resolver there.
    */
  sys.props("graft.vrl.resource.roots") = "/root/reference/lib/vector-vrl/tests"

  def loadAll(): Seq[CueCorpus.Example] = {
    val files = Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.toString.endsWith(".cue")).toSeq.sortBy(_.toString)
    files.flatMap { p =>
      val fn = p.getFileName.toString.stripSuffix(".cue")
      try CueCorpus.parseFile(new String(Files.readAllBytes(p), "UTF-8"), fn)
      catch { case e: Exception =>
        System.err.println(s"PARSE-FAIL $fn: ${e.getMessage}")
        Nil
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("parse")
    val examples = loadAll()
    println(s"parsed ${examples.length} examples from ${examples.map(_.fn).distinct.length} functions")
    if (mode == "parse") {
      val byExpect = examples.groupBy(_.expect.getClass.getSimpleName).view.mapValues(_.length)
      println(byExpect.toMap)
      return
    }
    val filter = args.lift(1).getOrElse("")
    val subset = examples.filter(_.fn.contains(filter))
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val results = CueCorpus.runAll(spark, subset, threads = 8)
    val secs = (System.nanoTime() - t0) / 1e9
    val (divergent, scored) = results.partition(r =>
      CueCorpus.knownDivergent((r.ex.fn, r.ex.title)))
    val (ok, bad) = scored.partition(_.ok)
    bad.foreach(r => println(s"FAIL ${r.label}\n  ${r.detail.take(500)}"))
    divergent.foreach(r => println(s"DIVERGENT (documented) ${r.label}"))
    println(f"== ${ok.length} pass / ${bad.length} fail / ${divergent.length} " +
      f"documented-divergent of ${results.length} in $secs%.1f s")
    spark.stop()
  }
}
