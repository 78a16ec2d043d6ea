package graft.tools

import org.apache.spark.sql.SparkSession

import graft.config.{Toml, Topology, UnitTestHarness}

/** Diagnostic: run the reference's own `vector test` behavior corpus
  * (the .toml files under tests/behavior/transforms, read in place from the read-only
  * reference checkout) through this engine's config front-end +
  * unit-test harness, and report per-test pass / documented-skip /
  * fail. The spec counterpart (ReferenceBehaviorSpec) pins the
  * pass/skip partition; this main exists to iterate on divergences.
  *
  * Usage: run_main.sh graft.tools.RefBehavior [file ...]
  */
object RefBehavior {

  val RefRoot = "/root/reference"
  val CorpusDir = s"$RefRoot/tests/behavior/transforms"

  /** lua_v1/v2 run actual Lua scripts — out of scope by contract
    * (the Script harness is the documented Scala-lambda equivalent).
    */
  val DefaultFiles: Seq[String] = Seq(
    "remap.toml", "remap_with_drop.toml", "filter.toml", "route.toml",
    "dedupe.toml", "reduce.toml", "task_transform.toml",
    "vrl_test_input.toml")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("ref-behavior")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val files = if (args.nonEmpty) args.toSeq else DefaultFiles
    var pass, skip, fail = 0
    files.foreach { f =>
      val text = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$CorpusDir/$f")), "UTF-8")
      // reference-relative paths (remap `file = "tests/data/..."`)
      // resolve against the reference checkout root, same as `vector
      // test` run from the repo root
      val results = try {
        UnitTestHarness.run(spark, new Topology(Toml.parse(text), Some(RefRoot)))
      } catch {
        case e: Throwable =>
          println(s"LOADFAIL $f: ${e.getClass.getSimpleName}: ${e.getMessage}")
          fail += 1
          Nil
      }
      results.foreach { r =>
        r.skipped match {
          case Some(why) => skip += 1; println(s"SKIP $f/${r.name}: $why")
          case None if r.errors.isEmpty => pass += 1; println(s"PASS $f/${r.name}")
          case None =>
            fail += 1
            println(s"FAIL $f/${r.name}: ${r.errors.mkString("; ")}")
        }
      }
    }
    println(s"== $pass pass / $skip skip / $fail fail")
    spark.stop()
  }
}
