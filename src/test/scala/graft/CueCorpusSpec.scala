package graft

import java.nio.file.{Files, Paths}

import graft.config.CueCorpus
import graft.tools.CueRun

/** Run the reference's VRL stdlib doc-example corpus — every runnable
  * example from the 200 function .cue files under
  * website/cue/reference/remap/functions — through the VRL compiler,
  * asserting each program's output equals the documented return value.
  *
  * Like ReferenceBehaviorSpec, the inputs/programs/expected values are
  * the reference's verbatim, read in place. The contract pinned here:
  * zero failures across all ~406 examples, with the short
  * documented-divergent list (CueCorpus.knownDivergent: doc values that
  * contradict the functions' own published algorithms, each verified
  * against an independent implementation) excluded and bounded.
  */
class CueCorpusSpec extends SparkSpec {

  test("the reference's VRL stdlib example corpus passes (399+ examples, 0 failures)") {
    assume(Files.isDirectory(Paths.get(CueRun.dir)), "reference checkout not present")
    val examples = CueRun.loadAll()
    assert(examples.length >= 400, s"corpus shrank: ${examples.length} examples parsed")
    val results = CueCorpus.runAll(spark, examples, threads = 8)
    val (divergent, scored) = results.partition(r =>
      CueCorpus.knownDivergent((r.ex.fn, r.ex.title)))
    val bad = scored.filterNot(_.ok)
    assert(bad.isEmpty, s"${bad.length} corpus failures:\n" +
      bad.map(r => s"  ${r.label}: ${r.detail.take(300)}").mkString("\n"))
    assert(scored.length >= 399, s"only ${scored.length} scored examples")
    assert(divergent.length <= CueCorpus.knownDivergent.size,
      s"divergent list grew: ${divergent.map(_.label).mkString(", ")}")
  }
}
