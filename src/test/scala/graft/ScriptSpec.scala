package graft

import org.apache.spark.sql.functions._

import graft.operators.Script

final case class ScriptEv(k: String, i: Int)
final case class ScriptEmit(tag: String, n: Long)

/** Specs for the lua-analog script harness: per-partition and per-key
  * lifecycle (init → per-event emits → flush-at-end), determinism under
  * input reordering.
  */
class ScriptSpec extends SparkSpec {
  import spark.implicits._

  test("script: partition lifecycle — flush runs after the last event with final state") {
    val ds = (1 to 10).map(i => ScriptEv("a", i)).toDS().repartition(2)
    val out = Script.transform(ds)(() => 0L)(
        (n, _) => (n + 1, Nil))(
        n => Seq(ScriptEmit("flush", n)))
      .collect()
    // exactly one flush per partition; counts sum to the event count
    assert(out.length == 2)
    assert(out.map(_.n).sum == 10)
    assert(out.forall(_.tag == "flush"))
  }

  test("script: per-event emits 0..n outputs") {
    val ds = (1 to 4).map(i => ScriptEv("a", i)).toDS().coalesce(1)
    val out = Script.transform(ds)(() => ())(
        (s, e) => (s, if (e.i % 2 == 0) Seq(ScriptEmit("even", e.i.toLong),
          ScriptEmit("dup", e.i.toLong)) else Nil))(
        _ => Nil)
      .collect()
    assert(out.count(_.tag == "even") == 2 && out.count(_.tag == "dup") == 2)
  }

  test("script: keyed state with explicit sort order is deterministic under reordering") {
    def run(evs: Seq[ScriptEv]) =
      Script.transformByKey(evs.toDS().repartition(4),
          (e: ScriptEv) => e.k, Seq(col("i")))(
          _ => 0L)(
          (acc, e) => (acc + e.i, Seq(ScriptEmit(s"${e.k}:${e.i}", acc + e.i))))(
          (k, acc) => Seq(ScriptEmit(s"$k:final", acc)))
        .collect().sortBy(_.tag).toSeq
    val evs = Seq(ScriptEv("a", 2), ScriptEv("b", 1), ScriptEv("a", 1), ScriptEv("b", 3))
    assert(run(evs) == run(evs.reverse))
    val byTag = run(evs).map(e => e.tag -> e.n).toMap
    // running prefix sums in i-order regardless of input order
    assert(byTag == Map("a:1" -> 1L, "a:2" -> 3L, "a:final" -> 3L,
      "b:1" -> 1L, "b:3" -> 4L, "b:final" -> 4L))
  }
}
