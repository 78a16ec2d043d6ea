package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

import graft.functions.Grok
import graft.operators._

/** Port of the reference's config-driven behavior tests
  * (`tests/behavior/transforms/{route,filter,dedupe,remap_with_drop,
  * reduce}.toml`, run by `vector test` —
  * `src/config/unit_test/mod.rs:103,125`): inputs are inserted at a
  * component (insert_at), outputs extracted per port (extract_from)
  * and checked against conditions; `no_outputs_from` asserts a port
  * stays empty. Here: input DataFrames → operator graph → the same
  * assertions on collected ports.
  */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  /** extract_from + conditions: at least one extracted event satisfies
    * every condition of the block (unit_test harness semantics).
    */
  private def assertOutputs(port: DataFrame, conds: Column*): Unit =
    conds.foreach(c => assert(port.filter(c).count() >= 1,
      s"no event matching $c"))

  private def assertNoOutputs(ports: DataFrame*): Unit =
    ports.foreach(p => assert(p.count() == 0, "port should be empty"))

  // ------------------------------------------------- route.toml
  // foo: route {first: message=="test swimlane 1", second: =="2",
  // third: is_log}; bar = remap over foo.first adding new_field.
  private def routePorts(message: String): Map[String, DataFrame] = {
    val in = Seq(message).toDF("message")
    Route.ports(in, ListMap(
      "first"  -> (col("message") === "test swimlane 1"),
      "second" -> (col("message") === "test swimlane 2"),
      "third"  -> lit(true) /* is_log: every input here is a log */))
  }

  test("route test 1: multicast clones to every matching port") {
    val ports = routePorts("test swimlane 1")
    val bar = ports("first").withColumn("new_field", lit("new field added"))
    assertOutputs(ports("first"), col("message") === "test swimlane 1")
    assertOutputs(bar,
      col("message") === "test swimlane 1" &&
        col("new_field") === "new field added")
    assertOutputs(ports("third"), col("message") === "test swimlane 1")
    assertNoOutputs(ports("second"))
  }

  test("route test 2: non-matching ports and their consumers stay empty") {
    val ports = routePorts("test swimlane 2")
    val bar = ports("first").withColumn("new_field", lit("new field added"))
    assertOutputs(ports("second"), col("message") === "test swimlane 2")
    assertOutputs(ports("third"), col("message") === "test swimlane 2")
    assertNoOutputs(ports("first"), bar)
  }

  // ------------------------------------------------- filter.toml
  // Events carry kind (log|metric) and an optional tags.message;
  // conditions read .tags.message when present, else .message.
  private val filterIn = Seq(
    ("log", "test filter 1", null.asInstanceOf[String]),
    ("log", "test filter 2", null.asInstanceOf[String]),
    ("metric", null.asInstanceOf[String], "test filter 1")
  ).toDF("kind", "message", "tags_message")
  private def msg: Column = coalesce(col("tags_message"), col("message"))

  test("filter tests 1a-3a: vrl and type conditions") {
    val a = Filter(filterIn, msg === "test filter 1", "filter_a")
    val b = Filter(filterIn,
      msg.contains("test filter") && msg.contains("2"), "filter_b")
    val c = Filter(filterIn, col("kind") === "metric", "filter_c")
    // 1a: log "test filter 1" passes a; 3a: the metric's tag matches too
    assertOutputs(a, col("message") === "test filter 1",
      col("tags_message") === "test filter 1")
    assertNoOutputs(a.filter(col("message") === "test filter 2"))
    // 1b/2b: only "test filter 2" passes b
    assertOutputs(b, col("message") === "test filter 2")
    assertNoOutputs(b.filter(msg === "test filter 1"))
    // 1c/2c/3a: is_metric keeps only the metric event
    assertOutputs(c, col("tags_message") === "test filter 1")
    assertNoOutputs(c.filter(col("kind") === "log"))
  }

  // ------------------------------------------------- dedupe.toml
  test("dedupe_simple: first event per match-field value wins") {
    val in = Seq((1, 2, 1), (1, 3, 2), (2, 4, 3)).toDF("a", "b", "ord")
    val out = Dedupe.keepFirst(in, Seq(col("a")), Seq(col("ord")))
    assertOutputs(out, col("a") === 1 && col("b") === 2,
      col("a") === 2 && col("b") === 4)
    assert(out.count() == 2)
  }

  test("dedupe_field_order: key is the VALUE tuple, field order irrelevant") {
    // rows 1 and 2 set (a,b,c)=(1,2,3) in different source field order —
    // a columnar row is order-free, so they dedupe to one (the
    // reference gets this from its sorted BTreeMap encoding,
    // dedupe/transform.rs:42-46)
    val in = Seq((1, 2, 3, 1), (1, 2, 3, 2), (1, 3, 3, 3)).toDF("a", "b", "c", "ord")
    val out = Dedupe.keepFirst(in, Seq(col("a"), col("b")), Seq(col("ord")))
    assertOutputs(out, col("a") === 1 && col("b") === 2 && col("c") === 3,
      col("a") === 1 && col("b") === 3 && col("c") === 3)
    assert(out.count() == 2)
  }

  // ------------------------------------------------- remap_with_drop.toml
  test("remap_dropped_branch: failed events reroute to the dropped port with the original payload") {
    val in = Seq("this is a dropped event").toDF("message")
    // a pattern no input matches = the unconditional `abort` program
    val ports = Parse.grok(in, col("message"),
      Grok.compile("%{TIMESTAMP_ISO8601:ts}"), componentId = "droptest")
    assertNoOutputs(ports.primary)
    assertOutputs(ports.dropped,
      col("message") === "this is a dropped event",
      col("dropped_component_id") === "droptest",
      col("dropped_component_kind") === "transform")
  }

  // ------------------------------------------------- reduce.toml (basic)
  test("reduce_basic: group by request_id, ends_when cuts sessions, default merges") {
    val in = Seq(
      ("first message value", "1", "host1", 5, false, 1),
      ("second message value", "1", "host2", 7, false, 2),
      ("other reduce one", "2", "host3", 11, false, 3),
      ("third message value", "1", "host4", 9, true, 4),
      ("other reduce two", "2", "host5", 7, false, 5),
      ("other reduce three", "2", "host6", 2, true, 6)
    ).toDF("message", "request_id", "host", "counter", "test_end_message", "ord")
    val sessions = Reduce.sessionIds(in, Seq(col("request_id")), col("ord"),
      endsWhen = Some(col("test_end_message")), maxEvents = None)
    val out = sessions.groupBy(col("request_id"), col("session_id"))
      .agg(
        Reduce.Strategy.discard(col("message"), col("ord")).as("message"),
        Reduce.Strategy.discard(col("host"), col("ord")).as("host"),
        Reduce.Strategy.sumS(col("counter")).as("counter"),
        max(col("ord")).as("timestamp_end"))
    assertOutputs(out,
      col("message") === "first message value" && col("host") === "host1" &&
        col("request_id") === "1" && col("counter") === 21 &&
        col("timestamp_end").isNotNull,
      col("message") === "other reduce one" && col("host") === "host3" &&
        col("request_id") === "2" && col("counter") === 20 &&
        col("timestamp_end").isNotNull)
  }
}
