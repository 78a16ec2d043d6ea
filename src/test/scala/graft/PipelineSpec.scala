package graft

import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

import graft.plans.Pipeline
import graft.operators.{Enrich, Route}

/** North-rule invariants over the end-to-end pipeline (SURVEY.md §5):
  * per-turn text equality under stable (conv_id, turn_idx) ordering,
  * parse/dropped partition completeness, multicast route semantics,
  * enrichment exactly-one semantics.
  */
class PipelineSpec extends SparkSpec {

  test("driver contract: every query has an oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${q -- o}")
    assert((o -- q).isEmpty, s"oracles without query: ${o -- q}")
    assert(q.size >= 55)
  }

  lazy val st: Pipeline.Stages = Pipeline.build(spark, sfDir)

  test("parse + dropped partition the input exactly") {
    val n = st.transcript.count()
    assert(st.parsed.count() + st.dropped.count() == n)
    // no row in both ports
    val both = st.parsed.select("conv_id", "turn_idx")
      .join(st.dropped.select("conv_id", "turn_idx"), Seq("conv_id", "turn_idx"))
    assert(both.count() == 0)
  }

  test("pipeline stages carry in-flight telemetry (internal_events analog)") {
    import spark.implicits._
    // fresh inline frame: the persisted sfDir pipeline serves reads from
    // cache, and cached reads (correctly) do not re-fire observe
    // accumulators — metrics count each event once, at materialization
    val turns = (0 until 20).map { i =>
      val lvl = if (i % 5 == 0) "error" else "info"
      ("c" + (i % 3), i, "assistant", "tool_1",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        s"""2024-01-01T00:00:00Z $lvl tool=tool_1 latency_ms=${100 + i} msg="t$i"""")
    }.toDF("conv_id", "turn_idx", "role", "tool", "ts", "text")
    val stg = Pipeline.buildFrom(spark, turns)

    // execute the stage frames THEMSELVES: observed metrics live on the
    // QueryExecution that ran (count() would spawn its own)
    assert(stg.parsed.collect().length == 20)
    val m = stg.parsed.queryExecution.observedMetrics("graft.parse")
    assert(m.getAs[Long]("events_received") == 20L)

    val portCounts = stg.routed.groupBy("port").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    stg.routed.collect()
    val r = stg.routed.queryExecution.observedMetrics("graft.route")
    assert(r.getAs[Long]("events_sent") == portCounts.values.sum)
    assert(r.getAs[Long]("sent_errors") == portCounts.getOrElse("errors", 0L))
    assert(r.getAs[Long]("sent__unmatched") == portCounts.getOrElse("_unmatched", 0L))
  }

  test("per-turn text equality under (conv_id, turn_idx) ordering") {
    // text must ride through parse+enrich+route unchanged: join routed
    // back to the source on the stable key and compare.
    val src = st.transcript.select(col("conv_id"), col("turn_idx"), col("text").as("src_text"))
    val mismatches = st.routed.select(col("conv_id"), col("turn_idx"), col("text"))
      .join(src, Seq("conv_id", "turn_idx"))
      .filter(col("text") =!= col("src_text"))
    assert(mismatches.count() == 0)
  }

  test("parsed ts_str round-trips to the source event time") {
    val bad = st.parsed.filter(col("ts_parsed") =!= col("ts"))
    assert(bad.count() == 0)
  }

  test("dropped port carries the ORIGINAL event with annotations") {
    val row = st.dropped.limit(1).collect()(0)
    assert(row.getAs[String]("dropped_reason").nonEmpty)
    assert(row.getAs[String]("dropped_component_id") == "parse_log_line")
    assert(st.dropped.filter(!col("text").contains("BOGUS")).count() == 0)
  }

  test("route is multicast: rows land in every matching port") {
    // a slow error must appear in both 'errors' and 'slow'
    val multi = st.routed.groupBy("conv_id", "turn_idx")
      .agg(collect_set("port").as("ports"))
      .filter(array_contains(col("ports"), "errors") && array_contains(col("ports"), "slow"))
    val expected = st.enriched
      .filter(col("level") === "error" && col("latency_ms") >= 800).count()
    assert(expected > 0 && multi.count() == expected)
  }

  test("every enriched row lands in >=1 port; unmatched rows match nothing") {
    assert(st.routed.select("conv_id", "turn_idx").distinct().count() == st.enriched.count())
    val um = st.routed.filter(col("port") === Route.UnmatchedPort)
    val anyCond = Pipeline.routeConditions.values.reduce(_ || _)
    assert(um.filter(coalesce(anyCond, lit(false))).count() == 0)
  }

  test("route plan stays inside whole-stage codegen (no interpreted lambdas)") {
    // ArrayFilter/ArrayTransform are CodegenFallback: a lambdafunction
    // in the routed plan means the port-list build went back to the
    // HOF form, which ran the lambda interpreted per row and cost the
    // 76.8M-turn headline pipeline ~40% (46s -> 27s at 8 cores)
    val plan = st.routed.queryExecution.executedPlan.toString
    assert(!plan.contains("lambdafunction"),
      "route multicast plan regressed to a higher-order-function port list")
  }

  test("reserved port name is rejected") {
    assertThrows[IllegalArgumentException] {
      Route.tagged(st.enriched, ListMap("_unmatched" -> lit(true)))
    }
  }

  test("enrichment is exactly-one: join preserves row count, dup keys fail") {
    assert(st.enriched.count() == st.parsed.count())
    import spark.implicits._
    val dup = Seq(("a", "x", 1), ("a", "x", 2)).toDF("k1", "k2", "v")
    assertThrows[IllegalArgumentException] {
      Enrich.validateUnique(dup, Seq("k1", "k2"))
    }
  }

  test("case-insensitive lookup validates uniqueness on the FOLDED keys") {
    import spark.implicits._
    // 'ABC' and 'abc' are distinct raw keys but collide after lower():
    // a probe on 'Abc' would match both rows and duplicate the event
    val caseDup = Seq(("ABC", 1), ("abc", 2)).toDF("k", "v")
    val events = Seq("Abc").toDF("k")
    assertThrows[IllegalArgumentException] {
      Enrich.lookup(events, caseDup, Seq("k"), caseInsensitive = true).count()
    }
    // genuinely unique post-fold still joins case-insensitively
    val ok = Enrich.lookup(events, Seq(("ABC", 1)).toDF("k", "v"),
      Seq("k"), caseInsensitive = true).collect()
    assert(ok.length == 1 && ok.head.getAs[Int]("v") == 1)
  }

  test("lookupBetween rejects overlapping validity ranges (exactly-one contract)") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    val events = Seq(("K", d("2024-03-01"))).toDF("k", "ts")
    val overlapping = Seq(
      ("K", d("2024-01-01"), d("2024-06-30"), "first"),
      ("K", d("2024-03-01"), d("2024-12-31"), "second")).toDF("k", "from", "to", "tag")
    assertThrows[IllegalArgumentException] {
      Enrich.lookupBetween(events, overlapping, Seq("k"), col("ts"), "from", "to").count()
    }
    // adjacent, non-overlapping ranges pass and match exactly one row
    val disjoint = Seq(
      ("K", d("2024-01-01"), d("2024-02-29"), "q1"),
      ("K", d("2024-03-01"), d("2024-12-31"), "rest")).toDF("k", "from", "to", "tag")
    val out = Enrich.lookupBetween(events, disjoint, Seq("k"), col("ts"), "from", "to")
      .collect()
    assert(out.length == 1 && out.head.getAs[String]("tag") == "rest")
  }

  test("lookupCidr drops malformed table rows instead of aborting (ANSI-safe parse)") {
    import spark.implicits._
    val events = Seq("10.1.2.3").toDF("ip")
    val lut = Seq(
      ("10.1.0.0/16", "good"),
      ("10.1.0.0", "no-slash"),       // missing prefix
      ("10.1.0.0/abc", "bad-prefix"), // unparseable prefix
      ("10.1.0.0/40", "oob-prefix"))  // out-of-range prefix
      .toDF("cidr", "net_tag")
    val out = Enrich.lookupCidr(events, col("ip"), lut).collect()
    assert(out.length == 1 && out.head.getAs[String]("net_tag") == "good")
  }

  test("wildcard enrich: exact hit wins, miss falls back per-row (file.rs:337-346)") {
    import spark.implicits._
    val events = Seq("a", "b", "zz", null).toDF("k")
    val lut = Seq(("a", "ha", "x1"), ("b", null, "x2"), ("*", "hw", "xw"))
      .toDF("k", "h", "extra")
    val out = Enrich.lookupWithWildcard(events, lut, Seq("k"), "*")
      .select("k", "h", "extra").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // "b" matched exactly: its NULL h stays NULL (per-row fallback,
    // never per-column back-fill); "zz" and null-key miss -> wildcard.
    assert(out == Set(
      ("a", "ha", "x1"), ("b", null, "x2"),
      ("zz", "hw", "xw"), (null, "hw", "xw")))
    // no wildcard row in the table -> misses stay NULL
    val out2 = Enrich.lookupWithWildcard(events,
        Seq(("a", "ha", "x1")).toDF("k", "h", "extra"), Seq("k"), "*")
      .select("k", "h").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out2 == Set(("a", "ha"), ("b", null), ("zz", null), (null, null)))
  }

  test("assistant/tool rows with a known tool get team + cost_tier") {
    val miss = st.enriched
      .filter(col("tool").isNotNull && col("team").isNull)
    assert(miss.count() == 0)
    val nonTool = st.enriched.filter(col("tool").isNull && col("team").isNotNull)
    assert(nonTool.count() == 0)
  }

  test("aggregate counts reconcile with routed rows") {
    val aggSum = st.aggregated.agg(sum("n_turns")).collect()(0).getLong(0)
    assert(aggSum == st.routed.count())
  }
}
