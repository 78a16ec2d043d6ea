package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.operators._

/** Per-operator unit tests mirroring the reference's inline suites
  * (reference src/transforms/&lt;name&gt; inline test modules — build small
  * inputs, assert exact outputs).
  */
class OperatorSpec extends SparkSpec {
  import spark.implicits._

  test("filter keeps matches and observes drop counts (filter.rs:99-156)") {
    val df = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v")
    val out = Filter(df, col("v") > 1)
    assert(out.collect().map(_.getString(0)).sorted.toSeq == Seq("b", "c"))
  }

  test("filter telemetry surfaces via observed metrics (assert_transform_compliance analog)") {
    // the reference's component spec requires every transform to emit
    // standardized counters (FilterEventsDropped, filter.rs:94); our
    // analog is observe() metrics readable off the QueryExecution —
    // counted in the same pass, no extra scan
    val df = Seq(1, 2, 3, 4).toDF("v")
    val out = Filter(df, col("v") % 2 === 0, "flt")
    out.collect()
    val m = out.queryExecution.observedMetrics("flt")
    assert(m.getAs[Long]("events_in") == 4L)
    assert(m.getAs[Long]("events_dropped") == 2L)
  }

  test("telemetry: component received counts and per-port sent counts in one pass") {
    val df = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v")
    val observed = Telemetry.component(df, "parse",
      extra = Seq(sum(col("v")).as("v_total")))
    observed.collect()
    val m = observed.queryExecution.observedMetrics("graft.parse")
    assert(m.getAs[Long]("events_received") == 3L)
    assert(m.getAs[Long]("v_total") == 6L)

    val routed = Route.tagged(df, scala.collection.immutable.ListMap(
      "big" -> (col("v") >= 2), "odd" -> (col("v") % 2 === 1)))
    val obsRouted = Telemetry.routedSent(routed, Seq("big", "odd"))
    obsRouted.collect()
    val r = obsRouted.queryExecution.observedMetrics("graft.route")
    assert(r.getAs[Long]("sent_big") == 2L)   // v=2, v=3
    assert(r.getAs[Long]("sent_odd") == 2L)   // v=1, v=3
  }

  test("sample.byKey keeps exactly the key-bucket, stamps sample_rate (sample/transform.rs:205)") {
    val df = (0 until 100).map(i => (i.toLong, s"m$i")).toDF("k", "m")
    val out = Sample.byKey(df, col("k"), 10).collect()
    assert(out.length == 10)
    assert(out.forall(r => r.getLong(0) % 10 == 0 && r.getInt(2) == 10))
  }

  test("sample.byKey exclude bypasses sampling") {
    val df = (0 until 100).map(i => (i.toLong, s"m$i")).toDF("k", "m")
    val out = Sample.byKey(df, col("k"), 10, exclude = Some(col("k") < 5))
    assert(out.count() == 10 + 4) // 0 is in both
    // excluded rows carry NO sample_rate (the reference emits them before
    // the stamp, transform.rs:147-155); sampled-kept rows are stamped
    val byK = out.collect().map(r => r.getLong(0) -> r.get(r.fieldIndex("sample_rate"))).toMap
    assert(byK(1L) == null && byK(4L) == null) // excluded only
    assert(byK(10L) == 10 && byK(0L) == null)  // 0 is excluded AND in-bucket: exclude wins
    // rate=0 is a config error, not a silent drop-everything
    intercept[IllegalArgumentException] { Sample.byKey(df, col("k"), 0) }
  }

  test("sample.counter keeps every Nth per group") {
    val df = (0 until 30).map(i => (s"g${i % 2}", i)).toDF("g", "i")
    val out = Sample.counter(df, Seq(col("g")), Seq(col("i")), 5)
    assert(out.count() == 6) // 15 per group -> 3 each
  }

  /** The reference's Ratio accumulator (sample/transform.rs:64-73):
    * per-group value starts at 1-ratio, += ratio per event, keep on
    * crossing 1.0 (then -= 1.0). Returns kept 1-based positions.
    */
  private def ratioReplay(n: Int, ratio: Double): Seq[Int] = {
    var value = 1.0 - ratio
    (1 to n).filter { _ =>
      val inc = value + ratio
      value = if (inc >= 1.0) inc - 1.0 else inc
      inc >= 1.0
    }
  }

  test("sample.byRatio matches the reference accumulator replay (sample/transform.rs:64-73)") {
    val df = (for (g <- Seq("a", "b"); i <- 1 to 200) yield (g, i)).toDF("g", "i")
    // ratios whose crossings stay clear of ulp boundaries: closed form
    // == running accumulator exactly (see Sample.byRatio divergence doc)
    for (r <- Seq(0.13, 0.25, 0.5, 0.77, 1.0)) {
      val kept = Sample.byRatio(df, Seq(col("g")), Seq(col("i")), r)
        .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getInt(1)).sorted.toSeq).toMap
      val expect = ratioReplay(200, r)
      assert(kept.getOrElse("a", Nil) == expect, s"ratio $r group a")
      assert(kept.getOrElse("b", Nil) == expect, s"ratio $r group b")
      assert(kept.values.forall(_.nonEmpty == expect.nonEmpty))
    }
    // ulp-boundary ratios: positions may shift by one at integer
    // crossings, but per-prefix keep counts equal the Bresenham count
    for (r <- Seq(0.3, 0.9)) {
      val kept = Sample.byRatio(df.filter(col("g") === "a"), Seq(col("g")), Seq(col("i")), r)
        .collect().map(_.getInt(1)).sorted
      assert(kept.length == ratioReplay(200, r).length, s"ratio $r count")
      assert(kept.head == 1 || kept.head == 2) // first crossing at/next to k=1
      // evenly spaced: gaps differ by at most 1
      val gaps = kept.sliding(2).collect { case Array(x, y) => y - x }.toSeq
      if (gaps.nonEmpty) assert(gaps.max - gaps.min <= 1, s"ratio $r spacing")
    }
  }

  test("sample.byKeyRatio: seahash-threshold selection, unsigned compare (sample/transform.rs:41-54,82-90)") {
    val df = (0 until 512).map(i => (s"key$i", i)).toDF("k", "i")
    val hashes = df.select(col("k"), graft.functions.Vrl.seahash(col("k")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (ratio <- Seq(0.1, 0.5, 0.9)) {
      val thr = Sample.ratioThresholdBits(ratio)
      val kept = Sample.byKeyRatio(df, col("k"), ratio)
        .collect().map(_.getString(0)).toSet
      val expect = hashes.collect {
        case (k, h) if java.lang.Long.compareUnsigned(h, thr) <= 0 => k
      }.toSet
      assert(kept == expect, s"ratio $ratio")
      // uniform hash => kept fraction near ratio
      assert(math.abs(kept.size / 512.0 - ratio) < 0.08, s"ratio $ratio fraction ${kept.size}")
    }
    // monotone: smaller ratio's kept set is a subset of larger's
    val k1 = Sample.byKeyRatio(df, col("k"), 0.1).collect().map(_.getString(0)).toSet
    val k5 = Sample.byKeyRatio(df, col("k"), 0.5).collect().map(_.getString(0)).toSet
    assert(k1.subsetOf(k5))
  }

  test("sample.byKeySeahash: unsigned multiple-of-rate selection (sample/transform.rs:82-90)") {
    val df = (0 until 400).map(i => (s"key$i", i)).toDF("k", "i")
    val hashes = df.select(col("k"), graft.functions.Vrl.seahash(col("k")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Sample.byKeySeahash(df, col("k"), 7).collect().map(_.getString(0)).toSet
    val expect = hashes.collect {
      case (k, h) if java.lang.Long.remainderUnsigned(h, 7L) == 0L => k
    }.toSet
    assert(kept == expect)
  }

  test("sample.configured: keyed rows hash-gate, keyless rows counter-gate skipping excluded, stamp key honored") {
    // rows 0..199: even i carries a key (hash-gated), odd i is keyless
    // (counter fallback); i%10==9 rows are excluded (bypass, no quota)
    val df = (0 until 200).map { i =>
      (if (i % 2 == 0) s"key$i" else null, i, i % 10 == 9)
    }.toDF("k", "i", "ex")
    val rate = 7
    val out = Sample.configured(df, Some(col("k")), lit(1), Seq(col("i")),
      Left(rate), Some(col("ex")), "my_rate").collect()
      .map(r => (r.getInt(1), Option(r.get(r.fieldIndex("my_rate"))))).toMap
    val hashes = df.filter(col("k").isNotNull)
      .select(col("i"), graft.functions.Vrl.seahash(col("k").cast("string")))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // keyless, non-excluded rows in order: every 7th kept (1-based pos 1,8,..)
    val keylessKeep = (0 until 200)
      .filter(i => i % 2 == 1 && i % 10 != 9)
      .zipWithIndex.collect { case (i, pos) if pos % rate == 0 => i }.toSet
    for (i <- 0 until 200) {
      val excluded = i % 10 == 9
      val expect =
        if (excluded) Some(None) // kept, unstamped
        else if (i % 2 == 0) {
          if (java.lang.Long.remainderUnsigned(hashes(i), rate.toLong) == 0L)
            Some(Some(rate)) else None
        } else if (keylessKeep(i)) Some(Some(rate)) else None
      assert(out.get(i).map(_.map(_.asInstanceOf[Int])) == expect, s"row $i")
    }
    // rateKey="" emits no stamp column at all
    val bare = Sample.configured(df, Some(col("k")), lit(1), Seq(col("i")),
      Left(rate), Some(col("ex")), "")
    assert(!bare.columns.contains("sample_rate") && !bare.columns.contains("my_rate"))
    // with no key and no exclusions, configured == counter (same row set)
    val plain = (0 until 60).map(i => ("g" + i % 2, i)).toDF("g", "i")
    val viaConf = Sample.configured(plain, None, col("g"), Seq(col("i")),
      Left(5), None, "sample_rate").collect().map(r => (r.getString(0), r.getInt(1))).toSet
    val viaCounter = Sample.counter(plain, Seq(col("g")), Seq(col("i")), 5)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(viaConf == viaCounter)
  }

  test("sample.ratioThresholdBits matches Rust f64-as-u64 saturation (sample/transform.rs:52)") {
    assert(Sample.ratioThresholdBits(1.0) == -1L)             // saturates to u64::MAX
    assert(Sample.ratioThresholdBits(0.0) == 0L)
    assert(Sample.ratioThresholdBits(0.5) == Long.MinValue)   // 2^63 in u64 bits
    // 0.25 * 2^64 = 2^62, below the sign bit: plain truncation
    assert(Sample.ratioThresholdBits(0.25) == (1L << 62))
  }

  test("log_to_metric all_metrics: log-shaped metric converts 1:1, malformed rows drop (log_to_metric.rs:783-905)") {
    val rows = Seq(
      // the reference's transform_all_metrics_optional_namespace vector
      ("test.transform.counter", "incremental", "10.0", null, "test_env", "localhost"),
      ("bad.kind", "bogus", "5", null, "e", "h"),                 // MetricValueError -> drop
      (null, "incremental", "5", null, "e", "h"),                 // PathNotFound(name) -> drop
      ("no.arm", "incremental", null, null, "e", "h"),            // MetricDetailsNotFound -> drop
      ("bad.value", "incremental", "not_a_number", null, "e", "h"), // ParseError -> drop
      ("gauge.arm", "absolute", null, "2.5", "e", "h"))           // second arm wins
      .toDF("name", "kind", "counter_v", "gauge_v", "env", "host")
    val out = Metrics.logToMetricAll(rows,
        ts = to_timestamp(lit("2024-01-01 00:00:00")),
        name = col("name"), kind = col("kind"),
        arms = Seq("counter" -> col("counter_v"), "gauge" -> col("gauge_v")),
        tags = Some(map(lit("env"), col("env"), lit("host"), col("host"))))
      .collect().map(r => (r.getString(0), r.getString(2), r.getString(3),
        r.getString(4), r.getDouble(5))).sortBy(_._1)
    assert(out.toSeq == Seq(
      ("gauge.arm", "env=e,host=h", "absolute", "gauge", 2.5),
      ("test.transform.counter", "env=test_env,host=localhost", "incremental", "counter", 10.0)))
  }

  test("throttle caps events per key-window, first wins (throttle/transform.rs:36-53)") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = (0 until 10).map { i =>
      (if (i % 2 == 0) "a" else "b",
       new java.sql.Timestamp(base.getTime + i * 1000L), i)
    }
    val df = rows.toDF("key", "ts", "i")
    val out = Throttle(df, col("key"), col("ts"), threshold = 2,
      windowSecs = 3600, order = Seq(col("ts"), col("i")))
    // per key: first 2 of 5
    assert(out.collect().map(_.getInt(2)).sorted.toSeq == Seq(0, 1, 2, 3))
  }

  test("throttle: excluded events bypass WITHOUT consuming quota (transform.rs:102-130)") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // one key-window, ordered: e0(excluded), e1, e2, e3 — threshold 2
    val df = (0 until 4).map(i =>
      ("k", new java.sql.Timestamp(base.getTime + i * 1000L), i))
      .toDF("key", "ts", "i")
    val out = Throttle(df, col("key"), col("ts"), threshold = 2,
      windowSecs = 3600, order = Seq(col("i")),
      exclude = Some(col("i") === 0))
    // e0 passes via exclude; e1, e2 fill the quota; e3 dropped. A rank
    // over ALL rows would have let e0 push e2 out.
    assert(out.collect().map(_.getInt(2)).sorted.toSeq == Seq(0, 1, 2))
  }

  test("dedupe keeps first by order; typed columns never cross-dedupe (dedupe/transform.rs:54-65)") {
    val df = Seq(("x", 1, "first"), ("x", 1, "second"), ("x", 2, "other"))
      .toDF("a", "b", "tag")
      .withColumn("ord", monotonically_increasing_id())
    val out = Dedupe.keepFirst(df, Seq(col("a"), col("b")), Seq(col("tag")))
    assert(out.count() == 2)
    // int 1 vs string "1" must NOT dedupe: schema-level distinction
    val mixed = Seq((1, "1")).toDF("i", "s")
    assert(mixed.schema("i").dataType != mixed.schema("s").dataType)
  }

  test("reduce merge strategies (merge_strategy.rs:17-55)") {
    val df = Seq(
      ("g1", 0, "a", 10), ("g1", 1, "b", 5), ("g1", 2, "c", 7),
      ("g2", 0, "z", 1)
    ).toDF("g", "o", "s", "n")
    val out = df.groupBy($"g").agg(
      Reduce.Strategy.discard($"s", $"o").as("first"),
      Reduce.Strategy.retain($"s", $"o").as("last"),
      Reduce.Strategy.sumS($"n").as("sum"),
      Reduce.Strategy.maxS($"n").as("max"),
      Reduce.Strategy.minS($"n").as("min"),
      Reduce.Strategy.concat($"s", $"o").as("concat"),
      Reduce.Strategy.concatNewline($"s", $"o").as("concat_nl"),
      array_join(Reduce.Strategy.flatUnique($"s"), ",").as("uniq")
    ).collect().map(r => r.getString(0) -> r).toMap
    val g1 = out("g1")
    assert(g1.getAs[String]("first") == "a" && g1.getAs[String]("last") == "c")
    assert(g1.getAs[Long]("sum") == 22 && g1.getAs[Int]("max") == 10 && g1.getAs[Int]("min") == 5)
    assert(g1.getAs[String]("concat") == "a b c")
    assert(g1.getAs[String]("concat_nl") == "a\nb\nc")
    assert(g1.getAs[String]("uniq") == "a,b,c")
  }

  test("reduce shortest/longest array aggregators") {
    val df = Seq(
      ("g", Seq("a", "b")), ("g", Seq("x")), ("g", Seq("p", "q", "r"))
    ).toDF("g", "arr")
    val out = df.groupBy($"g").agg(
      Reduce.Strategy.shortestArray($"arr").as("short"),
      Reduce.Strategy.longestArray($"arr").as("long")
    ).collect()(0)
    assert(out.getAs[scala.collection.Seq[String]]("short").toSeq == Seq("x"))
    assert(out.getAs[scala.collection.Seq[String]]("long").toSeq == Seq("p", "q", "r"))
  }

  test("reduce ends_when closes the session INCLUDING the matching row (reduce/transform.rs:223)") {
    val df = Seq(
      ("c", 0, false), ("c", 1, true), ("c", 2, false), ("c", 3, false)
    ).toDF("g", "o", "end")
    val out = Reduce.sessionIds(df, Seq($"g"), $"o", Some($"end"), None)
      .orderBy($"o").collect().map(_.getAs[Long]("session_id")).toSeq
    assert(out == Seq(0L, 0L, 1L, 1L))
  }

  test("reduce starts_when: previous session flushes WITHOUT the matching row (reduce/config.rs:102-106)") {
    val df = Seq(
      ("c", 0, false), ("c", 1, false),
      ("c", 2, true),  // starts_when: closes {0,1}, opens {2,...}
      ("c", 3, false),
      ("c", 4, true)   // closes {2,3}, opens {4}
    ).toDF("k", "i", "start")
    val out = graft.operators.Reduce.sessionIds(df, Seq($"k"), $"i",
        endsWhen = None, maxEvents = None, startsWhen = Some($"start"))
      .groupBy("session_id")
      .agg(collect_list($"i").as("is"))
      .collect().map(_.getAs[scala.collection.Seq[Int]]("is").sorted.toSeq).toSet
    assert(out == Set(Seq(0, 1), Seq(2, 3), Seq(4)))
    // combined with ends_when: end closes INCLUDING its row, start excludes
    val df2 = Seq(
      ("c", 0, false, false), ("c", 1, false, true), // ends -> {0,1}
      ("c", 2, false, false),
      ("c", 3, true, false),  // starts -> closes {2}, opens {3,...}
      ("c", 4, false, false)
    ).toDF("k", "i", "start", "end")
    val out2 = graft.operators.Reduce.sessionIds(df2, Seq($"k"), $"i",
        endsWhen = Some($"end"), maxEvents = None, startsWhen = Some($"start"))
      .groupBy("session_id")
      .agg(collect_list($"i").as("is"))
      .collect().map(_.getAs[scala.collection.Seq[Int]]("is").sorted.toSeq).toSet
    assert(out2 == Set(Seq(0, 1), Seq(2), Seq(3, 4)))
  }

  test("reduce max_events cuts sessions") {
    val df = (0 until 7).map(i => ("c", i)).toDF("g", "o")
    val out = Reduce.sessionIds(df, Seq($"g"), $"o", None, Some(3))
      .orderBy($"o").collect().map(_.getAs[String]("session_id")).toSeq
    assert(out == Seq("0:0", "0:0", "0:0", "0:1", "0:1", "0:1", "0:2"))
  }

  test("context window emits before/after context (window/transform.rs:50-94)") {
    val df = (0 until 10).map(i => ("k", i, i == 5)).toDF("k", "o", "m")
    val out = ContextWindow(df, Seq($"k"), $"o", $"m", numBefore = 2, numAfter = 1)
    assert(out.collect().map(_.getInt(1)).sorted.toSeq == Seq(3, 4, 5, 6))
  }

  test("context window forward_when always passes") {
    val df = (0 until 10).map(i => ("k", i, i == 5)).toDF("k", "o", "m")
    val out = ContextWindow(df, Seq($"k"), $"o", $"m", 1, 0,
      forwardWhen = Some($"o" === 9))
    assert(out.collect().map(_.getInt(1)).sorted.toSeq == Seq(4, 5, 9))
  }

  test("log_to_metric skips events with missing field (log_to_metric.rs:432)") {
    val logs = Seq(("a", Some(1.0)), ("b", None), ("c", Some(3.0)))
      .toDF("k", "v").withColumn("ts", current_timestamp())
    val rules = Seq(Metrics.MetricRule("counter", lit("m"), col("v"),
      tags = Seq("k" -> col("k"))))
    val out = Metrics.logToMetric(logs, rules, col("ts"))
    assert(out.count() == 2)
  }

  test("log_to_metric: null name skips the event; null tag value drops the tag, keeps the event") {
    val logs = Seq(
      (Some("n1"), Some("t1"), 1.0), // full row
      (Some("n2"), None, 2.0),       // tag render fails -> tag dropped
      (None, Some("t3"), 3.0))       // name render fails -> event skipped
      .toDF("n", "t", "v").withColumn("ts", current_timestamp())
    val rules = Seq(Metrics.MetricRule("counter", col("n"), col("v"),
      tags = Seq("env" -> lit("prod"), "t" -> col("t"))))
    val out = Metrics.logToMetric(logs, rules, col("ts"))
      .orderBy("name").collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[String]("tags")).toSeq ==
      Seq("env=prod,t=t1", "env=prod")) // no dangling bare "t"
  }

  test("metric_to_log renders tag-less metrics (null tags must not null the message)") {
    val m = Seq(("m1", "incremental", "counter", 2.0))
      .toDF("name", "kind", "value_type", "value")
      .withColumn("tags", lit(null).cast("string"))
    val msg = Metrics.metricToLog(m).head.getAs[String]("message")
    assert(msg == "metric name=m1 kind=incremental type=counter tags={} value=2.0")
  }

  test("aggregate_metrics keeps kind in the series identity (no absolute/incremental merge)") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // same (name, tags, value_type): a delta stream AND a snapshot stream
    val df = Seq(
      ("x", "a=1", "incremental", "counter", 1.0, 1L),
      ("x", "a=1", "incremental", "counter", 2.0, 2L),
      ("x", "a=1", "absolute", "counter", 100.0, 3L))
      .toDF("name", "tags", "kind", "value_type", "value", "ord")
      .withColumn("ts", lit(base))
    val out = Metrics.aggregateMetrics(df, 3600, $"ord")
      .orderBy("kind").collect()
    assert(out.length == 2) // one row per kind, not one merged row
    assert(out.map(r => (r.getAs[String]("kind"), r.getAs[Double]("sum_value"))).toSeq ==
      Seq(("absolute", 100.0), ("incremental", 3.0)))
  }

  test("summary quantile labels: fractional percents don't collide (0.999 vs 1.0)") {
    assert(Metrics.qLabel(0.5) == "q_50" && Metrics.qLabel(0.99) == "q_99")
    assert(Metrics.qLabel(0.999) == "q_99_9" && Metrics.qLabel(1.0) == "q_100")
    assert(Metrics.qLabel(0.999) != Metrics.qLabel(1.0))
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val r = Metrics.summaryAgg(df, $"v", Seq(0.999, 1.0), Seq(lit(1).as("g"))).head
    assert(r.getAs[Double]("q_99_9") <= r.getAs[Double]("q_100"))
  }

  test("incremental_to_absolute is a per-series running sum (incremental_to_absolute.rs:68-90)") {
    val df = Seq(("s1", 1, 1.0), ("s1", 2, 2.0), ("s1", 3, 4.0), ("s2", 1, 10.0))
      .toDF("series", "o", "v")
    val out = Metrics.incrementalToAbsolute(df, Seq($"series"), $"o", $"v")
      .orderBy($"series", $"o")
      .collect().map(_.getAs[Double]("abs_value")).toSeq
    assert(out == Seq(1.0, 3.0, 7.0, 10.0))
  }

  test("incremental_to_absolute: mixed kinds — absolute rows forward unchanged, never summed") {
    // an absolute snapshot (100.0) interleaved in the series must not
    // enter the running sum (the reference's cache sees only incrementals)
    val df = Seq(
      ("s1", 1, 1.0, "incremental"), ("s1", 2, 100.0, "absolute"),
      ("s1", 3, 2.0, "incremental"), ("s1", 4, 4.0, "incremental"))
      .toDF("series", "o", "v", "k")
    val out = Metrics.incrementalToAbsolute(df, Seq($"series"), $"o", $"v",
        kind = Some($"k"))
      .orderBy($"o").collect()
    assert(out.map(_.getAs[Double]("abs_value")).toSeq == Seq(1.0, 100.0, 3.0, 7.0))
    assert(out.forall(_.getAs[String]("kind") == "absolute"))
  }

  test("tag_cardinality_limit drop_tag nulls the overflow values (tag_cardinality_limit)") {
    val df = (0 until 20).map(i => (i, s"v${i / 2}")).toDF("ord", "tag")
    val out = Metrics.tagCardinalityLimit(df, "tag", $"ord", valueLimit = 3,
      dropEvent = false)
    assert(out.filter($"tag".isNotNull).count() == 6)
    assert(out.count() == 20)
    val dropped = Metrics.tagCardinalityLimit(df, "tag", $"ord", 3, dropEvent = true)
    assert(dropped.count() == 6)
  }

  test("tag_cardinality_limit: events without the tag pass through and consume no slot") {
    // nulls interleaved FIRST by ord: they must not win a limit slot
    val df = ((0 until 4).map(i => (i, null: String)) ++
      (4 until 24).map(i => (i, s"v${(i - 4) / 2}"))).toDF("ord", "tag")
    // dropEvent: the reference only constrains events that CARRY the tag
    val dropped = Metrics.tagCardinalityLimit(df, "tag", $"ord", 3, dropEvent = true)
    assert(dropped.count() == 4 + 6) // all null-tag rows + 3 values x 2
    assert(dropped.filter($"tag".isNull).count() == 4)
    // dropTag: kept values are the first 3 NON-NULL values (v0,v1,v2)
    val out = Metrics.tagCardinalityLimit(df, "tag", $"ord", 3, dropEvent = false)
    assert(out.filter($"tag".isNotNull).count() == 6)
    assert(out.filter($"tag".isin("v0", "v1", "v2")).count() == 6)
  }

  test("aggregate modes over event-time windows (aggregate.rs:131-322)") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(s: Int) = new java.sql.Timestamp(base.getTime + s * 1000L)
    val df = Seq(
      ("s", t(0), 1.0), ("s", t(5), 3.0),   // window 0
      ("s", t(10), 10.0), ("s", t(12), 4.0) // window 1
    ).toDF("series", "ts", "v")
    def run(m: Aggregate.Mode) =
      Aggregate.tumbling(df, Seq($"series"), $"ts", $"v", m, 10L)
        .orderBy($"win").collect().map(_.getAs[Any]("value")).toSeq
    assert(run(Aggregate.Sum) == Seq(4.0, 14.0))
    assert(run(Aggregate.Count) == Seq(2L, 2L))
    assert(run(Aggregate.Max) == Seq(3.0, 10.0))
    assert(run(Aggregate.Min) == Seq(1.0, 4.0))
    assert(run(Aggregate.Mean) == Seq(2.0, 7.0))
    assert(run(Aggregate.Latest) == Seq(3.0, 4.0))
    assert(run(Aggregate.Diff) == Seq(3.0, 1.0)) // 3-0, 4-3
  }

  test("aggregate Count counts EVENTS (null values included); Stdev never NaNs on constants") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(s: Int) = new java.sql.Timestamp(base.getTime + s * 1000L)
    // reference record_count emits Counter{1} per metric regardless of value
    val withNulls = Seq(("s", t(0), Some(1.0)), ("s", t(2), None), ("s", t(4), Some(2.0)))
      .toDF("series", "ts", "v")
    val c = Aggregate.tumbling(withNulls, Seq($"series"), $"ts", $"v",
      Aggregate.Count, 10L).head.getAs[Long]("value")
    assert(c == 3L)
    // constant large-magnitude series: the naive radicand cancels to a
    // tiny NEGATIVE double; unclamped sqrt would return NaN for a true 0
    val flat = Seq.fill(3)(("s", t(0), 10000000.1)).toDF("series", "ts", "v")
    val sd = Aggregate.tumbling(flat, Seq($"series"), $"ts", $"v",
      Aggregate.Stdev, 10L).head.getAs[Double]("value")
    assert(!sd.isNaN && sd >= 0.0 && sd < 1e-3, s"stdev=$sd")
  }

  test("context window: forwarded events bypass the buffer and consume no context slot") {
    // before=1, after=0: e2 is forwarded; e1's single before-slot must
    // still reach the flush at e3 (the reference never buffers forwarded
    // events, transform.rs:51-66)
    val df = Seq((1, false, false), (2, true, false), (3, false, true))
      .toDF("o", "fwd", "flush").withColumn("k", lit("g"))
    val out = ContextWindow(df, Seq($"k"), $"o", $"flush",
      numBefore = 1, numAfter = 0, forwardWhen = Some($"fwd"))
    assert(out.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
    // a row matching BOTH forward and flush is forwarded, NOT a flush
    // match: its neighbors get no context from it
    val df2 = Seq((1, false, false), (2, true, true), (3, false, false))
      .toDF("o", "fwd", "flush").withColumn("k", lit("g"))
    val out2 = ContextWindow(df2, Seq($"k"), $"o", $"flush",
      numBefore = 1, numAfter = 1, forwardWhen = Some($"fwd"))
    assert(out2.collect().map(_.getInt(0)).sorted.toSeq == Seq(2))
  }

  test("aggregate Auto: last absolute replaces, later incrementals add (aggregate.rs:134-140)") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(s: Int) = new java.sql.Timestamp(base.getTime + s * 1000L)
    val df = Seq(
      // window 0: inc 1, abs 100, inc 2, inc 3 -> 100 + 2 + 3 = 105
      ("s", t(0), 1.0, "incremental", 1L), ("s", t(2), 100.0, "absolute", 2L),
      ("s", t(4), 2.0, "incremental", 3L), ("s", t(6), 3.0, "incremental", 4L),
      // window 1: all incremental -> plain sum 7
      ("s", t(10), 3.0, "incremental", 5L), ("s", t(12), 4.0, "incremental", 6L),
      // window 2: abs 50 then abs 60 -> last absolute wins
      ("s", t(20), 50.0, "absolute", 7L), ("s", t(22), 60.0, "absolute", 8L)
    ).toDF("series", "ts", "v", "kind", "ord")
    val out = Aggregate.tumbling(df, Seq($"series"), $"ts", $"v",
        Aggregate.Auto, 10L, orderCol = Some($"ord"), kind = Some($"kind"))
      .orderBy($"win").collect().map(_.getAs[Double]("value")).toSeq
    assert(out == Seq(105.0, 7.0, 60.0))
  }

  test("aggregateMetrics approxDistinct: one exchange instead of two, values agree at low cardinality") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = (0 until 300).map { i =>
      val vt = Seq("counter", "gauge", "set")(i % 3)
      (s"m${i % 2}", "t=1", vt, (i % 7).toDouble,
        new java.sql.Timestamp(base.getTime + i * 1000L), i.toLong)
    }
    val df = rows.toDF("name", "tags", "value_type", "value", "ts", "ord")
      .withColumn("kind", lit("incremental"))
    val exact = Metrics.aggregateMetrics(df, 3600, $"ord")
    val approx = Metrics.aggregateMetrics(df, 3600, $"ord", approxDistinct = true)
    // the exact countDistinct plans a partial-distinct: an EXTRA full
    // shuffle keyed on (group keys, value) before the group shuffle
    // (with 2+ distinct aggs it becomes an Expand that multiplies the
    // stream); the HLL swap is a plain mergeable agg — one exchange
    def exchanges(d: org.apache.spark.sql.DataFrame) =
      "Exchange hashpartitioning".r
        .findAllIn(d.queryExecution.executedPlan.toString).length
    assert(exchanges(exact) == 2, "exact distinct should add a shuffle")
    assert(exchanges(approx) == 1, "approx distinct must keep ONE shuffle")
    def snap(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("name", "value_type").collect().map(r =>
        (r.getAs[String]("name"), r.getAs[String]("value_type"),
          r.getAs[Long]("n"), r.getAs[Long]("distinct_values"))).toSeq
    // 7 distinct set values — well inside HLL exact range
    assert(snap(exact) == snap(approx))
  }

  test("dedupe LRU bounded cache: exact match with a sequential LruCache replay (dedupe/common.rs:32-34)") {
    // sequential reference model: put-on-every-event LRU, emit on miss
    def lruModel(keys: Seq[String], n: Int): Seq[Int] = {
      val cache = new java.util.LinkedHashMap[String, Boolean](16, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[String, Boolean]) =
          size() > n
      }
      keys.zipWithIndex.collect {
        case (k, i) if { val hit = cache.containsKey(k); cache.put(k, true); !hit } => i
      }
    }
    val rnd = new scala.util.Random(99)
    val keys = (0 until 2000).map(_ => s"k${rnd.nextInt(30)}")
    val df = keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "ord")
    for (n <- Seq(1, 5, 29, 200)) {
      val got = graft.operators.Dedupe
        .keepFirstLru(df.repartition(7), Seq($"k"), $"ord", n)
        .select("ord").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == lruModel(keys, n).map(_.toLong),
        s"n=$n: distributed LRU dedupe diverges from the sequential cache")
    }
    // capacity >= distinct keys degenerates to exact keepFirst
    val exact = graft.operators.Dedupe.keepFirst(df, Seq($"k"), Seq($"ord"))
      .select("ord").collect().map(_.getLong(0)).sorted.toSeq
    val lru1000 = graft.operators.Dedupe.keepFirstLru(df, Seq($"k"), $"ord", 1000)
      .select("ord").collect().map(_.getLong(0)).sorted.toSeq
    assert(lru1000 == exact)
  }

  test("dedupe timed cache: both refresh modes replay the sequential reference (dedupe/timed_transform.rs:32-54)") {
    // sequential reference model over event time: drop iff the cached
    // entry is younger than maxAge (STRICT <); refresh_on_drop
    // refreshes on every sighting, else only on keeps
    def timedModel(evs: Seq[(String, Long)], maxAge: Long,
                   refresh: Boolean): Seq[Int] = {
      val cache = scala.collection.mutable.Map.empty[String, Long]
      evs.zipWithIndex.collect { case ((k, t), i) if {
        val drop = cache.get(k).exists(prev => t - prev < maxAge)
        if (refresh || !drop) cache(k) = t
        !drop
      } => i }
    }
    val rnd = new scala.util.Random(7)
    // bursty arrivals: many same-key events inside and across the age
    var t = 0L
    val evs = (0 until 1500).map { _ =>
      t += rnd.nextInt(40); (s"k${rnd.nextInt(8)}", t)
    }
    val df = evs.zipWithIndex.map { case ((k, ms), i) =>
      (k, new java.sql.Timestamp(ms), i.toLong) }.toDF("k", "ts", "ord")
    for (maxAge <- Seq(1L, 50L, 400L); refresh <- Seq(true, false)) {
      val got = graft.operators.Dedupe
        .keepFirstTimed(df.repartition(7), Seq($"k"), $"ts", $"ord",
          maxAge, refreshOnDrop = refresh)
        .select("ord").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == timedModel(evs, maxAge, refresh).map(_.toLong),
        s"maxAge=$maxAge refresh=$refresh diverges from the sequential cache")
    }
    // a huge max_age degenerates to exact keepFirst in both modes
    val exact = graft.operators.Dedupe.keepFirst(df, Seq($"k"), Seq($"ord"))
      .select("ord").collect().map(_.getLong(0)).sorted.toSeq
    for (refresh <- Seq(true, false)) {
      val wide = graft.operators.Dedupe
        .keepFirstTimed(df, Seq($"k"), $"ts", $"ord", 1L << 50, refresh)
        .select("ord").collect().map(_.getLong(0)).sorted.toSeq
      assert(wide == exact)
    }
  }

  // ---- DDSketch mergeable summary sketch (value.rs:20-95) -------------

  test("ddsketch: quantiles within alpha relative error of the exact rank statistic") {
    import org.apache.spark.sql.graftvec.SketchExpressions.DDSketchState
    val rnd = new scala.util.Random(42)
    // log-normal-ish latencies + negatives + zeros: all three stores
    val xs = Array.fill(20000)(math.exp(rnd.nextGaussian() * 2 + 3)) ++
      Array.fill(500)(-math.exp(rnd.nextGaussian())) ++ Array.fill(100)(0.0)
    val alpha = 0.01
    val st = new DDSketchState(alpha)
    xs.foreach(st.insert)
    val sorted = xs.sorted
    for (q <- Seq(0.0, 0.01, 0.25, 0.5, 0.9, 0.99, 1.0)) {
      val exact = sorted((q * (xs.length - 1)).toLong.toInt)
      val est = st.quantile(q)
      val err = math.abs(est - exact) / math.max(math.abs(exact), 1e-9)
      assert(err <= alpha + 1e-9, s"q=$q exact=$exact est=$est err=$err")
    }
  }

  test("ddsketch: collapse under a tight bin budget keeps the sketch bounded and the tail accurate") {
    import org.apache.spark.sql.graftvec.SketchExpressions
    // monotone wide-dynamic-range stream: every few rows open a NEW
    // bucket, the worst case for per-insert collapse cost (the slack
    // window amortizes it); maxBins=24 forces heavy folding
    val xs = (1 to 6000).map(i => math.exp(i / 300.0)) // e^0 .. e^20
    val df = xs.toDF("v")
    val row = df.repartition(4).agg(
      SketchExpressions.ddQuantiles(col("v"), Seq(0.5, 0.99), alpha = 0.01,
        maxBins = 24).as("qs")).head
    val Seq(p50, p99) = row.getSeq[Double](0).toSeq
    val sorted = xs.sorted
    val exact99 = sorted((0.99 * (xs.length - 1)).toInt)
    // the top of the range is never folded: tail quantile keeps the
    // alpha bound even at 24 bins
    assert(math.abs(p99 - exact99) / exact99 <= 0.01 + 1e-9, s"p99=$p99 exact=$exact99")
    // collapse folds low-magnitude mass UPWARD: p50 can only sit at or
    // above the exact rank (within alpha), and never outside the range
    val exact50 = sorted((0.5 * (xs.length - 1)).toInt)
    assert(p50 >= exact50 * (1 - 0.01) && p50 <= sorted.last, s"p50=$p50 exact=$exact50")
  }

  test("ddsketch: merge is order- and partitioning-invariant") {
    import org.apache.spark.sql.graftvec.SketchExpressions.DDSketchState
    val rnd = new scala.util.Random(7)
    val xs = Array.fill(5000)(rnd.nextDouble() * 1000 - 100)
    def build(slices: Seq[Array[Double]], order: Seq[Int]): DDSketchState = {
      val parts = slices.map { s =>
        val st = new DDSketchState(0.01); s.foreach(st.insert); st }
      val acc = new DDSketchState(0.01)
      order.foreach(i => acc.mergeWith(parts(i)))
      acc
    }
    val a = build(xs.grouped(500).toSeq, 0 until 10)
    val b = build(xs.grouped(1250).toSeq, Seq(3, 0, 2, 1))
    assert(a.pos.toMap == b.pos.toMap && a.neg.toMap == b.neg.toMap)
    assert(a.zero == b.zero && a.total == b.total)
    assert(a.minV == b.minV && a.maxV == b.maxV)
  }

  test("ddsketch: summarySketchAgg matches exact summaryAgg within alpha, any partitioning") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 4000).map(i =>
      (s"g${i % 3}", math.exp(rnd.nextGaussian() + 4)))
    val df = rows.toDF("k", "v")
    val qs = Seq(0.5, 0.9, 0.99)
    def run(parts: Int) =
      Metrics.summarySketchAgg(df.repartition(parts), col("v"), qs,
          Seq(col("k")), alpha = 0.01)
        .orderBy("k").collect()
    val r8 = run(8)
    // partition-count invariance of the SKETCH columns (mergeability at
    // the plan level); the plain sum(v) double is excluded — float
    // addition order legitimately varies with partitioning
    def sk(rs: Array[Row]) = rs.map(r =>
      (r.getString(0), r.getLong(r.fieldIndex("n")),
        qs.map(q => r.getDouble(r.fieldIndex(s"q_${(q * 100).round.toInt}")))))
    assert(sk(r8).toSeq == sk(run(2)).toSeq)
    // rank-statistic ground truth per group, same floor-rank convention
    val byK = rows.groupBy(_._1)
    for (r <- r8; (q, qi) <- qs.zipWithIndex) {
      val vs = byK(r.getString(0)).map(_._2).sorted
      val exact = vs((q * (vs.length - 1)).toInt)
      val est = r.getDouble(r.fieldIndex(s"q_${(q * 100).round.toInt}"))
      assert(math.abs(est - exact) / exact <= 0.01 + 1e-9,
        s"k=${r.getString(0)} q=$q exact=$exact est=$est")
    }
  }

  test("ddsketch: bucket budget enforced by collapse, tail quantiles survive") {
    import org.apache.spark.sql.graftvec.SketchExpressions.DDSketchState
    val st = new DDSketchState(0.01)
    // 6 decades of dynamic range -> far more than 64 natural buckets
    (1 to 50000).foreach(i => { st.insert(i * 0.01); st.collapseIfNeeded(64) })
    assert(st.pos.size + st.neg.size <= 64)
    // collapse folds LOW buckets: upper quantiles keep the alpha bound
    val exact9 = 0.01 * math.ceil(0.9 * 50000)
    assert(math.abs(st.quantile(0.9) - exact9) / exact9 <= 0.011)
    assert(st.quantile(1.0) == 500.0)
  }

  test("ddsketch: bucket budget holds for negative and mixed-sign data") {
    import org.apache.spark.sql.graftvec.SketchExpressions.DDSketchState
    // all-negative: collapse must fold neg buckets, not just pos
    val neg = new DDSketchState(0.01)
    (1 to 50000).foreach(i => { neg.insert(-i * 0.01); neg.collapseIfNeeded(64) })
    assert(neg.pos.size + neg.neg.size <= 64,
      s"neg-only sketch grew to ${neg.pos.size + neg.neg.size} buckets")
    // collapse folds lowest-|v| buckets: the extreme (most negative)
    // tail keeps its accuracy
    assert(neg.quantile(0.0) == -500.0)
    val exact1 = -0.01 * math.ceil(0.9 * 50000) // q=0.1 of negatives
    assert(math.abs(neg.quantile(0.1) - exact1) / math.abs(exact1) <= 0.011)
    // mixed signs: budget still holds
    val mix = new DDSketchState(0.01)
    (1 to 25000).foreach { i =>
      mix.insert(i * 0.01); mix.insert(-i * 0.01); mix.collapseIfNeeded(64)
    }
    assert(mix.pos.size + mix.neg.size <= 64,
      s"mixed sketch grew to ${mix.pos.size + mix.neg.size} buckets")
  }
}
