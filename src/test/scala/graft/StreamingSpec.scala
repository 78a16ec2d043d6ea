package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Structured Streaming specs: the same pipeline code over a stream,
  * plus the stateful Task-class transforms (throttle, session reduce,
  * dedupe) — mirroring the reference's stream-native semantics
  * (SURVEY.md §2.1 Task transforms).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  final case class Turn(conv_id: String, turn_idx: Int, role: String,
                        tool: String, ts: Timestamp, text: String)

  private def turn(conv: String, idx: Int, level: String): Turn = {
    val t = ts(s"2024-01-01 00:0${idx % 10}:00")
    val iso = new java.text.SimpleDateFormat("yyyy-MM-dd'T'HH:mm:ss'Z'").format(t)
    Turn(conv, idx, "assistant", "tool_1", t,
      s"""$iso $level tool=tool_1 latency_ms=${100 + idx} msg="turn $idx"""")
  }

  test("north-star pipeline runs over a stream: parse->enrich->route->windowed agg") {
    val input = MemoryStream[Turn](spark)
    val out = StreamOps.pipeline(spark, input.toDF())
    val q = out.writeStream.format("memory").queryName("s_pipeline")
      .outputMode("append").start()
    try {
      input.addData(turn("c1", 0, "info"), turn("c1", 1, "error"),
        turn("c2", 0, "info"))
      q.processAllAvailable()
      // append mode emits only closed windows — advance the watermark
      input.addData(turn("c9", 99, "info").copy(ts = ts("2024-01-02 00:00:00"),
        text = "2024-01-02T00:00:00Z info tool=tool_1 latency_ms=1 msg=\"x\""))
      q.processAllAvailable()
      val rows = spark.table("s_pipeline")
      assert(rows.agg(sum("n_turns")).collect()(0).getLong(0) >= 3)
      assert(rows.select("port").distinct().collect()
        .map(_.getString(0)).toSet.subsetOf(
          Set("errors", "tool_calls", "slow", "premium", "_unmatched")))
    } finally q.stop()
  }

  test("streaming pipeline equals the batch pipeline on closed windows") {
    import graft.plans.Pipeline
    import graft.operators.Aggregate
    val turns = (0 until 30).map(i =>
      turn(s"c${i % 5}", i, if (i % 7 == 0) "error" else "info"))
    val sentinel = turn("cz", 99, "info").copy(ts = ts("2024-01-02 00:00:00"),
      text = "2024-01-02T00:00:00Z info tool=tool_1 latency_ms=1 msg=\"x\"")
    val sentinelWin = sentinel.ts.getTime / 1000

    val input = MemoryStream[Turn](spark)
    val q = StreamOps.pipeline(spark, input.toDF())
      .writeStream.format("memory").queryName("s_pipe_eq")
      .outputMode("append").start()
    val streamed =
      try {
        input.addData(turns: _*)
        q.processAllAvailable()
        input.addData(sentinel) // advances the watermark, closes day-1 windows
        q.processAllAvailable()
        spark.table("s_pipe_eq")
          .select(col("window.start").cast("long").as("win"), col("port"),
            col("role"), col("n_turns"), col("sum_latency"))
          .filter(col("win") < sentinelWin)
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2),
            r.getLong(3), r.getLong(4))).toSet
      } finally q.stop()

    // tuple toDF: inner case classes can't get a deferred-outer encoder
    val batchDf = turns.map(t => (t.conv_id, t.turn_idx, t.role, t.tool, t.ts, t.text))
      .toDF("conv_id", "turn_idx", "role", "tool", "ts", "text")
    val batch = Pipeline.buildFrom(spark, batchDf).routed
      .groupBy(Aggregate.windowStart(col("ts"), Pipeline.WindowSecs).as("win"),
        col("port"), col("role"))
      .agg(count(lit(1)).as("n_turns"), sum(col("latency_ms")).as("sum_latency"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet

    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming throttle: token bucket caps per key-window across batches") {
    val input = MemoryStream[StreamOps.Keyed](spark)
    val out = StreamOps.throttle(input.toDS(), threshold = 2, windowSecs = 60)
    val q = out.writeStream.format("memory").queryName("s_throttle")
      .outputMode("append").start()
    try {
      input.addData(StreamOps.Keyed("a", 0, "e1"), StreamOps.Keyed("a", 1, "e2"),
        StreamOps.Keyed("a", 2, "e3"))
      q.processAllAvailable()
      // second batch, same window: still capped
      input.addData(StreamOps.Keyed("a", 3, "e4"),
        StreamOps.Keyed("a", 61, "e5")) // next window refills
      q.processAllAvailable()
      val kept = spark.table("s_throttle").select("payload")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(kept == Seq("e1", "e2", "e5"))
    } finally q.stop()
  }

  test("streaming throttle: a late event is charged to ITS OWN window's budget") {
    val input = MemoryStream[StreamOps.Keyed](spark)
    val out = StreamOps.throttle(input.toDS(), threshold = 2, windowSecs = 10)
    val q = out.writeStream.format("memory").queryName("s_throttle_late")
      .outputMode("append").start()
    try {
      // window [10,20) fills its budget in batch 1
      input.addData(StreamOps.Keyed("a", 15, "e1"), StreamOps.Keyed("a", 16, "e2"))
      q.processAllAvailable()
      // batch 2 delivers a LATE event for window [0,10), which consumed
      // nothing — a single-counter state would charge it to window 10's
      // exhausted budget and drop it, making keep/drop depend on
      // micro-batch boundaries
      input.addData(StreamOps.Keyed("a", 5, "late"),
        StreamOps.Keyed("a", 17, "e3")) // window 10 stays capped
      q.processAllAvailable()
      val kept = spark.table("s_throttle_late").select("payload")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(kept == Seq("e1", "e2", "late"))
    } finally q.stop()
  }

  test("streaming session reduce: ends_when closes including the row; state spans batches") {
    val input = MemoryStream[StreamOps.SessionEvent](spark)
    val out = StreamOps.sessionReduce(input.toDS(), maxEvents = 10)
    val q = out.writeStream.format("memory").queryName("s_sessions")
      .outputMode("append").start()
    try {
      input.addData(
        StreamOps.SessionEvent("c", 0, endsWhen = false, "t0"),
        StreamOps.SessionEvent("c", 1, endsWhen = true, "t1"))
      q.processAllAvailable()
      input.addData(
        StreamOps.SessionEvent("c", 2, endsWhen = false, "t2"),
        StreamOps.SessionEvent("c", 3, endsWhen = true, "t3"))
      q.processAllAvailable()
      val rows = spark.table("s_sessions").orderBy("sessionId").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[String]("merged") == "t0\nt1")
      assert(rows(1).getAs[String]("merged") == "t2\nt3")
    } finally q.stop()
  }

  /** ProcessingTimeTimeout makes the engine run micro-batches
    * continuously (shouldRunAnotherBatch is always true so expired
    * timers fire without new data) — which also means `noNewData` never
    * latches and `processAllAvailable` would block forever. Timeout
    * specs therefore POLL the memory sink with a deadline instead.
    */
  private def awaitRows(table: String, atLeast: Long, deadlineMs: Long = 60000): Unit = {
    val t0 = System.nanoTime()
    while (spark.table(table).count() < atLeast) {
      assert((System.nanoTime() - t0) / 1e6 < deadlineMs,
        s"$table still has ${spark.table(table).count()} rows (< $atLeast)")
      Thread.sleep(100)
    }
  }

  test("session reduce expire_after_ms: open session flushes on inactivity timeout (reduce/config.rs:109-111)") {
    val input = MemoryStream[StreamOps.SessionEvent](spark)
    val out = StreamOps.sessionReduce(input.toDS(), maxEvents = 10,
      expireAfterMs = Some(500L))
    val q = out.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
      .format("memory").queryName("s_sess_expire")
      .outputMode("append").start()
    try {
      // an OPEN session for key c: no endsWhen row ever arrives
      input.addData(
        StreamOps.SessionEvent("c", 0, endsWhen = false, "t0"),
        StreamOps.SessionEvent("c", 1, endsWhen = false, "t1"))
      // inactivity flush: the 500 ms timer fires on a later empty batch
      awaitRows("s_sess_expire", 1)
      val flushed = spark.table("s_sess_expire").collect()(0)
      assert(flushed.getAs[String]("key") == "c")
      assert(flushed.getAs[String]("merged") == "t0\nt1")
      assert(flushed.getAs[Long]("n") == 2L)
      // a later event for c starts a FRESH session whose sessionId
      // CONTINUES the numbering — a timeout flush that reset the counter
      // would mint a duplicate (key, sessionId) pair
      input.addData(StreamOps.SessionEvent("c", 9, endsWhen = true, "t9"))
      awaitRows("s_sess_expire", 2)
      val again = spark.table("s_sess_expire")
        .filter($"key" === "c" && $"merged" === "t9").collect()
      assert(again.length == 1 && again(0).getAs[Long]("n") == 1L)
      assert(again(0).getAs[Long]("sessionId") >
        flushed.getAs[Long]("sessionId"))
      val ids = spark.table("s_sess_expire").filter($"key" === "c")
        .collect().map(_.getAs[Long]("sessionId"))
      assert(ids.distinct.length == ids.length, s"duplicate sessionIds: ${ids.toSeq}")
    } finally q.stop()
  }

  test("session reduce end_every_period_ms: session age flushes even with steady activity (reduce/transform.rs:223-231)") {
    val input = MemoryStream[StreamOps.SessionEvent](spark)
    // inactivity expiry alone would NEVER fire here (events keep
    // arriving faster than any idle gap); only the session-age cap
    // (end_every, aged against session creation) can flush.
    val out = StreamOps.sessionReduce(input.toDS(), maxEvents = 1000,
      endEveryMs = Some(700L))
    val q = out.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
      .format("memory").queryName("s_sess_endevery")
      .outputMode("append").start()
    try {
      var seq = 0L
      val t0 = System.nanoTime()
      // steady drip of non-closing events for one key
      while (spark.table("s_sess_endevery").count() < 1 &&
        (System.nanoTime() - t0) / 1e6 < 60000) {
        input.addData(StreamOps.SessionEvent("k", seq, endsWhen = false, s"t$seq"))
        seq += 1
        Thread.sleep(120)
      }
      val flushed = spark.table("s_sess_endevery").collect()
      assert(flushed.nonEmpty, "end_every never flushed the active session")
      assert(flushed(0).getAs[String]("key") == "k")
      assert(flushed(0).getAs[Long]("n") >= 1L)
      // numbering continues after the aged flush
      input.addData(StreamOps.SessionEvent("k", 10000, endsWhen = true, "last"))
      awaitRows("s_sess_endevery", flushed.length + 1)
      val ids = spark.table("s_sess_endevery").filter($"key" === "k")
        .collect().map(_.getAs[Long]("sessionId"))
      assert(ids.distinct.length == ids.length, s"duplicate sessionIds: ${ids.toSeq}")
    } finally q.stop()
  }

  test("line_agg timeout flushes the incomplete open record (line_agg.rs:68-69)") {
    val input = MemoryStream[StreamOps.Line](spark)
    val out = StreamOps.lineAgg(input.toDS(), "^\\s", timeoutMs = Some(500L))
    val q = out.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
      .format("memory").queryName("s_lineagg_to")
      .outputMode("append").start()
    try {
      input.addData(
        StreamOps.Line("f", 1, "ERROR a"), StreamOps.Line("f", 2, "  at x"))
      awaitRows("s_lineagg_to", 1) // flushed INCOMPLETE by the timer
      val f = spark.table("s_lineagg_to").filter($"key" === "f").collect()
      assert(f.length == 1)
      assert(f(0).getAs[String]("text") == "ERROR a\n  at x")
      assert(f(0).getAs[Long]("nLines") == 2L)
    } finally q.stop()
  }

  test("streaming line_agg merges continuation lines across micro-batches") {
    val input = MemoryStream[StreamOps.Line](spark)
    val out = StreamOps.lineAgg(input.toDS(), "^\\s")
    val q = out.writeStream.format("memory").queryName("s_lineagg")
      .outputMode("append").start()
    try {
      input.addData(
        StreamOps.Line("f", 1, "ERROR a"), StreamOps.Line("f", 2, "  at x"))
      q.processAllAvailable()
      input.addData(
        StreamOps.Line("f", 3, "  at y"), StreamOps.Line("f", 4, "INFO done"),
        StreamOps.Line("f", 5, "ERROR b"))
      q.processAllAvailable()
      val rows = spark.table("s_lineagg").orderBy("firstLineNo").collect()
      // "ERROR b" stays buffered (no closing line yet — timeout flushes
      // it in production)
      assert(rows.map(_.getAs[String]("text")).toSeq ==
        Seq("ERROR a\n  at x\n  at y", "INFO done"))
      assert(rows.map(_.getAs[Long]("nLines")).toSeq == Seq(3L, 1L))
    } finally q.stop()
  }

  test("streaming line_agg: halt_with + start_pattern, exact machine across batches") {
    val input = MemoryStream[StreamOps.Line](spark)
    // start "[^;]$": complete one-liners (ending ';') pass through
    // alone; halt_with closes a group at the first ';' line
    val out = StreamOps.lineAgg(input.toDS(), ";$",
      mode = graft.operators.LineAgg.HaltWith, startPattern = "[^;]$")
    val q = out.writeStream.format("memory").queryName("s_lineagg_hw")
      .outputMode("append").start()
    try {
      input.addData(
        StreamOps.Line("f", 1, "done alone;"), StreamOps.Line("f", 2, "first"))
      q.processAllAvailable()
      input.addData(
        StreamOps.Line("f", 3, "second"), StreamOps.Line("f", 4, "third;"))
      q.processAllAvailable()
      val rows = spark.table("s_lineagg_hw").orderBy("firstLineNo").collect()
      assert(rows.map(_.getAs[String]("text")).toSeq ==
        Seq("done alone;", "first\nsecond\nthird;"))
      assert(rows.map(_.getAs[Long]("nLines")).toSeq == Seq(1L, 3L))
    } finally q.stop()
  }

  test("streaming dedupe within watermark") {
    val input = MemoryStream[Turn](spark)
    val out = StreamOps.dedupe(input.toDF(), Seq("conv_id", "turn_idx"),
      "ts", "1 hour")
    val q = out.writeStream.format("memory").queryName("s_dedupe")
      .outputMode("append").start()
    try {
      val t0 = turn("c1", 0, "info")
      input.addData(t0, t0, turn("c1", 1, "info"))
      q.processAllAvailable()
      assert(spark.table("s_dedupe").count() == 2)
    } finally q.stop()
  }

  test("kafka source: config surface builds and wire-schema decode projects") {
    import graft.sources.StreamSources
    // config path (no broker in-sandbox; .load() is connector-jar-gated)
    val reader = StreamSources.kafkaReader(spark, StreamSources.KafkaConfig(
      "broker-1:9092,broker-2:9092", Seq("turns", "metrics"),
      startingOffsets = "latest", maxOffsetsPerTrigger = Some(10000)))
    assert(reader != null)
    // decode path over a manually wire-shaped frame
    val wire = Seq(
      (Array[Byte](107), "line-1".getBytes("UTF-8"), "turns", 0, 12L,
        Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("key", "value", "topic", "partition", "offset", "timestamp")
    val out = StreamSources.decodeKafka(wire).head
    assert(out.getAs[String]("text") == "line-1")
    assert(out.getAs[String]("topic") == "turns")
    assert(out.getAs[Long]("offset") == 12L)
  }
}
