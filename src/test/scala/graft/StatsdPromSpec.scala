package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.functions._

import graft.config.Topology
import graft.functions.StatsdCodec
import graft.operators.Prometheus

/** The two metric wire formats: statsd decode (reference
  * src/sources/statsd/parser.rs — pinned to its inline tests) and
  * prometheus text exposition (src/sinks/prometheus/collector.rs —
  * pinned to encodes_*_text).
  */
class StatsdPromSpec extends SparkSpec {

  private def parseOne(line: String): Option[Map[String, Any]] = {
    import spark.implicits._
    val df = Seq(line).toDF("l")
      .select(StatsdCodec.parse(col("l")).as("m"))
      .filter(col("m").isNotNull)
      .select("m.name", "m.kind", "m.value_type", "m.value", "m.tags", "m.weight")
    df.collect().headOption.map { r =>
      Map("name" -> r.getString(0), "kind" -> r.getString(1),
        "vt" -> r.getString(2), "value" -> r.getDouble(3),
        "tags" -> r.getString(4), "weight" -> r.getLong(5))
    }
  }

  test("statsd: reference parser vectors") {
    // basic_counter
    assert(parseOne("foo:1|c").get == Map("name" -> "foo",
      "kind" -> "incremental", "vt" -> "counter", "value" -> 1.0,
      "tags" -> null, "weight" -> 1L))
    // tagged_counter with sanitization: foo/how@ever baz → foo-however_baz
    val tagged = parseOne("foo/how@ever baz:1|c|#tag1,tag2:value").get
    assert(tagged("name") == "foo-however_baz")
    assert(tagged("tags") == "tag1=,tag2=value") // bare tag renders k=
    // sampled_counter: 1|c|@0.1 → value 10
    assert(parseOne("bar:2|c|@0.1").get("value") == 20.0)
    // zero sample rate sanitizes to 1
    assert(parseOne("bar:2|c|@0").get("value") == 2.0)
    // timer: ms → seconds, sampled weight
    val t = parseOne("glork:320|ms|@0.1").get
    assert(t("vt") == "distribution" && t("value") == 0.32 && t("weight") == 10L)
    // weight TRUNCATES like the reference's `as u32` (parser.rs:94):
    // 1/0.4 is exactly 2.5 in IEEE -> weight 2, not round-half-up 3
    assert(parseOne("glork:320|ms|@0.4").get("weight") == 2L)
    // sample rate > 1 -> 1/2 = 0.5 -> `as u32` = 0: weight 0, and the
    // explode gate must emit ZERO sample rows; negative rates saturate
    // to 0 the same way (Rust float->u32 `as` saturates below zero)
    assert(parseOne("glork:320|ms|@2").get("weight") == 0L)
    assert(parseOne("glork:320|ms|@-0.5").get("weight") == 0L)
    // gauge absolute vs signed incremental
    val ga = parseOne("gaugor:333|g").get
    assert(ga("kind") == "absolute" && ga("value") == 333.0)
    val gd = parseOne("gaugor:-10|g").get
    assert(gd("kind") == "incremental" && gd("value") == -10.0)
    val gu = parseOne("gaugor:+4|g").get
    assert(gu("kind") == "incremental" && gu("value") == 4.0)
    // set
    val st = parseOne("uniques:1234|s").get
    assert(st("vt") == "set" && st("value") == 1234.0)
    // malformed lines drop
    assert(parseOne("no-colon-here").isEmpty)
    assert(parseOne("foo:1").isEmpty)
    assert(parseOne("foo:notanum|c").isEmpty)
    assert(parseOne("foo:1|q").isEmpty)
  }

  test("statsd: decoding codec feeds the metric pipeline from config") {
    val dir = java.nio.file.Files.createTempDirectory("graft_statsd").toFile
    val f = new java.io.File(dir, "metrics.statsd")
    java.nio.file.Files.write(f.toPath,
      // zap's @4 sample rate -> weight 0 -> zero rows through the gate
      "hits:1|c\nhits:3|c\nlat:100|ms|@0.5\ntemp:21|g|#room:a\nzap:7|ms|@4\n"
        .getBytes("UTF-8"))
    val topo = Topology.load(
      s"""
         |[sources.m]
         |  type = "file"
         |  path = "${f.getAbsolutePath}"
         |  [sources.m.decoding]
         |    codec = "statsd"
         |""".stripMargin)
    val out = topo.loadSources(spark)("m")
    assert(out.metric)
    val rows = out.df.select("name", "kind", "value_type", "value", "tags")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getDouble(3), r.getString(4))).sortBy(t => (t._1, t._4))
    // lat sample weight 2 → two rows
    assert(rows.toSeq == Seq(
      ("hits", "incremental", "counter", 1.0, null),
      ("hits", "incremental", "counter", 3.0, null),
      ("lat", "incremental", "distribution", 0.1, null),
      ("lat", "incremental", "distribution", 0.1, null),
      ("temp", "absolute", "gauge", 21.0, "room=a")))
  }

  private def expositionLines(rows: Seq[(String, String, String, String, String, Double)],
                              ns: Option[String]): Seq[String] = {
    val df = spark.createDataFrame(rows)
      .toDF("name", "namespace", "tags", "kind", "value_type", "value")
      .withColumn("namespace",
        when(col("namespace") === "", lit(null)).otherwise(col("namespace")))
      .withColumn("tags",
        when(col("tags") === "", lit(null)).otherwise(col("tags")))
      .withColumn("ts", to_timestamp(lit("2021-02-03 04:05:06.789")))
    Prometheus.exposition(df, ns)
      .orderBy("fullname", "ord").select("line")
      .collect().map(_.getString(0)).toSeq
  }

  test("prometheus text: reference collector vectors (counter, gauge, set)") {
    // encodes_counter_text
    assert(expositionLines(Seq(
      ("hits", "", "code=200", "absolute", "counter", 10.0)), Some("vector")) ==
      Seq("# HELP vector_hits hits",
        "# TYPE vector_hits counter",
        "vector_hits{code=\"200\"} 10 1612325106789"))
    // encodes_gauge_text
    assert(expositionLines(Seq(
      ("temperature", "", "code=200", "absolute", "gauge", -1.1)), Some("vector")) ==
      Seq("# HELP vector_temperature temperature",
        "# TYPE vector_temperature gauge",
        "vector_temperature{code=\"200\"} -1.1 1612325106789"))
    // encodes_set_text: 1 distinct member, type gauge, no labels
    assert(expositionLines(Seq(
      ("users", "", "", "absolute", "set", 42.0)), Some("vector")) ==
      Seq("# HELP vector_users users",
        "# TYPE vector_users gauge",
        "vector_users 1 1612325106789"))
    // incremental rows do not render (collector encodes Absolute only)
    assert(expositionLines(Seq(
      ("hits", "", "", "incremental", "counter", 1.0)), None).isEmpty)
  }

  test("prometheus text: large values render plain decimal like Rust Display, not 1.0E7") {
    val lines = expositionLines(Seq(
      ("big", "", "", "absolute", "counter", 1.0e7),
      ("frac", "", "", "absolute", "gauge", 12345678.25),
      // decimal(38,9) holds only 29 integer digits; the decimal(38,0)
      // tier must render [1e29,1e38) plain too — and must NOT have its
      // own zeros eaten by the fractional-zero strip
      ("huge", "", "", "absolute", "gauge", 1.0e30)), None)
    assert(lines.contains("big 10000000 1612325106789"), lines.toString)
    assert(lines.contains("frac 12345678.25 1612325106789"), lines.toString)
    assert(lines.contains(
      "huge 1000000000000000000000000000000 1612325106789"), lines.toString)
  }

  test("prometheus_exporter sink: statsd gauges render to an exposition file from config") {
    val dir = java.nio.file.Files.createTempDirectory("graft_promsink").toFile
    val src = new java.io.File(dir, "metrics.statsd")
    java.nio.file.Files.write(src.toPath,
      "temp:21|g|#room:a\ntemp:23|g|#room:b\n".getBytes("UTF-8"))
    val out = new java.io.File(dir, "exposition")
    val topo = Topology.load(
      s"""
         |[sources.m]
         |  type = "file"
         |  path = "${src.getAbsolutePath}"
         |  [sources.m.decoding]
         |    codec = "statsd"
         |[sinks.prom]
         |  inputs = ["m"]
         |  type = "prometheus_exporter"
         |  path = "${out.getAbsolutePath}"
         |  default_namespace = "vector"
         |""".stripMargin)
    val srcMap = topo.loadSources(spark)
    val n = topo.writeSinks(srcMap ++ topo.run(srcMap))("prom")
    assert(n == 4L) // HELP + TYPE + 2 samples
    val lines = spark.read.text(out.getAbsolutePath)
      .collect().map(_.getString(0)).toSeq
    assert(lines == Seq(
      "# HELP vector_temp temp",
      "# TYPE vector_temp gauge",
      "vector_temp{room=\"a\"} 21",
      "vector_temp{room=\"b\"} 23"))
    // non-metric input refused at validate
    val bad = Topology.load(
      s"""
         |[sinks.prom]
         |  inputs = ["x"]
         |  type = "prometheus_exporter"
         |  path = "${out.getAbsolutePath}"
         |""".stripMargin)
    import graft.config.{Frame, Topology => T}
    import graft.config.VrlCompile.{EventMeta, VStr}
    val logs = Frame(spark.range(1).selectExpr("'m' AS message", s"id AS ${T.SeqCol}"),
      EventMeta(ListMap("message" -> VStr), None))
    val e = intercept[Exception](bad.dryRunSinks(Map("x" -> logs)))
    assert(e.getMessage.contains("metric"))
  }

  test("prometheus text: cumulative histogram over the default buckets") {
    val lines = expositionLines(
      Seq(0.003, 0.02, 0.02, 0.3, 7.0, 20.0).map(v =>
        ("lat", "", "svc=a", "absolute", "distribution", v)), None)
    assert(lines.take(2) == Seq("# HELP lat lat", "# TYPE lat histogram"))
    def line(sub: String) = lines.find(_.startsWith(s"lat$sub")).get
    assert(line("_bucket{le=\"0.005\"").endsWith("} 1 1612325106789"))
    assert(line("_bucket{le=\"0.025\"").endsWith("} 3 1612325106789"))
    assert(line("_bucket{le=\"0.5\"").endsWith("} 4 1612325106789"))
    assert(line("_bucket{le=\"10\"").endsWith("} 5 1612325106789"))
    assert(line("_bucket{le=\"+Inf\"").endsWith("} 6 1612325106789"))
    assert(line("_count").endsWith("} 6 1612325106789"))
    // le sorts among the labels (encode_tags sorts tags + extra together)
    assert(lines.exists(_.startsWith("lat_bucket{le=\"0.005\",svc=\"a\"}")))
  }

  test("prometheus parse: render -> parse round-trips simple families exactly") {
    import spark.implicits._
    val rows = Seq(
      ("hits", "app", "code=200,svc=web", "absolute", "counter", 10.0),
      ("hits", "app", "code=500,svc=web", "absolute", "counter", 2.5),
      ("temp", "", "path=a\"b\\c", "absolute", "gauge", -1.1),
      ("bare", "", "", "absolute", "gauge", 7.0))
    val rendered = expositionLines(rows, None)
    val parsed = Prometheus.parseExposition(
      rendered.zipWithIndex.map { case (l, i) => (l, i.toLong) }
        .toDF("line", "pos"),
      col("line"), lit("s"), col("pos"))
      .select("name", "tags", "kind", "value_type", "value",
        "tstamp_ms", "group_kind")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getDouble(4), r.getLong(5), r.getString(6)))
      .sortBy(t => (t._1, Option(t._2).getOrElse("")))
    // escaped quote and backslash label values round-trip; the bare
    // series parses with null tags; values/timestamps exact
    assert(parsed.toSeq == Seq(
      ("app_hits", "code=200,svc=web", "absolute", "counter", 10.0,
        1612325106789L, "counter"),
      ("app_hits", "code=500,svc=web", "absolute", "counter", 2.5,
        1612325106789L, "counter"),
      ("bare", null, "absolute", "gauge", 7.0, 1612325106789L, "gauge"),
      ("temp", "path=a\"b\\c", "absolute", "gauge", -1.1,
        1612325106789L, "gauge")))
  }

  test("prometheus_scrape source: real scrape to metric rows with honor_labels arms") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val text = Seq(
      "# HELP hits hits",
      "# TYPE hits counter",
      "hits{svc=\"web\"} 10",
      "hits{instance=\"scraped\",svc=\"api\"} 3",
      "# TYPE temp gauge",
      "temp 21.5",
      "").mkString("\n")
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/metrics", (ex: HttpExchange) => {
      val b = text.getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type", "text/plain; version=0.0.4")
      ex.sendResponseHeaders(200, b.length.toLong)
      ex.getResponseBody.write(b)
      ex.close()
    })
    server.start()
    try {
      val ep = s"http://127.0.0.1:${server.getAddress.getPort}/metrics"
      def scrape(extra: String): Seq[(String, String, String, String, Double)] =
        Topology.load(
          s"""
             |[sources.prom]
             |  type = "prometheus_scrape"
             |  endpoints = ["$ep"]
             |$extra
             |""".stripMargin).loadSources(spark)("prom").df
          .select("name", "tags", "kind", "value_type", "value")
          .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
            r.getString(3), r.getDouble(4))).toSeq.sortBy(t => (t._1, t._2))
      val inst = s"127.0.0.1:${server.getAddress.getPort}"
      // default: instance+endpoint stamped, scraped `instance` renamed
      assert(scrape("") == Seq(
        ("hits", s"endpoint=$ep,exported_instance=scraped,instance=$inst,svc=api",
          "absolute", "counter", 3.0),
        ("hits", s"endpoint=$ep,instance=$inst,svc=web",
          "absolute", "counter", 10.0),
        ("temp", s"endpoint=$ep,instance=$inst",
          "absolute", "gauge", 21.5)))
      // honor_labels: the scraped instance label wins, stamp skipped
      assert(scrape("  honor_labels = true") == Seq(
        ("hits", s"endpoint=$ep,instance=$inst,svc=web",
          "absolute", "counter", 10.0),
        ("hits", s"endpoint=$ep,instance=scraped,svc=api",
          "absolute", "counter", 3.0),
        ("temp", s"endpoint=$ep,instance=$inst",
          "absolute", "gauge", 21.5)))
      // the metric frame feeds the metric pipeline (exporter round-trip)
      val frame = Topology.load(
        s"""
           |[sources.prom]
           |  type = "prometheus_scrape"
           |  endpoints = ["$ep"]
           |  instance_tag = ""
           |  endpoint_tag = ""
           |""".stripMargin).loadSources(spark)("prom")
      assert(frame.metric)
      val lines = Prometheus.exposition(frame.df)
        .orderBy("fullname", "ord").select("line")
        .collect().map(_.getString(0)).toSeq
      assert(lines.contains("hits{svc=\"web\"} 10"))
      assert(lines.contains("temp 21.5"))
    } finally server.stop(0)
  }

  test("prometheus_remote_write source: snappy prompb WriteRequest to metric rows") {
    import graft.functions.ProtoWire.Writer
    def utf8(s: String) = s.getBytes("UTF-8")
    def label(n: String, v: String): Array[Byte] = {
      val w = new Writer; w.writeLenDelim(1, utf8(n)); w.writeLenDelim(2, utf8(v))
      w.toBytes
    }
    def sample(v: Double, tms: Long): Array[Byte] = {
      val w = new Writer
      w.writeTag(1, 1).writeFixed64(java.lang.Double.doubleToLongBits(v))
      w.writeTag(2, 0).writeVarint(tms)
      w.toBytes
    }
    def series(name: String, extraLabels: Seq[(String, String)],
               samples: Seq[Array[Byte]]): Array[Byte] = {
      val w = new Writer
      w.writeLenDelim(1, label("__name__", name))
      extraLabels.foreach { case (n, v) => w.writeLenDelim(1, label(n, v)) }
      samples.foreach(s => w.writeLenDelim(2, s))
      w.toBytes
    }
    def metadata(fam: String, mtype: Long): Array[Byte] = {
      val w = new Writer
      w.writeTag(1, 0).writeVarint(mtype); w.writeLenDelim(2, utf8(fam))
      w.toBytes
    }
    val req = new Writer
    req.writeLenDelim(1, series("hits", Seq("svc" -> "web"),
      Seq(sample(10.0, 1612325106000L), sample(12.0, 1612325116000L))))
    req.writeLenDelim(1, series("lat_bucket", Seq("le" -> "0.5"),
      Seq(sample(3.0, 1612325106000L))))
    req.writeLenDelim(1, series("temp", Nil, Seq(sample(21.5, 1612325106000L))))
    req.writeLenDelim(3, metadata("hits", 1L)) // COUNTER
    req.writeLenDelim(3, metadata("lat", 3L))  // HISTOGRAM
    val body = org.xerial.snappy.Snappy.compress(req.toBytes)

    val topo = Topology.load(
      """
        |[sources.rw]
        |  type = "prometheus_remote_write"
        |  address = "127.0.0.1:0"
        |""".stripMargin)
    try {
      val src = topo.loadStreamingSources(spark)
      assert(src("rw").metric)
      val port = topo.ingestListeners.head.boundPort
      val qn = s"rw_src_${System.nanoTime()}"
      val q = src("rw").df.drop(graft.config.Topology.SeqCol).writeStream
        .format("memory").queryName(qn).outputMode("append").start()
      try {
        val client = java.net.http.HttpClient.newHttpClient()
        def post(p: String, b: Array[Byte]): Int = client.send(
          java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://127.0.0.1:$port$p"))
            .header("Content-Encoding", "snappy")
            .POST(java.net.http.HttpRequest.BodyPublishers.ofByteArray(b))
            .build(),
          java.net.http.HttpResponse.BodyHandlers.discarding()).statusCode()
        assert(post("/", body) == 200)
        assert(post("/nope", body) == 404)
        // a series without __name__ is the parser's RequestNoNameLabel
        val bad = new Writer
        bad.writeLenDelim(1, {
          val w = new Writer
          w.writeLenDelim(1, label("svc", "x"))
          w.writeLenDelim(2, sample(1.0, 1L)); w.toBytes
        })
        assert(post("/", org.xerial.snappy.Snappy.compress(bad.toBytes)) == 400)

        val t0 = System.currentTimeMillis()
        while (spark.table(qn).count() < 4 &&
          System.currentTimeMillis() - t0 < 30000) {
          q.processAllAvailable(); Thread.sleep(100)
        }
        val rows = spark.table(qn)
          .selectExpr("name", "kind", "value_type", "value", "tags",
            "CAST(unix_millis(ts) AS BIGINT)")
          .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
            r.getDouble(3), r.getString(4), r.getLong(5)))
          .sortBy(t => (t._1, t._6)).toSeq
        assert(rows == Seq(
          // counter family via metadata; both samples emit
          ("hits", "absolute", "counter", 10.0, "svc=web", 1612325106000L),
          ("hits", "absolute", "counter", 12.0, "svc=web", 1612325116000L),
          // histogram component (suffix-admitted family) -> gauge
          ("lat_bucket", "absolute", "gauge", 3.0, "le=0.5", 1612325106000L),
          // no metadata -> untyped -> gauge
          ("temp", "absolute", "gauge", 21.5, null, 1612325106000L)))
      } finally q.stop()
    } finally topo.closeIngest()
  }

  test("prometheus parse: group association, suffix rules, untyped fallback") {
    import spark.implicits._
    val text = Seq(
      "# TYPE lat histogram",
      "lat_bucket{le=\"0.5\"} 3",
      "lat_bucket{le=\"+Inf\"} 5",
      "lat_sum 1.75",
      "lat_count 5",
      "lat_rate 9", // suffix not admitted by histogram -> own untyped group
      "loose 4",    // no TYPE at all -> untyped
      "# TYPE q summary",
      "q{quantile=\"0.99\"} 1.5",
      "q_count 2",
      "# not a sample",
      "malformed{ 5")
    val parsed = Prometheus.parseExposition(
      text.zipWithIndex.map { case (l, i) => (l, i.toLong) }
        .toDF("line", "pos"),
      col("line"), lit("s"), col("pos"))
      .select("name", "tags", "value_type", "value", "group_name", "group_kind")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getDouble(3), r.getString(4), r.getString(5))).toSeq
      .sortBy(t => (t._1, Option(t._2).getOrElse("")))
    assert(parsed == Seq(
      ("lat_bucket", "le=+Inf", "gauge", 5.0, "lat", "histogram"),
      ("lat_bucket", "le=0.5", "gauge", 3.0, "lat", "histogram"),
      ("lat_count", null, "gauge", 5.0, "lat", "histogram"),
      ("lat_rate", null, "gauge", 9.0, "lat_rate", "untyped"),
      ("lat_sum", null, "gauge", 1.75, "lat", "histogram"),
      ("loose", null, "gauge", 4.0, "loose", "untyped"),
      ("q", "quantile=0.99", "gauge", 1.5, "q", "summary"),
      ("q_count", null, "gauge", 2.0, "q", "summary")))
  }
}
