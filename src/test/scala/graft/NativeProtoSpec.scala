package graft

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.functions._

import graft.functions.NativeProto

/** The `native` (protobuf) codec proven equivalent to `native_json` over
  * the reference's OWN paired fixture corpus: for every
  * `native_encoding/proto/NNNN.pb` there is a `json/NNNN.json` holding
  * the same event — the reference generated both from one event stream
  * (README in that directory). Decoding the proto frame must yield the
  * same envelope tree as the json line.
  *
  * Tree comparison is semantic: integral numbers compare as BigInteger
  * (u64 counts exceed i64), other numbers as exact doubles (both sides
  * are shortest-repr renderings of the same f64), everything else
  * strictly — so float text differences (Rust ryu vs Jackson) can't
  * false-pass or false-fail.
  */
class NativeProtoSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()
  private val protoDir = Paths.get(
    "/root/reference/lib/codecs/tests/data/native_encoding/proto")
  private val jsonDir = Paths.get(
    "/root/reference/lib/codecs/tests/data/native_encoding/json")

  private def sameTree(a: JsonNode, b: JsonNode, path: String): Option[String] = {
    if (a.isNumber && b.isNumber) {
      if (a.isIntegralNumber && b.isIntegralNumber) {
        if (a.bigIntegerValue() == b.bigIntegerValue()) None
        else Some(s"$path: ${a.bigIntegerValue()} != ${b.bigIntegerValue()}")
      } else if (a.isIntegralNumber != b.isIntegralNumber) {
        Some(s"$path: numeric kind ${a.getNodeType}/${a.isIntegralNumber} vs ${b.isIntegralNumber} ($a vs $b)")
      } else if (java.lang.Double.doubleToLongBits(a.asDouble()) ==
                 java.lang.Double.doubleToLongBits(b.asDouble())) None
      else Some(s"$path: double $a != $b")
    } else if (a.getNodeType != b.getNodeType) {
      Some(s"$path: ${a.getNodeType} vs ${b.getNodeType} ($a vs $b)")
    } else if (a.isObject) {
      val ka = scala.jdk.CollectionConverters.IteratorHasAsScala(a.fieldNames()).asScala.toSet
      val kb = scala.jdk.CollectionConverters.IteratorHasAsScala(b.fieldNames()).asScala.toSet
      if (ka != kb) Some(s"$path: keys $ka vs $kb")
      else ka.iterator.map(k => sameTree(a.get(k), b.get(k), s"$path.$k"))
        .collectFirst { case Some(e) => e }
    } else if (a.isArray) {
      if (a.size != b.size) Some(s"$path: size ${a.size} vs ${b.size}")
      else (0 until a.size).iterator.map(i => sameTree(a.get(i), b.get(i), s"$path[$i]"))
        .collectFirst { case Some(e) => e }
    } else if (a == b) None
    else Some(s"$path: $a != $b")
  }

  private lazy val pairs: Seq[(String, Array[Byte], String)] = {
    import scala.jdk.CollectionConverters._
    Files.list(protoDir).iterator().asScala
      .filter(p => p.toString.endsWith(".pb"))
      .map { p =>
        val name = p.getFileName.toString.stripSuffix(".pb")
        (name, Files.readAllBytes(p),
          new String(Files.readAllBytes(jsonDir.resolve(s"$name.json")), "UTF-8").trim)
      }.toSeq.sortBy(_._1)
  }

  test("native proto decode == native_json over the reference's paired fixture corpus") {
    assume(Files.isDirectory(protoDir), "reference corpus not present")
    assert(pairs.size >= 1000)
    val failures = pairs.flatMap { case (name, pb, jsonLine) =>
      val got = scala.util.Try(NativeProto.decodeToNode(pb))
      got.toOption match {
        case None => Some(s"$name: decode threw ${got.failed.get.getMessage}")
        case Some(node) => sameTree(node, mapper.readTree(jsonLine), name)
      }
    }
    // The corpus itself is not perfectly consistent: the reference's own
    // cross-format test (`current_native_decoding_matches`,
    // lib/codecs/tests/native.rs:164-167) is #[ignore]d citing
    // vectordotdev/vector#18570, and a handful of sketch fixtures carry
    // sum/avg in the json file that the .pb never encoded (verified at
    // the wire level: e.g. 0605.pb's AgentDDSketch holds only min/max).
    // This spec is strictly TIGHTER than the reference's (ignored) test:
    // every fixture must match except those known sketch sum/avg leaves,
    // and the allowance is bounded.
    val knownCorpusGap = """.*\.metric\.sketch\.sketch\.AgentDDSketch\.(sum|avg): .*""".r
    val real = failures.filterNot(f => knownCorpusGap.pattern.matcher(f).matches())
    assert(real.isEmpty,
      s"${real.size} of ${pairs.size} fixtures diverged beyond the known corpus gap; first 5:\n" +
        real.take(5).mkString("\n"))
    assert(failures.size <= 8,
      s"known sketch sum/avg corpus gap grew: ${failures.size} fixtures\n" +
        failures.take(10).mkString("\n"))
  }

  test("older proto generations (pre-v24/34/41) decode against their paired json — forward compatibility") {
    assume(Files.isDirectory(protoDir), "reference corpus not present")
    import scala.jdk.CollectionConverters._
    Seq("pre-v24", "pre-v34", "pre-v41").foreach { gen =>
      val pDir = protoDir.resolve(gen); val jDir = jsonDir.resolve(gen)
      assume(Files.isDirectory(pDir) && Files.isDirectory(jDir), s"$gen absent")
      val genPairs = Files.list(pDir).iterator().asScala
        .filter(_.toString.endsWith(".pb"))
        .map { p =>
          val name = p.getFileName.toString.stripSuffix(".pb")
          (s"$gen/$name", Files.readAllBytes(p),
            new String(Files.readAllBytes(jDir.resolve(s"$name.json")), "UTF-8").trim)
        }.toSeq
      assert(genPairs.size >= 500, s"$gen: only ${genPairs.size} pairs")
      val knownCorpusGap =
        """.*\.metric\.sketch\.sketch\.AgentDDSketch\.(sum|avg): .*""".r
      val failures = genPairs.flatMap { case (name, pb, jsonLine) =>
        scala.util.Try(NativeProto.decodeToNode(pb))
          .fold(e => Some(s"$name: threw ${e.getMessage}"),
            node => sameTree(node, mapper.readTree(jsonLine), name))
      }.filterNot(f => knownCorpusGap.pattern.matcher(f).matches())
        // pre-v41/0000's .pb holds a METRIC while its .json holds a log —
        // a generation artifact of the corpus itself (the .pb's first
        // byte is an EventArray field-2 MetricArray tag); the reference
        // #[ignore]s pre_v41_native_decoding_matches entirely
        .filterNot(_.startsWith("pre-v41/0000: keys "))
      assert(failures.isEmpty,
        s"$gen: ${failures.size} diverged; first 5:\n" + failures.take(5).mkString("\n"))
    }
  }

  test("native proto encode round-trip: decode(encode(decode(pb))) over the corpus") {
    assume(Files.isDirectory(protoDir), "reference corpus not present")
    val failures = pairs.flatMap { case (name, pb, _) =>
      scala.util.Try {
        val tree = NativeProto.decodeToNode(pb)
        val rt = NativeProto.decodeToNode(
          NativeProto.encodeFromJson(mapper.writeValueAsString(tree)))
        sameTree(rt, tree, name)
      }.fold(e => Some(s"$name: threw ${e.getMessage}"), identity)
    }
    assert(failures.isEmpty,
      s"${failures.size} round-trip failures; first 5:\n" + failures.take(5).mkString("\n"))
  }

  test("bare tags survive an encode round-trip as null, not the string \"null\"") {
    val line = """{"metric":{"name":"m","kind":"absolute","tags":{"env":null,"region":"us"},"counter":{"value":1.0}}}"""
    val rt = NativeProto.decodeToNode(NativeProto.encodeFromJson(line))
    val tags = rt.get("metric").get("tags")
    assert(tags.get("env").isNull, s"bare tag corrupted to ${tags.get("env")}")
    assert(tags.get("region").asText() == "us")
  }

  test("distributed Column API: native frames decode to classified native_json lines") {
    assume(Files.isDirectory(protoDir), "reference corpus not present")
    val df = pairs.take(200).map { case (n, pb, _) => (n, pb) }.toDF("name", "frame")
      .repartition(8)
    val out = df.select(explode(NativeProto.decodeNative(col("frame"))).as("line"))
    assert(out.filter(col("line").isNull).count() == 0)
    val kinds = out.select(graft.functions.NativeJson.eventKind(col("line")).as("k"))
      .groupBy("k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!kinds.contains(null) && kinds.values.sum == 200)
  }
}
