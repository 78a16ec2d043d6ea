package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{ArrowCodec, AvroCodec}

/** Avro single-datum codec + Arrow IPC stream codec — pinned against the
  * reference's own vectors and framing rules, not just round-trips.
  */
class CodecBinarySpec extends SparkSpec {
  import spark.implicits._

  // ===================================================== avro

  private val fooSchema =
    """{"type":"record","name":"Log","fields":[{"name":"foo","type":["string"]}]}"""

  test("avro: reference serializer vector — {foo:bar} -> \\0 \\x06 bar (encoding/format/avro.rs:91-115)") {
    val out = Seq(("bar")).toDF("foo")
      .select(AvroCodec.encodeAvro(struct(col("foo")), fooSchema).as("b"))
      .head.getAs[Array[Byte]]("b")
    assert(out.toSeq == Seq(0.toByte, 6.toByte) ++ "bar".getBytes(StandardCharsets.UTF_8))
  }

  private val richSchema =
    """{"type":"record","name":"Turn","fields":[
      {"name":"tag","type":"string"},
      {"name":"n","type":"long"},
      {"name":"score","type":"double"},
      {"name":"ok","type":"boolean"},
      {"name":"note","type":["null","string"],"default":null},
      {"name":"ids","type":{"type":"array","items":"long"}},
      {"name":"attrs","type":{"type":"map","values":"string"}}
    ]}"""

  test("avro: typed round-trip incl. nullable union, array, map") {
    val df = Seq(
      ("a", 1L, 1.5, true, Some("x"), Seq(1L, 2L), Map("k" -> "v")),
      ("b", -3L, -0.25, false, None: Option[String], Seq.empty[Long], Map.empty[String, String])
    ).toDF("tag", "n", "score", "ok", "note", "ids", "attrs")
    val rt = df
      .select(AvroCodec.encodeAvro(
        struct(col("tag"), col("n"), col("score"), col("ok"), col("note"), col("ids"), col("attrs")),
        richSchema).as("datum"))
      .select(AvroCodec.parseAvro(col("datum"), richSchema).as("r"))
      .select("r.*")
      .orderBy("tag")
      .collect()
    assert(rt(0) == Row("a", 1L, 1.5, true, "x", Seq(1L, 2L), Map("k" -> "v")))
    assert(rt(1) == Row("b", -3L, -0.25, false, null, Seq(), Map()))
  }

  test("avro: empty bytes decode to no event (decoding/format/avro.rs:139-141)") {
    val r = Seq(Array.empty[Byte]).toDF("b")
      .select(AvroCodec.parseAvro(col("b"), fooSchema).as("r")).head
    assert(r.isNullAt(0))
  }

  test("avro: confluent schema-id prefix strip + missing-magic error (avro.rs:20-21,143-155)") {
    val datum = AvroCodec.encodeDatum(Row("bar"), fooSchema)
    val prefixed = Array[Byte](0, 0, 0, 0, 42) ++ datum
    val df = Seq(("good", prefixed), ("bad", datum)).toDF("k", "b")
    val out = df.select(col("k"),
        AvroCodec.parseAvro(col("b"), fooSchema, stripSchemaIdPrefix = true).as("r"))
      .collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(out("good") == Row("bar"))
    // 'bar' datum starts 0x00 (union index) so it LOOKS prefixed but the
    // remainder is not a valid datum -> dropped (null), not a wrong value
    assert(out("bad") == null)
  }

  test("avro: malformed datum decodes to null (dropped channel), not an exception") {
    val r = Seq(Array[Byte](9, 9, 9)).toDF("b")
      .select(AvroCodec.parseAvro(col("b"), richSchema).as("r")).head
    assert(r.isNullAt(0))
  }

  // ===================================================== arrow

  private val turnSchema = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("latency", DoubleType, nullable = true),
    StructField("ok", BooleanType, nullable = true),
    StructField("payload", BinaryType, nullable = true),
    StructField("ts", TimestampType, nullable = true)))

  private def turnRows(n: Int): Seq[Row] = (0 until n).map { i =>
    Row(s"c${i % 7}", i,
      if (i % 5 == 0) null else i * 0.5,
      if (i % 11 == 0) null else i % 2 == 0,
      if (i % 3 == 0) null else Array[Byte](i.toByte, (i + 1).toByte),
      java.time.Instant.ofEpochSecond(1700000000L + i, (i % 1000) * 1000L))
  }

  test("arrow: stream framing — no file magic, EOS marker, schema-first (arrow.rs:1-6)") {
    val blob = ArrowCodec.encodeOne(turnRows(3), turnSchema)
    // stream format starts with the 0xFFFFFFFF continuation marker of the
    // schema message, NOT the 'ARROW1' file magic
    assert(blob.take(4).toSeq == Seq(-1, -1, -1, -1).map(_.toByte))
    assert(!new String(blob.take(6), StandardCharsets.US_ASCII).startsWith("ARROW1"))
    // ends with the 8-byte end-of-stream marker ff ff ff ff 00 00 00 00
    assert(blob.takeRight(8).toSeq ==
      Seq(-1, -1, -1, -1, 0, 0, 0, 0).map(_.toByte))
  }

  test("arrow: encode/decode round-trip with nulls, binary, timestamps") {
    val rows = turnRows(50)
    val blob = ArrowCodec.encodeOne(rows, turnSchema)
    val back = ArrowCodec.decodeOne(blob, turnSchema).toSeq
    assert(back.size == rows.size)
    rows.zip(back).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(a.getInt(1) == b.getInt(1))
      assert(a.get(2) == b.get(2))
      assert(a.get(3) == b.get(3))
      assert(Option(a.get(4)).map(_.asInstanceOf[Array[Byte]].toSeq) ==
        Option(b.get(4)).map(_.asInstanceOf[Array[Byte]].toSeq))
      assert(a.get(5) == b.get(5))
    }
  }

  test("avro: multi-branch unions are rejected at schema mapping, not narrowed to branch 1") {
    // ["int","string"] has no single Spark column type; picking the
    // first branch would let string-branch datums through decode and
    // kill the job in the Catalyst conversion
    val unionSchema =
      """{"type":"record","name":"U","fields":[{"name":"v","type":["int","string"]}]}"""
    val e = intercept[IllegalArgumentException] {
      Seq(Array.empty[Byte]).toDF("b").select(AvroCodec.parseAvro(col("b"), unionSchema))
    }
    assert(e.getMessage.contains("union"))
  }

  test("arrow: pre-epoch fractional-second timestamps round-trip exactly") {
    // truncating division on java.sql.Timestamp.getTime shifted
    // 1969-12-31T23:59:59.5Z one full second late
    val st = StructType(Seq(StructField("ts", TimestampType, nullable = true)))
    val t = new java.sql.Timestamp(-500L) // -0.5 s from epoch
    val blob = ArrowCodec.encodeOne(Seq(Row(t)), st)
    val back = ArrowCodec.decodeOne(blob, st).toSeq
    val micros = back.head.get(0) match {
      case i: java.time.Instant => i.getEpochSecond * 1000000L + i.getNano / 1000L
      case x: java.sql.Timestamp =>
        Math.floorDiv(x.getTime, 1000L) * 1000000L + x.getNanos / 1000L
    }
    assert(micros == -500000L, s"got $micros µs")
  }

  test("arrow: null blobs are a dropped channel in decodeStream, not an NPE") {
    val st = StructType(Seq(StructField("v", LongType, nullable = true)))
    val good = ArrowCodec.encodeOne(Seq(Row(7L), Row(8L)), st)
    val out = Seq(Some(good), None).toDF("b")
      .select(col("b").cast("binary").as("b"))
    val decoded = ArrowCodec.decodeStream(out, "b", st).collect()
    assert(decoded.map(_.getLong(0)).sorted.toSeq == Seq(7L, 8L))
  }

  test("arrow: empty batch is an error (arrow.rs NoEvents)") {
    intercept[IllegalArgumentException] {
      ArrowCodec.encodeOne(Seq.empty, turnSchema)
    }
  }

  test("arrow: null in non-nullable field is an error (arrow.rs NullConstraint)") {
    val st = StructType(Seq(StructField("a", StringType, nullable = false)))
    intercept[IllegalArgumentException] {
      ArrowCodec.encodeOne(Seq(Row(null)), st)
    }
  }

  test("arrow: distributed encodeStream/decodeStream round-trip, batch bounding") {
    val n = 1000
    val df = spark.range(n).selectExpr(
      "concat('c', id % 13) as conv_id",
      "cast(id as int) as turn_idx",
      "if(id % 7 = 0, null, cast(id as double) * 0.25d) as latency",
      "id % 2 = 0 as ok",
      "cast(null as binary) as payload",
      "timestamp_micros(1700000000000000 + id * 1000000) as ts")
      .repartition(4)
    val encoded = ArrowCodec.encodeStream(df, batchSize = 64).cache()
    val sizes = encoded.select("n_rows").as[Int].collect()
    assert(sizes.sum == n)
    assert(sizes.forall(_ <= 64)) // batch size bound holds per blob
    assert(sizes.length >= 16)    // 4 partitions x ceil(250/64)
    val st = StructType(turnSchema.fields.map(f =>
      if (f.name == "conv_id" || f.name == "turn_idx") f.copy(nullable = true) else f))
    val back = ArrowCodec.decodeStream(encoded, "arrow_ipc", st)
    assert(back.count() == n)
    val a = df.orderBy("turn_idx").collect()
    val b = back.orderBy("turn_idx").collect()
    a.zip(b).foreach { case (x, y) =>
      assert(x.getString(0) == y.getString(0))
      assert(x.get(2) == y.get(2))
      assert(x.get(5) == y.get(5))
    }
    encoded.unpersist()
  }

  test("arrow: decoded blobs are readable as one logical stream per blob (multi-batch decode)") {
    // two batches concatenated by encodeStream produce two independent
    // streams; decodeOne of a single blob must also handle a stream that
    // itself carries >1 record batch
    val rows = turnRows(10)
    val b1 = ArrowCodec.encodeOne(rows.take(4), turnSchema)
    val back = ArrowCodec.decodeOne(b1, turnSchema).toSeq
    assert(back.map(_.getString(0)) == rows.take(4).map(_.getString(0)))
  }
}
