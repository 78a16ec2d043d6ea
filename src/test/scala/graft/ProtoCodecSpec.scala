package graft

import java.nio.charset.StandardCharsets
import java.util.Base64

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.{ProtoCodec, ProtoDescriptor, ProtoWire}
import graft.functions.ProtoDescriptor._
import graft.functions.ProtoWire.Writer

/** parse_proto / encode_proto over the self-contained wire +
  * descriptor kernels. The descriptor set used here is BUILT with our
  * own wire writer from descriptor.proto's public field numbers — so the
  * spec exercises writer, descriptor parser, schema mapping, decoder and
  * encoder together, with the reference's own `parse_proto.cue` example
  * payload as the cross-implementation pin.
  */
class ProtoCodecSpec extends SparkSpec {
  import spark.implicits._

  // ---- a FileDescriptorSet for the addressbook-style test_protobuf ----

  private def utf8(s: String) = s.getBytes(StandardCharsets.UTF_8)

  private def fdp(name: String, number: Int, label: Int, tpe: Int,
                  typeName: String = ""): Array[Byte] = {
    val w = new Writer
    w.writeLenDelim(1, utf8(name))
    w.writeTag(3, 0).writeVarint(number.toLong)
    w.writeTag(4, 0).writeVarint(label.toLong)
    w.writeTag(5, 0).writeVarint(tpe.toLong)
    if (typeName.nonEmpty) w.writeLenDelim(6, utf8(typeName))
    w.toBytes
  }

  private def enumD(name: String, values: (String, Int)*): Array[Byte] = {
    val w = new Writer
    w.writeLenDelim(1, utf8(name))
    values.foreach { case (vn, num) =>
      val ev = new Writer
      ev.writeLenDelim(1, utf8(vn))
      ev.writeTag(2, 0).writeVarint(num.toLong)
      w.writeLenDelim(2, ev.toBytes)
    }
    w.toBytes
  }

  private def message(name: String, fields: Seq[Array[Byte]],
                      nested: Seq[Array[Byte]] = Nil,
                      mapEntry: Boolean = false): Array[Byte] = {
    val w = new Writer
    w.writeLenDelim(1, utf8(name))
    fields.foreach(w.writeLenDelim(2, _))
    nested.foreach(w.writeLenDelim(3, _))
    if (mapEntry) {
      val opt = new Writer; opt.writeTag(7, 0).writeVarint(1L)
      w.writeLenDelim(7, opt.toBytes)
    }
    w.toBytes
  }

  private val descSet: Array[Byte] = {
    val phoneNumber = message("PhoneNumber", Seq(
      fdp("number", 1, 1, TString),
      fdp("type", 2, 1, TEnum, ".test_protobuf.PhoneType")))
    val attrsEntry = message("AttrsEntry", Seq(
      fdp("key", 1, 1, TString),
      fdp("value", 2, 1, TInt64)), mapEntry = true)
    val person = message("Person", Seq(
      fdp("name", 1, 1, TString),
      fdp("id", 2, 1, TInt32),
      fdp("email", 3, 1, TString),
      fdp("phones", 4, 3, TMessage, ".test_protobuf.Person.PhoneNumber"),
      fdp("scores", 5, 3, TSInt64),
      fdp("ratio", 6, 1, TDouble),
      fdp("attrs", 7, 3, TMessage, ".test_protobuf.Person.AttrsEntry"),
      fdp("blob", 8, 1, TBytes)),
      nested = Seq(phoneNumber, attrsEntry))
    val file = {
      val w = new Writer
      w.writeLenDelim(1, utf8("test.proto"))
      w.writeLenDelim(2, utf8("test_protobuf"))
      w.writeLenDelim(4, person)
      w.writeLenDelim(5, enumD("PhoneType", "MOBILE" -> 0, "HOME" -> 1, "WORK" -> 2))
      w.toBytes
    }
    val set = new Writer
    set.writeLenDelim(1, file).toBytes
  }

  private val reg = ProtoDescriptor.parse(descSet)
  private val personMd = reg.message("test_protobuf.Person")

  test("descriptor parser resolves packages, nesting, enums and map entries") {
    assert(personMd.fields.map(_.name) ==
      Seq("name", "id", "email", "phones", "scores", "ratio", "attrs", "blob"))
    assert(reg.message("test_protobuf.Person.AttrsEntry").mapEntry)
    assert(reg.enum("test_protobuf.PhoneType").byNumber(2) == "WORK")
    val st = ProtoCodec.sparkType(personMd, reg)
    assert(st.simpleString ==
      "struct<name:string,id:int,email:string,phones:array<struct<number:string,type:string>>," +
      "scores:array<bigint>,ratio:double,attrs:map<string,bigint>,blob:binary>")
  }

  test("parse_proto.cue example payload decodes to {name: someone, phones: [{number: 123456}]}") {
    val payload = Base64.getDecoder.decode("Cgdzb21lb25lIggKBjEyMzQ1Ng==")
    val r = ProtoCodec.decode(payload, personMd, reg)
    assert(r.getAs[String]("name") == "someone")
    assert(r.isNullAt(r.fieldIndex("id")) || r.getAs[Any]("id") == null)
    val phones = r.getAs[Seq[Row]]("phones")
    assert(phones.map(_.getAs[String]("number")) == Seq("123456"))
  }

  test("encode -> decode round-trip: enum names, zigzag, map, bytes, double") {
    val row = Row("ada", 7, "a@b.c",
      Seq(Row("555", "WORK"), Row("556", "MOBILE")),
      Seq(-3L, 0L, 12L), 2.5,
      Map("x" -> 1L, "y" -> -2L), Array[Byte](1, 2, 3))
    val bytes = ProtoCodec.encode(row, personMd, reg)
    val back = ProtoCodec.decode(bytes, personMd, reg)
    assert(back.getAs[String]("name") == "ada")
    assert(back.getAs[Int]("id") == 7)
    assert(back.getAs[Seq[Row]]("phones").map(p =>
      (p.getString(0), p.getString(1))) == Seq(("555", "WORK"), ("556", "MOBILE")))
    assert(back.getAs[Seq[Long]]("scores") == Seq(-3L, 0L, 12L))
    assert(back.getAs[Double]("ratio") == 2.5)
    assert(back.getAs[Map[String, Long]]("attrs") == Map("x" -> 1L, "y" -> -2L))
    assert(back.getAs[Array[Byte]]("blob").toSeq == Seq[Byte](1, 2, 3))
  }

  test("packed repeated primitives decode (proto3 default encoding)") {
    // scores (field 5, sint64) packed: one len-delim blob of zigzag varints
    val w = new Writer
    w.writeLenDelim(5, {
      val p = new Writer
      Seq(-3L, 0L, 12L).foreach(v => p.writeVarint(ProtoWire.zigzagEncode(v)))
      p.toBytes
    })
    val r = ProtoCodec.decode(w.toBytes, personMd, reg)
    assert(r.getAs[Seq[Long]]("scores") == Seq(-3L, 0L, 12L))
  }

  test("singular duplicate: last occurrence wins (proto spec)") {
    val w = new Writer
    w.writeLenDelim(1, utf8("first")).writeLenDelim(1, utf8("second"))
    assert(ProtoCodec.decode(w.toBytes, personMd, reg).getAs[String]("name") == "second")
  }

  test("map entry with an omitted default key decodes to \"\" (proto3), not null") {
    // conformant proto3 encoders omit default-valued map keys from the
    // synthetic entry message; a null Scala map key would kill the
    // Catalyst row conversion outside the codec's null error channel
    val entry = new Writer; entry.writeTag(2, 0).writeVarint(9L)
    val w = new Writer; w.writeLenDelim(7, entry.toBytes)
    val r = ProtoCodec.decode(w.toBytes, personMd, reg)
    assert(r.getAs[Map[String, Long]]("attrs") == Map("" -> 9L))
  }

  test("singular embedded message: duplicate occurrences MERGE (proto spec)") {
    // last-wins applies to scalars only; message occurrences merge —
    // scalars take the later value, repeated fields concatenate
    val inner = message("Inner", Seq(
      fdp("a", 1, 1, TString), fdp("b", 2, 1, TInt32), fdp("rep", 3, 3, TSInt64)))
    val outer = message("Outer", Seq(
      fdp("m", 1, 1, TMessage, ".t2.Outer.Inner")), nested = Seq(inner))
    val file = {
      val w = new Writer
      w.writeLenDelim(1, utf8("t2.proto")); w.writeLenDelim(2, utf8("t2"))
      w.writeLenDelim(4, outer); w.toBytes
    }
    val reg2 = ProtoDescriptor.parse(new Writer().writeLenDelim(1, file).toBytes)
    val md = reg2.message("t2.Outer")
    val m1 = new Writer
    m1.writeLenDelim(1, utf8("first"))
    m1.writeTag(2, 0).writeVarint(1L)
    m1.writeTag(3, 0).writeVarint(ProtoWire.zigzagEncode(5L))
    val m2 = new Writer
    m2.writeLenDelim(1, utf8("second"))
    m2.writeTag(3, 0).writeVarint(ProtoWire.zigzagEncode(6L))
    val w = new Writer
    w.writeLenDelim(1, m1.toBytes).writeLenDelim(1, m2.toBytes)
    val m = ProtoCodec.decode(w.toBytes, md, reg2).getAs[Row]("m")
    assert(m.getAs[String]("a") == "second")         // scalar: last wins
    assert(m.getAs[Int]("b") == 1)                   // kept from occurrence 1
    assert(m.getAs[Seq[Long]]("rep") == Seq(5L, 6L)) // repeated: concatenated
  }

  test("length varint with bits above 2^31 errors instead of aliasing to a small read") {
    val w = new Writer
    w.writeTag(1, 2).writeVarint(0x100000005L) // would alias to 5 after .toInt
    val bytes = w.toBytes ++ Array.fill(5)(0x61.toByte)
    val e = intercept[IllegalArgumentException](new ProtoWire.Reader(bytes).readAll())
    assert(e.getMessage.contains("truncated"))
  }

  test("distributed Column API: parse/encode through a DataFrame, malformed -> null") {
    val payload = Base64.getDecoder.decode("Cgdzb21lb25lIggKBjEyMzQ1Ng==")
    val df = Seq(("ok", payload), ("bad", Array[Byte](0x22, 0x7f)))
      .toDF("k", "b").repartition(2)
    val out = df.select(col("k"),
        ProtoCodec.parseProto(col("b"), descSet, "test_protobuf.Person").as("p"))
      .select(col("k"), col("p.name"), col("p.phones")(0).getField("number").as("num"))
      .collect().map(r => r.getString(0) -> (r.get(1), r.get(2))).toMap
    assert(out("ok") == (("someone", "123456")))
    assert(out("bad") == ((null, null)))

    // encode side: build the cue payload from a struct column
    val enc = spark.range(1).select(
        ProtoCodec.encodeProto(
          struct(
            lit("someone").as("name"),
            lit(null).cast("int").as("id"),
            lit(null).cast("string").as("email"),
            array(struct(lit("123456").as("number"),
              lit(null).cast("string").as("type"))).as("phones"),
            lit(null).cast("array<bigint>").as("scores"),
            lit(null).cast("double").as("ratio"),
            lit(null).cast("map<string,bigint>").as("attrs"),
            lit(null).cast("binary").as("blob")),
          descSet, "test_protobuf.Person").as("b"))
      .head.getAs[Array[Byte]]("b")
    assert(Base64.getEncoder.encodeToString(enc) == "Cgdzb21lb25lIggKBjEyMzQ1Ng==")
  }

  test("VRL front-end: parse_proto/encode_proto from a config program (parse_proto.cue example)") {
    // the cue-example Person shape exactly (no bytes field — the VRL
    // boundary rejects those; the Scala API carries them)
    val slim = message("Person", Seq(
      fdp("name", 1, 1, TString),
      fdp("phones", 4, 3, TMessage, ".cuex.Person.PhoneNumber")),
      nested = Seq(message("PhoneNumber", Seq(fdp("number", 1, 1, TString)))))
    val file = {
      val w = new Writer
      w.writeLenDelim(1, utf8("cuex.proto"))
      w.writeLenDelim(2, utf8("cuex"))
      w.writeLenDelim(4, slim)
      w.toBytes
    }
    val descPath = java.nio.file.Files.createTempFile("graft-cuex", ".desc")
    java.nio.file.Files.write(descPath, new Writer().writeLenDelim(1, file).toBytes)

    val topo = graft.config.Topology.load(
      s"""
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '''
        |    .p = parse_proto!(decode_base64!(.payload), "$descPath", "cuex.Person")
        |    .rt = encode_base64(encode_proto!(.p, "$descPath", "cuex.Person"))
        |  '''
        |[[tests]]
        |  name = "proto"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      payload = "Cgdzb21lb25lIggKBjEyMzQ1Ng=="
        |  [[tests.outputs]]
        |    extract_from = "t"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = '''
        |        assert_eq!(.p.name, "someone")
        |        assert_eq!(.rt, "Cgdzb21lb25lIggKBjEyMzQ1Ng==")
        |      '''
        |""".stripMargin)
    val rs = graft.config.UnitTestHarness.run(spark, topo)
    assert(rs.head.errors.isEmpty && rs.head.skipped.isEmpty,
      (rs.head.errors ++ rs.head.skipped).mkString("; "))
    java.nio.file.Files.deleteIfExists(descPath)
  }

  test("unknown message type raises the reference's error contract") {
    val e = intercept[IllegalArgumentException] {
      ProtoCodec.parseProto(lit(Array[Byte]()), descSet, "nope.Missing")
    }
    assert(e.getMessage.contains("does not exist in the descriptor file"))
  }
}
