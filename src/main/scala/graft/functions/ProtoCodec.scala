package graft.functions

import java.nio.charset.StandardCharsets

import scala.util.Try

import org.apache.spark.sql.Column
import org.apache.spark.sql.Row
import org.apache.spark.sql.api.java.UDF1
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._

import ProtoDescriptor._
import ProtoWire.{Reader, WField, Writer}

/** parse_proto / encode_proto — typed protobuf codec over a
  * `FileDescriptorSet` (reference cue `parse_proto.cue` /
  * `encode_proto.cue`, codec config
  * `lib/codecs/src/decoding/format/protobuf.rs`). Built on the
  * self-contained ProtoWire/ProtoDescriptor kernels — no protobuf jar.
  *
  * Spark-first shape: the descriptor is parsed ONCE at plan time
  * (driver), the message type becomes a real `StructType`, and decode is
  * a plain UDF returning that struct — downstream field access is typed
  * and codegen'd, mirroring `from_protobuf`'s UX rather than VRL's
  * dynamic object.
  *
  * Value conventions (documented because the reference delegates them to
  * the external `vrl::protobuf::parse` crate):
  *   - singular scalar missing from the wire -> null (no proto3 default
  *     materialization);
  *   - duplicate singular fields: last occurrence wins for scalars,
  *     occurrences MERGE for embedded messages (both per the proto
  *     encoding spec — merge is implemented as decoding the
  *     concatenated occurrence bytes, the spec's canonical equivalent);
  *   - enum -> the value NAME as string (unknown number -> its decimal
  *     string); encode accepts both the name and a decimal string;
  *   - uint64 decodes into Spark's signed long (two's-complement bits)
  *     — values above 2^63-1 appear negative;
  *   - fixed32/uint32 widen to long (unsigned-safe), sfixed32/sint32/
  *     int32 stay int;
  *   - proto map fields (nested *Entry with map_entry=true) ->
  *     `MapType`; repeated -> `ArrayType`;
  *   - packed and unpacked repeated primitives both decode;
  *   - recursive message types are rejected at plan time (a typed
  *     column cannot be infinitely nested).
  */
object ProtoCodec {

  // ------------------------------------------------------- schema

  private def scalarType(tpe: Int): DataType = tpe match {
    case TDouble => DoubleType
    case TFloat => FloatType
    case TInt64 | TUInt64 | TFixed64 | TSFixed64 | TSInt64 => LongType
    case TUInt32 | TFixed32 => LongType // unsigned 32 widens
    case TInt32 | TSFixed32 | TSInt32 => IntegerType
    case TBool => BooleanType
    case TString => StringType
    case TBytes => BinaryType
    case TEnum => StringType
    case t => throw new IllegalArgumentException(s"unsupported proto field type $t")
  }

  def sparkType(md: MessageD, reg: Registry, seen: Set[String] = Set.empty): StructType = {
    require(!seen(md.fqName), s"recursive message type ${md.fqName} unsupported")
    StructType(md.fields.map { f =>
      val dt =
        if (f.tpe == TMessage) {
          val sub = reg.message(f.typeName)
          if (sub.mapEntry) {
            val k = sub.fields.find(_.number == 1).get
            val v = sub.fields.find(_.number == 2).get
            val vt = if (v.tpe == TMessage) sparkType(reg.message(v.typeName), reg, seen + md.fqName)
                     else scalarType(v.tpe)
            MapType(scalarType(k.tpe), vt)
          } else {
            val st = sparkType(sub, reg, seen + md.fqName)
            if (f.repeated) ArrayType(st) else st
          }
        } else if (f.repeated) ArrayType(scalarType(f.tpe))
        else scalarType(f.tpe)
      StructField(f.name, dt, nullable = true)
    })
  }

  // ------------------------------------------------------- decode

  private def scalarOf(f: FieldD, w: WField, reg: Registry): Any = f.tpe match {
    case TDouble => java.lang.Double.longBitsToDouble(w.num64)
    case TFloat => java.lang.Float.intBitsToFloat(w.num64.toInt)
    case TInt64 | TUInt64 => w.num64
    case TFixed64 | TSFixed64 => w.num64
    case TUInt32 => w.num64 & 0xffffffffL
    case TFixed32 => w.num64 & 0xffffffffL
    case TInt32 => w.num64.toInt
    case TSFixed32 => w.num64.toInt
    case TSInt32 => ProtoWire.zigzagDecode(w.num64).toInt
    case TSInt64 => ProtoWire.zigzagDecode(w.num64)
    case TBool => w.num64 != 0L
    case TString => new String(w.bytes, StandardCharsets.UTF_8)
    case TBytes => w.bytes
    case TEnum =>
      val n = w.num64.toInt
      reg.enum(f.typeName).byNumber.getOrElse(n, n.toString)
    case t => throw new IllegalArgumentException(s"unsupported proto field type $t")
  }

  /** proto3 default for an absent scalar (map keys are integral, bool,
    * or string per the spec — wider scalars included for safety).
    */
  private def defaultOf(f: FieldD): Any = f.tpe match {
    case TDouble => 0.0
    case TFloat => 0.0f
    case TInt64 | TUInt64 | TFixed64 | TSFixed64 | TSInt64 | TUInt32 | TFixed32 => 0L
    case TInt32 | TSFixed32 | TSInt32 => 0
    case TBool => false
    case TString => ""
    case t => throw new IllegalArgumentException(s"no default for proto field type $t")
  }

  /** Concatenated occurrence bytes — the spec-canonical merge form for
    * duplicate singular embedded messages.
    */
  private def mergedBytes(occ: Seq[WField]): Array[Byte] =
    if (occ.length == 1) occ.head.bytes
    else Array.concat(occ.map(_.bytes): _*)

  /** Unpack a packed repeated primitive blob. */
  private def unpack(f: FieldD, bytes: Array[Byte], reg: Registry): Seq[Any] = {
    val r = new Reader(bytes)
    val out = Seq.newBuilder[Any]
    while (r.hasMore) {
      val w = f.tpe match {
        case TDouble | TFixed64 | TSFixed64 => WField(f.number, 1, r.readFixed64(), null)
        case TFloat | TFixed32 | TSFixed32 => WField(f.number, 5, r.readFixed32(), null)
        case _ => WField(f.number, 0, r.readVarint(), null)
      }
      out += scalarOf(f, w, reg)
    }
    out.result()
  }

  private def lenDelimited(f: FieldD): Boolean =
    f.tpe == TString || f.tpe == TBytes || f.tpe == TMessage

  /** Convenience overload (tests / one-off): derives the schema. */
  def decode(bytes: Array[Byte], md: MessageD, reg: Registry): Row =
    decode(bytes, md, reg, sparkType(md, reg))

  def decode(bytes: Array[Byte], md: MessageD, reg: Registry, st: StructType): Row = {
    val byNum = new Reader(bytes).readAll().groupBy(_.number)
    val values = md.fields.zipWithIndex.map { case (f, fi) =>
      val occ = byNum.getOrElse(f.number, Vector.empty)
      def subStruct: StructType = st.fields(fi).dataType match {
        case s: StructType => s
        case ArrayType(s: StructType, _) => s
        case MapType(_, s: StructType, _) => s
        case other => throw new IllegalStateException(s"expected struct, got $other")
      }
      if (occ.isEmpty) null
      else if (f.tpe == TMessage) {
        val sub = reg.message(f.typeName)
        if (sub.mapEntry) {
          val kf = sub.fields.find(_.number == 1).get
          val vf = sub.fields.find(_.number == 2).get
          occ.map { e =>
            val entry = new Reader(e.bytes).readAll().groupBy(_.number)
            // proto3 encoders omit default-valued map keys from the
            // synthetic entry message — an absent key is ""/0/false,
            // never null (a null map key kills the Catalyst row
            // conversion outside the codec's error channel)
            val k = entry.get(1).map(ws => scalarOf(kf, ws.last, reg))
              .getOrElse(defaultOf(kf))
            val v = entry.get(2).map { ws =>
              if (vf.tpe == TMessage)
                decode(mergedBytes(ws), reg.message(vf.typeName), reg, subStruct)
              else scalarOf(vf, ws.last, reg)
            }.orNull
            k -> v
          }.toMap
        } else if (f.repeated) occ.map(e => decode(e.bytes, sub, reg, subStruct))
        // singular embedded message: the spec says duplicate occurrences
        // MERGE (concatenation of the serialized occurrences is the
        // canonical equivalent — scalars take the last value, repeated
        // fields concatenate, nested messages merge recursively);
        // last-occurrence-wins applies to scalar fields only
        else decode(mergedBytes(occ), sub, reg, subStruct)
      } else if (f.repeated) {
        occ.flatMap { w =>
          if (w.wire == 2 && !lenDelimited(f)) unpack(f, w.bytes, reg) // packed
          else Seq(scalarOf(f, w, reg))
        }
      } else scalarOf(f, occ.last, reg)
    }
    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(values.toArray, st)
  }

  // ------------------------------------------------------- encode

  private def writeScalar(w: Writer, f: FieldD, v: Any, reg: Registry): Unit = f.tpe match {
    case TDouble => w.writeTag(f.number, 1).writeFixed64(
      java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
    case TFloat => w.writeTag(f.number, 5).writeFixed32(
      java.lang.Float.floatToIntBits(v.asInstanceOf[Float]).toLong & 0xffffffffL)
    case TInt64 | TUInt64 => w.writeTag(f.number, 0).writeVarint(asLong(v))
    case TInt32 => w.writeTag(f.number, 0).writeVarint(asLong(v)) // sign-extended per spec
    case TUInt32 => w.writeTag(f.number, 0).writeVarint(asLong(v) & 0xffffffffL)
    case TFixed64 | TSFixed64 => w.writeTag(f.number, 1).writeFixed64(asLong(v))
    case TFixed32 | TSFixed32 => w.writeTag(f.number, 5).writeFixed32(asLong(v) & 0xffffffffL)
    case TSInt32 | TSInt64 => w.writeTag(f.number, 0).writeVarint(ProtoWire.zigzagEncode(asLong(v)))
    case TBool => w.writeTag(f.number, 0).writeVarint(if (v.asInstanceOf[Boolean]) 1 else 0)
    case TString => w.writeLenDelim(f.number, v.toString.getBytes(StandardCharsets.UTF_8))
    case TBytes => w.writeLenDelim(f.number, v.asInstanceOf[Array[Byte]])
    case TEnum =>
      val e = reg.enum(f.typeName)
      val n = e.byName.getOrElse(v.toString,
        Try(v.toString.toInt).getOrElse(throw new IllegalArgumentException(
          s"unknown enum value '$v' for ${f.typeName}")))
      w.writeTag(f.number, 0).writeVarint(n.toLong)
    case t => throw new IllegalArgumentException(s"unsupported proto field type $t")
  }

  private def asLong(v: Any): Long = v match {
    case l: Long => l; case i: Int => i.toLong; case s: Short => s.toLong
    case b: Byte => b.toLong; case x => x.toString.toLong
  }

  def encode(row: Row, md: MessageD, reg: Registry): Array[Byte] = {
    val w = new Writer
    md.fields.zipWithIndex.foreach { case (f, i) =>
      // a struct missing a descriptor field simply doesn't emit it
      // (proto3 absent-field semantics); schemaless rows bind by position
      val idx = if (row.schema != null) row.schema.fieldNames.indexOf(f.name)
                else if (i < row.length) i else -1
      if (idx >= 0 && !row.isNullAt(idx)) {
        val v = row.get(idx)
        if (f.tpe == TMessage) {
          val sub = reg.message(f.typeName)
          if (sub.mapEntry) {
            val kf = sub.fields.find(_.number == 1).get
            val vf = sub.fields.find(_.number == 2).get
            v.asInstanceOf[scala.collection.Map[Any, Any]].foreach { case (k, x) =>
              val ew = new Writer
              writeScalar(ew, kf, k, reg)
              if (vf.tpe == TMessage)
                ew.writeLenDelim(2, encode(x.asInstanceOf[Row], reg.message(vf.typeName), reg))
              else writeScalar(ew, vf, x, reg)
              w.writeLenDelim(f.number, ew.toBytes)
            }
          } else if (f.repeated) {
            v.asInstanceOf[scala.collection.Seq[Any]].foreach(x =>
              w.writeLenDelim(f.number, encode(x.asInstanceOf[Row], sub, reg)))
          } else w.writeLenDelim(f.number, encode(v.asInstanceOf[Row], sub, reg))
        } else if (f.repeated) {
          v.asInstanceOf[scala.collection.Seq[Any]].foreach(x => writeScalar(w, f, x, reg))
        } else writeScalar(w, f, v, reg)
      }
    }
    w.toBytes
  }

  // ------------------------------------------------------- Column API

  /** parse_proto: binary payload -> typed struct per the descriptor.
    * Malformed payloads -> null (dropped channel), mirroring the codec
    * family's error convention.
    */
  def parseProto(c: Column, descSet: Array[Byte], messageType: String): Column = {
    val reg = ProtoDescriptor.parse(descSet)
    val md = reg.message(messageType)
    val dt = sparkType(md, reg)
    udf(new UDF1[Array[Byte], Row] {
      override def call(b: Array[Byte]): Row =
        if (b == null) null else Try(decode(b, md, reg, dt)).getOrElse(null)
    }, dt).apply(c)
  }

  /** encode_proto: struct -> binary payload per the descriptor. */
  def encodeProto(c: Column, descSet: Array[Byte], messageType: String): Column = {
    val reg = ProtoDescriptor.parse(descSet)
    val md = reg.message(messageType)
    sparkType(md, reg) // plan-time validation (incl. recursion check)
    udf(new UDF1[Row, Array[Byte]] {
      override def call(r: Row): Array[Byte] =
        if (r == null) null else encode(r, md, reg)
    }, BinaryType).apply(c)
  }
}
