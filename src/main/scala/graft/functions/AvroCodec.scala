package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._
import scala.util.Try

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.Column
import org.apache.spark.sql.Row
import org.apache.spark.sql.api.java.UDF1
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._

/** Apache Avro single-datum codec (reference
  * `lib/codecs/src/encoding/format/avro.rs:68-78` and
  * `decoding/format/avro.rs:130-185`).
  *
  * Semantics mirrored from the reference:
  *   - The wire form is a BARE BINARY DATUM against a JSON-string schema —
  *     no object-container file, no header, no schema fingerprint
  *     (`to_avro_datum` / `from_avro_datum`).
  *   - Decode of EMPTY bytes yields no event (avro `null` ~ "no value") —
  *     here a null struct (decoding/format/avro.rs:139-141).
  *   - `strip_schema_id_prefix`: Confluent wire format prefixes the datum
  *     with magic byte 0x00 + a 4-byte schema id; when enabled the 5-byte
  *     prefix is stripped, and bytes NOT carrying the magic byte are an
  *     error (avro.rs:143-155) — here the dropped-channel convention, a
  *     null result.
  *   - Unsupported avro branches (decimal/duration/fixed/date/time-millis,
  *     avro.rs:94-101) are rejected at schema-mapping time.
  *
  * Spark-first shape: the schema string is parsed ONCE per executor JVM
  * (ConcurrentHashMap keyed by schema text, same pattern as the
  * validate_json_schema kernel), the record structure comes in/out as a
  * native Spark struct column, and both directions are plain codegen'd
  * UDF calls — no driver involvement, so the codec scales with the scan.
  *
  * This replaces the jar-gated `Parsers.fromAvro/toAvro` sql-api binding
  * (spark-avro module absent in this sandbox): the kernel below speaks
  * the same datum format directly via avro-java 1.12 (on the Spark
  * classpath), so the codec is exercisable — and oracle-gated — here.
  */
object AvroCodec {

  // ---- schema handling -------------------------------------------------

  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[String, Schema]()

  private def schemaOf(json: String): Schema =
    schemaCache.computeIfAbsent(json, j => new Schema.Parser().parse(j))

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION && s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  /** The single non-null branch of a union (the reference resolves the
    * value against the union the same way: one concrete branch + null).
    * Unions with MORE than one concrete branch have no single Spark
    * column type — silently picking the first branch would let a datum
    * written with another branch through decode and kill the job in
    * the Catalyst conversion (outside the codec's null error channel),
    * so they are rejected here with the other documented exclusions.
    */
  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION) {
      val concrete = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      if (concrete.length > 1)
        throw new IllegalArgumentException(
          s"unsupported avro union with ${concrete.length} concrete branches: $s")
      concrete.headOption.getOrElse(s.getTypes.get(0))
    } else s

  /** Spark type for an avro schema — the analog of the reference handing
    * the decoded `apache_avro::types::Value` tree to VRL values
    * (decoding/format/avro.rs try_from). Enum/fixed land as
    * string/binary; the unsupported set matches the reference's
    * documented exclusions.
    */
  def sparkType(avro: Schema): DataType = nonNull(avro).getType match {
    case Schema.Type.RECORD =>
      StructType(nonNull(avro).getFields.asScala.toSeq.map { f =>
        StructField(f.name, sparkType(f.schema), nullable = isNullable(f.schema) ||
          sparkType(f.schema).isInstanceOf[StructType] || f.schema.getType == Schema.Type.NULL)
      })
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.LONG                      => LongType
    case Schema.Type.INT                       => IntegerType
    case Schema.Type.DOUBLE                    => DoubleType
    case Schema.Type.FLOAT                     => FloatType
    case Schema.Type.BOOLEAN                   => BooleanType
    case Schema.Type.NULL                      => NullType
    case Schema.Type.ARRAY => ArrayType(sparkType(nonNull(avro).getElementType))
    case Schema.Type.MAP   => MapType(StringType, sparkType(nonNull(avro).getValueType))
    case t => throw new IllegalArgumentException(s"unsupported avro branch: $t")
  }

  // ---- Spark value <-> avro value ---------------------------------------

  private def toAvro(v: Any, sch: Schema): AnyRef = {
    if (v == null) {
      if (isNullable(sch) || sch.getType == Schema.Type.NULL) null
      else throw new IllegalArgumentException(s"null for non-nullable ${sch.getType}")
    } else nonNull(sch).getType match {
      case Schema.Type.RECORD =>
        val rs = nonNull(sch)
        val rec = new GenericData.Record(rs)
        val row = v.asInstanceOf[Row]
        rs.getFields.asScala.foreach { f =>
          // schemaless Rows (driver-built fixtures) bind positionally
          val idx = if (row.schema != null) row.schema.fieldIndex(f.name) else f.pos
          rec.put(f.name, toAvro(if (row.isNullAt(idx)) null else row.get(idx), f.schema))
        }
        rec
      case Schema.Type.STRING  => new Utf8(v.toString)
      case Schema.Type.ENUM    => new GenericData.EnumSymbol(nonNull(sch), v.toString)
      case Schema.Type.BYTES   => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case Schema.Type.FIXED   => new GenericData.Fixed(nonNull(sch), v.asInstanceOf[Array[Byte]])
      case Schema.Type.LONG    => java.lang.Long.valueOf(v match {
        case l: Long => l; case i: Int => i.toLong; case x => x.toString.toLong })
      case Schema.Type.INT     => java.lang.Integer.valueOf(v.toString.toInt)
      case Schema.Type.DOUBLE  => java.lang.Double.valueOf(v match {
        case d: Double => d; case f: Float => f.toDouble; case x => x.toString.toDouble })
      case Schema.Type.FLOAT   => java.lang.Float.valueOf(v.toString.toFloat)
      case Schema.Type.BOOLEAN => java.lang.Boolean.valueOf(v.asInstanceOf[Boolean])
      case Schema.Type.ARRAY   =>
        val es = nonNull(sch).getElementType
        v.asInstanceOf[scala.collection.Seq[Any]].map(toAvro(_, es)).asJava
      case Schema.Type.MAP =>
        val vs = nonNull(sch).getValueType
        val m = new java.util.LinkedHashMap[String, AnyRef]()
        v.asInstanceOf[scala.collection.Map[String, Any]].foreach { case (k, x) =>
          m.put(k, toAvro(x, vs)) }
        m
      case t => throw new IllegalArgumentException(s"unsupported avro branch: $t")
    }
  }

  private def fromAvro(v: AnyRef, sch: Schema): Any = {
    if (v == null) null
    else nonNull(sch).getType match {
      case Schema.Type.RECORD =>
        val rs = nonNull(sch)
        val rec = v.asInstanceOf[GenericRecord]
        Row.fromSeq(rs.getFields.asScala.toSeq.map(f => fromAvro(rec.get(f.name), f.schema)))
      case Schema.Type.STRING | Schema.Type.ENUM => v.toString
      case Schema.Type.BYTES =>
        val bb = v.asInstanceOf[ByteBuffer]
        val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
      case Schema.Type.FIXED => v.asInstanceOf[GenericData.Fixed].bytes().clone()
      case Schema.Type.ARRAY =>
        val es = nonNull(sch).getElementType
        v.asInstanceOf[java.util.List[AnyRef]].asScala.toSeq.map(fromAvro(_, es))
      case Schema.Type.MAP =>
        val vs = nonNull(sch).getValueType
        v.asInstanceOf[java.util.Map[AnyRef, AnyRef]].asScala.map { case (k, x) =>
          k.toString -> fromAvro(x, vs) }.toMap
      case _ => v // long/int/double/float/boolean boxes pass through
    }
  }

  // ---- datum kernels (executor-side) -------------------------------------

  private[graft] def encodeDatum(row: Row, schemaJson: String): Array[Byte] = {
    val sch = schemaOf(schemaJson)
    val datum = toAvro(row, sch)
    val out = new ByteArrayOutputStream(64)
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[AnyRef](sch, GenericData.get()).write(datum, enc)
    enc.flush()
    out.toByteArray
  }

  private[graft] def decodeDatum(
      bytes: Array[Byte], schemaJson: String, stripPrefix: Boolean): Row = {
    if (bytes == null || bytes.isEmpty) return null // avro null = no event
    val body =
      if (stripPrefix) {
        if (bytes.length >= 5 && bytes(0) == 0.toByte) java.util.Arrays.copyOfRange(bytes, 5, bytes.length)
        else return null // "Expected avro datum to be prefixed with schema id"
      } else bytes
    val sch = schemaOf(schemaJson)
    Try {
      val dec = DecoderFactory.get().binaryDecoder(body, null)
      val rec = new GenericDatumReader[AnyRef](sch, sch, GenericData.get()).read(null, dec)
      fromAvro(rec, sch).asInstanceOf[Row]
    }.getOrElse(null) // malformed datum -> dropped channel
  }

  // ---- Column API --------------------------------------------------------

  /** encode_avro: struct column -> bare binary datum. */
  def encodeAvro(c: Column, schemaJson: String): Column = {
    val dt = sparkType(new Schema.Parser().parse(schemaJson)) // driver-side validation
    require(dt.isInstanceOf[StructType], "avro codec root must be a record")
    udf(new UDF1[Row, Array[Byte]] {
      override def call(r: Row): Array[Byte] =
        if (r == null) null else encodeDatum(r, schemaJson)
    }, BinaryType).apply(c)
  }

  /** parse_avro: binary datum column -> struct (null on malformed input
    * or on a missing Confluent prefix when stripping is requested).
    */
  def parseAvro(c: Column, schemaJson: String, stripSchemaIdPrefix: Boolean = false): Column = {
    val dt = sparkType(new Schema.Parser().parse(schemaJson))
    udf(new UDF1[Array[Byte], Row] {
      override def call(b: Array[Byte]): Row = decodeDatum(b, schemaJson, stripSchemaIdPrefix)
    }, dt).apply(c)
  }
}
