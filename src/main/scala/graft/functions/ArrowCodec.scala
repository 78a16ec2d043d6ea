package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.channels.Channels
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit => ATimeUnit}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Arrow IPC STREAM codec (reference
  * `lib/codecs/src/encoding/format/arrow.rs`).
  *
  * Reference contract mirrored here:
  *   - the streaming variant of the IPC protocol — schema message, record
  *     batches, end-of-stream marker, NO file footer/magic
  *     (arrow.rs:1-6, `StreamWriter` at :178-184);
  *   - one encode call = one self-contained stream: header + ONE record
  *     batch + EOS (`encode_events_to_arrow_ipc_stream`, arrow.rs:165-185);
  *   - an empty batch is an error, a missing schema is an error
  *     (arrow.rs:170-174 NoEvents/NoSchemaProvided);
  *   - a missing or type-mismatched field value becomes null when the
  *     field is nullable and an error otherwise (arrow.rs:240-247
  *     handle_null_constraints);
  *   - leaf types: utf8, ints, floats, bool, binary, timestamps
  *     (arrow.rs:196-225). Spark has no unsigned/decimal256 runtime
  *     values in this pipeline, so the supported set is the signed
  *     subset + timestamp-microsecond (Spark's native resolution).
  *
  * Spark-first shape: encoding is `mapPartitions` — each executor slices
  * its partition into `batchSize`-row record batches and emits one blob
  * per batch, so the operator is embarrassingly parallel and the blob
  * size is bounded regardless of partition size (the knob that matters at
  * 100 TB: blob granularity is what a downstream consumer fetches, and a
  * fixed batch size keeps memory per task flat). Decoding is the inverse
  * flatMap. The per-JVM RootAllocator is shared; each call closes its
  * VectorSchemaRoot/reader so no allocation outlives a task.
  */
object ArrowCodec {

  /** One allocator per executor JVM (arrow allocators are hierarchical;
    * children are per-call roots closed with the call).
    */
  private lazy val allocator = new RootAllocator(Long.MaxValue)

  // ---- schema mapping ----------------------------------------------------

  private def arrowType(dt: DataType): ArrowType = dt match {
    case StringType    => ArrowType.Utf8.INSTANCE
    case LongType      => new ArrowType.Int(64, true)
    case IntegerType   => new ArrowType.Int(32, true)
    case DoubleType    => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
    case FloatType     => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
    case BooleanType   => ArrowType.Bool.INSTANCE
    case BinaryType    => ArrowType.Binary.INSTANCE
    case TimestampType => new ArrowType.Timestamp(ATimeUnit.MICROSECOND, "UTC")
    case TimestampNTZType => new ArrowType.Timestamp(ATimeUnit.MICROSECOND, null)
    case t => throw new IllegalArgumentException(
      s"unsupported arrow field type: $t (arrow.rs UnsupportedType)")
  }

  def arrowSchema(st: StructType): ArrowSchema =
    new ArrowSchema(st.fields.map { f =>
      new Field(f.name, new FieldType(f.nullable, arrowType(f.dataType), null), null)
    }.toSeq.asJava)

  // ---- encode -------------------------------------------------------------

  private def micros(v: Any): Long = v match {
    case i: java.time.Instant  => Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)
    // floorDiv, not truncating '/': pre-epoch timestamps with
    // fractional seconds (getTime=-500, getNanos=500_000_000) would
    // otherwise encode one full second late (the decode path already
    // uses floorDiv)
    case t: java.sql.Timestamp => Math.addExact(Math.multiplyExact(Math.floorDiv(t.getTime, 1000L), 1000000L), t.getNanos / 1000L)
    case l: Long               => l // raw integer fallback, arrow.rs:303-306
    case d: java.time.LocalDateTime => // NTZ: micros since epoch of the wall-clock value
      Math.addExact(Math.multiplyExact(d.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L),
        d.getNano / 1000L)
    case x => throw new IllegalArgumentException(s"not a timestamp: $x")
  }

  private def fill(vec: FieldVector, i: Int, v: Any, nullable: Boolean, name: String): Unit = {
    if (v == null) {
      if (!nullable) throw new IllegalArgumentException(
        s"Null value for non-nullable field '$name'") // arrow.rs NullConstraint
      vec match {
        case x: VarCharVector         => x.setNull(i)
        case x: BigIntVector          => x.setNull(i)
        case x: IntVector             => x.setNull(i)
        case x: Float8Vector          => x.setNull(i)
        case x: Float4Vector          => x.setNull(i)
        case x: BitVector             => x.setNull(i)
        case x: VarBinaryVector       => x.setNull(i)
        case x: TimeStampMicroTZVector => x.setNull(i)
        case x: TimeStampMicroVector  => x.setNull(i)
        case x => throw new IllegalStateException(s"unexpected vector $x")
      }
    } else vec match {
      case x: VarCharVector          => x.setSafe(i, v.toString.getBytes(StandardCharsets.UTF_8))
      case x: BigIntVector           => x.setSafe(i, v.asInstanceOf[Long])
      case x: IntVector              => x.setSafe(i, v.asInstanceOf[Int])
      case x: Float8Vector           => x.setSafe(i, v.asInstanceOf[Double])
      case x: Float4Vector           => x.setSafe(i, v.asInstanceOf[Float])
      case x: BitVector              => x.setSafe(i, if (v.asInstanceOf[Boolean]) 1 else 0)
      case x: VarBinaryVector        => x.setSafe(i, v.asInstanceOf[Array[Byte]])
      case x: TimeStampMicroTZVector => x.setSafe(i, micros(v))
      case x: TimeStampMicroVector   => x.setSafe(i, micros(v))
      case x => throw new IllegalStateException(s"unexpected vector $x")
    }
  }

  /** Encode one batch of rows as one self-contained IPC stream blob. */
  private[graft] def encodeOne(rows: Seq[Row], st: StructType): Array[Byte] = {
    require(rows.nonEmpty, "No events provided for encoding") // arrow.rs NoEvents
    val root = VectorSchemaRoot.create(arrowSchema(st), allocator)
    try {
      val fields = st.fields
      var i = 0
      rows.foreach { r =>
        var j = 0
        while (j < fields.length) {
          fill(root.getVector(j), i, if (r.isNullAt(j)) null else r.get(j),
            fields(j).nullable, fields(j).name)
          j += 1
        }
        i += 1
      }
      root.setRowCount(rows.length)
      val out = new ByteArrayOutputStream(1 << 16)
      val w = new ArrowStreamWriter(root, null, Channels.newChannel(out))
      try { w.start(); w.writeBatch(); w.end() } finally w.close()
      out.toByteArray
    } finally root.close()
  }

  /** DataFrame -> one row per record batch: (arrow_ipc binary, n_rows int).
    * Partition-local; no shuffle.
    */
  def encodeStream(df: DataFrame, batchSize: Int = 1024): DataFrame = {
    require(batchSize > 0)
    val st = df.schema
    val out = StructType(Seq(
      StructField("arrow_ipc", BinaryType, nullable = false),
      StructField("n_rows", IntegerType, nullable = false)))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).map(b => Row(encodeOne(b, st), b.length))
    }(Encoders.row(out))
  }

  // ---- decode -------------------------------------------------------------

  private def read(vec: FieldVector, i: Int, dt: DataType, java8Time: Boolean): Any = {
    if (vec.isNull(i)) null
    else (vec, dt) match {
      case (x: VarCharVector, _)          => new String(x.get(i), StandardCharsets.UTF_8)
      case (x: BigIntVector, _)           => x.get(i)
      case (x: IntVector, _)              => x.get(i)
      case (x: Float8Vector, _)           => x.get(i)
      case (x: Float4Vector, _)           => x.get(i)
      case (x: BitVector, _)              => x.get(i) == 1
      case (x: VarBinaryVector, _)        => x.get(i)
      case (x: TimeStampMicroTZVector, _) =>
        val us = x.get(i)
        val inst = java.time.Instant.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
        if (java8Time) inst else java.sql.Timestamp.from(inst)
      case (x: TimeStampMicroVector, _) => // NTZ external type is LocalDateTime always
        val us = x.get(i)
        java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
          (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
      case (x, _) => throw new IllegalArgumentException(s"unsupported decode vector $x")
    }
  }

  /** Decode one IPC stream blob (all batches it contains) back to rows.
    * `java8Time` picks the external timestamp class the surrounding row
    * encoder expects (Instant vs java.sql.Timestamp — mirrors
    * spark.sql.datetime.java8API.enabled).
    */
  private[graft] def decodeOne(
      blob: Array[Byte], st: StructType, java8Time: Boolean = true): Iterator[Row] = {
    val r = new ArrowStreamReader(new ByteArrayInputStream(blob), allocator)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    try {
      val root = r.getVectorSchemaRoot
      while (r.loadNextBatch()) {
        var i = 0
        while (i < root.getRowCount) {
          buf += Row.fromSeq(st.fields.indices.map(j =>
            read(root.getVector(j), i, st.fields(j).dataType, java8Time)))
          i += 1
        }
      }
    } finally r.close()
    buf.iterator
  }

  /** Inverse of [[encodeStream]]: a DataFrame with a binary column of IPC
    * stream blobs -> the original rows (partition-local flatMap).
    */
  def decodeStream(blobs: DataFrame, blobCol: String, st: StructType): DataFrame = {
    val idx = blobs.schema.fieldIndex(blobCol)
    val java8Time = blobs.sparkSession.conf
      .get("spark.sql.datetime.java8API.enabled", "false").toBoolean
    blobs.mapPartitions { rows =>
      // null blob = dropped channel (the family convention: parseAvro /
      // parseProto / decodeNative all null-check before decoding)
      rows.flatMap { r =>
        val blob = r.getAs[Array[Byte]](idx)
        if (blob == null) Iterator.empty else decodeOne(blob, st, java8Time)
      }
    }(Encoders.row(st))
  }
}
