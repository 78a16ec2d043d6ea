package org.apache.spark.sql.graftvec

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, GZIPInputStream, GZIPOutputStream, Inflater}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType}

/** Compression codecs as Catalyst expressions (the VRL
  * encode_gzip/decode_gzip/encode_zlib/decode_zlib/encode_zstd/
  * decode_zstd functions — website/cue/reference/remap/functions/).
  *
  * binary → binary; deterministic (java's GZIPOutputStream writes
  * MTIME=0, Deflater default level is fixed, zstd frames are
  * content-addressed) so round-trip specs can pin exact bytes.
  * `CodegenFallback` (interpreted eval): compression calls a native/JNI
  * or heavily-JITed library either way, so generated-code fusion buys
  * nothing — the cost is in the codec, not the dispatch.
  */
object CodecExpressions {

  abstract class BinaryCodec extends UnaryExpression
      with ImplicitCastInputTypes with CodegenFallback {
    override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
    override def dataType: DataType = BinaryType
    override def nullIntolerant: Boolean = true

    /** Malformed compressed input → null (the caller's raise channel):
      * decoders face hostile bytes, and one bad blob must degrade that
      * row, never abort the job.
      *
      * Declared nullable unconditionally: the default child-derived
      * nullability would let the optimizer fold IsNull(decode(x)) to
      * false over a non-null child, silently killing the raise channel
      * built on it.
      */
    override def nullable: Boolean = true

    protected def orNull(f: => Array[Byte]): Any =
      try f catch { case scala.util.control.NonFatal(_) => null }

    /** Decompressed-output ceiling (256 MiB — same bound the zstd
      * direct path uses). A small hostile frame can legally expand by
      * orders of magnitude (~1000x gzip/zlib, unbounded chained zstd);
      * without a cap the accumulation buffer OOMs the executor, an
      * Error that orNull can NOT catch. Past the cap the blob is a
      * bomb, not an event.
      */
    protected final val MaxOut: Long = 1L << 28

    /** Drain `in` with the MaxOut cap (throws → orNull → null row). */
    protected def readBounded(in: java.io.InputStream): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var k = in.read(buf)
      while (k >= 0) {
        bos.write(buf, 0, k)
        if (bos.size() > MaxOut)
          throw new java.io.IOException(s"$prettyName: output exceeds ${MaxOut}B cap")
        k = in.read(buf)
      }
      bos.toByteArray
    }
  }

  case class GzipCompress(child: Expression) extends BinaryCodec {
    override def prettyName: String = "encode_gzip"
    override def nullSafeEval(v: Any): Any = {
      val bos = new ByteArrayOutputStream()
      val gz = new GZIPOutputStream(bos)
      gz.write(v.asInstanceOf[Array[Byte]]); gz.close()
      bos.toByteArray
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  case class GzipDecompress(child: Expression) extends BinaryCodec {
    override def prettyName: String = "decode_gzip"
    override def nullSafeEval(v: Any): Any = orNull {
      val in = new GZIPInputStream(
        new java.io.ByteArrayInputStream(v.asInstanceOf[Array[Byte]]))
      try readBounded(in) finally in.close()
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  case class ZlibCompress(child: Expression) extends BinaryCodec {
    override def prettyName: String = "encode_zlib"
    override def nullSafeEval(v: Any): Any = {
      val d = new Deflater()
      d.setInput(v.asInstanceOf[Array[Byte]]); d.finish()
      val bos = new ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      d.end()
      bos.toByteArray
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  case class ZlibDecompress(child: Expression) extends BinaryCodec {
    override def prettyName: String = "decode_zlib"
    override def nullSafeEval(v: Any): Any = orNull {
      val i = new Inflater()
      // end() in finally: hostile blobs are the expected input class
      // here, and each abandoned Inflater pins native zlib state until
      // finalization — a real leak over millions of bad rows
      try {
        i.setInput(v.asInstanceOf[Array[Byte]])
        val bos = new ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        while (!i.finished()) {
          val n = i.inflate(buf)
          if (n == 0 && i.needsDictionary())
            // FDICT streams: inflate() returns 0 with needsInput()=false —
            // without this check the loop would spin forever
            throw new java.util.zip.DataFormatException("zlib preset dictionary unsupported")
          if (n == 0 && i.needsInput()) throw new java.util.zip.DataFormatException("truncated zlib input")
          bos.write(buf, 0, n)
          if (bos.size() > MaxOut)
            throw new java.io.IOException(s"decode_zlib: output exceeds ${MaxOut}B cap")
        }
        bos.toByteArray
      } finally i.end()
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  case class ZstdCompress(child: Expression, level: Int) extends BinaryCodec {
    override def prettyName: String = "encode_zstd"
    override def nullSafeEval(v: Any): Any = {
      // streaming writer, not Zstd.compress: the reference's Rust
      // encoder streams, so its frame header carries NO content size
      // and the level default windowLog (encode_zstd.cue pins the
      // "KLUv/QBY…" header); the one-shot JNI path would emit the
      // single-segment/content-size form — same payload, different
      // header bytes
      val bos = new ByteArrayOutputStream()
      val zos = new com.github.luben.zstd.ZstdOutputStream(bos, level)
      zos.write(v.asInstanceOf[Array[Byte]])
      zos.close()
      bos.toByteArray
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class ZstdDecompress(child: Expression) extends BinaryCodec {
    override def prettyName: String = "decode_zstd"
    override def nullSafeEval(v: Any): Any = orNull {
      val src = v.asInstanceOf[Array[Byte]]
      val n = com.github.luben.zstd.Zstd.getFrameContentSize(src)
      // Streaming-written frames report no content size (n < 0), a
      // single-allocation decompress can't hold >2GB, and a hostile
      // header can CLAIM up to 2GB to force an up-front allocation —
      // all fall back to the streaming path, which allocates
      // incrementally and fails naturally on garbage.
      if (n >= 0 && n <= (1L << 28))
        com.github.luben.zstd.Zstd.decompress(src, n.toInt)
      else {
        val in = new com.github.luben.zstd.ZstdInputStream(
          new java.io.ByteArrayInputStream(src))
        try readBounded(in) finally in.close()
      }
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** VRL encode_lz4 (encode_lz4.cue): lz4_flex `compress_prepend_size`
    * layout — u32 little-endian original length, then one LZ4 block.
    * Compressed BYTES may differ from the Rust encoder (any valid block
    * is legal); the contracts are round-trip identity and cross-decoding
    * the reference's own example frames (both spec-pinned).
    */
  case class Lz4Compress(child: Expression) extends BinaryCodec {
    override def prettyName: String = "encode_lz4"
    override def nullSafeEval(v: Any): Any = {
      val src = v.asInstanceOf[Array[Byte]]
      val comp = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
      val block = comp.compress(src)
      val out = java.nio.ByteBuffer.allocate(4 + block.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.putInt(src.length).put(block)
      out.array()
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** `prepended = true` (decode_lz4.cue `use_prepended_size`): the
    * lz4_flex size-prefixed layout. `prepended = false` (the VRL
    * default): a bare block decoded into a `bufSize` buffer (the cue's
    * `buf_size`, default 1 MiB), trimmed to the written length.
    */
  case class Lz4Decompress(child: Expression, prepended: Boolean = true,
                           bufSize: Int = 1 << 20) extends BinaryCodec {
    override def prettyName: String = "decode_lz4"
    override def nullSafeEval(v: Any): Any = orNull {
      val src = v.asInstanceOf[Array[Byte]]
      if (prepended) {
        require(src.length >= 4, "lz4: missing length prefix")
        val n = java.nio.ByteBuffer.wrap(src, 0, 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
        // bound the attacker-controlled prefix before allocating: an LZ4
        // block expands at most ~255x, so anything beyond that is a
        // decompression bomb / garbage, not a valid frame
        require(n >= 0 && n.toLong <= (src.length - 4).toLong * 255 + 16,
          s"lz4: implausible length prefix $n for ${src.length} input bytes")
        val dst = new Array[Byte](n)
        net.jpountz.lz4.LZ4Factory.fastestInstance().fastDecompressor()
          .decompress(src, 4, dst, 0, n)
        dst
      } else {
        require(bufSize >= 0 && bufSize.toLong <= MaxOut,
          s"lz4: buf_size $bufSize out of range")
        val dst = new Array[Byte](bufSize)
        val written = net.jpountz.lz4.LZ4Factory.fastestInstance()
          .safeDecompressor().decompress(src, 0, src.length, dst, 0)
        java.util.Arrays.copyOf(dst, written)
      }
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** VRL encode_snappy/decode_snappy — raw snappy block format (the
    * Rust `snap` raw encoder), via Spark's bundled snappy-java.
    */
  case class SnappyCompress(child: Expression) extends BinaryCodec {
    override def prettyName: String = "encode_snappy"
    override def nullSafeEval(v: Any): Any =
      org.xerial.snappy.Snappy.compress(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  case class SnappyDecompress(child: Expression) extends BinaryCodec {
    override def prettyName: String = "decode_snappy"
    override def nullSafeEval(v: Any): Any = orNull {
      val src = v.asInstanceOf[Array[Byte]]
      // the length preamble is attacker-controlled and allocated up
      // front — validate against MaxOut BEFORE uncompress, or a 6-byte
      // blob claiming 2GB OOMs the executor (an Error orNull can't catch)
      val n = org.xerial.snappy.Snappy.uncompressedLength(src)
      require(n >= 0 && n.toLong <= MaxOut,
        s"snappy: implausible length preamble $n")
      org.xerial.snappy.Snappy.uncompress(src)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  private def wrap(f: Expression => Expression)(c: Column): Column =
    ExpressionUtils.column(f(ExpressionUtils.expression(c)))

  def gzip: Column => Column = wrap(GzipCompress)
  def gunzip: Column => Column = wrap(GzipDecompress)
  def zlib: Column => Column = wrap(ZlibCompress)
  def unzlib: Column => Column = wrap(ZlibDecompress)
  def zstd(c: Column, level: Int = 3): Column = wrap(ZstdCompress(_, level))(c)
  def unzstd: Column => Column = wrap(ZstdDecompress)
  def lz4: Column => Column = wrap(Lz4Compress)
  def unlz4: Column => Column = wrap(Lz4Decompress(_))
  def unlz4(c: Column, prepended: Boolean, bufSize: Int = 1 << 20): Column =
    wrap(Lz4Decompress(_, prepended, bufSize))(c)
  def snappy: Column => Column = wrap(SnappyCompress)
  def unsnappy: Column => Column = wrap(SnappyDecompress)
}
