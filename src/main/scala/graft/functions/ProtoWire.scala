package graft.functions

import java.io.ByteArrayOutputStream

/** Protocol-buffers WIRE FORMAT — reader and writer for the five wire
  * types (varint 0, fixed64 1, length-delimited 2, fixed32 5; groups 3/4
  * rejected). Self-contained: the sandbox has no protobuf runtime jar, so
  * the codec family (parse_proto / encode_proto, reference
  * `lib/codecs/src/decoding/format/protobuf.rs` + the VRL crate's
  * `vrl::protobuf::parse`) is built on this ~150-line kernel instead of
  * being jar-gated. The encoding rules are the public protobuf spec
  * (developers.google.com/protocol-buffers/docs/encoding).
  */
object ProtoWire {

  /** One decoded field occurrence. Exactly one of `num64` (wire 0/1/5,
    * raw unsigned bits) or `bytes` (wire 2) is meaningful.
    */
  final case class WField(number: Int, wire: Int, num64: Long, bytes: Array[Byte])

  final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)

    def hasMore: Boolean = pos < end

    def readVarint(): Long = {
      var shift = 0
      var out = 0L
      while (shift < 64) {
        if (pos >= end) throw new IllegalArgumentException("truncated varint")
        val b = buf(pos); pos += 1
        out |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
      }
      throw new IllegalArgumentException("varint too long")
    }

    def readFixed32(): Long = {
      if (pos + 4 > end) throw new IllegalArgumentException("truncated fixed32")
      val v = (buf(pos) & 0xffL) | (buf(pos + 1) & 0xffL) << 8 |
        (buf(pos + 2) & 0xffL) << 16 | (buf(pos + 3) & 0xffL) << 24
      pos += 4; v
    }

    def readFixed64(): Long = {
      var v = 0L
      if (pos + 8 > end) throw new IllegalArgumentException("truncated fixed64")
      var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; v
    }

    def readBytes(): Array[Byte] = {
      // bounds-check the LONG before narrowing: a length varint with
      // bits above 2^31 would alias to a small int, pass the checks,
      // and leave the reader misaligned — structurally-valid garbage
      // instead of an error
      val nl = readVarint()
      if (nl < 0L || nl > (end - pos).toLong)
        throw new IllegalArgumentException("truncated bytes")
      val n = nl.toInt
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n; out
    }

    def readField(): WField = {
      val tag = readVarint()
      val num = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      require(num > 0, s"invalid field number $num")
      wire match {
        case 0 => WField(num, 0, readVarint(), null)
        case 1 => WField(num, 1, readFixed64(), null)
        case 2 => WField(num, 2, 0L, readBytes())
        case 5 => WField(num, 5, readFixed32(), null)
        case w => throw new IllegalArgumentException(s"unsupported wire type $w (groups are proto2-legacy)")
      }
    }

    def readAll(): Vector[WField] = {
      val b = Vector.newBuilder[WField]
      while (hasMore) b += readField()
      b.result()
    }
  }

  def zigzagDecode(v: Long): Long = (v >>> 1) ^ -(v & 1)
  def zigzagEncode(v: Long): Long = (v << 1) ^ (v >> 63)

  final class Writer {
    private val out = new ByteArrayOutputStream(64)

    def writeVarint(v0: Long): Writer = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt); this
    }
    def writeTag(number: Int, wire: Int): Writer = writeVarint((number.toLong << 3) | wire)
    def writeFixed32(v: Long): Writer = {
      var i = 0
      while (i < 4) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
      this
    }
    def writeFixed64(v: Long): Writer = {
      var i = 0
      while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
      this
    }
    def writeLenDelim(number: Int, bytes: Array[Byte]): Writer = {
      writeTag(number, 2); writeVarint(bytes.length.toLong)
      out.write(bytes, 0, bytes.length); this
    }
    def toBytes: Array[Byte] = out.toByteArray
  }
}
