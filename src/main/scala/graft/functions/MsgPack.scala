package graft.functions

import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{JsonNodeFactory, ObjectNode}

/** A from-scratch MessagePack decoder/encoder kernel over the PUBLIC
  * msgpack specification (github.com/msgpack/msgpack/blob/master/
  * spec.md) — the wire format of fluentd's forward protocol
  * (reference src/sources/fluent/message.rs). No msgpack jar; same
  * stance as the ProtoWire / DNS / BMP kernels.
  *
  * Decoded values land in a Jackson tree (the engine's JSON carrier):
  * str → text, bin → base64 text (JSON cannot hold raw bytes — same
  * convention as the OTLP decoder), int/uint → long (u64 above
  * Long.MaxValue → BigInteger), float32/64 → double, nil → null.
  * Ext values surface as `{"__ext": type, "data": base64}` EXCEPT the
  * fluent EventTime (ext type 0, 8 bytes: u32 seconds + u32 nanos —
  * forward-protocol spec §EventTime) which callers read via
  * [[Decoded.eventTimeSeconds]].
  *
  * The decoder is INCREMENTAL by construction: [[decode]] returns the
  * value AND the next offset, so a TCP byte accumulator can split a
  * stream of top-level values without a separate skipper;
  * [[Truncated]] signals "wait for more bytes" (never an error on a
  * live stream).
  */
object MsgPack {

  private val F = JsonNodeFactory.instance

  /** Thrown when the buffer ends mid-value: not malformed, just
    * incomplete — the stream caller retries with more bytes.
    */
  final class Truncated extends RuntimeException("truncated msgpack value")

  final case class Decoded(node: JsonNode, next: Int,
                           extType: Option[Int] = None,
                           extData: Option[Array[Byte]] = None,
                           bin: Option[Array[Byte]] = None) {
    /** Fluent EventTime (ext 0, 4+4 bytes) or a numeric time value →
      * epoch seconds as a double.
      */
    def eventTimeSeconds: Option[Double] = (extType, extData) match {
      case (Some(0), Some(d)) if d.length == 8 =>
        val sec = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val ns = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        Some(sec.toDouble + ns / 1e9)
      case _ if node.isNumber => Some(node.asDouble())
      case _ => None
    }
  }

  private def bad(msg: String): Nothing = throw new IllegalArgumentException(msg)

  private def need(b: Array[Byte], off: Int, n: Int): Unit =
    if (off + n > b.length) throw new Truncated

  private def u8(b: Array[Byte], o: Int): Int = b(o) & 0xff
  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def i64(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
    v
  }

  private def strNode(b: Array[Byte], off: Int, len: Int): JsonNode = {
    need(b, off, len)
    F.textNode(new String(b, off, len, StandardCharsets.UTF_8))
  }
  private def binNode(b: Array[Byte], off: Int, len: Int): JsonNode = {
    need(b, off, len)
    F.textNode(java.util.Base64.getEncoder.encodeToString(
      java.util.Arrays.copyOfRange(b, off, off + len)))
  }

  /** Nesting bound: a hostile stream of 0x91 bytes (one-element arrays
    * all the way down) would otherwise recurse once per byte and kill
    * the decoding thread with a StackOverflowError instead of a
    * catchable decode error. Fluent payloads nest ≤ 4 deep.
    */
  private val MaxDepth = 128

  /** Decode ONE value at `off`. Throws [[Truncated]] if the buffer ends
    * mid-value, IllegalArgumentException on a malformed/reserved byte
    * or pathological nesting.
    */
  def decode(b: Array[Byte], off: Int = 0): Decoded = decode(b, off, 0)

  private def decode(b: Array[Byte], off: Int, depth: Int): Decoded = {
    if (depth > MaxDepth) bad(s"msgpack: nesting deeper than $MaxDepth")
    need(b, off, 1)
    val t = u8(b, off)
    def arr(n: Int, o0: Int): Decoded = {
      val a = F.arrayNode()
      var o = o0
      var i = 0
      while (i < n) {
        val d = decode(b, o, depth + 1); a.add(d.node); o = d.next; i += 1
      }
      Decoded(a, o)
    }
    def map(n: Int, o0: Int): Decoded = {
      val m = F.objectNode()
      var o = o0
      var i = 0
      while (i < n) {
        val k = decode(b, o, depth + 1)
        val v = decode(b, k.next, depth + 1)
        // non-string keys stringify (JSON object keys are strings)
        val key = if (k.node.isTextual) k.node.asText() else k.node.toString
        m.set[JsonNode](key, v.node)
        o = v.next
        i += 1
      }
      Decoded(m, o)
    }
    def ext(len: Int, o0: Int): Decoded = {
      need(b, o0, 1 + len)
      val et = b(o0).toInt
      val data = java.util.Arrays.copyOfRange(b, o0 + 1, o0 + 1 + len)
      val o = F.objectNode()
      o.put("__ext", et)
      o.put("data", java.util.Base64.getEncoder.encodeToString(data))
      Decoded(o, o0 + 1 + len, extType = Some(et), extData = Some(data))
    }
    t match {
      case x if x <= 0x7f => Decoded(F.numberNode(x.toLong), off + 1)
      case x if x >= 0xe0 => Decoded(F.numberNode((x - 256).toLong), off + 1)
      case x if (x & 0xf0) == 0x80 => map(x & 0x0f, off + 1)
      case x if (x & 0xf0) == 0x90 => arr(x & 0x0f, off + 1)
      case x if (x & 0xe0) == 0xa0 =>
        val n = x & 0x1f; Decoded(strNode(b, off + 1, n), off + 1 + n)
      case 0xc0 => Decoded(F.nullNode(), off + 1)
      case 0xc2 => Decoded(F.booleanNode(false), off + 1)
      case 0xc3 => Decoded(F.booleanNode(true), off + 1)
      case 0xc4 => need(b, off + 1, 1); val n = u8(b, off + 1)
        Decoded(binNode(b, off + 2, n), off + 2 + n,
          bin = Some(java.util.Arrays.copyOfRange(b, off + 2, off + 2 + n)))
      case 0xc5 => need(b, off + 1, 2); val n = u16(b, off + 1)
        Decoded(binNode(b, off + 3, n), off + 3 + n,
          bin = Some(java.util.Arrays.copyOfRange(b, off + 3, off + 3 + n)))
      case 0xc6 => need(b, off + 1, 4); val n = u32(b, off + 1).toInt
        Decoded(binNode(b, off + 5, n), off + 5 + n,
          bin = Some(java.util.Arrays.copyOfRange(b, off + 5, off + 5 + n)))
      case 0xc7 => need(b, off + 1, 1); ext(u8(b, off + 1), off + 2)
      case 0xc8 => need(b, off + 1, 2); ext(u16(b, off + 1), off + 3)
      case 0xc9 => need(b, off + 1, 4); ext(u32(b, off + 1).toInt, off + 5)
      case 0xca => need(b, off + 1, 4)
        Decoded(F.numberNode(
          java.lang.Float.intBitsToFloat(u32(b, off + 1).toInt).toDouble),
          off + 5)
      case 0xcb => need(b, off + 1, 8)
        Decoded(F.numberNode(
          java.lang.Double.longBitsToDouble(i64(b, off + 1))), off + 9)
      case 0xcc => need(b, off + 1, 1)
        Decoded(F.numberNode(u8(b, off + 1).toLong), off + 2)
      case 0xcd => need(b, off + 1, 2)
        Decoded(F.numberNode(u16(b, off + 1).toLong), off + 3)
      case 0xce => need(b, off + 1, 4)
        Decoded(F.numberNode(u32(b, off + 1)), off + 5)
      case 0xcf => need(b, off + 1, 8)
        val v = i64(b, off + 1)
        Decoded(
          if (v >= 0) F.numberNode(v)
          else F.numberNode(new java.math.BigInteger(
            java.lang.Long.toUnsignedString(v))), off + 9)
      case 0xd0 => need(b, off + 1, 1)
        Decoded(F.numberNode(b(off + 1).toLong), off + 2)
      case 0xd1 => need(b, off + 1, 2)
        Decoded(F.numberNode(u16(b, off + 1).toShort.toLong), off + 3)
      case 0xd2 => need(b, off + 1, 4)
        Decoded(F.numberNode(u32(b, off + 1).toInt.toLong), off + 5)
      case 0xd3 => need(b, off + 1, 8)
        Decoded(F.numberNode(i64(b, off + 1)), off + 9)
      case 0xd4 => ext(1, off + 1)
      case 0xd5 => ext(2, off + 1)
      case 0xd6 => ext(4, off + 1)
      case 0xd7 => ext(8, off + 1)
      case 0xd8 => ext(16, off + 1)
      case 0xd9 => need(b, off + 1, 1); val n = u8(b, off + 1)
        Decoded(strNode(b, off + 2, n), off + 2 + n)
      case 0xda => need(b, off + 1, 2); val n = u16(b, off + 1)
        Decoded(strNode(b, off + 3, n), off + 3 + n)
      case 0xdb => need(b, off + 1, 4); val n = u32(b, off + 1).toInt
        Decoded(strNode(b, off + 5, n), off + 5 + n)
      case 0xdc => need(b, off + 1, 2); arr(u16(b, off + 1), off + 3)
      case 0xdd => need(b, off + 1, 4); arr(u32(b, off + 1).toInt, off + 5)
      case 0xde => need(b, off + 1, 2); map(u16(b, off + 1), off + 3)
      case 0xdf => need(b, off + 1, 4); map(u32(b, off + 1).toInt, off + 5)
      case other => bad(f"msgpack: reserved/unknown type byte 0x$other%02x")
    }
  }

  /** Decode a top-level ARRAY into its per-element [[Decoded]]s plus
    * each element's START offset (so a caller keeps ext/bin identity
    * and can re-descend into nested arrays — the generic tree flattens
    * both). Returns (Seq((startOffset, element)), nextOffset).
    */
  def decodeArrayElems(b: Array[Byte], off: Int = 0): (Seq[(Int, Decoded)], Int) = {
    need(b, off, 1)
    val t = u8(b, off)
    val (n, o0) =
      if ((t & 0xf0) == 0x90) (t & 0x0f, off + 1)
      else if (t == 0xdc) { need(b, off + 1, 2); (u16(b, off + 1), off + 3) }
      else if (t == 0xdd) { need(b, off + 1, 4); (u32(b, off + 1).toInt, off + 5) }
      else bad(f"msgpack: expected array, got type byte 0x$t%02x")
    val elems = Seq.newBuilder[(Int, Decoded)]
    var o = o0
    var i = 0
    while (i < n) { val d = decode(b, o); elems += ((o, d)); o = d.next; i += 1 }
    (elems.result(), o)
  }

  /** True when the value at `off` is a msgpack array header. */
  def isArrayAt(b: Array[Byte], off: Int): Boolean = {
    if (off >= b.length) throw new Truncated
    val t = u8(b, off)
    (t & 0xf0) == 0x90 || t == 0xdc || t == 0xdd
  }

  // ------------------------------------------------------------ encode
  // The small subset senders need (fluent acks, capture generation):
  // strings, longs, doubles, maps, arrays, EventTime ext, raw bin.

  final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    def toBytes: Array[Byte] = out.toByteArray
    private def u8w(v: Int): Unit = out.write(v & 0xff)
    private def u32w(v: Long): Unit = {
      u8w((v >> 24).toInt); u8w((v >> 16).toInt); u8w((v >> 8).toInt); u8w(v.toInt)
    }
    def writeStr(s: String): Writer = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      if (b.length < 32) u8w(0xa0 | b.length)
      else if (b.length < 256) { u8w(0xd9); u8w(b.length) }
      else { u8w(0xda); u8w(b.length >> 8); u8w(b.length) }
      out.write(b); this
    }
    def writeLong(v: Long): Writer = {
      if (v >= 0 && v <= 0x7f) u8w(v.toInt)
      else if (v < 0 && v >= -32) u8w((v & 0xff).toInt)
      else { u8w(0xd3); var i = 7; while (i >= 0) { u8w((v >> (8 * i)).toInt); i -= 1 } }
      this
    }
    def writeDouble(v: Double): Writer = {
      u8w(0xcb)
      val bits = java.lang.Double.doubleToLongBits(v)
      var i = 7; while (i >= 0) { u8w((bits >> (8 * i)).toInt); i -= 1 }
      this
    }
    def writeBool(v: Boolean): Writer = { u8w(if (v) 0xc3 else 0xc2); this }
    def writeNil(): Writer = { u8w(0xc0); this }
    def writeArrayHeader(n: Int): Writer = {
      if (n < 16) u8w(0x90 | n) else { u8w(0xdc); u8w(n >> 8); u8w(n) }
      this
    }
    def writeMapHeader(n: Int): Writer = {
      if (n < 16) u8w(0x80 | n) else { u8w(0xde); u8w(n >> 8); u8w(n) }
      this
    }
    def writeBin(b: Array[Byte]): Writer = {
      if (b.length < 256) { u8w(0xc4); u8w(b.length) }
      else if (b.length < 65536) { u8w(0xc5); u8w(b.length >> 8); u8w(b.length) }
      else { u8w(0xc6); u32w(b.length.toLong) }
      out.write(b); this
    }
    /** Fluent EventTime: fixext8, type 0, u32 sec + u32 ns. */
    def writeEventTime(sec: Long, ns: Long): Writer = {
      u8w(0xd7); u8w(0); u32w(sec); u32w(ns); this
    }
  }
}
