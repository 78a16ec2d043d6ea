package graft.functions

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.JsonNodeFactory

/** The beats/lumberjack wire protocol (reference src/sources/logstash.rs,
  * itself built on the PUBLIC spec:
  * logstash-plugins/logstash-input-beats/PROTOCOL.md). Every frame is
  * `version(1|2)` + `type` + body:
  *
  *   - `W` window size: u32 (events before the writer expects acks —
  *     tracked, no decode effect; logstash.rs:500)
  *   - `D` data (v1): u32 seq + u32 pair count + (u32 klen + key +
  *     u32 vlen + value)* — string key/value pairs
  *   - `J` json (v2): u32 seq + u32 payload len + a JSON object
  *   - `C` compressed: u32 payload len + zlib(concatenated frames),
  *     decoded recursively
  *   - `A` ack: u32 seq — writer→reader acks are skipped; the READER
  *     answers a batch with `2A<max seq>` (build_ack)
  *
  * Incremental like [[MsgPack]]: [[Truncated]] = the buffer ends
  * mid-frame, wait for more bytes; IllegalArgumentException = sync
  * lost (unknown version/type byte, bad JSON payload).
  */
object Lumberjack {

  final class Truncated extends RuntimeException("truncated lumberjack frame")

  /** Decompression bound for `C` frames (see the bomb note there). */
  private val MaxInflated = 64 * 1024 * 1024

  /** One decoded event frame: its sequence number and the fields as
    * canonical JSON (v1 data pairs become an all-string object).
    */
  final case class EventFrame(seq: Long, fields: String)

  private val F = JsonNodeFactory.instance
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def bad(msg: String): Nothing = throw new IllegalArgumentException(msg)
  private def need(b: Array[Byte], off: Int, n: Int): Unit =
    if (off + n > b.length) throw new Truncated
  private def u32(b: Array[Byte], o: Int): Long = {
    need(b, o, 4)
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  }

  /** Decode ONE protocol frame at `off`: (event frames it carries —
    * empty for window/ack, many for compressed — , next offset).
    */
  def decodeOne(b: Array[Byte], off: Int): (Seq[EventFrame], Int) =
    decodeOne(b, off, 0)

  private def decodeOne(b: Array[Byte], off: Int,
                        depth: Int): (Seq[EventFrame], Int) = {
    // compressed-in-compressed nests; an adversarial chain of C frames
    // must error, not recurse unboundedly (beats senders use depth 1)
    if (depth > 8)
      bad("lumberjack: compressed frames nested deeper than 8")
    need(b, off, 2)
    val version = b(off) match {
      case '1' | '2' => b(off).toChar
      case other => bad(f"lumberjack: unknown version byte 0x$other%02x")
    }
    b(off + 1).toChar match {
      case 'W' => u32(b, off + 2); (Nil, off + 6)
      case 'A' => u32(b, off + 2); (Nil, off + 6)
      case 'D' =>
        var o = off + 2
        val seq = u32(b, o); o += 4
        val pairs = u32(b, o).toInt; o += 4
        if (pairs == 0) bad("lumberjack: data frame with zero pairs")
        val fields = F.objectNode()
        var i = 0
        while (i < pairs) {
          val klen = u32(b, o).toInt; o += 4
          need(b, o, klen)
          val k = new String(b, o, klen, "UTF-8"); o += klen
          val vlen = u32(b, o).toInt; o += 4
          need(b, o, vlen)
          fields.put(k, new String(b, o, vlen, "UTF-8")); o += vlen
          i += 1
        }
        (Seq(EventFrame(seq, fields.toString)), o)
      case 'J' =>
        var o = off + 2
        val seq = u32(b, o); o += 4
        val plen = u32(b, o).toInt; o += 4
        need(b, o, plen)
        val node =
          try mapper.readTree(new String(b, o, plen, "UTF-8"))
          catch { case e: java.io.IOException =>
            bad(s"lumberjack: json frame: ${e.getMessage}") }
        if (node == null || !node.isObject)
          bad("lumberjack: json frame payload is not an object")
        (Seq(EventFrame(seq, node.toString)), o + plen)
      case 'C' =>
        var o = off + 2
        val plen = u32(b, o).toInt; o += 4
        need(b, o, plen)
        val inflater = new java.util.zip.Inflater()
        inflater.setInput(b, o, plen)
        val outBuf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        try {
          while (!inflater.finished()) {
            val n = inflater.inflate(tmp)
            if (n == 0 && inflater.needsInput()) bad(
              "lumberjack: compressed frame payload truncated inside zlib")
            outBuf.write(tmp, 0, n)
            // a few-KB zlib bomb must error (connection drop), not
            // inflate to gigabytes on the receiving thread
            if (outBuf.size() > MaxInflated) bad(
              s"lumberjack: compressed frame inflates past $MaxInflated bytes")
          }
        } catch { case e: java.util.zip.DataFormatException =>
          bad(s"lumberjack: bad zlib payload: ${e.getMessage}")
        } finally inflater.end()
        val inner = outBuf.toByteArray
        val frames = Seq.newBuilder[EventFrame]
        var io = 0
        while (io < inner.length) {
          // a truncated INNER stream is malformed, not wait-for-more:
          // the compressed payload arrived whole
          val (fs, next) =
            try decodeOne(inner, io, depth + 1)
            catch { case _: Truncated =>
              bad("lumberjack: truncated frame inside compressed payload") }
          frames ++= fs
          io = next
        }
        (frames.result(), o + plen)
      case other => bad(
        f"lumberjack: unknown frame type '$other' (version $version)")
    }
  }

  /** The reader's ack for a processed batch: `2A` + max sequence
    * (logstash.rs build_ack; acking seq N acknowledges everything up
    * to N per PROTOCOL.md).
    */
  def encodeAck(seq: Long): Array[Byte] = Array[Byte](
    '2'.toByte, 'A'.toByte,
    ((seq >> 24) & 0xff).toByte, ((seq >> 16) & 0xff).toByte,
    ((seq >> 8) & 0xff).toByte, (seq & 0xff).toByte)
}
