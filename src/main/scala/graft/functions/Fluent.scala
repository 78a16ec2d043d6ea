package graft.functions

/** Fluentd forward-protocol decode (reference
  * src/sources/fluent/message.rs over the PUBLIC spec:
  * fluent/fluentd/wiki/Forward-Protocol-Specification-v1). One
  * top-level msgpack array is one of the event modes:
  *
  *   - Message:        `[tag, time, record]` (+options)
  *   - Forward:        `[tag, [[time, record], ...]]` (+options)
  *   - PackedForward:  `[tag, bin(concatenated msgpack entries)]`
  *     (+options; `compressed = "gzip"` makes it
  *     CompressedPackedForward — "encoded the same ... just an
  *     additional decompression step", message.rs:11)
  *
  * `time` is an integer epoch-seconds or the EventTime ext (type 0,
  * u32 sec + u32 ns); records are string-keyed maps surfaced as
  * canonical JSON. An `option` map's `chunk` value is the ack the
  * server must echo back as msgpack `{"ack": chunk}`.
  */
object Fluent {

  /** One decoded event: the tag, epoch seconds (fractional for
    * EventTime nanos; the reference treats ANY numeric time — zero
    * included — as a literal timestamp, message.rs FluentTimestamp),
    * and the record as canonical JSON.
    */
  final case class Entry(tag: String, tsecs: Option[Double], record: String)

  final case class Message(entries: Seq[Entry], ackChunk: Option[String])

  private def bad(msg: String): Nothing = throw new IllegalArgumentException(msg)

  /** Decompression BOUND: a hostile few-KB gzip bomb must error as a
    * malformed message (connection drop), not inflate to gigabytes on
    * the receiving thread.
    */
  private val MaxInflated = 64 * 1024 * 1024

  private def gunzip(b: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      val out = in.readNBytes(MaxInflated + 1)
      if (out.length > MaxInflated)
        bad(s"fluent: compressed payload inflates past $MaxInflated bytes")
      out
    } finally in.close()
  }

  private def timeOf(d: MsgPack.Decoded): Option[Double] =
    d.eventTimeSeconds

  private def entryOf(tag: String, b: Array[Byte], start: Int): Entry = {
    val (elems, _) = MsgPack.decodeArrayElems(b, start)
    if (elems.size < 2) bad(s"fluent entry: ${elems.size} elements")
    val record = elems(1)._2.node
    if (!record.isObject) bad("fluent entry: record is not a map")
    Entry(tag, timeOf(elems.head._2), record.toString)
  }

  /** Decode ONE top-level forward-protocol value starting at `off`.
    * Returns the message and the next offset. Throws
    * [[MsgPack.Truncated]] on a partial buffer (stream caller waits
    * for more bytes).
    */
  def decodeMessage(b: Array[Byte], off: Int = 0): (Message, Int) = {
    val (elems, next) = MsgPack.decodeArrayElems(b, off)
    if (elems.isEmpty) bad("fluent: empty message array")
    val tagNode = elems.head._2.node
    if (!tagNode.isTextual) bad("fluent: tag is not a string")
    val tag = tagNode.asText()
    if (elems.size < 2) bad("fluent: message has no body")
    val (o1, d1) = elems(1)
    val options: Option[com.fasterxml.jackson.databind.JsonNode] =
      elems.lift(if (d1.bin.isDefined || MsgPack.isArrayAt(b, o1)) 2 else 3)
        .map(_._2.node).filter(_.isObject)
    val ack = options.flatMap(o => Option(o.get("chunk")))
      .filter(_.isTextual).map(_.asText())
    val entries: Seq[Entry] = d1.bin match {
      case Some(payload0) =>
        // PackedForward: entries concatenated in the bin payload
        val compressed = options.flatMap(o => Option(o.get("compressed")))
          .exists(c => c.isTextual && c.asText() == "gzip")
        val payload =
          if (compressed ||
            (payload0.length >= 2 && (payload0(0) & 0xff) == 0x1f &&
              (payload0(1) & 0xff) == 0x8b)) gunzip(payload0)
          else payload0
        val out = Seq.newBuilder[Entry]
        var o = 0
        while (o < payload.length) {
          out += entryOf(tag, payload, o)
          o = MsgPack.decode(payload, o).next
        }
        out.result()
      case None if MsgPack.isArrayAt(b, o1) =>
        // Forward: an array of [time, record] entries
        val (entryElems, _) = MsgPack.decodeArrayElems(b, o1)
        entryElems.map { case (eo, _) => entryOf(tag, b, eo) }
      case None =>
        // Message: [tag, time, record, options?]
        if (elems.size < 3) bad("fluent: message mode needs a record")
        val rec = elems(2)._2.node
        if (!rec.isObject) bad("fluent: record is not a map")
        Seq(Entry(tag, timeOf(d1), rec.toString))
    }
    (Message(entries, ack), next)
  }

  /** The server's ack reply for an `option.chunk`: msgpack
    * `{"ack": chunk}` (forward-protocol spec §Response).
    */
  def encodeAck(chunk: String): Array[Byte] =
    new MsgPack.Writer().writeMapHeader(1)
      .writeStr("ack").writeStr(chunk).toBytes
}
