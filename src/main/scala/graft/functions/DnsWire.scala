package graft.functions

import java.nio.charset.StandardCharsets
import java.util.Base64

/** DNS wire-format message parser (RFC 1035 + EDNS0 RFC 6891 + EDE
  * RFC 8914) — the engine under `parse_dnstap`'s `requestData` /
  * `responseData` objects. Output model and string conventions mirror the
  * reference's dnsmsg-parser (`lib/dnsmsg-parser/src/dns_message_parser
  * .rs`): full rcode = (EDNS extended rcode << 4) | header rcode with the
  * IANA rcode name table (:934-959), names rendered with a trailing dot,
  * rdata strings per format_rdata (:534-620, common types), EDNS options
  * base64-valued with hickory's code names, EDE split out with the IANA
  * purpose table (`ede.rs:23-60`). Unsupported record types carry raw
  * rdata bytes instead of a formatted string (rDataBytes).
  */
object DnsWire {

  final case class Header(id: Int, opcode: Int, rcode: Int, qr: Int,
                          aa: Boolean, tc: Boolean, rd: Boolean, ra: Boolean,
                          ad: Boolean, cd: Boolean,
                          qd: Int, an: Int, ns: Int, ar: Int)
  final case class Question(name: String, clazz: String,
                            typeName: Option[String], typeId: Int)
  final case class Rec(name: String, clazz: String, typeName: Option[String],
                       typeId: Int, ttl: Long, rdata: Option[String],
                       rdataBytes: Option[Array[Byte]])
  final case class Ede(infoCode: Int, purpose: Option[String], extraText: Option[String])
  final case class OptEntry(code: Int, name: String, valueB64: String)
  final case class OptSection(extendedRcode: Int, version: Int, doFlag: Boolean,
                              udpPayload: Int, ede: Seq[Ede], options: Seq[OptEntry])
  final case class Msg(fullRcode: Int, rcodeName: Option[String], header: Header,
                       question: Seq[Question], answers: Seq[Rec],
                       authority: Seq[Rec], additional: Seq[Rec],
                       opt: Option[OptSection])

  // IANA rcode names (dns_message_parser.rs:934-959)
  val RcodeNames: Map[Int, String] = Map(
    0 -> "NoError", 1 -> "FormErr", 2 -> "ServFail", 3 -> "NXDomain",
    4 -> "NotImp", 5 -> "Refused", 6 -> "YXDomain", 7 -> "YXRRSet",
    8 -> "NXRRSet", 9 -> "NotAuth", 10 -> "NotZone", 16 -> "BADVERS",
    17 -> "BADKEY", 18 -> "BADTIME", 19 -> "BADMODE", 20 -> "BADNAME",
    21 -> "BADALG", 22 -> "BADTRUNC", 23 -> "BADCOOKIE")

  val TypeNames: Map[Int, String] = Map(
    1 -> "A", 2 -> "NS", 5 -> "CNAME", 6 -> "SOA", 12 -> "PTR", 15 -> "MX",
    16 -> "TXT", 28 -> "AAAA", 33 -> "SRV", 35 -> "NAPTR", 39 -> "DNAME",
    41 -> "OPT", 43 -> "DS", 46 -> "RRSIG", 47 -> "NSEC", 48 -> "DNSKEY",
    50 -> "NSEC3", 51 -> "NSEC3PARAM", 52 -> "TLSA", 59 -> "CDS",
    60 -> "CDNSKEY", 61 -> "OPENPGPKEY", 251 -> "IXFR", 252 -> "AXFR",
    255 -> "ANY", 257 -> "CAA")

  val ClassNames: Map[Int, String] = Map(
    1 -> "IN", 2 -> "CS", 3 -> "CH", 4 -> "HS", 254 -> "NONE", 255 -> "ANY")

  // hickory EdnsCode debug names for option entries
  val OptNames: Map[Int, String] = Map(
    0 -> "Zero", 1 -> "LLQ", 2 -> "UL", 3 -> "NSID", 5 -> "DAU", 6 -> "DHU",
    7 -> "N3U", 8 -> "Subnet", 9 -> "Expire", 10 -> "Cookie",
    11 -> "Keepalive", 12 -> "Padding", 13 -> "Chain")

  // EDE purposes (ede.rs:23-60, IANA extended-dns-error-codes)
  val EdePurpose: Map[Int, String] = Map(
    0 -> "Other Error", 1 -> "Unsupported DNSKEY Algorithm",
    2 -> "Unsupported DS Digest Type", 3 -> "Stale Answer",
    4 -> "Forged Answer", 5 -> "DNSSEC Indeterminate", 6 -> "DNSSEC Bogus",
    7 -> "Signature Expired", 8 -> "Signature Not Yet Valid",
    9 -> "DNSKEY Missing", 10 -> "RRSIGs Missing", 11 -> "No Zone Key Bit Set",
    12 -> "NSEC Missing", 13 -> "Cached Error", 14 -> "Not Ready",
    15 -> "Blocked", 16 -> "Censored", 17 -> "Filtered", 18 -> "Prohibited",
    19 -> "Stale NXDomain Answer", 20 -> "Not Authoritative",
    21 -> "Not Supported", 22 -> "No Reachable Authority",
    23 -> "Network Error", 24 -> "Invalid Data",
    25 -> "Signature Expired before Valid", 26 -> "Too Early",
    27 -> "Unsupported NSEC3 Iterations Value", 28 -> "Unable to conform to policy",
    29 -> "Synthesized")

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def u32(b: Array[Byte], i: Int): Long = (u16(b, i).toLong << 16) | u16(b, i + 2)

  /** Read a (possibly compressed) name starting at `pos`; returns
    * (display name with trailing dot, position after the in-place
    * bytes). Root is ".".
    */
  private def readName(b: Array[Byte], pos0: Int, lower: Boolean): (String, Int) = {
    val sb = new StringBuilder
    var pos = pos0
    var after = -1 // set on first pointer jump
    var jumps = 0
    var labels = 0
    var done = false
    while (!done) {
      require(pos < b.length, "truncated name")
      val len = u8(b, pos)
      if (len == 0) {
        if (after < 0) after = pos + 1
        done = true
      } else if ((len & 0xc0) == 0xc0) {
        require(pos + 1 < b.length, "truncated pointer")
        if (after < 0) after = pos + 2
        pos = ((len & 0x3f) << 8) | u8(b, pos + 1)
        jumps += 1
        require(jumps <= 64, "compression loop")
      } else {
        require(pos + 1 + len <= b.length, "truncated label")
        sb.append(new String(b, pos + 1, len, StandardCharsets.UTF_8)).append('.')
        labels += 1
        require(labels <= 128, "name too long")
        pos += 1 + len
      }
    }
    val name = if (sb.isEmpty) "." else sb.result()
    ((if (lower) name.toLowerCase else name), after)
  }

  /** A bare wire-format name (e.g. dnstap's query_zone field). */
  def readBareName(b: Array[Byte], lower: Boolean = false): String =
    readName(b, 0, lower)._1

  private def ipv4(b: Array[Byte]): String = b.take(4).map(_ & 0xff).mkString(".")
  private def ipv6(b: Array[Byte]): String =
    com.google.common.net.InetAddresses.toAddrString(
      java.net.InetAddress.getByAddress(b.take(16)))

  /** format_rdata's conventions for the common types; None -> raw bytes. */
  private def formatRdata(b: Array[Byte], start: Int, len: Int, typeId: Int,
                          lower: Boolean): (Option[String], Option[Array[Byte]]) = {
    def raw = java.util.Arrays.copyOfRange(b, start, start + len)
    def name(p: Int): String = readName(b, p, lower)._1
    typeId match {
      case 1 if len >= 4 => (Some(ipv4(raw)), None)
      case 28 if len >= 16 => (Some(ipv6(raw)), None)
      case 2 | 5 | 12 | 39 => (Some(name(start)), None)
      case 15 if len >= 3 => (Some(s"${u16(b, start)} ${name(start + 2)}"), None)
      case 6 => // SOA: mname rname serial refresh retry expire minimum
        val (mname, p1) = readName(b, start, lower)
        val (rname, p2) = readName(b, p1, lower)
        (Some(s"$mname $rname ${u32(b, p2)} ${u32(b, p2 + 4)} ${u32(b, p2 + 8)} ${u32(b, p2 + 12)} ${u32(b, p2 + 16)}"), None)
      case 33 if len >= 7 => // SRV: priority weight port target
        (Some(s"${u16(b, start)} ${u16(b, start + 2)} ${u16(b, start + 4)} ${name(start + 6)}"), None)
      case 16 => // TXT: quoted character-strings joined by space
        val parts = Seq.newBuilder[String]
        var p = start
        while (p < start + len) {
          val n = u8(b, p)
          parts += "\"" + new String(b, p + 1, math.min(n, start + len - p - 1),
            StandardCharsets.UTF_8) + "\""
          p += 1 + n
        }
        (Some(parts.result().mkString(" ")), None)
      case _ => (None, Some(raw))
    }
  }

  /** Parse one DNS message. `lower` mirrors lowercase_hostnames. */
  def parse(b: Array[Byte], lower: Boolean = false): Msg = {
    require(b.length >= 12, "truncated header")
    val id = u16(b, 0)
    val f = u16(b, 2)
    val qr = (f >>> 15) & 1
    val opcode = (f >>> 11) & 0xf
    val aa = ((f >>> 10) & 1) == 1
    val tc = ((f >>> 9) & 1) == 1
    val rd = ((f >>> 8) & 1) == 1
    val ra = ((f >>> 7) & 1) == 1
    val ad = ((f >>> 5) & 1) == 1
    val cd = ((f >>> 4) & 1) == 1
    val rcodeLow = f & 0xf
    val qd = u16(b, 4); val an = u16(b, 6); val ns = u16(b, 8); val ar = u16(b, 10)

    var pos = 12
    val questions = (0 until qd).map { _ =>
      val (qname, p) = readName(b, pos, lower)
      val t = u16(b, p); val c = u16(b, p + 2)
      pos = p + 4
      Question(qname, ClassNames.getOrElse(c, c.toString), TypeNames.get(t), t)
    }

    var optSection: Option[OptSection] = None
    def readRecords(n: Int): Seq[Rec] = (0 until n).flatMap { _ =>
      val (rname, p) = readName(b, pos, lower)
      val t = u16(b, p); val c = u16(b, p + 2)
      val ttl = u32(b, p + 4)
      val rdlen = u16(b, p + 8)
      val rstart = p + 10
      pos = rstart + rdlen
      if (t == 41) {
        // OPT pseudo-RR -> the opt section, excluded from the record list
        // (class = udp payload size; ttl = ext_rcode | version | flags)
        val ext = ((ttl >>> 24) & 0xff).toInt
        val ver = ((ttl >>> 16) & 0xff).toInt
        val doF = ((ttl >>> 15) & 1) == 1
        val ede = Seq.newBuilder[Ede]
        val opts = Seq.newBuilder[OptEntry]
        var q = rstart
        while (q + 4 <= rstart + rdlen) {
          val code = u16(b, q); val olen = u16(b, q + 2)
          val data = java.util.Arrays.copyOfRange(b, q + 4, math.min(q + 4 + olen, b.length))
          if (code == 15) { // EDE, RFC 8914
            val info = if (data.length >= 2) ((data(0) & 0xff) << 8) | (data(1) & 0xff) else 0
            val txt = if (data.length > 2)
              Some(new String(data, 2, data.length - 2, StandardCharsets.UTF_8)) else None
            ede += Ede(info, EdePurpose.get(info), txt)
          } else {
            opts += OptEntry(code,
              OptNames.getOrElse(code, s"Unknown($code)"),
              Base64.getEncoder.encodeToString(data))
          }
          q += 4 + olen
        }
        optSection = Some(OptSection(ext, ver, doF, c, ede.result(), opts.result()))
        None
      } else {
        val (rdata, rawBytes) = formatRdata(b, rstart, rdlen, t, lower)
        Some(Rec(rname, ClassNames.getOrElse(c, c.toString), TypeNames.get(t),
          t, ttl, rdata, rawBytes))
      }
    }

    val answers = readRecords(an)
    val authority = readRecords(ns)
    val additional = readRecords(ar)

    val fullRcode = optSection.map(o => (o.extendedRcode << 4) | rcodeLow).getOrElse(rcodeLow)
    Msg(fullRcode, RcodeNames.get(fullRcode),
      Header(id, opcode, fullRcode, qr, aa, tc, rd, ra, ad, cd, qd, an, ns, ar),
      questions, answers, authority, additional, optSection)
  }
}
