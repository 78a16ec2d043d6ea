package graft.config

import scala.collection.immutable.ListMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import VrlCompile._

/** Narrow JVM kernels backing VRL functions that have no Spark-native
  * expression (hash variants outside `sha2`'s set, 128-bit IPv6 math,
  * local-resolver DNS). All are deterministic scalar UDFs on cold paths
  * — none appear in the pipeline hot path, where codegen'd expressions
  * are used instead (see `graftvec`).
  */
object VrlKernels {

  private def digest(algo: String, s: String): String =
    if (s == null) null
    else java.security.MessageDigest.getInstance(algo)
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** serde_json-style error text for an invalid JSON input (the
    * parse_json error tail). Error-channel only — callers keep it
    * under `when(raise, …)`, so valid rows never evaluate it. Returns
    * the (never-expected) text "valid json" if the input parses.
    */
  private lazy val jsonDiagUdf = udf((s: String) =>
    graft.functions.JsonDiag.check(s).getOrElse("valid json"))
  def jsonDiag(c: Column): Column = jsonDiagUdf(c)

  /** xxhash (xxhash.cue): the REAL XXH32/XXH64 over the value's UTF-8
    * bytes, seed 0 — via lz4-java's reference implementation (bundled
    * with Spark). XXH32 is unsigned-32 (the cue's 3792637401 for
    * "foo"); XXH64 is the signed 64-bit value. Spark's builtin
    * xxhash64 hashes its internal row layout with seed 42, which is a
    * DIFFERENT function — unusable here.
    */
  private lazy val xxh32Udf = udf((s: String) =>
    if (s == null) null.asInstanceOf[java.lang.Long]
    else {
      val b = s.getBytes("UTF-8")
      java.lang.Long.valueOf(java.lang.Integer.toUnsignedLong(
        net.jpountz.xxhash.XXHashFactory.fastestInstance()
          .hash32().hash(b, 0, b.length, 0)))
    })
  private lazy val xxh64Udf = udf((s: String) =>
    if (s == null) null.asInstanceOf[java.lang.Long]
    else {
      val b = s.getBytes("UTF-8")
      java.lang.Long.valueOf(net.jpountz.xxhash.XXHashFactory.fastestInstance()
        .hash64().hash(b, 0, b.length, 0L))
    })
  def xxh32(c: Column): Column = xxh32Udf(c)
  def xxh64(c: Column): Column = xxh64Udf(c)

  /** crc algorithm CRC_32_CKSUM (crc.cue): poly 0x04C11DB7
    * non-reflected, init 0, xorout 0xFFFFFFFF — the Rust `crc`
    * catalog's CRC_32_CKSUM (which, unlike the POSIX `cksum` TOOL,
    * does not append the message length).
    */
  private lazy val crcCksumUdf = udf((s: String) =>
    if (s == null) null.asInstanceOf[java.lang.Long]
    else {
      val data = s.getBytes("UTF-8")
      var crc = 0L
      def step(b: Int): Unit = {
        crc ^= (b.toLong & 0xff) << 24
        var i = 0
        while (i < 8) {
          crc = if ((crc & 0x80000000L) != 0) ((crc << 1) ^ 0x04C11DB7L) & 0xffffffffL
                else (crc << 1) & 0xffffffffL
          i += 1
        }
      }
      data.foreach(b => step(b.toInt))
      java.lang.Long.valueOf((crc ^ 0xffffffffL) & 0xffffffffL)
    })
  def crcCksum(c: Column): Column = crcCksumUdf(c)

  private lazy val sha512_224Udf = udf((s: String) => digest("SHA-512/224", s))
  private lazy val sha512_256Udf = udf((s: String) => digest("SHA-512/256", s))
  private lazy val sha3_224Udf = udf((s: String) => digest("SHA3-224", s))
  private lazy val sha3_256Udf = udf((s: String) => digest("SHA3-256", s))
  private lazy val sha3_384Udf = udf((s: String) => digest("SHA3-384", s))
  private lazy val sha3_512Udf = udf((s: String) => digest("SHA3-512", s))

  def sha512_224(c: Column): Column = sha512_224Udf(c)
  def sha512_256(c: Column): Column = sha512_256Udf(c)
  def sha3(c: Column, variant: String): Column = variant match {
    case "SHA3-224" => sha3_224Udf(c)
    case "SHA3-256" => sha3_256Udf(c)
    case "SHA3-384" => sha3_384Udf(c)
    case "SHA3-512" => sha3_512Udf(c)
    case v => throw VrlAst.VrlUnsupported(s"sha3 variant $v")
  }

  // -------------------------------------------- bounded replace
  // ------------------------------------------------------------------
  // replace(value, pattern, with, count >= 0) — at most `count`
  // replacements (replace.cue: "The maximum number of replacements to
  // perform. -1 means replace all matches"). The unbounded forms stay
  // on the codegen'd regexp_replace / replace expressions in
  // VrlFunctions; these kernels are built only when a config asks for
  // a bounded count, so they never enter the hot path of counts-free
  // pipelines. Regex form keeps Java Matcher replacement semantics
  // ($1/${name}, backslash escapes) — the same semantics the unbounded
  // regexp_replace path applies to `with`.
  def regexReplaceN(value: Column, pattern: String, withC: Column, n: Long): Column = {
    val p = java.util.regex.Pattern.compile(pattern)
    val f = udf((s: String, rep: String) =>
      if (s == null || rep == null) null
      else {
        val m = p.matcher(s)
        val sb = new java.lang.StringBuilder
        var i = 0L
        while (i < n && m.find()) { m.appendReplacement(sb, rep); i += 1 }
        m.appendTail(sb)
        sb.toString
      })
    f(value, withC)
  }

  /** Literal (non-regex) bounded replace: plain substring scan, no
    * escape processing in `with` — the reference's string-pattern arm
    * is Rust `str` replacement, which is literal.
    */
  def literalReplaceN(value: Column, target: Column, withC: Column, n: Long): Column = {
    val f = udf((s: String, t: String, rep: String) =>
      if (s == null || t == null || rep == null) null
      else if (n <= 0) s
      else if (t.isEmpty) {
        // empty pattern matches at every char boundary (Rust
        // str::replacen semantics): "abc" -> "-a-b-c-"
        val sb = new java.lang.StringBuilder
        var pos = 0
        var i = 0L
        while (i < n && pos <= s.length) {
          sb.append(rep)
          if (pos < s.length) sb.append(s.charAt(pos))
          pos += 1
          i += 1
        }
        if (pos <= s.length) sb.append(s, pos, s.length)
        sb.toString
      } else {
        val sb = new java.lang.StringBuilder
        var from = 0
        var i = 0L
        var idx = s.indexOf(t, from)
        while (i < n && idx >= 0) {
          sb.append(s, from, idx).append(rep)
          from = idx + t.length
          i += 1
          idx = s.indexOf(t, from)
        }
        sb.append(s, from, s.length)
        sb.toString
      })
    f(value, target, withC)
  }

  // ------------------------------------------------------------- ip
  // ------------------------------------------------------------------
  // Strict textual-literal validation BEFORE InetAddress.getByName:
  // getByName falls back to a RESOLVER lookup for anything that is not
  // a valid numeric literal — and the old hex-charset guard admitted
  // hostname-shaped values built of hex letters ("abc.def",
  // "cafe.babe"), i.e. per-row DNS on hostile input — and it accepts
  // classful v4 shorthand ("123" -> 0.0.0.123, "1.2.3" -> 1.2.0.3)
  // that the reference's Rust parser rejects. The guard admits exactly
  // the literals the reference admits: full dotted-quad v4 (0-255, no
  // leading zeros, matching graft.functions.Vrl.ipv4Re) and
  // structurally valid v6 (at most one "::", <=4 hex digits per group,
  // 8 units exactly / <=7 with compression, optional embedded v4
  // tail). getByName then never sees a resolvable name.
  private val v4Octet = "(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9][0-9]|[0-9])"
  private val v4Re = s"$v4Octet\\.$v4Octet\\.$v4Octet\\.$v4Octet".r
  private def isV4Literal(s: String): Boolean = v4Re.matches(s)
  private def isV6Literal(s: String): Boolean = {
    if (!s.contains(":") || !s.matches("[0-9a-fA-F:.]+")) return false
    val parts = s.split("::", -1)
    if (parts.length > 2) return false
    def groups(side: String): Option[Seq[String]] =
      if (side.isEmpty) Some(Nil)
      else {
        val gs = side.split(":", -1).toSeq
        if (gs.exists(_.isEmpty)) None else Some(gs)
      }
    val compressed = parts.length == 2
    (for {
      l <- groups(parts(0))
      r <- if (compressed) groups(parts(1)) else Some(Seq.empty[String])
    } yield {
      val all = l ++ r
      if (all.isEmpty) compressed // bare "::"
      else {
        val (hexGroups, v4Tail) =
          if (all.last.contains(".")) (all.init, Some(all.last))
          else (all, None)
        val units = hexGroups.length + (if (v4Tail.isDefined) 2 else 0)
        hexGroups.forall(g =>
          g.length >= 1 && g.length <= 4 && !g.contains(".")) &&
          v4Tail.forall(isV4Literal) &&
          (if (compressed) units <= 7 else units == 8)
      }
    }).getOrElse(false)
  }

  private def ipBytes(ip: String): Option[Array[Byte]] =
    try {
      if (ip == null) None
      else if (isV4Literal(ip))
        Some(java.net.InetAddress.getByName(ip).getAddress)
      else if (isV6Literal(ip)) {
        val b = java.net.InetAddress.getByName(ip).getAddress
        if (b.length == 16) Some(b)
        else {
          // Java collapses v4-MAPPED v6 ("::ffff:1.2.3.4") to an
          // Inet4Address; the reference's parser keeps the 16-byte v6
          // form — re-expand so a v6-spelled input stays v6
          val out = new Array[Byte](16)
          out(10) = 0xff.toByte; out(11) = 0xff.toByte
          System.arraycopy(b, 0, out, 12, 4)
          Some(out)
        }
      } else None
    } catch { case _: Exception => None }

  private def maskBytes(mask: String, len: Int): Option[Array[Byte]] =
    if (mask == null) None
    else if (mask.startsWith("/")) {
      // per-row degradation contract: a malformed or out-of-range prefix
      // ("/xy", "/999…") yields None (row-level error), never a
      // NumberFormatException that kills the task
      mask.drop(1).toIntOption.filter(b => b >= 0 && b <= len * 8).map { bits =>
        val out = new Array[Byte](len)
        var i = 0
        var rem = bits
        while (i < len) {
          out(i) = (if (rem >= 8) 0xff else if (rem <= 0) 0 else (0xff << (8 - rem)) & 0xff).toByte
          rem -= 8; i += 1
        }
        out
      }
    } else ipBytes(mask).filter(_.length == len)

  private def renderIp(bytes: Array[Byte]): String =
    java.net.InetAddress.getByAddress(bytes) match {
      case v6: java.net.Inet6Address =>
        // compress to canonical :: form
        val groups = v6.getAddress.grouped(2)
          .map(g => ((g(0) & 0xff) << 8) | (g(1) & 0xff)).toArray
        // find longest zero run
        var bestStart = -1; var bestLen = 0
        var i = 0
        while (i < 8) {
          if (groups(i) == 0) {
            var j = i
            while (j < 8 && groups(j) == 0) j += 1
            if (j - i > bestLen) { bestLen = j - i; bestStart = i }
            i = j
          } else i += 1
        }
        if (bestLen < 2) groups.map(Integer.toHexString).mkString(":")
        else {
          val head = groups.take(bestStart).map(Integer.toHexString).mkString(":")
          val tail = groups.drop(bestStart + bestLen).map(Integer.toHexString).mkString(":")
          s"$head::$tail"
        }
      case v4 => v4.getHostAddress
    }

  private lazy val ipSubnetUdf = udf((ip: String, mask: String) =>
    (for {
      ipB <- ipBytes(ip)
      mB <- maskBytes(mask, ipB.length)
    } yield renderIp(ipB.zip(mB).map { case (a, b) => (a & b).toByte }))
      .orNull)

  def ipSubnet(ip: Column, mask: Column): Column = ipSubnetUdf(ip, mask)

  // ip_pton/ip_ntop (ip_pton.cue): the reference returns/consumes raw
  // bytes; a raw-byte string is not a portable column value, so the
  // TRANSPORT ENCODING here is lowercase hex (4-byte v4 / 16-byte v6).
  private lazy val ipPtonUdf = udf((ip: String) =>
    ipBytes(ip).map(_.map(b => f"${b & 0xff}%02x").mkString).orNull)
  private lazy val ipNtopUdf = udf((hexs: String) =>
    (try {
      Option(hexs).filter(h => h.length == 8 || h.length == 32)
        .map(_.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
        .map(renderIp)
    } catch { case _: Exception => None }).orNull)
  def ipPtonHex(ip: Column): Column = ipPtonUdf(ip)
  def ipNtopHex(hexs: Column): Column = ipNtopUdf(hexs)

  // --------------------------------------------- validate_json_schema
  /** JSON-Schema core-keyword validator (validate_json_schema.cue): the
    * schema file loads and sanity-checks ONCE at compile (the
    * reference's compiled-schema cache, made explicit), then rows
    * validate through a serializable kernel with an executor-local
    * parsed schema. Supported: type/enum/const, properties/required/
    * additionalProperties, items/minItems/maxItems/uniqueItems,
    * minimum/maximum/exclusive*, minLength/maxLength/pattern/format
    * (email, ipv4, ipv6, date-time, date, time, uri, hostname, uuid),
    * allOf/anyOf/oneOf/not. Unsupported STRUCTURAL keywords ($ref,
    * patternProperties, dependencies, if/then/else) raise
    * VrlUnsupported at compile — never silently pass.
    */
  final class JsonSchemaValidator(schemaJson: String, ignoreUnknownFormats: Boolean)
      extends Serializable {
    import com.fasterxml.jackson.databind.JsonNode

    @transient private lazy val mapper =
      new com.fasterxml.jackson.databind.ObjectMapper()
    @transient private lazy val schema = mapper.readTree(schemaJson)

    def validate(payload: String): java.lang.Boolean =
      if (payload == null) null
      else {
        val v = try mapper.readTree(payload) catch { case _: Exception => null }
        if (v == null) null else java.lang.Boolean.valueOf(check(schema, v))
      }

    private val formats: Map[String, String] = JsonSchemaValidator.Formats

    private def check(s: JsonNode, v: JsonNode): Boolean = {
      def f(name: String): Option[JsonNode] = Option(s.get(name))
      val typeOk = f("type").forall { t =>
        val wanted =
          if (t.isArray) (0 until t.size).map(t.get(_).asText)
          else Seq(t.asText)
        wanted.exists {
          case "string" => v.isTextual
          case "integer" => v.isIntegralNumber
          case "number" => v.isNumber
          case "boolean" => v.isBoolean
          case "object" => v.isObject
          case "array" => v.isArray
          case "null" => v.isNull
          case _ => false
        }
      }
      lazy val enumOk = f("enum").forall { e =>
        (0 until e.size).exists(i => e.get(i) == v)
      }
      lazy val constOk = f("const").forall(_ == v)
      lazy val numOk = !v.isNumber || {
        val d = v.asDouble
        f("minimum").forall(d >= _.asDouble) &&
          f("maximum").forall(d <= _.asDouble) &&
          f("exclusiveMinimum").forall(d > _.asDouble) &&
          f("exclusiveMaximum").forall(d < _.asDouble)
      }
      lazy val strOk = !v.isTextual || {
        val t = v.asText
        f("minLength").forall(t.length >= _.asInt) &&
          f("maxLength").forall(t.length <= _.asInt) &&
          f("pattern").forall(p => java.util.regex.Pattern.compile(p.asText).matcher(t).find) &&
          f("format").forall { fmt =>
            // ignore_unknown_formats=true demotes format to an
            // annotation ENTIRELY — the reference's own fixtures pass
            // a failing known format ("email") under the flag
            // (validate_json_schema.cue example 4)
            if (ignoreUnknownFormats) true
            else formats.get(fmt.asText).forall(re => t.matches(re))
          }
      }
      lazy val objOk = !v.isObject || {
        val props = f("properties")
        val propOk = props.forall { p =>
          val names = p.fieldNames()
          var ok = true
          while (ok && names.hasNext) {
            val n = names.next()
            if (v.has(n)) ok = check(p.get(n), v.get(n))
          }
          ok
        }
        val reqOk = f("required").forall { r =>
          (0 until r.size).forall(i => v.has(r.get(i).asText))
        }
        val addOk = f("additionalProperties").forall { ap =>
          if (ap.isBoolean && !ap.asBoolean) {
            val declared = props.map { p =>
              val it = p.fieldNames(); val b = Set.newBuilder[String]
              while (it.hasNext) b += it.next()
              b.result()
            }.getOrElse(Set.empty[String])
            val names = v.fieldNames()
            var ok = true
            while (ok && names.hasNext) ok = declared.contains(names.next())
            ok
          } else true
        }
        propOk && reqOk && addOk
      }
      lazy val arrOk = !v.isArray || {
        f("items").forall(is => (0 until v.size).forall(i => check(is, v.get(i)))) &&
          f("minItems").forall(v.size >= _.asInt) &&
          f("maxItems").forall(v.size <= _.asInt) &&
          f("uniqueItems").forall(u => !u.asBoolean ||
            (0 until v.size).map(v.get(_)).distinct.size == v.size)
      }
      lazy val combOk =
        f("allOf").forall(a0 => (0 until a0.size).forall(i => check(a0.get(i), v))) &&
          f("anyOf").forall(a0 => (0 until a0.size).exists(i => check(a0.get(i), v))) &&
          f("oneOf").forall(a0 => (0 until a0.size).count(i => check(a0.get(i), v)) == 1) &&
          f("not").forall(n => !check(n, v))
      typeOk && enumOk && constOk && numOk && strOk && objOk && arrOk && combOk
    }
  }

  object JsonSchemaValidator {
    val Formats: Map[String, String] = Map(
      "email" -> "^[^@\\s]+@[^@\\s]+\\.[^@\\s]+$",
      "ipv4" -> "^((25[0-5]|2[0-4][0-9]|[01]?[0-9]?[0-9])\\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9]?[0-9])$",
      "ipv6" -> "^[0-9A-Fa-f:]+$",
      "date-time" -> "^\\d{4}-\\d{2}-\\d{2}[Tt ]\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?([Zz]|[+-]\\d{2}:?\\d{2})?$",
      "date" -> "^\\d{4}-\\d{2}-\\d{2}$",
      "time" -> "^\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?$",
      "uri" -> "^[a-zA-Z][a-zA-Z0-9+.-]*:.+$",
      "hostname" -> "^[a-zA-Z0-9]([a-zA-Z0-9-]*[a-zA-Z0-9])?(\\.[a-zA-Z0-9]([a-zA-Z0-9-]*[a-zA-Z0-9])?)*$",
      "uuid" -> "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$")

    private val Unsupported = Set(
      "$ref", "patternProperties", "dependencies", "dependentSchemas",
      "dependentRequired", "if", "then", "else", "propertyNames",
      "unevaluatedProperties", "unevaluatedItems", "contains", "prefixItems")

    /** Compile-time sanity scan: reject structural keywords the kernel
      * does not implement, and unknown formats unless ignored.
      */
    def scan(schemaJson: String, ignoreUnknownFormats: Boolean): Unit = {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = try mapper.readTree(schemaJson) catch {
        case e: Exception =>
          throw VrlAst.VrlUnsupported(s"invalid JSON Schema definition: ${e.getMessage}")
      }
      def walk(n: com.fasterxml.jackson.databind.JsonNode): Unit =
        if (n.isObject) {
          val names = n.fieldNames()
          while (names.hasNext) {
            val k = names.next()
            if (Unsupported.contains(k))
              throw VrlAst.VrlUnsupported(s"JSON Schema keyword $k")
            if (k == "format" && n.get(k).isTextual &&
                !Formats.contains(n.get(k).asText) && !ignoreUnknownFormats)
              throw VrlAst.VrlUnsupported(
                s"JSON Schema format ${n.get(k).asText} (set ignore_unknown_formats)")
            walk(n.get(k))
          }
        } else if (n.isArray) (0 until n.size).foreach(i => walk(n.get(i)))
      walk(root)
    }
  }

  def validateJsonSchema(c: Column, schemaJson: String,
                         ignoreUnknownFormats: Boolean): Column = {
    JsonSchemaValidator.scan(schemaJson, ignoreUnknownFormats)
    val v = new JsonSchemaValidator(schemaJson, ignoreUnknownFormats)
    udf((s: String) => v.validate(s)).apply(c)
  }

  // ------------------------------------------------------- parse_xml
  /** XML → JSON object text with the reference's conventions
    * (parse_xml.cue): attributes under `attrPrefix`, text of mixed
    * elements under `textKey`, text-only attribute-free elements
    * collapse to scalars, repeated sibling tags become arrays, and
    * scalar text optionally coerces to bool/null/number. A JVM DOM walk
    * (driver-free, per-row) — dynamic XML has no static schema for a
    * columnar decode, which is also why the typed xpath surface in
    * graft.functions.Parsers is the preferred at-scale path.
    */
  private def xmlJson(xml: String, includeAttr: Boolean, attrPrefix: String,
                      textKey: String, alwaysText: Boolean, parseBool: Boolean,
                      parseNull: Boolean, parseNumber: Boolean): String = {
    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    def scalar(s: String): String =
      if (parseBool && (s == "true" || s == "false")) s
      else if (parseNull && s == "null") "null"
      else if (parseNumber && s.matches("-?\\d+")) s
      else if (parseNumber && s.matches("-?\\d+\\.\\d+")) s
      else "\"" + esc(s) + "\""
    def element(e: org.w3c.dom.Element): String = {
      val attrs = if (!includeAttr) Seq.empty
      else (0 until e.getAttributes.getLength).map { i =>
        val a = e.getAttributes.item(i)
        (attrPrefix + a.getNodeName) -> ("\"" + esc(a.getNodeValue) + "\"")
      }
      val kids = (0 until e.getChildNodes.getLength).map(e.getChildNodes.item(_))
      val childElems = kids.collect { case c: org.w3c.dom.Element => c }
      val text = kids.collect {
        case t: org.w3c.dom.Text => t.getTextContent
      }.mkString.trim
      if (attrs.isEmpty && childElems.isEmpty && !alwaysText) scalar(text)
      else {
        val grouped = childElems.groupBy(_.getTagName)
        // document order of first occurrence
        val childFields = childElems.map(_.getTagName).distinct.map { n =>
          val vs = grouped(n).map(element)
          n -> (if (vs.length == 1) vs.head else vs.mkString("[", ",", "]"))
        }
        val textField =
          if (text.nonEmpty || (alwaysText && childElems.isEmpty))
            Seq(textKey -> scalar(text))
          else Nil
        (attrs ++ childFields ++ textField)
          .map { case (k, v) => "\"" + esc(k) + "\":" + v }
          .mkString("{", ",", "}")
      }
    }
    try {
      val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      f.setNamespaceAware(false)
      f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      val doc = f.newDocumentBuilder()
        .parse(new org.xml.sax.InputSource(new java.io.StringReader(xml)))
      val root = doc.getDocumentElement
      "{\"" + esc(root.getTagName) + "\":" + element(root) + "}"
    } catch { case _: Exception => null }
  }

  def parseXml(c: Column, includeAttr: Boolean, attrPrefix: String,
               textKey: String, alwaysText: Boolean, parseBool: Boolean,
               parseNull: Boolean, parseNumber: Boolean): Column = {
    val u = udf((s: String) =>
      Option(s).map(xmlJson(_, includeAttr, attrPrefix, textKey, alwaysText,
        parseBool, parseNull, parseNumber)).orNull)
    u(c)
  }

  private lazy val cidrContainsUdf = udf((cidr: String, ip: String) => {
    if (cidr == null || ip == null || !cidr.contains("/")) null
    else {
      val Array(net, bitsS) = cidr.split("/", 2)
      (for {
        netB <- ipBytes(net)
        ipB <- ipBytes(ip)
        if netB.length == ipB.length
        mB <- maskBytes("/" + bitsS, netB.length)
      } yield netB.zip(mB).map { case (a, b) => (a & b).toByte }
        .sameElements(ipB.zip(mB).map { case (a, b) => (a & b).toByte }))
        .map(java.lang.Boolean.valueOf).orNull
    }
  })

  /** v4+v6 CIDR membership (the codegen'd v4-only fast path is
    * `graft.functions.Vrl.ipCidrContains`; this kernel is the general
    * form VRL's behavior corpus needs).
    */
  def cidrContains(cidr: Column, ip: Column): Column = cidrContainsUdf(cidr, ip)

  /** Local-resolver reverse lookup: resolves via the hosts file (e.g.
    * 127.0.0.1 → localhost); with no resolver answer, returns the input
    * — this sandbox has no egress, so only hosts-file entries resolve.
    */
  private lazy val reverseDnsUdf = udf((ip: String) =>
    ipBytes(ip).map { b =>
      try java.net.InetAddress.getByAddress(b).getHostName
      catch { case _: Exception => ip }
    }.orNull)
  def reverseDns(ip: Column): Column = reverseDnsUdf(ip)

  private lazy val hostnameUdf = udf(() =>
    try java.net.InetAddress.getLocalHost.getHostName
    catch { case _: Exception => "localhost" })
  def hostname(): Column = hostnameUdf()

  // ------------------------------------------------------ regex util
  /** Translate a Rust-style `(?P<name>...)` pattern to Java syntax and
    * return the capture-group names in positional order.
    */
  /** Rust-regex named groups → plain positional groups. Java rejects
    * `(?P<...>` outright AND any group name containing `_`, so names
    * are STRIPPED (extraction is positional everywhere downstream);
    * `[A-Za-z_]` first-char keeps lookbehind `(?<=` / `(?<!` intact.
    */
  def namedGroups(pattern: String): (String, Seq[String]) = {
    val g = "\\(\\?P?<([A-Za-z_][A-Za-z0-9_]*)>".r
    val names = g.findAllMatchIn(pattern).map(_.group(1)).toSeq
    (g.replaceAllIn(pattern, "("), names)
  }
}

/** VRL timestamp format handling (strftime → Spark datetime patterns).
  * `%+` (RFC 3339) accepts variable fractional precision via a
  * `coalesce` over `try_to_timestamp` patterns.
  */
object VrlTime {

  private val strf: Map[String, String] = Map(
    "%Y" -> "yyyy", "%m" -> "MM", "%d" -> "dd", "%e" -> "d",
    "%H" -> "HH", "%M" -> "mm", "%S" -> "ss", "%b" -> "MMM", "%B" -> "MMMM",
    "%T" -> "HH:mm:ss", "%F" -> "yyyy-MM-dd", "%j" -> "DDD",
    "%z" -> "xx", "%:z" -> "xxx", "%f" -> "SSSSSS", "%3f" -> "SSS",
    // %v = the VMS date "%e-%b-%Y" (chrono strftime docs)
    "%v" -> "d-MMM-yyyy", "%R" -> "HH:mm", "%a" -> "EEE", "%A" -> "EEEE",
    "%y" -> "yy", "%I" -> "hh", "%p" -> "a", "%D" -> "MM/dd/yy")

  def toJavaPattern(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    val lits = new StringBuilder
    def flushLits(): Unit = {
      if (lits.nonEmpty) {
        val s = lits.toString
        if (s.exists(_.isLetter)) sb.append("'").append(s.replace("'", "''")).append("'")
        else sb.append(s)
        lits.clear()
      }
    }
    while (i < fmt.length) {
      if (fmt.charAt(i) == '%' && i + 1 < fmt.length) {
        val spec3 = if (i + 2 < fmt.length) fmt.substring(i, i + 3) else ""
        val spec2 = fmt.substring(i, i + 2)
        if (strf.contains(spec3)) { flushLits(); sb.append(strf(spec3)); i += 3 }
        else if (strf.contains(spec2)) { flushLits(); sb.append(strf(spec2)); i += 2 }
        else if (spec2 == "%%") { lits.append('%'); i += 2 }
        else throw VrlAst.VrlUnsupported(s"strftime specifier $spec2")
      } else { lits.append(fmt.charAt(i)); i += 1 }
    }
    flushLits()
    sb.toString
  }

  private val iso8601Patterns = Seq(
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SXXX",
    "yyyy-MM-dd'T'HH:mm:ssXXX")

  def parse(c: Column, fmt: String): Column = fmt match {
    case "%+" => parseIso(c)
    case "%s" => timestamp_seconds(c.cast("long"))
    case _ =>
      // chrono's literal space matches ZERO or more whitespace (the
      // cue's "%v %R %:z" parses "… 16:00+00:00"); Java's needs exactly
      // one — retry with spaces stripped from both sides
      val p = toJavaPattern(fmt)
      coalesce(
        try_to_timestamp(c, lit(p)),
        try_to_timestamp(regexp_replace(c, " ", ""), lit(p.replace(" ", ""))))
  }

  def parseIso(c: Column): Column =
    coalesce(iso8601Patterns.map(p => try_to_timestamp(c, lit(p))): _*)

  def format(c: Column, fmt: String): Column = fmt match {
    case "%+" => date_format(c, "yyyy-MM-dd'T'HH:mm:ssxxx")
    case "%s" => unix_timestamp(c).cast("string")
    case _ => date_format(c, toJavaPattern(fmt))
  }
}

/** Structured log parsers matching the VRL stdlib's output shapes
  * (field names and types per `website/cue/reference/remap/functions/`).
  */
object VrlParsers {
  import VrlAst.VrlUnsupported

  private def nn(c: Column): Column = nullif(c, lit(""))
  private def dash(c: Column): Column = nullif(nullif(c, lit("")), lit("-"))

  /** One-pass group extraction: (match-array, regexp_extract-equivalent
    * accessor). All accessors share the single RegexGroups subexpression,
    * so a k-field parser costs one regex run per operator instead of k
    * (and re-inlined struct fields stay free).
    */
  private def groupsOf(v: Column, re: String): (Column, Int => Column) = {
    val gs = org.apache.spark.sql.graftvec.RegexExpressions.regexGroups(v, re)
    (gs, i => when(v.isNotNull, coalesce(element_at(gs, i), lit(""))))
  }

  private def obj(fields: (String, CV)*): XV = {
    val cv = VrlCompileAccess.buildObj(ListMap(fields: _*))
    XV(cv, None, lit("parse error"))
  }

  /** Apache common log → host/identity/user/timestamp/message/method/
    * path/protocol/status/size (vrl: parse_common_log.cue).
    */
  def commonLog(v: Column, tsFormat: Option[String]): XV = {
    // size accepts the CLF '-' placeholder (204/304/zero-byte responses
    // log '-'); try_cast('-') below reads it back as null, matching the
    // reference's omitted-size behavior
    val re = """^(\S+) (\S+) (\S+) \[([^\]]+)\] "(\S+) (\S+) (\S+)" (\d+) (\d+|-)$"""
    val (gs, g) = groupsOf(v, re)
    val fmt = tsFormat.getOrElse("%d/%b/%Y:%H:%M:%S %z")
    val ts = VrlTime.parse(g(4), fmt)
    val x = obj(
      "host" -> CV(dash(g(1)), VStr),
      "identity" -> CV(dash(g(2)), VStr),
      "user" -> CV(dash(g(3)), VStr),
      "timestamp" -> CV(ts, VTime),
      "message" -> CV(concat_ws(" ", g(5), g(6), g(7)), VStr),
      "method" -> CV(g(5), VStr),
      "path" -> CV(g(6), VStr),
      "protocol" -> CV(g(7), VStr),
      "status" -> CV(nn(g(8)).try_cast("bigint"), VInt),
      "size" -> CV(nn(g(9)).try_cast("bigint"), VInt))
    XV(CV(when(gs.isNotNull, x.cv.col), x.cv.t), Some(v.isNull || gs.isNull), x.msg)
  }

  /** glog: `I20210131 14:48:54.411655 15520 main.c++:9] Hello world!` */
  def glog(v: Column): XV = {
    // both date forms: glog's yyyyMMdd (parse_glog.cue) and klog's MMdd
    // (parse_klog.cue — year implied; pinned to 2024 for determinism,
    // same trade as parseLinuxAuthorization's year default)
    val re = """^([IWEF])(\d{8}|\d{4}) (\d{2}:\d{2}:\d{2}\.\d+)\s+(\d+) ([^:]+):(\d+)\] (.*)$"""
    val (gs, g) = groupsOf(v, re)
    val level = when(g(1) === "I", "info").when(g(1) === "W", "warning")
      .when(g(1) === "E", "error").when(g(1) === "F", "fatal")
    val fullDate = when(length(g(2)) === 4, concat(lit("2024"), g(2))).otherwise(g(2))
    val ts = try_to_timestamp(concat(fullDate, lit(" "), g(3)), lit("yyyyMMdd HH:mm:ss.SSSSSS"))
    val x = obj(
      "level" -> CV(level, VStr),
      "timestamp" -> CV(ts, VTime),
      "id" -> CV(nn(g(4)).try_cast("bigint"), VInt),
      "file" -> CV(g(5), VStr),
      "line" -> CV(nn(g(6)).try_cast("bigint"), VInt),
      "message" -> CV(g(7), VStr))
    XV(CV(when(gs.isNotNull, x.cv.col), x.cv.t), Some(v.isNull || gs.isNull), x.msg)
  }

  private val sevNames = Seq("emerg", "alert", "crit", "err", "warning",
    "notice", "info", "debug")
  private val facNames = Seq("kern", "user", "mail", "daemon", "auth", "syslog",
    "lpr", "news", "uucp", "cron", "authpriv", "ftp", "ntp", "security",
    "console", "solaris-cron", "local0", "local1", "local2", "local3",
    "local4", "local5", "local6", "local7")

  /** RFC 5424: `<PRI>VER TS HOST APP PROCID MSGID SD MSG` */
  def syslog(v: Column): XV = {
    val re = """^<(\d+)>(\d+) (\S+) (\S+) (\S+) (\S+) (\S+) (?:(?:-|\[[^\]]*\]) )?(.*)$"""
    val (gs, g) = groupsOf(v, re)
    // try_cast + try_element_at: a regex-matching but RFC-invalid PRI
    // (e.g. <200>, or an overflow-length digit run) must degrade to null
    // fields, not abort the job under ANSI mode.
    val pri = nn(g(1)).try_cast("int")
    val x = obj(
      "facility" -> CV(try_element_at(array(facNames.map(lit): _*), (pri / 8).cast("int") + 1), VStr),
      "severity" -> CV(try_element_at(array(sevNames.map(lit): _*), (pri % 8).cast("int") + 1), VStr),
      "version" -> CV(nn(g(2)).try_cast("bigint"), VInt),
      "timestamp" -> CV(VrlTime.parseIso(g(3)), VTime),
      "hostname" -> CV(dash(g(4)), VStr),
      "appname" -> CV(dash(g(5)), VStr),
      // RFC 5424 PROCID is `\S+`, not necessarily numeric (try_cast, not cast)
      "procid" -> CV(dash(g(6)).try_cast("bigint"), VInt),
      "msgid" -> CV(dash(g(7)), VStr),
      "message" -> CV(g(8), VStr))
    // RFC 5424 structured data: `[sdid k="v" …]` becomes a nested
    // object keyed by the SD-ID (parse_syslog.cue "exampleSDID@32473").
    // The SD-ID is data, so the result is dynamic (variant): merge the
    // typed base with a JSON object built from the SD body.
    val sdid = regexp_extract(v, """\[([^\] ="]+)( [^\]]*)?\]""", 1)
    val sdBody = regexp_extract(v, """\[([^\] ="]+) ([^\]]*)\]""", 2)
    val keyQ = concat(lit("\""), regexp_replace(sdid, "([\"\\\\])", "\\\\$1"), lit("\""))
    val sdJson = when(sdid === "", lit("{}")).otherwise(concat(
      lit("{"), keyQ, lit(":"),
      org.apache.spark.sql.graftvec.StringExpressions
        .keyValueToJson(sdBody, "=", " "),
      lit("}")))
    val merged = try_parse_json(graft.functions.Vrl.mergeDeepJson(
      to_json(x.cv.col,
        java.util.Map.of("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
      sdJson))
    XV(CV(when(gs.isNotNull, merged), VAny), Some(v.isNull || gs.isNull), x.msg)
  }

  /** parse_url → scheme/username/password/host/port/path/query/fragment
    * (parse_url.cue): the port comes from the authority (explicit, or
    * the scheme's well-known port under `default_known_ports`); the
    * host is IDNA/punycode-normalized like the Rust `url` crate; an
    * empty path normalizes to "/".
    */
  def url(v: Column, defaultKnownPorts: Boolean = false): XV = {
    def part(p: String) = parse_url(v, lit(p))
    val userinfo = coalesce(part("USERINFO"), lit(""))
    val authority = coalesce(part("AUTHORITY"), lit(""))
    val explicitPort = nn(regexp_extract(authority, ":(\\d+)$", 1)).try_cast("bigint")
    val scheme = lower(part("PROTOCOL"))
    val knownPort = element_at(
      map(lit("http"), lit(80L), lit("https"), lit(443L), lit("ftp"), lit(21L),
        lit("ws"), lit(80L), lit("wss"), lit(443L), lit("ssh"), lit(22L),
        lit("telnet"), lit(23L), lit("smtp"), lit(25L), lit("gopher"), lit(70L)),
      scheme)
    val port =
      if (defaultKnownPorts) coalesce(explicitPort, knownPort) else explicitPort
    // Spark's parse_url yields a null HOST for non-ASCII (IDN)
    // authorities — fall back to a structural extract, then
    // IDNA-normalize either way
    val rawHost = coalesce(
      nn(regexp_replace(part("HOST"), ":\\d+$", "")),
      nn(regexp_extract(v, "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^@/?#]*@)?([^/:?#]+)", 1)))
    val fixed = obj(
      "scheme" -> CV(scheme, VStr),
      "username" -> CV(regexp_extract(userinfo, "^([^:]*)", 1), VStr),
      "password" -> CV(coalesce(nn(regexp_extract(userinfo, ":(.*)$", 1)), lit("")), VStr),
      "host" -> CV(graft.functions.Vrl.encodePunycode(rawHost), VStr),
      "port" -> CV(port, VInt),
      "path" -> CV(coalesce(org.apache.spark.sql.functions.nullif(
        part("PATH"), lit("")), lit("/")), VStr),
      "query" -> CV(coalesce(
        str_to_map(part("QUERY"), lit("&"), lit("=")),
        map_from_arrays(array(), array())), VMap),
      "fragment" -> CV(part("REF"), VStr))
    XV(fixed.cv, Some(v.isNull || part("PROTOCOL").isNull), fixed.msg)
  }
}

/** Access shim: lets the sibling parser/kernel objects build typed
  * object values through VrlCompile's private constructors.
  */
private[config] object VrlCompileAccess {
  def buildObj(fields: ListMap[String, CV]): CV = {
    if (fields.isEmpty) CV(lit(null), VObj(ListMap.empty))
    else CV(struct(fields.map { case (n, cv) => cv.col.as(n) }.toSeq: _*),
      VObj(fields.map { case (n, cv) => n -> cv.t }))
  }
}
