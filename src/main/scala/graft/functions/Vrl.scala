package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** VRL stdlib surface beyond the codec parsers (SURVEY.md §2.7) —
  * duration/int parsing, IP math, redaction, case conversion, codecs.
  * Reference behavior: `website/cue/reference/remap/functions` cue files
  * (parse_duration.cue, ip_cidr_contains.cue, redact.cue, sieve.cue,
  * camelcase.cue, ...). Everything here composes Spark built-ins —
  * whole-stage-codegen friendly, no UDFs.
  */
object Vrl {

  // ------------------------------------------------------------ duration

  private val durRe = "^\\s*([0-9]*\\.?[0-9]+)\\s*(ns|us|µs|ms|s|m|h|d)\\s*$"

  /** `parse_duration!(s, unit: "s")`: "250ms" → 0.25. Null on no match
    * (VRL's fallible-error analog; filter or coalesce downstream).
    */
  def parseDuration(c: Column, outputUnit: String = "s"): Column = {
    // multiple segments sum ("1s 1ms" → 1001 ms — parse_duration.cue);
    // the whole string must be segments (optionally space-separated)
    val seg = "([0-9]*\\.?[0-9]+)\\s*(ns|us|µs|ms|s|m|h|d)"
    val whole = s"^\\s*($seg\\s*)+$$"
    def unitSecs(unit: Column): Column =
      when(unit === "ns", 1e-9)
        .when(unit === "us" || unit === "µs", 1e-6)
        .when(unit === "ms", 1e-3)
        .when(unit === "s", 1.0)
        .when(unit === "m", 60.0)
        .when(unit === "h", 3600.0)
        .otherwise(86400.0)
    val nums = regexp_extract_all(c, lit(seg), lit(1))
    val units = regexp_extract_all(c, lit(seg), lit(2))
    val secs = when(!c.rlike(whole), lit(null).cast("double"))
      .otherwise(aggregate(
        zip_with(nums, units, (n, u) => n.cast("double") * unitSecs(u)),
        lit(0.0), (acc, x) => acc + x))
    val div = outputUnit match {
      case "ns" => 1e-9; case "us" => 1e-6; case "ms" => 1e-3
      case "s" => 1.0; case "m" => 60.0; case "h" => 3600.0; case "d" => 86400.0
    }
    secs / div
  }

  /** `parse_int!(s, base)` — e.g. base 16 "ff" → 255. Null (the raise
    * channel) on input with digits outside the base — `conv` alone
    * renders garbage as '0', parsing junk as 0 where VRL raises — and
    * on values past Long.MaxValue (conv wraps to the u64 rendering,
    * whose plain cast is an ANSI-mode job abort; try_cast nulls it).
    */
  def parseInt(c: Column, base: Int): Column = {
    require(base >= 2 && base <= 36, s"parse_int base out of range: $base")
    val digits =
      if (base <= 10) s"[0-${base - 1}]"
      else {
        val hi = ('a' + (base - 11)).toChar
        s"[0-9a-${hi}A-${hi.toUpper}]"
      }
    // sign handled OUTSIDE conv: conv('-ff',16,10) wraps through the
    // unsigned two's-complement rendering instead of negating
    val sign = when(c.startsWith("-"), lit(-1L)).otherwise(lit(1L))
    val mag = regexp_replace(c, "^[+-]", "")
    when(c.rlike(s"^[+-]?${digits}+$$"),
      sign * conv(mag, base, 10).try_cast("long"))
  }

  /** `parse_query_string!("a=1&b=2")` → map. Decoding of %-escapes is
    * NOT applied (use urlQueryParam for single decoded keys).
    *
    * Repeated keys ('tag=a&tag=b') keep the LAST value: str_to_map under
    * the default mapKeyDedupPolicy=EXCEPTION would abort the whole job
    * on them (and real query strings repeat keys all the time).
    * Documented divergence: the reference returns an ARRAY of the
    * values, which a Map[String,String] column cannot carry.
    */
  /** Full parse_query_string.cue semantics as JSON text: %-escapes and
    * `+` decode in keys AND values, repeated keys collect into an
    * array, a value-less key maps to "" (feed to try_parse_json for
    * typed access).
    */
  private lazy val parseQueryStringJsonUdf = udf((s: String) =>
    if (s == null) null
    else {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val out = m.createObjectNode()
      def dec(x: String): String =
        try java.net.URLDecoder.decode(x, "UTF-8") catch { case _: Exception => x }
      s.stripPrefix("?").split("&").filter(_.nonEmpty).foreach { pair =>
        val at = pair.indexOf('=')
        val (k, v) =
          if (at < 0) (dec(pair), "")
          else (dec(pair.substring(0, at)), dec(pair.substring(at + 1)))
        out.get(k) match {
          case null => out.put(k, v); ()
          case a: com.fasterxml.jackson.databind.node.ArrayNode => a.add(v); ()
          case prev =>
            val a = m.createArrayNode(); a.add(prev); a.add(v); out.set(k, a); ()
        }
      }
      m.writeValueAsString(out)
    })
  def parseQueryStringJson(c: Column): Column = parseQueryStringJsonUdf(c)

  def parseQueryString(c: Column): Column = {
    val pairs = filter(split(regexp_replace(c, "^\\?", ""), "&"),
      p => p =!= "")
    // get(): a value-less param ("flag") splits to ONE element, and
    // getItem(1) on it is an ANSI index abort; get() nulls -> ""
    val entries = transform(pairs, p => struct(
      get(split(p, "=", 2), lit(0)).as("key"),
      coalesce(get(split(p, "=", 2), lit(1)), lit("")).as("value")))
    // keep an entry only if no LATER entry shares its key (last wins);
    // O(n^2) over a per-row array of a handful of params
    val deduped = filter(entries, (e, i) =>
      !exists(slice(entries, i + lit(2), size(entries)),
        e2 => e2.getField("key") === e.getField("key")))
    map_from_entries(deduped)
  }

  // ------------------------------------------------------------ IP math

  /** `ip_aton!("1.2.3.4")` → 16909060 (network-byte-order uint32).
    * Null on anything that is not a dotted quad with octets 0-255 (the
    * caller's raise channel) — the validity gate must come FIRST, since
    * an unguarded getItem/cast on a malformed address aborts the job
    * under ANSI mode instead of raising. CaseWhen evaluates the value
    * branch only on matching rows, so the arithmetic below never sees a
    * malformed address.
    */
  // octet: 0-255 with NO leading zeros — Rust's std parser (what VRL
  // uses) rejects '01.2.3.4' since 1.46; shared by ipAton and isIpv4 so
  // a pipeline guarding ip_aton! with is_ipv4() never hits a surprise
  // raise
  private val ipv4Octet = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9][0-9]|[0-9])"
  private val ipv4Re = s"^($ipv4Octet\\.){3}$ipv4Octet$$"

  def ipAton(c: Column): Column = {
    val o = split(c, "\\.")
    when(c.rlike(ipv4Re),
      o.getItem(0).cast("long") * 16777216L + o.getItem(1).cast("long") * 65536L +
        o.getItem(2).cast("long") * 256L + o.getItem(3).cast("long"))
  }

  /** `ip_ntoa!(16909060)` → "1.2.3.4". */
  def ipNtoa(c: Column): Column =
    // null-gated: concat_ws silently SKIPS nulls, so a null input would
    // render "" instead of propagating the raise channel
    when(c.isNotNull, concat_ws(".",
      (c / 16777216L).cast("long") % 256L,
      (c / 65536L).cast("long") % 256L,
      (c / 256L).cast("long") % 256L,
      c.cast("long") % 256L))

  /** `ip_cidr_contains!("10.128.0.0/9", ip)`. `cidr` may be a column
    * (per-row CIDRs) or a literal. Compares the two addresses shifted
    * right by (32 - prefixLen) — exact for /0../32 in double math
    * (values < 2^32 << 2^53).
    */
  def ipCidrContains(cidr: Column, ip: Column): Column = {
    // try_element_at/try_cast: a CIDR without "/" (or a garbage prefix
    // length) → null result, not an ANSI-mode job abort
    val net = ipAton(try_element_at(split(cidr, "/"), lit(1)))
    val plen = try_element_at(split(cidr, "/"), lit(2)).try_cast("int")
    val div = pow(lit(2.0), lit(32) - plen)
    floor(ipAton(ip) / div) === floor(net / div)
  }

  // ------------------------------------------------------------ strings

  /** `redact(s, filters: [r'...'])` — replace every match. */
  def redact(c: Column, pattern: String, replacement: String = "[REDACTED]"): Column =
    regexp_replace(c, pattern, replacement)

  /** `sieve(s, permitted)` — KEEP only substrings matching the
    * permitted pattern, drop everything else.
    */
  def sieve(c: Column, permittedPattern: String, joinWith: String = ""): Column =
    array_join(regexp_extract_all(c, lit(permittedPattern), lit(0)), joinWith)

  /** Word splitting for the case-conversion family, matching the
    * reference's convert_case boundaries (snakecase.cue & siblings,
    * backed by the convert_case crate): underscore, hyphen, space,
    * lower→upper transitions, and acronym tails ("HTTPServer" →
    * "HTTP Server"). An `originalCase` hint restricts the boundary
    * set to that case's separator, like the crate's `from_case`.
    */
  private def caseWords(c: Column, originalCase: Option[String]): Column = {
    val sep = originalCase match {
      case Some("snake_case") | Some("SCREAMING_SNAKE_CASE") => "_+"
      case Some("kebab-case") => "-+"
      case Some("camelCase") | Some("PascalCase") =>
        return split(boundarize(c), " +")
      case _ => return split(translate(boundarize(c), "-_", "  "), " +")
    }
    split(c, sep)
  }

  private def boundarize(c: Column): Column =
    regexp_replace(
      regexp_replace(c, "([\\p{Ll}0-9])(\\p{Lu})", "$1 $2"),
      "(\\p{Lu}+)(\\p{Lu}\\p{Ll})", "$1 $2")

  private def capWord(w: Column): Column =
    concat(upper(substring(w, 1, 1)), lower(substring(w, 2, 1000000)))

  /** `snakecase("input-string")` → "input_string". */
  def snakecase(c: Column, originalCase: Option[String] = None): Column =
    lower(array_join(caseWords(c, originalCase), "_"))

  /** `kebabcase("fooBarBaz")` → "foo-bar-baz". */
  def kebabcase(c: Column, originalCase: Option[String] = None): Column =
    lower(array_join(caseWords(c, originalCase), "-"))

  /** `camelcase("input-string")` → "inputString". */
  def camelcase(c: Column, originalCase: Option[String] = None): Column = {
    val parts = caseWords(c, originalCase)
    concat(lower(parts.getItem(0)),
      array_join(transform(slice(parts, 2, 1000000), capWord(_)), ""))
  }

  /** `pascalcase("foo_bar")` → "FooBar". */
  def pascalcase(c: Column, originalCase: Option[String] = None): Column =
    array_join(transform(caseWords(c, originalCase), capWord(_)), "")

  // ------------------------------------------------------------ codecs / hashes

  /** `encode_base64(s)` / `decode_base64!(s)`. decode uses try_to_binary:
    * bare unbase64 THROWS on some malformed input (verified: trailing
    * partial units), killing the raise channel built on isNull.
    */
  def encodeBase64(c: Column): Column = base64(c.cast("binary"))
  def decodeBase64(c: Column): Column =
    try_to_binary(c, lit("base64")).cast("string")

  /** md5 / sha2-256 hex digests (VRL `md5`, `sha2`), plus the fast
    * non-cryptographic hashes used for sampling/sharding keys.
    */
  def md5Hex(c: Column): Column = md5(c.cast("binary"))
  def sha256Hex(c: Column): Column = sha2(c.cast("binary"), 256)
  def xxhash(c: Column*): Column = xxhash64(c: _*)
  def crc(c: Column): Column = crc32(c.cast("binary"))

  // ------------------------------------------------------------ user agent

  /** `parse_user_agent` — minimal family/version extraction for the
    * common agents (the reference embeds a full uap-core database;
    * that ruleset is data, not engine — load it as an enrichment
    * table for production parity).
    */
  def userAgentFamily(c: Column): Column =
    when(c.rlike("(?i)firefox/"), "Firefox")
      .when(c.rlike("(?i)edg(e|a|ios)?/"), "Edge")
      .when(c.rlike("(?i)(opr|opera)/"), "Opera")
      .when(c.rlike("(?i)chrome/"), "Chrome")
      .when(c.rlike("(?i)safari/"), "Safari")
      .when(c.rlike("(?i)curl/"), "curl")
      .otherwise("Other")

  // ------------------------------------------------------ compression

  /** VRL encode_gzip / decode_gzip / encode_zlib / decode_zlib /
    * encode_zstd / decode_zstd (binary → binary; Catalyst expressions
    * in graftvec.CodecExpressions). Deterministic output, so specs pin
    * exact round-trips. Spec-verified only — the oracle engine has no
    * portable gzip/zstd scalar, which is the documented reason these
    * carry no CORRECTNESS row.
    */
  def encodeGzip(c: Column): Column = graftCodecs.gzip(c)
  def decodeGzip(c: Column): Column = graftCodecs.gunzip(c)
  def encodeZlib(c: Column): Column = graftCodecs.zlib(c)
  def decodeZlib(c: Column): Column = graftCodecs.unzlib(c)
  def encodeZstd(c: Column, level: Int = 3): Column = graftCodecs.zstd(c, level)
  def decodeZstd(c: Column): Column = graftCodecs.unzstd(c)
  private def graftCodecs = org.apache.spark.sql.graftvec.CodecExpressions

  // ------------------------------------------ long-tail codecs / strings

  /** encode_base16 / decode_base16 (decode_base16.cue). */
  def encodeBase16(c: Column): Column = lower(hex(c.cast("binary")))
  def decodeBase16(c: Column): Column = unhex(c).cast("string")

  /** encode_percent / decode_percent (encode_percent.cue): %20-style
    * percent escapes (form-style `+` never emitted; a literal `+`
    * survives decode).
    */
  def encodePercent(c: Column): Column =
    regexp_replace(url_encode(c), "\\+", "%20")
  /** encode_percent with an `ascii_set` (encode_percent.cue): only the
    * set's characters escape. Sets from the percent-encoding crate the
    * reference uses; NON_ALPHANUMERIC is the default full escape.
    */
  def encodePercentSet(c: Column, asciiSet: String): Column = asciiSet match {
    case "NON_ALPHANUMERIC" => encodePercent(c)
    case _ =>
      val clazz = asciiSet match {
        case "CONTROLS" => "[\\x00-\\x1f\\x7f]"
        case "FRAGMENT" => "[\\x00-\\x1f\\x7f \"<>`]"
        case "QUERY" => "[\\x00-\\x1f\\x7f \"<>#]"
        case "SPECIAL" => "[\\x00-\\x1f\\x7f \"<>#'`]"
        case "PATH" => "[\\x00-\\x1f\\x7f \"<>#?`{}]"
        case "USERINFO" => "[\\x00-\\x1f\\x7f \"<>#?`{}/:;=@\\[\\]\\^|\\\\]"
        case "COMPONENT" => "[\\x00-\\x1f\\x7f \"<>#?`{}/:;=@\\[\\]\\^|\\\\$%&+,]"
        case other =>
          throw new IllegalArgumentException(s"encode_percent ascii_set $other")
      }
      // rebuild: escape exactly the matched characters
      val parts = split(c, clazz, -1)
      val hits = regexp_extract_all(c, lit(s"($clazz)"), lit(1))
      when(size(hits) === 0, c).otherwise(
        concat(element_at(parts, 1),
          array_join(zip_with(hits, slice(parts, lit(2), greatest(size(parts) - 1, lit(0))),
            (h, p) => concat(
              concat(lit("%"), upper(hex(h.cast("binary")))),
              coalesce(p, lit("")))), "")))
  }
  def decodePercent(c: Column): Column =
    // try_url_decode: url_decode THROWS on malformed escapes ('%zz',
    // trailing '%') — null raise channel, not a job abort
    try_url_decode(regexp_replace(c, "\\+", "%2B"))

  /** encode_punycode/decode_punycode, decode_mime_q, parse_cbor,
    * parse_ruby_hash, seahash, shannon_entropy, sha3, hmac,
    * community_id, uuid_from_friendly_id — tokenizer/JDK-crypto grade,
    * implemented as Catalyst expressions in graftvec.StringExpressions.
    */
  def encodePunycode(c: Column): Column = strExprs.encodePunycode(c)
  def decodePunycode(c: Column): Column = strExprs.decodePunycode(c)
  def decodeMimeQ(c: Column): Column = strExprs.decodeMimeQ(c)
  def parseCbor(c: Column): Column = strExprs.parseCbor(c)
  def parseRubyHash(c: Column): Column = strExprs.parseRubyHash(c)
  def seahash(c: Column): Column = strExprs.seahash(c)
  def shannonEntropy(c: Column, segmentation: String = "bytes"): Column =
    strExprs.shannonEntropy(c, segmentation)
  def sha3(c: Column, variant: String = "SHA3-512"): Column = strExprs.sha3(c, variant)
  def sha1Hex(c: Column): Column = sha1(c.cast("binary"))
  def hmacBytes(data: Column, key: Column, algorithm: String = "SHA-256"): Column =
    strExprs.hmac(data, key, algorithm)
  /** The reference's two common compositions (hmac.cue examples). */
  def hmacBase64(data: Column, key: Column, algorithm: String = "SHA-256"): Column =
    base64(hmacBytes(data, key, algorithm))
  def hmacHex(data: Column, key: Column, algorithm: String = "SHA-256"): Column =
    lower(hex(hmacBytes(data, key, algorithm)))
  def communityId(saddr: Column, daddr: Column, sport: Column, dport: Column,
                  proto: Column, seed: Int = 0,
                  portsProvided: Boolean = true): Column =
    strExprs.communityId(saddr, daddr, sport, dport, proto, seed, portsProvided)
  def uuidFromFriendlyId(c: Column): Column = strExprs.uuidFromFriendlyId(c)
  /** encrypt_ip/decrypt_ip aes128 (format-preserving, deterministic —
    * the cue's own vectors are spec-pinned); `pfx` mode not built.
    */
  def encryptIp(ip: Column, key: Column, mode: String = "aes128"): Column =
    strExprs.encryptIp(ip, key, mode)
  def decryptIp(ip: Column, key: Column, mode: String = "aes128"): Column =
    strExprs.decryptIp(ip, key, mode)
  private def strExprs = org.apache.spark.sql.graftvec.StringExpressions

  /** encode_lz4/decode_lz4 (lz4_flex prepend_size layout) and
    * encode_snappy/decode_snappy (raw block) — see CodecExpressions.
    */
  def encodeLz4(c: Column): Column = graftCodecs.lz4(c)
  def decodeLz4(c: Column): Column = graftCodecs.unlz4(c)
  def encodeSnappy(c: Column): Column = graftCodecs.snappy(c)
  def decodeSnappy(c: Column): Column = graftCodecs.unsnappy(c)

  /** strip_ansi_escape_codes (strip_ansi_escape_codes.cue): CSI
    * sequences (ESC [ params final) and two-byte ESC sequences.
    */
  def stripAnsiEscapeCodes(c: Column): Column =
    regexp_replace(c, "\\x1b\\[[0-9;?]*[ -/]*[@-~]|\\x1b[@-_]", "")

  // --------------------------------------------- strings/objects tier 3

  /** chunks("abcdefgh", 4) → ["abcd","efgh"] (chunks.cue) — BYTE
    * chunking, exactly the reference: a chunk boundary may split a
    * UTF-8 sequence, whose halves render as replacement characters
    * (the cue's "Chunks do not respect unicode code point boundaries").
    */
  private lazy val chunksUdf = udf((s: String, n: Int) =>
    if (s == null) null
    else s.getBytes("UTF-8").grouped(n).map(new String(_, "UTF-8")).toSeq)
  def chunks(c: Column, n: Int): Column = chunksUdf(c, lit(n))

  /** screamingsnakecase("fooBar") → "FOO_BAR". */
  def screamingsnakecase(c: Column, originalCase: Option[String] = None): Column =
    upper(snakecase(c, originalCase))

  /** basename/dirname (basename.cue) — POSIX semantics on "/" paths.
    * The root itself: basename("/") is null (no final component),
    * dirname("/") is "/" (its own parent).
    */
  def basename(c: Column): Column = {
    val trimmed = regexp_replace(c, "/+$", "")
    when(c.rlike("^/+$"), lit(null).cast("string"))
      .otherwise(element_at(split(trimmed, "/"), -1))
  }
  def dirname(c: Column): Column = {
    val trimmed = regexp_replace(c, "/+$", "")
    val dir = regexp_replace(trimmed, "/[^/]+$", "")
    when(c.rlike("^/+$"), lit("/"))
      .when(trimmed.rlike("^[^/]*$"), lit("."))
      .when(dir === "", "/")
      .otherwise(dir)
  }

  /** is_nullish (is_nullish.cue): null, "", whitespace-only, or "-". */
  def isNullish(c: Column): Column =
    c.isNull || trim(c) === "" || trim(c) === "-"

  /** is_json — cheap validity probe via try-parse to variant. */
  def isJson(c: Column): Column = try_parse_json(c).isNotNull

  /** is_ipv4 / is_ipv6 (is_ipv4.cue) — syntactic checks. */
  def isIpv4(c: Column): Column = c.rlike(ipv4Re)
  def isIpv6(c: Column): Column =
    c.rlike("^[0-9A-Fa-f:]+(:(\\d{1,3}\\.){3}\\d{1,3})?$") && c.contains(":")

  /** flatten/unflatten on OBJECTS (flatten.cue, unflatten.cue): JSON
    * text with dot-joined keys — graftvec.StringExpressions.
    */
  def flattenObject(c: Column): Column = strExprs.flattenObject(c)
  def unflattenObject(c: Column, recursive: Boolean = true): Column =
    strExprs.unflattenObject(c, recursive)
  def compactJson(c: Column): Column = strExprs.compactJson(c)
  def mergeDeepJson(l: Column, r: Column): Column = strExprs.mergeDeepJson(l, r)

  /** tag_types_externally (tag_types_externally.cue): wrap the value
    * keyed by its type name. Spark columns are STATICALLY typed, so the
    * tag is the column's type, applied at plan time.
    */
  def tagTypesExternally(c: Column, tpe: String): Column =
    to_json(struct(c.as(tpe)))

  /** random_bool/random_int/random_float (random_bool.cue):
    * DETERMINISTIC per-row randomness from a seed column — a
    * distributed engine wants reproducible rows (the same trade as
    * uuidV7's entropy parameter). Uniformity comes from xxhash64.
    */
  def randomBool(seed: Column): Column = pmod(xxhash64(seed), lit(2)) === 1
  def randomInt(seed: Column, minIncl: Long, maxExcl: Long): Column =
    pmod(xxhash64(seed), lit(maxExcl - minIncl)) + minIncl
  def randomFloat(seed: Column): Column =
    pmod(xxhash64(seed), lit(1L << 52)).cast("double") / (1L << 52).toDouble

  /** get_hostname / get_timezone_name — environment reads, resolved at
    * plan time (constant across the cluster by design: the DRIVER's
    * identity, not each executor's).
    */
  def getHostname(): Column = lit(java.net.InetAddress.getLocalHost.getHostName)
  def getTimezoneName(): Column = lit(java.util.TimeZone.getDefault.getID)
  def getEnvVar(name: String): Column = lit(sys.env.getOrElse(name, null))

  /** encode_charset/decode_charset (encode_charset.cue) — the full JVM
    * charset registry (EUC-KR/EUC-JP/GB2312/…), not Spark's 7-charset
    * encode/decode builtin set. Strict conversion: an unmappable or
    * malformed sequence nulls the row (the caller's raise channel),
    * matching the reference's fallible contract.
    */
  private lazy val encodeCharsetUdf = udf((s: String, cs: String) =>
    if (s == null || cs == null) null
    else try {
      val enc = java.nio.charset.Charset.forName(cs).newEncoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      val bb = enc.encode(java.nio.CharBuffer.wrap(s))
      java.util.Arrays.copyOf(bb.array(), bb.limit())
    } catch { case scala.util.control.NonFatal(_) => null })
  private lazy val decodeCharsetUdf = udf((b: Array[Byte], cs: String) =>
    if (b == null || cs == null) null
    else try {
      val dec = java.nio.charset.Charset.forName(cs).newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      dec.decode(java.nio.ByteBuffer.wrap(b)).toString
    } catch { case scala.util.control.NonFatal(_) => null })
  def encodeCharset(c: Column, charset: String): Column =
    encodeCharsetUdf(c.cast("string"), lit(charset))
  def decodeCharset(c: Column, charset: String): Column =
    decodeCharsetUdf(c.cast("binary"), lit(charset))

  // ------------------------------------------------------------ numbers

  /** format_int!(n, base) (format_int.cue): 42, 16 → "2a" (lowercase,
    * sign preserved — `conv` alone would render negatives as unsigned
    * 2's complement).
    */
  def formatInt(c: Column, base: Int): Column =
    when(c < 0, concat(lit("-"), lower(conv(-c, 10, base))))
      .otherwise(lower(conv(c, 10, base)))

  /** format_number(n, decimals, decimal_separator, grouping_separator)
    * (format_number.cue): 1234567.89, 3 → "1,234,567.890".
    */
  def formatNumber(c: Column, decimals: Int, decimalSep: String = ".",
                   groupingSep: String = ","): Column = {
    val std = format_number(c.cast("double"), decimals)
    if (decimalSep == "." && groupingSep == ",") std
    else translate(std, ".,", decimalSep + groupingSep)
  }

  // ------------------------------------------------------------ geo

  /** haversine(lat1, lon1, lat2, lon2) (haversine.cue) → struct(
    * distance, bearing): great-circle distance (km by default, miles
    * with unit="miles") + initial bearing in degrees from north.
    */
  def haversine(lat1: Column, lon1: Column, lat2: Column, lon2: Column,
                unit: String = "kilometers"): Column = {
    // IUGG mean earth radius; miles via the 0.6213712 miles-per-km
    // factor (reproduces the cue vectors to their printed precision)
    val r = if (unit == "miles") 6371.0088 * 0.6213712 else 6371.0088
    val (p1, p2) = (radians(lat1), radians(lat2))
    val (dp, dl) = (radians(lat2 - lat1), radians(lon2 - lon1))
    val a = pow(sin(dp / 2), 2) + cos(p1) * cos(p2) * pow(sin(dl / 2), 2)
    val dist = lit(2 * r) * asin(sqrt(a))
    val brg = degrees(atan2(sin(dl) * cos(p2),
      cos(p1) * sin(p2) - sin(p1) * cos(p2) * cos(dl)))
    // the reference renders bearing rounded to 3 decimals
    // (haversine.cue: 44.561 for the 0,0 → 10,10 example)
    struct(dist.as("distance"),
      round((brg + 360.0) % 360.0, 3).as("bearing"))
  }

  // ------------------------------------------------------------ syslog maps

  /** to_syslog_level!(severity) (to_syslog_level.cue): 5 → "notice". */
  def toSyslogLevel(c: Column): Column =
    element_at(map(Seq(0 -> "emerg", 1 -> "alert", 2 -> "crit", 3 -> "err",
      4 -> "warning", 5 -> "notice", 6 -> "info", 7 -> "debug")
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*), c.cast("int"))

  /** to_syslog_severity!(level) — accepts the RFC names + common
    * aliases (panic/error/warn).
    */
  def toSyslogSeverity(c: Column): Column =
    element_at(map(Seq("emerg" -> 0, "panic" -> 0, "alert" -> 1, "crit" -> 2,
      "err" -> 3, "error" -> 3, "warning" -> 4, "warn" -> 4, "notice" -> 5,
      "info" -> 6, "debug" -> 7)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*), lower(c))

  private val facilityNames = Seq("kern", "user", "mail", "daemon", "auth",
    "syslog", "lpr", "news", "uucp", "cron", "authpriv", "ftp", "ntp",
    "security", "console", "solaris-cron") ++ (0 to 7).map(i => s"local$i")

  /** to_syslog_facility!(code) (to_syslog_facility.cue): 4 → "auth". */
  def toSyslogFacility(c: Column): Column =
    element_at(map(facilityNames.zipWithIndex
      .flatMap { case (v, k) => Seq(lit(k), lit(v)) }: _*), c.cast("int"))

  /** to_syslog_facility_code!(name): "auth" → 4. */
  def toSyslogFacilityCode(c: Column): Column =
    element_at(map(facilityNames.zipWithIndex
      .flatMap { case (v, k) => Seq(lit(v), lit(k)) }: _*), lower(c))

  // ------------------------------------------------------------ timestamps

  /** from_unix_timestamp!(n, unit) / to_unix_timestamp(ts, unit). */
  def fromUnixTimestamp(c: Column, unit: String = "seconds"): Column = unit match {
    case "milliseconds" => timestamp_millis(c.cast("long"))
    // decimal division: long/long promotes to DOUBLE, whose ulp at
    // epoch-nanosecond magnitude (~1.7e18) is 256ns — off-by-one-us
    // timestamps. Decimal is exact, truncated toward zero by the cast.
    case "nanoseconds" => timestamp_micros(
      (c.cast("decimal(38,0)") / 1000).cast("long"))
    case _ => timestamp_seconds(c.cast("long"))
  }
  def toUnixTimestamp(c: Column, unit: String = "seconds"): Column = unit match {
    case "milliseconds" => unix_millis(c)
    case "nanoseconds" => unix_micros(c) * 1000L
    case _ => unix_timestamp(c)
  }

  // ------------------------------------------------------------ uuid

  /** uuid_v7(ts, entropy...) (uuid_v7.cue): RFC 9562 layout —
    * 48-bit unix-millis, version 7, 74 random bits. The reference draws
    * randomness from an RNG; a distributed engine wants REPRODUCIBLE
    * output, so entropy comes from caller-supplied columns (hash a row
    * key) — same layout, deterministic rows. Time-sortability (the
    * property uuid_v7 exists for) is preserved exactly.
    */
  def uuidV7(ts: Column, entropyA: Column, entropyB: Column): Column = {
    val millis = unix_millis(ts)
    val timeHex = lpad(lower(hex(millis)), 12, "0")
    val ra = lpad(lower(hex(entropyA.cast("long").bitwiseAND(0xfffL))), 3, "0")
    // variant bits 10xx: force the top nibble of the last section to 8-b
    val rb = lower(hex(entropyB.cast("long")
      .bitwiseAND(0x3fffffffffffffffL).bitwiseOR(Long.MinValue)))
    concat(substring(timeHex, 1, 8), lit("-"), substring(timeHex, 9, 4),
      lit("-7"), ra, lit("-"), substring(rb, 1, 4), lit("-"),
      substring(rb, 5, 12))
  }

  /** uuid_v4 from explicit entropy (deterministic analog — see uuidV7). */
  def uuidV4(entropyA: Column, entropyB: Column): Column = {
    val ha = lpad(lower(hex(entropyA.cast("long"))), 16, "0")
    val rb = lower(hex(entropyB.cast("long")
      .bitwiseAND(0x3fffffffffffffffL).bitwiseOR(Long.MinValue)))
    concat(substring(ha, 1, 8), lit("-"), substring(ha, 9, 4), lit("-4"),
      substring(ha, 14, 3), lit("-"), substring(rb, 1, 4), lit("-"),
      substring(rb, 5, 12))
  }

  // ------------------------------------------------------------ ip extras

  /** ip_subnet!(ip, mask) — IPv4, mask as "255.255.255.0" or "/24". */
  def ipSubnet(ip: Column, mask: Column): Column = {
    // try_cast + full-suffix parse + 0..32 gate: a garbage '/ab' mask is
    // an ANSI cast abort with plain cast, and substring(_,2,2) silently
    // TRUNCATED '/123' to 12 and computed a wrong subnet
    val bitsRaw = when(mask.startsWith("/"),
      substring(mask, 2, 1000).try_cast("int")).otherwise(lit(null).cast("int"))
    val bits = when(bitsRaw.between(0, 32), bitsRaw)
    val maskNum = when(bits.isNotNull,
      when(bits === 0, 0L).otherwise(
        lit(4294967295L) - (pow(lit(2.0), lit(32) - bits).cast("long") - 1L)))
      .otherwise(ipAton(mask))
    ipNtoa(ipAton(ip).bitwiseAND(maskNum))
  }

  /** ip_to_ipv6!(ip) → IPv4-mapped form; ipv6_to_ipv4! inverts it. */
  def ipToIpv6(c: Column): Column = concat(lit("::ffff:"), c)
  def ipv6ToIpv4(c: Column): Column = {
    val m = regexp_extract(c, "(?i)^::ffff:((?:\\d{1,3}\\.){3}\\d{1,3})$", 1)
    when(c.rlike("^(?:\\d{1,3}\\.){3}\\d{1,3}$"), c)
      .when(m =!= "", m)
      .otherwise(lit(null).cast("string"))
  }

  // ------------------------------------------------------------ crypto

  /** VRL encrypt!/decrypt! (reference encrypt.cue — AES family). Spark's
    * aes_encrypt embeds the caller-supplied IV in the ciphertext prefix
    * (GCM/CBC), so decrypt needs only the key — pass a fixed IV for
    * deterministic output or omit for a random one per row.
    */
  def encrypt(c: Column, key: Column, iv: Column,
              mode: String = "GCM"): Column =
    aes_encrypt(c, key, lit(mode), lit("DEFAULT"), iv)
  def decrypt(c: Column, key: Column, mode: String = "GCM"): Column =
    // try_: a wrong key / corrupt ciphertext must null the row (the
    // VRL raise channel), not abort the batch with a crypto exception
    try_aes_decrypt(c, key, lit(mode), lit("DEFAULT"))
}
