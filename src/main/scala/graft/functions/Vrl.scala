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
    val num = regexp_extract(c, durRe, 1)
    val unit = regexp_extract(c, durRe, 2)
    val secs = when(num === "", lit(null).cast("double"))
      .otherwise(num.cast("double") *
        when(unit === "ns", 1e-9)
          .when(unit === "us" || unit === "µs", 1e-6)
          .when(unit === "ms", 1e-3)
          .when(unit === "s", 1.0)
          .when(unit === "m", 60.0)
          .when(unit === "h", 3600.0)
          .otherwise(86400.0))
    val div = outputUnit match {
      case "ns" => 1e-9; case "us" => 1e-6; case "ms" => 1e-3
      case "s" => 1.0; case "m" => 60.0; case "h" => 3600.0; case "d" => 86400.0
    }
    secs / div
  }

  /** `parse_int!(s, base)` — e.g. base 16 "ff" → 255. */
  def parseInt(c: Column, base: Int): Column = conv(c, base, 10).cast("long")

  /** `parse_query_string!("a=1&b=2")` → map. Decoding of %-escapes is
    * NOT applied (use urlQueryParam for single decoded keys).
    */
  def parseQueryString(c: Column): Column =
    str_to_map(regexp_replace(c, "^\\?", ""), lit("&"), lit("="))

  // ------------------------------------------------------------ IP math

  /** `ip_aton!("1.2.3.4")` → 16909060 (network-byte-order uint32). */
  def ipAton(c: Column): Column = {
    val o = split(c, "\\.")
    o.getItem(0).cast("long") * 16777216L + o.getItem(1).cast("long") * 65536L +
      o.getItem(2).cast("long") * 256L + o.getItem(3).cast("long")
  }

  /** `ip_ntoa!(16909060)` → "1.2.3.4". */
  def ipNtoa(c: Column): Column = concat_ws(".",
    (c / 16777216L).cast("long") % 256L,
    (c / 65536L).cast("long") % 256L,
    (c / 256L).cast("long") % 256L,
    c.cast("long") % 256L)

  /** `ip_cidr_contains!("10.128.0.0/9", ip)`. `cidr` may be a column
    * (per-row CIDRs) or a literal. Compares the two addresses shifted
    * right by (32 - prefixLen) — exact for /0../32 in double math
    * (values < 2^32 << 2^53).
    */
  def ipCidrContains(cidr: Column, ip: Column): Column = {
    val net = ipAton(split(cidr, "/").getItem(0))
    val plen = split(cidr, "/").getItem(1).cast("int")
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

  /** `snakecase("fooBarBaz")` → "foo_bar_baz". */
  def snakecase(c: Column): Column =
    lower(regexp_replace(c, "([a-z0-9])([A-Z])", "$1_$2"))

  /** `kebabcase("fooBarBaz")` → "foo-bar-baz". */
  def kebabcase(c: Column): Column =
    regexp_replace(snakecase(c), "_", "-")

  /** `camelcase("foo_bar_baz")` → "fooBarBaz". */
  def camelcase(c: Column): Column = {
    val parts = split(c, "_")
    concat(parts.getItem(0),
      array_join(transform(slice(parts, 2, 1000000),
        p => concat(upper(substring(p, 1, 1)), substring(p, 2, 1000000))), ""))
  }

  /** `pascalcase("foo_bar")` → "FooBar". */
  def pascalcase(c: Column): Column = {
    val cam = camelcase(c)
    concat(upper(substring(cam, 1, 1)), substring(cam, 2, 1000000))
  }

  // ------------------------------------------------------------ codecs / hashes

  /** `encode_base64(s)` / `decode_base64!(s)`. */
  def encodeBase64(c: Column): Column = base64(c.cast("binary"))
  def decodeBase64(c: Column): Column = unbase64(c).cast("string")

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
    aes_decrypt(c, key, lit(mode), lit("DEFAULT"))
}
