package org.apache.spark.sql.graftvec

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** VRL long-tail stdlib functions that a declarative Column composition
  * genuinely can't express (real tokenizers, binary decoders, JDK crypto)
  * — each a Catalyst expression so it stays inside the plan (no Scala
  * UDF registration, no Row boxing). `CodegenFallback` throughout: the
  * work is string/crypto kernels, not per-call dispatch, so generated
  * fusion buys nothing (same trade as CodecExpressions).
  *
  * Reference behavior: website/cue/reference/remap/functions/ cue files
  * (parse_cbor, parse_ruby_hash, decode_mime_q, encode_punycode,
  * seahash, shannon_entropy, community_id, hmac, sha3,
  * uuid_from_friendly_id, parse_etld). Every non-obvious algorithm below
  * is a public formulation (CBOR RFC 8949, SeaHash by ticki, Community
  * ID v1 spec by Corelight, Mozilla Public Suffix List algorithm).
  */
object StringExpressions {

  /** string → string helpers share this skeleton. Declared nullable
    * unconditionally: mapStr returning null is the per-row raise
    * channel, and the default child-derived nullability would let the
    * optimizer fold `IsNull(f(x))` to false over a non-null child,
    * silently disabling that channel (same hazard the binary codecs
    * document). A thrown exception from mapStr also degrades to null —
    * hostile log data must never abort the job.
    */
  abstract class StrMapper extends UnaryExpression
      with ImplicitCastInputTypes with CodegenFallback {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def nullIntolerant: Boolean = true
    def mapStr(s: String): String
    override def nullSafeEval(v: Any): Any = {
      val r = try mapStr(v.asInstanceOf[UTF8String].toString)
              catch { case scala.util.control.NonFatal(_) => null }
      if (r == null) null else UTF8String.fromString(r)
    }
  }

  // ---------------------------------------------------------- punycode

  /** encode_punycode/decode_punycode (encode_punycode.cue) — IDNA via
    * the JDK. `toASCII` runs Nameprep, so mixed-case input lowercases
    * exactly like the reference's `idna` crate.
    */
  case class PunycodeEncode(child: Expression) extends StrMapper {
    override def prettyName: String = "encode_punycode"
    override def mapStr(s: String): String =
      if (s.isEmpty) s else java.net.IDN.toASCII(s, java.net.IDN.ALLOW_UNASSIGNED)
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  case class PunycodeDecode(child: Expression) extends StrMapper {
    override def prettyName: String = "decode_punycode"
    override def mapStr(s: String): String =
      if (s.isEmpty) s else java.net.IDN.toUnicode(s, java.net.IDN.ALLOW_UNASSIGNED)
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  // ---------------------------------------------------------- MIME Q/B

  private val mimeWordRe =
    "=\\?([^?]+)\\?([QqBb])\\?([^?]*)\\?=".r

  /** decode_mime_q (decode_mime_q.cue): RFC 2047 encoded-words, B
    * (base64) and Q (quoted-printable, `_` = space) forms, any JDK
    * charset; non-encoded spans pass through untouched. A malformed
    * word (bad hex escape, unknown charset, invalid base64) is kept
    * verbatim per RFC 2047 §6.3 — never a per-row exception that would
    * abort the job.
    */
  case class MimeQDecode(child: Expression) extends StrMapper {
    override def prettyName: String = "decode_mime_q"
    private val bareRe = "^\\?([QqBb])\\?(.*?)(?:\\?=)?$".r
    override def mapStr(s: String): String = {
      // charset-less bare form "?b?…" (decode_mime_q.cue "Without
      // charset"): whole-string encoded word, charset defaults utf-8
      bareRe.findFirstMatchIn(s) match {
        case Some(m) if !s.startsWith("=?") =>
          return mapStr(s"=?utf-8?${m.group(1)}?${m.group(2)}?=")
        case _ => ()
      }
      mimeWordRe.replaceAllIn(s, m => try {
        val cs = java.nio.charset.Charset.forName(m.group(1))
        val bytes = m.group(2).toUpperCase match {
          case "B" => java.util.Base64.getDecoder.decode(m.group(3))
          case _ =>
            val q = m.group(3)
            val out = new java.io.ByteArrayOutputStream()
            var i = 0
            while (i < q.length) {
              q.charAt(i) match {
                case '_' => out.write(' '); i += 1
                case '=' if i + 2 < q.length =>
                  out.write(Integer.parseInt(q.substring(i + 1, i + 3), 16)); i += 3
                case c => out.write(c.toInt); i += 1
              }
            }
            out.toByteArray
        }
        scala.util.matching.Regex.quoteReplacement(new String(bytes, cs))
      } catch {
        case scala.util.control.NonFatal(_) =>
          scala.util.matching.Regex.quoteReplacement(m.matched)
      })
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  // ---------------------------------------------------------- CBOR

  /** parse_cbor (parse_cbor.cue): CBOR (RFC 8949) → JSON text, feed to
    * from_json/parse_json downstream for typed access. Byte strings
    * render as base64 strings (the JSON mapping RFC 8949 §6.1 suggests);
    * u64 beyond Long range renders unsigned; indefinite-length items and
    * tags (ignored) are handled.
    *
    * Malformed/hostile bytes (truncated containers, bad info bytes,
    * nesting deeper than [[CborToJson.MaxDepth]] — which would otherwise
    * overflow the executor stack) degrade the row to null; declared
    * nullable unconditionally so the null survives the optimizer (same
    * contract as the CodecExpressions decoders).
    */
  object CborToJson {
    /** Container-nesting bound: one JVM stack frame per level, so 512
      * keeps hostile deep nesting far from StackOverflowError (an Error,
      * uncatchable by the per-row guard) while admitting any real event.
      */
    val MaxDepth = 512
  }

  case class CborToJson(child: Expression) extends UnaryExpression
      with ImplicitCastInputTypes with CodegenFallback {
    override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true
    override def nullable: Boolean = true
    override def prettyName: String = "parse_cbor"

    override def nullSafeEval(v: Any): Any = try {
      val buf = ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      val sb = new java.lang.StringBuilder()
      decodeItem(buf, sb)
      UTF8String.fromString(sb.toString)
    } catch { case scala.util.control.NonFatal(_) => null }

    private def jsonEscapeTo(sb: java.lang.StringBuilder, s: String): Unit = {
      sb.append('"')
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        c match {
          case '"' => sb.append("\\\"")
          case '\\' => sb.append("\\\\")
          case '\n' => sb.append("\\n")
          case '\r' => sb.append("\\r")
          case '\t' => sb.append("\\t")
          case ch if ch < 0x20 => sb.append(f"\\u${ch.toInt}%04x")
          case ch => sb.append(ch)
        }
        i += 1
      }
      sb.append('"')
    }

    /** Returns the unsigned argument for (major, info); -1 = indefinite. */
    private def readArg(buf: ByteBuffer, info: Int): Long = info match {
      case n if n < 24 => n.toLong
      case 24 => buf.get() & 0xffL
      case 25 => buf.getShort() & 0xffffL
      case 26 => buf.getInt() & 0xffffffffL
      case 27 => buf.getLong()
      case 31 => -1L
      case n => throw new IllegalArgumentException(s"cbor: bad additional info $n")
    }

    private def readBytes(buf: ByteBuffer, n: Long): Array[Byte] = {
      require(n >= 0 && n <= buf.remaining(), s"cbor: length $n out of range")
      val a = new Array[Byte](n.toInt); buf.get(a); a
    }

    private def halfToDouble(h: Int): Double = {
      val exp = (h >> 10) & 0x1f
      val mant = h & 0x3ff
      val sign = if ((h & 0x8000) != 0) -1.0 else 1.0
      val mag =
        if (exp == 0) math.pow(2, -24) * mant
        else if (exp != 31) math.pow(2, exp - 25) * (1024 + mant)
        else if (mant == 0) Double.PositiveInfinity
        else Double.NaN
      sign * mag
    }

    private def appendNum(sb: java.lang.StringBuilder, d: Double): Unit =
      if (d.isNaN || d.isInfinite) sb.append("null") // JSON has no NaN/Inf
      else if (d == d.toLong && math.abs(d) < 1e15) sb.append(d.toLong)
      else sb.append(d)

    /** Decode one item; `asKey` forces a JSON-string rendering: RFC
      * 8949 §6.1 permits any key type — a non-string key renders to its
      * JSON text and is then quoted whole (so float / array / map keys
      * still yield valid JSON, not bare `{1.5:...}`). `depth` bounds
      * container nesting (each level is one JVM stack frame).
      */
    private def decodeItem(buf: ByteBuffer, sb: java.lang.StringBuilder,
                           asKey: Boolean = false, depth: Int = 0): Unit = {
      if (depth > CborToJson.MaxDepth)
        throw new IllegalArgumentException("cbor: nesting too deep")
      if (asKey) {
        val tmp = new java.lang.StringBuilder()
        decodeItem(buf, tmp, depth = depth)
        val s = tmp.toString
        if (s.length > 0 && s.charAt(0) == '"') sb.append(s)
        else jsonEscapeTo(sb, s)
        return
      }
      val ib = buf.get() & 0xff
      val major = ib >> 5
      val info = ib & 0x1f
      major match {
        case 0 =>
          // info 31 (indefinite) is illegal for ints — and must be
          // caught by info, not by readArg's -1 sentinel, which is
          // also a legitimate u64 0xFFFF... via info 27
          if (info == 31) throw new IllegalArgumentException("cbor: indefinite int")
          sb.append(java.lang.Long.toUnsignedString(readArg(buf, info)))
        case 1 =>
          if (info == 31) throw new IllegalArgumentException("cbor: indefinite int")
          val n = readArg(buf, info)
          if (n >= 0) sb.append((-1L - n).toString)
          else throw new IllegalArgumentException("cbor: negative int beyond i64")
        case 2 => // bytes → base64 string
          val b = strChunks(buf, info, major)
          jsonEscapeTo(sb, java.util.Base64.getEncoder.encodeToString(b))
        case 3 =>
          jsonEscapeTo(sb, new String(strChunks(buf, info, major), UTF_8))
        case 4 =>
          val n = readArg(buf, info)
          sb.append('[')
          var i = 0L
          var break = false
          while (!break && (if (n < 0) true else i < n)) {
            if (n < 0 && peek(buf) == 0xff) { buf.get(); break = true }
            else {
              if (i > 0) sb.append(',')
              decodeItem(buf, sb, depth = depth + 1); i += 1
            }
          }
          sb.append(']')
        case 5 =>
          val n = readArg(buf, info)
          sb.append('{')
          var i = 0L
          var break = false
          while (!break && (if (n < 0) true else i < n)) {
            if (n < 0 && peek(buf) == 0xff) { buf.get(); break = true }
            else {
              if (i > 0) sb.append(',')
              decodeItem(buf, sb, asKey = true, depth = depth + 1)
              sb.append(':')
              decodeItem(buf, sb, depth = depth + 1); i += 1
            }
          }
          sb.append('}')
        case 6 => // tag: ignore, decode the tagged item (asKey handled
          // by the early-return path above, so it is always false here)
          readArg(buf, info); decodeItem(buf, sb, depth = depth + 1)
        case 7 => info match {
          case 20 => sb.append("false")
          case 21 => sb.append("true")
          case 22 | 23 => sb.append("null")
          case 25 => appendNum(sb, halfToDouble(buf.getShort() & 0xffff))
          case 26 => appendNum(sb, java.lang.Float.intBitsToFloat(buf.getInt()).toDouble)
          case 27 => appendNum(sb, java.lang.Double.longBitsToDouble(buf.getLong()))
          case n if n < 24 => sb.append(n.toString) // simple value
          case 24 => sb.append((buf.get() & 0xff).toString)
          case n => throw new IllegalArgumentException(s"cbor: bad simple $n")
        }
      }
    }

    private def peek(buf: ByteBuffer): Int = buf.get(buf.position()) & 0xff

    /** Definite or indefinite (chunked) string/bytes payload. */
    private def strChunks(buf: ByteBuffer, info: Int, major: Int): Array[Byte] = {
      val n = readArg(buf, info)
      if (n >= 0) readBytes(buf, n)
      else {
        val out = new java.io.ByteArrayOutputStream()
        while (peek(buf) != 0xff) {
          val ib = buf.get() & 0xff
          require(ib >> 5 == major, "cbor: mixed chunk major type")
          out.write(readBytes(buf, readArg(buf, ib & 0x1f)))
        }
        buf.get()
        out.toByteArray
      }
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  // ---------------------------------------------------------- ruby hash

  /** parse_ruby_hash (parse_ruby_hash.cue): ruby hash literal → JSON
    * text. Real tokenizer (strings can contain `=>`/`,`/`}`): handles
    * `"k" => v`, `:sym => v`, single-quoted strings, nil/true/false,
    * nested hashes and arrays, numbers.
    */
  case class RubyHashToJson(child: Expression) extends StrMapper {
    override def prettyName: String = "parse_ruby_hash"

    /** One string-content char → valid JSON string content. Quoted ruby
      * strings carry raw control chars (a multi-line message inspected
      * into a log) that strict JSON parsers reject unescaped.
      */
    private def appendJsonChar(sb: java.lang.StringBuilder, ch: Char): Unit =
      ch match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }

    override def mapStr(s: String): String = {
      val sb = new java.lang.StringBuilder(s.length)
      var i = 0
      val n = s.length
      def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'
      while (i < n) {
        val c = s.charAt(i)
        c match {
          case '"' => // double-quoted: decode ruby escapes, re-escape as JSON
            sb.append('"'); i += 1
            while (i < n && s.charAt(i) != '"') {
              if (s.charAt(i) == '\\' && i + 1 < n) {
                // ruby's escape set is wider than JSON's (\e \a \v \0
                // \s...); decode to the char, then re-encode JSON-safely
                s.charAt(i + 1) match {
                  case 'n' => sb.append("\\n")
                  case 'r' => sb.append("\\r")
                  case 't' => sb.append("\\t")
                  case 'b' => sb.append("\\b")
                  case 'f' => sb.append("\\f")
                  case 'a' => sb.append("\\u0007")
                  case 'e' => sb.append("\\u001b")
                  case 'v' => sb.append("\\u000b")
                  case '0' => sb.append("\\u0000")
                  case 's' => sb.append(' ')
                  case 'u' if i + 5 < n => sb.append('\\').append('u')
                    .append(s, i + 2, i + 6); i += 4
                  case 'x' if i + 3 < n => sb.append("\\u00")
                    .append(s, i + 2, i + 4); i += 2
                  case other => appendJsonChar(sb, other)
                }
                i += 2
              }
              else { appendJsonChar(sb, s.charAt(i)); i += 1 }
            }
            sb.append('"'); i += 1
          case '\'' => // single-quoted: only \' and \\ are escapes in ruby
            sb.append('"'); i += 1
            while (i < n && s.charAt(i) != '\'') {
              s.charAt(i) match {
                case '\\' if i + 1 < n && (s.charAt(i + 1) == '\'' || s.charAt(i + 1) == '\\') =>
                  if (s.charAt(i + 1) == '\\') sb.append("\\\\") else sb.append('\'')
                  i += 2
                case ch => appendJsonChar(sb, ch); i += 1
              }
            }
            sb.append('"'); i += 1
          case d if d.isDigit || (d == '-' && i + 1 < n && s.charAt(i + 1).isDigit) =>
            // numeric literal: ruby prints wide-range floats in
            // scientific notation ("1.0e+20") and allows 1_000 /
            // 0x1f forms; char-by-char passthrough would split the
            // exponent into a bareword and emit unparseable JSON
            val start = i
            if (d == '-') i += 1
            if (i + 1 < n && s.charAt(i) == '0' &&
                (s.charAt(i + 1) == 'x' || s.charAt(i + 1) == 'X')) {
              i += 2
              val hs = i
              while (i < n && (s.charAt(i).isDigit || "abcdefABCDEF_".indexOf(s.charAt(i)) >= 0)) i += 1
              val hex = s.substring(hs, i).replace("_", "")
              val neg = d == '-'
              sb.append(if (neg) "-" else "").append(
                if (hex.isEmpty) "0" else new java.math.BigInteger(hex, 16).toString)
            } else {
              while (i < n && (s.charAt(i).isDigit || s.charAt(i) == '_')) i += 1
              if (i + 1 < n && s.charAt(i) == '.' && s.charAt(i + 1).isDigit) {
                i += 1
                while (i < n && (s.charAt(i).isDigit || s.charAt(i) == '_')) i += 1
              }
              if (i < n && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
                var j = i + 1
                if (j < n && (s.charAt(j) == '+' || s.charAt(j) == '-')) j += 1
                if (j < n && s.charAt(j).isDigit) {
                  i = j
                  while (i < n && s.charAt(i).isDigit) i += 1
                }
              }
              // JSON has no '+' exponent sign restriction ("1e+20" is
              // valid) but no underscores
              sb.append(s.substring(start, i).replace("_", ""))
            }
          case '=' if i + 1 < n && s.charAt(i + 1) == '>' =>
            sb.append(':'); i += 2
          case ':' if i + 1 < n && (s.charAt(i + 1).isLetter || s.charAt(i + 1) == '_') =>
            // :symbol key → "symbol"
            val start = i + 1
            i += 1
            while (i < n && isWordChar(s.charAt(i))) i += 1
            sb.append('"').append(s, start, i).append('"')
          case ch if ch.isLetter =>
            val start = i
            while (i < n && isWordChar(s.charAt(i))) i += 1
            val w = s.substring(start, i)
            sb.append(w match {
              case "nil" => "null"
              case "true" | "false" => w
              case other => "\"" + other + "\"" // bareword → string
            })
          case ch if ch.isWhitespace => i += 1
          case ch => sb.append(ch); i += 1
        }
      }
      sb.toString
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  // ---------------------------------------------------------- seahash

  /** seahash (seahash.cue) — ticki's SeaHash, the reference's
    * shard-stable fast hash. Public algorithm: 4-lane u64 state, diffuse
    * = multiply/xor-shift/multiply, little-endian 8-byte chunks, tail
    * zero-extended, finalized with the byte length.
    */
  case class SeaHash(child: Expression) extends UnaryExpression
      with ImplicitCastInputTypes with CodegenFallback {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "seahash"

    private def diffuse(x0: Long): Long = {
      var x = x0 * 0x6eed0e9da4d94a4fL
      val a = x >>> 32
      val b = x >>> 60
      x ^= a >>> b
      x * 0x6eed0e9da4d94a4fL
    }

    override def nullSafeEval(v: Any): Any = {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      var a = 0x16f11fe89b0d677cL; var b = 0xb480a793d8e6c86cL
      var c = 0x6fe2e5aaf078ebc9L; var d = 0x14f994a4c5259381L
      var i = 0
      val full = bytes.length - (bytes.length % 8)
      while (i < full) {
        // manual little-endian read: this sits on Sample's per-row hot
        // path, and a ByteBuffer wrapper per 8-byte chunk is ~128
        // allocations per KB of message
        val n = (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
          ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24) |
          ((bytes(i + 4) & 0xffL) << 32) | ((bytes(i + 5) & 0xffL) << 40) |
          ((bytes(i + 6) & 0xffL) << 48) | ((bytes(i + 7) & 0xffL) << 56)
        val t = diffuse(a ^ n)
        a = b; b = c; c = d; d = t
        i += 8
      }
      if (i < bytes.length) {
        var n = 0L; var sh = 0
        while (i < bytes.length) { n |= (bytes(i) & 0xffL) << sh; sh += 8; i += 1 }
        val t = diffuse(a ^ n)
        a = b; b = c; c = d; d = t
      }
      diffuse(a ^ b ^ c ^ d ^ bytes.length.toLong)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  // ---------------------------------------------------------- entropy

  /** shannon_entropy (shannon_entropy.cue): Shannon entropy in bits
    * over the UTF-8 BYTE distribution of the string (the reference's
    * default byte segmentation).
    */
  /** `segmentation`: "bytes" (default) or "grapheme" — the reference
    * counts symbol frequencies over the chosen segmentation
    * (shannon_entropy.cue); graphemes via the JDK BreakIterator.
    */
  case class ShannonEntropy(child: Expression, segmentation: String = "bytes")
      extends UnaryExpression
      with ImplicitCastInputTypes with CodegenFallback {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "shannon_entropy"
    override def nullSafeEval(v: Any): Any = {
      val syms: Seq[Any] =
        if (segmentation == "grapheme") {
          val str = v.asInstanceOf[UTF8String].toString
          val it = java.text.BreakIterator.getCharacterInstance(java.util.Locale.ROOT)
          it.setText(str)
          val out = scala.collection.mutable.ArrayBuffer.empty[Any]
          var start = it.first(); var end = it.next()
          while (end != java.text.BreakIterator.DONE) {
            out += str.substring(start, end); start = end; end = it.next()
          }
          out.toSeq
        } else v.asInstanceOf[UTF8String].getBytes.toSeq
      if (syms.isEmpty) 0.0
      else {
        val counts = syms.groupBy(identity).values.map(_.size)
        val n = syms.length.toDouble
        var h = 0.0
        counts.foreach { c =>
          if (c > 0) { val p = c / n; h -= p * (math.log(p) / math.log(2)) }
        }
        h
      }
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  // ---------------------------------------------------------- crypto

  /** hmac (hmac.cue, default SHA-256) — returns raw bytes; compose with
    * encode_base64/encode_base16 exactly like the reference examples.
    */
  case class HmacBytes(left: Expression, right: Expression, algorithm: String)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with ImplicitCastInputTypes with CodegenFallback {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
    override def dataType: DataType = BinaryType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "hmac"
    private val jcaName = "Hmac" + algorithm.replace("-", "")
    override def nullSafeEval(data: Any, key: Any): Any = {
      val mac = javax.crypto.Mac.getInstance(jcaName)
      mac.init(new javax.crypto.spec.SecretKeySpec(
        key.asInstanceOf[UTF8String].getBytes, jcaName))
      mac.doFinal(data.asInstanceOf[UTF8String].getBytes)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** sha3 (sha3.cue, default SHA3-512) — hex digest via the JDK's SHA3. */
  case class Sha3Hex(child: Expression, variant: String) extends StrMapper {
    override def prettyName: String = "sha3"
    override def mapStr(s: String): String = {
      val d = java.security.MessageDigest.getInstance(variant)
        .digest(s.getBytes(UTF_8))
      d.map(b => f"$b%02x").mkString
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  // ---------------------------------------------------------- community id

  /** community_id (community_id.cue) — Community ID v1 flow hash
    * (public spec by Corelight): seed:u16BE ++ min(endpoint) ++
    * max(endpoint) ++ proto:u8 ++ 0:u8 ++ ports (u16BE each, ordered
    * with their address), SHA-1, base64, "1:" prefix. IPv4 dotted-quad
    * addresses (IPv6 via InetAddress would extend the byte layout).
    *
    * Per the spec, the port segment applies only to TCP/UDP/SCTP and
    * ICMP/ICMPv6; for ICMP the "ports" are (type, code) with the type
    * mapped to its bidirectional peer (echo request↔reply, …) — an
    * unmapped type makes the flow one-way (endpoint order preserved).
    * Any other protocol hashes without the port segment and orders
    * endpoints by address alone.
    *
    * `portsProvided` is the PLAN-TIME fact that the caller supplied port
    * arguments (the cue signature marks them optional). With it set, a
    * runtime-null port (malformed cast, missing field) nulls the row —
    * the raise channel — rather than silently hashing the port-less
    * layout, which would mint a valid-looking ID for a different flow
    * key. Without it, the port-less layout is the contract.
    */
  case class CommunityId(children: IndexedSeq[Expression], seed: Int,
                         portsProvided: Boolean = true)
      extends Expression with CodegenFallback {
    require(children.length == 5,
      "community_id(saddr, daddr, sport, dport, proto)")
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "community_id"

    /** Dotted-quad → 4 bytes; null (→ null result) when malformed —
      * the VRL fallible-error analog, matching the other parsers.
      */
    private def ipBytes(s: String): Array[Byte] = {
      val parts = s.split('.')
      if (parts.length != 4) return null
      val out = new Array[Byte](4)
      var i = 0
      while (i < 4) {
        val o = try parts(i).toInt catch { case _: NumberFormatException => -1 }
        if (o < 0 || o > 255) return null
        out(i) = o.toByte; i += 1
      }
      out
    }

    /** ICMP / ICMPv6 type → bidirectional peer type (spec's port
      * equivalents tables; an absent key means a one-way flow).
      */
    private val icmp4Peer = Map(8 -> 0, 0 -> 8, 13 -> 14, 14 -> 13,
      15 -> 16, 16 -> 15, 9 -> 10, 10 -> 9, 17 -> 18, 18 -> 17)
    private val icmp6Peer = Map(128 -> 129, 129 -> 128, 133 -> 134,
      134 -> 133, 135 -> 136, 136 -> 135, 130 -> 131, 131 -> 130,
      139 -> 140, 140 -> 139, 144 -> 145, 145 -> 144)

    override def eval(input: InternalRow): Any = {
      val vs = children.map(_.eval(input))
      // addresses and protocol are required; ports only when provided
      if (vs(0) == null || vs(1) == null || vs(4) == null) return null
      if (portsProvided && (vs(2) == null || vs(3) == null)) return null
      val saddr = vs(0).asInstanceOf[UTF8String].toString
      val daddr = vs(1).asInstanceOf[UTF8String].toString
      val proto = vs(4).asInstanceOf[Number].intValue()
      val sb = ipBytes(saddr); val db = ipBytes(daddr)
      if (sb == null || db == null) return null
      val spOpt = Option(vs(2)).map(_.asInstanceOf[Number].intValue())
      val dpOpt = Option(vs(3)).map(_.asInstanceOf[Number].intValue())
      // (port1, port2, oneWay): ICMP maps (type, code) → (type, peer);
      // unmapped type = one-way. Non-port protocols carry no segment.
      var oneWay = false
      val ports: Option[(Int, Int)] = (proto, spOpt, dpOpt) match {
        case (1, Some(t), Some(c)) => Some(icmp4Peer.get(t) match {
          case Some(peer) => (t, peer)
          case None => oneWay = true; (t, c)
        })
        case (58, Some(t), Some(c)) => Some(icmp6Peer.get(t) match {
          case Some(peer) => (t, peer)
          case None => oneWay = true; (t, c)
        })
        case (6 | 17 | 132, Some(sp), Some(dp)) => Some((sp, dp))
        case _ => None
      }
      // canonical order: smaller (addr[, port]) endpoint first, except
      // one-way flows which keep their original direction
      val addrCmp = java.util.Arrays.compareUnsigned(sb, db)
      val flip = !oneWay && (ports match {
        case Some((sp, dp)) => addrCmp > 0 || (addrCmp == 0 && sp > dp)
        case None => addrCmp > 0
      })
      val (a1, a2) = if (flip) (db, sb) else (sb, db)
      val buf = ByteBuffer.allocate(
        2 + a1.length + a2.length + 2 + (if (ports.isDefined) 4 else 0))
      buf.putShort(seed.toShort).put(a1).put(a2)
        .put(proto.toByte).put(0.toByte)
      ports.foreach { case (sp, dp) =>
        val (p1, p2) = if (flip) (dp, sp) else (sp, dp)
        buf.putShort(p1.toShort).putShort(p2.toShort)
      }
      val sha = java.security.MessageDigest.getInstance("SHA-1").digest(buf.array())
      UTF8String.fromString("1:" + java.util.Base64.getEncoder.encodeToString(sha))
    }
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): Expression = copy(children = cs)
  }

  // ---------------------------------------------------------- friendly id

  /** uuid_from_friendly_id (uuid_from_friendly_id.cue): base62
    * (0-9A-Za-z) decode of a 128-bit integer → canonical UUID text.
    */
  case class UuidFromFriendlyId(child: Expression) extends StrMapper {
    override def prettyName: String = "uuid_from_friendly_id"
    private val alphabet = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    override def mapStr(s: String): String = {
      // a non-base62 char or a value past 2^128 is a malformed id:
      // null (the raise channel), never a thrown per-row error and
      // never a silent mod-2^128 truncation to a wrong-but-valid UUID
      var v = java.math.BigInteger.ZERO
      val base = java.math.BigInteger.valueOf(62)
      var i = 0
      while (i < s.length) {
        val d = alphabet.indexOf(s.charAt(i))
        if (d < 0) return null
        v = v.multiply(base).add(java.math.BigInteger.valueOf(d))
        i += 1
      }
      if (v.bitLength > 128) return null
      val hex = ("0" * 32 + v.toString(16)).takeRight(32)
      s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-${hex.substring(16, 20)}-${hex.substring(20)}"
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  // ---------------------------------------------------------- eTLD

  /** parse_etld (parse_etld.cue): effective TLD via the Mozilla Public
    * Suffix List ALGORITHM (exact rules, `*.x` wildcards, `!x`
    * exceptions; longest match wins; unknown → last label with
    * known_suffix=false). The rule SET is data: callers pass the full
    * PSL for production parity; `graft.functions.Etld.DefaultSuffixes`
    * ships a common subset.
    */
  case class EtldExtract(child: Expression, suffixes: Seq[String], plusParts: Int)
      extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = StructType(Seq(
      StructField("etld", StringType), StructField("etld_plus", StringType),
      StructField("known_suffix", BooleanType)))
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "parse_etld"

    @transient private lazy val exact = suffixes.filterNot(s =>
      s.startsWith("*.") || s.startsWith("!")).toSet
    @transient private lazy val wildcard = suffixes.collect {
      case s if s.startsWith("*.") => s.drop(2) }.toSet
    @transient private lazy val exception = suffixes.collect {
      case s if s.startsWith("!") => s.drop(1) }.toSet

    override def nullSafeEval(v: Any): Any = {
      // Locale.ROOT: a tr_TR executor's default-locale lowercase maps
      // 'I' to dotless 'ı', un-matching ASCII suffixes — results must
      // not depend on the executor's JVM locale
      val host = v.asInstanceOf[UTF8String].toString
        .toLowerCase(java.util.Locale.ROOT).stripSuffix(".")
      val labels = host.split('.')
      // walk suffix candidates longest-first; first match wins, with
      // exception rules (!x) overriding wildcard rules (*.x) per the
      // PSL algorithm
      var suffixLen = 0 // in labels
      var known = false
      var i = 0
      while (i < labels.length && suffixLen == 0) {
        val nLabels = labels.length - i
        val cand = labels.drop(i).mkString(".")
        val parent = labels.drop(i + 1).mkString(".")
        if (exception.contains(cand)) {
          // exception rule: the suffix is the rule minus its first label
          suffixLen = nLabels - 1; known = true
        } else if (exact.contains(cand) ||
            (nLabels >= 2 && wildcard.contains(parent))) {
          suffixLen = nLabels; known = true
        } else i += 1
      }
      if (suffixLen == 0) suffixLen = 1 // unknown: last label
      val etld = labels.takeRight(suffixLen).mkString(".")
      // clamped to the whole host when the host IS a suffix (e.g.
      // plus_parts=1 on bare "com"): the reference's take-N-labels
      // construction clamps the same way, so etld_plus degrades to the
      // suffix itself rather than nulling — strict-PSL callers gate on
      // known_suffix && etld_plus != etld
      val plusLen = math.min(labels.length, suffixLen + plusParts)
      val etldPlus = labels.takeRight(plusLen).mkString(".")
      InternalRow(UTF8String.fromString(etld), UTF8String.fromString(etldPlus),
        known)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  // ---------------------------------------------------------- ip crypto

  /** encrypt_ip / decrypt_ip, `aes128` mode (encrypt_ip.cue; the
    * ipcrypt-deterministic construction): the address as 16 bytes
    * (IPv4 enters as its IPv4-mapped ::ffff:a.b.c.d form), one
    * AES-128-ECB block, rendered as IPv6 text. Format-preserving and
    * deterministic — spec pins the cue's own vectors. The `pfx`
    * prefix-preserving mode is not implemented (documented out).
    */
  abstract class IpCryptBase extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with ImplicitCastInputTypes with CodegenFallback {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
    override def dataType: DataType = StringType
    // null is the raise channel ("invalid ip or key"): unconditional, or
    // the optimizer folds IsNull away over non-null children
    override def nullable: Boolean = true
    override def nullIntolerant: Boolean = true
    /** null (not an exception) on a wrong-length key. */
    protected def cipher(key: Array[Byte], mode: Int): javax.crypto.Cipher = {
      if (key.length != 16) return null // aes128 needs a 16-byte key
      val c = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
      c.init(mode, new javax.crypto.spec.SecretKeySpec(key, "AES"))
      c
    }
    /** LITERAL-only address parse, null on anything else. Never hands
      * the string to a resolver: `InetAddress.getByName` falls back to
      * per-row (blocking) DNS for any input it can't read as a literal
      * — e.g. "999.1.1.1" or plain garbage — which both leaks log data
      * to the resolver and throws instead of degrading the row.
      * Dotted-quad is parsed by hand; a string containing ':' can only
      * be an IPv6 literal to the JDK (hostnames cannot contain ':'),
      * so getByName is resolver-free on that branch.
      */
    protected def addrBytes(s: String): Array[Byte] = {
      val raw: Array[Byte] =
        if (s.indexOf(':') >= 0) {
          // the JDK collapses "::ffff:a.b.c.d" to an Inet4Address —
          // both branches can yield 4 bytes, mapped below
          try java.net.InetAddress.getByName(s).getAddress
          catch { case scala.util.control.NonFatal(_) => return null }
        } else {
          val parts = s.split('.')
          if (parts.length != 4) return null
          val v4 = new Array[Byte](4)
          var i = 0
          while (i < 4) {
            val p = parts(i)
            if (p.isEmpty || p.length > 3 || !p.forall(_.isDigit)) return null
            val o = p.toInt
            if (o > 255) return null
            v4(i) = o.toByte; i += 1
          }
          v4
        }
      if (raw.length == 16) raw
      else {
        val out = new Array[Byte](16) // IPv4 → IPv4-mapped IPv6
        out(10) = 0xff.toByte; out(11) = 0xff.toByte
        System.arraycopy(raw, 0, out, 12, 4)
        out
      }
    }
  }

  /** Prefix-preserving bit cipher (the Xu-Fan-Ammar / Crypto-PAn
    * construction with AES-128 as the per-prefix PRF, key = first 16
    * of the 32-byte pfx key, pad block = AES(K, second 16)): output
    * bit i = input bit i XOR MSB(AES_K(pad with the first i input
    * bits spliced in)). Two addresses sharing a k-bit prefix encrypt
    * to outputs sharing a k-bit prefix — the property `pfx` mode
    * exists for. DOCUMENTED DIVERGENCE: the reference delegates to
    * the external ipcrypt-pfx construction (not vendored, vectors not
    * reproducible offline); this is the same classic algorithm family
    * with round-trip identity and the prefix property spec-verified.
    */
  private[graftvec] object PfxCipher {
    private def aes(key: Array[Byte]): javax.crypto.Cipher = {
      val c = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"))
      c
    }
    private def bit(b: Array[Byte], i: Int): Int = (b(i / 8) >> (7 - i % 8)) & 1
    private def setBit(b: Array[Byte], i: Int, v: Int): Unit = {
      val m = 1 << (7 - i % 8)
      if (v != 0) b(i / 8) = (b(i / 8) | m).toByte
      else b(i / 8) = (b(i / 8) & ~m).toByte
    }
    def apply(key32: Array[Byte], in: Array[Byte], decrypt: Boolean): Array[Byte] = {
      require(key32.length == 32, "pfx mode needs a 32-byte key")
      val c = aes(key32.take(16))
      val pad = c.doFinal(key32.drop(16))
      val out = new Array[Byte](16)
      val plain = new Array[Byte](16) // the PREFIX source (plaintext bits)
      var i = 0
      while (i < 128) {
        val block = pad.clone()
        var j = 0
        while (j < i) { setBit(block, j, bit(plain, j)); j += 1 }
        val prf = bit(c.doFinal(block), 0)
        val inBit = bit(in, i)
        val outBit = inBit ^ prf
        setBit(out, i, outBit)
        // decrypt: the plaintext bit is the OUTPUT bit
        setBit(plain, i, if (decrypt) outBit else inBit)
        i += 1
      }
      out
    }
  }

  case class EncryptIp(left: Expression, right: Expression, mode: String = "aes128")
      extends IpCryptBase {
    override def prettyName: String = "encrypt_ip"
    override def nullSafeEval(ip: Any, key: Any): Any = {
      val keyB = key.asInstanceOf[UTF8String].getBytes
      val addr = addrBytes(ip.asInstanceOf[UTF8String].toString)
      if (addr == null) return null
      val enc = mode match {
        case "pfx" =>
          if (keyB.length != 32) return null
          PfxCipher(keyB, addr, decrypt = false)
        case _ =>
          val c = cipher(keyB, javax.crypto.Cipher.ENCRYPT_MODE)
          if (c == null) return null
          c.doFinal(addr)
      }
      UTF8String.fromString(
        java.net.InetAddress.getByAddress(enc).getHostAddress)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  case class DecryptIp(left: Expression, right: Expression, mode: String = "aes128")
      extends IpCryptBase {
    override def prettyName: String = "decrypt_ip"
    override def nullSafeEval(ip: Any, key: Any): Any = {
      val keyB = key.asInstanceOf[UTF8String].getBytes
      val addr = addrBytes(ip.asInstanceOf[UTF8String].toString)
      if (addr == null) return null
      val dec = mode match {
        case "pfx" =>
          if (keyB.length != 32) return null
          PfxCipher(keyB, addr, decrypt = true)
        case _ =>
          val c = cipher(keyB, javax.crypto.Cipher.DECRYPT_MODE)
          if (c == null) return null
          c.doFinal(addr)
      }
      // IPv4-mapped → dotted quad, else IPv6 text
      val isV4 = dec.take(10).forall(_ == 0) && dec(10) == 0xff.toByte &&
        dec(11) == 0xff.toByte
      val out =
        if (isV4) java.net.InetAddress.getByAddress(dec.takeRight(4))
        else java.net.InetAddress.getByAddress(dec)
      UTF8String.fromString(out.getHostAddress)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  // ---------------------------------------------------------- flatten

  /** VRL flatten on OBJECTS (flatten.cue: nested keys join with "."):
    * JSON text → JSON text with dot-joined keys. Arrays stay values
    * (the array form of flatten is Spark's own `flatten`). Jackson
    * (bundled with Spark) does the tree walk — order-preserving.
    */
  case class JsonFlatten(child: Expression) extends StrMapper {
    override def prettyName: String = "flatten_object"
    override def mapStr(s: String): String = {
      import com.fasterxml.jackson.databind.ObjectMapper
      val m = new ObjectMapper()
      val root = m.readTree(s)
      if (root.isArray) {
        // array root: recursively splat nested arrays into one level
        // (flatten.cue: [1,2,[3,4,[5,6]]] → [1..6]); objects stay leaves
        val out = m.createArrayNode()
        def splat(n: com.fasterxml.jackson.databind.JsonNode): Unit =
          if (n.isArray) { val it = n.elements(); while (it.hasNext) splat(it.next()) }
          else { out.add(n); () }
        splat(root)
        m.writeValueAsString(out)
      } else {
        val out = m.createObjectNode()
        def walk(prefix: String, n: com.fasterxml.jackson.databind.JsonNode): Unit = {
          if (n.isObject && n.size() > 0) {
            val it = n.properties().iterator()
            while (it.hasNext) {
              val e = it.next()
              val key = if (prefix.isEmpty) e.getKey else prefix + "." + e.getKey
              walk(key, e.getValue)
            }
          } else if (prefix.nonEmpty) { out.set(prefix, n); () }
        }
        walk("", root)
        m.writeValueAsString(out)
      }
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** VRL merge with deep: true over two JSON values (merge.cue): keys
    * whose values are objects on BOTH sides merge recursively; every
    * other collision takes the right side wholesale. Non-object roots
    * return the right value (the reference errors earlier in that
    * case — callers gate on object-ness).
    */
  case class JsonMergeDeep(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "json_merge_deep"
    override def nullSafeEval(l: Any, r: Any): Any = {
      import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
      import com.fasterxml.jackson.databind.node.ObjectNode
      val m = new ObjectMapper()
      def merge(a: JsonNode, b: JsonNode): JsonNode =
        if (a.isObject && b.isObject) {
          val out = a.deepCopy[ObjectNode]()
          val it = b.properties().iterator()
          while (it.hasNext) {
            val e = it.next()
            val prev = out.get(e.getKey)
            out.set(e.getKey,
              if (prev != null && prev.isObject && e.getValue.isObject)
                merge(prev, e.getValue)
              else e.getValue)
          }
          out
        } else b
      try UTF8String.fromString(m.writeValueAsString(merge(
        m.readTree(l.asInstanceOf[UTF8String].toString),
        m.readTree(r.asInstanceOf[UTF8String].toString))))
      catch { case scala.util.control.NonFatal(_) => null }
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** VRL compact with default flags (compact.cue: recursive, dropping
    * null, empty string, empty object, empty array): entries/elements
    * whose value compacts away are removed; emptiness is judged AFTER
    * recursion, so `{"a": {"b": null}}` compacts to `{}`.
    */
  case class JsonCompact(child: Expression) extends StrMapper {
    override def prettyName: String = "json_compact"
    override def mapStr(s: String): String = {
      import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
      val m = new ObjectMapper()
      def clean(n: JsonNode): JsonNode =
        if (n.isObject) {
          val out = m.createObjectNode()
          val it = n.properties().iterator()
          while (it.hasNext) {
            val e = it.next()
            val v = clean(e.getValue)
            if (keep(v)) { out.set(e.getKey, v); () }
          }
          out
        } else if (n.isArray) {
          val out = m.createArrayNode()
          val it = n.elements()
          while (it.hasNext) {
            val v = clean(it.next())
            if (keep(v)) { out.add(v); () }
          }
          out
        } else n
      def keep(n: JsonNode): Boolean =
        !(n.isNull || (n.isTextual && n.asText().isEmpty) ||
          ((n.isObject || n.isArray) && n.size() == 0))
      m.writeValueAsString(clean(m.readTree(s)))
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** VRL unflatten (unflatten.cue): dot-joined keys → nested objects.
    * Later keys win on collision; a scalar/object conflict keeps the
    * deeper object; `recursive` (the default) also unflattens OBJECT
    * VALUES, so dotted keys inside nested objects expand too.
    */
  case class JsonUnflatten(child: Expression, recursive: Boolean = true)
      extends StrMapper {
    override def prettyName: String = "unflatten"
    override def mapStr(s: String): String = {
      import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
      import com.fasterxml.jackson.databind.node.ObjectNode
      val m = new ObjectMapper()
      def unflat(root: JsonNode): JsonNode =
        if (!root.isObject) root
        else {
          val out = m.createObjectNode()
          val it = root.properties().iterator()
          while (it.hasNext) {
            val e = it.next()
            val parts = e.getKey.split('.')
            var cur: ObjectNode = out
            var i = 0
            while (i < parts.length - 1) {
              val nxt = cur.get(parts(i))
              cur = nxt match {
                case o: ObjectNode => o
                case _ => val o = m.createObjectNode(); cur.set(parts(i), o); o
              }
              i += 1
            }
            val v = if (recursive) unflat(e.getValue) else e.getValue
            // a scalar must not clobber an object a dotted sibling
            // built ("a":3 then "a.b":2 — the object wins)
            val existing = cur.get(parts.last)
            if (existing == null || !existing.isObject || v.isObject) {
              cur.set(parts.last, v); ()
            }
          }
          out
        }
      m.writeValueAsString(unflat(m.readTree(s)))
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** VRL set/remove at a literal path over a JSON value (set.cue /
    * remove.cue): returns the REBUILT value. Negative indexes count
    * from the end; `set` pads an array with nulls up to a positive
    * index; `remove` with `compact` drops containers the removal
    * emptied. Null on a path that cannot apply (e.g. index into a
    * scalar) — the caller's raise channel.
    */
  case class JsonPathSet(left: Expression, right: Expression,
                         path: Seq[Either[String, Int]])
      extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "json_path_set"
    override def nullSafeEval(l: Any, r: Any): Any = {
      import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
      import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
      val m = new ObjectMapper()
      def set(n: JsonNode, segs: List[Either[String, Int]], v: JsonNode): JsonNode =
        segs match {
          case Nil => v
          case Left(k) :: rest =>
            val base = n match {
              case o: ObjectNode => o.deepCopy[ObjectNode]()
              case _ => m.createObjectNode()
            }
            base.set(k, set(Option(base.get(k)).getOrElse(m.nullNode()), rest, v))
            base
          case Right(i0) :: rest =>
            val base = n match {
              case a: ArrayNode => a.deepCopy[ArrayNode]()
              case _ => m.createArrayNode()
            }
            val i = if (i0 < 0) base.size() + i0 else i0
            if (i < 0) throw new IllegalArgumentException("index out of range")
            while (base.size() <= i) base.addNull()
            base.set(i, set(base.get(i), rest, v))
            base
        }
      try UTF8String.fromString(m.writeValueAsString(set(
        m.readTree(l.asInstanceOf[UTF8String].toString),
        path.toList,
        m.readTree(r.asInstanceOf[UTF8String].toString))))
      catch { case scala.util.control.NonFatal(_) => null }
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** VRL get/set with a DYNAMIC path (the for_each tally pattern,
    * for_each.cue: `set!(tally, [value], …)` where `value` is the loop
    * element). Segments arrive as runtime string children; `isIndex`
    * marks, per segment, whether the VRL expression was integer-typed
    * (array index) — the one piece of path shape that IS known at plan
    * time. children = base ±data :+ seg…; null when the path cannot
    * apply or any segment is null.
    */
  case class JsonPathDyn(children: IndexedSeq[Expression],
                         isIndex: Seq[Boolean], isSet: Boolean)
      extends Expression with CodegenFallback {
    private val nFixed = if (isSet) 2 else 1
    require(children.length == nFixed + isIndex.length, "json_path_dyn arity")
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = if (isSet) "json_set_dyn" else "json_get_dyn"
    override def eval(input: InternalRow): Any = {
      import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
      import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
      val vals = children.map(_.eval(input))
      if (vals.exists(_ == null)) return null
      val m = new ObjectMapper()
      val segs: List[Either[String, Int]] =
        vals.drop(nFixed).zip(isIndex).map { case (v, ix) =>
          val s = v.asInstanceOf[UTF8String].toString
          if (ix) Right(try s.toInt catch { case _: NumberFormatException => return null })
          else Left(s)
        }.toList
      def get(n: JsonNode, segs: List[Either[String, Int]]): JsonNode = segs match {
        case Nil => n
        case Left(k) :: rest =>
          val c = n.get(k); if (c == null) m.nullNode() else get(c, rest)
        case Right(i0) :: rest =>
          val i = if (i0 < 0) n.size() + i0 else i0
          val c = n.get(i); if (c == null) m.nullNode() else get(c, rest)
      }
      def set(n: JsonNode, segs: List[Either[String, Int]], v: JsonNode): JsonNode =
        segs match {
          case Nil => v
          case Left(k) :: rest =>
            val base = n match {
              case o: ObjectNode => o.deepCopy[ObjectNode]()
              case _ => m.createObjectNode()
            }
            base.set(k, set(Option(base.get(k)).getOrElse(m.nullNode()), rest, v))
            base
          case Right(i0) :: rest =>
            val base = n match {
              case a: ArrayNode => a.deepCopy[ArrayNode]()
              case _ => m.createArrayNode()
            }
            val i = if (i0 < 0) base.size() + i0 else i0
            if (i < 0) throw new IllegalArgumentException("index out of range")
            while (base.size() <= i) base.addNull()
            base.set(i, set(base.get(i), rest, v))
            base
        }
      try {
        val base = m.readTree(vals(0).asInstanceOf[UTF8String].toString)
        val out =
          if (isSet)
            set(base, segs, m.readTree(vals(1).asInstanceOf[UTF8String].toString))
          else get(base, segs)
        UTF8String.fromString(m.writeValueAsString(out))
      } catch { case scala.util.control.NonFatal(_) => null }
    }
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): Expression = copy(children = cs)
  }

  case class JsonPathRemove(child: Expression, path: Seq[Either[String, Int]],
                            compact: Boolean) extends StrMapper {
    override def prettyName: String = "json_path_remove"
    override def mapStr(s: String): String = {
      import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
      import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
      val m = new ObjectMapper()
      def rm(n: JsonNode, segs: List[Either[String, Int]]): JsonNode = segs match {
        case Nil => n
        case Left(k) :: Nil =>
          n match {
            case o: ObjectNode => val c = o.deepCopy[ObjectNode](); c.remove(k); c
            case other => other
          }
        case Right(i0) :: Nil =>
          n match {
            case a: ArrayNode =>
              val c = a.deepCopy[ArrayNode]()
              val i = if (i0 < 0) c.size() + i0 else i0
              if (i >= 0 && i < c.size()) c.remove(i)
              c
            case other => other
          }
        case Left(k) :: rest =>
          n match {
            case o: ObjectNode =>
              val c = o.deepCopy[ObjectNode]()
              Option(c.get(k)).foreach { ch =>
                val r = rm(ch, rest)
                if (compact && (r.isObject || r.isArray) && r.size() == 0) c.remove(k)
                else c.set(k, r)
              }
              c
            case other => other
          }
        case Right(i0) :: rest =>
          n match {
            case a: ArrayNode =>
              val c = a.deepCopy[ArrayNode]()
              val i = if (i0 < 0) c.size() + i0 else i0
              if (i >= 0 && i < c.size()) {
                val r = rm(c.get(i), rest)
                if (compact && (r.isObject || r.isArray) && r.size() == 0) c.remove(i)
                else c.set(i, r)
              }
              c
            case other => other
          }
      }
      m.writeValueAsString(rm(m.readTree(s), path.toList))
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** VRL zip (zip.cue): two JSON arrays → pairwise tuples truncated to
    * the shorter; one array-of-arrays → transpose (truncated to the
    * shortest row). Type-preserving (works over mixed element types).
    */
  case class JsonZip(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "json_zip"
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val l = left.eval(input)
      if (l == null) return null
      val r = right.eval(input) // null right = transpose mode
      import com.fasterxml.jackson.databind.ObjectMapper
      import com.fasterxml.jackson.databind.node.ArrayNode
      val m = new ObjectMapper()
      try {
        val ln = m.readTree(l.asInstanceOf[UTF8String].toString)
        val rows: Seq[ArrayNode] =
          if (r != null) Seq(ln, m.readTree(r.asInstanceOf[UTF8String].toString))
            .map(_.asInstanceOf[ArrayNode])
          else (0 until ln.size()).map(ln.get(_).asInstanceOf[ArrayNode])
        val n = if (rows.isEmpty) 0 else rows.map(_.size()).min
        val out = m.createArrayNode()
        (0 until n).foreach { i =>
          val tup = m.createArrayNode()
          rows.foreach(row => tup.add(row.get(i)))
          out.add(tup)
        }
        UTF8String.fromString(m.writeValueAsString(out))
      } catch { case scala.util.control.NonFatal(_) => null }
    }
    override def nullSafeEval(l: Any, r: Any): Any =
      throw new IllegalStateException("eval overridden")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** VRL object_from_array (object_from_array.cue): a JSON array of
    * [key, value] pairs — or a values array + separate keys array —
    * to an object; null keys drop the entry.
    */
  case class JsonObjectFromArray(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "json_object_from_array"
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val l = left.eval(input)
      if (l == null) return null
      val r = right.eval(input) // null right = pairs mode
      import com.fasterxml.jackson.databind.ObjectMapper
      val m = new ObjectMapper()
      try {
        val values = m.readTree(l.asInstanceOf[UTF8String].toString)
        val out = m.createObjectNode()
        if (r == null) {
          (0 until values.size()).foreach { i =>
            val pair = values.get(i)
            val k = pair.get(0)
            if (!k.isNull) { out.set(k.asText(), pair.get(1)); () }
          }
        } else {
          val keys = m.readTree(r.asInstanceOf[UTF8String].toString)
          val n = math.min(values.size(), keys.size())
          (0 until n).foreach { i =>
            val k = keys.get(i)
            if (!k.isNull) { out.set(k.asText(), values.get(i)); () }
          }
        }
        UTF8String.fromString(m.writeValueAsString(out))
      } catch { case scala.util.control.NonFatal(_) => null }
    }
    override def nullSafeEval(l: Any, r: Any): Any =
      throw new IllegalStateException("eval overridden")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** VRL parse_key_value / parse_logfmt (parse_key_value.cue): a real
    * tokenizer — double-quoted keys/values may contain the delimiters
    * (escaped quotes honored), whitespace around separators is
    * trimmed, a standalone key maps to `true`, and duplicate keys
    * collect into an ARRAY in encounter order. JSON text out (the
    * value types are heterogeneous).
    */
  case class KeyValueToJson(child: Expression, kvSep: String, fieldSep: String)
      extends StrMapper {
    override def prettyName: String = "parse_key_value"
    override def mapStr(s: String): String = {
      import com.fasterxml.jackson.databind.ObjectMapper
      import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
      val m = new ObjectMapper()
      val out = m.createObjectNode()
      // split into fields on fieldSep outside quotes
      val fields = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new java.lang.StringBuilder()
      var i = 0
      var inQ = false
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '"' && (i == 0 || s.charAt(i - 1) != '\\')) { inQ = !inQ; cur.append(c) }
        else if (!inQ && s.startsWith(fieldSep, i)) {
          fields += cur.toString; cur.setLength(0); i += fieldSep.length - 1
        } else cur.append(c)
        i += 1
      }
      fields += cur.toString
      // whitespace may separate the key from the separator or the
      // separator from the value (`eventSource= "Application"`,
      // RFC 5424 SD in parse_syslog.cue) — re-join such fragments
      val joined = scala.collection.mutable.ArrayBuffer.empty[String]
      var fi = 0
      while (fi < fields.length) {
        val f = fields(fi).trim
        if (f.nonEmpty && (f == kvSep.trim || (f.endsWith(kvSep) &&
            !f.startsWith("\"") && fi + 1 < fields.length))) {
          // merge with the following fragment (and a bare separator
          // also merges with the previous)
          if (f == kvSep.trim && joined.nonEmpty && fi + 1 < fields.length) {
            val prev = joined.remove(joined.length - 1)
            joined += (prev + kvSep + fields(fi + 1)); fi += 2
          } else if (fi + 1 < fields.length) {
            joined += (f + fields(fi + 1)); fi += 2
          } else { joined += f; fi += 1 }
        } else { joined += fields(fi); fi += 1 }
      }
      fields.clear(); fields ++= joined
      def unquote(t0: String): String = {
        val t = t0.trim
        if (t.length >= 2 && t.startsWith("\"") && t.endsWith("\""))
          t.substring(1, t.length - 1).replace("\\\"", "\"")
        else t
      }
      def put(k: String, v: com.fasterxml.jackson.databind.JsonNode): Unit = {
        out.get(k) match {
          case null => out.set(k, v); ()
          case a: ArrayNode => a.add(v); ()
          case prev =>
            val a = m.createArrayNode(); a.add(prev); a.add(v); out.set(k, a); ()
        }
      }
      fields.foreach { f0 =>
        val f = f0.trim
        if (f.nonEmpty) {
          // find the kv separator outside quotes
          var j = 0; var q = false; var at = -1
          while (j < f.length && at < 0) {
            val c = f.charAt(j)
            if (c == '"' && (j == 0 || f.charAt(j - 1) != '\\')) q = !q
            else if (!q && f.startsWith(kvSep, j)) at = j
            j += 1
          }
          if (at < 0) put(unquote(f), m.getNodeFactory.booleanNode(true))
          else {
            val k = unquote(f.substring(0, at))
            val v = unquote(f.substring(at + kvSep.length))
            if (k.nonEmpty) put(k, m.getNodeFactory.textNode(v))
          }
        }
      }
      m.writeValueAsString(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** parse_json `max_depth` (parse_json.cue): containers BELOW the
    * depth limit stay as their raw JSON TEXT — the original substring,
    * formatting preserved ("{\"key\": \"val\"}" keeps its space).
    * Jackson's streaming parser + skipChildren gives the exact offsets.
    */
  case class JsonMaxDepth(child: Expression, maxDepth: Int) extends StrMapper {
    override def prettyName: String = "parse_json_max_depth"
    override def mapStr(s: String): String = {
      import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
      import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
      val m = new ObjectMapper()
      val p = new JsonFactory().createParser(s)
      def readValue(depth: Int): JsonNode = p.currentToken() match {
        case JsonToken.START_OBJECT | JsonToken.START_ARRAY if depth > maxDepth =>
          val start = p.currentTokenLocation().getCharOffset.toInt
          p.skipChildren() // leaves the parser AT the matching end token
          val end = p.currentLocation().getCharOffset.toInt
          m.getNodeFactory.textNode(s.substring(start, end))
        case JsonToken.START_OBJECT =>
          val o = m.createObjectNode()
          while (p.nextToken() != JsonToken.END_OBJECT) {
            val name = p.currentName()
            p.nextToken()
            o.set[JsonNode](name, readValue(depth + 1))
          }
          o
        case JsonToken.START_ARRAY =>
          val arr = m.createArrayNode()
          while (p.nextToken() != JsonToken.END_ARRAY)
            arr.add(readValue(depth + 1))
          arr
        case JsonToken.VALUE_STRING => m.getNodeFactory.textNode(p.getText)
        case JsonToken.VALUE_NUMBER_INT => m.getNodeFactory.numberNode(p.getLongValue)
        case JsonToken.VALUE_NUMBER_FLOAT => m.getNodeFactory.numberNode(p.getDoubleValue)
        case JsonToken.VALUE_TRUE => m.getNodeFactory.booleanNode(true)
        case JsonToken.VALUE_FALSE => m.getNodeFactory.booleanNode(false)
        case JsonToken.VALUE_NULL => m.nullNode()
        case other => throw new IllegalArgumentException(s"unexpected token $other")
      }
      p.nextToken()
      m.writeValueAsString(readValue(1))
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** parse_cef `translate_custom_fields` (parse_cef.cue): `cs1Label=X
    * cs1=v` becomes `X: v`; the Label entries are dropped.
    */
  case class CefTranslateCustom(child: Expression) extends StrMapper {
    override def prettyName: String = "cef_translate_custom_fields"
    override def mapStr(s: String): String = {
      import com.fasterxml.jackson.databind.ObjectMapper
      val m = new ObjectMapper()
      val root = m.readTree(s)
      val out = m.createObjectNode()
      val it = root.properties().iterator()
      while (it.hasNext) {
        val e = it.next()
        val k = e.getKey
        if (k.endsWith("Label")) () // consumed as a rename below
        else {
          val label = root.get(k + "Label")
          val nk = if (label != null && label.isTextual) label.asText() else k
          out.set(nk, e.getValue); ()
        }
      }
      m.writeValueAsString(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  // ---------------------------------------------------------- wrappers

  private def col(e: Expression): Column = ExpressionUtils.column(e)
  private def expr(c: Column): Expression = ExpressionUtils.expression(c)

  def encodePunycode(c: Column): Column = col(PunycodeEncode(expr(c)))
  def decodePunycode(c: Column): Column = col(PunycodeDecode(expr(c)))
  def decodeMimeQ(c: Column): Column = col(MimeQDecode(expr(c)))
  def parseCbor(c: Column): Column = col(CborToJson(expr(c)))
  def parseRubyHash(c: Column): Column = col(RubyHashToJson(expr(c)))
  def seahash(c: Column): Column = col(SeaHash(expr(c)))
  def shannonEntropy(c: Column, segmentation: String = "bytes"): Column =
    col(ShannonEntropy(expr(c), segmentation))
  def hmac(data: Column, key: Column, algorithm: String = "SHA-256"): Column =
    col(HmacBytes(expr(data), expr(key), algorithm))
  def sha3(c: Column, variant: String = "SHA3-512"): Column =
    col(Sha3Hex(expr(c), variant))
  def communityId(saddr: Column, daddr: Column, sport: Column, dport: Column,
                  proto: Column, seed: Int = 0,
                  portsProvided: Boolean = true): Column =
    col(CommunityId(IndexedSeq(expr(saddr), expr(daddr), expr(sport),
      expr(dport), expr(proto)), seed, portsProvided))
  def uuidFromFriendlyId(c: Column): Column = col(UuidFromFriendlyId(expr(c)))
  /** Plan-time evaluation of a constant column (map_keys over a static
    * object applies its closure to each literal key name). The column
    * is built from literals only, but Spark 4 Columns resolve at
    * analysis — so evaluate through a one-row local relation (driver
    * side, compile time, once per static key).
    */
  def foldToString(c: Column): Option[String] =
    try {
      val row = org.apache.spark.sql.SparkSession.active
        .range(1).select(c.cast("string")).head()
      if (row.isNullAt(0)) None else Some(row.getString(0))
    } catch { case scala.util.control.NonFatal(_) => None }

  def keyValueToJson(c: Column, kvSep: String, fieldSep: String): Column =
    col(KeyValueToJson(expr(c), kvSep, fieldSep))
  def jsonMaxDepth(c: Column, maxDepth: Int): Column =
    col(JsonMaxDepth(expr(c), maxDepth))
  def cefTranslate(c: Column): Column = col(CefTranslateCustom(expr(c)))
  def jsonPathSet(base: Column, data: Column,
                  path: Seq[Either[String, Int]]): Column =
    col(JsonPathSet(expr(base), expr(data), path))
  def jsonPathRemove(base: Column, path: Seq[Either[String, Int]],
                     compact: Boolean): Column =
    col(JsonPathRemove(expr(base), path, compact))
  def jsonPathGetDyn(base: Column, segs: Seq[Column],
                     isIndex: Seq[Boolean]): Column =
    col(JsonPathDyn((base +: segs).map(expr).toIndexedSeq, isIndex, isSet = false))
  def jsonPathSetDyn(base: Column, data: Column, segs: Seq[Column],
                     isIndex: Seq[Boolean]): Column =
    col(JsonPathDyn((base +: data +: segs).map(expr).toIndexedSeq, isIndex, isSet = true))
  def jsonZip(l: Column, r: Column): Column = col(JsonZip(expr(l), expr(r)))
  def jsonObjectFromArray(values: Column, keys: Column): Column =
    col(JsonObjectFromArray(expr(values), expr(keys)))
  def flattenObject(c: Column): Column = col(JsonFlatten(expr(c)))
  def unflattenObject(c: Column, recursive: Boolean = true): Column =
    col(JsonUnflatten(expr(c), recursive))
  def compactJson(c: Column): Column = col(JsonCompact(expr(c)))
  def mergeDeepJson(l: Column, r: Column): Column =
    col(JsonMergeDeep(expr(l), expr(r)))
  def encryptIp(ip: Column, key: Column, mode: String = "aes128"): Column =
    col(EncryptIp(expr(ip), expr(key), mode))
  def decryptIp(ip: Column, key: Column, mode: String = "aes128"): Column =
    col(DecryptIp(expr(ip), expr(key), mode))
  def parseEtld(c: Column, suffixes: Seq[String], plusParts: Int): Column =
    col(EtldExtract(expr(c), suffixes, plusParts))
}
