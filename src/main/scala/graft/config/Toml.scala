package graft.config

import scala.collection.mutable

/** Minimal TOML reader — just the subset Vector's config files use
  * (reference: config files under `tests/behavior/` and the loader in
  * `src/config/loading/mod.rs`, which delegates to the `toml` crate).
  *
  * Supported: `[table.path]` headers, `[[array.of.tables]]`, dotted and
  * quoted keys, basic/literal/multi-line strings, integers, floats,
  * booleans, arrays (possibly spanning lines), inline tables, comments.
  * That is the entire surface the behavior-test corpus and graft's own
  * topology files exercise; anything else raises with a position.
  */
object Toml {

  sealed trait V
  /** Not produced by the TOML parser (TOML has no null); carries JSON
    * nulls through the in-memory V tree (VrlRunner's event literals).
    */
  case object TNull extends V
  final case class TStr(s: String) extends V
  final case class TInt(n: Long) extends V
  final case class TFloat(d: Double) extends V
  final case class TBool(b: Boolean) extends V
  final case class TArr(items: Vector[V]) extends V
  final case class TTab(entries: mutable.LinkedHashMap[String, V]) extends V {
    def get(key: String): Option[V] = entries.get(key)
    def tab(key: String): Option[TTab] = entries.get(key).collect { case t: TTab => t }
    def str(key: String): Option[String] = entries.get(key).collect { case TStr(s) => s }
    def bool(key: String): Option[Boolean] = entries.get(key).collect { case TBool(b) => b }
    def long(key: String): Option[Long] = entries.get(key).collect { case TInt(n) => n }
    def dbl(key: String): Option[Double] = entries.get(key).collect {
      case TFloat(d) => d
      case TInt(n)   => n.toDouble
    }
    def arr(key: String): Vector[V] = entries.get(key) match {
      case Some(TArr(xs)) => xs
      case _              => Vector.empty
    }
    def strArr(key: String): Vector[String] = arr(key).collect { case TStr(s) => s }
    /** Array-of-tables entries ([[key]]). */
    def tabs(key: String): Vector[TTab] = arr(key).collect { case t: TTab => t }
  }
  object TTab { def empty: TTab = TTab(mutable.LinkedHashMap.empty) }

  def parse(text: String): TTab = new P(text).parseDoc()

  private final class P(text: String) {
    private var i = 0
    private val root = TTab.empty
    private var current = root

    private def err(msg: String): Nothing = {
      val line = text.substring(0, math.min(i, text.length)).count(_ == '\n') + 1
      throw new IllegalArgumentException(s"TOML parse error at line $line: $msg")
    }
    private def eof: Boolean = i >= text.length
    private def peek: Char = text.charAt(i)
    private def skipWs(): Unit =
      while (!eof && (peek == ' ' || peek == '\t')) i += 1
    private def skipWsNlComments(): Unit = {
      var go = true
      while (go && !eof) peek match {
        case ' ' | '\t' | '\n' | '\r' => i += 1
        case '#' => while (!eof && peek != '\n') i += 1
        case _ => go = false
      }
    }
    private def skipLineRest(): Unit = {
      skipWs()
      if (!eof && peek == '#') while (!eof && peek != '\n') i += 1
      if (!eof && peek == '\r') i += 1
      if (!eof) {
        if (peek != '\n') err(s"expected end of line, found '$peek'")
        i += 1
      }
    }

    def parseDoc(): TTab = {
      skipWsNlComments()
      while (!eof) {
        if (peek == '[') parseHeader() else parseKeyValue(current)
        skipWsNlComments()
      }
      root
    }

    // ------------------------------------------------------- headers
    private def parseHeader(): Unit = {
      i += 1 // '['
      val isArray = !eof && peek == '['
      if (isArray) i += 1
      val path = parseKeyPath(']')
      if (eof || peek != ']') err("expected ]")
      i += 1
      if (isArray) { if (eof || peek != ']') err("expected ]]"); i += 1 }
      skipLineRest()
      var t = root
      val (init, last) = (path.init, path.last)
      init.foreach { seg => t = descend(t, seg) }
      current =
        if (isArray) {
          val arr = t.entries.getOrElseUpdate(last, TArr(Vector.empty)) match {
            case TArr(xs) => xs
            case _        => err(s"$last is not an array of tables")
          }
          val fresh = TTab.empty
          t.entries(last) = TArr(arr :+ fresh)
          fresh
        } else descend(t, last)
    }

    /** Navigate into `seg`, creating a table — or following the LAST
      * element when the key holds an array of tables (TOML's rule for
      * sub-tables of the most recent [[entry]]).
      */
    private def descend(t: TTab, seg: String): TTab =
      t.entries.getOrElseUpdate(seg, TTab.empty) match {
        case tab: TTab   => tab
        case TArr(xs) if xs.nonEmpty && xs.last.isInstanceOf[TTab] =>
          xs.last.asInstanceOf[TTab]
        case _ => err(s"key $seg is not a table")
      }

    // --------------------------------------------------------- keys
    private def parseKeyPath(stop: Char): Seq[String] = {
      val segs = mutable.ArrayBuffer.empty[String]
      var go = true
      while (go) {
        skipWs()
        segs += parseKeySegment()
        skipWs()
        if (!eof && peek == '.') i += 1 else go = false
      }
      segs.toSeq
    }

    private def parseKeySegment(): String =
      if (!eof && (peek == '"' || peek == '\'')) parseBasicString()
      else {
        val start = i
        while (!eof && (peek.isLetterOrDigit || peek == '_' || peek == '-')) i += 1
        if (i == start) err("empty key")
        text.substring(start, i)
      }

    private def parseKeyValue(into: TTab): Unit = {
      val path = parseKeyPath('=')
      skipWs()
      if (eof || peek != '=') err("expected =")
      i += 1
      skipWs()
      val v = parseValue()
      skipLineRest()
      var t = into
      path.init.foreach { seg => t = descend(t, seg) }
      t.entries(path.last) = v
    }

    // -------------------------------------------------------- values
    private def parseValue(): V = {
      if (eof) err("expected value")
      peek match {
        case '"' | '\'' => TStr(parseBasicString())
        case '[' =>
          i += 1
          val items = mutable.ArrayBuffer.empty[V]
          skipWsNlComments()
          while (!eof && peek != ']') {
            items += parseValue()
            skipWsNlComments()
            if (!eof && peek == ',') { i += 1; skipWsNlComments() }
          }
          if (eof) err("unterminated array")
          i += 1
          TArr(items.toVector)
        case '{' =>
          i += 1
          val tab = TTab.empty
          skipWs()
          while (!eof && peek != '}') {
            parseInlineKeyValue(tab)
            skipWs()
            if (!eof && peek == ',') { i += 1; skipWs() }
          }
          if (eof) err("unterminated inline table")
          i += 1
          tab
        case c if c == 't' || c == 'f' =>
          val start = i
          while (!eof && peek.isLetter) i += 1
          text.substring(start, i) match {
            case "true"  => TBool(true)
            case "false" => TBool(false)
            case w       => err(s"bad literal $w")
          }
        case _ =>
          val start = i
          while (!eof && !",]}\n\r\t #".contains(peek)) i += 1
          val raw = text.substring(start, i).trim
          if (raw.matches("[+-]?[0-9_]+")) TInt(raw.replace("_", "").toLong)
          else if (raw.matches("[+-]?[0-9_]*\\.?[0-9_]+([eE][+-]?[0-9]+)?"))
            TFloat(raw.replace("_", "").toDouble)
          else TStr(raw) // dates etc. — keep as text
      }
    }

    private def parseInlineKeyValue(tab: TTab): Unit = {
      skipWs()
      val path = parseKeyPath('=')
      skipWs()
      if (eof || peek != '=') err("expected = in inline table")
      i += 1
      skipWs()
      val v = parseValue()
      var t = tab
      path.init.foreach { seg => t = descend(t, seg) }
      t.entries(path.last) = v
    }

    private def parseBasicString(): String = {
      val quote = peek
      val triple = i + 2 < text.length &&
        text.charAt(i + 1) == quote && text.charAt(i + 2) == quote
      if (triple) {
        i += 3
        // a newline immediately after the opening delimiter is trimmed
        if (!eof && peek == '\n') i += 1
        else if (i + 1 < text.length && peek == '\r' && text.charAt(i + 1) == '\n') i += 2
        val sb = new StringBuilder
        while (!(text.startsWith(s"$quote$quote$quote", i))) {
          if (eof) err("unterminated multi-line string")
          if (quote == '"' && peek == '\\') sb.append(readEscape())
          else { sb.append(peek); i += 1 }
        }
        i += 3
        sb.toString
      } else {
        i += 1
        val sb = new StringBuilder
        while (!eof && peek != quote) {
          if (peek == '\n') err("newline in single-line string")
          if (quote == '"' && peek == '\\') sb.append(readEscape())
          else { sb.append(peek); i += 1 }
        }
        if (eof) err("unterminated string")
        i += 1
        sb.toString
      }
    }

    private def readEscape(): String = {
      i += 1 // backslash
      if (eof) err("dangling escape")
      val c = peek
      i += 1
      c match {
        case 'n' => "\n"
        case 't' => "\t"
        case 'r' => "\r"
        case 'b' => "\b"
        case 'f' => "\f"
        case '"' => "\""
        case '\'' => "'"
        case '\\' => "\\"
        case 'u' =>
          val hex = readHex(4)
          hex.toChar.toString
        case 'U' =>
          new String(Character.toChars(readHex(8)))
        case '\n' => // line-ending backslash: trim following whitespace
          while (!eof && (peek == ' ' || peek == '\t' || peek == '\n' || peek == '\r')) i += 1
          ""
        case other => err(s"unknown escape \\$other")
      }
    }

    /** `n` hex digits as a code point — positioned errors on a
      * truncated or non-hex escape instead of raw substring/parseInt
      * exceptions with no line context.
      */
    private def readHex(n: Int): Int = {
      if (i + n > text.length) err(s"truncated unicode escape (needs $n hex digits)")
      val hex = text.substring(i, i + n)
      if (!hex.forall(ch => Character.digit(ch, 16) >= 0))
        err(s"invalid unicode escape \\u$hex")
      i += n
      try {
        val cp = Integer.parseInt(hex, 16)
        if (!Character.isValidCodePoint(cp)) err(s"invalid code point \\u$hex")
        cp
      } catch { case _: NumberFormatException => err(s"invalid unicode escape \\u$hex") }
    }
  }
}
