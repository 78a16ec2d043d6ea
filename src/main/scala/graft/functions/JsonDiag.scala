package graft.functions

/** serde_json-compatible JSON error diagnostics.
  *
  * The reference's `parse_json` surfaces serde_json's error `Display`
  * text verbatim inside its VRL diagnostic (`unable to parse json:
  * <msg> at line <L> column <C>` — vector's behavior corpus pins the
  * full string in tests/behavior/transforms/remap.toml
  * `remap_infallible_assignment`). This is a from-scratch validator
  * that walks the input exactly like serde_json's `de.rs`/`read.rs`
  * state machine (public source) and reproduces its error codes and
  * line/column arithmetic:
  *
  *  - column counts BYTES since the last newline, 1-based at the
  *    errored byte; "peek" errors (bad token seen but not consumed)
  *    point at the peeked byte, "consumed" errors at the last
  *    consumed byte, EOF errors at the end of input;
  *  - error phrases are serde_json's `ErrorCode` display strings
  *    ("key must be a string", "expected value", "trailing comma",
  *    "EOF while parsing an object", …).
  *
  * `check` returns None for valid JSON, Some(message) otherwise. It is
  * only ever evaluated on the error channel (under `when(raise, …)`),
  * never on the parse hot path.
  */
object JsonDiag {

  private final class Diag(val m: String) extends RuntimeException(m)

  private val RecursionLimit = 128 // serde_json default

  def check(s: String): Option[String] = {
    if (s == null) return Some("EOF while parsing a value at line 1 column 0")
    val st = new State(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    try {
      st.value(RecursionLimit)
      st.ws()
      if (st.peek() != State.Eof) st.peekErr("trailing characters")
      None
    } catch { case d: Diag => Some(d.m) }
  }

  private object State { final val Eof: Int = -1 }

  private final class State(b: Array[Byte]) {
    import State.Eof
    private var i = 0

    def ws(): Unit = {
      while (i < b.length &&
        (b(i) == ' ' || b(i) == '\n' || b(i) == '\t' || b(i) == '\r')) i += 1
    }

    /** Current byte as an int in [0,255], or Eof. Multi-byte UTF-8
      * lead/continuation bytes (>= 0x80) only ever hit default
      * branches, so byte-at-a-time is safe; positions stay byte-based
      * like serde's.
      */
    def peek(): Int = if (i < b.length) b(i) & 0xff else Eof
    def next(): Int = if (i < b.length) { val c = b(i) & 0xff; i += 1; c } else Eof
    private def eat(): Unit = i += 1

    /** Error at the peeked (unconsumed) byte — serde's `peek_error`
      * positions at index+1; at EOF that clamps to the input length.
      */
    def peekErr(code: String): Nothing = die(code, i + 1)
    /** Error at the last consumed byte — serde's `error` positions at
      * the current index.
      */
    private def err(code: String): Nothing = die(code, i)

    /** serde_json `position_of_index`: line = 1 + newlines in [0,j),
      * column = bytes since the last newline in [0,j).
      */
    private def die(code: String, at: Int): Nothing = {
      val j = math.min(at, b.length)
      var line = 1; var colStart = 0
      var k = 0
      while (k < j) { if (b(k) == '\n') { line += 1; colStart = k + 1 }; k += 1 }
      throw new Diag(s"$code at line $line column ${j - colStart}")
    }

    def value(depth: Int): Unit = {
      ws()
      peek() match {
        case Eof => peekErr("EOF while parsing a value")
        case 'n' => eat(); ident("ull")
        case 't' => eat(); ident("rue")
        case 'f' => eat(); ident("alse")
        case '-' => eat(); number(neg = true)
        case d if d >= '0' && d <= '9' => number(neg = false)
        case '"' => eat(); string()
        case '[' =>
          // serde's check_recursion! decrements then errors at zero
          // BEFORE consuming the bracket (peek-positioned): the 128th
          // nested container is the one that fails
          if (depth == 1) peekErr("recursion limit exceeded")
          eat()
          array(depth - 1)
        case '{' =>
          if (depth == 1) peekErr("recursion limit exceeded")
          eat()
          obj(depth - 1)
        case _ => peekErr("expected value")
      }
    }

    private def ident(rest: String): Unit = {
      var k = 0
      while (k < rest.length) {
        next() match {
          case Eof => err("EOF while parsing a value")
          case c if c == rest.charAt(k).toInt => ()
          case _ => err("expected ident")
        }
        k += 1
      }
    }

    private def array(depth: Int): Unit = {
      var first = true
      var done = false
      while (!done) {
        ws()
        peek() match {
          case Eof => peekErr("EOF while parsing a list")
          case ']' => eat(); done = true
          case ',' if !first =>
            eat(); ws()
            peek() match {
              case Eof => peekErr("EOF while parsing a list")
              case ']' => peekErr("trailing comma")
              case _ => value(depth)
            }
          case _ =>
            if (first) { first = false; value(depth) }
            else peekErr("expected `,` or `]`")
        }
      }
    }

    private def obj(depth: Int): Unit = {
      var first = true
      var done = false
      def keyColonValue(): Unit = {
        eat() // opening quote
        string()
        ws()
        peek() match {
          case Eof => peekErr("EOF while parsing an object")
          case ':' => eat(); value(depth)
          case _ => peekErr("expected `:`")
        }
      }
      while (!done) {
        ws()
        peek() match {
          case Eof => peekErr("EOF while parsing an object")
          case '}' => eat(); done = true
          case ',' if !first =>
            eat(); ws()
            peek() match {
              case Eof => peekErr("EOF while parsing an object")
              case '}' => peekErr("trailing comma")
              case '"' => keyColonValue()
              case _ => peekErr("key must be a string")
            }
          case '"' if first => first = false; keyColonValue()
          case _ =>
            if (first) peekErr("key must be a string")
            else peekErr("expected `,` or `}`")
        }
      }
    }

    private def string(): Unit = {
      var done = false
      while (!done) {
        peek() match {
          case Eof => err("EOF while parsing a string")
          case '"' => eat(); done = true
          case '\\' => eat(); escape()
          case c if c < 0x20 =>
            err("control character (\\u0000-\\u001F) found while parsing a string")
          case _ => eat()
        }
      }
    }

    private def escape(): Unit = next() match {
      case Eof => err("EOF while parsing a string")
      case '"' | '\\' | '/' | 'b' | 'f' | 'n' | 'r' | 't' => ()
      case 'u' =>
        val hi = hex4()
        if (hi >= 0xd800 && hi <= 0xdbff) {
          // leading surrogate must be followed by a \uDC00-\uDFFF pair
          if (next() != '\\'.toInt || next() != 'u'.toInt)
            err("unexpected end of hex escape")
          val lo = hex4()
          if (lo < 0xdc00 || lo > 0xdfff)
            err("lone leading surrogate in hex escape")
        } else if (hi >= 0xdc00 && hi <= 0xdfff) {
          err("lone leading surrogate in hex escape")
        }
      case _ => err("invalid escape")
    }

    private def hex4(): Int = {
      var v = 0
      var k = 0
      while (k < 4) {
        next() match {
          case Eof => err("unexpected end of hex escape")
          case c =>
            val d =
              if (c >= '0' && c <= '9') c - '0'
              else if (c >= 'a' && c <= 'f') c - 'a' + 10
              else if (c >= 'A' && c <= 'F') c - 'A' + 10
              else err("invalid escape")
            v = v * 16 + d
        }
        k += 1
      }
      v
    }

    private def number(neg: Boolean): Unit = {
      val start = i - (if (neg) 1 else 0)
      if (neg && { val c = peek(); c == Eof }) err("EOF while parsing a value")
      next() match {
        case '0' =>
          peek() match {
            case d if d >= '0' && d <= '9' => peekErr("invalid number")
            case _ => ()
          }
        case d if d >= '1' && d <= '9' =>
          while ({ val c = peek(); c >= '0' && c <= '9' }) eat()
        case Eof => err("EOF while parsing a value")
        case _ => err("invalid number") // `-` followed by a non-digit
      }
      if (peek() == '.'.toInt) {
        eat()
        next() match {
          case Eof => err("EOF while parsing a value")
          case d if d >= '0' && d <= '9' => ()
          case _ => err("invalid number")
        }
        while ({ val c = peek(); c >= '0' && c <= '9' }) eat()
      }
      if (peek() == 'e'.toInt || peek() == 'E'.toInt) {
        eat()
        if (peek() == '+'.toInt || peek() == '-'.toInt) eat()
        next() match {
          case Eof => err("EOF while parsing a value")
          case d if d >= '0' && d <= '9' => ()
          case _ => err("invalid number")
        }
        while ({ val c = peek(); c >= '0' && c <= '9' }) eat()
      }
      // serde_json falls back to f64 on integer overflow; only an
      // overflowing FLOAT (infinite f64) is "number out of range"
      val text = new String(b, start, i - start, java.nio.charset.StandardCharsets.UTF_8)
      if (text.exists(c => c == '.' || c == 'e' || c == 'E')) {
        val d = try text.toDouble catch { case _: NumberFormatException => 0.0 }
        if (d.isInfinite) err("number out of range")
      }
    }
  }
}
