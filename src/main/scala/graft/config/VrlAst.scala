package graft.config

import scala.collection.mutable

/** VRL-subset front-end: lexer + recursive-descent parser for the
  * expression language Vector's `remap` transform and `vrl` conditions
  * use (reference: `src/transforms/remap.rs:58-135` consumes a compiled
  * VRL `Program`; the grammar here is the subset its behavior-test
  * corpus under `tests/behavior/transforms/` exercises).
  *
  * The program is compiled ONCE per topology into Catalyst columns
  * (`VrlCompile`) — no per-event interpretation; this file is only the
  * syntax.
  *
  * Statement separation is line-based like VRL: a newline ends a
  * statement unless it is inside brackets or directly after a binary
  * operator / comma / opening brace (continuation).
  */
object VrlAst {

  // ----------------------------------------------------------- AST
  sealed trait PathSeg
  final case class SegName(name: String) extends PathSeg
  final case class SegIndex(idx: Int) extends PathSeg

  sealed trait Expr
  final case class LitS(s: String) extends Expr
  final case class LitI(n: Long) extends Expr
  final case class LitF(d: Double) extends Expr
  final case class LitB(b: Boolean) extends Expr
  case object LitNull extends Expr
  final case class LitRegex(pattern: String) extends Expr
  /** `t'2020-01-01T00:00:00Z'` timestamp literal (VRL literal grammar). */
  final case class LitTs(s: String) extends Expr
  final case class ArrLit(items: Seq[Expr]) extends Expr
  final case class ObjLit(fields: Seq[(String, Expr)]) extends Expr
  /** `.a."b.c"[0]` — empty path = the whole event `.` */
  final case class FieldRef(path: Seq[PathSeg]) extends Expr
  /** `%` — the event METADATA root (reference event metadata; reads
    * null when never set). Only the bare root is supported; `%foo`
    * paths raise VrlUnsupported at parse.
    */
  case object MetaRef extends Expr
  final case class LocalRef(name: String) extends Expr
  /** `span` is the source extent of the whole call expression —
    * `(start, end)` char offsets, end-exclusive, from the start of the
    * program — matching the reference engine's diagnostic spans
    * (`function call error for "f" at (start:end): …`; the corpus
    * sources are ASCII so char offsets equal the reference's byte
    * offsets).
    */
  final case class Call(name: String, bang: Boolean, args: Seq[Expr],
                        named: Seq[(String, Expr)],
                        closure: Option[(Seq[String], Block)] = None,
                        span: Option[(Int, Int)] = None) extends Expr
  /** Postfix path on a non-event base: `p.level`, `parse_json!(.m).k`,
    * `(expr)[0]` — same-line only (a leading-dot path after a newline
    * is the next statement's assignment target).
    */
  final case class PathOn(base: Expr, path: Seq[PathSeg]) extends Expr
  final case class Bin(op: String, l: Expr, r: Expr) extends Expr
  final case class Un(op: String, e: Expr) extends Expr
  /** `l ?? r` — error-coalesce: r when l raises. */
  final case class Coalesce(l: Expr, r: Expr) extends Expr
  final case class IfE(cond: Expr, thenB: Block, elseB: Option[Block]) extends Expr
  final case class Block(stmts: Seq[Stmt]) extends Expr

  sealed trait Target
  final case class TField(path: Seq[PathSeg]) extends Target
  final case class TLocal(name: String) extends Target
  case object TWhole extends Target
  /** `% = expr` — replace the event metadata root. */
  case object TMeta extends Target

  sealed trait Stmt
  /** `target = expr` or the fallible `ok, err = expr` form. */
  final case class Assign(ok: Target, err: Option[Target], expr: Expr) extends Stmt
  final case class ExprStmt(e: Expr) extends Stmt
  final case class AbortStmt(message: Option[Expr]) extends Stmt

  final case class Program(stmts: Seq[Stmt])

  final case class VrlParseError(msg: String) extends RuntimeException(msg)

  def parse(src: String): Program = {
    val (toks, spans) = new Lexer(src).lex()
    val p = new Parser(toks, spans)
    val prog = p.parseProgram()
    prog
  }

  // --------------------------------------------------------- lexer
  sealed trait Tok
  final case class TIdent(s: String) extends Tok
  final case class TStrTok(s: String) extends Tok
  final case class TRegexTok(s: String) extends Tok
  final case class TTsTok(s: String) extends Tok
  final case class TIntTok(n: Long) extends Tok
  final case class TFloatTok(d: Double) extends Tok
  final case class TOp(s: String) extends Tok // operators + punctuation
  case object TNl extends Tok
  case object TEof extends Tok

  private final class Lexer(src: String) {
    private var i = 0
    private def eof = i >= src.length
    private def peek = src.charAt(i)

    /** Tokens plus their `(start, end)` source offsets (end-exclusive),
      * so the parser can stamp reference-compatible diagnostic spans.
      */
    def lex(): (Vector[Tok], Vector[(Int, Int)]) = {
      val out = mutable.ArrayBuffer.empty[Tok]
      val pos = mutable.ArrayBuffer.empty[(Int, Int)]
      def prev: Option[Tok] = out.lastOption
      def push(t: Tok, s0: Int): Unit = { out += t; pos += ((s0, i)) }
      while (!eof) {
        val s0 = i
        peek match {
          case ' ' | '\t' | '\r' => i += 1
          case '\n' =>
            i += 1
            // newline is a statement break UNLESS it follows a token
            // that cannot end an expression (continuation)
            prev match {
              case Some(TOp(op)) if op != ")" && op != "]" && op != "}" => ()
              case Some(TNl) | None => ()
              case _ => push(TNl, s0)
            }
          case '#' => while (!eof && peek != '\n') i += 1
          case ';' =>
            i += 1
            prev match { // same continuation rule as newline
              case Some(TNl) | None => ()
              case _ => push(TNl, s0)
            }
          case '"' | '\'' => push(TStrTok(readString(peek)), s0)
          case 'r' if i + 1 < src.length && src.charAt(i + 1) == '\'' =>
            i += 1
            push(TRegexTok(readRaw()), s0)
          case 's' if i + 1 < src.length && src.charAt(i + 1) == '\'' =>
            i += 1
            push(TStrTok(readRaw()), s0)
          case 't' if i + 1 < src.length && src.charAt(i + 1) == '\'' =>
            i += 1
            push(TTsTok(readRaw()), s0)
          case c if c.isDigit =>
            val start = i
            while (!eof && (peek.isDigit || peek == '.' || peek == '_')) i += 1
            val raw = src.substring(start, i).replace("_", "")
            if (raw.contains('.')) push(TFloatTok(raw.toDouble), s0)
            else push(TIntTok(raw.toLong), s0)
          case c if c.isLetter || c == '_' =>
            val start = i
            while (!eof && (peek.isLetterOrDigit || peek == '_')) i += 1
            push(TIdent(src.substring(start, i)), s0)
          case _ =>
            val two = if (i + 1 < src.length) src.substring(i, i + 2) else ""
            two match {
              case "==" | "!=" | "<=" | ">=" | "&&" | "||" | "??" | "->" | "|=" =>
                i += 2; push(TOp(two), s0)
              case _ =>
                val c = peek
                if (!"()[]{}.,:=<>!+-*/%|&".contains(c))
                  throw VrlParseError(s"unexpected character '$c' in VRL source")
                i += 1; push(TOp(c.toString), s0)
            }
        }
      }
      val s1 = i
      out += TEof; pos += ((s1, s1))
      (out.toVector, pos.toVector)
    }

    private def readString(quote: Char): String = {
      i += 1
      val sb = new StringBuilder
      while (!eof && peek != quote) {
        if (peek == '\\' && quote == '"') {
          i += 1
          if (eof) throw VrlParseError("dangling escape in string")
          val c = peek; i += 1
          sb.append(c match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case '"' => '"'; case '\'' => '\''; case '\\' => '\\'
            case 'e' => '\u001b' // ESC (strip_ansi_escape_codes.cue)
            case '{' => '{'; case '}' => '}' // literal template braces
            case '0' => '\u0000'
            // VRL rejects unknown escapes at compile time — swallowing
            // the backslash would silently corrupt data ("C:\dir" →
            // "C:dir"); surface the program error instead
            case other => throw VrlParseError(s"invalid string escape \\$other")
          })
        } else { sb.append(peek); i += 1 }
      }
      if (eof) throw VrlParseError("unterminated string")
      i += 1
      sb.toString
    }

    /** Raw r'...' — backslashes pass through; \' escapes the quote. */
    private def readRaw(): String = {
      i += 1
      val sb = new StringBuilder
      while (!eof && peek != '\'') {
        if (peek == '\\' && i + 1 < src.length && src.charAt(i + 1) == '\'') {
          sb.append('\''); i += 2
        } else { sb.append(peek); i += 1 }
      }
      if (eof) throw VrlParseError("unterminated raw string")
      i += 1
      sb.toString
    }
  }

  // -------------------------------------------------------- parser
  private final class Parser(toks: Vector[Tok], spans: Vector[(Int, Int)]) {
    private var p = 0
    private def peek: Tok = toks(p)
    private def next(): Tok = { val t = toks(p); p += 1; t }
    private def save(): Int = p
    private def restore(s: Int): Unit = p = s
    private def skipNl(): Unit = while (peek == TNl) p += 1
    private def expectOp(op: String): Unit = next() match {
      case TOp(`op`) => ()
      case t => throw VrlParseError(s"expected '$op', found $t")
    }

    def parseProgram(): Program = {
      val stmts = mutable.ArrayBuffer.empty[Stmt]
      skipNl()
      while (peek != TEof) {
        stmts += parseStmt()
        skipNl()
      }
      Program(stmts.toSeq)
    }

    private def parseStmt(): Stmt = peek match {
      case TIdent("abort") =>
        next()
        val msg = peek match {
          case TNl | TEof | TOp("}") => None
          case _                     => Some(parseExpr())
        }
        AbortStmt(msg)
      case _ =>
        // try assignment: target[, target] = expr
        val s = save()
        tryParseAssign() match {
          case Some(a) => a
          case None => restore(s); ExprStmt(parseExpr())
        }
    }

    private def tryParseAssign(): Option[Stmt] = {
      def target(): Option[Target] = peek match {
        case TOp(".") => Some(parsePathTarget())
        case TOp("%") =>
          next()
          peek match {
            case TIdent(_) | TOp(".") | TOp("[") | TStrTok(_) =>
              throw VrlUnsupported("metadata path (only the bare % root is supported)")
            case _ => Some(TMeta)
          }
        case TIdent(n) if n != "if" && n != "true" && n != "false" && n != "null" =>
          next(); Some(TLocal(n))
        case _ => None
      }
      target() match {
        case None => None
        case Some(t1) =>
          peek match {
            case TOp(",") =>
              next(); skipNl()
              target() match {
                case Some(t2) if { peek == TOp("=") } =>
                  next(); skipNl()
                  Some(Assign(t1, Some(t2), parseExpr()))
                case _ => None
              }
            case TOp("=") =>
              next(); skipNl()
              Some(Assign(t1, None, parseExpr()))
            case TOp("|=") =>
              // `t |= e` is sugar for `t = merge(t, e)` (VRL's
              // merge-assign); the read side re-expresses the target
              next(); skipNl()
              val read: Expr = t1 match {
                case TField(path) => FieldRef(path)
                case TWhole => FieldRef(Nil)
                case TLocal(n) => LocalRef(n)
                case TMeta => MetaRef
              }
              Some(Assign(t1, None,
                Call("merge", bang = false, Seq(read, parseExpr()), Nil)))
            case _ => None
          }
      }
    }

    private def parsePathTarget(): Target = {
      val path = parsePath()
      if (path.isEmpty) TWhole else TField(path)
    }

    /** Leading '.' already at peek. `.a."b.c"[0].d`; bare `.` = whole. */
    private def parsePath(): Seq[PathSeg] = {
      expectOp(".")
      val segs = mutable.ArrayBuffer.empty[PathSeg]
      var expectSeg = true
      var go = true
      while (go) peek match {
        case TIdent(n) if expectSeg =>
          next(); segs += SegName(n); expectSeg = false
        case TStrTok(s) if expectSeg =>
          next(); segs += SegName(s); expectSeg = false
        case TOp("(") if expectSeg && segs.isEmpty =>
          // `.(a|b)` coalesced paths unsupported
          throw VrlUnsupported("coalesced path .(a|b)")
        case TOp(".") if !expectSeg =>
          next(); expectSeg = true
        case TOp("[") if !expectSeg =>
          next()
          val idx = next() match {
            case TIntTok(n) => n.toInt
            case t => throw VrlParseError(s"expected array index, found $t")
          }
          expectOp("]")
          segs += SegIndex(idx)
        case _ =>
          if (expectSeg && segs.nonEmpty)
            throw VrlParseError("dangling '.' in path")
          go = false
      }
      segs.toSeq
    }

    // precedence: || < && < ==,!= < <,<=,>,>= < +,- < *,/,% < ?? < unary < postfix
    private def parseExpr(): Expr = parseOr()

    private def binLevel(ops: Set[String], sub: () => Expr): Expr = {
      var l = sub()
      var go = true
      while (go) peek match {
        case TOp(op) if ops(op) =>
          next(); skipNl()
          l = Bin(op, l, sub())
        case _ => go = false
      }
      l
    }

    private def parseOr(): Expr = binLevel(Set("||"), () => parseAnd())
    private def parseAnd(): Expr = binLevel(Set("&&"), () => parseEq())
    private def parseEq(): Expr = binLevel(Set("==", "!="), () => parseCmp())
    private def parseCmp(): Expr = binLevel(Set("<", "<=", ">", ">="), () => parseAdd())
    private def parseAdd(): Expr = binLevel(Set("+", "-"), () => parseMul())
    private def parseMul(): Expr = binLevel(Set("*", "/", "%"), () => parseCoalesce())

    private def parseCoalesce(): Expr = {
      var l = parseUnary()
      while (peek == TOp("??")) { next(); skipNl(); l = Coalesce(l, parseUnary()) }
      l
    }

    private def parseUnary(): Expr = peek match {
      case TOp("!") => next(); Un("!", parseUnary())
      case TOp("-") => next(); Un("-", parseUnary())
      case _        => parsePostfix()
    }

    /** Postfix `.path` / `[idx]` on locals, calls, and parenthesized
      * expressions (`p.level`, `parse_json!(.m).k`). FieldRef primaries
      * consume their own path, so no double-walk; a TNl before the dot
      * keeps next-line assignment targets out of reach.
      */
    private def parsePostfix(): Expr = {
      var e = parsePrimary()
      var go = true
      while (go) peek match {
        case TOp(".") if !e.isInstanceOf[FieldRef] =>
          val s = save()
          next()
          peek match {
            case TIdent(_) | TStrTok(_) =>
              restore(s); e = PathOn(e, parsePath())
            case _ => restore(s); go = false
          }
        case TOp("[") =>
          next()
          val idx = next() match {
            case TIntTok(n) => n.toInt
            case t => throw VrlParseError(s"expected array index, found $t")
          }
          expectOp("]")
          e = PathOn(e, Seq(SegIndex(idx)))
        case _ => go = false
      }
      e
    }

    private def parsePrimary(): Expr = peek match {
      case TStrTok(s)   => next(); LitS(s)
      case TRegexTok(s) => next(); LitRegex(s)
      case TTsTok(s)    => next(); LitTs(s)
      case TIntTok(n)   => next(); LitI(n)
      case TFloatTok(d) => next(); LitF(d)
      case TIdent("true")  => next(); LitB(true)
      case TIdent("false") => next(); LitB(false)
      case TIdent("null")  => next(); LitNull
      case TIdent("if")    => parseIf()
      case TOp(".")        => FieldRef(parsePath())
      case TOp("%") =>
        next()
        peek match {
          case TIdent(_) | TOp(".") | TOp("[") | TStrTok(_) =>
            throw VrlUnsupported("metadata path (only the bare % root is supported)")
          case _ => MetaRef
        }
      case TOp("(") =>
        next(); skipNl()
        val e = parseExpr()
        skipNl(); expectOp(")")
        e
      case TOp("[") =>
        next(); skipNl()
        val items = mutable.ArrayBuffer.empty[Expr]
        while (peek != TOp("]")) {
          items += parseExpr()
          skipNl()
          if (peek == TOp(",")) { next(); skipNl() }
        }
        next()
        ArrLit(items.toSeq)
      case TOp("{") =>
        next(); skipNl()
        val fields = mutable.ArrayBuffer.empty[(String, Expr)]
        while (peek != TOp("}")) {
          val key = next() match {
            case TStrTok(s) => s
            case TIdent(s)  => s
            case t => throw VrlParseError(s"expected object key, found $t")
          }
          expectOp(":"); skipNl()
          fields += (key -> parseExpr())
          skipNl()
          if (peek == TOp(",")) { next(); skipNl() }
        }
        next()
        ObjLit(fields.toSeq)
      case TIdent(name) =>
        val k0 = p
        next()
        val bang = peek == TOp("!")
        if (bang) next()
        if (peek == TOp("(")) {
          next(); skipNl()
          val args = mutable.ArrayBuffer.empty[Expr]
          val named = mutable.ArrayBuffer.empty[(String, Expr)]
          while (peek != TOp(")")) {
            // named argument: ident ':' expr
            val s = save()
            val isNamed = next() match {
              case TIdent(_) => peek == TOp(":")
              case _         => false
            }
            restore(s)
            if (isNamed) {
              val TIdent(argName) = next(): @unchecked
              next() // ':'
              skipNl()
              named += (argName -> parseExpr())
            } else args += parseExpr()
            skipNl()
            if (peek == TOp(",")) { next(); skipNl() }
          }
          next()
          // closure form: `call(args) -> |p1, p2| { body }` (the VRL
          // enumeration functions: filter/map_keys/map_values/for_each)
          val closure = peek match {
            case TOp("->") =>
              next()
              skipNl()
              expectOp("|")
              val params = mutable.ArrayBuffer.empty[String]
              var go = true
              while (go) next() match {
                case TIdent(pn) => params += pn
                case TOp(",") => ()
                case TOp("|") => go = false
                case t => throw VrlParseError(s"bad closure parameter $t")
              }
              skipNl()
              Some((params.toSeq, parseBlock()))
            case _ => None
          }
          // span: from the function name through the last consumed
          // token (closing paren, or closure body if present)
          Call(name, bang, args.toSeq, named.toSeq, closure,
            Some((spans(k0)._1, spans(p - 1)._2)))
        } else if (bang) throw VrlParseError(s"dangling ! after $name")
        else LocalRef(name)
      case t => throw VrlParseError(s"unexpected token $t")
    }

    private def parseIf(): Expr = {
      next() // 'if'
      val cond = parseExpr()
      skipNl()
      val thenB = parseBlock()
      // look ahead for `else` without consuming a statement-break TNl:
      // a next-line leading-dot statement must stay separated, or the
      // postfix-path rule would swallow it as a path on the if-value
      val sAfterThen = save()
      skipNl()
      val elseB = peek match {
        case TIdent("else") =>
          next(); skipNl()
          peek match {
            case TIdent("if") => Some(Block(Seq(ExprStmt(parseIf()))))
            case _            => Some(parseBlock())
          }
        case _ => restore(sAfterThen); None
      }
      IfE(cond, thenB, elseB)
    }

    private def parseBlock(): Block = {
      expectOp("{")
      skipNl()
      val stmts = mutable.ArrayBuffer.empty[Stmt]
      while (peek != TOp("}")) {
        stmts += parseStmt()
        skipNl()
      }
      next()
      Block(stmts.toSeq)
    }
  }

  /** Raised for VRL features outside the supported subset — the
    * unit-test harness converts this into a documented skip.
    */
  final case class VrlUnsupported(feature: String)
      extends RuntimeException(s"unsupported VRL feature: $feature")
}
