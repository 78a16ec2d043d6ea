package graft.config

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}

import org.apache.spark.sql.SparkSession

import VrlAst._

/** Run the reference's OWN VRL stdlib example vectors — the
  * `examples:` blocks in website/cue/reference/remap/functions/<fn>.cue
  * (200 files, one per stdlib function), read in place — through this
  * engine's VRL front-end, comparing the program's return value /
  * output event / raised diagnostic against the documented one.
  *
  * Like ReferenceBehaviorSpec's transform corpus, this is verbatim
  * fidelity evidence: sources, inputs, and expectations are the
  * reference's own, not ports. The pieces:
  *
  *  - a CUE-subset reader for the example entries (strings incl.
  *    `#"""…"""#` raw blocks with closing-indent stripping, numbers,
  *    structs with `a: b: v` field shorthand, lists, `//` comments);
  *  - a result-capture rewrite: the program's last statement's value
  *    is bound to `.__cue_ret` (with `.__cue_err` capturing a raise),
  *    evaluated through the same compiled-remap kernel as `vector
  *    vrl` (VrlRunner);
  *  - a comparator with the documented normalizations: numeric
  *    equality across int/float nodes, RFC3339 timestamp equality
  *    across rendering offsets (`Z` vs `+00:00`, micro vs milli).
  */
object CueCorpus {

  private val mapper = new ObjectMapper()
  private val F = JsonNodeFactory.instance

  sealed trait Expect
  /** `return:` — the value of the program's final expression. */
  final case class Ret(v: JsonNode) extends Expect
  /** `output: log:` — the resulting event. */
  final case class OutLog(v: JsonNode) extends Expect
  /** `output: [{log: …}, …]` — a fan-out (unnest.cue). */
  final case class OutMany(v: Seq[JsonNode]) extends Expect
  /** `raises: runtime|compiletime:` — the exact diagnostic text. */
  final case class Raises(kind: String, msg: String) extends Expect

  final case class Example(fn: String, title: String, source: String,
                           input: Option[JsonNode], expect: Expect,
                           skipTest: Boolean = false)

  final case class Result(ex: Example, ok: Boolean, detail: String) {
    def label: String = s"${ex.fn}/${ex.title}"
  }

  // ------------------------------------------------------ cue reader

  /** Marker object for a cue reference value (`input.log.value`),
    * resolved against the example's input at run time.
    */
  private def refNode(path: String): ObjectNode = {
    val o = F.objectNode()
    o.put("__cue_ref__", path)
    o
  }

  def parseFile(text: String, fn: String): Seq[Example] = {
    val at = text.indexOf("examples: [")
    require(at >= 0, s"$fn: no examples block")
    val rd = new Reader(text, at + "examples: ".length)
    val arr = rd.value()
    require(arr.isArray, s"$fn: examples is not a list")
    val out = mutable.ArrayBuffer.empty[Example]
    arr.elements().forEachRemaining { e =>
      val title = Option(e.get("title")).map(_.asText()).getOrElse("untitled")
      val source = Option(e.get("source")).map(_.asText())
        .getOrElse(throw new IllegalArgumentException(s"$fn/$title: no source"))
      val input = Option(e.get("input")).flatMap(i => Option(i.get("log")))
      val expect: Expect =
        if (e.has("raises")) {
          val r = e.get("raises")
          val k = r.fieldNames().next()
          Raises(k, r.get(k).asText())
        } else if (e.has("output") && e.get("output").isArray) {
          val b = mutable.ArrayBuffer.empty[JsonNode]
          e.get("output").elements().forEachRemaining(o =>
            b += Option(o.get("log")).getOrElse(o))
          OutMany(b.toSeq)
        } else if (e.has("output") && e.get("output").has("log"))
          OutLog(e.get("output").get("log"))
        else if (e.has("return")) Ret(e.get("return"))
        else OutLog(F.objectNode()) // no expectation: event unchanged
      val skip = Option(e.get("skip_test")).exists(_.asBoolean(false))
      out += Example(fn, title, source, input, expect, skip)
    }
    out.toSeq
  }

  /** Char-level reader for the cue VALUE subset the example blocks
    * use. Not a general CUE parser — just labels, strings, numbers,
    * lists, structs, field shorthand, comments.
    */
  private final class Reader(s: String, var i: Int) {
    private def eof = i >= s.length
    private def peek = s.charAt(i)

    private def ws(): Unit = {
      var go = true
      while (go && !eof) {
        if (peek == ' ' || peek == '\t' || peek == '\n' || peek == '\r') i += 1
        else if (peek == '/' && i + 1 < s.length && s.charAt(i + 1) == '/') {
          while (!eof && peek != '\n') i += 1
        } else go = false
      }
    }

    def value(): JsonNode = {
      ws()
      if (eof) throw new IllegalArgumentException("cue: eof at value")
      peek match {
        case '"' | '#' => F.textNode(stringLit())
        case '[' =>
          i += 1
          val a = F.arrayNode()
          ws()
          while (peek != ']') {
            a.add(value())
            ws()
            if (peek == ',') { i += 1; ws() }
          }
          i += 1
          a
        case '{' =>
          i += 1
          val o = F.objectNode()
          ws()
          while (peek != '}') {
            val (k, v) = field()
            o.set[JsonNode](k, v)
            ws()
            if (peek == ',') { i += 1; ws() }
          }
          i += 1
          o
        case c if c == '-' || c.isDigit => number()
        case c if c.isLetter || c == '_' =>
          val id = ident()
          id match {
            case "true" => F.booleanNode(true)
            case "false" => F.booleanNode(false)
            case "null" => F.nullNode()
            case _ =>
              if (!eof && peek == ':') { // field shorthand as a value
                i += 1
                val o = F.objectNode()
                o.set[JsonNode](id, value())
                o
              } else if (!eof && peek == '.') { // dotted reference
                val sb = new StringBuilder(id)
                while (!eof && (peek == '.' || peek.isLetterOrDigit || peek == '_')) {
                  sb.append(peek); i += 1
                }
                refNode(sb.toString)
              } else refNode(id)
          }
        case c => throw new IllegalArgumentException(s"cue: unexpected '$c' at value")
      }
    }

    /** One struct field: `label: value`, where the value may itself be
      * a shorthand chain (`input: log: field: 1`).
      */
    private def field(): (String, JsonNode) = {
      ws()
      val k = if (peek == '"' || peek == '#') stringLit() else ident()
      ws()
      if (eof || peek != ':')
        throw new IllegalArgumentException(s"cue: expected ':' after label $k")
      i += 1
      (k, value())
    }

    private def ident(): String = {
      val st = i
      while (!eof && (peek.isLetterOrDigit || peek == '_')) i += 1
      s.substring(st, i)
    }

    private def number(): JsonNode = {
      val st = i
      if (peek == '-') i += 1
      while (!eof && (peek.isDigit || peek == '.' || peek == '_' ||
        peek == 'e' || peek == 'E' ||
        ((peek == '+' || peek == '-') && "eE".contains(s.charAt(i - 1))))) i += 1
      val raw = s.substring(st, i).replace("_", "") // CUE digit separator
      if (raw.exists(c => c == '.' || c == 'e' || c == 'E')) F.numberNode(raw.toDouble)
      else F.numberNode(raw.toLong)
    }

    /** CUE string forms: `"…"`, `"""…"""` (multiline, closing-indent
      * stripped), and the `#`-fenced raw variants where escapes need a
      * `\#` introducer.
      */
    private def stringLit(): String = {
      var hashes = 0
      while (peek == '#') { hashes += 1; i += 1 }
      require(peek == '"', "cue: expected string quote")
      val triple = s.startsWith("\"\"\"", i)
      val quote = if (triple) "\"\"\"" else "\""
      i += quote.length
      val close = quote + "#" * hashes
      val esc = "\\" + "#" * hashes
      val sb = new StringBuilder
      var done = false
      while (!done) {
        if (i >= s.length) throw new IllegalArgumentException("cue: unterminated string")
        if (s.startsWith(close, i) && !(triple && s.startsWith(close + "\"", i))) {
          i += close.length; done = true
        } else if (s.startsWith(esc, i)) {
          i += esc.length
          if (i >= s.length) throw new IllegalArgumentException("cue: dangling escape")
          val c = s.charAt(i); i += 1
          c match {
            case 'n' => sb.append('\n')
            case 't' => sb.append('\t')
            case 'r' => sb.append('\r')
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'a' => sb.append('\u0007')
            case 'v' => sb.append('\u000b')
            case 'e' => sb.append('\u001b') // ESC (strip_ansi_escape_codes.cue)
            case 'u' =>
              val hex = s.substring(i, i + 4); i += 4
              sb.append(Integer.parseInt(hex, 16).toChar)
            case '(' =>
              throw new IllegalArgumentException("cue: interpolation unsupported")
            case other => sb.append(other)
          }
        } else { sb.append(peek); i += 1 }
      }
      if (!triple) sb.toString
      else {
        // strip the closing delimiter's indentation from every line,
        // drop the leading newline after the opening delimiter and the
        // trailing newline before the closing one
        val body = sb.toString
        val lines = body.split("\n", -1)
        val indent = lines.last // whitespace before the closing quote
        val content = lines.slice(1, lines.length - 1).map { l =>
          if (l.startsWith(indent)) l.substring(indent.length) else l
        }
        content.mkString("\n")
      }
    }
  }

  // -------------------------------------------------------- running

  private val RetF = "__cue_ret"
  private val ErrF = "__cue_err"

  /** The reference's OWN doc typos — examples that are unrunnable in
    * ANY engine (xxhash.cue writes `"XXH3-64)` / `"XXH3-128)`: the
    * string literal is unterminated). Pinned as such, not as failures.
    */
  val docTypos: Set[(String, String)] = Set(
    ("xxhash", "Calculate a hash using the XXH3-64 algorithm"),
    ("xxhash", "Calculate a hash using the XXH3-128 algorithm"))

  /** Entropy / clock / environment-bound examples: the documented value
    * is illustrative (now()'s doc-generation time, random uuid/bytes,
    * the doc author's hostname), so the check is SHAPE equality on the
    * actual value — same contract the values carry, minus the entropy.
    */
  private val uuidV4Re =
    "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$".r
  private def uuidV7Re(msHexPrefix: Option[String]) =
    (s"^${msHexPrefix.map(p => p.substring(0, 8) + "-" + p.substring(8, 12))
      .getOrElse("[0-9a-f]{8}-[0-9a-f]{4}")}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$$").r
  val shapeChecks: Map[(String, String), String => Boolean] = Map(
    ("now", "Generate a current timestamp") ->
      (s => instant(s).isDefined),
    ("uuid_v4", "Create a UUIDv4") ->
      (s => uuidV4Re.matches(s)),
    ("uuid_v7", "Create a UUIDv7 with implicit `now()`") ->
      (s => uuidV7Re(None).matches(s)),
    ("uuid_v7", "Create a UUIDv7 with explicit `now()`") ->
      (s => uuidV7Re(None).matches(s)),
    ("uuid_v7", "Create a UUIDv7 with custom timestamp") ->
      // the 48-bit ms prefix IS deterministic: t'2020-12-30T22:20:53.824Z'
      (s => uuidV7Re(Some(f"${1609366853824L}%012x")).matches(s)),
    ("random_bytes", "Generate random base 64 encoded bytes") ->
      (s => try java.util.Base64.getDecoder.decode(s).length == 16
            catch { case _: Exception => false }),
    ("get_hostname", "Get hostname") ->
      (s => s.nonEmpty))

  /** Examples whose documented value cannot be reproduced offline and
    * whose semantics are implemented with a DOCUMENTED divergence:
    * encrypt_ip/decrypt_ip delegate (in the reference) to the external
    * ipcrypt crate, which is not vendored in the checkout — the IPv4
    * aes128 vector matches (plain AES-128 over the mapped form), but
    * the IPv6 vector does not follow that construction, and `pfx` mode
    * is the ipcrypt-pfx algorithm whose exact bit layout is not
    * derivable from the docs. This engine ships AES-128 + a classic
    * Crypto-PAn-style prefix-preserving cipher with round-trip and
    * prefix-property specs instead. Reported separately — neither pass
    * nor fail.
    */
  val knownDivergent: Set[(String, String)] = Set(
    // the doc's value is the two's-complement NEGATION of the true
    // XXH64("foo", 0) = 0x33bf00a859c4ba3f (verified against both the
    // xxHash spec reimplemented from scratch and lz4-java); the same
    // doc's XXH32 value matches this engine exactly
    ("xxhash", "Calculate a hash using the XXH64 algorithm"),
    ("encrypt_ip", "Encrypt IPv6 address with AES128"),
    ("encrypt_ip", "Encrypt IPv4 address with prefix-preserving mode"),
    ("encrypt_ip", "Encrypt IPv6 address with prefix-preserving mode"),
    ("decrypt_ip", "Decrypt IPv6 address with AES128"),
    ("decrypt_ip", "Decrypt IPv4 address with prefix-preserving mode"),
    ("decrypt_ip", "Decrypt IPv6 address with prefix-preserving mode"))

  /** Year-less source formats (klog / syslog-3164 lines carry no year;
    * the parser infers one relative to the wall clock, and the doc's
    * expected year is the DOC-GENERATION year) — compare these fns'
    * timestamps modulo the inferred year.
    */
  val yearlessFns: Set[String] = Set("parse_klog", "parse_linux_authorization")

  /** Bind the final statement's value to `.__cue_ret` (+ `.__cue_err`
    * for the raise), mirroring how `vector vrl` prints the program
    * result. A whole-event final assignment (`. = …`) is left alone —
    * the caller compares output events instead.
    */
  private def captureResult(p: Program): (Program, Boolean) = p.stmts.last match {
    case ExprStmt(e) =>
      (Program(p.stmts.init :+
        Assign(TField(Seq(SegName(RetF))), Some(TField(Seq(SegName(ErrF)))), e)), true)
    case Assign(TWhole, _, _) => (p, false)
    case Assign(t, _, _) =>
      val read: Expr = t match {
        case TField(path) => FieldRef(path)
        case TLocal(n) => LocalRef(n)
        case TWhole => FieldRef(Nil)
        case TMeta => MetaRef
      }
      (Program(p.stmts :+
        Assign(TField(Seq(SegName(RetF))), None, read)), true)
    case AbortStmt(_) => (p, false)
  }

  /** Run a batch concurrently — each example is a tiny independent
    * Spark job (one-row plan); a small thread pool overlaps their
    * driver-side compile + scheduling latency.
    */
  def runAll(spark: SparkSession, exs: Seq[Example], threads: Int = 8): Seq[Result] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val futs = exs.map(ex => scala.concurrent.Future(run(spark, ex)))
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futs),
        scala.concurrent.duration.Duration(60, "min"))
    } finally pool.shutdown()
  }

  /** The reference doc harness's `test` enrichment table
    * (test_enrichment.rs): get → row 1, find → both rows, conditions
    * ignored. Its harness also resolves any secret key to
    * "secret value" (get_secret.rs inline example).
    */
  private val docTables = Map("test" -> VrlCompile.EnrichTableData(
    rows = Seq(scala.collection.immutable.ListMap(
      "id" -> "1", "firstname" -> "Bob", "surname" -> "Smith")),
    docStub = true,
    jsonRows = Seq(
      """{"id": 1, "firstname": "Bob", "surname": "Smith"}""",
      """{"id": 2, "firstname": "Fred", "surname": "Smith"}""")))
  private def docSecrets = Map(
    "datadog_api_key" -> org.apache.spark.sql.functions.lit("secret value"))

  def run(spark: SparkSession, ex: Example): Result =
    try runInner(spark, ex)
    catch { case e: Exception =>
      Result(ex, ok = false, s"harness error: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  private def runInner(spark: SparkSession, ex: Example): Result = {
    if (docTypos((ex.fn, ex.title)))
      return Result(ex, ok = true,
        "pinned: unrunnable in any engine (reference doc typo — unterminated string literal)")
    if (ex.skipTest)
      return Result(ex, ok = true,
        "skip_test: true — the reference's own doc harness skips this example")

    val inputObj = ex.input.getOrElse(F.objectNode())
    val line = mapper.writeValueAsString(inputObj)

    def parsed(out: Seq[String]): Seq[JsonNode] = out.map(mapper.readTree)
    def evalSrc(src: String) =
      VrlRunner.evalAst(spark, VrlAst.parse(src), Seq(line),
        tables = docTables, secrets = docSecrets)

    ex.expect match {
      case OutLog(expected) =>
        val (out, dropped) = evalSrc(ex.source)
        if (out.isEmpty)
          return Result(ex, ok = false, s"no output event (dropped: ${dropped.mkString})")
        val act = parsed(out).head
        // env-bound single-field outputs (get_hostname): shape check
        shapeChecks.get((ex.fn, ex.title)) match {
          case Some(chk) =>
            val v = Option(act.fields().asScala.toSeq).getOrElse(Nil)
              .filterNot(_.getKey.startsWith("__cue")).headOption
              .map(_.getValue.asText()).getOrElse("")
            return if (chk(v)) Result(ex, ok = true, "env-bound: shape-checked")
              else Result(ex, ok = false, s"shape check failed on $v")
          case None => ()
        }
        diff(expected, act, yearless = yearlessFns(ex.fn)).map(d => Result(ex, ok = false, d))
          .getOrElse(Result(ex, ok = true, ""))

      case OutMany(expected) =>
        val (out, dropped) = evalSrc(ex.source)
        if (out.length != expected.length)
          return Result(ex, ok = false,
            s"event count ${out.length} != expected ${expected.length} (dropped: ${dropped.mkString})")
        val acts = parsed(out)
        expected.zip(acts).flatMap { case (e2, a2) =>
          diff(e2, a2, yearless = yearlessFns(ex.fn))
        }.headOption.map(d => Result(ex, ok = false, d))
          .getOrElse(Result(ex, ok = true, ""))

      case Raises(kind, msg) =>
        if (kind == "compiletime") {
          // expect the program to fail compilation; any engine error
          // counts (the reference's compile diagnostics are its own)
          try {
            evalSrc(ex.source)
            Result(ex, ok = false, "expected a compile error, program ran")
          } catch { case _: Exception => Result(ex, ok = true, "") }
        } else {
          val (prog, wrapped) = captureResult(VrlAst.parse(ex.source))
          if (!wrapped) return Result(ex, ok = false, "cannot capture raise")
          val (out, _) = VrlRunner.evalAst(spark, prog, Seq(line),
            tables = docTables, secrets = docSecrets)
          val err = out.headOption.map(mapper.readTree)
            .flatMap(n => Option(n.get(ErrF))).map(_.asText()).getOrElse("")
          if (err == msg) Result(ex, ok = true, "")
          else Result(ex, ok = false, s"raise mismatch:\n  expect: $msg\n  actual: $err")
        }

      case Ret(expected0) =>
        val expected = resolveRef(expected0, inputObj)
        val (prog, wrapped) = captureResult(VrlAst.parse(ex.source))
        val (out, droppedL) = VrlRunner.evalAst(spark, prog, Seq(line),
          tables = docTables, secrets = docSecrets)
        if (!wrapped) {
          // whole-event replacement (e.g. unnest): compare the output
          // event(s); an array expectation matches the fan-out
          val acts = parsed(out)
          val exps: Seq[JsonNode] = expected match {
            case a: ArrayNode =>
              val b = mutable.ArrayBuffer.empty[JsonNode]
              a.elements().forEachRemaining(e => b += e)
              b.toSeq
            case other => Seq(other)
          }
          if (acts.length != exps.length)
            return Result(ex, ok = false,
              s"event count ${acts.length} != expected ${exps.length}")
          val ds = exps.zip(acts).flatMap { case (e, a) => diff(e, a) }
          return if (ds.isEmpty) Result(ex, ok = true, "")
            else Result(ex, ok = false, ds.head)
        }
        if (out.isEmpty)
          return Result(ex, ok = false, s"event dropped (${droppedL.mkString})")
        val node = parsed(out).head
        val err = Option(node.get(ErrF)).map(_.asText()).getOrElse("")
        if (err.nonEmpty)
          return Result(ex, ok = false, s"raised: $err")
        val ret: JsonNode = Option(node.get(RetF)).getOrElse(F.nullNode())
        shapeChecks.get((ex.fn, ex.title)) match {
          case Some(chk) =>
            return if (chk(ret.asText()))
              Result(ex, ok = true, "entropy/clock-bound: shape-checked")
            else Result(ex, ok = false, s"shape check failed on ${ret.asText()}")
          case None => ()
        }
        diff(expected, ret, yearless = yearlessFns(ex.fn)).map(d => Result(ex, ok = false, d))
          .getOrElse(Result(ex, ok = true, ""))
    }
  }

  private def resolveRef(n: JsonNode, input: JsonNode): JsonNode = n match {
    case o: ObjectNode if o.has("__cue_ref__") =>
      val path = o.get("__cue_ref__").asText()
      require(path.startsWith("input.log."), s"unsupported cue ref $path")
      path.stripPrefix("input.log.").split('.')
        .foldLeft(input)((cur, seg) => Option(cur.get(seg)).getOrElse(F.nullNode()))
    case _ => n
  }

  // ----------------------------------------------------- comparison

  /** None when equal; Some(first difference) otherwise. `yearless`:
    * timestamp strings compare modulo the year (source formats that
    * carry no year — the parser infers one from the wall clock, the
    * doc's expectation carries the doc-generation year).
    */
  def diff(exp0: JsonNode, act: JsonNode, path: String = "$",
           yearless: Boolean = false): Option[String] = {
    val exp = exp0
    def no = Some(s"$path: expected ${exp} got ${act}")
    if (exp.isNumber || act.isNumber) {
      if (!exp.isNumber || !act.isNumber) no
      else if (exp.decimalValue().compareTo(act.decimalValue()) == 0) None
      else {
        val (a, b) = (exp.asDouble(), act.asDouble())
        if (math.abs(a - b) <= 1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b)))) None
        else no
      }
    } else if (exp.isTextual && act.isTextual) {
      if (exp.asText() == act.asText()) None
      else (instant(exp.asText()), instant(act.asText())) match {
        case (Some(x), Some(y)) if x == y => None
        case (Some(x), Some(y)) if yearless &&
          x.atOffset(java.time.ZoneOffset.UTC).withYear(2000) ==
          y.atOffset(java.time.ZoneOffset.UTC).withYear(2000) => None
        case _ => no
      }
    } else if (exp.isObject) {
      if (!act.isObject) no
      else {
        // null-valued ≡ missing (VRL reads a missing field as null, and
        // to_json drops null struct fields) — drop nulls from BOTH
        // sides before comparing field sets
        val ek = new mutable.TreeSet[String]()
        exp.fieldNames().forEachRemaining(f => if (!exp.get(f).isNull) ek += f)
        val ak = new mutable.TreeSet[String]()
        act.fieldNames().forEachRemaining(f => if (!act.get(f).isNull) ak += f)
        if (ek != ak) Some(s"$path: field sets differ: expected $ek got $ak")
        else ek.iterator.map(k => diff(exp.get(k), act.get(k), s"$path.$k", yearless))
          .collectFirst { case Some(d) => d }
      }
    } else if (exp.isArray) {
      if (!act.isArray) no
      else if (exp.size() != act.size())
        Some(s"$path: length ${exp.size()} != ${act.size()}")
      else (0 until exp.size()).iterator
        .map(k => diff(exp.get(k), act.get(k), s"$path[$k]", yearless))
        .collectFirst { case Some(d) => d }
    } else if (exp.isNull) { if (act.isNull || act.isMissingNode) None else no }
    else if (exp.isBoolean) { if (act.isBoolean && exp.asBoolean == act.asBoolean) None else no }
    else if (exp.asText() == act.asText()) None
    else no
  }

  private def instant(s: String): Option[java.time.Instant] =
    try Some(java.time.OffsetDateTime.parse(s).toInstant)
    catch { case _: Exception =>
      try Some(java.time.Instant.parse(s))
      catch { case _: Exception => None }
    }
}
