package graft.lua

import scala.collection.mutable

import LuaAst._

/** Tree-walking evaluator for the [[LuaAst]] subset, with Lua 5.3+
  * integer/float numeric semantics. One interpreter = one isolated VM
  * (own globals), mirroring the reference's one-`mlua::Lua`-per-
  * transform model (src/transforms/lua/v1/mod.rs:115, v2/mod.rs:245);
  * the Spark runner creates one per PARTITION, the distributed analog
  * of the reference's per-worker VM.
  *
  * Strings are JVM strings (UTF-16); byte-positional string ops
  * (`#s`, `string.sub`) therefore count chars, which equals the
  * reference's byte count for ASCII payloads — divergence is possible
  * on multi-byte input and is documented in SURVEY §2.10.
  */
object LuaInterp {

  // ---------------------------------------------------------- values
  sealed trait LV
  case object LNil extends LV
  final case class LBool(b: Boolean) extends LV
  final case class LInt(v: Long) extends LV
  final case class LNum(v: Double) extends LV
  final case class LStr(s: String) extends LV {
    // interpreter hot path: LStr keys hash on EVERY table access and
    // the case-class default recomputes MurmurHash each call — cache
    // it (bucket placement only; LinkedHashMap order is insertion)
    override val hashCode: Int = s.hashCode * 31 + 7
  }
  final class LTable extends LV {
    /** Insertion-ordered so `pairs`/JSON rendering are deterministic. */
    val m: mutable.LinkedHashMap[LV, LV] = mutable.LinkedHashMap.empty
    /** Metatable (null = none) — raw ops never consult it. */
    var meta: LTable = null
    def rawGet(k: LV): LV = m.getOrElse(normKey(k), LNil)
    def rawSet(k: LV, v: LV): Unit = {
      val kk = normKey(k)
      kk match {
        case LNil => throw LuaError(LStr("table index is nil"))
        case LNum(d) if d.isNaN => throw LuaError(LStr("table index is NaN"))
        case _ => ()
      }
      if (v == LNil) m.remove(kk) else m.update(kk, v)
    }
    /** The `#` border: consecutive 1..n prefix length. */
    def len: Long = {
      var n = 1L
      while (m.contains(LInt(n))) n += 1
      n - 1
    }
    def arrayValues: Seq[LV] = (1L to len).map(i => m(LInt(i)))
  }
  /** Host function. Receives argument list, returns result list. */
  final case class LFn(name: String, f: Seq[LV] => Seq[LV]) extends LV
  /** Lua closure. */
  final class LClosure(val params: Seq[String], val body: Seq[Stat],
                       val env: Env, val vararg: Boolean = false) extends LV
  /** The `...` bundle — lives only in the hidden "..." env slot of a
    * vararg frame; never escapes to user-visible values.
    */
  final case class LArgs(vs: Seq[LV]) extends LV
  /** A coroutine (Lua type `thread`). Runs its body on a dedicated
    * daemon thread with a strict SynchronousQueue handoff: resume
    * blocks the caller until yield/return and yield blocks the body
    * until the next resume, so exactly ONE thread ever executes VM
    * code — the interpreter stays effectively single-threaded. An
    * abandoned SUSPENDED coroutine parks its daemon thread until the
    * JVM exits (the thread analog of mlua keeping the suspended Lua
    * stack alive); drive coroutines to completion in partition-scoped
    * scripts.
    */
  final class LCoro(private[lua] val body: LV) extends LV {
    @volatile private[lua] var status: String = "suspended"
    private[lua] var started = false
    private[lua] val toCoro =
      new java.util.concurrent.SynchronousQueue[Seq[LV]]()
    private[lua] val fromCoro =
      new java.util.concurrent.SynchronousQueue[Either[Throwable, (Boolean, Seq[LV])]]()
  }
  /** Host object with index/newindex/pairs handlers (the v1 event). */
  final class LUserData(val index: LV => LV,
                        val newindex: (LV, LV) => Unit,
                        val keys: () => Seq[LV]) extends LV

  /** Float table keys that are integral normalize to integer keys. */
  def normKey(k: LV): LV = k match {
    case LNum(d) if d.isWhole && !d.isInfinite &&
      d >= Long.MinValue.toDouble && d <= Long.MaxValue.toDouble => LInt(d.toLong)
    case other => other
  }

  final case class LuaError(value: LV)
      extends RuntimeException(toDisplay(value))
  private final case class BreakEx() extends RuntimeException
  private final case class ReturnEx(vals: Seq[LV]) extends RuntimeException
  private final case class GotoEx(name: String, pos: Pos) extends RuntimeException

  def truthy(v: LV): Boolean = v match {
    case LNil | LBool(false) => false
    case _ => true
  }

  def typeName(v: LV): String = v match {
    case LNil => "nil"
    case _: LBool => "boolean"
    case _: LInt | _: LNum => "number"
    case _: LStr => "string"
    case _: LTable => "table"
    case _: LFn | _: LClosure => "function"
    case _: LUserData => "userdata"
    case _: LCoro => "thread"
    case _: LArgs => "..." // internal; unreachable from scripts
  }

  /** Lua `tostring`: integers decimal; floats `%.14g` with a `.0`
    * appended when the rendering looks integral (Lua 5.3+).
    */
  def toDisplay(v: LV): String = v match {
    case LNil => "nil"
    case LBool(b) => b.toString
    case LInt(i) => i.toString
    case LNum(d) =>
      if (d.isNaN) "nan"
      else if (d.isPosInfinity) "inf"
      else if (d.isNegInfinity) "-inf"
      else {
        val s = fmtG(d, 14)
        if (s.forall(c => c.isDigit || c == '-')) s + ".0" else s
      }
    case LStr(s) => s
    case t: LTable => "table: 0x" + Integer.toHexString(System.identityHashCode(t))
    case f: LFn => s"function: builtin ${f.name}"
    case c: LClosure => "function: 0x" + Integer.toHexString(System.identityHashCode(c))
    case u: LUserData => "userdata: 0x" + Integer.toHexString(System.identityHashCode(u))
    case c: LCoro => "thread: 0x" + Integer.toHexString(System.identityHashCode(c))
    case LArgs(vs) => vs.map(toDisplay).mkString(", ") // internal
  }

  /** C `%.Ng` formatting (shortest of %e/%f at N significant digits,
    * trailing zeros trimmed) — what Lua uses for float display.
    */
  private def fmtG(d: Double, sig: Int): String = {
    val s = String.format(s"%.${sig}g", Double.box(d))
    // java keeps trailing zeros; C's %g trims them
    if (s.contains('e') || s.contains('E')) {
      val Array(mant, ex) = s.split("[eE]")
      val m2 = if (mant.contains('.')) mant.reverse.dropWhile(_ == '0').reverse.stripSuffix(".") else mant
      val exNorm = ex.toInt
      m2 + "e" + (if (exNorm >= 0) f"+$exNorm%02d" else f"-${-exNorm}%02d")
    } else if (s.contains('.'))
      s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
    else s
  }

  /** Lua `tonumber` for strings: decimal or hex, int-preserving. */
  def strToNumber(s0: String): Option[LV] = {
    val s = s0.trim
    if (s.isEmpty) None
    else try {
      val neg = s.startsWith("-")
      val body = if (neg || s.startsWith("+")) s.tail else s
      if (body.toLowerCase.startsWith("0x")) {
        val v = java.lang.Long.parseUnsignedLong(body.drop(2), 16)
        Some(LInt(if (neg) -v else v))
      } else if (body.matches("[0-9]+")) {
        try Some(LInt(s.toLong))
        catch { case _: NumberFormatException => Some(LNum(s.toDouble)) }
      } else Some(LNum(s.toDouble))
    } catch { case _: NumberFormatException => None }
  }

  // ------------------------------------------------------ environment
  /** Per-script interned LStr keys for variable/global names — name
    * sets are bounded by program text, and interning spares one LStr
    * allocation per global access on the hot path.
    */
  private val nameKeys = new java.util.concurrent.ConcurrentHashMap[String, LStr]()
  private def nameKey(n: String): LStr = {
    val hit = nameKeys.get(n)
    if (hit != null) hit
    else nameKeys.computeIfAbsent(n, s => LStr(s))
  }

  final class Env(val parent: Option[Env], val globals: LTable) {
    // iterative parent-chain walk with a null-based link: scope lookup
    // runs once per variable access per event per row, so the
    // Option/closure allocations of the recursive form were measurable
    private val parentRef: Env = parent.orNull
    private val vars = mutable.HashMap.empty[String, LV]
    def declare(n: String, v: LV): Unit = vars.update(n, v)
    def lookupLocal(n: String): Option[Env] = {
      var e: Env = this
      while (e != null) {
        if (e.vars.contains(n)) return Some(e)
        e = e.parentRef
      }
      None
    }
    def get(n: String): LV = {
      var e: Env = this
      while (e != null) {
        // vars never hold Scala null (absent ≠ LNil-valued declare)
        val v = e.vars.getOrElse(n, null)
        if (v != null) return v
        e = e.parentRef
      }
      globals.rawGet(nameKey(n))
    }
    def set(n: String, v: LV): Unit = {
      var e: Env = this
      while (e != null) {
        if (e.vars.contains(n)) { e.vars.update(n, v); return }
        e = e.parentRef
      }
      globals.rawSet(nameKey(n), v)
    }
    def child: Env = new Env(Some(this), globals)
  }

  // ------------------------------------------------------ interpreter
  /** One VM. `clock` backs os.time/os.date (injectable so batch runs
    * can pin it for determinism; defaults to the wall clock like the
    * reference's embedded VM).
    */
  final class VM(clock: () => Long = () => System.currentTimeMillis()) {
    val globals = new LTable
    private val rootEnv = new Env(None, globals)
    /** The coroutine whose body is executing on THIS thread (null on
      * the main interpreter thread).
      */
    private val currentCoro = new ThreadLocal[LCoro]()
    LuaStdlib.install(globals, clock)
    // host-callback seam: stdlib functions that invoke Lua values
    // (pcall, gsub's function replacement, table.sort comparators)
    // re-enter the interpreter through this entry
    globals.rawSet(LStr("__vm"), LFn("__vm", args =>
      callValue(args.headOption.getOrElse(LNil), args.drop(1))))
    // the interpreter's `<` (strings, numbers, __lt) for stdlib callers
    // that need default ordering (table.sort without a comparator)
    globals.rawSet(LStr("__lt"), LFn("__lt", args =>
      Seq(binOp("<", args.headOption.getOrElse(LNil),
        args.lift(1).getOrElse(LNil), Pos(0, 0)))))
    // metatable-aware overrides of stdlib entries that need the
    // interpreter: __tostring/__name rendering and __index-honoring
    // ipairs (lua_geti semantics)
    private def metaToString(v: LV): String = v match {
      case t: LTable if t.meta != null =>
        t.meta.rawGet(LStr("__tostring")) match {
          case LNil => t.meta.rawGet(LStr("__name")) match {
            case LStr(n) =>
              n + ": 0x" + Integer.toHexString(System.identityHashCode(t))
            case _ => toDisplay(v)
          }
          case h => callValue(h, Seq(t)).headOption match {
            case Some(LStr(s)) => s
            case Some(other) => toDisplay(other)
            case None => toDisplay(v)
          }
        }
      case _ => toDisplay(v)
    }
    globals.rawSet(LStr("tostring"), LFn("tostring", args =>
      Seq(LStr(metaToString(args.headOption.getOrElse(LNil))))))
    // print formats through tostring, like luaB_print
    globals.rawSet(LStr("print"), LFn("print", args => {
      System.err.println(args.map(metaToString).mkString("\t"))
      Nil
    }))
    globals.rawSet(LStr("ipairs"), LFn("ipairs", args => {
      val t = args.headOption.getOrElse(LNil)
      val it = LFn("inext", b => {
        val i = (b.lift(1) match {
          case Some(LInt(x)) => x
          case Some(LNum(d)) => d.toLong
          case _ => 0L
        }) + 1
        val v = index(t, LInt(i), Pos(0, 0))
        if (v == LNil) Seq(LNil) else Seq(LInt(i), v)
      })
      Seq(it, t, LInt(0L))
    }))
    // -------------------------------------------------- coroutines
    // (see [[LCoro]] for the handoff model and thread-lifetime note)
    locally {
      // the main thread's coroutine object (lua_newstate's main co):
      // running/normal by position, never resumable, never dead
      val mainCoro = new LCoro(LNil)
      mainCoro.status = "running"
      mainCoro.started = true
      def coroArg(name: String, args: Seq[LV]): LCoro =
        args.headOption.getOrElse(LNil) match {
          case co: LCoro => co
          case other => throw LuaError(LStr(
            s"bad argument #1 to '$name' (coroutine expected, got ${typeName(other)})"))
        }
      def fnArg(name: String, args: Seq[LV]): LV =
        args.headOption.getOrElse(LNil) match {
          case f @ (_: LFn | _: LClosure) => f
          case other => throw LuaError(LStr(
            s"bad argument #1 to '$name' (function expected, got ${typeName(other)})"))
        }
      def resume(co: LCoro, args: Seq[LV]): Seq[LV] = {
        if (co.status == "dead")
          return Seq(LBool(false), LStr("cannot resume dead coroutine"))
        if (co.status != "suspended")
          return Seq(LBool(false), LStr("cannot resume non-suspended coroutine"))
        co.status = "running"
        if (!co.started) {
          co.started = true
          val t = new Thread(() => {
            currentCoro.set(co)
            val first = co.toCoro.take()
            val res =
              try Right((false, callValue(co.body, first)))
              catch { case e: Throwable => Left(e) }
            co.fromCoro.put(res)
          })
          t.setDaemon(true)
          t.setName("lua-coroutine")
          t.start()
        }
        co.toCoro.put(args)
        co.fromCoro.take() match {
          case Right((isYield, vals)) =>
            co.status = if (isYield) "suspended" else "dead"
            LBool(true) +: vals
          case Left(LuaError(v)) => co.status = "dead"; Seq(LBool(false), v)
          case Left(e) =>
            co.status = "dead"
            Seq(LBool(false), LStr(String.valueOf(e.getMessage)))
        }
      }
      val coroT = new LTable
      coroT.rawSet(LStr("create"), LFn("coroutine.create", args =>
        Seq(new LCoro(fnArg("create", args)))))
      coroT.rawSet(LStr("resume"), LFn("coroutine.resume", args =>
        resume(coroArg("resume", args), args.drop(1))))
      coroT.rawSet(LStr("yield"), LFn("coroutine.yield", args => {
        val co = currentCoro.get()
        if (co == null)
          throw LuaError(LStr("attempt to yield from outside a coroutine"))
        co.fromCoro.put(Right((true, args)))
        co.toCoro.take()
      }))
      coroT.rawSet(LStr("status"), LFn("coroutine.status", args => {
        val co = coroArg("status", args)
        Seq(LStr(
          if (co eq mainCoro) {
            if (currentCoro.get() == null) "running" else "normal"
          }
          else if (co eq currentCoro.get()) "running"
          // a 'running' coroutine observed from a coroutine it resumed
          // reads 'normal', like lcorolib
          else if (co.status == "running") "normal"
          else co.status))
      }))
      coroT.rawSet(LStr("wrap"), LFn("coroutine.wrap", args => {
        val co = new LCoro(fnArg("wrap", args))
        Seq(LFn("wrapped", a => resume(co, a) match {
          case LBool(true) +: rest => rest
          case _ +: err +: _ => throw LuaError(err)
          case other => other
        }))
      }))
      coroT.rawSet(LStr("isyieldable"), LFn("coroutine.isyieldable", _ =>
        Seq(LBool(currentCoro.get() != null))))
      coroT.rawSet(LStr("running"), LFn("coroutine.running", _ => {
        val co = currentCoro.get()
        // the main thread returns ITS coroutine object (not nil) plus
        // the is-main flag, like lua_pushthread/lcorolib
        if (co == null) Seq(mainCoro, LBool(true)) else Seq(co, LBool(false))
      }))
      coroT.rawSet(LStr("close"), LFn("coroutine.close", args => {
        val co = coroArg("close", args)
        // marking a suspended coroutine dead makes later resumes fail;
        // its parked thread is reclaimed only at JVM exit (LCoro doc)
        if (co.status == "suspended" || co.status == "dead") {
          co.status = "dead"; Seq(LBool(true))
        } else throw LuaError(LStr("cannot close a running coroutine"))
      }))
      globals.rawSet(LStr("coroutine"), coroT)
    }

    /** Execute a chunk at global scope (v2 `source`, v1 per-event).
      * The chunk is a vararg frame (like real Lua's main chunk) with
      * no values.
      */
    def exec(chunk: Seq[Stat]): Unit =
      try execBlock(chunk, chunkEnv())
      catch {
        case ReturnEx(_) => ()
        case GotoEx(n, p) =>
          throw LuaError(LStr(s"$p: no visible label '$n' for goto"))
      }

    /** Evaluate an expression chunk (hook strings: either an inline
      * `function(...) ... end` or a global function NAME — exactly how
      * the reference resolves hook config values, v2/mod.rs:352-358).
      */
    def evalExpr(src: String): LV = {
      val stats = LuaAst.parse("return " + src)
      try { execBlock(stats, chunkEnv()); LNil }
      catch { case ReturnEx(vs) => vs.headOption.getOrElse(LNil) }
    }

    private def chunkEnv(): Env = {
      val e = rootEnv.child
      e.declare("...", LArgs(Nil))
      e
    }

    def callValue(f: LV, args: Seq[LV]): Seq[LV] = call(f, args, Pos(0, 0))

    /** Runs a block with goto support: a GotoEx raised anywhere inside
      * statement i resumes at this block's matching `::label::` (before
      * or after i — backward jumps make loops), or propagates out to
      * the enclosing block (lparser label visibility). Unmatched at the
      * function boundary = error (see [[call]]).
      */
    private def execBlock(stats: Seq[Stat], env: Env): Unit = {
      var i = 0
      while (i < stats.length) {
        try { execStat(stats(i), env); i += 1 }
        catch {
          case g: GotoEx =>
            val idx = stats.indexWhere {
              case SLabel(n, _) => n == g.name
              case _ => false
            }
            if (idx >= 0) i = idx + 1 else throw g
        }
      }
    }

    private def err(msg: String, pos: Pos): Nothing =
      throw LuaError(LStr(s"$pos: $msg"))

    private def execStat(st: Stat, env: Env): Unit = st match {
      case SLocal(names, exprs, _) =>
        val vals = evalMulti(exprs, env)
        names.zipWithIndex.foreach { case (n, i) =>
          env.declare(n, vals.lift(i).getOrElse(LNil)) }
      case SAssign(targets, exprs, _) =>
        val vals = evalMulti(exprs, env)
        targets.zipWithIndex.foreach { case (t, i) =>
          assign(t, vals.lift(i).getOrElse(LNil), env) }
      case SCall(c, _) => evalCallMulti(c, env); ()
      case SDo(b, _) => execBlock(b, env.child)
      case SWhile(c, b, _) =>
        try while (truthy(eval(c, env))) execBlock(b, env.child)
        catch { case BreakEx() => () }
      case SRepeat(b, c, _) =>
        try {
          var go = true
          while (go) {
            val inner = env.child
            execBlock(b, inner)
            // until's condition sees the body's locals (Lua scoping)
            go = !truthy(eval(c, inner))
          }
        } catch { case BreakEx() => () }
      case SIf(arms, orelse, _) =>
        arms.find { case (c, _) => truthy(eval(c, env)) } match {
          case Some((_, b)) => execBlock(b, env.child)
          case None => execBlock(orelse, env.child)
        }
      case SForNum(n, fromE, toE, stepE, body, pos) =>
        val (from, to, step) = (toNum(eval(fromE, env), pos),
          toNum(eval(toE, env), pos),
          stepE.map(e => toNum(eval(e, env), pos)).getOrElse(LInt(1L)))
        try {
          (from, to, step) match {
            case (LInt(f), LInt(t), LInt(s)) =>
              if (s == 0) err("'for' step is zero", pos)
              var i = f
              while (if (s > 0) i <= t else i >= t) {
                val inner = env.child
                inner.declare(n, LInt(i))
                execBlock(body, inner)
                i += s
              }
            case _ =>
              val (f, t, s) = (numD(from), numD(to), numD(step))
              if (s == 0) err("'for' step is zero", pos)
              var i = f
              while (if (s > 0) i <= t else i >= t) {
                val inner = env.child
                inner.declare(n, LNum(i))
                execBlock(body, inner)
                i += s
              }
          }
        } catch { case BreakEx() => () }
      case SForIn(names, exprs, body, pos) =>
        val vs = evalMulti(exprs, env)
        val f = vs.headOption.getOrElse(LNil)
        val s = vs.lift(1).getOrElse(LNil)
        var ctrl = vs.lift(2).getOrElse(LNil)
        try {
          var go = true
          while (go) {
            val rs = call(f, Seq(s, ctrl), pos)
            val first = rs.headOption.getOrElse(LNil)
            if (first == LNil) go = false
            else {
              ctrl = first
              val inner = env.child
              names.zipWithIndex.foreach { case (n, i) =>
                inner.declare(n, rs.lift(i).getOrElse(LNil)) }
              execBlock(body, inner)
            }
          }
        } catch { case BreakEx() => () }
      case SFunc(target, _, fn, _) =>
        assign(target, new LClosure(fn.params, fn.body, env, fn.vararg), env)
      case SLocalFunc(n, fn, _) =>
        env.declare(n, LNil) // visible to itself (recursion)
        env.set(n, new LClosure(fn.params, fn.body, env, fn.vararg))
      case SReturn(exprs, _) => throw ReturnEx(evalMulti(exprs, env))
      case SBreak(_) => throw BreakEx()
      case SLabel(_, _) => () // a jump target, not an action
      case SGoto(n, pos) => throw GotoEx(n, pos)
    }

    private def assign(target: Expr, v: LV, env: Env): Unit = target match {
      case EName(n, _) => env.set(n, v)
      case EIndex(o, k, pos) => setIndex(eval(o, env), eval(k, env), v, pos)
      case e => err("cannot assign", e.pos)
    }

    /** Metamethod lookup — `LNil` reads as absent, like real Lua. */
    private def metamethod(v: LV, name: String): Option[LV] = (v match {
      case t: LTable if t.meta != null => t.meta.rawGet(LStr(name))
      case _ => LNil
    }) match {
      case LNil => None
      case h => Some(h)
    }

    def setIndex(obj: LV, k: LV, v: LV, pos: Pos, depth: Int = 0): Unit = {
      if (depth > 100) err("'__newindex' chain too long; possible loop", pos)
      obj match {
        case t: LTable =>
          // meta-less tables take the raw write directly (no probe);
          // __newindex fires only on ABSENT keys (lvm.c luaV_finishset)
          if (t.meta == null || t.rawGet(k) != LNil) t.rawSet(k, v)
          else metamethod(t, "__newindex") match {
            case Some(h @ (_: LFn | _: LClosure)) => call(h, Seq(t, k, v), pos); ()
            case Some(mt) => setIndex(mt, k, v, pos, depth + 1)
            case None => t.rawSet(k, v)
          }
        case u: LUserData => u.newindex(k, v)
        case other => err(s"attempt to index a ${typeName(other)} value", pos)
      }
    }

    /** Expression list with Lua multi-value rules: middle expressions
      * truncate to one value, the LAST call/expansion keeps all.
      */
    private def evalMulti(exprs: Seq[Expr], env: Env): Seq[LV] =
      if (exprs.isEmpty) Nil
      else exprs.init.map(e => eval(e, env)) ++ evalCallMulti(exprs.last, env)

    private def evalCallMulti(e: Expr, env: Env): Seq[LV] = e match {
      case ECall(f, args, pos) => call(eval(f, env), evalMulti(args, env), pos)
      case EMethodCall(o, m, args, pos) =>
        val obj = eval(o, env)
        val fn = index(obj, LStr(m), pos)
        call(fn, obj +: evalMulti(args, env), pos)
      case EVararg(pos) => varargsOf(env, pos)
      case other => Seq(eval(other, env))
    }

    private def varargsOf(env: Env, pos: Pos): Seq[LV] = env.get("...") match {
      case LArgs(vs) => vs
      case _ => err("cannot use '...' outside a vararg function", pos)
    }

    private def call(f: LV, args: Seq[LV], pos: Pos): Seq[LV] = f match {
      case LFn(_, h) => h(args)
      case c: LClosure =>
        val inner = c.env.child
        c.params.zipWithIndex.foreach { case (p, i) =>
          inner.declare(p, args.lift(i).getOrElse(LNil)) }
        // vararg frames capture the extra args; non-vararg frames
        // SHADOW any enclosing "..." (real Lua rejects the reference at
        // parse time; the shadow makes the runtime error match)
        inner.declare("...",
          if (c.vararg) LArgs(args.drop(c.params.length)) else LNil)
        try { execBlock(c.body, inner); Nil }
        catch {
          case ReturnEx(vs) => vs
          case GotoEx(n, p) =>
            throw LuaError(LStr(s"$p: no visible label '$n' for goto"))
        }
      case other => metamethod(other, "__call") match {
        case Some(h) => call(h, other +: args, pos)
        case None => err(s"attempt to call a ${typeName(other)} value", pos)
      }
    }

    def index(obj: LV, k: LV, pos: Pos, depth: Int = 0): LV = {
      if (depth > 100) err("'__index' chain too long; possible loop", pos)
      obj match {
        case t: LTable =>
          val raw = t.rawGet(k)
          if (raw != LNil) raw
          else metamethod(t, "__index") match {
            case Some(h @ (_: LFn | _: LClosure)) =>
              call(h, Seq(t, k), pos).headOption.getOrElse(LNil)
            case Some(mt) => index(mt, k, pos, depth + 1)
            case None => LNil
          }
        case u: LUserData => u.index(k)
        case LStr(_) =>
          // strings index into the string library (s:upper() etc.) —
          // the stock string-metatable __index
          globals.rawGet(LStr("string")) match {
            case st: LTable => st.rawGet(k)
            case _ => LNil
          }
        case other => err(s"attempt to index a ${typeName(other)} value", pos)
      }
    }

    /** Lua tointeger coercion for bitwise operands (lvm.c tointegerns):
      * integers pass, integral floats convert, anything else errors.
      */
    private def toLuaInt(v: LV, pos: Pos): Long = v match {
      case LInt(i) => i
      case LNum(d) if d.isWhole && !d.isInfinite &&
        d >= Long.MinValue.toDouble && d <= Long.MaxValue.toDouble => d.toLong
      case LNum(_) => err("number has no integer representation", pos)
      case LStr(s) => strToNumber(s) match {
        case Some(x) => toLuaInt(x, pos)
        case None => err("attempt to perform bitwise operation on a string value", pos)
      }
      case other =>
        err(s"attempt to perform bitwise operation on a ${typeName(other)} value", pos)
    }

    private def toNum(v: LV, pos: Pos): LV = v match {
      case i: LInt => i
      case n: LNum => n
      case LStr(s) => strToNumber(s).getOrElse(err("cannot convert string to number", pos))
      case other => err(s"attempt to perform arithmetic on a ${typeName(other)} value", pos)
    }
    private def numD(v: LV): Double = v match {
      case LInt(i) => i.toDouble
      case LNum(d) => d
      case _ => 0.0
    }

    def eval(e: Expr, env: Env): LV = e match {
      case ENil(_) => LNil
      case ETrue(_) => LBool(true)
      case EFalse(_) => LBool(false)
      case EInt(v, _) => LInt(v)
      case ENum(v, _) => LNum(v)
      case EStr(v, _) => LStr(v)
      case EName(n, _) => env.get(n)
      case EVararg(pos) => varargsOf(env, pos).headOption.getOrElse(LNil)
      case EParen(inner, _) => eval(inner, env)
      case EIndex(o, k, pos) => index(eval(o, env), eval(k, env), pos)
      case c: ECall => evalCallMulti(c, env).headOption.getOrElse(LNil)
      case c: EMethodCall => evalCallMulti(c, env).headOption.getOrElse(LNil)
      case EFunc(ps, body, _, va) => new LClosure(ps, body, env, va)
      case ETable(entries, _) =>
        val t = new LTable
        var arrIdx = 1L
        entries.zipWithIndex.foreach {
          case (TNamed(k, ve), _) => t.rawSet(LStr(k), eval(ve, env))
          case (TKeyed(ke, ve), _) => t.rawSet(eval(ke, env), eval(ve, env))
          case (TPos(ve), i) =>
            // last positional entry expands a multi-value call
            if (i == entries.length - 1) {
              evalCallMulti(ve, env).foreach { v =>
                t.rawSet(LInt(arrIdx), v); arrIdx += 1
              }
            } else { t.rawSet(LInt(arrIdx), eval(ve, env)); arrIdx += 1 }
        }
        t
      case EUn(op, inner, pos) =>
        val v = eval(inner, env)
        op match {
          case "not" => LBool(!truthy(v))
          case "-" => v match {
            case _: LTable => metamethod(v, "__unm") match {
              case Some(h) => call(h, Seq(v, v), pos).headOption.getOrElse(LNil)
              case None => err("attempt to perform arithmetic on a table value", pos)
            }
            case _ => toNum(v, pos) match {
              case LInt(i) => LInt(-i)
              case LNum(d) => LNum(-d)
              case _ => err("bad unary minus", pos)
            }
          }
          case "#" => v match {
            case LStr(s) => LInt(s.length.toLong)
            case t: LTable => metamethod(t, "__len") match {
              case Some(h) => call(h, Seq(t), pos).headOption.getOrElse(LNil)
              case None => LInt(t.len)
            }
            case other => err(s"attempt to get length of a ${typeName(other)} value", pos)
          }
          case "~" => v match {
            case _: LTable => metamethod(v, "__bnot") match {
              case Some(h) => call(h, Seq(v, v), pos).headOption.getOrElse(LNil)
              case None =>
                err("attempt to perform bitwise operation on a table value", pos)
            }
            case _ => LInt(~toLuaInt(v, pos))
          }
          case other => err(s"unsupported unary op $other", pos)
        }
      case EBin(op, le, re, pos) =>
        op match {
          case "and" =>
            val l = eval(le, env)
            if (!truthy(l)) l else eval(re, env)
          case "or" =>
            val l = eval(le, env)
            if (truthy(l)) l else eval(re, env)
          case _ =>
            binOp(op, eval(le, env), eval(re, env), pos)
        }
    }

    /** Binary metamethod from the left operand, else the right (the
      * 5.4 dispatch order), applied and truncated to one value.
      */
    private def tryBinMeta(name: String, l: LV, r: LV, pos: Pos): Option[LV] =
      metamethod(l, name).orElse(metamethod(r, name))
        .map(h => call(h, Seq(l, r), pos).headOption.getOrElse(LNil))

    private def isTab(v: LV): Boolean = v.isInstanceOf[LTable]

    private def binOp(op: String, l: LV, r: LV, pos: Pos): LV = op match {
      case ".." =>
        def concatable(v: LV): Boolean = v match {
          case LStr(_) | LInt(_) | LNum(_) => true
          case _ => false
        }
        if (!concatable(l) || !concatable(r))
          tryBinMeta("__concat", l, r, pos).getOrElse(
            err(s"attempt to concatenate a ${typeName(if (concatable(l)) r else l)} value", pos))
        else {
          def s(v: LV): String = v match {
            case LStr(x) => x
            case _ => toDisplay(v)
          }
          LStr(s(l) + s(r))
        }
      case "==" =>
        if (luaEquals(l, r)) LBool(true)
        else if (isTab(l) && isTab(r))
          LBool(tryBinMeta("__eq", l, r, pos).exists(truthy))
        else LBool(false)
      case "~=" => binOp("==", l, r, pos) match {
        case LBool(b) => LBool(!b)
        case v => LBool(!truthy(v))
      }
      case "<" | "<=" | ">" | ">=" if isTab(l) || isTab(r) =>
        // a > b is b < a (lvm.c: order metamethods see swapped operands)
        val (name, a, b) = op match {
          case "<" => ("__lt", l, r)
          case "<=" => ("__le", l, r)
          case ">" => ("__lt", r, l)
          case _ => ("__le", r, l)
        }
        tryBinMeta(name, a, b, pos).map(v => LBool(truthy(v))).getOrElse(
          err(s"attempt to compare ${typeName(l)} with ${typeName(r)}", pos))
      case "+" | "-" | "*" | "/" | "//" | "%" | "^" if isTab(l) || isTab(r) =>
        val name = op match {
          case "+" => "__add"; case "-" => "__sub"; case "*" => "__mul"
          case "/" => "__div"; case "//" => "__idiv"; case "%" => "__mod"
          case _ => "__pow"
        }
        tryBinMeta(name, l, r, pos).getOrElse(
          err("attempt to perform arithmetic on a table value", pos))
      case "&" | "|" | "~" | "<<" | ">>" =>
        val name = op match {
          case "&" => "__band"; case "|" => "__bor"; case "~" => "__bxor"
          case "<<" => "__shl"; case _ => "__shr"
        }
        if (isTab(l) || isTab(r))
          tryBinMeta(name, l, r, pos).getOrElse(
            err("attempt to perform bitwise operation on a table value", pos))
        else {
          val (a, b) = (toLuaInt(l, pos), toLuaInt(r, pos))
          op match {
            case "&" => LInt(a & b)
            case "|" => LInt(a | b)
            case "~" => LInt(a ^ b)
            // Lua shifts are LOGICAL; counts beyond 63 yield 0 and a
            // negative count shifts the other way (lvm.c luaV_shiftl)
            case "<<" =>
              if (b <= -64 || b >= 64) LInt(0)
              else if (b >= 0) LInt(a << b) else LInt(a >>> -b)
            case _ =>
              if (b <= -64 || b >= 64) LInt(0)
              else if (b >= 0) LInt(a >>> b) else LInt(a << -b)
          }
        }
      case "<" | "<=" | ">" | ">=" =>
        (l, r) match {
          case (LStr(a), LStr(b)) =>
            val c = a.compareTo(b)
            LBool(op match {
              case "<" => c < 0; case "<=" => c <= 0
              case ">" => c > 0; case _ => c >= 0
            })
          case (LStr(_), _) | (_, LStr(_)) =>
            // Lua never coerces in order comparison (unlike arithmetic)
            err(s"attempt to compare ${typeName(l)} with ${typeName(r)}", pos)
          case _ =>
            val (a, b) = (toNum(l, pos), toNum(r, pos))
            (a, b) match {
              case (LInt(x), LInt(y)) =>
                LBool(op match {
                  case "<" => x < y; case "<=" => x <= y
                  case ">" => x > y; case _ => x >= y
                })
              case _ =>
                val (x, y) = (numD(a), numD(b))
                LBool(op match {
                  case "<" => x < y; case "<=" => x <= y
                  case ">" => x > y; case _ => x >= y
                })
            }
        }
      case "+" | "-" | "*" | "//" | "%" =>
        (toNum(l, pos), toNum(r, pos)) match {
          case (LInt(a), LInt(b)) => op match {
            case "+" => LInt(a + b)
            case "-" => LInt(a - b)
            case "*" => LInt(a * b)
            case "//" =>
              if (b == 0) err("attempt to perform 'n//0'", pos)
              LInt(Math.floorDiv(a, b))
            case _ =>
              if (b == 0) err("attempt to perform 'n%%0'", pos)
              LInt(Math.floorMod(a, b))
          }
          case (a, b) =>
            val (x, y) = (numD(a), numD(b))
            op match {
              case "+" => LNum(x + y)
              case "-" => LNum(x - y)
              case "*" => LNum(x * y)
              case "//" => LNum(math.floor(x / y))
              case _ =>
                // Lua float %: x - floor(x/y)*y
                LNum(x - math.floor(x / y) * y)
            }
        }
      case "/" =>
        val (x, y) = (numD(toNum(l, pos)), numD(toNum(r, pos)))
        LNum(x / y)
      case "^" =>
        val (x, y) = (numD(toNum(l, pos)), numD(toNum(r, pos)))
        LNum(math.pow(x, y))
      case other => err(s"unsupported operator $other", pos)
    }
  }

  def luaEquals(l: LV, r: LV): Boolean = (l, r) match {
    case (LInt(a), LNum(b)) => a.toDouble == b
    case (LNum(a), LInt(b)) => a == b.toDouble
    case (a: LTable, b: LTable) => a eq b
    case (a: LClosure, b: LClosure) => a eq b
    case (a: LUserData, b: LUserData) => a eq b
    case (a, b) => a == b
  }
}
