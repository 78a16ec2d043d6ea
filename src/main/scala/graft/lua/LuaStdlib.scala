package graft.lua

import scala.collection.mutable

import LuaInterp._

/** The standard-library subset the `lua` transform's VM ships with:
  * base functions, `string` (including a from-scratch Lua PATTERN
  * engine — find/match/gmatch/gsub per the Lua 5.4 manual §6.4.1),
  * `math`, `table`, and a clock-injectable `os.time`/`os.date`.
  * Everything here is deterministic given the injected clock
  * (`math.random` is seeded per-VM), which the distributed runner
  * relies on for retry-safe tasks.
  */
object LuaStdlib {

  private def fn(name: String)(f: Seq[LV] => Seq[LV]): LFn = LFn(name, f)
  private def one(v: LV): Seq[LV] = Seq(v)

  private def argErr(fname: String, n: Int, expected: String, got: LV): Nothing =
    throw LuaError(LStr(
      s"bad argument #$n to '$fname' ($expected expected, got ${typeName(got)})"))

  private def asStr(fname: String, args: Seq[LV], n: Int): String =
    args.lift(n - 1).getOrElse(LNil) match {
      case LStr(s) => s
      case LInt(_) | LNum(_) => toDisplay(args(n - 1))
      case other => argErr(fname, n, "string", other)
    }

  private def asInt(fname: String, args: Seq[LV], n: Int, default: Option[Long] = None): Long =
    args.lift(n - 1).getOrElse(LNil) match {
      case LInt(i) => i
      case LNum(d) if d.isWhole => d.toLong
      case LStr(s) => strToNumber(s) match {
        case Some(LInt(i)) => i
        case Some(LNum(d)) if d.isWhole => d.toLong
        case _ => argErr(fname, n, "number", LStr(s))
      }
      case LNil if default.isDefined => default.get
      case other => argErr(fname, n, "number", other)
    }

  private def asNum(fname: String, args: Seq[LV], n: Int): Double =
    args.lift(n - 1).getOrElse(LNil) match {
      case LInt(i) => i.toDouble
      case LNum(d) => d
      case LStr(s) => strToNumber(s) match {
        case Some(LInt(i)) => i.toDouble
        case Some(LNum(d)) => d
        case _ => argErr(fname, n, "number", LStr(s))
      }
      case other => argErr(fname, n, "number", other)
    }

  /** Lua treats a trailing explicit `nil` like a missing argument —
    * option sites must go through this, never `args.lift(n)` alone.
    */
  private def optArg(args: Seq[LV], n: Int): Option[LV] =
    args.lift(n - 1).filter(_ != LNil)

  private def asTable(fname: String, args: Seq[LV], n: Int): LTable =
    args.lift(n - 1).getOrElse(LNil) match {
      case t: LTable => t
      case other => argErr(fname, n, "table", other)
    }

  def install(g: LTable, clock: () => Long): Unit = {
    // ------------------------------------------------------------ base
    g.rawSet(LStr("type"), fn("type")(a => one(LStr(typeName(a.headOption.getOrElse(LNil))))))
    g.rawSet(LStr("tostring"), fn("tostring")(a => one(LStr(toDisplay(a.headOption.getOrElse(LNil))))))
    g.rawSet(LStr("tonumber"), fn("tonumber") { a =>
      a.headOption.getOrElse(LNil) match {
        case v @ (LInt(_) | LNum(_)) if a.length < 2 => one(v)
        case LStr(s) =>
          optArg(a, 2) match {
            case Some(b) =>
              val base = asInt("tonumber", a, 2).toInt
              try one(LInt(java.lang.Long.parseLong(s.trim, base)))
              catch { case _: NumberFormatException => one(LNil) }
            case None => one(strToNumber(s).getOrElse(LNil))
          }
        case _ => one(LNil)
      }
    })
    g.rawSet(LStr("error"), fn("error") { a =>
      throw LuaError(a.headOption.getOrElse(LNil))
    })
    g.rawSet(LStr("assert"), fn("assert") { a =>
      if (!truthy(a.headOption.getOrElse(LNil)))
        throw LuaError(a.lift(1).getOrElse(LStr("assertion failed!")))
      a
    })
    g.rawSet(LStr("pcall"), fn("pcall") { a =>
      val f = a.headOption.getOrElse(LNil)
      val vm = g.rawGet(LStr("__vm")).asInstanceOf[LFn]
      try LBool(true) +: vm.f(f +: a.drop(1))
      catch { case LuaError(v) => Seq(LBool(false), v) }
    })
    g.rawSet(LStr("select"), fn("select") { a =>
      a.headOption.getOrElse(LNil) match {
        case LStr("#") => one(LInt((a.length - 1).toLong))
        case v =>
          val n = asInt("select", a, 1).toInt
          if (n < 0) a.takeRight(-n) else a.drop(n)
      }
    })
    g.rawSet(LStr("rawget"), fn("rawget")(a =>
      one(asTable("rawget", a, 1).rawGet(a.lift(1).getOrElse(LNil)))))
    g.rawSet(LStr("rawset"), fn("rawset") { a =>
      val t = asTable("rawset", a, 1)
      t.rawSet(a.lift(1).getOrElse(LNil), a.lift(2).getOrElse(LNil))
      one(t)
    })
    g.rawSet(LStr("rawequal"), fn("rawequal")(a =>
      one(LBool(luaEquals(a.headOption.getOrElse(LNil), a.lift(1).getOrElse(LNil))))))
    g.rawSet(LStr("rawlen"), fn("rawlen") { a =>
      a.headOption.getOrElse(LNil) match {
        case t: LTable => one(LInt(t.len))
        case LStr(s) => one(LInt(s.length.toLong))
        case other => argErr("rawlen", 1, "table or string", other)
      }
    })
    g.rawSet(LStr("print"), fn("print") { a =>
      System.err.println(a.map(toDisplay).mkString("\t"))
      Nil
    })

    val nextFn = fn("next") { a =>
      val t = asTable("next", a, 1)
      val prev = a.lift(1).getOrElse(LNil)
      val keys = t.m.keys.toVector
      val idx = if (prev == LNil) 0 else keys.indexOf(normKey(prev)) + 1
      if (idx >= 0 && idx < keys.length) Seq(keys(idx), t.m(keys(idx)))
      else one(LNil)
    }
    g.rawSet(LStr("next"), nextFn)

    g.rawSet(LStr("pairs"), fn("pairs") { a =>
      a.headOption.getOrElse(LNil) match {
        case t: LTable =>
          // Stateful iterator: one key snapshot + an index, so a full
          // traversal is O(n) instead of next()'s linear re-scan per
          // step (O(n^2) per table, per row, per partition). Keys
          // deleted mid-walk are skipped — the one mutation Lua's
          // `next` contract allows during traversal.
          val keys = t.m.keys.toVector
          var i = 0
          val it = fn("pairsnext") { _ =>
            while (i < keys.length && !t.m.contains(keys(i))) i += 1
            if (i < keys.length) {
              val k = keys(i); i += 1
              Seq(k, t.m(k))
            } else one(LNil)
          }
          Seq(it, t, LNil)
        case u: LUserData =>
          // userdata pairs: a stateful iterator over the host's keys
          val keys = u.keys()
          var i = 0
          val it = fn("udnext") { _ =>
            if (i < keys.length) {
              val k = keys(i); i += 1
              Seq(k, u.index(k))
            } else one(LNil)
          }
          Seq(it, u, LNil)
        case other => argErr("pairs", 1, "table", other)
      }
    })
    g.rawSet(LStr("ipairs"), fn("ipairs") { a =>
      val t = asTable("ipairs", a, 1)
      val it = fn("inext") { b =>
        val i = asInt("inext", b, 2) + 1
        val v = t.rawGet(LInt(i))
        if (v == LNil) one(LNil) else Seq(LInt(i), v)
      }
      Seq(it, t, LInt(0L))
    })
    g.rawSet(LStr("unpack"), fn("unpack")(a => asTable("unpack", a, 1).arrayValues))
    g.rawSet(LStr("setmetatable"), fn("setmetatable") { a =>
      val t = asTable("setmetatable", a, 1)
      if (t.meta != null && t.meta.rawGet(LStr("__metatable")) != LNil)
        throw LuaError(LStr("cannot change a protected metatable"))
      // a MISSING second argument is an error (luaB_setmetatable:
      // LUA_TNONE ≠ LUA_TNIL); only an explicit nil clears
      if (a.length < 2) throw LuaError(LStr(
        "bad argument #2 to 'setmetatable' (nil or table expected)"))
      a(1) match {
        case mt: LTable => t.meta = mt
        case LNil => t.meta = null
        case other => argErr("setmetatable", 2, "nil or table", other)
      }
      one(t)
    })
    g.rawSet(LStr("getmetatable"), fn("getmetatable") { a =>
      a.headOption.getOrElse(LNil) match {
        case t: LTable if t.meta != null =>
          // __metatable protects: its value masks the real metatable
          val prot = t.meta.rawGet(LStr("__metatable"))
          one(if (prot != LNil) prot else t.meta)
        case _ => one(LNil)
      }
    })

    // the real coroutine library is installed by the VM (it needs the
    // interpreter's call entry); this stub only covers a bare
    // LuaStdlib.install without a VM, which no runtime path does
    val coT = new LTable
    Seq("create", "resume", "yield", "status", "wrap", "isyieldable",
      "running", "close").foreach { n =>
      coT.rawSet(LStr(n), fn("coroutine." + n) { _ =>
        throw LuaError(LStr(
          s"coroutine.$n requires the VM-installed coroutine library"))
      })
    }
    g.rawSet(LStr("coroutine"), coT)

    // ---------------------------------------------------------- string
    val stringT = new LTable
    def strIdx(len: Int, i: Long, default: Int): Int =
      if (i == 0) default
      else if (i > 0) i.toInt
      else (len + i + 1).toInt
    stringT.rawSet(LStr("len"), fn("len")(a => one(LInt(asStr("len", a, 1).length.toLong))))
    stringT.rawSet(LStr("sub"), fn("sub") { a =>
      val s = asStr("sub", a, 1)
      var i = strIdx(s.length, asInt("sub", a, 2), 1)
      var j = strIdx(s.length, asInt("sub", a, 3, Some(-1L)), s.length)
      if (i < 1) i = 1
      if (j > s.length) j = s.length
      one(LStr(if (i > j) "" else s.substring(i - 1, j)))
    })
    stringT.rawSet(LStr("upper"), fn("upper")(a => one(LStr(asStr("upper", a, 1).toUpperCase))))
    stringT.rawSet(LStr("lower"), fn("lower")(a => one(LStr(asStr("lower", a, 1).toLowerCase))))
    stringT.rawSet(LStr("rep"), fn("rep") { a =>
      val s = asStr("rep", a, 1)
      val n = asInt("rep", a, 2).toInt
      val sep = optArg(a, 3).map(_ => asStr("rep", a, 3)).getOrElse("")
      one(LStr(if (n <= 0) "" else Seq.fill(n)(s).mkString(sep)))
    })
    stringT.rawSet(LStr("reverse"), fn("reverse")(a => one(LStr(asStr("reverse", a, 1).reverse))))
    stringT.rawSet(LStr("byte"), fn("byte") { a =>
      val s = asStr("byte", a, 1)
      val i = strIdx(s.length, asInt("byte", a, 2, Some(1L)), 1)
      val j = strIdx(s.length, asInt("byte", a, 3, Some(i.toLong)), i)
      (i to j).flatMap(k =>
        if (k >= 1 && k <= s.length) Some(LInt(s.charAt(k - 1).toLong)) else None)
    })
    stringT.rawSet(LStr("char"), fn("char")(a =>
      one(LStr(a.indices.map(i => asInt("char", a, i + 1).toChar).mkString))))
    stringT.rawSet(LStr("format"), fn("format") { a =>
      // %s renders through the global tostring (so __tostring applies)
      def disp(v: LV): String = g.rawGet(LStr("tostring")) match {
        case LFn(_, f) => f(Seq(v)) match {
          case LStr(s) +: _ => s
          case _ => toDisplay(v)
        }
        case _ => toDisplay(v)
      }
      one(LStr(luaFormat(asStr("format", a, 1), a.drop(1), disp)))
    })
    stringT.rawSet(LStr("find"), fn("find") { a =>
      val s = asStr("find", a, 1)
      val p = asStr("find", a, 2)
      val init0 = strIdx(s.length, asInt("find", a, 3, Some(1L)), 1)
      val init = math.max(1, init0) - 1
      val plain = a.lift(3).exists(truthy)
      if (plain) {
        val at = s.indexOf(p, init)
        if (at < 0) one(LNil)
        else Seq(LInt((at + 1).toLong), LInt((at + p.length).toLong))
      } else LuaPattern.find(s, p, init) match {
        case Some(m) =>
          Seq(LInt((m.start + 1).toLong), LInt(m.end.toLong)) ++ m.captureValues(s)
        case None => one(LNil)
      }
    })
    stringT.rawSet(LStr("match"), fn("match") { a =>
      val s = asStr("match", a, 1)
      val p = asStr("match", a, 2)
      val init = math.max(1, strIdx(s.length, asInt("match", a, 3, Some(1L)), 1)) - 1
      LuaPattern.find(s, p, init) match {
        case Some(m) =>
          val caps = m.captureValues(s)
          if (caps.nonEmpty) caps else one(LStr(s.substring(m.start, m.end)))
        case None => one(LNil)
      }
    })
    stringT.rawSet(LStr("gmatch"), fn("gmatch") { a =>
      val s = asStr("gmatch", a, 1)
      val p = asStr("gmatch", a, 2)
      var pos = 0
      val it = fn("gmatch.it") { _ =>
        if (pos > s.length) one(LNil)
        else LuaPattern.find(s, p, pos, allowAnchor = false) match {
          case Some(m) =>
            pos = if (m.end > m.start) m.end else m.end + 1
            val caps = m.captureValues(s)
            if (caps.nonEmpty) caps else one(LStr(s.substring(m.start, m.end)))
          case None => pos = s.length + 1; one(LNil)
        }
      }
      one(it)
    })
    stringT.rawSet(LStr("gsub"), fn("gsub") { a =>
      val s = asStr("gsub", a, 1)
      val p = asStr("gsub", a, 2)
      val repl = a.lift(2).getOrElse(LNil)
      val maxN = optArg(a, 4).map(_ => asInt("gsub", a, 4)).getOrElse(Long.MaxValue)
      val vmCall = g.rawGet(LStr("__vm")).asInstanceOf[LFn]
      val out = new StringBuilder
      var pos = 0
      var n = 0L
      // lstrlib str_gsub: an anchored pattern gets exactly ONE attempt
      // (at the start), then the loop breaks and the rest copies through
      val anchored = p.startsWith("^")
      var attempts = 0
      while (pos <= s.length && n < maxN && (!anchored || attempts == 0)) {
        attempts += 1
        LuaPattern.find(s, p, pos) match {
          case Some(m) =>
            out ++= s.substring(pos, m.start)
            val whole = s.substring(m.start, m.end)
            val caps = m.captureValues(s)
            val replaced: LV = repl match {
              case LStr(rs) =>
                val sb = new StringBuilder
                var i = 0
                while (i < rs.length) {
                  val c = rs.charAt(i)
                  if (c == '%' && i + 1 < rs.length) {
                    val d = rs.charAt(i + 1)
                    if (d == '0') sb ++= whole
                    else if (d.isDigit) {
                      val ci = d - '1'
                      val cv = if (caps.isEmpty && ci == 0) LStr(whole)
                               else caps.lift(ci).getOrElse(
                                 throw LuaError(LStr(s"invalid capture index %$d in replacement")))
                      sb ++= toDisplay(cv)
                    } else sb += d
                    i += 2
                  } else { sb += c; i += 1 }
                }
                LStr(sb.result())
              case t: LTable =>
                val k = if (caps.nonEmpty) caps.head else LStr(whole)
                t.rawGet(k)
              case f @ (_: LFn | _: LClosure) =>
                val args = if (caps.nonEmpty) caps else Seq(LStr(whole))
                vmCall.f(f +: args).headOption.getOrElse(LNil)
              case other => argErr("gsub", 3, "string/function/table", other)
            }
            replaced match {
              case LNil | LBool(false) => out ++= whole
              case LStr(x) => out ++= x
              case LInt(_) | LNum(_) => out ++= toDisplay(replaced)
              case other =>
                throw LuaError(LStr(s"invalid replacement value (a ${typeName(other)})"))
            }
            n += 1
            pos = if (m.end > m.start) m.end
                  else { if (m.end < s.length) out += s.charAt(m.end); m.end + 1 }
          case None =>
            out ++= s.substring(pos)
            pos = s.length + 1
        }
      }
      if (pos <= s.length) out ++= s.substring(pos)
      Seq(LStr(out.result()), LInt(n))
    })
    g.rawSet(LStr("string"), stringT)

    // ------------------------------------------------------------ math
    val mathT = new LTable
    val rng = new java.util.Random(0x5eed5eedL) // per-VM deterministic
    mathT.rawSet(LStr("pi"), LNum(math.Pi))
    mathT.rawSet(LStr("huge"), LNum(Double.PositiveInfinity))
    mathT.rawSet(LStr("maxinteger"), LInt(Long.MaxValue))
    mathT.rawSet(LStr("mininteger"), LInt(Long.MinValue))
    mathT.rawSet(LStr("floor"), fn("floor") { a =>
      a.headOption.getOrElse(LNil) match {
        case i: LInt => one(i)
        case _ => one(LInt(math.floor(asNum("floor", a, 1)).toLong))
      }
    })
    mathT.rawSet(LStr("ceil"), fn("ceil") { a =>
      a.headOption.getOrElse(LNil) match {
        case i: LInt => one(i)
        case _ => one(LInt(math.ceil(asNum("ceil", a, 1)).toLong))
      }
    })
    mathT.rawSet(LStr("abs"), fn("abs") { a =>
      a.headOption.getOrElse(LNil) match {
        case LInt(i) => one(LInt(math.abs(i)))
        case _ => one(LNum(math.abs(asNum("abs", a, 1))))
      }
    })
    mathT.rawSet(LStr("sqrt"), fn("sqrt")(a => one(LNum(math.sqrt(asNum("sqrt", a, 1))))))
    mathT.rawSet(LStr("exp"), fn("exp")(a => one(LNum(math.exp(asNum("exp", a, 1))))))
    mathT.rawSet(LStr("log"), fn("log") { a =>
      val x = asNum("log", a, 1)
      val r = a.lift(1) match {
        case Some(_) => math.log(x) / math.log(asNum("log", a, 2))
        case None => math.log(x)
      }
      one(LNum(r))
    })
    mathT.rawSet(LStr("max"), fn("max") { a =>
      one(a.reduceLeft((x, y) =>
        if (asNumV(y) > asNumV(x)) y else x))
    })
    mathT.rawSet(LStr("min"), fn("min") { a =>
      one(a.reduceLeft((x, y) =>
        if (asNumV(y) < asNumV(x)) y else x))
    })
    mathT.rawSet(LStr("fmod"), fn("fmod") { a =>
      val (x, y) = (asNum("fmod", a, 1), asNum("fmod", a, 2))
      one(LNum(x % y)) // C fmod: sign of dividend (unlike Lua's %)
    })
    mathT.rawSet(LStr("modf"), fn("modf") { a =>
      val x = asNum("modf", a, 1)
      val ip = if (x >= 0) math.floor(x) else math.ceil(x)
      Seq(LNum(ip), LNum(x - ip))
    })
    mathT.rawSet(LStr("tointeger"), fn("tointeger") { a =>
      a.headOption.getOrElse(LNil) match {
        case i: LInt => one(i)
        case LNum(d) if d.isWhole => one(LInt(d.toLong))
        case LStr(s) => strToNumber(s) match {
          case Some(LInt(i)) => one(LInt(i))
          case Some(LNum(d)) if d.isWhole => one(LInt(d.toLong))
          case _ => one(LNil)
        }
        case _ => one(LNil)
      }
    })
    mathT.rawSet(LStr("type"), fn("type") { a =>
      a.headOption.getOrElse(LNil) match {
        case _: LInt => one(LStr("integer"))
        case _: LNum => one(LStr("float"))
        case _ => one(LNil)
      }
    })
    mathT.rawSet(LStr("random"), fn("random") { a =>
      // empty intervals raise a catchable Lua error, and the width is
      // computed mod 2^64 (UNSIGNED remainder): hi-lo+1 wraps for huge
      // ranges — 0 means the full 2^64 interval — where a signed
      // floorMod would throw ArithmeticException or leave the interval
      def interval(lo: Long, hi: Long): Seq[LV] = {
        if (lo > hi) throw LuaError(LStr(
          "bad argument #2 to 'random' (interval is empty)"))
        val width = hi - lo + 1
        val draw =
          if (width == 0) rng.nextLong()
          else lo + java.lang.Long.remainderUnsigned(rng.nextLong(), width)
        one(LInt(draw))
      }
      a.length match {
        case 0 => one(LNum(rng.nextDouble()))
        case 1 => interval(1L, asInt("random", a, 1))
        case _ => interval(asInt("random", a, 1), asInt("random", a, 2))
      }
    })
    mathT.rawSet(LStr("randomseed"), fn("randomseed")(_ => Nil))
    g.rawSet(LStr("math"), mathT)

    // ----------------------------------------------------------- table
    val tableT = new LTable
    tableT.rawSet(LStr("insert"), fn("insert") { a =>
      val t = asTable("insert", a, 1)
      if (a.length >= 3) {
        val at = asInt("insert", a, 2)
        val n = t.len
        var i = n
        while (i >= at) { t.rawSet(LInt(i + 1), t.rawGet(LInt(i))); i -= 1 }
        t.rawSet(LInt(at), a(2))
      } else t.rawSet(LInt(t.len + 1), a.lift(1).getOrElse(LNil))
      Nil
    })
    tableT.rawSet(LStr("remove"), fn("remove") { a =>
      val t = asTable("remove", a, 1)
      val n = t.len
      val at = optArg(a, 2).map(_ => asInt("remove", a, 2)).getOrElse(n)
      if (n == 0) one(LNil)
      else {
        val removed = t.rawGet(LInt(at))
        var i = at
        while (i < n) { t.rawSet(LInt(i), t.rawGet(LInt(i + 1))); i += 1 }
        t.rawSet(LInt(n), LNil)
        one(removed)
      }
    })
    tableT.rawSet(LStr("concat"), fn("concat") { a =>
      val t = asTable("concat", a, 1)
      val sep = optArg(a, 2).map(_ => asStr("concat", a, 2)).getOrElse("")
      val i = optArg(a, 3).map(_ => asInt("concat", a, 3)).getOrElse(1L)
      val j = optArg(a, 4).map(_ => asInt("concat", a, 4)).getOrElse(t.len)
      one(LStr((i to j).map(k => toDisplay(t.rawGet(LInt(k)))).mkString(sep)))
    })
    tableT.rawSet(LStr("unpack"), g.rawGet(LStr("unpack")))
    tableT.rawSet(LStr("pack"), fn("pack") { a =>
      val t = new LTable
      a.zipWithIndex.foreach { case (v, i) => t.rawSet(LInt(i + 1L), v) }
      t.rawSet(LStr("n"), LInt(a.length.toLong))
      one(t)
    })
    tableT.rawSet(LStr("sort"), fn("sort") { a =>
      val t = asTable("sort", a, 1)
      val vmCall = g.rawGet(LStr("__vm")).asInstanceOf[LFn]
      val cmp: (LV, LV) => Boolean = a.lift(1) match {
        case Some(f @ (_: LFn | _: LClosure)) =>
          (x, y) => truthy(vmCall.f(Seq(f, x, y)).headOption.getOrElse(LNil))
        case _ =>
          // the interpreter's `<`: strings, numbers, or __lt metamethod
          g.rawGet(LStr("__lt")) match {
            case lt: LFn =>
              (x, y) => truthy(lt.f(Seq(x, y)).headOption.getOrElse(LNil))
            case _ =>
              (x, y) => (x, y) match {
                case (LStr(p), LStr(q)) => p < q
                case _ => asNumV(x) < asNumV(y)
              }
          }
      }
      val vals = t.arrayValues.sortWith(cmp)
      vals.zipWithIndex.foreach { case (v, i) => t.rawSet(LInt((i + 1).toLong), v) }
      Nil
    })
    g.rawSet(LStr("table"), tableT)

    // -------------------------------------------------------------- os
    val osT = new LTable
    osT.rawSet(LStr("time"), fn("time") { a =>
      a.headOption match {
        case Some(t: LTable) =>
          val c = java.util.Calendar.getInstance(java.util.TimeZone.getTimeZone("UTC"))
          c.clear()
          def f(k: String, d: Int): Int = t.rawGet(LStr(k)) match {
            case LInt(i) => i.toInt
            case LNum(x) => x.toInt
            case _ => d
          }
          c.set(f("year", 1970), f("month", 1) - 1, f("day", 1),
            f("hour", 12), f("min", 0), f("sec", 0))
          one(LInt(c.getTimeInMillis / 1000))
        case _ => one(LInt(clock() / 1000))
      }
    })
    osT.rawSet(LStr("date"), fn("date") { a =>
      val fmt = optArg(a, 1).map(_ => asStr("date", a, 1)).getOrElse("%c")
      val tSec = optArg(a, 2).map(_ => asInt("date", a, 2)).getOrElse(clock() / 1000)
      val utc = fmt.startsWith("!")
      val f = if (utc) fmt.drop(1) else fmt
      val cal = java.util.Calendar.getInstance(
        java.util.TimeZone.getTimeZone(if (utc) "UTC" else "UTC")) // UTC-only engine
      cal.setTimeInMillis(tSec * 1000)
      if (f == "*t") {
        val t = new LTable
        t.rawSet(LStr("year"), LInt(cal.get(java.util.Calendar.YEAR).toLong))
        t.rawSet(LStr("month"), LInt((cal.get(java.util.Calendar.MONTH) + 1).toLong))
        t.rawSet(LStr("day"), LInt(cal.get(java.util.Calendar.DAY_OF_MONTH).toLong))
        t.rawSet(LStr("hour"), LInt(cal.get(java.util.Calendar.HOUR_OF_DAY).toLong))
        t.rawSet(LStr("min"), LInt(cal.get(java.util.Calendar.MINUTE).toLong))
        t.rawSet(LStr("sec"), LInt(cal.get(java.util.Calendar.SECOND).toLong))
        t.rawSet(LStr("yday"), LInt(cal.get(java.util.Calendar.DAY_OF_YEAR).toLong))
        t.rawSet(LStr("wday"), LInt(cal.get(java.util.Calendar.DAY_OF_WEEK).toLong))
        t.rawSet(LStr("isdst"), LBool(false))
        one(t)
      } else {
        // strftime rendered directive-by-directive: literal text passes
        // through verbatim (a SimpleDateFormat translation would choke
        // on pattern letters in the literals — '!%Y-%m-%dT%H:%M:%SZ',
        // the standard ISO idiom, contains both 'T' and 'Z')
        one(LStr(strftime(f, cal)))
      }
    })
    g.rawSet(LStr("os"), osT)

    // ------------------------------------------------------------ utf8
    // Lua 5.3's utf8 library over JVM strings: positions are CHAR
    // indices (UTF-16 code units), consistent with this VM's documented
    // #s/string.sub divergence from Lua's byte positions; code points
    // themselves are exact (surrogate pairs handled).
    val utf8T = new LTable
    // the reference byte-pattern value; over UTF-16 strings it matches
    // only its literal char ranges (documented divergence)
    utf8T.rawSet(LStr("charpattern"),
      LStr("[\u0000-\u007F\u00C2-\u00FD][\u0080-\u00BF]*"))
    utf8T.rawSet(LStr("char"), fn("char") { a =>
      one(LStr(a.indices.map(i =>
        new String(Character.toChars(asInt("char", a, i + 1).toInt))).mkString))
    })
    utf8T.rawSet(LStr("len"), fn("len") { a =>
      val s = asStr("len", a, 1)
      val i = optArg(a, 2).map(_ => asInt("len", a, 2).toInt).getOrElse(1)
      val j = optArg(a, 3).map(_ => asInt("len", a, 3).toInt).getOrElse(-1)
      val from = math.max(0, if (i > 0) i - 1 else s.length + i)
      val to = math.min(s.length, if (j >= 0) j else s.length + j + 1)
      one(LInt(if (to <= from) 0L else s.codePointCount(from, to).toLong))
    })
    utf8T.rawSet(LStr("codepoint"), fn("codepoint") { a =>
      val s = asStr("codepoint", a, 1)
      val i = optArg(a, 2).map(_ => asInt("codepoint", a, 2).toInt).getOrElse(1)
      val j = optArg(a, 3).map(_ => asInt("codepoint", a, 3).toInt).getOrElse(i)
      val from = if (i > 0) i - 1 else s.length + i
      val to = if (j >= 0) j else s.length + j + 1
      if (from < 0 || to > s.length)
        throw LuaError(LStr("bad argument #2 to 'codepoint' (out of bounds)"))
      val out = Seq.newBuilder[LV]
      var p = from
      while (p < to) {
        val cp = s.codePointAt(p)
        out += LInt(cp.toLong)
        p += Character.charCount(cp)
      }
      out.result()
    })
    utf8T.rawSet(LStr("codes"), fn("codes") { a =>
      val s = asStr("codes", a, 1)
      val it = fn("codes.it") { b =>
        val prev = asInt("codes.it", b, 2).toInt
        // advance past the char AT prev (1-based); 0 starts at the front
        val next =
          if (prev <= 0) 0
          else prev - 1 + Character.charCount(s.codePointAt(prev - 1))
        if (next >= s.length) one(LNil)
        else Seq(LInt(next + 1L), LInt(s.codePointAt(next).toLong))
      }
      Seq(it, LStr(s), LInt(0L))
    })
    utf8T.rawSet(LStr("offset"), fn("offset") { a =>
      val s = asStr("offset", a, 1)
      val n = asInt("offset", a, 2)
      val i = optArg(a, 3).map(_ => asInt("offset", a, 3).toInt)
        .getOrElse(if (n >= 0) 1 else s.length + 1)
      var p = if (i > 0) i - 1 else s.length + i
      if (n > 0) {
        var k = n - 1
        while (k > 0 && p < s.length) { p += Character.charCount(s.codePointAt(p)); k -= 1 }
        if (k > 0) one(LNil) else one(LInt(p + 1L))
      } else if (n == 0) {
        while (p > 0 && Character.isLowSurrogate(s.charAt(p - 1))) p -= 1
        one(LInt(p + 1L))
      } else {
        var k = -n
        while (k > 0 && p > 0) {
          p -= 1
          if (Character.isLowSurrogate(s.charAt(p)) && p > 0) p -= 1
          k -= 1
        }
        if (k > 0) one(LNil) else one(LInt(p + 1L))
      }
    })
    g.rawSet(LStr("utf8"), utf8T)
  }

  private def asNumV(v: LV): Double = v match {
    case LInt(i) => i.toDouble
    case LNum(d) => d
    case LStr(s) => strToNumber(s).map(asNumV).getOrElse(
      throw LuaError(LStr(s"attempt to compare ${typeName(v)}")))
    case other => throw LuaError(LStr(s"attempt to compare ${typeName(other)}"))
  }

  /** `string.format` — translate the C conversions Lua supports onto
    * java.util.Formatter; `%q` quotes per Lua.
    */
  private def luaFormat(fmt: String, args: Seq[LV],
                        disp: LV => String = toDisplay): String = {
    val out = new StringBuilder
    var i = 0
    var argI = 0
    def nextArg(): LV = {
      val v = args.lift(argI).getOrElse(
        throw LuaError(LStr(s"bad argument #${argI + 2} to 'format' (no value)")))
      argI += 1
      v
    }
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c != '%') { out += c; i += 1 }
      else if (i + 1 < fmt.length && fmt.charAt(i + 1) == '%') { out += '%'; i += 2 }
      else {
        val spec = new StringBuilder("%")
        i += 1
        while (i < fmt.length && "-+ #0".indexOf(fmt.charAt(i)) >= 0) { spec += fmt.charAt(i); i += 1 }
        while (i < fmt.length && fmt.charAt(i).isDigit) { spec += fmt.charAt(i); i += 1 }
        if (i < fmt.length && fmt.charAt(i) == '.') {
          spec += '.'; i += 1
          while (i < fmt.length && fmt.charAt(i).isDigit) { spec += fmt.charAt(i); i += 1 }
        }
        if (i >= fmt.length) throw LuaError(LStr("invalid format string"))
        val conv = fmt.charAt(i); i += 1
        conv match {
          case 'd' | 'i' =>
            out ++= String.format(spec.result() + "d", Long.box(asIntV(nextArg())))
          case 'u' =>
            out ++= String.format(spec.result() + "s",
              java.lang.Long.toUnsignedString(asIntV(nextArg())))
          case 'x' | 'X' | 'o' =>
            out ++= String.format(spec.result() + conv, Long.box(asIntV(nextArg())))
          case 'c' =>
            out += asIntV(nextArg()).toChar
          case 'f' | 'F' | 'e' | 'E' =>
            out ++= String.format(spec.result() + conv, Double.box(asNumV(nextArg())))
          case 'g' | 'G' =>
            // C %g trims trailing zeros unless '#'; Java's %g keeps them
            // and rejects the '#' flag outright — so strip '#' before
            // formatting and let its presence just suppress the trim
            val alt = spec.result().contains('#')
            val jspec = spec.result().replace("#", "")
            val raw = String.format(jspec + conv, Double.box(asNumV(nextArg())))
            out ++= (if (alt) raw else trimG(raw))
          case 'a' | 'A' =>
            out ++= String.format(spec.result() + conv, Double.box(asNumV(nextArg())))
          case 's' =>
            out ++= String.format(spec.result() + "s", disp(nextArg()))
          case 'q' =>
            val s = toDisplay(nextArg())
            out += '"'
            s.foreach {
              case '"' => out ++= "\\\""
              case '\\' => out ++= "\\\\"
              case '\n' => out ++= "\\n"
              case '\r' => out ++= "\\r"
              case '\u0000' => out ++= "\\0"
              case ch => out += ch
            }
            out += '"'
          case other => throw LuaError(LStr(s"invalid conversion '%$other' to 'format'"))
        }
      }
    }
    out.result()
  }

  /** The strftime subset `os.date` renders (C99 core directives; the
    * engine is UTC-only so %z/%Z are the UTC forms).
    */
  private def strftime(fmt: String, cal: java.util.Calendar): String = {
    import java.util.Calendar._
    val Months = Array("January", "February", "March", "April", "May", "June",
      "July", "August", "September", "October", "November", "December")
    val Days = Array("Sunday", "Monday", "Tuesday", "Wednesday", "Thursday",
      "Friday", "Saturday")
    def d2(v: Int) = f"$v%02d"
    val out = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c != '%' || i + 1 >= fmt.length) { out += c; i += 1 }
      else {
        val dow = cal.get(DAY_OF_WEEK) - 1
        fmt.charAt(i + 1) match {
          case 'Y' => out ++= cal.get(YEAR).toString
          case 'y' => out ++= d2(cal.get(YEAR) % 100)
          case 'm' => out ++= d2(cal.get(MONTH) + 1)
          case 'd' => out ++= d2(cal.get(DAY_OF_MONTH))
          case 'e' => out ++= f"${cal.get(DAY_OF_MONTH)}%2d"
          case 'H' => out ++= d2(cal.get(HOUR_OF_DAY))
          case 'I' => out ++= d2({ val h = cal.get(HOUR_OF_DAY) % 12; if (h == 0) 12 else h })
          case 'M' => out ++= d2(cal.get(MINUTE))
          case 'S' => out ++= d2(cal.get(SECOND))
          case 'p' => out ++= (if (cal.get(HOUR_OF_DAY) < 12) "AM" else "PM")
          case 'j' => out ++= f"${cal.get(DAY_OF_YEAR)}%03d"
          case 'a' => out ++= Days(dow).take(3)
          case 'A' => out ++= Days(dow)
          case 'b' | 'h' => out ++= Months(cal.get(MONTH)).take(3)
          case 'B' => out ++= Months(cal.get(MONTH))
          case 's' => out ++= (cal.getTimeInMillis / 1000).toString
          case 'z' => out ++= "+0000"
          case 'Z' => out ++= "UTC"
          case 'n' => out += '\n'
          case 't' => out += '\t'
          case '%' => out += '%'
          case 'c' => out ++= s"${Days(dow).take(3)} ${Months(cal.get(MONTH)).take(3)} " +
            f"${cal.get(DAY_OF_MONTH)}%2d " +
            s"${d2(cal.get(HOUR_OF_DAY))}:${d2(cal.get(MINUTE))}:${d2(cal.get(SECOND))} " +
            cal.get(YEAR).toString
          case 'x' => out ++= s"${d2(cal.get(MONTH) + 1)}/${d2(cal.get(DAY_OF_MONTH))}/${d2(cal.get(YEAR) % 100)}"
          case 'X' => out ++= s"${d2(cal.get(HOUR_OF_DAY))}:${d2(cal.get(MINUTE))}:${d2(cal.get(SECOND))}"
          case other => throw LuaError(LStr(
            s"bad argument #1 to 'date' (invalid conversion specifier '%$other')"))
        }
        i += 2
      }
    }
    out.result()
  }

  /** C `%g` zero-trimming over Java's zero-keeping output. */
  private def trimG(s: String): String = {
    val (mant, ex) = s.span(c => c != 'e' && c != 'E')
    val m2 =
      if (mant.contains('.'))
        mant.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
      else mant
    m2 + ex
  }

  private def asIntV(v: LV): Long = v match {
    case LInt(i) => i
    case LNum(d) if d.isWhole => d.toLong
    case LStr(s) => strToNumber(s) match {
      case Some(LInt(i)) => i
      case Some(LNum(d)) if d.isWhole => d.toLong
      case _ => throw LuaError(LStr("number expected"))
    }
    case other => throw LuaError(LStr(s"number expected, got ${typeName(other)}"))
  }
}
