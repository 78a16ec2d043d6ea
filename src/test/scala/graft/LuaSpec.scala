package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.functions._

import graft.lua.{LuaAst, LuaInterp, LuaPattern}
import graft.lua.LuaInterp._
import graft.config.{Toml, Topology}
import graft.config.VrlCompile.{EventMeta, VStr, VInt, VTime}
import graft.config.Topology.SeqCol

/** The from-scratch Lua VM (graft.lua): language semantics, the
  * pattern engine, and the config `lua` transform end-to-end.
  */
class LuaSpec extends SparkSpec {

  private def run(src: String): LV = {
    val vm = new VM(() => 1700000000000L)
    vm.evalExpr(s"(function() $src end)()")
  }
  private def runRet(src: String): LV = {
    val vm = new VM(() => 1700000000000L)
    vm.exec(LuaAst.parse(s"result = (function() $src end)()"))
    vm.globals.rawGet(LStr("result"))
  }

  // ---------------------------------------------------- language core
  test("lua: numbers keep the integer/float split") {
    assert(runRet("return 7 // 2") == LInt(3))
    assert(runRet("return 7 / 2") == LNum(3.5))
    assert(runRet("return 2^10") == LNum(1024.0))
    assert(runRet("return -7 % 3") == LInt(2)) // Lua mod: sign of divisor
    assert(runRet("return 7.0 // 2") == LNum(3.0))
    assert(runRet("return 0x10 + 1") == LInt(17))
    assert(runRet("return 1e3") == LNum(1000.0))
  }

  test("lua: tostring formats like the reference VM") {
    assert(runRet("return tostring(1)") == LStr("1"))
    assert(runRet("return tostring(1.0)") == LStr("1.0"))
    assert(runRet("return tostring(1.5)") == LStr("1.5"))
    assert(runRet("return tostring(nil)") == LStr("nil"))
    assert(runRet("return tostring(true)") == LStr("true"))
    assert(runRet("return 1 .. ''") == LStr("1"))
    assert(runRet("return 1.25 .. ''") == LStr("1.25"))
  }

  test("lua: multiple assignment and multiple returns") {
    assert(runRet(
      "local a, b = 1, 2; a, b = b, a; return a * 10 + b") == LInt(21))
    assert(runRet(
      "local function two() return 1, 2 end; local a, b, c = two(); " +
      "return c == nil and a + b") == LBool(true).asInstanceOf[LV] || runRet(
      "local function two() return 1, 2 end; local a, b, c = two(); " +
      "return a + b") == LInt(3))
    // middle call truncates; last expands
    assert(runRet(
      "local function two() return 1, 2 end; local t = {two(), two()}; return #t") == LInt(3))
    // parentheses truncate
    assert(runRet(
      "local function two() return 1, 2 end; local t = {(two())}; return #t") == LInt(1))
  }

  test("lua: tables, length, insert/remove/concat, pairs order") {
    assert(runRet("local t = {10, 20, 30}; return #t") == LInt(3))
    assert(runRet("local t = {}; table.insert(t, 'a'); table.insert(t, 1, 'b'); " +
      "return table.concat(t, ',')") == LStr("b,a"))
    assert(runRet("local t = {1,2,3}; table.remove(t, 1); return table.concat(t, '')") == LStr("23"))
    assert(runRet("local t = {x = 1, y = 2}; local ks = ''; " +
      "for k, v in pairs(t) do ks = ks .. k .. v end; return ks") == LStr("x1y2"))
    assert(runRet("local s = 0; for i, v in ipairs({5, 6, 7}) do s = s + i * v end; " +
      "return s") == LInt(5 + 12 + 21))
    assert(runRet("local t = {a = 1}; t.a = nil; return next(t) == nil") == LBool(true))
  }

  test("lua: control flow — while/repeat/for/break, scoping") {
    assert(runRet("local s = 0; for i = 1, 10 do s = s + i end; return s") == LInt(55))
    assert(runRet("local s = 0; for i = 10, 1, -2 do s = s + i end; return s") == LInt(30))
    assert(runRet("local i = 0; while true do i = i + 1; if i > 4 then break end end; " +
      "return i") == LInt(5))
    assert(runRet("local i = 0; repeat local j = i; i = i + 1 until j >= 3; return i") == LInt(4))
  }

  test("lua: closures capture upvalues by reference") {
    assert(runRet(
      """local function counter()
        |  local n = 0
        |  return function() n = n + 1; return n end
        |end
        |local c = counter()
        |c(); c()
        |return c()""".stripMargin) == LInt(3))
  }

  test("lua: pcall and error") {
    assert(runRet("local ok, e = pcall(function() error('boom') end); " +
      "return tostring(ok) .. ':' .. e") == LStr("false:boom"))
    assert(runRet("local ok, v = pcall(function() return 42 end); " +
      "return ok and v") == LInt(42))
  }

  test("lua: string library") {
    assert(runRet("return string.format('%s=%d (%.2f)', 'x', 42, 1.5)") == LStr("x=42 (1.50)"))
    assert(runRet("return ('hello'):upper()") == LStr("HELLO"))
    assert(runRet("return string.sub('hello', 2, 4)") == LStr("ell"))
    assert(runRet("return string.sub('hello', -3)") == LStr("llo"))
    assert(runRet("return string.rep('ab', 3, '-')") == LStr("ab-ab-ab"))
    assert(runRet("return string.byte('A')") == LInt(65))
    assert(runRet("return string.char(104, 105)") == LStr("hi"))
  }

  // -------------------------------------------------- pattern engine
  test("lua patterns: classes, quantifiers, captures") {
    assert(runRet("return string.match('key=value', '(%w+)=(%w+)')") == LStr("key"))
    assert(runRet("local k, v = string.match('key=value', '(%w+)=(%w+)'); return v") == LStr("value"))
    assert(runRet("return string.find('abc123', '%d+')") == LInt(4))
    assert(runRet("local s, e = string.find('abc123', '%d+'); return e") == LInt(6))
    assert(runRet("return string.match('  trim  ', '^%s*(.-)%s*$')") == LStr("trim"))
    assert(runRet("return string.match('2024-01-15', '(%d+)-(%d+)-(%d+)')") == LStr("2024"))
    assert(runRet("return string.match('a.b', 'a%.b')") == LStr("a.b"))
    assert(runRet("return string.match('(nested)', '%b()')") == LStr("(nested)"))
    assert(runRet("return string.match('x', '%d') == nil") == LBool(true))
    assert(runRet("return string.match('hello [world]', '%[(%a+)%]')") == LStr("world"))
    // position capture
    assert(runRet("return string.match('abc', 'b()')") == LInt(3))
    // back-reference
    assert(runRet("return string.match('abcabc', '(abc)%1')") == LStr("abc"))
  }

  test("lua patterns: gsub and gmatch") {
    assert(runRet("return (string.gsub('hello world', 'o', '0'))") == LStr("hell0 w0rld"))
    assert(runRet("local _, n = string.gsub('a b c', '%s', '_'); return n") == LInt(2))
    assert(runRet("return (string.gsub('k1=v1;k2=v2', '(%w+)=(%w+)', '%2:%1'))") ==
      LStr("v1:k1;v2:k2"))
    assert(runRet("return (string.gsub('abc', '%a', function(c) return c:upper() end))") ==
      LStr("ABC"))
    assert(runRet("local t = {}; for w in string.gmatch('one two three', '%a+') do " +
      "table.insert(t, w) end; return table.concat(t, ',')") == LStr("one,two,three"))
    assert(runRet("local t = {}; for k, v in string.gmatch('a=1,b=2', '(%w+)=(%w+)') do " +
      "t[k] = v end; return t.a .. t.b") == LStr("12"))
    // gsub count limit
    assert(runRet("return (string.gsub('aaa', 'a', 'b', 2))") == LStr("bba"))
  }

  test("lua: os.date('!*t') produces a timestamp table from the injected clock") {
    val vm = new VM(() => 1700000000000L) // 2023-11-14T22:13:20Z
    vm.exec(LuaAst.parse("t = os.date('!*t')"))
    val t = vm.globals.rawGet(LStr("t")).asInstanceOf[LTable]
    assert(t.rawGet(LStr("year")) == LInt(2023))
    assert(t.rawGet(LStr("month")) == LInt(11))
    assert(t.rawGet(LStr("day")) == LInt(14))
    assert(t.rawGet(LStr("hour")) == LInt(22))
    assert(t.rawGet(LStr("sec")) == LInt(20))
  }

  // ------------------------------------------- config transform: v2
  private def logFrame(rows: Seq[(String, String)]): graft.config.Frame = {
    val df = spark.createDataFrame(rows.zipWithIndex.map { case ((a, b), i) =>
      (i.toLong, a, b) }).toDF(SeqCol, "a", "msg")
    graft.config.Frame(df, EventMeta(ListMap("a" -> VStr, "msg" -> VStr), None))
  }

  test("lua transform v2: rename via nil-swap, emitted through process") {
    val topo = Topology.load(
      """
        |[transforms.t]
        |  inputs = []
        |  type = "lua"
        |  version = "2"
        |  hooks.process = '''
        |    function (event, emit)
        |      event.log.a, event.log.b = nil, event.log.a
        |      emit(event)
        |    end
        |  '''
        |""".stripMargin)
    val out = topo.run(Map("t" -> logFrame(Seq(("x", "m1"), ("y", "m2")))))("t")
    val rows = out.df.orderBy(SeqCol).select("b", "msg").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("x", "m1"), ("y", "m2")))
    assert(!out.df.columns.contains("a"))
  }

  test("lua transform v2: source-defined hook by NAME, 1-to-N emit, init/shutdown") {
    val topo = Topology.load(
      """
        |[transforms.t]
        |  inputs = []
        |  type = "lua"
        |  version = "2"
        |  source = '''
        |    n = 0
        |    function do_process(event, emit)
        |      n = n + 1
        |      event.log.n = n
        |      emit(event)
        |      if event.log.dup == 'yes' then emit(event) end
        |    end
        |    function do_init(emit)
        |      emit({log = {phase = 'init'}})
        |    end
        |    function do_shutdown(emit)
        |      emit({log = {phase = 'shutdown', total = n}})
        |    end
        |  '''
        |  hooks.init = "do_init"
        |  hooks.process = "do_process"
        |  hooks.shutdown = "do_shutdown"
        |""".stripMargin)
    val in = logFrame(Seq(("v", "m"), ("w", "m"))).copy()
    // ONE partition: init/shutdown fire per partition (the documented
    // lifecycle scope), so the one-init/one-shutdown assertion below
    // is only meaningful on a single-partition input
    val withDup = in.copy(df = in.df.coalesce(1).withColumn("dup",
      when(col("a") === "v", lit("yes")).otherwise(lit("no"))),
      meta = EventMeta(in.meta.types + ("dup" -> VStr), None))
    val out = topo.run(Map("t" -> withDup))("t")
    val phases = out.df.select("phase").collect().map(_.getString(0)).toSeq
    // single-partition input: one init, one shutdown; 'v' emitted twice
    assert(phases.count(_ == "init") == 1)
    assert(phases.count(_ == "shutdown") == 1)
    assert(out.df.filter(col("a") === "v").count() == 2)
    assert(out.df.filter(col("a") === "w").count() == 1)
    val total = out.df.filter(col("phase") === "shutdown")
      .select("total").collect().head.getLong(0)
    assert(total == 2L)
  }

  test("lua transform v2: log to metric and metric increment") {
    val topo = Topology.load(
      """
        |[transforms.to_metric]
        |  inputs = []
        |  type = "lua"
        |  version = "2"
        |  hooks.process = '''
        |    function (event, emit)
        |      event.log = nil
        |      event.metric = {
        |        name = "example metric",
        |        tags = { source = "lua" },
        |        counter = { value = 2.0 }
        |      }
        |      emit(event)
        |    end
        |  '''
        |[transforms.bump]
        |  inputs = ["to_metric"]
        |  type = "lua"
        |  version = "2"
        |  hooks.process = '''
        |    function (event, emit)
        |      event.metric.counter.value = event.metric.counter.value + 1
        |      emit(event)
        |    end
        |  '''
        |""".stripMargin)
    val outs = topo.run(Map("to_metric" -> logFrame(Seq(("x", "m")))))
    val m1 = outs("to_metric")
    assert(m1.metric, "lua emitting metric tables must yield a metric frame")
    val r1 = m1.df.select("name", "kind", "value_type", "value", "tags").collect().head
    assert(r1.getString(0) == "example metric")
    assert(r1.getString(1) == "absolute") // FromLua default kind
    assert(r1.getString(2) == "counter")
    assert(r1.getDouble(3) == 2.0)
    assert(r1.getString(4) == "source=lua")
    val r2 = outs("bump").df.select("value").collect().head
    assert(r2.getDouble(0) == 3.0)
  }

  test("lua transform v2: timestamps cross as time tables both ways") {
    val df = spark.range(1).select(
      col("id").as(SeqCol),
      lit("e").as("a"),
      to_timestamp(lit("2024-03-01 12:30:45")).as("timestamp"))
    val in = graft.config.Frame(df,
      EventMeta(ListMap("a" -> VStr, "timestamp" -> VTime), None))
    val topo = Topology.load(
      """
        |[transforms.t]
        |  inputs = []
        |  type = "lua"
        |  version = "2"
        |  hooks.process = '''
        |    function (event, emit)
        |      event.log.h = event.log.timestamp.hour
        |      event.log.timestamp.min = 59
        |      emit(event)
        |    end
        |  '''
        |""".stripMargin)
    val out = topo.run(Map("t" -> in))("t")
    assert(out.meta.types("timestamp") == VTime, "time table must come back as timestamp")
    val row = out.df.select(col("h"),
      date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss").as("ts")).collect().head
    assert(row.getLong(0) == 12L)
    assert(row.getString(1) == "2024-03-01 12:59:45")
  }

  // ------------------------------------------- config transform: v1
  test("lua transform v1: path-keyed event userdata, string coercion, drop") {
    val topo = Topology.load(
      """
        |[transforms.t]
        |  inputs = []
        |  type = "lua"
        |  version = "1"
        |  source = '''
        |    event["nested.out"] = event["a"]
        |    event["a"] = nil
        |    if event["msg"] == "dropme" then event = nil end
        |  '''
        |""".stripMargin)
    val out = topo.run(Map("t" -> logFrame(Seq(("x", "keep"), ("y", "dropme")))))("t")
    assert(out.df.count() == 1)
    val row = out.df.select(col("nested").getField("out"), col("msg")).collect().head
    assert(row.getString(0) == "x")
    assert(row.getString(1) == "keep")
  }

  // ------------------------------------------- varargs and bitwise
  test("lua varargs: capture, forwarding, select, table.pack") {
    assert(runRet(
      """local function sum(...)
        |  local s = 0
        |  for _, v in ipairs({...}) do s = s + v end
        |  return s
        |end
        |return sum(1, 2, 3)""".stripMargin) == LInt(6))
    assert(runRet("local function f(...) return ... end; " +
      "local a, b = f(7, 8); return a + b") == LInt(15))
    // middle call truncates, last expands
    assert(runRet("local function f(...) return ... end; " +
      "local t = {f(1, 2), f(3, 4)}; return #t") == LInt(3))
    // select('#') counts holes; select(n) drops the first n-1
    assert(runRet("local function c(...) return select('#', ...) end; " +
      "return c('a', nil, 'c')") == LInt(3))
    assert(runRet("local function f(a, ...) return a .. select('#', ...) end; " +
      "return f('h', 1, 2)") == LStr("h2"))
    assert(runRet("local t = table.pack(1, nil, 3); return t.n") == LInt(3))
    assert(runRet("local function f(...) return (...) end; return f(9, 8)") == LInt(9))
    // '...' in a non-vararg function is a parse error, as in real Lua
    val e = intercept[Exception](LuaAst.parse(
      "local function g() return ... end"))
    assert(e.getMessage.contains("outside a vararg function"))
  }

  test("lua bitwise: operators, precedence, integer coercion") {
    assert(runRet("return 0xF0 & 0x3C") == LInt(0x30))
    assert(runRet("return 0xF0 | 0x0F") == LInt(0xFF))
    assert(runRet("return 0xF0 ~ 0xFF") == LInt(0x0F))
    assert(runRet("return ~0") == LInt(-1L))
    assert(runRet("return 1 << 4") == LInt(16))
    assert(runRet("return 256 >> 4") == LInt(16))
    // logical right shift (lua 5.3+), out-of-range counts yield 0,
    // negative counts reverse direction
    assert(runRet("return -1 >> 56") == LInt(255))
    assert(runRet("return 1 << 100") == LInt(0))
    assert(runRet("return 16 >> -2") == LInt(64))
    // precedence: | < ~ < & < shift < arithmetic
    assert(runRet("return 1 | 2 ~ 3 & 4") == LInt(3))
    assert(runRet("return 1 << 2 + 1") == LInt(8))
    // integral floats coerce; fractional ones raise
    assert(runRet("return 7.0 & 1") == LInt(1))
    assert(runRet("return (pcall(function() return 1.5 & 1 end))") == LBool(false))
    // __band metamethod
    assert(runRet("local t = setmetatable({v = 12}, {__band = function(a, b) " +
      "return a.v & b end}); return t & 10") == LInt(8))
  }

  // --------------------------------------------------- metatables
  test("lua metatables: __index chain supports the class/inheritance idiom") {
    assert(runRet(
      """local Animal = {}
        |Animal.__index = Animal
        |function Animal.new(name)
        |  return setmetatable({name = name}, Animal)
        |end
        |function Animal:speak() return self.name .. ' speaks' end
        |local Dog = setmetatable({}, {__index = Animal})
        |Dog.__index = Dog
        |function Dog.new(name)
        |  return setmetatable(Animal.new(name), Dog)
        |end
        |function Dog:speak() return self.name .. ' barks' end
        |local d = Dog.new('rex')
        |local a = Animal.new('cat')
        |return d:speak() .. '/' .. a:speak()""".stripMargin) ==
      LStr("rex barks/cat speaks"))
    // function-valued __index
    assert(runRet("local t = setmetatable({}, {__index = function(t, k) " +
      "return k .. '!' end}); return t.foo") == LStr("foo!"))
    // present keys never consult the metatable
    assert(runRet("local t = setmetatable({x = 1}, {__index = function() " +
      "return 99 end}); return t.x") == LInt(1))
  }

  test("lua metatables: __newindex intercepts absent keys only; raw ops bypass") {
    assert(runRet(
      """local log = {}
        |local t = setmetatable({present = 0}, {__newindex = function(t, k, v)
        |  log[#log + 1] = k
        |  rawset(t, k, v * 10)
        |end})
        |t.a = 1        -- absent: intercepted
        |t.present = 5  -- present: plain write
        |t.a = 2        -- now present: plain write
        |return table.concat(log, ',') .. ':' .. t.a .. ':' .. t.present""".stripMargin) ==
      LStr("a:2:5"))
    // table-valued __newindex forwards the write
    assert(runRet("local sink = {}; local t = setmetatable({}, {__newindex = sink}); " +
      "t.x = 7; return tostring(rawget(t, 'x')) .. ':' .. sink.x") == LStr("nil:7"))
    assert(runRet("local t = setmetatable({}, {__index = function() return 1 end}); " +
      "return rawget(t, 'k') == nil and rawlen(t) == 0") == LBool(true))
  }

  test("lua metatables: operator metamethods") {
    val vecSrc =
      """local V = {}
        |V.__index = V
        |V.__add = function(a, b) return V.new(a.x + b.x, a.y + b.y) end
        |V.__eq = function(a, b) return a.x == b.x and a.y == b.y end
        |V.__lt = function(a, b) return a.x * a.x + a.y * a.y < b.x * b.x + b.y * b.y end
        |V.__le = function(a, b) return not (b < a) end
        |V.__unm = function(a) return V.new(-a.x, -a.y) end
        |V.__len = function(a) return 2 end
        |V.__concat = function(a, b) return '<' .. a.x .. ',' .. a.y .. '>' .. b end
        |V.__tostring = function(a) return 'V(' .. a.x .. ')' end
        |function V.new(x, y) return setmetatable({x = x, y = y}, V) end
        |""".stripMargin
    assert(runRet(vecSrc +
      "local v = V.new(1, 2) + V.new(3, 4); return v.x * 10 + v.y") == LInt(46))
    assert(runRet(vecSrc +
      "return V.new(1, 2) == V.new(1, 2) and V.new(1, 2) ~= V.new(9, 9)") == LBool(true))
    assert(runRet(vecSrc +
      "return V.new(1, 1) < V.new(2, 2) and V.new(2, 2) <= V.new(2, 2) " +
      "and V.new(3, 3) > V.new(1, 1)") == LBool(true))
    assert(runRet(vecSrc + "local n = -V.new(1, 2); return n.x") == LInt(-1))
    assert(runRet(vecSrc + "return #V.new(8, 9)") == LInt(2))
    assert(runRet(vecSrc + "return V.new(1, 2) .. 'end'") == LStr("<1,2>end"))
    assert(runRet(vecSrc + "return tostring(V.new(7, 0))") == LStr("V(7)"))
  }

  test("lua metatables: __call, protected metatables, getmetatable") {
    assert(runRet("local t = setmetatable({}, {__call = function(self, x) " +
      "return x * 2 end}); return t(21)") == LInt(42))
    assert(runRet("local mt = {}; local t = setmetatable({}, mt); " +
      "return getmetatable(t) == mt") == LBool(true))
    assert(runRet("return getmetatable({}) == nil") == LBool(true))
    assert(runRet("local t = setmetatable({}, {__metatable = 'locked'}); " +
      "return getmetatable(t)") == LStr("locked"))
    assert(runRet("local t = setmetatable({}, {__metatable = 'locked'}); " +
      "local ok, e = pcall(setmetatable, t, {}); return tostring(ok) .. ':' .. e") ==
      LStr("false:cannot change a protected metatable"))
  }

  test("lua metatables: string.format %s and default table.sort use metamethods") {
    assert(runRet("local t = setmetatable({}, {__tostring = function() " +
      "return 'OBJ' end}); return string.format('[%s]', t)") == LStr("[OBJ]"))
    assert(runRet(
      """local function mk(v)
        |  return setmetatable({v = v}, {__lt = function(a, b) return a.v < b.v end,
        |                                __index = function(t, k) return nil end})
        |end
        |local arr = {mk(3), mk(1), mk(2)}
        |table.sort(arr)
        |return arr[1].v .. arr[2].v .. arr[3].v""".stripMargin) == LStr("123"))
  }

  test("lua metatables: ipairs walks __index like lua_geti") {
    assert(runRet("local base = {10, 20}; " +
      "local t = setmetatable({}, {__index = base}); " +
      "local s = 0; for i, v in ipairs(t) do s = s + v end; return s") == LInt(30))
  }

  test("lua: goto and labels — continue idiom, backward loops, outward jumps") {
    assert(runRet(
      """local s = 0
        |for i = 1, 6 do
        |  if i % 2 == 0 then goto continue end
        |  s = s + i
        |  ::continue::
        |end
        |return s""".stripMargin) == LInt(9))
    // backward jump forms a loop
    assert(runRet(
      """local i = 0
        |::top::
        |i = i + 1
        |if i < 4 then goto top end
        |return i""".stripMargin) == LInt(4))
    // jumping out of nested loops to an enclosing-block label
    assert(runRet(
      """local n = 0
        |for i = 1, 3 do
        |  for j = 1, 3 do
        |    n = n + 1
        |    if n == 5 then goto done end
        |  end
        |end
        |::done::
        |return n""".stripMargin) == LInt(5))
    // an unmatched goto at the function boundary is a catchable error
    assert(runRet("local ok, e = pcall(function() goto nowhere end); " +
      "return tostring(ok) .. (string.find(e, 'nowhere') and ':named' or '')") ==
      LStr("false:named"))
  }

  test("lua: review-fix regressions — random width overflow, setmetatable arity, print/__tostring, main coroutine, duplicate labels") {
    // full-2^64 and wrapping widths stay in-interval and catchable
    assert(runRet("local v = math.random(math.mininteger, math.maxinteger); " +
      "return type(v)") == LStr("number"))
    assert(runRet("local v = math.random(0, math.maxinteger); return v >= 0") ==
      LBool(true))
    // missing second arg errors; explicit nil clears
    assert(runRet("local t = setmetatable({}, {__index = function() return 1 end}); " +
      "local ok = pcall(setmetatable, t); " +
      "return tostring(ok) .. ':' .. tostring(t.x)") == LStr("false:1"))
    assert(runRet("local t = setmetatable({}, {__index = function() return 1 end}); " +
      "setmetatable(t, nil); return t.x == nil") == LBool(true))
    // coroutine.running on the main thread returns a real thread object
    assert(runRet("local co, main = coroutine.running(); " +
      "return type(co) .. ':' .. tostring(main) .. ':' .. coroutine.status(co)") ==
      LStr("thread:true:running"))
    assert(runRet("local co, main = coroutine.running(); " +
      "local ok = coroutine.resume(co); return tostring(ok)") == LStr("false"))
    // duplicate labels in one block are a parse error
    val e = intercept[Exception](LuaAst.parse("::a:: x = 1 ::a:: goto a"))
    assert(e.getMessage.contains("already defined"))
  }

  test("lua utf8: char/codepoint/len/codes/offset over code points") {
    assert(runRet("return utf8.char(104, 105, 0x20AC)") == LStr("hi€"))
    assert(runRet("return utf8.len('héllo')") == LInt(5))
    assert(runRet("return utf8.codepoint('€')") == LInt(0x20AC))
    // astral plane: one code point, two UTF-16 units
    assert(runRet("local s = utf8.char(0x1F600); return utf8.len(s)") == LInt(1))
    assert(runRet("local s = utf8.char(0x1F600); return utf8.codepoint(s)") ==
      LInt(0x1F600))
    assert(runRet(
      """local s = utf8.char(65, 0x1F600, 66)
        |local cps = {}
        |for p, c in utf8.codes(s) do table.insert(cps, c) end
        |return #cps .. ':' .. cps[1] .. ',' .. cps[2] .. ',' .. cps[3]
        |""".stripMargin) == LStr(s"3:65,${0x1F600},66"))
    assert(runRet("local s = utf8.char(65, 0x1F600, 66); " +
      "return utf8.offset(s, 3)") == LInt(4)) // surrogate pair spans 2 units
    assert(runRet("return utf8.offset('abc', -1)") == LInt(3))
  }

  test("lua coroutines: wrap generators, create/resume/yield, status lifecycle") {
    assert(runRet(
      """local function gen(n)
        |  return coroutine.wrap(function()
        |    for i = 1, n do coroutine.yield(i * i) end
        |  end)
        |end
        |local g = gen(3)
        |return g() + g() + g()""".stripMargin) == LInt(14))
    assert(runRet(
      """local co = coroutine.create(function(a, b)
        |  local c = coroutine.yield(a + b)
        |  return c * 2
        |end)
        |local ok1, v1 = coroutine.resume(co, 3, 4)
        |local s1 = coroutine.status(co)
        |local ok2, v2 = coroutine.resume(co, 10)
        |local s2 = coroutine.status(co)
        |local ok3 = coroutine.resume(co)
        |return tostring(ok1) .. v1 .. s1 .. v2 .. s2 .. tostring(ok3)
        |""".stripMargin) == LStr("true7suspended20deadfalse"))
    assert(runRet("local co = coroutine.create(function() error('pow') end); " +
      "local ok, e = coroutine.resume(co); " +
      "return tostring(ok) .. ':' .. e .. ':' .. coroutine.status(co)") ==
      LStr("false:pow:dead"))
  }

  test("lua coroutines: yieldability, nested status, close") {
    assert(runRet(
      """local outside = coroutine.isyieldable()
        |local co = coroutine.wrap(function()
        |  coroutine.yield(coroutine.isyieldable())
        |end)
        |local inside = co()
        |local ok = pcall(coroutine.yield)
        |return tostring(outside) .. tostring(inside) .. tostring(ok)
        |""".stripMargin) == LStr("falsetruefalse"))
    // a coroutine observed from the coroutine it resumed reads 'normal'
    assert(runRet(
      """local a
        |local b = coroutine.create(function()
        |  coroutine.yield(coroutine.status(a))
        |end)
        |a = coroutine.create(function()
        |  local _, s = coroutine.resume(b)
        |  coroutine.yield(s)
        |end)
        |local _, s = coroutine.resume(a)
        |return s""".stripMargin) == LStr("normal"))
    assert(runRet(
      """local co = coroutine.create(function() coroutine.yield() end)
        |coroutine.resume(co)
        |local ok = coroutine.close(co)
        |local ok2 = coroutine.resume(co)
        |return tostring(ok) .. tostring(ok2)""".stripMargin) ==
      LStr("truefalse"))
    assert(runRet("return type(coroutine.create(function() end))") ==
      LStr("thread"))
  }

  // ------------------------------------------- review-fix regressions
  test("lua: explicit trailing nil reads as a missing argument") {
    assert(runRet("return tonumber('10', nil)") == LInt(10))
    assert(runRet("return string.rep('ab', 3, nil)") == LStr("ababab"))
    assert(runRet("return (string.gsub('aaa', 'a', 'b', nil))") == LStr("bbb"))
    assert(runRet("return table.concat({1, 2, 3}, ',', nil, nil)") == LStr("1,2,3"))
    assert(runRet("return os.date('!%Y', nil)") == LStr("2023")) // injected clock
  }

  test("lua: gmatch treats a leading ^ as a literal, not an anchor") {
    assert(runRet("local n = 0; for m in string.gmatch('ab ab', '^a') do n = n + 1 end; " +
      "return n") == LInt(0)) // no literal '^' in the subject
    assert(runRet("local t = {}; for m in string.gmatch('^a ^b', '^%a') do " +
      "table.insert(t, m) end; return table.concat(t, ',')") == LStr("^a,^b"))
  }

  test("lua: anchored gsub gets exactly one attempt") {
    assert(runRet("return (string.gsub('aaa', '^a', 'b'))") == LStr("baa"))
    assert(runRet("local _, n = string.gsub('aaa', '^a', 'b'); return n") == LInt(1))
    assert(runRet("return (string.gsub('bbb', '^a', 'x'))") == LStr("bbb"))
  }

  test("lua: math.random raises a catchable error on an empty interval") {
    assert(runRet("local ok, e = pcall(math.random, 2, 1); " +
      "return tostring(ok) .. ':' .. tostring(e)") ==
      LStr("false:bad argument #2 to 'random' (interval is empty)"))
    assert(runRet("return (pcall(math.random, 0))") == LBool(false))
    assert(runRet("local v = math.random(5, 5); return v") == LInt(5))
  }

  test("lua: %f frontier uses \\0 boundaries, not spaces") {
    // no letter→whitespace transition exists at end-of-string ('\0' is not %s)
    assert(runRet("return string.find('ab', '%f[%s]') == nil") == LBool(true))
    // start-of-string boundary still counts as a non-%w → %w transition
    assert(runRet("return string.match('hi', '%f[%w]%w+')") == LStr("hi"))
    assert(runRet("local _, n = string.gsub('THE (QUICK) brOWN FOx', " +
      "'%f[%a]%u+%f[%A]', 'X'); return n") == LInt(2))
  }

  test("lua: unterminated table constructor is a parse error, not a hang") {
    val e = intercept[Exception](LuaAst.parse("t = {"))
    assert(e.getMessage.contains("unterminated table constructor"))
    // EOF after an entry trips the separator check instead — either way
    // the parser must fail fast rather than spin on TEof
    val e2 = intercept[Exception](LuaAst.parse("t = {a = 1"))
    assert(e2.getMessage.contains("parse error"))
  }

  test("lua: os.date renders strftime with literal passthrough") {
    // 'T' and 'Z' are pattern letters to SimpleDateFormat — the direct
    // renderer must pass them through verbatim
    assert(runRet("return os.date('!%Y-%m-%dT%H:%M:%SZ', 1700000000)") ==
      LStr("2023-11-14T22:13:20Z"))
    assert(runRet("return os.date('!%c', 0)") == LStr("Thu Jan  1 00:00:00 1970"))
    assert(runRet("return os.date('!%a %b %j %I%p', 1700000000)") ==
      LStr("Tue Nov 318 10PM"))
    assert(runRet("return os.date('!%s', 1700000000)") == LStr("1700000000"))
    assert(runRet("return (pcall(os.date, '!%Q'))") == LBool(false))
  }

  test("lua: string.format %g trims zeros like C") {
    assert(runRet("return string.format('%g', 1.0)") == LStr("1"))
    assert(runRet("return string.format('%g', 0.5)") == LStr("0.5"))
    assert(runRet("return string.format('%g', 1e20)") == LStr("1e+20"))
    assert(runRet("return string.format('%g', 1e-05)") == LStr("1e-05"))
    assert(runRet("return string.format('%#g', 1.0)") == LStr("1.00000"))
  }

  test("lua bridge: parseIso accepts any offset form and bare local datetimes") {
    import graft.lua.LuaEventBridge
    assert(LuaEventBridge.parseIso("2024-03-01T12:30:45.123456-04:00") ==
      java.time.Instant.parse("2024-03-01T16:30:45.123456Z"))
    assert(LuaEventBridge.parseIso("2024-03-01T12:30:45.123456+00:00") ==
      java.time.Instant.parse("2024-03-01T12:30:45.123456Z"))
    assert(LuaEventBridge.parseIso("2024-03-01T12:30:45.000001Z") ==
      java.time.Instant.parse("2024-03-01T12:30:45.000001Z"))
    assert(LuaEventBridge.parseIso("2024-03-01T12:30:45") ==
      java.time.Instant.parse("2024-03-01T12:30:45Z"))
  }

  test("lua transform: config refuses timers and search_dirs; bad Lua fails the load") {
    def load(body: String) = Topology.load(
      s"""
         |[transforms.t]
         |  inputs = []
         |  type = "lua"
         |$body
         |""".stripMargin).run(Map("t" -> logFrame(Seq(("x", "m")))))
    val e1 = intercept[Exception](load(
      """  version = "2"
        |  hooks.process = "function (e, emit) emit(e) end"
        |  [[transforms.t.timers]]
        |    interval_seconds = 1
        |    handler = "function (emit) end"
        |""".stripMargin))
    assert(e1.getMessage.contains("timers"))
    val e2 = intercept[Exception](load(
      """  version = "2"
        |  hooks.process = "function (e, emit) emit(e end"
        |""".stripMargin))
    assert(e2.getMessage.toLowerCase.contains("parse"))
  }

  // --------------------------------------------- round-4 review fixes
  test("lua: malformed numerals raise LuaSyntaxError, not raw JVM errors") {
    import graft.lua.LuaAst.LuaSyntaxError
    intercept[LuaSyntaxError](LuaAst.parse("return 0x"))
    intercept[LuaSyntaxError](LuaAst.parse("return 1..2"))
    // oversized hex wraps mod 2^64 like real Lua
    assert(runRet("return 0xFFFFFFFFFFFFFFFF") == LInt(-1L))
    assert(runRet("return 0x1FFFFFFFFFFFFFFFF") == LInt(-1L))
    // oversized decimal integers read as floats (Lua 5.4)
    assert(runRet("return 99999999999999999999") == LNum(1e20))
  }

  test("lua: serializing a recursive table is a catchable script error") {
    import graft.lua.LuaEventBridge
    val vm = new VM(() => 1700000000000L)
    val t = vm.evalExpr("(function() local t = {}; t.self = t; return t end)()")
    val e = intercept[LuaError](LuaEventBridge.luaToJson(t))
    assert(toDisplay(e.value).contains("recursive"))
    // sibling references (a DAG, not a cycle) still serialize
    val dag = vm.evalExpr(
      "(function() local leaf = {x = 1}; return {a = leaf, b = leaf} end)()")
    val n = LuaEventBridge.luaToJson(dag)
    assert(n.get("a").get("x").asInt() == 1 && n.get("b").get("x").asInt() == 1)
  }

  test("lua: v1 event writes with mismatched path shapes are no-ops, not crashes") {
    import com.fasterxml.jackson.databind.ObjectMapper
    import graft.lua.LuaEventBridge.V1Event
    import graft.config.UnitTestHarness
    val root = new ObjectMapper().readTree("""{"message":"hi"}""")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    // minimal path parser: "[0]" → array index at root, "a[2]" → field + index
    val pathParse: String => List[Either[String, Int]] = {
      case "[0]" => List(Right(0))
      case "message[2]" => List(Left("message"), Right(2))
      case k => List(Left(k))
    }
    val ev = new V1Event(root, pathParse)
    ev.set(LStr("[0]"), LStr("x"))          // array index into the object root
    ev.set(LStr("message[2]"), LStr("x"))   // array index under a scalar field? containers replace
    assert(root.get("message") != null)
    assert(ev.get(LStr("message")) != LNil)
  }

  test("lua: pairs traverses a full table in one pass and allows deletes") {
    assert(runRet(
      """local t = {}
        |for i = 1, 200 do t['k' .. i] = i end
        |local sum, n = 0, 0
        |for k, v in pairs(t) do
        |  sum = sum + v; n = n + 1
        |  if v % 2 == 0 then t[k] = nil end
        |end
        |return sum * 1000 + n""".stripMargin) == LInt(20100L * 1000 + 200))
  }
}
