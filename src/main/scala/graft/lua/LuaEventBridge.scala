package graft.lua

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}

import LuaInterp._

/** Event ⇄ Lua conversions, mirroring the reference's mlua bindings:
  *
  *  - v2 event tables `{log = {...}}` / `{metric = {...}}` with the
  *    exact field layout of lib/vector-core/src/event/lua/event.rs,
  *    log.rs and metric.rs (metric arms counter/gauge/set/distribution/
  *    aggregated_histogram/aggregated_summary; only the flat-model arms
  *    counter/gauge round-trip into the config engine's metric frames);
  *  - timestamps as `os.date("!*t")`-style tables (util.rs:9-27:
  *    year/month/day/hour/min/sec/nanosec/yday/wday/isdst) recognized
  *    on the way back by the same six-key probe (table_is_timestamp);
  *  - the v1 path-keyed `event` userdata (v1/mod.rs:220-280: reads
  *    coerce values to strings, writes insert typed values at the
  *    parsed target path, `nil` removes, `pairs` iterates flattened
  *    key paths);
  *  - a null ARRAY ELEMENT crosses as the empty string (the
  *    reference's sparse-array hole convention, log.rs inline test —
  *    Lua `nil` cannot hold a table slot); a null OBJECT FIELD is
  *    simply absent (Spark's to_json drops null fields), which reads
  *    as `nil` — the same view mlua gives, since inserting Nil into
  *    the event table removes the key.
  *
  * Transport is Jackson trees: the Spark runner hands each row's event
  * as a JSON object and takes emitted events back as JSON, with
  * timestamps carried in a `{"__graft_ts": "<ISO>"}` wrapper that the
  * runner converts to real timestamp columns after schema inference.
  */
object LuaEventBridge {

  val TsKey = "__graft_ts"

  def isTsMarker(n: JsonNode): Boolean =
    n != null && n.isObject && n.size() == 1 && n.has(TsKey)
  /** Shared emit-side ISO formatter (the transform's to_timestamp
    * pattern must agree — LuaTransform.IsoFmt is the string twin).
    */
  val IsoFmt: java.time.format.DateTimeFormatter =
    java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .withZone(java.time.ZoneOffset.UTC)

  private val F = JsonNodeFactory.instance

  // ----------------------------------------------------- JSON → Lua
  def jsonToLua(n: JsonNode): LV =
    if (n == null || n.isNull) LStr("")
    else if (n.isObject) {
      if (n.size() == 1 && n.has(TsKey)) tsTable(parseIso(n.get(TsKey).asText()))
      else {
        val t = new LTable
        n.fields().forEachRemaining { e =>
          t.rawSet(LStr(e.getKey), jsonToLua(e.getValue))
        }
        t
      }
    } else if (n.isArray) {
      val t = new LTable
      var i = 1L
      n.elements().forEachRemaining { e =>
        t.rawSet(LInt(i), jsonToLua(e)); i += 1
      }
      t
    } else if (n.isTextual) LStr(n.asText())
    else if (n.isBoolean) LBool(n.asBoolean())
    else if (n.isIntegralNumber && n.canConvertToLong) LInt(n.asLong())
    else if (n.isNumber) LNum(n.asDouble())
    else LStr(n.asText())

  /** ISO-8601 with ANY offset form (`Z`, `+00:00`, `-04:00` — the
    * session timezone decides what date_format emits), or a bare local
    * datetime read as UTC. Appending `Z` heuristically would corrupt
    * negative-offset strings into unparseable `…-04:00Z`.
    */
  def parseIso(s: String): java.time.Instant =
    try java.time.OffsetDateTime.parse(s).toInstant
    catch {
      case _: java.time.format.DateTimeParseException =>
        java.time.LocalDateTime.parse(s).toInstant(java.time.ZoneOffset.UTC)
    }

  /** `timestamp_to_table` (util.rs:9): the os.date("!*t") layout. */
  def tsTable(inst: java.time.Instant): LTable = {
    val z = inst.atOffset(java.time.ZoneOffset.UTC)
    val t = new LTable
    t.rawSet(LStr("year"), LInt(z.getYear.toLong))
    t.rawSet(LStr("month"), LInt(z.getMonthValue.toLong))
    t.rawSet(LStr("day"), LInt(z.getDayOfMonth.toLong))
    t.rawSet(LStr("hour"), LInt(z.getHour.toLong))
    t.rawSet(LStr("min"), LInt(z.getMinute.toLong))
    t.rawSet(LStr("sec"), LInt(z.getSecond.toLong))
    t.rawSet(LStr("nanosec"), LInt(z.getNano.toLong))
    t.rawSet(LStr("yday"), LInt(z.getDayOfYear.toLong))
    // number_from_sunday (chrono Weekday::number_from_sunday)
    t.rawSet(LStr("wday"), LInt((z.getDayOfWeek.getValue % 7 + 1).toLong))
    t.rawSet(LStr("isdst"), LBool(false))
    t
  }

  /** `table_is_timestamp` (util.rs:30): all six coarse keys present. */
  def isTsTable(t: LTable): Boolean =
    Seq("year", "month", "day", "hour", "min", "sec")
      .forall(k => t.rawGet(LStr(k)) != LNil)

  def tableToInstant(t: LTable): java.time.Instant = {
    def i(k: String, d: Int = 0): Int = t.rawGet(LStr(k)) match {
      case LInt(v) => v.toInt
      case LNum(v) => v.toInt
      case _ => d
    }
    java.time.OffsetDateTime.of(i("year"), i("month", 1), i("day", 1),
      i("hour"), i("min"), i("sec"), i("nanosec"),
      java.time.ZoneOffset.UTC).toInstant
  }

  // ----------------------------------------------------- Lua → JSON
  /** Emitted-value conversion. Timestamp tables wrap as
    * `{"__graft_ts": iso}`; pure 1..n sequences become arrays; other
    * tables become objects with stringified keys.
    */
  def luaToJson(v: LV): JsonNode = {
    // Identity set of tables on the current descent path: a script that
    // emits a self-referential table (t.self = t) must raise a
    // recoverable LuaError — the event is then dropped like any other
    // script error — not blow the JVM stack (StackOverflowError is an
    // Error and would escape the hook's catch and kill the Spark task;
    // the reference's mlua serializer errors recoverably too).
    val onPath = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LTable, java.lang.Boolean]())
    def go(v: LV): JsonNode = v match {
      case LNil => F.nullNode()
      case LBool(b) => F.booleanNode(b)
      case LInt(i) => F.numberNode(i)
      case LNum(d) => F.numberNode(d)
      case LStr(s) => F.textNode(s)
      case t: LTable =>
        if (!onPath.add(t))
          throw LuaError(LStr("cannot serialize recursive table into an event"))
        val out =
          if (isTsTable(t)) {
            val o = F.objectNode()
            o.set[JsonNode](TsKey, F.textNode(IsoFmt.format(tableToInstant(t))))
            o
          } else {
            val n = t.len
            if (n > 0 && t.m.size == n) {
              val a = F.arrayNode()
              t.arrayValues.foreach(e => a.add(go(e)))
              a
            } else {
              val o = F.objectNode()
              t.m.foreach { case (k, e) =>
                o.set[JsonNode](toDisplay(k), go(e))
              }
              o
            }
          }
        onPath.remove(t)
        out
      case other =>
        throw LuaError(LStr(s"cannot serialize a ${typeName(other)} value into an event"))
    }
    go(v)
  }

  // ------------------------------------------------------- v1 event
  /** The v1 `event` userdata over a mutable Jackson tree. Keys are
    * event PATHS (`parse_target_path` in the reference); `pathParse`
    * is injected by the config layer (the same parser log_fields use).
    */
  final class V1Event(val root: ObjectNode,
                      pathParse: String => List[Either[String, Int]]) {

    private def resolve(path: List[Either[String, Int]]): Option[JsonNode] = {
      var cur: JsonNode = root
      path.foreach { seg =>
        if (cur == null) return None
        seg match {
          case Left(name) => cur = cur.get(name)
          case Right(ix) => cur = cur.get(ix)
        }
      }
      Option(cur)
    }

    /** Read: value coerced to its byte/string form (v1/mod.rs:266:
      * `coerce_to_bytes`) — scalars display, containers JSON-encode.
      */
    def get(k: LV): LV = k match {
      case LStr(key) =>
        resolve(pathParse(key)) match {
          case None => LNil
          case Some(n) =>
            if (n.isNull) LNil
            else if (n.isTextual) LStr(n.asText())
            else if (isTsMarker(n)) LStr(n.get(TsKey).asText()) // ts displays RFC3339
            else if (n.isContainerNode) LStr(n.toString)
            else LStr(n.asText())
        }
      case _ => LNil
    }

    /** Write: string/integer/float/boolean insert at the path; nil (or
      * any other Lua type, per v1/mod.rs:249-258) removes the path.
      */
    def set(k: LV, v: LV): Unit = k match {
      case LStr(key) =>
        val path = pathParse(key)
        v match {
          case LStr(_) | LInt(_) | LNum(_) | LBool(_) => insert(path, v)
          case _ => remove(path)
        }
      case other =>
        throw LuaError(LStr(s"event key must be a string, got ${typeName(other)}"))
    }

    private def toNode(v: LV): JsonNode = v match {
      case LStr(s) => F.textNode(s)
      case LInt(i) => F.numberNode(i)
      case LNum(d) => F.numberNode(d)
      case LBool(b) => F.booleanNode(b)
      case _ => F.nullNode()
    }

    private def insert(path: List[Either[String, Int]], v: LV): Unit = {
      // A path whose segment type disagrees with the existing node
      // (e.g. `event['[0]']` indexing the object root) is a no-op, like
      // remove's mismatch arm — never an asInstanceOf ClassCastException
      // that would escape the script-error handling and fail the task.
      def step(parent: JsonNode, rest: List[Either[String, Int]]): Unit = rest match {
        case Left(name) :: Nil => parent match {
          case obj: ObjectNode => obj.set[JsonNode](name, toNode(v)); ()
          case _ => ()
        }
        case Right(ix) :: Nil => parent match {
          case arr: ArrayNode =>
            while (arr.size() <= ix) arr.add(F.nullNode())
            arr.set(ix, toNode(v)); ()
          case _ => ()
        }
        case Left(name) :: tail => parent match {
          case obj: ObjectNode =>
            val next = obj.get(name)
            val child: JsonNode =
              if (tail.head.isLeft) { if (next != null && next.isObject) next else { val o = F.objectNode(); obj.set[JsonNode](name, o); o } }
              else { if (next != null && next.isArray) next else { val a = F.arrayNode(); obj.set[JsonNode](name, a); a } }
            step(child, tail)
          case _ => ()
        }
        case Right(ix) :: tail => parent match {
          case arr: ArrayNode =>
            while (arr.size() <= ix) arr.add(F.nullNode())
            val next = arr.get(ix)
            val child: JsonNode =
              if (tail.head.isLeft) { if (next != null && next.isObject) next else { val o = F.objectNode(); arr.set(ix, o); o } }
              else { if (next != null && next.isArray) next else { val a = F.arrayNode(); arr.set(ix, a); a } }
            step(child, tail)
          case _ => ()
        }
        case Nil => ()
      }
      step(root, path)
    }

    private def remove(path: List[Either[String, Int]]): Unit = {
      resolve(path.init) match {
        case Some(parent) => (parent, path.last) match {
          case (o: ObjectNode, Left(name)) => o.remove(name); ()
          case (a: ArrayNode, Right(ix)) if ix < a.size() => a.remove(ix); ()
          case _ => ()
        }
        case None => ()
      }
    }

    /** Flattened key paths, reference `log.keys()` order (depth-first,
      * insertion order), values read back through `get`'s coercion.
      */
    def flatKeys: Seq[LV] = {
      val out = Seq.newBuilder[LV]
      def quote(name: String): String =
        if (name.exists(c => c == '.' || c == '[' || c == '"')) "\"" + name.replace("\"", "\\\"") + "\""
        else name
      def walk(n: JsonNode, prefix: String): Unit =
        if (isTsMarker(n)) out += LStr(prefix)
        else if (n.isObject && n.size() > 0) {
          n.fields().forEachRemaining { e =>
            val p = if (prefix.isEmpty) quote(e.getKey) else prefix + "." + quote(e.getKey)
            walk(e.getValue, p)
          }
        } else if (n.isArray && n.size() > 0) {
          var i = 0
          n.elements().forEachRemaining { e =>
            walk(e, s"$prefix[$i]"); i += 1
          }
        } else out += LStr(prefix)
      walk(root, "")
      out.result()
    }

    def toUserData: LUserData = new LUserData(get, set, () => flatKeys)
  }

}
