package graft.config

import scala.collection.immutable.ListMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import VrlAst._
import VrlCompile._

/** The VRL standard-library subset, compiled to Spark columns.
  *
  * Coverage is the function set the reference's behavior-test corpus
  * (under `tests/behavior/transforms/`) and its own docs
  * (`website/cue/reference/remap/functions/`) exercise most; each entry
  * maps to `org.apache.spark.sql.functions` where one exists, otherwise
  * a small deterministic JVM kernel (`VrlKernels`). Functions outside
  * the subset raise `VrlUnsupported`, which the unit-test harness
  * reports as a documented skip.
  */
object VrlFunctions {

  private def nullStr = lit(null).cast("string")

  /** Resolve a compile-time file argument (desc_file, schema
    * definition, grok alias file). Relative paths try the working
    * directory, then each root in the `graft.vrl.resource.roots`
    * system property (colon-separated) — the cue corpus points that at
    * the reference's VRL test-harness root, which is what its doc
    * examples' `resources/...` paths are relative to.
    */
  private[config] def resolveFile(path: String): java.nio.file.Path = {
    val p = java.nio.file.Paths.get(path)
    if (p.isAbsolute || java.nio.file.Files.exists(p)) return p
    sys.props.get("graft.vrl.resource.roots").toSeq
      .flatMap(_.split(':')).map(r => java.nio.file.Paths.get(r).resolve(path))
      .find(java.nio.file.Files.exists(_)).getOrElse(p)
  }

  /** Driver-side parse of an enrichment-table date cell to epoch
    * micros. Accepts RFC3339 instants, offset timestamps, and bare
    * date / date-time forms (interpreted as UTC) — the shapes the
    * reference's file table accepts for a Date-typed column
    * (src/enrichment_tables/file.rs schema parsing).
    */
  private[config] def parseDateMicros(s: String): Long = {
    import java.time._
    val t = s.trim
    def micros(i: Instant): Long = i.getEpochSecond * 1000000L + i.getNano / 1000L
    try micros(Instant.parse(t)) catch { case _: Exception =>
      try micros(OffsetDateTime.parse(t).toInstant) catch { case _: Exception =>
        try micros(LocalDateTime.parse(t.replace(' ', 'T')).toInstant(ZoneOffset.UTC))
        catch { case _: Exception =>
          try micros(LocalDate.parse(t).atStartOfDay.toInstant(ZoneOffset.UTC))
          catch { case _: Exception =>
            throw new IllegalArgumentException(
              s"enrichment table date cell not parseable as a date: '$s'")
          }
        }
      }
    }
  }

  /** Argument accessor: positional index or any of the given names. */
  private final class Args(args: Seq[XV], named: Map[String, XV],
                           rawArgs: Seq[Expr], rawNamed: Map[String, Expr],
                           fname: String) {
    /** VRL binds positional args to the first parameters NOT already
      * given by name (`replace("foo", pattern: p, with: w, 1)` binds 1
      * to count). Index-based lookup mis-slots that mix, so functions
      * with named-arg call styles re-slot against their canonical
      * parameter list: every arg becomes a named arg, then index
      * lookups fall through to the names.
      */
    def reslot(params: String*): Args = {
      val free = params.filterNot(named.contains)
      if (args.length > free.length)
        throw VrlUnsupported(s"$fname: too many arguments")
      new Args(Seq.empty, named ++ free.zip(args),
        Seq.empty, rawNamed ++ free.zip(rawArgs), fname)
    }
    def opt(i: Int, names: String*): Option[XV] =
      args.lift(i).orElse(names.collectFirst {
        case n if named.contains(n) => named(n)
      })
    def apply(i: Int, names: String*): XV =
      opt(i, names: _*).getOrElse(
        throw VrlUnsupported(s"$fname: missing argument ${names.headOption.getOrElse(i.toString)}"))
    def rawOpt(i: Int, names: String*): Option[Expr] =
      rawArgs.lift(i).orElse(names.collectFirst {
        case n if rawNamed.contains(n) => rawNamed(n)
      })
    def raw(i: Int, names: String*): Expr =
      rawOpt(i, names: _*).getOrElse(
        throw VrlUnsupported(s"$fname: missing argument ${names.headOption.getOrElse(i.toString)}"))
    def litStr(i: Int, names: String*): Option[String] = rawOpt(i, names: _*).collect {
      case LitS(s) => s
      case LitRegex(p) => p
    }
    def litBool(i: Int, names: String*): Option[Boolean] = rawOpt(i, names: _*).collect {
      case LitB(b) => b
    }
    def litInt(i: Int, names: String*): Option[Long] = rawOpt(i, names: _*).collect {
      case LitI(n) => n
    }
    def propagate: Option[Column] =
      (args ++ named.values).flatMap(_.raise).reduceOption(_ || _)
  }

  def call(env: Env, c0: Call): (XV, Env) = {
    // const substitution: a variable bound to a plan-time literal
    // (`pat = r'\d+'`, `fmt = "%+"`) is usable anywhere a literal
    // argument is required — match/split/replace patterns, timestamp
    // formats, enrichment table names — the common bind-once VRL idiom
    val c =
      if (env.consts.isEmpty) c0
      else {
        def sub(e: Expr): Expr = e match {
          case LocalRef(n) => env.consts.getOrElse(n, e)
          case ArrLit(items) => ArrLit(items.map(sub))
          case other => other
        }
        c0.copy(args = c0.args.map(sub),
          named = c0.named.map { case (k, v) => (k, sub(v)) })
      }
    val name = c.name

    // --- special forms that read/modify the env or need raw AST -----
    name match {
      case "del" =>
        c.args.headOption match {
          case Some(FieldRef(path)) =>
            val value = resolveField(env, path)
            return (XV.pure(value), removeField(env, path))
          case _ => throw VrlUnsupported("del of non-path")
        }
      case "exists" =>
        c.args.headOption match {
          case Some(FieldRef(path)) =>
            val cv = resolveField(env, path)
            val col = cv.t match {
              case VNullT => lit(false)
              case _ => cv.col.isNotNull
            }
            return (XV.pure(CV(col, VBool)), env)
          case _ => throw VrlUnsupported("exists of non-path")
        }
      case "set_secret" =>
        (c.args.lift(0), c.args.lift(1)) match {
          case (Some(LitS(key)), Some(v)) =>
            val (xv, e2) = compileExpr(env, v)
            return (XV.pure(nullValue), e2.copy(secrets = e2.secrets + (key -> xv.cv.col)))
          case _ => throw VrlUnsupported("set_secret with non-literal key")
        }
      case "get_secret" =>
        c.args.headOption match {
          case Some(LitS(key)) =>
            val col = env.secrets.getOrElse(key, nullStr)
            return (XV.pure(CV(col, if (env.secrets.contains(key)) VStr else VNullT)), env)
          case _ => throw VrlUnsupported("get_secret with non-literal key")
        }
      case "remove_secret" =>
        c.args.headOption match {
          case Some(LitS(key)) => return (XV.pure(nullValue), env.copy(secrets = env.secrets - key))
          case _ => throw VrlUnsupported("remove_secret with non-literal key")
        }
      case "log" => return (XV.pure(nullValue), env)
      // set_semantic_meaning.cue: assigns meaning at STARTUP, no runtime
      // behavior — the Spark analog is column metadata stamped on the
      // output schema at compile/materialize time. Top-level event paths
      // only (Spark metadata is per-column); returns null like the
      // reference.
      case "set_semantic_meaning" =>
        val target = c.args.headOption
          .orElse(c.named.collectFirst { case ("target", e) => e })
        val meaning = c.args.lift(1)
          .orElse(c.named.collectFirst { case ("meaning", e) => e }) match {
            case Some(LitS(m)) => m
            case _ => throw VrlUnsupported("set_semantic_meaning needs a literal meaning")
          }
        target match {
          case Some(FieldRef(Seq(SegName(n)))) =>
            return (XV.pure(nullValue), env.copy(meanings = env.meanings + (n -> meaning)))
          case _ => throw VrlUnsupported(
            "set_semantic_meaning target must be a top-level event path")
        }
      // get/set/remove (get.cue/set.cue/remove.cue): path-array access
      // over values. The path is usually a literal array; runtime
      // segments (the for_each tally pattern, `get!(tally, [value])`)
      // route through the dynamic JSON-path kernel.
      case "get" if dynPathItems(c, 1, "path").isDefined =>
        val items = dynPathItems(c, 1, "path").get
        val (xv, e2) = compileExpr(env, valueArg(c))
        var envAcc = e2
        var segRaise: Option[Column] = None
        val (cols, isIdx) = items.map { it =>
          val (sxv, en) = compileExpr(envAcc, it); envAcc = en
          segRaise = (segRaise ++ sxv.raise).reduceOption(_ || _)
          (sxv.cv.col.cast("string"), sxv.cv.t == VInt)
        }.unzip
        val r = try_parse_json(org.apache.spark.sql.graftvec.StringExpressions
          .jsonPathGetDyn(jsonText(xv.cv), cols, isIdx))
        return (XV(CV(r, VAny),
          (xv.raise ++ segRaise).reduceOption(_ || _), xv.msg), envAcc)
      case "get" =>
        val segs = litPathArg(c, 1, "path")
        val hasNeg = segs.exists { case SegIndex(i) => i < 0; case _ => false }
        valueArg(c) match {
          case FieldRef(p) if !hasNeg =>
            return (XV.pure(resolveField(env, p ++ segs)), env)
          case e =>
            val (xv, e2) = compileExpr(env, e)
            if (!hasNeg)
              return (XV(segs.foldLeft(xv.cv)(walkCv), xv.raise, xv.msg), e2)
            // negative indexes count from the end: step through the
            // variant form, element_at handles -i (1-based from end)
            val start = CV(try_parse_json(jsonText(xv.cv)), VAny)
            val walked = segs.foldLeft(start) { (cur, seg) =>
              seg match {
                case SegName(n) => walkCv(cur, seg)
                case SegIndex(i) if i >= 0 => walkCv(cur, seg)
                case SegIndex(i) =>
                  CV(try_element_at(
                    try_variant_get(cur.col, "$", "array<variant>"), lit(i)), VAny)
              }
            }
            return (XV(walked, xv.raise, xv.msg), e2)
        }
      case "remove" =>
        // remove.cue: returns the rebuilt value; negative indexes count
        // from the end; `compact` drops emptied containers — full
        // semantics over the JSON form (JsonPathRemove)
        val segs = litPathArg(c, 1, "path")
        val compact = c.named.collectFirst { case ("compact", LitB(b)) => b }
          .getOrElse(false)
        val (xv, e2) = compileExpr(env, valueArg(c))
        val path = segs.map {
          case SegName(n) => Left(n); case SegIndex(i) => Right(i) }
        val r = try_parse_json(org.apache.spark.sql.graftvec.StringExpressions
          .jsonPathRemove(jsonText(xv.cv), path, compact))
        return (XV(CV(r, VAny), xv.raise, xv.msg), e2)
      case "set" if dynPathItems(c, 1, "path").isDefined =>
        val items = dynPathItems(c, 1, "path").get
        val dataE = c.args.lift(2).orElse(c.named.collectFirst {
          case ("data", e) => e }).getOrElse(throw VrlUnsupported("set without data"))
        val (base, e2) = compileExpr(env, valueArg(c))
        val (data, e3) = compileExpr(e2, dataE)
        var envAcc = e3
        var segRaise: Option[Column] = None
        val (cols, isIdx) = items.map { it =>
          val (sxv, en) = compileExpr(envAcc, it); envAcc = en
          segRaise = (segRaise ++ sxv.raise).reduceOption(_ || _)
          (sxv.cv.col.cast("string"), sxv.cv.t == VInt)
        }.unzip
        val r = try_parse_json(org.apache.spark.sql.graftvec.StringExpressions
          .jsonPathSetDyn(jsonText(base.cv), jsonText(data.cv), cols, isIdx))
        return (XV(CV(r, VAny),
          (base.raise ++ data.raise ++ segRaise ++ Seq(r.isNull))
            .reduceOption(_ || _),
          lit(s"""${callErrPrefix(c.name, c.span)}: invalid path""")), envAcc)
      case "set" =>
        val segs = litPathArg(c, 1, "path")
        c.args.lift(2).orElse(c.named.collectFirst { case ("data", e) => e }) match {
          case Some(dataE) =>
            val (base, e2) = compileExpr(env, valueArg(c))
            val (data, e3) = compileExpr(e2, dataE)
            val path = segs.map {
              case SegName(n) => Left(n); case SegIndex(i) => Right(i) }
            val r = try_parse_json(org.apache.spark.sql.graftvec.StringExpressions
              .jsonPathSet(jsonText(base.cv), jsonText(data.cv), path))
            return (XV(CV(r, VAny),
              (base.raise ++ data.raise ++ Seq(r.isNull)).reduceOption(_ || _),
              lit(s"""${callErrPrefix(c.name, c.span)}: invalid path""")), e3)
          case None => throw VrlUnsupported("set without data")
        }
      // enrichment table lookups (get_enrichment_table_record.cue,
      // find_enrichment_table_records.cue; exactly-one semantics from
      // lib/enrichment/src/lib.rs:53-56): the driver-loaded table
      // compiles into a literal lookup map keyed on the condition
      // columns — a broadcast-hash-join-equivalent with zero shuffles.
      case "get_enrichment_table_record" | "find_enrichment_table_records" =>
        val tname = c.args.headOption match {
          case Some(LitS(s)) => s
          case _ => throw VrlUnsupported(s"$name without a literal table name")
        }
        val table = env.tables.getOrElse(tname,
          throw VrlUnsupported(s"enrichment table $tname not configured"))
        val condFields = c.args.lift(1).orElse(
          c.named.collectFirst { case ("condition", e) => e }) match {
          case Some(ObjLit(fs)) => fs
          case _ => throw VrlUnsupported(s"$name without an object-literal condition")
        }
        val caseSensitive = c.named.collectFirst {
          case ("case_sensitive", LitB(b)) => b }.getOrElse(true)
        // select: a subset of table columns to return (third positional
        // or named — get_enrichment_table_record.cue arguments)
        val selectFields: Option[Seq[String]] =
          c.args.lift(2).orElse(c.named.collectFirst {
            case ("select", e) => e }).map {
            case ArrLit(items) => items.map {
              case LitS(s) => s
              case _ => throw VrlUnsupported(
                s"$name: select must be an array of string literals")
            }
            case _ => throw VrlUnsupported(
              s"$name: select must be an array literal")
          }
        // a condition VALUE that is an object with from/to keys is a
        // date condition — BetweenDates / FromDate / ToDate
        // (vrl_util.rs:43-77); anything else is Equals
        def dateBounds(e: VrlAst.Expr): Option[Map[String, VrlAst.Expr]] = e match {
          case ObjLit(fs) if fs.nonEmpty &&
            fs.forall(f => f._1 == "from" || f._1 == "to") => Some(fs.toMap)
          case _ => None
        }
        if (table.docStub) {
          // the reference's doc-example harness pins this lookup
          // (test_enrichment.rs ignores the condition): get → first
          // row, find → all rows; arguments above still validated
          val v =
            if (name == "get_enrichment_table_record")
              try_parse_json(lit(table.jsonRows.head))
            else try_parse_json(lit(table.jsonRows.mkString("[", ",", "]")))
          return (XV.pure(CV(v, VAny)), env)
        }
        val (rangeFields, equiFields) =
          condFields.partition(f => dateBounds(f._2).isDefined)
        var envAcc = env
        val probeCols = equiFields.map { case (_, e) =>
          val (xv, e2) = compileExpr(envAcc, e); envAcc = e2
          val sc = xv.cv.col.cast("string")
          if (caseSensitive) sc else lower(sc)
        }
        val probe = concat_ws("\u0001", probeCols: _*)
        val keyNames = equiFields.map(_._1)
        def rowKey(r: ListMap[String, String]): String = {
          val k = keyNames.map(n => r.getOrElse(n, "")).mkString("\u0001")
          if (caseSensitive) k else k.toLowerCase
        }
        def rowJson(r0: ListMap[String, String]): String = {
          val r = selectFields match {
            case Some(sel) => r0.filter { case (k, _) => sel.contains(k) }
            case None => r0
          }
          val fields = r.map { case (k, v) =>
            "\"" + k.replace("\\", "\\\\").replace("\"", "\\\"") + "\":\"" +
              v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
          }
          fields.mkString("{", ",", "}")
        }
        val grouped = table.rows.groupBy(rowKey)
        // shared result emission: candidates arrive as an ordered array
        // of row-JSON strings; get_ enforces the exactly-one contract
        // (lib/enrichment/src/lib.rs:53-56) as a per-row raise, find_
        // returns the (possibly empty) array.
        def emit(jArr: Column): XV =
          if (name == "get_enrichment_table_record")
            XV(CV(try_parse_json(
                when(size(jArr) === 1, element_at(jArr, 1))), VAny),
              Some(size(jArr) =!= 1),
              lit(s"""${callErrPrefix(name, c.span)}: no unique row matched"""))
          else
            XV.pure(CV(try_parse_json(concat(
              lit("["), array_join(jArr, ","), lit("]"))), VAny))
        val wildcardE = c.named.collectFirst { case ("wildcard", e) => e }
        if (wildcardE.isDefined) {
          // wildcard: a row satisfies an Equals condition when its cell
          // equals the condition value OR the wildcard value
          // (file.rs:337-342, find_enrichment_table_records.cue
          // "Wildcard match"). Per-field independence means the hit set
          // is the union over all 2^k per-field (value|wildcard) probe
          // keys — k is config-sized, so the probe fan-out is a literal
          // array of map lookups, still zero shuffles. Candidates carry
          // the row's table ordinal so the union is returned in table
          // order, matching the reference's sequential scan.
          if (rangeFields.nonEmpty)
            throw VrlUnsupported(s"$name with wildcard AND date-range conditions")
          if (probeCols.size > 8)
            throw VrlUnsupported(s"$name: wildcard with >8 condition fields")
          val wc = {
            val (xv, e2) = compileExpr(envAcc, wildcardE.get); envAcc = e2
            val sc = xv.cv.col.cast("string")
            if (caseSensitive) sc else lower(sc)
          }
          val entries = table.rows.zipWithIndex.groupBy(p => rowKey(p._1))
            .toSeq.flatMap { case (k, rs) =>
              Seq(lit(k), array(rs.map { case (r, i) =>
                struct(lit(i).as("o"), lit(rowJson(r)).as("j")) }: _*))
            }
          val emptyArr = array().cast("array<struct<o:int,j:string>>")
          val combos = (0 until (1 << probeCols.size)).map { mask =>
            concat_ws("\u0001", probeCols.zipWithIndex.map { case (pc, i) =>
              if ((mask & (1 << i)) != 0) wc else pc }: _*)
          }
          // ONE copy of the table-literal map in the plan: the 2^k
          // probes iterate over it via a lambda (transform over the
          // combo-key array), not 2^k inlined map literals — plan size
          // stays O(table + 2^k), not O(table × 2^k).
          val cands =
            if (entries.isEmpty) emptyArr
            else {
              val m = map(entries: _*)
              array_sort(array_distinct(flatten(transform(
                array(combos: _*),
                k => coalesce(try_element_at(m, k), emptyArr)))))
            }
          return (emit(transform(cands, x => x.getField("j"))), envAcc)
        }
        if (rangeFields.nonEmpty) {
          // date conditions: the equi keys still pre-group the
          // broadcast rows into a literal map; the date test runs per
          // event over the (config-sized) candidate list with an array
          // HOF — stays in codegen, zero shuffles. Bounds are
          // INCLUSIVE (lib/enrichment/src/lib.rs:28-41).
          if (rangeFields.size > 1)
            throw VrlUnsupported(s"$name with multiple date-range conditions")
          val (dateField, boundsExprs) = {
            val (k, e) = rangeFields.head; (k, dateBounds(e).get)
          }
          // literal bounds (t'…' / string) are parsed DRIVER-side via
          // the same UTC rules as the row cells, so a zone-less form
          // can't shift by spark.sql.session.timeZone relative to the
          // table; only a non-literal (event-derived) bound goes
          // through the session-tz cast.
          def boundMicros(which: String): Option[Column] =
            boundsExprs.get(which).map {
              case LitTs(s) => lit(parseDateMicros(s))
              case LitS(s) => lit(parseDateMicros(s))
              case e =>
                val (xv, e2) = compileExpr(envAcc, e); envAcc = e2
                unix_micros(xv.cv.col.cast("timestamp"))
            }
          val fromB = boundMicros("from")
          val toB = boundMicros("to")
          // a row whose date cell is missing or unparseable is a
          // NON-MATCH, not a config error (file.rs row_equals: a
          // non-Timestamp cell returns false) — one bad row must not
          // take down the whole topology.
          def rowMicros(r: ListMap[String, String]): Option[Long] =
            r.get(dateField).flatMap(v =>
              try Some(parseDateMicros(v)) catch { case _: Exception => None })
          val entries = grouped.toSeq.flatMap { case (k, rs) =>
            val dated = rs.flatMap(r => rowMicros(r).map(d => (d, r)))
            if (dated.isEmpty) Seq.empty
            else Seq(lit(k), array(dated.map { case (d, r) =>
              struct(lit(d).as("d"), lit(rowJson(r)).as("j")) }: _*))
          }
          val emptyArr = array().cast("array<struct<d:bigint,j:string>>")
          val cands =
            if (entries.isEmpty) emptyArr
            else coalesce(try_element_at(map(entries: _*), probe), emptyArr)
          val inRange = filter(cands, cnd => {
            val d = cnd.getField("d")
            val lo = fromB.map(d >= _).getOrElse(lit(true))
            val hi = toB.map(d <= _).getOrElse(lit(true))
            lo && hi
          })
          return (emit(transform(inRange, x => x.getField("j"))), envAcc)
        }
        if (name == "get_enrichment_table_record") {
          val entries = grouped.toSeq.flatMap { case (k, rs) =>
            // >1 match raises at lookup time, like find_table_row's
            // exactly-one contract
            Seq(lit(k), lit(if (rs.size == 1) rowJson(rs.head) else "MULTI"))
          }
          val hit =
            if (entries.isEmpty) lit(null).cast("string")
            // try_element_at: a probe with no matching row must surface
            // as the per-row "no unique row matched" raise below, not an
            // ANSI MAP_KEY_DOES_NOT_EXIST job abort
            else try_element_at(map(entries: _*), probe)
          val value = try_parse_json(when(hit =!= "MULTI", hit))
          return (XV(CV(value, VAny),
            Some(hit.isNull || hit === "MULTI"),
            lit(s"""${callErrPrefix(name, c.span)}: no unique row matched""")), envAcc)
        } else {
          val entries = grouped.toSeq.flatMap { case (k, rs) =>
            Seq(lit(k), lit(rs.map(rowJson).mkString("[", ",", "]")))
          }
          val hit =
            if (entries.isEmpty) lit(null).cast("string")
            // try_element_at: no-match probes default to [] per row
            else try_element_at(map(entries: _*), probe)
          return (XV.pure(CV(try_parse_json(coalesce(hit, lit("[]"))), VAny)), envAcc)
        }
      case _ => ()
    }

    // --- enumeration functions with closures (filter.cue, map_keys.cue,
    // map_values.cue, for_each.cue): `fn(value) -> |k, v| { body }`.
    // Arrays/maps compile the body into a Spark lambda (HOF, stays in
    // codegen); statically-typed objects and tuple arrays UNROLL the
    // closure per field — a per-field column expression, zero UDFs.
    if (c.closure.isDefined) return compileClosureFn(env, c)

    // --- ordinary functions: compile args, dispatch ------------------
    var envAcc = env
    def cx(e: Expr): XV = e match {
      case LitRegex(p) => XV.pure(CV(lit(p), VStr)) // regex args carried as pattern strings
      case ArrLit(items) if items.exists(_.isInstanceOf[LitRegex]) =>
        val strs = items.map { case LitRegex(p) => LitS(p); case x => x }
        val (xv, e2) = compileExpr(envAcc, ArrLit(strs)); envAcc = e2; xv
      case _ =>
        val (xv, e2) = compileExpr(envAcc, e); envAcc = e2; xv
    }
    val args = c.args.map(cx)
    val named = c.named.map { case (k, v) => k -> cx(v) }.toMap
    val a = new Args(args, named, c.args, c.named.toMap, name)

    val xv = dispatch(name, c.bang, a, c)
    (xv, envAcc)
  }

  // ------------------------------------------------------------------
  /** Reference diagnostic prefix: `function call error for "f" at
    * (s:e)` — the span is the call expression's source extent recorded
    * by the parser (VrlAst.Call.span), matching the reference engine's
    * AST spans so error-text comparisons in its behavior corpus hold
    * verbatim (tests/behavior/transforms/remap.toml pins one).
    */
  private def callErrPrefix(name: String, span: Option[(Int, Int)]): String =
    s"""function call error for "$name"""" +
      span.map { case (s, e) => s" at ($s:$e)" }.getOrElse("")

  /** VRL value display for LITERAL expressions (the reference's
    * `Value: Display` — strings quoted, arrays `[a, b]`, objects
    * `{ "k": v }`); None for non-literal operands, whose runtime
    * formatting is out of plan-time reach.
    */
  private def litDisplay(e: Expr): Option[String] = e match {
    case LitS(s) => Some("\"" + s + "\"")
    case LitI(n) => Some(n.toString)
    case LitF(d) => Some(if (d == d.floor && !d.isInfinite) f"$d%.1f" else d.toString)
    case LitB(b) => Some(b.toString)
    case LitNull => Some("null")
    case ArrLit(items) =>
      val ds = items.map(litDisplay)
      if (ds.forall(_.isDefined)) Some(ds.flatten.mkString("[", ", ", "]")) else None
    case ObjLit(fields) =>
      val ds = fields.map { case (k, v) => litDisplay(v).map(d => s""""$k": $d""") }
      if (ds.forall(_.isDefined)) Some(ds.flatten.mkString("{ ", ", ", " }")) else None
    case _ => None
  }

  private def dispatch(name: String, bang: Boolean, a: Args, c: Call): XV = {
    val prop = a.propagate
    val pfx = callErrPrefix(name, c.span)
    def out(cv: CV, raise: Option[Column] = None, msg: String = "runtime error"): XV =
      XV(cv, (prop ++ raise).reduceOption(_ || _), lit(s"$pfx: $msg"))
    /** Like `out` but with a per-row message tail; the tail column is
      * only evaluated under `when(raise, …)` (error channel), never on
      * the success hot path.
      */
    def outDyn(cv: CV, raise: Option[Column], msgTail: Column): XV =
      XV(cv, (prop ++ Seq(raise).flatten).reduceOption(_ || _),
        concat(lit(pfx + ": "), msgTail))

    def str0: XV = a(0, "value")
    /** Spark's base64 MIME-chunks past 76 chars (\r\n inserted) under
      * the legacy conf some builds default on — VRL base64 is always
      * one line, so strip unconditionally. */
    def b64flat(c: Column): Column = regexp_replace(base64(c), "[\\r\\n]", "")
    def asStr(xv: XV): Column = xv.cv.t match {
      case VStr => xv.cv.col
      case VAny => try_variant_get(xv.cv.col, "$", "string")
      case VNullT => nullStr
      case _ => xv.cv.col.cast("string")
    }
    /** The raw-byte view of a VRL byte-string: VBytes as-is, VStr as
      * its UTF-8 bytes — byte-consuming functions (decoders, hashes of
      * binary payloads, ip_ntop) take this.
      */
    def asBytes(xv: XV): Column = xv.cv.t match {
      case VBytes => xv.cv.col
      case VStr => xv.cv.col.cast("binary")
      case VAny => try_variant_get(xv.cv.col, "$", "string").cast("binary")
      case VNullT => lit(null).cast("binary")
      case _ => xv.cv.col.cast("string").cast("binary")
    }
    /** `string!`-style strictness: raises unless the static type is
      * string (null raises too).
      */
    def strictStr(xv: XV): (Column, Option[Column]) = xv.cv.t match {
      case VStr => (xv.cv.col, Some(xv.cv.col.isNull))
      case VAny =>
        val s = try_variant_get(xv.cv.col, "$", "string")
        (s, Some(s.isNull))
      case _ => (nullStr, Some(lit(true)))
    }

    name match {
      // ------------------------------------------------ coercions
      case "string" =>
        val (s, r) = strictStr(str0)
        out(CV(s, VStr), r, "expected string")
      case "to_string" =>
        val v = str0
        val s = v.cv.t match {
          case VTime => date_format(v.cv.col, "yyyy-MM-dd'T'HH:mm:ss'Z'")
          case _ => asStr(v)
        }
        out(CV(coalesce(s, lit("")), VStr))
      case "to_int" =>
        val v = str0
        val value = v.cv.t match {
          case VInt => v.cv.col
          case VFloat => v.cv.col.cast("bigint")
          case VBool => v.cv.col.cast("bigint")
          case VTime => unix_timestamp(v.cv.col)
          case VAny => try_variant_get(v.cv.col, "$", "bigint")
          case _ => try_cast_long(v.cv.col)
        }
        out(CV(value, VInt), Some(v.cv.col.isNotNull && value.isNull), "unable to coerce to int")
      case "int" =>
        val v = str0
        v.cv.t match {
          case VInt => out(CV(v.cv.col, VInt), Some(v.cv.col.isNull), "expected integer")
          case VAny =>
            val i = try_variant_get(v.cv.col, "$", "bigint")
            out(CV(i, VInt), Some(i.isNull), "expected integer")
          case _ => out(CV(lit(null).cast("bigint"), VInt), Some(lit(true)), "expected integer")
        }
      case "to_float" =>
        val v = str0
        val value = v.cv.t match {
          case VFloat => v.cv.col
          case VInt => v.cv.col.cast("double")
          case VBool => v.cv.col.cast("int").cast("double")
          case VTime => v.cv.col.cast("double") // fractional epoch seconds
          case VAny => try_variant_get(v.cv.col, "$", "double")
          // try_cast: ANSI-mode cast of an unparsable string must reach
          // the coercion raise below, not abort the job
          case _ => v.cv.col.cast("string").try_cast("double")
        }
        out(CV(value, VFloat), Some(v.cv.col.isNotNull && value.isNull), "unable to coerce to float")
      case "float" =>
        val v = str0
        v.cv.t match {
          case VFloat => out(CV(v.cv.col, VFloat), Some(v.cv.col.isNull), "expected float")
          case _ => out(CV(lit(null).cast("double"), VFloat), Some(lit(true)), "expected float")
        }
      case "to_bool" =>
        val v = str0
        val value = v.cv.t match {
          case VBool => v.cv.col
          case VInt | VFloat => v.cv.col =!= 0
          case VNullT => lit(false) // to_bool(null) = false (to_bool.cue)
          case VAny => try_variant_get(v.cv.col, "$", "boolean")
          case _ =>
            when(lower(v.cv.col.cast("string")).isin("true", "t", "yes", "y", "1"), lit(true))
              .when(lower(v.cv.col.cast("string")).isin("false", "f", "no", "n", "0"), lit(false))
        }
        out(CV(coalesce(value, when(v.cv.col.isNull, lit(false))), VBool),
          Some(v.cv.col.isNotNull && value.isNull), "unable to coerce to bool")
      case "bool" =>
        val v = str0
        v.cv.t match {
          case VBool => out(CV(v.cv.col, VBool), Some(v.cv.col.isNull), "expected boolean")
          case VAny =>
            val b = try_variant_get(v.cv.col, "$", "boolean")
            out(CV(b, VBool), Some(b.isNull), "expected boolean")
          case _ => out(CV(lit(null).cast("boolean"), VBool), Some(lit(true)), "expected boolean")
        }

      // ---------------------------------------------------- json
      case "parse_json" =>
        val v = str0
        val s0 = asStr(v)
        // max_depth (parse_json.cue): deeper containers stay raw text
        val s = a.litInt(1, "max_depth") match {
          case Some(d) =>
            if (d < 1 || d > 128) throw VrlUnsupported("max_depth out of range")
            org.apache.spark.sql.graftvec.StringExpressions.jsonMaxDepth(s0, d.toInt)
          case None => s0
        }
        val parsed = try_parse_json(s)
        // JSON `null` parses to a null variant — that is SUCCESS in the
        // reference (serde_json Value::Null), so the raise fires only
        // when the text is not the null literal; the message tail is
        // serde_json's exact error text (JsonDiag), evaluated on error
        // rows only
        val bad = parsed.isNull && !coalesce(trim(s) === "null", lit(false))
        outDyn(CV(parsed, VAny), Some(bad),
          concat(lit("unable to parse json: "), VrlKernels.jsonDiag(s)))
      case "encode_json" =>
        val v = str0
        out(CV(to_json(v.cv.col), VStr))

      // ------------------------------------------------ timestamps
      case "parse_timestamp" =>
        val v = str0
        val fmt = a.litStr(1, "format").getOrElse(
          throw VrlUnsupported("parse_timestamp without literal format"))
        val ts0 = VrlTime.parse(asStr(v), fmt)
        // `timezone`: a zone-less wall-clock format is interpreted in
        // that zone (parse_timestamp.cue "with timezone")
        val ts = a.litStr(2, "timezone") match {
          case Some(tz) => to_utc_timestamp(ts0, tz)
          case None => ts0
        }
        out(CV(ts, VTime), Some(v.cv.col.isNotNull && ts.isNull), "unable to parse timestamp")
      case "format_timestamp" =>
        val v = a(0, "value")
        val fmt = a.litStr(1, "format").getOrElse(
          throw VrlUnsupported("format_timestamp without literal format"))
        out(CV(VrlTime.format(v.cv.col, fmt), VStr))
      case "from_unix_timestamp" =>
        val v = a(0, "value")
        val unit = a.litStr(1, "unit").getOrElse("seconds")
        val n = v.cv.col.cast("long")
        val ts = unit match {
          case "seconds" => timestamp_seconds(n)
          case "milliseconds" => timestamp_millis(n)
          // decimal division — long/long promotes to double whose ulp
          // at epoch-ns magnitude is 256ns (off-by-one-us results)
          case "nanoseconds" => timestamp_micros(
            (v.cv.col.cast("decimal(38,0)") / 1000).cast("long"))
          case u => throw VrlUnsupported(s"from_unix_timestamp unit $u")
        }
        out(CV(ts, VTime), Some(v.cv.col.isNotNull && ts.isNull), "bad unix timestamp")
      case "to_unix_timestamp" =>
        val v = a(0, "value")
        val unit = a.litStr(1, "unit").getOrElse("seconds")
        val secs = unix_timestamp(v.cv.col)
        val value = unit match {
          case "seconds" => secs
          case "milliseconds" => unix_millis(v.cv.col)
          case "nanoseconds" => unix_micros(v.cv.col) * 1000L
          case u => throw VrlUnsupported(s"to_unix_timestamp unit $u")
        }
        out(CV(value, VInt))
      case "now" => out(CV(current_timestamp(), VTime))
      case "get_timezone_name" => out(CV(lit("UTC"), VStr)) // session TZ is pinned UTC

      // -------------------------------------------------- strings
      case "upcase" => out(CV(upper(asStr(str0)), VStr))
      case "downcase" => out(CV(lower(asStr(str0)), VStr))
      case "strip_whitespace" => out(CV(trim(asStr(str0)), VStr))
      case "contains" | "starts_with" | "ends_with" =>
        val v = asStr(a(0, "value"))
        val sub = asStr(a(1, "substring"))
        val cs = a.litBool(2, "case_sensitive").getOrElse(true)
        val (vv, ss) = if (cs) (v, sub) else (lower(v), lower(sub))
        val value = name match {
          case "contains" => vv.contains(ss)
          case "starts_with" => vv.startsWith(ss)
          case _ => vv.endsWith(ss)
        }
        val r = if (bang) Some(a(0, "value").cv.col.isNull) else None
        out(CV(coalesce(value, lit(false)), VBool), r, "expected string")
      case "split_path" =>
        // split_path.cue: "/home/user/" -> ["/","home","user"], "/" ->
        // ["/"], "" -> []. The root is its OWN leading component for
        // absolute paths; empty segments (doubled or trailing slashes)
        // are dropped.
        val v = asStr(str0)
        val parts = filter(split(v, "/"), x => x =!= "")
        val value = when(v.startsWith("/"),
          concat(array(lit("/")), parts)).otherwise(parts)
        out(CV(value, VArrOf(VStr)))
      case "match" =>
        val v = asStr(a(0, "value"))
        val pat = a.litStr(1, "pattern").getOrElse(
          throw VrlUnsupported("match without literal pattern"))
        out(CV(coalesce(v.rlike(pat), lit(false)), VBool))
      case "slice" =>
        // slice.cue: value may be a STRING or an ARRAY; negative
        // start/end count from the right; out-of-range clamps (end >
        // len -> len, and a negative index further left than the start
        // clamps to 0 — unclamped it would reach Spark's
        // negative-substring path, which counts from the END again)
        val v0 = a(0, "value")
        val stRaw = a.opt(1, "start").map(_.cv.col.cast("int")).getOrElse(lit(0))
        val enOpt = a.opt(2, "end").map(_.cv.col.cast("int"))
        def bounds(len: Column): (Column, Column) = {
          def norm(x: Column) = greatest(when(x < 0, len + x).otherwise(x), lit(0))
          val st = norm(stRaw)
          val en = least(norm(enOpt.getOrElse(len)), len)
          (st, greatest(en - st, lit(0)))
        }
        v0.cv.t match {
          case VArrOf(e) =>
            val (st, n) = bounds(size(v0.cv.col))
            out(CV(slice(v0.cv.col, st + 1, n), VArrOf(e)))
          case _ =>
            val v = asStr(v0)
            val (st, n) = bounds(length(v))
            out(CV(substring(v, (st + 1).cast("int"), n.cast("int")), VStr))
        }
      case "split" =>
        val v = asStr(a(0, "value"))
        val patRaw = a.raw(1, "pattern")
        val pat = patRaw match {
          case LitRegex(p) => p
          case LitS(s) => java.util.regex.Pattern.quote(s)
          case _ => throw VrlUnsupported("split with non-literal pattern")
        }
        val limit = a.litInt(2, "limit").map(_.toInt).getOrElse(-1)
        out(CV(split(v, pat, limit), VArrOf(VStr)))
      case "join" =>
        val arr = a(0, "value")
        val sep = a.litStr(1, "separator").getOrElse("")
        arr.cv.t match {
          case VArrOf(VStr) => out(CV(array_join(arr.cv.col, sep), VStr))
          case VArrOf(_) => out(CV(array_join(arr.cv.col.cast("array<string>"), sep), VStr))
          case _ => throw VrlUnsupported("join of non-array")
        }
      case "truncate" =>
        val v = asStr(a(0, "value"))
        val limit = a(1, "limit").cv.col.cast("int")
        val suffix = a.litStr(2, "suffix").getOrElse(
          if (a.litBool(2, "ellipsis").contains(true)) "..." else "")
        out(CV(when(length(v) > limit, concat(v.substr(lit(1), limit), lit(suffix)))
          .otherwise(v), VStr))
      case "replace" =>
        val ar = a.reslot("value", "pattern", "with", "count")
        val v = asStr(ar(0, "value"))
        val withS = asStr(ar(2, "with"))
        val count = ar.litInt(3, "count").getOrElse(-1L)
        ar.raw(1, "pattern") match {
          case LitRegex(p0) =>
            // Rust-style named groups translate to Java's ((?P<x> →
            // (?<x>), and a `$name` replacement to `${name}`) — the
            // pattern KEEPS its named groups so ${name} resolves.
            // Java restricts group names to [A-Za-z][A-Za-z0-9]*
            // (no underscores, unlike Rust), so names outside that set
            // are RENAMED to a safe alias in both pattern and
            // replacement
            val names = VrlKernels.namedGroups(p0)._2
            val safe = names.zipWithIndex.map { case (nm, i) =>
              nm -> (if (nm.matches("[A-Za-z][A-Za-z0-9]*")) nm else s"vrlg$i")
            }.toMap
            val p = names.foldLeft(p0) { (pp, nm) =>
              pp.replace(s"(?P<$nm>", s"(?<${safe(nm)}>")
                .replace(s"(?<$nm>", s"(?<${safe(nm)}>")
            }
            val withJ = names.foldLeft(withS) { (w, nm) =>
              regexp_replace(w,
                java.util.regex.Pattern.quote("$" + nm) + "(?![\\w{])",
                java.util.regex.Matcher.quoteReplacement("$" + s"{${safe(nm)}}"))
            }
            // unbounded: codegen'd regexp_replace; bounded: Matcher
            // kernel with the same $-group replacement semantics
            // (replace.cue: count bounds the number of replacements)
            if (count < 0L) out(CV(regexp_replace(v, lit(p), withJ), VStr))
            else out(CV(VrlKernels.regexReplaceN(v, p, withJ, count), VStr))
          case LitS(s) if count == 1L && s.nonEmpty =>
            val pos = instr(v, s)
            out(CV(when(pos > 0,
              concat(v.substr(lit(1), pos - 1), withS,
                v.substr(pos + s.length, length(v))))
              .otherwise(v), VStr))
          case LitS(s) if count < 0L && s.nonEmpty =>
            // string patterns replace LITERALLY (Rust str::replace) —
            // `replace` does no $-group or backslash processing in
            // `with`, unlike the quoted-regexp form this used to be
            out(CV(replace(v, lit(s), withS), VStr))
          case LitS(s) =>
            // bounded count, or the empty-pattern boundary-insertion
            // edge — cold-path kernel
            out(CV(VrlKernels.literalReplaceN(v, lit(s), withS,
              if (count < 0L) Long.MaxValue else count), VStr))
          case _ =>
            // only the regex arm needs plan-time pattern compilation;
            // a runtime STRING pattern replaces literally
            val p = ar(1, "pattern")
            if (p.cv.t != VStr)
              throw VrlUnsupported("replace with non-literal regex pattern")
            out(CV(VrlKernels.literalReplaceN(v, p.cv.col, withS,
              if (count < 0L) Long.MaxValue else count), VStr))
        }
      case "length" =>
        val v = a(0, "value")
        v.cv.t match {
          case VStr => out(CV(length(v.cv.col).cast("bigint"), VInt))
          case VArrOf(_) | VMap => out(CV(size(v.cv.col).cast("bigint"), VInt))
          case VHet(ts) => out(CV(lit(ts.length.toLong), VInt))
          case VObj(fs) => out(CV(lit(fs.size.toLong), VInt))
          case VAny =>
            val j = to_json(v.cv.col)
            out(CV(when(j.startsWith("["),
                size(try_variant_get(v.cv.col, "$", "array<variant>")))
              .when(j.startsWith("{"), size(json_object_keys(j)))
              .otherwise(length(try_variant_get(v.cv.col, "$", "string")))
              .cast("bigint"), VInt))
          case _ => out(CV(length(asStr(v)).cast("bigint"), VInt))
        }
      case "redact" =>
        // redact.cue: filters are regexes or NAMED patterns; `redactor`
        // picks the replacement — fixed text (default "[REDACTED]"),
        // or a per-match hash (sha2/sha3, base64/base16). Object values
        // redact every nested string field.
        val filters = a.raw(1, "filters") match {
          case ArrLit(items) => items.map {
            case LitRegex(p) => p
            case LitS("us_social_security_number") => "\\d{3}-\\d{2}-\\d{4}"
            case LitS(s) => java.util.regex.Pattern.quote(s)
            case _ => throw VrlUnsupported("redact filter")
          }
          case _ => throw VrlUnsupported("redact without literal filters array")
        }
        // per-match replacement function from the redactor spec
        val redactor: Column => Column = a.rawOpt(2, "redactor") match {
          case None => _ => lit("[REDACTED]")
          case Some(LitS(typ)) => typ match {
            case "full" => _ => lit("[REDACTED]")
            case "sha2" => m => b64flat(unhex(VrlKernels.sha512_256(m)))
            case "sha3" => m => b64flat(unhex(graft.functions.Vrl.sha3(m, "SHA3-512")))
            case other => throw VrlUnsupported(s"redactor $other")
          }
          case Some(ObjLit(fs)) =>
            val o = fs.toMap
            def litOf(k: String): Option[String] = o.get(k).collect { case LitS(s) => s }
            litOf("type").getOrElse(throw VrlUnsupported("redactor without type")) match {
              case "text" =>
                val rep = litOf("replacement").getOrElse("[REDACTED]")
                _ => lit(rep)
              case t @ ("sha2" | "sha3") =>
                val variant = litOf("variant").getOrElse(
                  if (t == "sha2") "SHA-512/256" else "SHA3-512")
                val enc: Column => Column = litOf("encoding").getOrElse("base64") match {
                  case "base64" => h => b64flat(unhex(h))
                  case "base16" => h => lower(h)
                  case other => throw VrlUnsupported(s"redactor encoding $other")
                }
                val hash: Column => Column = variant match {
                  case "SHA-224" => m => sha2(m.cast("binary"), 224)
                  case "SHA-256" => m => sha2(m.cast("binary"), 256)
                  case "SHA-384" => m => sha2(m.cast("binary"), 384)
                  case "SHA-512" => m => sha2(m.cast("binary"), 512)
                  case "SHA-512/224" => VrlKernels.sha512_224(_)
                  case "SHA-512/256" => VrlKernels.sha512_256(_)
                  case v3 if v3.startsWith("SHA3") => m => graft.functions.Vrl.sha3(m, v3)
                  case other => throw VrlUnsupported(s"redactor variant $other")
                }
                m => enc(hash(m))
              case other => throw VrlUnsupported(s"redactor type $other")
            }
          case Some(other) => throw VrlUnsupported(s"redactor spec $other")
        }
        // piecewise rebuild so each MATCH flows through the redactor
        // (regexp_replace can only splice fixed text)
        def redactStr(v0: Column): Column = filters.foldLeft(v0) { (v, pat) =>
          val whole = regexp_extract_all(v, lit(pat), lit(0))
          val pieces = split(v, pat, -1)
          when(v.isNull, v).when(size(whole) === 0, v).otherwise(
            concat(element_at(pieces, 1),
              array_join(transform(sequence(lit(0), size(whole) - 1), i =>
                concat(redactor(element_at(whole, i + 1)),
                  coalesce(element_at(pieces, i + 2), lit("")))), "")))
        }
        def redactCv(cv: CV): CV = cv.t match {
          case VStr => CV(redactStr(cv.col), VStr)
          case VObj(fts) =>
            buildObj(ListMap(fts.toSeq.map { case (k, t) =>
              k -> redactCv(CV(cv.col.getField(k), t)) }: _*))
          case VArrOf(VStr) => CV(transform(cv.col, redactStr(_)), VArrOf(VStr))
          case VMap => CV(map_from_arrays(map_keys(cv.col),
            transform(map_values(cv.col), redactStr(_))), VMap)
          case _ => cv
        }
        out(redactCv(a(0, "value").cv))
      case "format_number" =>
        val v = a(0, "value").cv.col.cast("double")
        val scale = a.litInt(1, "scale").map(_.toInt).getOrElse(2)
        val dec = a.litStr(2, "decimal_separator").getOrElse(".")
        val grp = a.litStr(3, "grouping_separator").getOrElse(",")
        val truncated = floor(v * math.pow(10, scale)) / math.pow(10, scale)
        val formatted = format_number(truncated, scale)
        val swapped =
          if (dec == "." && grp == ",") formatted
          else translate(formatted, ".,", dec + grp)
        out(CV(swapped, VStr))

      // --------------------------------------------------- hashes
      case "md5" => out(withStrRaise(a, bang, s => md5(s.cast("binary"))))
      case "sha1" => out(withStrRaise(a, bang, s => sha1(s.cast("binary"))))
      case "sha2" =>
        val variant = a.litStr(1, "variant").getOrElse("SHA-512/256")
        variant match {
          case "SHA-224" => out(withStrRaise(a, bang, s => sha2(s.cast("binary"), 224)))
          case "SHA-256" => out(withStrRaise(a, bang, s => sha2(s.cast("binary"), 256)))
          case "SHA-384" => out(withStrRaise(a, bang, s => sha2(s.cast("binary"), 384)))
          case "SHA-512" => out(withStrRaise(a, bang, s => sha2(s.cast("binary"), 512)))
          case "SHA-512/224" => out(withStrRaise(a, bang, VrlKernels.sha512_224(_)))
          case "SHA-512/256" => out(withStrRaise(a, bang, VrlKernels.sha512_256(_)))
          case v => throw VrlUnsupported(s"sha2 variant $v")
        }
      case "sha3" =>
        val variant = a.litStr(1, "variant").getOrElse("SHA3-512")
        out(withStrRaise(a, bang, VrlKernels.sha3(_, variant)))
      case "encode_base64" =>
        val pad = a.litBool(1, "padding").getOrElse(true)
        val cs = a.litStr(2, "charset").getOrElse("standard")
        var b64 = b64flat(asBytes(str0))
        if (cs == "url_safe")
          b64 = translate(b64, "+/", "-_")
        if (!pad) b64 = regexp_replace(b64, "=+$", "")
        out(CV(b64, VStr))
      case "decode_base64" =>
        val v = asStr(str0)
        val cs = a.litStr(1, "charset").getOrElse("standard")
        val std = if (cs == "url_safe") translate(v, "-_", "+/") else v
        // re-pad (VRL accepts unpadded input) then try_to_binary: bare
        // unbase64 THROWS on malformed input, which would kill the
        // raise channel below with a job abort
        val stripped = regexp_replace(std, "=+$", "")
        val padded = concat(stripped,
          when(length(stripped) % 4 === 2, lit("=="))
            .when(length(stripped) % 4 === 3, lit("="))
            .otherwise(lit("")))
        val d = try_to_binary(padded, lit("base64"))
        out(CV(d, VBytes), Some(v.isNotNull && d.isNull), "unable to decode base64")

      // --------------------------------------------------- numeric
      case "round" | "floor" | "ceil" =>
        val v = a(0, "value")
        val prec = a.litInt(1, "precision").map(_.toInt)
        val d = v.cv.col.cast("double")
        val f: (Column, Int) => Column = name match {
          case "round" => (c, p) => round(c, p)
          case "floor" => (c, p) => floor(c, lit(p)).cast("double")
          case _ => (c, p) => ceil(c, lit(p)).cast("double")
        }
        prec match {
          case None | Some(0) =>
            out(CV(f(d, 0).cast("bigint"), VInt), Some(d.isNull), "expected number")
          case Some(p) =>
            out(CV(f(d, p).cast("double"), VFloat), Some(d.isNull), "expected number")
        }
      case "abs" =>
        val v = a(0, "value")
        out(CV(abs(v.cv.col), v.cv.t))

      // --------------------------------------------------------- ip
      case "ip_cidr_contains" =>
        // cidr may be ONE cidr or an ARRAY (any-match —
        // ip_cidr_contains.cue "IPv4 is private")
        val cidrXv = a(0, "cidr")
        val ip = asStr(a(1, "value"))
        def one(c0: Column) = VrlKernels.cidrContains(c0, ip)
        val r = cidrXv.cv.t match {
          case VArrOf(_) =>
            when(exists(cidrXv.cv.col,
                c0 => coalesce(one(c0.cast("string")), lit(false))), lit(true))
              .otherwise(when(forall(cidrXv.cv.col,
                c0 => one(c0.cast("string")).isNotNull), lit(false)))
          case VHet(ts) =>
            val checks = ts.indices.map(i =>
              one(cidrXv.cv.col.getField(s"_$i").cast("string")))
            when(checks.map(c0 => coalesce(c0, lit(false))).reduce(_ || _), lit(true))
              .otherwise(when(checks.map(_.isNotNull).reduce(_ && _), lit(false)))
          case _ => one(asStr(cidrXv))
        }
        out(CV(r, VBool), Some(r.isNull), "invalid ip or cidr")
      case "ip_subnet" =>
        val ip = asStr(a(0, "value"))
        val mask = asStr(a(1, "subnet"))
        val r = VrlKernels.ipSubnet(ip, mask)
        out(CV(r, VStr), Some(r.isNull), "invalid ip or mask")
      case "ip_to_ipv6" =>
        val ip = asStr(str0)
        out(CV(when(ip.contains(":"), ip).otherwise(concat(lit("::ffff:"), ip)), VStr),
          Some(ip.isNull), "invalid ip")
      case "ipv6_to_ipv4" =>
        val ip = asStr(str0)
        out(CV(regexp_replace(ip, "^::ffff:", ""), VStr),
          Some(ip.isNull || !ip.rlike("^(::ffff:)?[0-9.]+$")), "not convertible to ipv4")
      case "reverse_dns" =>
        val ip = asStr(str0)
        out(CV(VrlKernels.reverseDns(ip), VStr), Some(ip.isNull), "invalid ip")
      case "get_hostname" => out(CV(VrlKernels.hostname(), VStr))

      // ------------------------------------------------- parsers
      case "parse_duration" =>
        val v = asStr(a(0, "value"))
        val unit = a.litStr(1, "unit").getOrElse("s")
        val r = graft.functions.Vrl.parseDuration(v, unit)
        out(CV(r, VFloat), Some(v.isNotNull && r.isNull), "unable to parse duration")
      case "parse_key_value" =>
        // full reference semantics via a real tokenizer
        // (StringExpressions.KeyValueToJson): quoted keys/values may
        // contain the delimiters, whitespace around separators trims,
        // standalone keys → true, duplicate keys → array
        val v = asStr(a(0, "value"))
        val kvSep = a.litStr(1, "key_value_delimiter").getOrElse("=")
        val fieldSep = a.litStr(2, "field_delimiter").getOrElse(" ")
        val r = try_parse_json(org.apache.spark.sql.graftvec.StringExpressions
          .keyValueToJson(v, kvSep, fieldSep))
        out(CV(r, VAny), Some(v.isNotNull && r.isNull), "unable to parse key/value")
      case "parse_tokens" =>
        val v = asStr(a(0, "value"))
        // quoted tokens may contain ESCAPED quotes, KEPT verbatim in
        // the output (parse_tokens.cue example)
        val toks = regexp_extract_all(v,
          lit("\"(?:\\\\.|[^\"\\\\])*\"|\\[[^\\]]*\\]|\\S+"), lit(0))
        val cleaned = transform(toks, t =>
          when(t === "-", lit(null).cast("string"))
            .when(t.startsWith("\"") && t.endsWith("\""), expr_substr(t))
            .when(t.startsWith("[") && t.endsWith("]"), expr_substr(t))
            .otherwise(t))
        out(CV(cleaned, VArrOf(VStr)), Some(v.isNull), "expected string")
      case "parse_regex" =>
        // numeric_groups (parse_regex.cue): "0" is the full match and
        // "1".."n" the capture groups, alongside the named keys. The
        // full match is group 1 of the pattern wrapped in one extra
        // paren pair — no expression change, just an index offset.
        val v = asStr(a(0, "value"))
        val pat = a.litStr(1, "pattern").getOrElse(
          throw VrlUnsupported("parse_regex without literal pattern"))
        val numeric = a.litBool(2, "numeric_groups").getOrElse(false)
        val (pat0, groups) = VrlKernels.namedGroups(pat)
        val javaPat = if (numeric) s"($pat0)" else pat0
        val off = if (numeric) 1 else 0
        val g = org.apache.spark.sql.graftvec.RegexExpressions.regexGroups(v, javaPat)
        val named = groups.zipWithIndex.map { case (gn, i) =>
          gn -> CV(nullif(element_at(g, i + 1 + off), lit("")), VStr)
        }
        // numeric keys cover ALL capture groups (named or not) — the
        // cue's unnamed-group example expects {"0", "1"}
        val totalGroups =
          java.util.regex.Pattern.compile(pat0).matcher("").groupCount()
        val nums =
          if (!numeric) Seq.empty
          else ("0" -> CV(element_at(g, 1), VStr)) +:
            (0 until totalGroups).map(i => (i + 1).toString ->
              CV(nullif(element_at(g, i + 2), lit("")), VStr))
        val obj = buildObj(ListMap((named ++ nums): _*))
        out(CV(when(g.isNotNull, obj.col), obj.t),
          Some(v.isNull || g.isNull), "regex did not match")
      case "parse_grok" =>
        val v = asStr(a(0, "value"))
        val pat = a.litStr(1, "pattern").getOrElse(
          throw VrlUnsupported("parse_grok without literal pattern"))
        // regexLiterals: VRL's grok treats the whole expression as a
        // regex (alternations like (%{A:x}|%{B:y}) work), unlike the
        // library parsers' literal inter-token text
        val compiled = graft.functions.Grok.compile(pat, regexLiterals = true)
        val fields = ListMap(compiled.columns(v).map { case (n, c) =>
          n -> CV(nullif(c, lit("")), VStr)
        }: _*)
        val obj = buildObj(fields)
        out(CV(when(compiled.matches(v), obj.col), obj.t),
          Some(v.isNull || !compiled.matches(v)), "grok did not match")
      case "parse_common_log" | "parse_glog" | "parse_syslog" | "parse_url" =>
        val v = asStr(a(0, "value"))
        val x = name match {
          case "parse_common_log" => VrlParsers.commonLog(v, a.litStr(1, "timestamp_format"))
          case "parse_glog" => VrlParsers.glog(v)
          case "parse_syslog" => VrlParsers.syslog(v)
          case _ => VrlParsers.url(v,
            a.litBool(1, "default_known_ports").getOrElse(false))
        }
        XV(x.cv, (prop ++ x.raise).reduceOption(_ || _), x.msg)

      // ------------------------------------------- collections
      case "compact" =>
        val v = a(0, "value")
        v.cv.t match {
          case VAny | VObj(_) | VHet(_) | VMap =>
            // full reference semantics over the JSON form: recursive,
            // dropping null / "" / empty collections, emptiness judged
            // after recursion (compact.cue defaults); static shapes
            // route through jsonText (tuples serialize as arrays)
            out(CV(try_parse_json(
              graft.functions.Vrl.compactJson(jsonText(v.cv))), VAny))
          case VArrOf(e) =>
            out(CV(filter(v.cv.col, x => x.isNotNull && coalesce(x.cast("string") =!= "", lit(true))), VArrOf(e)))
          case _ => out(v.cv)
        }
      case "merge" =>
        val l = a(0, "to")
        val r = a(1, "from")
        // deep: true recurses into keys whose values are objects on
        // BOTH sides (merge.cue "deep" named arg); everywhere else the
        // right side replaces wholesale — exactly VRL's shallow rule
        val deep = a.litBool(2, "deep").getOrElse(false)
        def mergeObjs(lc: CV, rc: CV): CV = (lc.t, rc.t) match {
          case (VObj(fa), VObj(fb)) =>
            val keys = (fa.keys ++ fb.keys).toSeq.distinct
            buildObj(ListMap(keys.map { k =>
              (fa.get(k), fb.get(k)) match {
                case (Some(ta: VObj), Some(tb: VObj)) if deep =>
                  k -> mergeObjs(CV(lc.col.getField(k), ta),
                                 CV(rc.col.getField(k), tb))
                case (_, Some(tb)) => k -> CV(rc.col.getField(k), tb)
                case (Some(ta), None) => k -> CV(lc.col.getField(k), ta)
                case (None, None) => k -> CV(lit(null), VNullT) // unreachable
              }
            }: _*))
          case _ => rc
        }
        (l.cv.t, r.cv.t) match {
          case (VObj(_), VObj(_)) =>
            out(mergeObjs(l.cv, r.cv))
          case (VAny, VAny) =>
            val lj = to_json(l.cv.col); val rj = to_json(r.cv.col)
            if (deep)
              // recursive right-wins merge over the JSON form
              // (merge.cue deep: objects on both sides recurse)
              out(CV(try_parse_json(
                graft.functions.Vrl.mergeDeepJson(lj, rj)), VAny))
            else {
              // shallow JSON splice: {"a":1} + {"b":2} -> {"a":1,"b":2}
              val spliced = when(rj === "{}", lj).when(lj === "{}", rj)
                .otherwise(concat(regexp_replace(lj, "\\}$", ""), lit(","),
                  regexp_replace(rj, "^\\{", "")))
              out(CV(try_parse_json(spliced), VAny))
            }
          case (x, y) => throw VrlUnsupported(s"merge of $x with $y")
        }
      case "push" =>
        val arr = a(0, "value"); val v = a(1, "item")
        arr.cv.t match {
          case VArrOf(e) if e == v.cv.t => out(CV(array_append(arr.cv.col, v.cv.col), VArrOf(e)))
          case VHet(ts) =>
            val elems = ts.zipWithIndex.map { case (t, i) => CV(arr.cv.col.getField(s"_$i"), t) }
            out(buildHet(elems :+ v.cv))
          case VAny =>
            // JSON splice onto a dynamic array (push.cue over a
            // parse_json! result); raises when the variant isn't one
            val aj = to_json(arr.cv.col)
            val ij = jsonOf(v.cv)
            val outJ = when(aj === "[]", concat(lit("["), ij, lit("]")))
              .otherwise(concat(regexp_replace(aj, "\\]$", ""), lit(","), ij, lit("]")))
            val notArr = arr.cv.col.isNull ||
              try_variant_get(arr.cv.col, "$", "array<variant>").isNull
            out(CV(when(!notArr, try_parse_json(outJ)), VAny),
              Some(notArr), "push on non-array")
          case _ => throw VrlUnsupported("push on non-array")
        }
      case "append" =>
        val x = a(0, "value"); val y = a(1, "items")
        (x.cv.t, y.cv.t) match {
          case (VArrOf(e1), VArrOf(e2)) if e1 == e2 =>
            out(CV(concat(x.cv.col, y.cv.col), VArrOf(e1)))
          case (VHet(ta), VHet(tb)) =>
            val ea = ta.zipWithIndex.map { case (t, i) => CV(x.cv.col.getField(s"_$i"), t) }
            val eb = tb.zipWithIndex.map { case (t, i) => CV(y.cv.col.getField(s"_$i"), t) }
            out(buildHet(ea ++ eb))
          case (VAny, VAny) =>
            // dynamic arrays append via JSON splice (append.cue)
            val lj = to_json(x.cv.col); val rj = to_json(y.cv.col)
            val spliced = when(rj === "[]", lj).when(lj === "[]", rj)
              .otherwise(concat(regexp_replace(lj, "\\]$", ""), lit(","),
                regexp_replace(rj, "^\\[", "")))
            val notArr = x.cv.col.isNull || y.cv.col.isNull ||
              try_variant_get(x.cv.col, "$", "array<variant>").isNull ||
              try_variant_get(y.cv.col, "$", "array<variant>").isNull
            out(CV(when(!notArr, try_parse_json(spliced)), VAny),
              Some(notArr), "append of non-arrays")
          case (p, q) => throw VrlUnsupported(s"append of $p with $q")
        }
      // ------------------------------------------------- control
      case "assert" =>
        val cond = boolOf(a(0, "condition").cv)
        val msg = a.litStr(1, "message").getOrElse("assertion failed")
        out(CV(lit(true), VBool), Some(!coalesce(cond, lit(false))), msg)
      case "assert_eq" =>
        val l = a(0, "left"); val r = a(1, "right")
        // reference default message: `assertion failed: {left} == {right}`
        // with VRL value display (assert_eq.cue pins `assertion failed:
        // 127 == [1, 2, 3]`); literal operands format at plan time
        val msg = a.litStr(2, "message").getOrElse {
          (litDisplay(a.raw(0, "left")), litDisplay(a.raw(1, "right"))) match {
            case (Some(ld), Some(rd)) => s"assertion failed: $ld == $rd"
            case _ => "assertion failed"
          }
        }
        val okc = VrlCompile.eq(l.cv, r.cv)
        out(CV(lit(true), VBool), Some(!coalesce(okc, lit(false))), msg)
      case "is_nullish" =>
        // whitespace-only means ANY whitespace (is_nullish.cue: "\n",
        // "\r" are nullish) — `trim` strips only 0x20 spaces, so the
        // check is a \s* regex, not trim() === ""
        val v = a(0, "value")
        def nullishStr(c: Column): Column = c.rlike("^\\s*$") || c === "-"
        val col = v.cv.t match {
          case VNullT => lit(true)
          case VStr => v.cv.col.isNull || nullishStr(v.cv.col)
          case VAny =>
            is_variant_null(v.cv.col) || v.cv.col.isNull ||
              coalesce(nullishStr(try_variant_get(v.cv.col, "$", "string")), lit(false))
          case _ => v.cv.col.isNull
        }
        out(CV(col, VBool))
      case "uuid_v4" => out(CV(expr("uuid()"), VStr))
      case "uuid_v7" =>
        // uuid_v7.cue: RFC 9562 layout — 48-bit unix-ms from the
        // timestamp argument (default now()), version 7, variant 10;
        // random bits from per-row entropy
        val ts = a.opt(0, "timestamp").map(_.cv.col.cast("timestamp"))
          .getOrElse(current_timestamp())
        val h = expr("uuid()")
        val entropyA = conv(substring(md5(h.cast("binary")), 1, 15), 16, 10).cast("long")
        val entropyB = conv(substring(sha1(h.cast("binary")), 1, 15), 16, 10).cast("long")
        out(CV(graft.functions.Vrl.uuidV7(ts, entropyA, entropyB), VStr))
      case "to_syslog_facility" =>
        val code = a(0, "value").cv.col.cast("int")
        val names = Seq("kern", "user", "mail", "daemon", "auth", "syslog", "lpr",
          "news", "uucp", "cron", "authpriv", "ftp", "ntp", "security", "console",
          "solaris-cron", "local0", "local1", "local2", "local3", "local4",
          "local5", "local6", "local7")
        // guard the index range: element_at throws under ANSI mode for
        // out-of-range codes (and index 0 in all modes), which would make
        // the "invalid facility code" raise below unreachable
        val r = when(code.between(0, names.size - 1),
          element_at(array(names.map(lit): _*), code + 1))
        out(CV(r, VStr), Some(r.isNull), "invalid facility code")
      case "to_syslog_severity" =>
        val lvl = lower(asStr(a(0, "value")))
        val m = Map("emerg" -> 0, "panic" -> 0, "alert" -> 1, "crit" -> 2, "err" -> 3,
          "error" -> 3, "warning" -> 4, "warn" -> 4, "notice" -> 5, "info" -> 6,
          "debug" -> 7)
        val r = m.foldLeft(lit(null).cast("bigint")) { case (acc, (k, v0)) =>
          when(lvl === k, lit(v0.toLong)).otherwise(acc)
        }
        out(CV(r, VInt), Some(r.isNull), "unknown severity")

      // --- round-3 long-tail wires (graft.functions implementations) --
      case "parse_bytes" =>
        val v = asStr(a(0, "value"))
        val unit = a.litStr(1, "unit").getOrElse("B")
        val base = a.litStr(2, "base").getOrElse("2")
        val r = graft.functions.VrlParsers.parseBytes(v, unit, base)
        out(CV(r, VFloat), Some(r.isNull), "not a parsable byte size")
      case "parse_etld" =>
        val v = asStr(a(0, "value"))
        val plus = a.litInt(1, "plus_parts").getOrElse(0L).toInt
        // psl: a publicsuffix.org-format file (parse_etld.cue custom
        // PSL example) loaded at compile; default = built-in subset
        val suffixes = a.litStr(2, "psl") match {
          case None => graft.functions.Etld.DefaultSuffixes
          case Some(path) =>
            scala.jdk.CollectionConverters.ListHasAsScala(
              java.nio.file.Files.readAllLines(resolveFile(path))).asScala.toSeq
              .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//"))
        }
        structuredXv(graft.functions.Etld.parseEtld(v, plus, suffixes), prop,
          s"$pfx: unable to parse etld")
      case "parse_ruby_hash" =>
        val r = try_parse_json(graft.functions.Vrl.parseRubyHash(asStr(str0)))
        out(CV(r, VAny), Some(r.isNull), "unable to parse ruby hash")
      case "parse_user_agent" =>
        val mode = a.litStr(1, "mode").getOrElse("fast")
        structuredXv(graft.functions.UserAgent.parseVrl(asStr(a(0, "value")), mode),
          prop, s"$pfx: unable to parse user agent")
      case "parse_linux_authorization" =>
        val r = graft.functions.VrlParsers
          .parseLinuxAuthorization(asStr(a(0, "value")))
        structuredXv(r, prop, s"$pfx: not an auth log line")
      case "strip_ansi_escape_codes" =>
        out(withStrRaise(a, bang, graft.functions.Vrl.stripAnsiEscapeCodes))
      case "shannon_entropy" =>
        val seg = a.litStr(1, "segmentation").getOrElse("bytes")
        out(CV(graft.functions.Vrl.shannonEntropy(asStr(a(0, "value")), seg), VFloat))
      case "seahash" =>
        out(CV(graft.functions.Vrl.seahash(asStr(a(0, "value"))), VInt))
      case "encode_base16" =>
        out(CV(lower(hex(asBytes(str0))), VStr))
      case "decode_base16" =>
        val v = asStr(str0)
        val d = try_to_binary(v, lit("hex"))
        out(CV(d, VBytes), Some(v.isNotNull && d.isNull), "unable to decode base16")
      case "encode_percent" =>
        val asciiSet = a.litStr(1, "ascii_set").getOrElse("NON_ALPHANUMERIC")
        out(withStrRaise(a, bang, graft.functions.Vrl.encodePercentSet(_, asciiSet)))
      case "decode_percent" =>
        out(withStrRaise(a, bang, graft.functions.Vrl.decodePercent))
      case "encode_punycode" =>
        out(withStrRaise(a, bang, graft.functions.Vrl.encodePunycode))
      case "decode_punycode" =>
        out(withStrRaise(a, bang, graft.functions.Vrl.decodePunycode))
      case "decode_mime_q" =>
        out(withStrRaise(a, bang, graft.functions.Vrl.decodeMimeQ))
      case "hmac" =>
        // hmac.cue: returns the raw digest BYTES (callers wrap in
        // encode_base64/encode_base16); `algorithm` may be a runtime
        // value — compile a when-chain over the supported set then.
        val value = asStr(a(0, "value"))
        val key = asStr(a(1, "key"))
        def bytesFor(alg: String): Column =
          graft.functions.Vrl.hmacBytes(value, key, alg)
        val algs = Seq("SHA1", "SHA-224", "SHA-256", "SHA-384", "SHA-512")
        val r = a.litStr(2, "algorithm") match {
          case Some(alg) =>
            if (!algs.contains(alg)) throw VrlUnsupported(s"hmac algorithm $alg")
            bytesFor(alg)
          case None => a.opt(2, "algorithm") match {
            case None => bytesFor("SHA-256")
            case Some(algXv) =>
              val algC = asStr(algXv)
              algs.foldLeft(lit(null).cast("binary")) { (acc, alg) =>
                when(algC === alg, bytesFor(alg)).otherwise(acc)
              }
          }
        }
        out(CV(r, VBytes), Some(r.isNull), "invalid hmac algorithm")
      case "format_int" =>
        val b = a.litInt(1, "base").getOrElse(10L).toInt
        out(CV(graft.functions.Vrl.formatInt(a(0, "value").cv.col.cast("long"), b), VStr))
      case "to_syslog_level" =>
        val r = graft.functions.Vrl.toSyslogLevel(a(0, "value").cv.col)
        out(CV(r, VStr), Some(r.isNull), "invalid severity code")
      case "to_syslog_facility_code" =>
        val r = graft.functions.Vrl.toSyslogFacilityCode(asStr(a(0, "value")))
        out(CV(r.cast("bigint"), VInt), Some(r.isNull), "unknown facility")
      case "community_id" =>
        // cue positional order: source_ip, destination_ip, protocol,
        // source_port, destination_port, seed; ports optional (absent →
        // the spec's port-less layout). All numeric casts are try_cast:
        // under ANSI mode a hard cast on one malformed value would abort
        // the job — here it nulls the row and the raise below fires.
        val sp = a.opt(3, "source_port").map(_.cv.col.try_cast("int"))
        val dp = a.opt(4, "destination_port").map(_.cv.col.try_cast("int"))
        if (sp.isDefined != dp.isDefined)
          throw VrlUnsupported("community_id needs both ports or neither")
        // seed must be a plan-time literal (it's baked into the hash
        // layout): a non-literal silently hashing as 0 would mint wrong
        // IDs with no error, so reject it like encode_charset does
        val seed = a.opt(5, "seed") match {
          case None => 0L
          case Some(_) => a.litInt(5, "seed").getOrElse(
            throw VrlUnsupported("community_id seed must be a literal"))
        }
        val r = graft.functions.Vrl.communityId(
          asStr(a(0, "source_ip")), asStr(a(1, "destination_ip")),
          sp.getOrElse(lit(null).cast("int")), dp.getOrElse(lit(null).cast("int")),
          a(2, "protocol").cv.col.try_cast("int"),
          seed.toInt, portsProvided = sp.isDefined)
        out(CV(r, VStr), Some(r.isNull), "invalid arguments")

      // --- string case family (camelcase.cue & siblings) --------------
      case "camelcase" =>
        out(withStrRaise(a, bang, graft.functions.Vrl.camelcase(_, a.litStr(1, "original_case"))))
      case "pascalcase" =>
        out(withStrRaise(a, bang, graft.functions.Vrl.pascalcase(_, a.litStr(1, "original_case"))))
      case "snakecase" =>
        out(withStrRaise(a, bang, graft.functions.Vrl.snakecase(_, a.litStr(1, "original_case"))))
      case "screamingsnakecase" =>
        out(withStrRaise(a, bang,
          graft.functions.Vrl.screamingsnakecase(_, a.litStr(1, "original_case"))))
      case "kebabcase" =>
        out(withStrRaise(a, bang, graft.functions.Vrl.kebabcase(_, a.litStr(1, "original_case"))))
      case "strlen" =>
        // strlen.cue: count of Unicode scalar values (Spark `length` on
        // strings counts characters, which matches)
        val v = asStr(str0)
        out(CV(length(v).cast("bigint"), VInt), Some(v.isNull), "expected string")
      case "sieve" =>
        val v = asStr(a(0, "value"))
        val pat = a.litStr(1, "pattern").getOrElse(
          throw VrlUnsupported("sieve without literal pattern"))
        val single = a.litStr(2, "replace_single").getOrElse("")
        val repeated = a.litStr(3, "replace_repeated").getOrElse(single)
        // distinct markers: a run of >=2 rejected chars takes
        // replace_repeated, a lone rejected char replace_single —
        // ONE pass (split + per-run rebuild; a second regexp pass
        // would chew the first pass's marker text)
        if (single != repeated) {
          val runRe = s"(?:(?!$pat)(?s).)+"
          val runs = regexp_extract_all(v, lit(s"($runRe)"), lit(1))
          val parts = split(v, runRe, -1)
          val r = when(size(runs) === 0, v).otherwise(
            concat(element_at(parts, 1),
              array_join(zip_with(runs,
                slice(parts, lit(2), greatest(size(parts) - 1, lit(0))),
                (run, p) => concat(
                  when(length(run) === 1, lit(single)).otherwise(lit(repeated)),
                  coalesce(p, lit("")))), "")))
          out(CV(r, VStr))
        } else
          out(CV(graft.functions.Vrl.sieve(v, pat, single), VStr))
      case "basename" => out(withStrRaise(a, bang, graft.functions.Vrl.basename))
      case "dirname" => out(withStrRaise(a, bang, graft.functions.Vrl.dirname))
      case "chunks" =>
        val v = asStr(a(0, "value"))
        val n = a.litInt(1, "chunk_size").getOrElse(
          throw VrlUnsupported("chunks without literal chunk_size")).toInt
        if (n < 1) throw VrlUnsupported("chunk_size must be at least 1")
        out(CV(graft.functions.Vrl.chunks(v, n), VArrOf(VStr)))

      // --- numbers ----------------------------------------------------
      case "mod" =>
        val v = a(0, "value"); val m = a(1, "modulus")
        val t = if (v.cv.t == VFloat || m.cv.t == VFloat) VFloat else VInt
        val (lc, rc) =
          if (t == VFloat) (v.cv.col.cast("double"), m.cv.col.cast("double"))
          else (v.cv.col, m.cv.col)
        out(CV(lc % rc, t), Some(rc.isNull || rc === 0 || lc.isNull), "modulus is zero")
      case "haversine" =>
        val unit = a.litStr(4, "measurement_system").getOrElse("kilometers")
        val h = graft.functions.Vrl.haversine(
          a(0, "latitude1").cv.col.cast("double"), a(1, "longitude1").cv.col.cast("double"),
          a(2, "latitude2").cv.col.cast("double"), a(3, "longitude2").cv.col.cast("double"),
          unit)
        out(CV(h, VObj(ListMap("distance" -> VFloat, "bearing" -> VFloat))))

      // --- hashes / checksums ------------------------------------------
      case "crc" =>
        // crc.cue returns the checksum rendered as a string; default
        // algorithm CRC_32_ISO_HDLC (= zip crc32), CRC_32_CKSUM is the
        // POSIX cksum variant
        val algo = a.litStr(1, "algorithm").getOrElse("CRC_32_ISO_HDLC")
        val r = algo match {
          case "CRC_32_ISO_HDLC" => graft.functions.Vrl.crc(asStr(str0))
          case "CRC_32_CKSUM" => VrlKernels.crcCksum(asStr(str0))
          case other => throw VrlUnsupported(s"crc algorithm $other")
        }
        out(CV(r.cast("string"), VStr))
      case "xxhash" =>
        val variant = a.litStr(1, "variant").getOrElse("XXH32")
        val r = variant match {
          case "XXH32" => VrlKernels.xxh32(asStr(str0))
          case "XXH64" => VrlKernels.xxh64(asStr(str0))
          case other => throw VrlUnsupported(s"xxhash variant $other")
        }
        out(CV(r, VInt))

      // --- codecs -------------------------------------------------------
      case "encode_gzip" => out(binCodec(a, asBytes, graft.functions.Vrl.encodeGzip, encodeSide = true)._1)
      case "decode_gzip" => { val (cv, rs) = binCodec(a, asBytes, graft.functions.Vrl.decodeGzip, encodeSide = false); out(cv, rs, "unable to decode") }
      case "encode_zlib" => out(binCodec(a, asBytes, graft.functions.Vrl.encodeZlib, encodeSide = true)._1)
      case "decode_zlib" => { val (cv, rs) = binCodec(a, asBytes, graft.functions.Vrl.decodeZlib, encodeSide = false); out(cv, rs, "unable to decode") }
      case "encode_zstd" => out(binCodec(a, asBytes, graft.functions.Vrl.encodeZstd(_), encodeSide = true)._1)
      case "decode_zstd" => { val (cv, rs) = binCodec(a, asBytes, graft.functions.Vrl.decodeZstd, encodeSide = false); out(cv, rs, "unable to decode") }
      case "encode_lz4" => out(binCodec(a, asBytes, graft.functions.Vrl.encodeLz4, encodeSide = true)._1)
      case "decode_lz4" =>
        // decode_lz4.cue: bare-block by default; `use_prepended_size`
        // selects the lz4_flex size-prefixed layout encode_lz4 writes
        val prepended = a.litBool(1, "use_prepended_size", "prepended_size").getOrElse(false)
        val bufSize = a.litInt(2, "buf_size").getOrElse(1L << 20).toInt
        val (cv, rs) = binCodec(a, asBytes,
          org.apache.spark.sql.graftvec.CodecExpressions.unlz4(_, prepended, bufSize),
          encodeSide = false)
        out(cv, rs, "unable to decode")
      case "encode_snappy" => out(binCodec(a, asBytes, graft.functions.Vrl.encodeSnappy, encodeSide = true)._1)
      case "decode_snappy" => { val (cv, rs) = binCodec(a, asBytes, graft.functions.Vrl.decodeSnappy, encodeSide = false); out(cv, rs, "unable to decode") }
      case "encode_charset" =>
        val cs = a.litStr(1, "to_charset", "charset").getOrElse(
          throw VrlUnsupported("encode_charset without literal charset"))
        val v = asStr(str0)
        val r = graft.functions.Vrl.encodeCharset(v, cs)
        out(CV(r, VBytes), Some(v.isNotNull && r.isNull), "unable to encode charset")
      case "decode_charset" =>
        val cs = a.litStr(1, "from_charset", "charset").getOrElse(
          throw VrlUnsupported("decode_charset without literal charset"))
        val v = asBytes(str0)
        val r = graft.functions.Vrl.decodeCharset(v, cs)
        out(CV(r, VStr), Some(v.isNotNull && r.isNull), "unable to decode charset")
      case "encrypt" | "decrypt" =>
        // encrypt.cue: AES family, names like "AES-128-CBC-PKCS7" —
        // cipher mode is the 3rd component; a PKCS7 padding suffix maps
        // to the JVM's PKCS5Padding (identical for AES's 16-byte
        // blocks). Ciphertext is a first-class byte string (VBytes).
        val algo = a.litStr(1, "algorithm").getOrElse("AES-256-GCM")
        val parts = algo.split("-")
        val mode = parts.find(p => p == "GCM" || p == "CBC" || p == "ECB" ||
            p == "CTR" || p == "CFB" || p == "OFB").getOrElse(
          throw VrlUnsupported(s"encrypt algorithm $algo"))
        if (!Set("GCM", "CBC", "ECB").contains(mode))
          throw VrlUnsupported(s"encrypt mode $mode")
        // IV layout: Spark's aes_encrypt returns iv||ciphertext (and
        // expects that prefix back at aes_decrypt); the reference's
        // encrypt returns BARE ciphertext with the IV a separate
        // argument (encrypt.cue) — so strip the prefix on encrypt and
        // re-prepend the caller's IV on decrypt. GCM uses a 12-byte
        // IV, CBC 16, ECB none.
        val key = asStr(a(2, "key"))
        val ivLen = mode match { case "GCM" => 12; case "CBC" => 16; case _ => 0 }
        if (name == "encrypt") {
          val iv = a.opt(3, "iv").map(asBytes).getOrElse(
            lit("0000000000000000").cast("binary"))
          val full = graft.functions.Vrl.encrypt(asStr(a(0, "plaintext")), key, iv, mode)
          val bare = if (ivLen == 0) full
            else full.substr(lit(ivLen + 1), length(full) - ivLen)
          out(CV(bare, VBytes))
        } else {
          val ct = asBytes(a(0, "ciphertext"))
          val withIv = if (ivLen == 0) ct else {
            val iv = a.opt(3, "iv").map(asBytes).getOrElse(
              lit("0000000000000000").cast("binary"))
            concat(iv, ct)
          }
          val r = graft.functions.Vrl.decrypt(withIv, key, mode).cast("string")
          out(CV(r, VStr), Some(r.isNull), "unable to decrypt")
        }
      case "encrypt_ip" =>
        val mode = a.litStr(2, "mode", "algorithm").getOrElse("aes128")
        val r = graft.functions.Vrl.encryptIp(asStr(a(0, "ip")), asStr(a(1, "key")), mode)
        out(CV(r, VStr), Some(r.isNull), "invalid ip or key")
      case "decrypt_ip" =>
        val mode = a.litStr(2, "mode", "algorithm").getOrElse("aes128")
        val r = graft.functions.Vrl.decryptIp(asStr(a(0, "ip")), asStr(a(1, "key")), mode)
        out(CV(r, VStr), Some(r.isNull), "invalid ip or key")

      // --- random (seeded: a distributed plan wants per-row
      // reproducibility; `seed:` defaults to a per-row unique id) -------
      case "random_bool" =>
        out(CV(graft.functions.Vrl.randomBool(seedCol(a, 0)), VBool))
      case "random_float" =>
        out(CV(graft.functions.Vrl.randomFloat(seedCol(a, 0)), VFloat))
      case "random_int" =>
        val mn = a.litInt(0, "min").getOrElse(throw VrlUnsupported("random_int without literal min"))
        val mx = a.litInt(1, "max").getOrElse(throw VrlUnsupported("random_int without literal max"))
        if (mx <= mn) throw VrlUnsupported("random_int max must exceed min")
        out(CV(graft.functions.Vrl.randomInt(seedCol(a, 2), mn, mx), VInt))
      case "random_bytes" =>
        val len = a.litInt(0, "length").getOrElse(
          throw VrlUnsupported("random_bytes without literal length")).toInt
        if (len < 0 || len > 4096) throw VrlUnsupported("random_bytes length out of range")
        val seed = seedCol(a, 1)
        // deterministic byte stream: chained sha2-256 hex, cut to length
        val hex = (0 until (len + 31) / 32)
          .map(i => sha2(concat(seed.cast("string"), lit(s"#$i")).cast("binary"), 256))
        out(CV(unhex(substring(concat(hex: _*), 1, len * 2)), VBytes))

      // --- ip ----------------------------------------------------------
      case "ip_aton" =>
        val r = graft.functions.Vrl.ipAton(asStr(str0))
        out(CV(r, VInt), Some(r.isNull), "invalid ipv4 address")
      case "ip_ntoa" =>
        val v = a(0, "value").cv.col.cast("long")
        out(CV(graft.functions.Vrl.ipNtoa(v), VStr), Some(v.isNull), "invalid integer")

      case "ip_pton" =>
        // ip_pton.cue: returns the 4/16 RAW address bytes
        val r = VrlKernels.ipPtonHex(asStr(str0))
        out(CV(unhex(r), VBytes), Some(r.isNull), "invalid ip address")
      case "ip_ntop" =>
        val r = VrlKernels.ipNtopHex(lower(hex(asBytes(str0))))
        out(CV(r, VStr), Some(r.isNull), "invalid address bytes")

      // --- find / parse_regex_all ---------------------------------------
      case "find" =>
        val v = asStr(a(0, "value"))
        val pat = a.raw(1, "pattern") match {
          case LitRegex(p) => p
          case LitS(lits) => java.util.regex.Pattern.quote(lits)
          case _ => throw VrlUnsupported("find with non-literal pattern")
        }
        val from = a.opt(2, "from").map(_.cv.col.cast("int")).getOrElse(lit(0))
        val sub = substring(v, from + 1, length(v))
        val idx = regexp_instr(sub, lit(pat), lit(0))
        out(CV(when(idx > 0, (idx - 1 + from).cast("bigint"))
          .otherwise(lit(-1L)), VInt))
      case "parse_regex_all" =>
        // same numeric_groups contract as parse_regex, per match
        val v = asStr(a(0, "value"))
        val pat = a.litStr(1, "pattern").getOrElse(
          throw VrlUnsupported("parse_regex_all without literal pattern"))
        val numeric = a.litBool(2, "numeric_groups").getOrElse(false)
        val (pat0, groups) = VrlKernels.namedGroups(pat)
        val javaPat = if (numeric) s"($pat0)" else pat0
        val off = if (numeric) 1 else 0
        val named = groups.zipWithIndex.map { case (g, i) =>
          g -> regexp_extract_all(v, lit(javaPat), lit(i + 1 + off))
        }
        val nums =
          if (!numeric) Seq.empty
          else ("0" -> regexp_extract_all(v, lit(javaPat), lit(1))) +:
            groups.indices.map(i =>
              (i + 1).toString -> regexp_extract_all(v, lit(javaPat), lit(i + 2)))
        val extracted = named ++ nums
        val fieldNames = extracted.map(_._1)
        val n = size(extracted.head._2)
        val objT = VObj(ListMap(fieldNames.map(_ -> (VStr: VT)): _*))
        val arr = when(n > 0, transform(sequence(lit(0), n - 1), i =>
          struct(extracted.map { case (g, c) =>
            (if (g == "0") element_at(c, i + 1)
             else nullif(element_at(c, i + 1), lit(""))).as(g)
          }: _*)))
          .otherwise(array().cast(s"array<${structDdl(fieldNames)}>"))
        out(CV(arr, VArrOf(objT)), Some(v.isNull), "expected string")

      // --- type checks ---------------------------------------------------
      case "is_string" | "is_integer" | "is_float" | "is_boolean" |
           "is_array" | "is_object" | "is_null" | "is_timestamp" | "is_regex" =>
        out(CV(typeCheck(name, a, c), VBool))
      case "is_empty" =>
        val v = a(0, "value")
        val col = v.cv.t match {
          case VStr => length(v.cv.col) === 0
          case VArrOf(_) | VMap => size(v.cv.col) === 0
          case VHet(ts) => lit(ts.isEmpty)
          case VObj(fs) => lit(fs.isEmpty)
          case VAny => to_json(v.cv.col).isin("[]", "{}", "\"\"")
          case _ => throw VrlUnsupported("is_empty on scalar")
        }
        out(CV(coalesce(col, lit(false)), VBool))
      case "is_ipv4" =>
        out(CV(coalesce(graft.functions.Vrl.isIpv4(asStr(str0)), lit(false)), VBool))
      case "is_ipv6" =>
        out(CV(coalesce(graft.functions.Vrl.isIpv6(asStr(str0)), lit(false)), VBool))
      case "is_json" =>
        // variant: the value must parse AND be that JSON type
        // (is_json.cue "Non-valid exact variant")
        val js = asStr(str0)
        val ok = graft.functions.Vrl.isJson(js)
        val r = a.litStr(1, "variant") match {
          case None => ok
          case Some(variant) =>
            val head = regexp_extract(trim(js), "^(.)", 1)
            val shape = variant match {
              case "object" => head === "{"
              case "array" => head === "["
              case "string" => head === "\""
              case "null" => trim(js) === "null"
              case "bool" => trim(js).isin("true", "false")
              case "number" => head.rlike("[-0-9]")
              case other => throw VrlUnsupported(s"is_json variant $other")
            }
            ok && shape
        }
        out(CV(coalesce(r, lit(false)), VBool))

      // --- type declarations (array.cue/object.cue/timestamp.cue) -------
      case "timestamp" =>
        val v = a(0, "value")
        v.cv.t match {
          case VTime => out(CV(v.cv.col, VTime), Some(v.cv.col.isNull), "expected timestamp")
          case _ => out(CV(lit(null).cast("timestamp"), VTime), Some(lit(true)), "expected timestamp")
        }
      case "array" =>
        val v = a(0, "value")
        v.cv.t match {
          case VArrOf(_) | VHet(_) => out(v.cv, Some(v.cv.col.isNull), "expected array")
          case VAny =>
            out(v.cv, Some(!to_json(v.cv.col).startsWith("[")), "expected array")
          case _ => out(CV(lit(null), VNullT), Some(lit(true)), "expected array")
        }
      case "object" =>
        val v = a(0, "value")
        v.cv.t match {
          case VObj(_) | VMap => out(v.cv, Some(v.cv.col.isNull), "expected object")
          case VAny =>
            out(v.cv, Some(!to_json(v.cv.col).startsWith("{")), "expected object")
          case _ => out(CV(lit(null), VNullT), Some(lit(true)), "expected object")
        }
      case "to_regex" =>
        // regexes are carried as pattern strings (see `cx(LitRegex)`)
        out(CV(asStr(str0), VStr), Some(asStr(str0).isNull), "expected string")

      case "validate_json_schema" =>
        // schema_definition is a file PATH (validate_json_schema.cue);
        // loaded + keyword-checked once at compile — the reference's
        // compiled-schema cache made explicit
        val path = a.litStr(1, "schema_definition").getOrElse(
          throw VrlUnsupported("validate_json_schema without literal schema path"))
        val ignoreUnknown = a.litBool(2, "ignore_unknown_formats").getOrElse(false)
        val schemaJson = try new String(
          java.nio.file.Files.readAllBytes(resolveFile(path)), "UTF-8")
        catch { case e: Exception =>
          throw VrlUnsupported(s"schema_definition file $path: ${e.getMessage}") }
        val r = VrlKernels.validateJsonSchema(asStr(str0), schemaJson, ignoreUnknown)
        out(CV(coalesce(r, lit(false)), VBool), Some(r.isNull), "invalid json payload")

      // --- environment / misc -------------------------------------------
      case "get_env_var" =>
        val n = a.litStr(0, "name").getOrElse(
          throw VrlUnsupported("get_env_var without literal name"))
        val r = graft.functions.Vrl.getEnvVar(n)
        out(CV(r, VStr), Some(r.isNull), s"environment variable $n not set")
      case "tag_types_externally" =>
        // tag_types_externally.cue: scalars wrap into {type: value};
        // objects tag each FIELD recursively, arrays each element;
        // null stays null. Types are static here, so the whole tagging
        // happens at plan time. A regex argument (pattern-string
        // convention) tags as {"regex": pattern}.
        def tagOf(t: VT): String = t match {
          case VStr => "string"; case VInt => "integer"; case VFloat => "float"
          case VBool => "boolean"; case VTime => "timestamp"
          case other => throw VrlUnsupported(s"tag_types_externally on $other")
        }
        def tagged(cv: CV): CV = cv.t match {
          case VNullT => cv
          case VObj(fs) =>
            buildObj(ListMap(fs.keys.map(k =>
              k -> tagged(CV(cv.col.getField(k), fs(k)))).toSeq: _*))
          case VArrOf(e) =>
            val tag = tagOf(e)
            CV(transform(cv.col, x => struct(x.as(tag))),
              VArrOf(VObj(ListMap(tag -> e))))
          case VHet(ts) =>
            buildHet(ts.zipWithIndex.map { case (t, i) =>
              tagged(CV(cv.col.getField(s"_$i"), t)) })
          case t => buildObj(ListMap(tagOf(t) -> cv))
        }
        val v = a(0, "value")
        if (a.rawOpt(0, "value").exists(_.isInstanceOf[LitRegex]))
          out(buildObj(ListMap("regex" -> v.cv)))
        else out(tagged(v.cv))
      case "uuid_from_friendly_id" =>
        out(withStrRaise(a, bang, graft.functions.Vrl.uuidFromFriendlyId))
      case "match_datadog_query" =>
        val q = a.litStr(1, "query").getOrElse(
          throw VrlUnsupported("match_datadog_query without literal query"))
        a(0, "value").cv match {
          case CV(c0, VObj(fs)) =>
            // datadog semantics: `@name` reads the event ATTRIBUTE
            // `name`; a bare `key:` term reads the `tags` array entry
            // "key:value" (match_datadog_query.cue)
            val fieldCol = (n0: String) => {
              val n = n0.stripPrefix("@")
              if (n0.startsWith("@") || fs.contains(n)) {
                if (fs.contains(n)) c0.getField(n).cast("string") else nullStr
              } else fs.get("tags") match {
                case Some(VArrOf(_)) | Some(VHet(_)) =>
                  val arr = fs("tags") match {
                    case VHet(ts) => array(ts.indices.map(i =>
                      c0.getField("tags").getField(s"_$i").cast("string")): _*)
                    case _ => c0.getField("tags")
                  }
                  regexp_replace(
                    try_element_at(filter(arr,
                      t => t.cast("string").startsWith(n + ":")), lit(1))
                      .cast("string"),
                    "^[^:]*:", "")
                case _ => nullStr
              }
            }
            val default =
              if (fs.contains("message")) c0.getField("message").cast("string")
              else concat_ws(" ", fs.keys.toSeq.map(k => c0.getField(k).cast("string")): _*)
            out(CV(graft.functions.SearchSyntax.compile(q, default, fieldCol), VBool))
          case _ => throw VrlUnsupported("match_datadog_query on non-object")
        }

      // --- collections (closure-free) ------------------------------------
      case "unique" =>
        val v = XV(normArr(a(0, "value").cv), a(0, "value").raise, a(0, "value").msg)
        v.cv.t match {
          case VArrOf(e) => out(CV(array_distinct(v.cv.col), VArrOf(e)))
          case _ => throw VrlUnsupported("unique of non-array")
        }
      case "includes" =>
        val arr = XV(normArr(a(0, "value").cv), None, nullStr); val item = a(1, "item")
        arr.cv.t match {
          case VArrOf(_) =>
            out(CV(coalesce(array_contains(arr.cv.col, item.cv.col), lit(false)), VBool))
          case _ => throw VrlUnsupported("includes of non-array")
        }
      case "contains_all" =>
        val v = asStr(a(0, "value"))
        val subs = a(1, "substrings")
        val cs = a.litBool(2, "case_sensitive").getOrElse(true)
        val vv = if (cs) v else lower(v)
        subs.cv.t match {
          case VArrOf(VStr) =>
            val ss = if (cs) subs.cv.col else transform(subs.cv.col, lower(_))
            out(CV(coalesce(forall(ss, s => vv.contains(s)), lit(false)), VBool))
          case _ => throw VrlUnsupported("contains_all without string array")
        }
      case "match_any" =>
        val v = asStr(a(0, "value"))
        val pats = a.raw(1, "patterns") match {
          case ArrLit(items) => items.map {
            case LitRegex(p) => p
            case LitS(s) => java.util.regex.Pattern.quote(s)
            case _ => throw VrlUnsupported("match_any pattern")
          }
          case _ => throw VrlUnsupported("match_any without literal patterns array")
        }
        out(CV(pats.map(p => coalesce(v.rlike(p), lit(false))).reduce(_ || _), VBool))
      case "match_array" =>
        val arr = XV(normArr(a(0, "value").cv), None, nullStr)
        val pat = a.litStr(1, "pattern").getOrElse(
          throw VrlUnsupported("match_array without literal pattern"))
        val all = a.litBool(2, "all").getOrElse(false)
        arr.cv.t match {
          case VArrOf(_) =>
            val f = (x: Column) => coalesce(x.cast("string").rlike(pat), lit(false))
            val r = if (all) forall(arr.cv.col, f) else exists(arr.cv.col, f)
            out(CV(coalesce(r, lit(false)), VBool))
          case _ => throw VrlUnsupported("match_array of non-array")
        }
      case "keys" =>
        val v = a(0, "value")
        v.cv.t match {
          case VObj(fs) => out(CV(array(fs.keys.toSeq.map(lit): _*), VArrOf(VStr)))
          case VMap => out(CV(map_keys(v.cv.col), VArrOf(VStr)))
          case VAny => out(CV(json_object_keys(to_json(v.cv.col)), VArrOf(VStr)))
          case _ => throw VrlUnsupported("keys of non-object")
        }
      case "values" =>
        val v = a(0, "value")
        v.cv.t match {
          case VObj(fs) =>
            val elems = fs.keys.toSeq.map(k => CV(v.cv.col.getField(k), fs(k)))
            if (elems.map(_.t).distinct.size == 1 && elems.nonEmpty)
              out(CV(array(elems.map(_.col): _*), VArrOf(elems.head.t)))
            else out(buildHet(elems))
          case VMap => out(CV(map_values(v.cv.col), VArrOf(VStr)))
          case _ => throw VrlUnsupported("values of non-object")
        }
      case "zip" =>
        // zip.cue: two arrays → pairs truncated to the shorter; ONE
        // array-of-arrays → transpose. Full semantics (mixed element
        // types included) over the JSON form.
        val x = a(0, "array_0")
        val y = a.opt(1, "array_1")
        val r = try_parse_json(org.apache.spark.sql.graftvec.StringExpressions
          .jsonZip(jsonText(x.cv), y.map(v => jsonText(v.cv)).getOrElse(nullStr)))
        out(CV(r, VAny), Some(r.isNull), "value must be a collection")
      case "object_from_array" =>
        // object_from_array.cue: [key, value] pairs, or a values array
        // with a separate keys: array; null keys drop the entry —
        // type-preserving over the JSON form
        val v = a(0, "values")
        val keys = a.opt(1, "keys")
        val r = try_parse_json(org.apache.spark.sql.graftvec.StringExpressions
          .jsonObjectFromArray(jsonText(v.cv),
            keys.map(k => jsonText(k.cv)).getOrElse(nullStr)))
        out(CV(r, VAny), Some(r.isNull), "unable to build object")
      case "pop" =>
        val v = a(0, "value")
        v.cv.t match {
          case VArrOf(e) =>
            out(CV(slice(v.cv.col, lit(1), greatest(size(v.cv.col) - 1, lit(0))), VArrOf(e)))
          case VHet(ts) if ts.nonEmpty =>
            val elems = ts.zipWithIndex.init.map { case (t, i) => CV(v.cv.col.getField(s"_$i"), t) }
            out(buildHet(elems))
          case _ => throw VrlUnsupported("pop of non-array")
        }
      case "flatten" =>
        val v = XV(normArr(a(0, "value").cv), None, nullStr)
        v.cv.t match {
          case VArrOf(VArrOf(e)) => out(CV(flatten(v.cv.col), VArrOf(e)))
          case VAny | VObj(_) | VHet(_) | VMap =>
            // full recursive semantics over the JSON form (arrays splat,
            // object keys dot-join) — static shapes route through jsonText
            out(CV(try_parse_json(
              graft.functions.Vrl.flattenObject(jsonText(v.cv))), VAny))
          case t => throw VrlUnsupported(s"flatten of $t")
        }
      case "unflatten" =>
        val v = a(0, "value")
        v.cv.t match {
          case VAny | VObj(_) | VMap =>
            // recursive: true (the default) re-runs until no dotted key
            // remains inside nested values (unflatten.cue)
            val recursive = a.litBool(1, "recursive").getOrElse(true)
            val r = graft.functions.Vrl.unflattenObject(jsonText(v.cv), recursive)
            out(CV(try_parse_json(r), VAny))
          case t => throw VrlUnsupported(s"unflatten of $t")
        }

      // --- parsers (grok-backed + structured) ----------------------------
      case "parse_apache_log" =>
        val fmt = a.litStr(1, "format").getOrElse("common")
        if (!Set("common", "combined", "error").contains(fmt))
          throw VrlUnsupported(s"parse_apache_log format $fmt")
        structuredXv(graft.functions.VrlParsers.apacheLog(asStr(a(0, "value")), fmt), prop,
          s"$pfx: failed parsing common log line")
      case "parse_nginx_log" =>
        val fmt = a.litStr(1, "format").getOrElse("combined")
        if (!Set("combined", "error", "main", "ingress_upstreaminfo").contains(fmt))
          throw VrlUnsupported(s"parse_nginx_log format $fmt")
        structuredXv(graft.functions.VrlParsers.nginxLog(asStr(a(0, "value")), fmt), prop,
          s"$pfx: failed parsing nginx log line")
      case "parse_klog" =>
        // klog is the Kubernetes variant of glog (parse_klog.cue)
        val x = VrlParsers.glog(asStr(a(0, "value")))
        XV(x.cv, (prop ++ x.raise).reduceOption(_ || _), x.msg)
      case "parse_groks" =>
        val pats0 = a.raw(1, "patterns") match {
          case ArrLit(items) => items.map {
            case LitS(s) => s
            case _ => throw VrlUnsupported("parse_groks pattern")
          }
          case _ => throw VrlUnsupported("parse_groks without literal patterns array")
        }
        // `aliases` (inline object) / `alias_sources` (JSON files):
        // %{name} references expand recursively before grok compilation
        // (parse_groks.cue "Parse using multiple Grok patterns")
        val aliasMap: Map[String, String] = {
          val inline = a.rawOpt(2, "aliases") match {
            case Some(ObjLit(fs)) => fs.collect { case (k, LitS(p)) => k -> p }.toMap
            case Some(_) => throw VrlUnsupported("parse_groks aliases must be a literal object")
            case None => Map.empty[String, String]
          }
          val fromFiles = a.rawOpt(3, "alias_sources") match {
            case Some(ArrLit(items)) => items.flatMap {
              case LitS(path) =>
                val node = new com.fasterxml.jackson.databind.ObjectMapper()
                  .readTree(java.nio.file.Files.readAllBytes(resolveFile(path)))
                scala.jdk.CollectionConverters.IteratorHasAsScala(node.properties().iterator())
                  .asScala.map(e => e.getKey -> e.getValue.asText()).toSeq
              case _ => throw VrlUnsupported("alias_sources must be string literals")
            }.toMap
            case Some(_) => throw VrlUnsupported("alias_sources must be an array literal")
            case None => Map.empty[String, String]
          }
          fromFiles ++ inline
        }
        def expandAliases(p: String): String = {
          var cur = p
          var rounds = 0
          val ref = """%\{([A-Za-z0-9_]+)\}""".r
          while (rounds < 16 && ref.findAllMatchIn(cur).exists(m => aliasMap.contains(m.group(1)))) {
            cur = ref.replaceAllIn(cur, m => aliasMap.get(m.group(1)) match {
              case Some(sub) => scala.util.matching.Regex.quoteReplacement(sub)
              case None => scala.util.matching.Regex.quoteReplacement(m.matched)
            })
            rounds += 1
          }
          cur
        }
        val pats = pats0.map(expandAliases)
        val v = asStr(a(0, "value"))
        val compiled = pats.map(graft.functions.Grok.compile(_, regexLiterals = true))
        // first-match-wins (parse_groks.cue): fields = union, each field
        // read from the first matching pattern that captures it
        val firstIdx = compiled.zipWithIndex.foldRight(lit(-1)) { case ((cp, i), acc) =>
          when(cp.matches(v), lit(i)).otherwise(acc)
        }
        val union = compiled.flatMap(_.fields).distinct
        val fields = ListMap(union.map { f =>
          val alts = compiled.zipWithIndex.collect {
            case (cp, i) if cp.fields.contains(f) =>
              val c = cp.columns(v).collectFirst { case (n, cc) if n == f => cc }.get
              when(firstIdx === i, nullif(c, lit("")))
          }
          f -> CV(coalesce(alts :+ nullStr: _*), VStr)
        }: _*)
        val obj = buildObj(fields)
        out(CV(when(firstIdx >= 0, obj.col), obj.t),
          Some(v.isNull || firstIdx === -1), "no grok pattern matched")
      case "parse_csv" =>
        val v = asStr(a(0, "value"))
        val delim = a.litStr(1, "delimiter").getOrElse(",")
        val d = java.util.regex.Pattern.quote(delim)
        // split on delimiters outside double quotes, then unquote
        val parts = split(v, s"""$d(?=(?:[^"]*"[^"]*")*[^"]*$$)""", -1)
        val unq = transform(parts, p =>
          when(p.startsWith("\"") && p.endsWith("\"") && length(p) >= 2,
            regexp_replace(expr_substr(p), "\"\"", "\"")).otherwise(p))
        out(CV(unq, VArrOf(VStr)), Some(v.isNull), "expected string")
      case "parse_logfmt" =>
        // parse_logfmt = parse_key_value with the logfmt defaults
        // (parse_logfmt.cue) — same tokenizer, same quote handling
        val v = asStr(a(0, "value"))
        val r = try_parse_json(org.apache.spark.sql.graftvec.StringExpressions
          .keyValueToJson(v, "=", " "))
        out(CV(r, VAny), Some(v.isNotNull && r.isNull), "unable to parse logfmt")
      case "parse_query_string" =>
        // parse_query_string.cue: repeated keys collect into an ARRAY;
        // bracket/percent escapes in KEYS decode ("foo%5B%5D" → "foo[]")
        val r = try_parse_json(graft.functions.Vrl.parseQueryStringJson(
          asStr(a(0, "value"))))
        out(CV(r, VAny), Some(r.isNull), "unable to parse query string")
      case "parse_int" =>
        val v = asStr(a(0, "value"))
        val r = a.litInt(1, "base") match {
          case Some(b) =>
            if (b < 2 || b > 36) throw VrlUnsupported("parse_int base out of range")
            graft.functions.Vrl.parseInt(v, b.toInt)
          case None =>
            // prefix-dispatched base (parse_int.cue)
            val sign = when(v.startsWith("-"), lit(-1L)).otherwise(lit(1L))
            val u = regexp_replace(v, "^[+-]", "")
            // try_cast: conv() renders UNSIGNED 64-bit, so e.g.
            // 0xffffffffffffffff exceeds Long and a plain ANSI cast aborts
            sign * (when(u.startsWith("0x"), conv(u.substr(lit(3), length(u)), 16, 10).try_cast("long"))
              .when(u.startsWith("0b"), conv(u.substr(lit(3), length(u)), 2, 10).try_cast("long"))
              .when(u.startsWith("0o"), conv(u.substr(lit(3), length(u)), 8, 10).try_cast("long"))
              .when(u.rlike("^0[0-7]+$"), conv(u.substr(lit(2), length(u)), 8, 10).try_cast("long"))
              .otherwise(try_cast_long(u)))
        }
        out(CV(r, VInt), Some(v.isNotNull && r.isNull), "unable to parse int")
      case "parse_float" =>
        val v = asStr(a(0, "value"))
        // try_cast: a plain cast aborts the job under ANSI mode instead
        // of reaching the raise channel below
        val r = v.try_cast("double")
        out(CV(r, VFloat), Some(v.isNotNull && r.isNull), "unable to parse float")
      case "parse_cef" =>
        val raw = asStr(a(0, "value"))
        // a syslog prefix before `CEF:` is allowed (parse_cef.cue)
        val start = instr(raw, "CEF:")
        val v = raw.substr(start, length(raw))
        import graft.functions.Parsers
        val fields = ListMap(
          "cefVersion" -> CV(regexp_replace(Parsers.cefHeader(v, 0), "^CEF:", ""), VStr),
          "deviceVendor" -> CV(Parsers.cefHeader(v, 1), VStr),
          "deviceProduct" -> CV(Parsers.cefHeader(v, 2), VStr),
          "deviceVersion" -> CV(Parsers.cefHeader(v, 3), VStr),
          "deviceEventClassId" -> CV(Parsers.cefHeader(v, 4), VStr),
          "name" -> CV(Parsers.cefHeader(v, 5), VStr),
          "severity" -> CV(Parsers.cefHeader(v, 6), VStr))
        // extension keys FLATTEN into the top level (parse_cef.cue);
        // translate_custom_fields renames csN/cnN via their
        // csNLabel/cnNLabel companions and drops the Label entries
        val translate = a.litBool(1, "translate_custom_fields").getOrElse(false)
        val extJson0 = to_json(Parsers.cefExtension(v))
        val extJson =
          if (translate)
            org.apache.spark.sql.graftvec.StringExpressions.cefTranslate(extJson0)
          else extJson0
        val merged = try_parse_json(graft.functions.Vrl.mergeDeepJson(
          to_json(buildObj(fields).col), coalesce(extJson, lit("{}"))))
        out(CV(when(v.startsWith("CEF:"), merged), VAny),
          Some(v.isNull || !v.startsWith("CEF:")), "not a CEF message")
      case "parse_influxdb" =>
        // parse_influxdb.cue: one METRIC OBJECT per field —
        // {name: <measurement>_<field>, tags, timestamp (micros),
        // kind: absolute, gauge: {value}} — ints (i/u) and booleans
        // coerce to the gauge's float
        val v = asStr(a(0, "value"))
        import graft.functions.Parsers
        val m = nullif(Parsers.influxMeasurement(v), lit(""))
        val tagsJson = coalesce(to_json(Parsers.influxTags(v)), lit("{}"))
        // decimal division: `/` on longs is DOUBLE division, and an
        // 18-digit nanosecond count rounds to a 256 ns ulp — enough to
        // corrupt the last microsecond digit
        val tsIso = date_format(
          timestamp_micros((Parsers.influxTsNanos(v).cast("decimal(38,0)") /
            lit(1000).cast("decimal(38,0)")).cast("long")),
          "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
        val entries = map_entries(Parsers.influxFields(v))
        val metricJsons = transform(entries, e => {
          val raw = e.getField("value")
          val num = when(raw === "true", lit(1.0))
            .when(raw === "false", lit(0.0))
            .otherwise(regexp_replace(raw, "[iu]$", "").try_cast("double"))
          concat(lit("{\"name\":"),
            to_json(struct(concat(m, lit("_"), e.getField("key")).as("v")))
              .substr(lit(6), length(to_json(struct(concat(m, lit("_"),
                e.getField("key")).as("v")))) - 6),
            lit(",\"tags\":"), tagsJson,
            lit(",\"timestamp\":\""), tsIso,
            lit("\",\"kind\":\"absolute\",\"gauge\":{\"value\":"),
            num.cast("string"), lit("}}"))
        })
        val arrJson = concat(lit("["), array_join(metricJsons, ","), lit("]"))
        out(CV(when(m.isNotNull, try_parse_json(arrJson)), VAny),
          Some(v.isNull || m.isNull), "not an influx line")
      case "parse_aws_alb_log" =>
        structuredXv(graft.functions.VrlParsers.parseAwsAlbLog(asStr(a(0, "value"))),
          prop, s"$pfx: not an ALB log line")
      case "parse_aws_vpc_flow_log" =>
        val fmt = a.litStr(1, "format")
        val r = fmt match {
          case Some(f) => graft.functions.VrlParsers.parseAwsVpcFlowLog(asStr(a(0, "value")), f)
          case None => graft.functions.VrlParsers.parseAwsVpcFlowLog(asStr(a(0, "value")))
        }
        structuredXv(r, prop, s"$pfx: not a VPC flow log line")
      case "parse_aws_cloudwatch_log_subscription_message" =>
        structuredXv(graft.functions.VrlParsers
          .parseAwsCloudwatchLogSubscriptionMessage(asStr(a(0, "value"))),
          prop, s"$pfx: not a cloudwatch subscription message")
      case "parse_xml" =>
        val v = asStr(a(0, "value"))
        val j = VrlKernels.parseXml(v,
          a.litBool(1, "include_attr").getOrElse(true),
          a.litStr(2, "attr_prefix").getOrElse("@"),
          a.litStr(3, "text_key").getOrElse("text"),
          a.litBool(4, "always_use_text_key").getOrElse(false),
          a.litBool(5, "parse_bool").getOrElse(true),
          a.litBool(6, "parse_null").getOrElse(true),
          a.litBool(7, "parse_number").getOrElse(true))
        out(CV(try_parse_json(j), VAny), Some(v.isNull || j.isNull), "unable to parse xml")
      case "parse_cbor" =>
        // value is a byte string (usually from decode_base64)
        val v = asBytes(a(0, "value"))
        val r = try_parse_json(graft.functions.Vrl.parseCbor(v))
        out(CV(r, VAny), Some(r.isNull), "unable to parse cbor")
      case "parse_dnstap" =>
        // parse_dnstap.rs:174: the function ITSELF base64-decodes its
        // string input (unlike the other byte-string parsers); typed
        // struct out (Dnstap.schema)
        val v = asStr(a(0, "value"))
        val lower = a.litBool(1, "lowercase_hostnames").getOrElse(false)
        val parsed = graft.functions.Dnstap.parseDnstap(unbase64(v), lower)
        out(CV(parsed, fromSpark(graft.functions.Dnstap.schema)),
          Some(v.isNull || parsed.isNull), "dnstap parsing failed for value")
      case "parse_proto" | "encode_proto" =>
        // parse_proto.cue / encode_proto.cue: desc_file + message_type are
        // literal strings; the descriptor set is read and compiled at PLAN
        // time (same compile-once contract as the reference). The payload
        // is a first-class byte string (VBytes) — wire it with
        // decode_base64!/encode_base64 when it rides a text column; bytes
        // FIELDS inside the message are unsupported here (the
        // ProtoCodec Column API carries them natively).
        val descPath = a.litStr(1, "desc_file").getOrElse(
          throw VrlUnsupported(s"$name without literal desc_file"))
        val msgType = a.litStr(2, "message_type").getOrElse(
          throw VrlUnsupported(s"$name without literal message_type"))
        val descBytes =
          try java.nio.file.Files.readAllBytes(resolveFile(descPath))
          catch { case _: java.io.IOException =>
            throw new IllegalArgumentException(s"desc_file '$descPath' does not exist") }
        val reg = graft.functions.ProtoDescriptor.parse(descBytes)
        val md = reg.message(msgType)
        val st = graft.functions.ProtoCodec.sparkType(md, reg)
        def noBytes(dt: org.apache.spark.sql.types.DataType): Unit = dt match {
          case org.apache.spark.sql.types.BinaryType =>
            throw VrlUnsupported(s"$name: bytes fields need the ProtoCodec Scala API")
          case s: org.apache.spark.sql.types.StructType =>
            s.fields.foreach(f => noBytes(f.dataType))
          case org.apache.spark.sql.types.ArrayType(e, _) => noBytes(e)
          case org.apache.spark.sql.types.MapType(k, v2, _) => { noBytes(k); noBytes(v2) }
          case _ => ()
        }
        noBytes(st)
        if (name == "parse_proto") {
          val v = asBytes(a(0, "value"))
          val parsed = graft.functions.ProtoCodec.parseProto(v, descBytes, msgType)
          out(CV(parsed, fromSpark(st)), Some(v.isNull || parsed.isNull),
            "value is not a valid proto payload")
        } else {
          val v = a(0, "value")
          v.cv.t match {
            case VObj(_) | VAny => ()
            case other => throw VrlUnsupported(s"encode_proto over $other")
          }
          // normalize through the descriptor's Spark type: VRL object
          // literals compile tuple fields as _0.._n structs, while the
          // encoder wants real arrays — jsonText serializes tuples as
          // arrays, from_json re-types them against the message schema
          val structCol = from_json(jsonText(v.cv), st)
          val enc = graft.functions.ProtoCodec.encodeProto(structCol, descBytes, msgType)
          out(CV(enc, VBytes), Some(structCol.isNull), "unable to encode proto")
        }
      case "encode_logfmt" | "encode_key_value" =>
        // encode_key_value.cue: nested objects flatten to dotted keys;
        // `fields_ordering` lists keys first (remaining keys sorted
        // after); `flatten_boolean` renders true as a bare key and
        // drops false; space-bearing values quote
        val v = a(0, "value")
        val kvSep = a.litStr(2, "key_value_delimiter").getOrElse("=")
        val fieldSep = a.litStr(3, "field_delimiter").getOrElse(" ")
        val flattenBool = a.litBool(4, "flatten_boolean").getOrElse(false)
        val ordering: Seq[String] = a.rawOpt(1, "fields_ordering") match {
          case Some(ArrLit(items)) => items.map {
            case LitS(s) => s
            case _ => throw VrlUnsupported("fields_ordering must be string literals")
          }
          case Some(_) => throw VrlUnsupported("fields_ordering must be an array literal")
          case None => Nil
        }
        def flat(prefix: String, cv: CV): Seq[(String, CV)] = cv.t match {
          case VObj(fts) => fts.toSeq.flatMap { case (k, t) =>
            flat(if (prefix.isEmpty) k else s"$prefix.$k",
              CV(cv.col.getField(k), t))
          }
          case _ => Seq(prefix -> cv)
        }
        def render(pairs: Seq[(String, CV)]): Column = {
          val (listed, rest) = pairs.partition(p => ordering.contains(p._1))
          val sortedPairs =
            listed.sortBy(p => ordering.indexOf(p._1)) ++ rest.sortBy(_._1)
          concat_ws(fieldSep, sortedPairs.map { case (k, cv) =>
            val c = cv.col.cast("string")
            // quote on whitespace or an embedded field delimiter; an
            // embedded KV delimiter does NOT quote (timestamps carry
            // ':' un-quoted in the reference's custom-delimiter example)
            val quoted = when(c.contains(" ") || c.contains(fieldSep),
              concat(lit("\""), c, lit("\""))).otherwise(c)
            cv.t match {
              case VBool if flattenBool =>
                when(cv.col === true, lit(k)) // false/null: omitted
              case _ => when(c.isNotNull, concat(lit(k + kvSep), quoted))
            }
          }: _*)
        }
        v.cv.t match {
          case VObj(_) => out(CV(render(flat("", v.cv)), VStr))
          case VMap =>
            val entries = sort_array(map_entries(v.cv.col))
            out(CV(array_join(transform(entries, e => {
              val value = e.getField("value").cast("string")
              val quoted = when(value.contains(" "),
                concat(lit("\""), value, lit("\""))).otherwise(value)
              concat(e.getField("key"), lit(kvSep), quoted)
            }), fieldSep), VStr))
          case t => throw VrlUnsupported(s"encode_logfmt of $t")
        }

      case other => throw VrlUnsupported(s"function $other")
    }
  }

  /** Build the grok-object XV used by the format-dispatched parsers. */
  /** `fname` is the full diagnostic prefix (callErrPrefix output). */
  private def grokXv(compiled: graft.functions.Grok.Compiled, v: Column,
                     prop: Option[Column], fname: String): XV = {
    val fields = ListMap(compiled.columns(v).map { case (n, c) =>
      n -> CV(nullif(c, lit("")), VStr)
    }: _*)
    val obj = buildObj(fields)
    val raise = v.isNull || !compiled.matches(v)
    XV(CV(when(compiled.matches(v), obj.col), obj.t),
      Some((prop ++ Seq(raise)).reduce(_ || _)),
      lit(s"""$fname: log line did not match"""))
  }

  /** Struct-returning parser → dynamic object (variant) result, so
    * config programs can walk fields without a static VObj contract.
    */
  /** `msg` is the full diagnostic text (caller includes the prefix). */
  private def structuredXv(structCol: Column, prop: Option[Column], msg: String): XV = {
    val r = try_parse_json(to_json(structCol))
    XV(CV(r, VAny), Some((prop ++ Seq(r.isNull)).reduce(_ || _)), lit(msg))
  }

  /** Binary codec: compressed payloads are first-class byte strings
    * (VBytes/BinaryType) — encode_base64 & friends consume the raw
    * bytes, exactly VRL's byte-string model.
    */
  /** Returns (value, raise): decoders null out malformed input
    * (CodecExpressions per-row degradation) — surfaced here as the VRL
    * raise channel; encoders are total.
    */
  private def binCodec(a: Args, asBytes: XV => Column,
                       f: Column => Column, encodeSide: Boolean): (CV, Option[Column]) = {
    val v = asBytes(a(0, "value"))
    val r = f(v)
    (CV(r, VBytes), if (encodeSide) None else Some(v.isNotNull && r.isNull))
  }

  private def seedCol(a: Args, i: Int): Column =
    a.opt(i, "seed").map(_.cv.col).getOrElse(expr("monotonically_increasing_id()"))

  /** Static-type checks: resolved at plan time for typed columns, by
    * JSON rendering for variant values (exact on the canonical render).
    */
  private def typeCheck(name: String, a: Args, c: Call): Column = {
    if (name == "is_regex")
      return lit(c.args.headOption.exists(_.isInstanceOf[LitRegex]))
    val v = a(0, "value")
    (name, v.cv.t) match {
      case (_, VAny) =>
        val j = to_json(v.cv.col)
        name match {
          case "is_string" => coalesce(j.startsWith("\""), lit(false))
          case "is_integer" => coalesce(j.rlike("^-?\\d+$"), lit(false))
          case "is_float" => coalesce(j.rlike("^-?\\d+\\.\\d+([eE][+-]?\\d+)?$"), lit(false))
          case "is_boolean" => coalesce(j.isin("true", "false"), lit(false))
          case "is_array" => coalesce(j.startsWith("["), lit(false))
          case "is_object" => coalesce(j.startsWith("{"), lit(false))
          case "is_null" => is_variant_null(v.cv.col) || v.cv.col.isNull
          case _ => lit(false) // is_timestamp: variants carry no timestamp type
        }
      case ("is_string", VStr) => v.cv.col.isNotNull
      case ("is_integer", VInt) => v.cv.col.isNotNull
      case ("is_float", VFloat) => v.cv.col.isNotNull
      case ("is_boolean", VBool) => v.cv.col.isNotNull
      case ("is_timestamp", VTime) => v.cv.col.isNotNull
      case ("is_array", VArrOf(_) | VHet(_)) => v.cv.col.isNotNull
      case ("is_object", VObj(_) | VMap) => v.cv.col.isNotNull
      case ("is_null", VNullT) => lit(true)
      case ("is_null", _) => v.cv.col.isNull
      case _ => lit(false)
    }
  }

  // -------------------------------------------------- closures
  private def compileClosureFn(env: Env, c: Call): (XV, Env) = {
    val Some((params, body)) = c.closure: @unchecked
    val (target0, env1) = compileExpr(env, valueArg(c))
    // dynamic JSON arrays/objects read as native array-of-variant / map
    val target = target0.cv.t match {
      case VAny if c.name == "filter" || c.name == "for_each" =>
        CV(try_variant_get(target0.cv.col, "$", "array<variant>"), VArrOf(VAny))
      case _ => normArr(target0.cv)
    }
    def bound(vals: Seq[CV]): Env = {
      if (params.length > vals.length)
        throw VrlUnsupported(s"${c.name} closure with ${params.length} parameters")
      env1.copy(locals = env1.locals ++ params.zip(vals))
    }
    // pure-expression body: event mutation inside an element-wise
    // closure has no row-wise meaning, so the env is discarded
    def bodyCv(vals: Seq[CV]): CV = compileExpr(bound(vals), body)._1.cv

    def pass(cv: CV): (XV, Env) =
      (XV(cv, target0.raise, lit(callErrPrefix(c.name, c.span))), env1)

    (c.name, target.t) match {
      case ("filter", VArrOf(e)) =>
        // VRL closure order is |index, element|; Spark's is (element, index)
        val f = (x: Column, i: Column) =>
          coalesce(boolOf(bodyCv(Seq(CV(i.cast("bigint"), VInt), CV(x, e)))), lit(false))
        pass(CV(filter(target.col, f), VArrOf(e)))
      case ("filter", VMap) =>
        val f = (k: Column, v: Column) =>
          coalesce(boolOf(bodyCv(Seq(CV(k, VStr), CV(v, VStr)))), lit(false))
        pass(CV(map_filter(target.col, f), VMap))
      case ("filter", VObj(_)) =>
        throw VrlUnsupported("filter closure over a statically-typed object")
      case ("map_keys", VMap) =>
        val f = (k: Column, _v: Column) => bodyCv(Seq(CV(k, VStr))).col.cast("string")
        pass(CV(transform_keys(target.col, f), VMap))
      case ("map_keys", VAny) =>
        // dynamic object (parse_json!/parse_key_value! result): read as
        // map<string,variant>, rewrite keys, back to a variant value.
        // Rebuilt through the JSON object kernel, NOT transform_keys:
        // a key collision after the rewrite must keep the LAST write
        // (VRL object semantics), where Spark's map dedup policy
        // throws DUPLICATED_MAP_KEY
        val m = try_variant_get(target0.cv.col, "$", "map<string, variant>")
        val newKeys = transform(map_keys(m),
          k => bodyCv(Seq(CV(k, VStr))).col.cast("string"))
        pass(CV(try_parse_json(org.apache.spark.sql.graftvec.StringExpressions
          .jsonObjectFromArray(to_json(map_values(m)), to_json(newKeys))), VAny))
      case ("map_values", VAny) =>
        val m = try_variant_get(target0.cv.col, "$", "map<string, variant>")
        val f = (_k: Column, v: Column) =>
          try_parse_json(jsonText(bodyCv(Seq(CV(v, VAny)))))
        pass(CV(try_parse_json(to_json(transform_values(m, f))), VAny))
      case ("map_keys", VObj(_)) =>
        // static object: keys are compile-time strings, so the closure
        // body applied to a key literal must constant-fold — evaluate
        // it at plan time and rebuild the struct under the new names
        // (map_keys.cue; `recursive` descends into object values)
        val recursive = c.named.collectFirst { case ("recursive", LitB(b)) => b }
          .getOrElse(false)
        def renameKeys(cv: CV): CV = cv.t match {
          case VObj(fts) =>
            buildObj(ListMap(fts.toSeq.map { case (k, t) =>
              val nk = org.apache.spark.sql.graftvec.StringExpressions
                .foldToString(bodyCv(Seq(CV(lit(k), VStr))).col)
                .getOrElse(throw VrlUnsupported(
                  "map_keys body must be constant-foldable over a static object"))
              val child = CV(cv.col.getField(k), t)
              nk -> (if (recursive) renameKeys(child) else child)
            }: _*))
          case _ => cv
        }
        pass(renameKeys(target))
      case ("map_values", VMap) =>
        val f = (_k: Column, v: Column) => bodyCv(Seq(CV(v, VStr))).col.cast("string")
        pass(CV(transform_values(target.col, f), VMap))
      case ("map_values", VObj(fts)) =>
        // static object: unrolled per-field rewrite
        val fields = ListMap(fts.keys.map { k =>
          k -> bodyCv(Seq(CV(target.col.getField(k), fts(k))))
        }.toSeq: _*)
        pass(buildObj(fields))
      case ("map_values", VArrOf(e)) =>
        val outT = bodyCv(Seq(CV(lit(null), e))).t // type probe
        pass(CV(transform(target.col, x => bodyCv(Seq(CV(x, e))).col), VArrOf(outT)))
      case ("for_each", VObj(fts)) =>
        // unrolled iteration: key is a literal per field, and the body's
        // event/local mutations THREAD through the env (the VRL
        // accumulate-into-a-count pattern, for_each.cue)
        var envAcc = env1
        fts.foreach { case (k, t) =>
          val withParams = envAcc.copy(locals =
            envAcc.locals ++ params.zip(Seq(CV(lit(k), VStr), CV(target.col.getField(k), t))))
          val (_, after) = compileExpr(withParams, body)
          envAcc = after.copy(locals = after.locals -- params)
        }
        (XV.pure(nullValue), envAcc)
      case ("replace_with", _) =>
        // replace_with.cue: rebuild = pieces[0] + Σ body(matchᵢ) +
        // pieces[i+1], where `split` yields the between-match pieces and
        // regexp_extract_all the match/capture arrays — all Spark HOFs,
        // no per-row interpreter. Named-group fields are exposed when
        // every group is named (mixed patterns keep `captures` only).
        // Closure-body raises cannot hoist out of a lambda: a raising
        // body yields a null replacement (documented divergence).
        val v = target0.cv.col.cast("string")
        val pat = c.args.lift(1).collect {
          case LitRegex(p) => p
        }.getOrElse(throw VrlUnsupported("replace_with without regex pattern"))
        val count = c.named.collectFirst { case ("count", LitI(n)) => n.toInt }.getOrElse(-1)
        val (javaPat, names) = VrlKernels.namedGroups(pat)
        val total = java.util.regex.Pattern.compile(javaPat).matcher("").groupCount()
        val whole = regexp_extract_all(v, lit(javaPat), lit(0))
        val grpArrs = (1 to total).map(g => regexp_extract_all(v, lit(javaPat), lit(g)))
        def matchObj(i: Column): CV = {
          val base = ListMap(
            "string" -> CV(element_at(whole, i + 1), VStr),
            "captures" -> CV(
              if (grpArrs.isEmpty) array().cast("array<string>")
              else array(grpArrs.map(g => nullif(element_at(g, i + 1), lit(""))): _*),
              VArrOf(VStr)))
          val namedFields =
            if (names.length == total)
              names.zipWithIndex.map { case (nm, j) =>
                nm -> CV(nullif(element_at(grpArrs(j), i + 1), lit("")), VStr)
              }
            else Nil
          buildObj(base ++ namedFields)
        }
        val pieces = split(v, javaPat, if (count > 0) count + 1 else -1)
        val nMatches = size(whole)
        val nEff = if (count > 0) least(nMatches, lit(count)) else nMatches
        val replaced = when(nMatches === 0, v).otherwise(
          concat(element_at(pieces, 1),
            array_join(transform(sequence(lit(0), nEff - 1), i =>
              concat(bodyCv(Seq(matchObj(i))).col.cast("string"),
                coalesce(element_at(pieces, i + 2), lit("")))), "")))
        pass(CV(replaced, VStr))
      case ("for_each", VHet(ts)) =>
        var envAcc = env1
        ts.zipWithIndex.foreach { case (t, i) =>
          val withParams = envAcc.copy(locals =
            envAcc.locals ++ params.zip(Seq(CV(lit(i.toLong), VInt), CV(target.col.getField(s"_$i"), t))))
          val (_, after) = compileExpr(withParams, body)
          envAcc = after.copy(locals = after.locals -- params)
        }
        (XV.pure(nullValue), envAcc)
      case ("for_each", VArrOf(e)) =>
        // RUNTIME array (length unknown at plan time): the body compiles
        // ONCE into a `functions.aggregate` fold. The accumulator is a
        // struct with one JSON-text field per local the body assigns —
        // every VRL value round-trips through its JSON form, so the
        // accumulator type is fixed even when a local's type evolves
        // across iterations (the tally pattern, for_each.cue: `tally =
        // set!(tally, [value], …)`). Event mutation inside the loop has
        // no single-pass fold form; closure-body raises cannot hoist out
        // of a lambda (same documented divergence as replace_with).
        if (assignedEventPaths(body))
          throw VrlUnsupported("for_each body mutating the event over a runtime array")
        // env-mutating CALLS (not assignments) would be silently
        // discarded by the fold — refuse rather than diverge
        if (callsAnyOf(body, Set("del", "set_secret", "remove_secret",
            "set_semantic_meaning", "unnest")))
          throw VrlUnsupported(
            "for_each body calling an event/env mutator over a runtime array")
        // closure params are closure-SCOPED: a reassigned param is
        // loop-carried state inside the fold but never leaks out
        val mutated = assignedLocals(body).distinct.filterNot(params.contains)
        if (mutated.isEmpty) (XV.pure(nullValue), env1)
        else {
          val init = struct(mutated.map { n =>
            env1.locals.get(n).map(jsonText).getOrElse(lit("null")).as(n)
          }: _*)
          def mergeFn(acc: Column, elemVals: Seq[CV]): Column = {
            val withLocals = env1.copy(
              locals = env1.locals ++
                mutated.map(n => n -> CV(try_parse_json(acc.getField(n)), VAny)) ++
                params.zip(elemVals),
              consts = env1.consts -- mutated -- params)
            val (_, after) = compileExpr(withLocals, body)
            struct(mutated.map(n => jsonText(after.locals(n)).as(n)): _*)
          }
          val folded =
            if (params.length >= 2) {
              // VRL closure order is |index, element|
              val zipped = transform(target.col,
                (x: Column, i: Column) => struct(i.as("i"), x.as("x")))
              aggregate(zipped, init, (acc, p) => mergeFn(acc,
                Seq(CV(p.getField("i").cast("bigint"), VInt), CV(p.getField("x"), e))))
            } else
              aggregate(target.col, init, (acc, x) => mergeFn(acc, Seq(CV(x, e))))
          val envOut = env1.copy(
            locals = env1.locals ++ mutated.map(n =>
              n -> CV(try_parse_json(folded.getField(n)), VAny)),
            consts = env1.consts -- mutated)
          (XV.pure(nullValue), envOut)
        }
      case (fn, t) => throw VrlUnsupported(s"$fn closure over $t")
    }
  }

  /** Local names the expression assigns (loop-carried state of a
    * runtime-array for_each fold), in first-assignment order.
    */
  private def assignedLocals(e: Expr): Seq[String] = e match {
    case Block(stmts) => stmts.flatMap {
      case Assign(ok, err, ex) =>
        (Seq(ok) ++ err).collect { case TLocal(n) => n } ++ assignedLocals(ex)
      case ExprStmt(x) => assignedLocals(x)
      case AbortStmt(m) => m.toSeq.flatMap(assignedLocals)
    }
    case IfE(c0, t, eo) =>
      assignedLocals(c0) ++ assignedLocals(t) ++ eo.toSeq.flatMap(assignedLocals)
    case Bin(_, l, r) => assignedLocals(l) ++ assignedLocals(r)
    case Un(_, x) => assignedLocals(x)
    case Coalesce(l, r) => assignedLocals(l) ++ assignedLocals(r)
    case PathOn(b, _) => assignedLocals(b)
    case ArrLit(items) => items.flatMap(assignedLocals)
    case ObjLit(fs) => fs.flatMap(f => assignedLocals(f._2))
    case Call(_, _, args, named, closure, _) =>
      args.flatMap(assignedLocals) ++ named.flatMap(n => assignedLocals(n._2)) ++
        closure.toSeq.flatMap { case (ps, b) => assignedLocals(b).filterNot(ps.contains) }
    case _ => Nil
  }

  /** Whether the expression contains a call to any of `names`. */
  private def callsAnyOf(e: Expr, names: Set[String]): Boolean = e match {
    case Block(stmts) => stmts.exists {
      case Assign(_, _, ex) => callsAnyOf(ex, names)
      case ExprStmt(x) => callsAnyOf(x, names)
      case AbortStmt(m) => m.exists(callsAnyOf(_, names))
    }
    case IfE(c0, t, eo) =>
      callsAnyOf(c0, names) || callsAnyOf(t, names) ||
        eo.exists(callsAnyOf(_, names))
    case Bin(_, l, r) => callsAnyOf(l, names) || callsAnyOf(r, names)
    case Un(_, x) => callsAnyOf(x, names)
    case Coalesce(l, r) => callsAnyOf(l, names) || callsAnyOf(r, names)
    case PathOn(b, _) => callsAnyOf(b, names)
    case ArrLit(items) => items.exists(callsAnyOf(_, names))
    case ObjLit(fs) => fs.exists(f => callsAnyOf(f._2, names))
    case Call(n, _, args, named, closure, _) =>
      names.contains(n) || args.exists(callsAnyOf(_, names)) ||
        named.exists(x => callsAnyOf(x._2, names)) ||
        closure.exists { case (_, b) => callsAnyOf(b, names) }
    case _ => false
  }

  /** Whether the expression assigns any event/metadata path. */
  private def assignedEventPaths(e: Expr): Boolean = e match {
    case Block(stmts) => stmts.exists {
      case Assign(ok, err, ex) =>
        (Seq(ok) ++ err).exists {
          case TField(_) | TWhole | TMeta => true
          case _ => false
        } || assignedEventPaths(ex)
      case ExprStmt(x) => assignedEventPaths(x)
      case AbortStmt(m) => m.exists(assignedEventPaths)
    }
    case IfE(c0, t, eo) =>
      assignedEventPaths(c0) || assignedEventPaths(t) || eo.exists(assignedEventPaths)
    case Bin(_, l, r) => assignedEventPaths(l) || assignedEventPaths(r)
    case Un(_, x) => assignedEventPaths(x)
    case Coalesce(l, r) => assignedEventPaths(l) || assignedEventPaths(r)
    case PathOn(b, _) => assignedEventPaths(b)
    case ArrLit(items) => items.exists(assignedEventPaths)
    case ObjLit(fs) => fs.exists(f => assignedEventPaths(f._2))
    case Call(_, _, args, named, closure, _) =>
      args.exists(assignedEventPaths) || named.exists(n => assignedEventPaths(n._2)) ||
        closure.exists { case (_, b) => assignedEventPaths(b) }
    case _ => false
  }

  /** Array literals with non-scalar elements compile to VHet structs;
    * a homogeneous het normalizes to a native array for the
    * collection functions.
    */
  private def normArr(cv: CV): CV = cv.t match {
    case VHet(ts) if ts.nonEmpty && ts.distinct.size == 1 =>
      CV(array(ts.indices.map(i => cv.col.getField(s"_$i")): _*), VArrOf(ts.head))
    case _ => cv
  }

  private def structDdl(fields: Seq[String]): String =
    fields.map(f => s"`$f` string").mkString("struct<", ",", ">")

  /** JSON text of a single value, whatever its Spark type: variants
    * print directly; everything else rides through a one-element array
    * (to_json rejects bare scalars) and sheds the brackets.
    */
  private def jsonOf(cv: CV): Column = cv.t match {
    case VAny => to_json(cv.col)
    case _ =>
      val j = to_json(array(cv.col))
      substring(j, lit(2), length(j) - 2)
  }

  /** Any value as its JSON text — the bridge from statically-typed
    * columns (structs, tuples, maps, scalars) to the Jackson-backed
    * JSON kernels that implement full reference semantics over dynamic
    * shapes. Tuples (VHet) serialize as ARRAYS (their VRL meaning),
    * not the `_0.._n` struct to_json would print; null object fields
    * are kept (`ignoreNullFields=false`) because path/zip/unflatten
    * kernels must see them.
    */
  private val keepNulls = java.util.Map.of("ignoreNullFields", "false")
  private[config] def jsonText(cv: CV): Column = cv.t match {
    case VAny => to_json(cv.col)
    case VNullT => lit("null")
    case VObj(fts) if fts.isEmpty => lit("{}")
    case VHet(ts) if ts.isEmpty => lit("[]")
    case VObj(fts) =>
      val members = fts.toSeq.map { case (k, t) =>
        val kq = com.fasterxml.jackson.databind.node.JsonNodeFactory.instance
          .textNode(k).toString
        concat(lit(kq + ":"), jsonText(CV(cv.col.getField(k), t)))
      }
      when(cv.col.isNull, lit("null")).otherwise(
        concat(lit("{"), concat_ws(",", members: _*), lit("}")))
    case VHet(ts) =>
      val members = ts.zipWithIndex.map { case (t, i) =>
        jsonText(CV(cv.col.getField(s"_$i"), t)) }
      when(cv.col.isNull, lit("null")).otherwise(
        concat(lit("["), concat_ws(",", members: _*), lit("]")))
    case VArrOf(VObj(_)) | VArrOf(VArrOf(_)) | VArrOf(VMap) | VMap | VArrOf(VStr) |
         VArrOf(VInt) | VArrOf(VFloat) | VArrOf(VBool) | VArrOf(VAny) =>
      to_json(cv.col, keepNulls)
    case VArrOf(e) => throw VrlUnsupported(s"json form of array<$e>")
    case _ => // scalar: {"v":X} with the fixed 5-char wrapper stripped
      val j = to_json(struct(cv.col.as("v")), keepNulls)
      when(cv.col.isNull, lit("null")).otherwise(j.substr(lit(6), length(j) - 6))
  }

  private def valueArg(c: Call): Expr =
    c.args.headOption.orElse(c.named.collectFirst { case ("value", e) => e })
      .getOrElse(throw VrlUnsupported(s"${c.name} without a value"))

  private def litPathArg(c: Call, i: Int, pname: String): Seq[PathSeg] =
    c.args.lift(i).orElse(c.named.collectFirst { case (`pname`, e) => e }) match {
      case Some(ArrLit(items)) => items.map {
        case LitS(s) => SegName(s)
        case LitI(n) => SegIndex(n.toInt)
        case Un("-", LitI(n)) => SegIndex(-n.toInt) // [-2]: from the end
        case other => throw VrlUnsupported(s"non-literal path segment $other")
      }
      case _ => throw VrlUnsupported(s"${c.name} without a literal path array")
    }

  /** A path array containing at least one NON-literal segment (the
    * dynamic-path form of get/set) — `Some(items)` routes the caller
    * to the runtime JSON-path kernel, `None` means all-literal (use
    * [[litPathArg]]).
    */
  private def dynPathItems(c: Call, i: Int, pname: String): Option[Seq[Expr]] =
    c.args.lift(i).orElse(c.named.collectFirst { case (`pname`, e) => e }) match {
      case Some(ArrLit(items)) =>
        val allLit = items.forall {
          case LitS(_) | LitI(_) | Un("-", LitI(_)) => true
          case _ => false
        }
        if (allLit) None else Some(items)
      case _ => None
    }

  private def walkCv(cv: CV, seg: PathSeg): CV = VrlCompile.walkStep(cv, seg)

  private def objFields(cv: CV): ListMap[String, CV] = cv.t match {
    case VObj(fts) =>
      ListMap(fts.keys.map(k => k -> CV(cv.col.getField(k), fts(k))).toSeq: _*)
    case t => throw VrlUnsupported(s"object operation on $t")
  }

  /** Functional set/remove on statically-typed objects (set.cue,
    * remove.cue): returns the REBUILT value, never mutates the event.
    */
  private def setStatic(base: CV, segs: Seq[PathSeg], v: CV): CV = segs.toList match {
    case Nil => v
    case SegName(n) :: rest =>
      val fields = base.t match {
        case VObj(_) => objFields(base)
        case VNullT => ListMap.empty[String, CV]
        case t => throw VrlUnsupported(s"set into $t")
      }
      val child = fields.getOrElse(n, CV(lit(null), VNullT))
      buildObj(fields + (n -> setStatic(child, rest, v)))
    case SegIndex(_) :: _ => throw VrlUnsupported("set with array index path")
  }

  private def removeStatic(base: CV, segs: Seq[PathSeg]): CV = segs.toList match {
    case Nil => CV(lit(null), VNullT)
    case SegName(n) :: rest =>
      val fields = objFields(base)
      if (rest.isEmpty) buildObj(fields - n)
      else fields.get(n) match {
        case Some(child) => buildObj(fields + (n -> removeStatic(child, rest)))
        case None => base
      }
    case SegIndex(_) :: _ => throw VrlUnsupported("remove with array index path")
  }

  private def withStrRaise(a: Args, bang: Boolean, f: Column => Column): CV = {
    val v = a(0, "value")
    v.cv.t match {
      case VStr => CV(f(v.cv.col), VStr)
      case VBytes => CV(f(v.cv.col.cast("string")), VStr) // UTF-8 view
      case VAny => CV(f(try_variant_get(v.cv.col, "$", "string")), VStr)
      case _ if bang => CV(lit(null).cast("string"), VStr) // raise handled by caller type check
      case _ => CV(f(v.cv.col.cast("string")), VStr)
    }
  }

  // strip first+last character (quotes / brackets) of a token
  private def expr_substr(t: Column): Column =
    t.substr(lit(2), length(t) - 2)

  /** ANSI-safe string→long: null (a raise) instead of a cast error.
    * try_cast (not an rlike gate) so overflow-length digit runs are
    * also null rather than an ANSI overflow abort.
    */
  private def try_cast_long(c: Column): Column =
    c.cast("string").try_cast("long")
}
