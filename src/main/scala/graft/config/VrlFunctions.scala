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

  /** Argument accessor: positional index or any of the given names. */
  private final class Args(args: Seq[XV], named: Map[String, XV],
                           rawArgs: Seq[Expr], rawNamed: Map[String, Expr],
                           fname: String) {
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

  def call(env: Env, c: Call): (XV, Env) = {
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
      case _ => ()
    }

    // --- ordinary functions: compile args, dispatch ------------------
    var envAcc = env
    def cx(e: Expr): XV = e match {
      case LitRegex(p) => XV.pure(CV(lit(p), VStr)) // regex args carried as pattern strings
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
  private def dispatch(name: String, bang: Boolean, a: Args, c: Call): XV = {
    val prop = a.propagate
    def out(cv: CV, raise: Option[Column] = None, msg: String = "runtime error"): XV =
      XV(cv, (prop ++ raise).reduceOption(_ || _), lit(s"function call error for \"$name\": $msg"))

    def str0: XV = a(0, "value")
    def asStr(xv: XV): Column = xv.cv.t match {
      case VStr => xv.cv.col
      case VAny => try_variant_get(xv.cv.col, "$", "string")
      case VNullT => nullStr
      case _ => xv.cv.col.cast("string")
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
          case VAny => try_variant_get(v.cv.col, "$", "double")
          case _ => v.cv.col.cast("string").cast("double")
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
          case VAny => try_variant_get(v.cv.col, "$", "boolean")
          case _ =>
            when(lower(v.cv.col.cast("string")).isin("true", "t", "yes", "y", "1"), lit(true))
              .when(lower(v.cv.col.cast("string")).isin("false", "f", "no", "n", "0"), lit(false))
        }
        out(CV(value, VBool), Some(v.cv.col.isNotNull && value.isNull), "unable to coerce to bool")
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
        val parsed = try_parse_json(asStr(v))
        out(CV(parsed, VAny), Some(parsed.isNull), "unable to parse json")
      case "encode_json" =>
        val v = str0
        out(CV(to_json(v.cv.col), VStr))

      // ------------------------------------------------ timestamps
      case "parse_timestamp" =>
        val v = str0
        val fmt = a.litStr(1, "format").getOrElse(
          throw VrlUnsupported("parse_timestamp without literal format"))
        val ts = VrlTime.parse(asStr(v), fmt)
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
          case "nanoseconds" => timestamp_micros((n / 1000L))
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
      case "match" =>
        val v = asStr(a(0, "value"))
        val pat = a.litStr(1, "pattern").getOrElse(
          throw VrlUnsupported("match without literal pattern"))
        out(CV(coalesce(v.rlike(pat), lit(false)), VBool))
      case "slice" =>
        val v = asStr(a(0, "value"))
        val len = length(v)
        def norm(x: Column) = when(x < 0, len + x).otherwise(x)
        val st = norm(a.opt(1, "start").map(_.cv.col.cast("int")).getOrElse(lit(0)))
        val en = norm(a.opt(2, "end").map(_.cv.col.cast("int")).getOrElse(len))
        out(CV(substring(v, (st + 1).cast("int"), (en - st).cast("int")), VStr))
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
        val v = asStr(a(0, "value"))
        val withS = asStr(a(2, "with"))
        val count = a.litInt(3, "count").getOrElse(-1L)
        a.raw(1, "pattern") match {
          case LitRegex(p) => out(CV(regexp_replace(v, lit(p), withS), VStr))
          case LitS(s) if count == 1L =>
            val pos = instr(v, s)
            out(CV(when(pos > 0,
              concat(v.substr(lit(1), pos - 1), withS,
                v.substr(pos + s.length, length(v))))
              .otherwise(v), VStr))
          case LitS(s) =>
            out(CV(regexp_replace(v, lit(java.util.regex.Pattern.quote(s)), withS), VStr))
          case _ => throw VrlUnsupported("replace with non-literal pattern")
        }
      case "length" =>
        val v = a(0, "value")
        v.cv.t match {
          case VStr => out(CV(length(v.cv.col).cast("bigint"), VInt))
          case VArrOf(_) | VMap => out(CV(size(v.cv.col).cast("bigint"), VInt))
          case VHet(ts) => out(CV(lit(ts.length.toLong), VInt))
          case VObj(fs) => out(CV(lit(fs.size.toLong), VInt))
          case _ => out(CV(length(asStr(v)).cast("bigint"), VInt))
        }
      case "redact" =>
        val v = asStr(a(0, "value"))
        val filters = a.raw(1, "filters") match {
          case ArrLit(items) => items.map {
            case LitRegex(p) => p
            case LitS(s) => java.util.regex.Pattern.quote(s)
            case _ => throw VrlUnsupported("redact filter")
          }
          case _ => throw VrlUnsupported("redact without literal filters array")
        }
        out(CV(filters.foldLeft(v)((c, p) => regexp_replace(c, lit(p), lit("[REDACTED]"))), VStr))
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
        out(CV(base64(asStr(str0).cast("binary")), VStr))
      case "decode_base64" =>
        val v = asStr(str0)
        val d = unbase64(v).cast("string")
        out(CV(d, VStr), Some(v.isNotNull && d.isNull), "unable to decode base64")

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
        val cidr = asStr(a(0, "cidr"))
        val ip = asStr(a(1, "value"))
        val r = VrlKernels.cidrContains(cidr, ip)
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
        val v = asStr(a(0, "value"))
        val kvSep = a.litStr(1, "key_value_delimiter").getOrElse("=")
        val fieldSep = a.litStr(2, "field_delimiter").getOrElse(" ")
        out(CV(str_to_map(v, lit(java.util.regex.Pattern.quote(fieldSep)),
          lit(java.util.regex.Pattern.quote(kvSep))), VMap))
      case "parse_tokens" =>
        val v = asStr(a(0, "value"))
        val toks = regexp_extract_all(v, lit("""\"[^\"]*\"|\[[^\]]*\]|\S+"""), lit(0))
        val cleaned = transform(toks, t =>
          when(t === "-", lit(null).cast("string"))
            .when(t.startsWith("\"") && t.endsWith("\""), expr_substr(t))
            .when(t.startsWith("[") && t.endsWith("]"), expr_substr(t))
            .otherwise(t))
        out(CV(cleaned, VArrOf(VStr)), Some(v.isNull), "expected string")
      case "parse_regex" =>
        val v = asStr(a(0, "value"))
        val pat = a.litStr(1, "pattern").getOrElse(
          throw VrlUnsupported("parse_regex without literal pattern"))
        val (javaPat, groups) = VrlKernels.namedGroups(pat)
        val fields = ListMap(groups.zipWithIndex.map { case (g, i) =>
          g -> CV(nullif(regexp_extract(v, javaPat, i + 1), lit("")), VStr)
        }: _*)
        val obj = buildObj(fields)
        out(CV(when(v.rlike(javaPat), obj.col), obj.t),
          Some(v.isNull || !v.rlike(javaPat)), "regex did not match")
      case "parse_grok" =>
        val v = asStr(a(0, "value"))
        val pat = a.litStr(1, "pattern").getOrElse(
          throw VrlUnsupported("parse_grok without literal pattern"))
        val compiled = graft.functions.Grok.compile(pat)
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
          case _ => VrlParsers.url(v)
        }
        XV(x.cv, (prop ++ x.raise).reduceOption(_ || _), x.msg)

      // ------------------------------------------- collections
      case "compact" =>
        val v = a(0, "value")
        v.cv.t match {
          case VAny =>
            val asArr = try_variant_get(v.cv.col, "$", "array<variant>")
            val compArr = filter(asArr, x =>
              !(is_variant_null(x) ||
                coalesce(try_variant_get(x, "$", "string") === "", lit(false)) ||
                coalesce(to_json(x).isin("[]", "{}"), lit(false))))
            // arrays compact to the filtered array (re-encoded through
            // JSON to stay variant-typed); maps pass through — their
            // null-valued keys already read as absent via variant_get
            out(CV(when(asArr.isNotNull, try_parse_json(to_json(compArr)))
              .otherwise(v.cv.col), VAny))
          case VArrOf(e) =>
            out(CV(filter(v.cv.col, x => x.isNotNull && coalesce(x.cast("string") =!= "", lit(true))), VArrOf(e)))
          case _ => out(v.cv)
        }
      case "merge" =>
        val l = a(0, "to")
        val r = a(1, "from")
        (l.cv.t, r.cv.t) match {
          case (VObj(fa), VObj(_)) =>
            val la = fa.keys.map(k => k -> CV(l.cv.col.getField(k), fa(k)))
            val rObj = r.cv.t.asInstanceOf[VObj]
            val ra = rObj.fields.keys.map(k => k -> CV(r.cv.col.getField(k), rObj.fields(k)))
            out(buildObj(ListMap((la ++ ra).toSeq: _*)))
          case (VAny, VAny) =>
            // shallow JSON splice: {"a":1} + {"b":2} -> {"a":1,"b":2}
            val lj = to_json(l.cv.col); val rj = to_json(r.cv.col)
            val spliced = when(rj === "{}", lj).when(lj === "{}", rj)
              .otherwise(concat(regexp_replace(lj, "\\}$", ""), lit(","),
                regexp_replace(rj, "^\\{", "")))
            out(CV(try_parse_json(spliced), VAny))
          case (x, y) => throw VrlUnsupported(s"merge of $x with $y")
        }
      case "push" =>
        val arr = a(0, "value"); val v = a(1, "item")
        arr.cv.t match {
          case VArrOf(e) if e == v.cv.t => out(CV(array_append(arr.cv.col, v.cv.col), VArrOf(e)))
          case VHet(ts) =>
            val elems = ts.zipWithIndex.map { case (t, i) => CV(arr.cv.col.getField(s"_$i"), t) }
            out(buildHet(elems :+ v.cv))
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
          case (p, q) => throw VrlUnsupported(s"append of $p with $q")
        }
      case "flatten" => throw VrlUnsupported("flatten")

      // ------------------------------------------------- control
      case "assert" =>
        val cond = boolOf(a(0, "condition").cv)
        val msg = a.litStr(1, "message").getOrElse("assertion failed")
        out(CV(lit(true), VBool), Some(!coalesce(cond, lit(false))), msg)
      case "assert_eq" =>
        val l = a(0, "left"); val r = a(1, "right")
        val msg = a.litStr(2, "message").getOrElse("assertion failed")
        val okc = VrlCompile.eq(l.cv, r.cv)
        out(CV(lit(true), VBool), Some(!coalesce(okc, lit(false))), msg)
      case "is_nullish" =>
        val v = a(0, "value")
        val col = v.cv.t match {
          case VNullT => lit(true)
          case VStr => v.cv.col.isNull || trim(v.cv.col) === "" || v.cv.col === "-"
          case VAny =>
            is_variant_null(v.cv.col) || v.cv.col.isNull ||
              coalesce(trim(try_variant_get(v.cv.col, "$", "string")).isin("", "-"), lit(false))
          case _ => v.cv.col.isNull
        }
        out(CV(col, VBool))
      case "uuid_v4" => out(CV(expr("uuid()"), VStr))
      case "uuid_v7" =>
        val h = md5(expr("uuid()").cast("binary"))
        out(CV(concat(
          h.substr(1, 8), lit("-"), h.substr(9, 4), lit("-7"),
          h.substr(14, 3), lit("-"), h.substr(17, 4), lit("-"), h.substr(21, 12)), VStr))
      case "to_syslog_facility" =>
        val code = a(0, "value").cv.col.cast("int")
        val names = Seq("kern", "user", "mail", "daemon", "auth", "syslog", "lpr",
          "news", "uucp", "cron", "authpriv", "ftp", "ntp", "security", "console",
          "solaris-cron", "local0", "local1", "local2", "local3", "local4",
          "local5", "local6", "local7")
        val r = element_at(array(names.map(lit): _*), code + 1)
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
        out(CV(to_json(graft.functions.Etld.parseEtld(v, plus)), VStr))
      case "parse_ruby_hash" =>
        out(withStrRaise(a, bang, graft.functions.Vrl.parseRubyHash))
      case "parse_user_agent" =>
        out(CV(to_json(graft.functions.UserAgent.parse(asStr(a(0, "value")))), VStr))
      case "parse_linux_authorization" =>
        val r = graft.functions.VrlParsers
          .parseLinuxAuthorization(asStr(a(0, "value")))
        out(CV(to_json(r), VStr), Some(r.isNull), "not an auth log line")
      case "strip_ansi_escape_codes" =>
        out(withStrRaise(a, bang, graft.functions.Vrl.stripAnsiEscapeCodes))
      case "shannon_entropy" =>
        out(CV(graft.functions.Vrl.shannonEntropy(asStr(a(0, "value"))), VFloat))
      case "seahash" =>
        out(CV(graft.functions.Vrl.seahash(asStr(a(0, "value"))), VInt))
      case "encode_base16" =>
        out(withStrRaise(a, bang, graft.functions.Vrl.encodeBase16))
      case "decode_base16" =>
        out(withStrRaise(a, bang, graft.functions.Vrl.decodeBase16))
      case "encode_percent" =>
        out(withStrRaise(a, bang, graft.functions.Vrl.encodePercent))
      case "decode_percent" =>
        out(withStrRaise(a, bang, graft.functions.Vrl.decodePercent))
      case "encode_punycode" =>
        out(withStrRaise(a, bang, graft.functions.Vrl.encodePunycode))
      case "decode_punycode" =>
        out(withStrRaise(a, bang, graft.functions.Vrl.decodePunycode))
      case "decode_mime_q" =>
        out(withStrRaise(a, bang, graft.functions.Vrl.decodeMimeQ))
      case "hmac" =>
        val algo = a.litStr(2, "algorithm").getOrElse("SHA-256")
        out(CV(graft.functions.Vrl.hmacBase64(asStr(a(0, "value")),
          asStr(a(1, "key")), algo), VStr))
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
        val r = graft.functions.Vrl.communityId(
          asStr(a(0, "source_ip")), asStr(a(1, "destination_ip")),
          a(2, "source_port").cv.col.cast("int"),
          a(3, "destination_port").cv.col.cast("int"),
          a(4, "protocol").cv.col.cast("int"))
        out(CV(r, VStr), Some(r.isNull), "invalid address")

      case other => throw VrlUnsupported(s"function $other")
    }
  }

  private def withStrRaise(a: Args, bang: Boolean, f: Column => Column): CV = {
    val v = a(0, "value")
    v.cv.t match {
      case VStr => CV(f(v.cv.col), VStr)
      case VAny => CV(f(try_variant_get(v.cv.col, "$", "string")), VStr)
      case _ if bang => CV(lit(null).cast("string"), VStr) // raise handled by caller type check
      case _ => CV(f(v.cv.col.cast("string")), VStr)
    }
  }

  // strip first+last character (quotes / brackets) of a token
  private def expr_substr(t: Column): Column =
    t.substr(lit(2), length(t) - 2)

  /** ANSI-safe string→long: null (a raise) instead of a cast error. */
  private def try_cast_long(c: Column): Column = {
    val s = c.cast("string")
    when(s.rlike("^[+-]?\\d+$"), s.cast("long"))
  }
}
