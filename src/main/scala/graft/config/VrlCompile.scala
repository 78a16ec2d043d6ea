package graft.config

import scala.collection.immutable.ListMap
import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import VrlAst._

/** VRL-subset → Catalyst compiler.
  *
  * A VRL program (reference: the `Program` compiled by
  * `src/transforms/remap.rs:58-135` and evaluated per event) is compiled
  * ONCE into Spark columns over the input DataFrame — evaluation is
  * ordinary whole-stage-codegen'd expression work, no per-event
  * interpreter. The compile is schema-directed: every event field has a
  * static type (`VT`) taken from the DataFrame schema or tracked through
  * the program, which is what lets VRL's dynamic typing resolve at plan
  * time.
  *
  * Error semantics follow the reference engine:
  *  - a raised runtime error (bang-function failure, null arithmetic,
  *    division by zero, failed assert) reverts the event to its
  *    unmodified input (`drop_on_error = false`) or drops it
  *    (`drop_on_error = true`) — src/transforms/remap.rs (DROPPED
  *    channel);
  *  - `ok, err = expr` captures the error: `ok` gets the "zero value"
  *    of the expression type, `err` the message (message TEXT is
  *    engine-specific here, unlike the reference's exact strings);
  *  - `expr ?? fallback` substitutes the fallback when expr raises;
  *  - `abort` reverts/drops per `drop_on_abort`.
  *
  * Dynamic JSON (`parse_json`) compiles to Spark 4 VARIANT columns;
  * heterogeneous arrays and objects compile to structs with
  * compile-time-tracked element types.
  */
object VrlCompile {

  // ------------------------------------------------------------ types
  sealed trait VT
  case object VStr extends VT
  /** Raw bytes. VRL's `string` is a byte-string (non-UTF-8 content is
    * legal; display is lossy UTF-8), but Spark's StringType is strictly
    * UTF-8 — so byte-producing functions (decode_base64, encode_gzip,
    * ip_pton, hmac, encrypt, random_bytes, …) compile to BinaryType
    * columns tracked as VBytes. String-consuming functions accept
    * VBytes via a binary→string cast; byte-consuming functions accept
    * VStr via string→binary (its UTF-8 bytes) — exactly VRL's view.
    */
  case object VBytes extends VT
  case object VInt extends VT
  case object VFloat extends VT
  case object VBool extends VT
  case object VTime extends VT
  case object VNullT extends VT
  case object VAny extends VT // VariantType-backed
  final case class VArrOf(elem: VT) extends VT // native array
  final case class VHet(elems: Seq[VT]) extends VT // struct _0.._n
  final case class VObj(fields: ListMap[String, VT]) extends VT // struct
  case object VMap extends VT // map<string,string>

  final case class CV(col: Column, t: VT)

  /** Expression result: value + optional raise predicate + message. */
  final case class XV(cv: CV, raise: Option[Column], msg: Column)
  object XV {
    def pure(cv: CV): XV = XV(cv, None, lit(null).cast("string"))
  }

  final case class EventMeta(types: ListMap[String, VT], rootT: Option[VT])
  object EventMeta {
    def fromSchema(schema: StructType): EventMeta =
      EventMeta(ListMap(schema.fields.map(f => f.name -> fromSpark(f.dataType)): _*), None)
  }

  def fromSpark(dt: DataType): VT = dt match {
    case StringType => VStr
    case BinaryType => VBytes
    case LongType | IntegerType | ShortType | ByteType => VInt
    case DoubleType | FloatType | _: DecimalType => VFloat
    case BooleanType => VBool
    case TimestampType | TimestampNTZType => VTime
    case NullType => VNullT
    case s: StructType =>
      VObj(ListMap(s.fields.map(f => f.name -> fromSpark(f.dataType)): _*))
    case ArrayType(e, _) => VArrOf(fromSpark(e))
    case MapType(StringType, _, _) => VMap
    case _: VariantType => VAny
    case other => throw VrlUnsupported(s"input column type $other")
  }

  private def sparkTypeName(t: VT): String = t match {
    case VStr => "string"
    case VBytes => "binary"
    case VInt => "bigint"
    case VFloat => "double"
    case VBool => "boolean"
    case VTime => "timestamp"
    case _ => "variant"
  }

  private def nullCV: CV = CV(lit(null), VNullT)

  private def zero(t: VT): Column = t match {
    case VStr => lit("")
    case VBytes => lit("").cast("binary")
    case VInt => lit(0L)
    case VFloat => lit(0.0)
    case VBool => lit(false)
    case _ => lit(null)
  }

  // ------------------------------------------------------------- env
  /** A driver-loaded enrichment table (reference enrichment_tables —
    * in-memory lookup data by design, lib/enrichment/src/lib.rs:51-90);
    * rows become broadcast-safe literal lookup maps at compile time.
    */
  /** `docStub`: mirror the reference's doc-example harness
    * (lib/vector-vrl/tests/src/test_enrichment.rs), whose `test` table
    * IGNORES the lookup condition — `get` always returns the first
    * row, `find` all rows (as `jsonRows`, typed values preserved).
    * Real tables (docStub = false) apply full lookup semantics.
    */
  final case class EnrichTableData(rows: Seq[ListMap[String, String]],
                                   docStub: Boolean = false,
                                   jsonRows: Seq[String] = Nil)

  final case class Env(
      fields: ListMap[String, CV],
      locals: Map[String, CV],
      root: Option[CV],
      secrets: Map[String, Column],
      raise: Option[Column],
      abort: Option[Column],
      fanout: Option[Seq[ListMap[String, CV]]],
      tables: Map[String, EnrichTableData] = Map.empty,
      unnest: Option[Seq[String]] = None,
      meanings: Map[String, String] = Map.empty,
      /** Variables bound to plan-time literals (`pat = r'\d+'`,
        * `fmt = "%+"`), tracked as raw AST for substitution into
        * function arguments that require literals. Regex bindings live
        * ONLY here (a regex has no runtime column form); scalar
        * literals live here AND in `locals`. Reassignment through
        * `setTarget` invalidates the entry.
        */
      consts: Map[String, Expr] = Map.empty,
      /** The `%` metadata root (reference event metadata). Carried in
        * frames as the reserved [[MetaKey]] column — never an event
        * field, excluded from whole-event (`.`) reads and writes.
        */
      metaRoot: Option[CV] = None,
      /** Remap transforms wrap a scalar `. = x` into `{message: x}`
        * (remap.rs output contract, behavior test
        * remap_mapped_scalars); the unit-test INPUT builder keeps the
        * scalar event as-is (unit_test/mod.rs builds the raw VRL
        * value), so it compiles with wrapScalar = false.
        */
      wrapScalar: Boolean = true) {
    def withRaise(r: Option[Column]): Env = copy(raise = orOpt(raise, r))
    def withAbort(a: Option[Column]): Env = copy(abort = orOpt(abort, a))
  }

  /** Reserved column name carrying the `%` metadata value in a frame. */
  val MetaKey = "__meta"

  private def orOpt(a: Option[Column], b: Option[Column]): Option[Column] =
    (a, b) match {
      case (None, x) => x
      case (x, None) => x
      case (Some(x), Some(y)) => Some(x || y)
    }
  private def guardOpt(cond: Column, r: Option[Column]): Option[Column] =
    r.map(x => cond && coalesce(x, lit(false)))

  /** `roots`, when set, REPLACES the per-column field bindings derived
    * from `meta` — the metric VRL view uses it to expose the flat
    * metric model the way the reference exposes a metric event to VRL
    * (`.tags` as a map, `.type`, `.timestamp`) while the stored frame
    * keeps the canonical flat columns.
    */
  def envFromDf(df: DataFrame, meta: EventMeta,
                tables: Map[String, EnrichTableData] = Map.empty,
                roots: Option[ListMap[String, CV]] = None,
                secrets: Map[String, Column] = Map.empty): Env = {
    val metaRoot = meta.types.get(MetaKey).map(t => CV(df.col(MetaKey), t))
    meta.rootT match {
      case Some(rt) =>
        Env(ListMap.empty, Map.empty, Some(CV(df.col("__root"), rt)),
          secrets, None, None, None, tables, metaRoot = metaRoot)
      case None =>
        val fields = roots.getOrElse(
          (meta.types - MetaKey).map { case (n, t) => n -> CV(df.col(s"`$n`"), t) })
        Env(fields, Map.empty, None, secrets, None, None, None, tables,
          metaRoot = metaRoot)
    }
  }

  // --------------------------------------------------- public surface
  final case class RemapOpts(dropOnError: Boolean = false,
                             dropOnAbort: Boolean = true,
                             rerouteDropped: Boolean = false)

  final case class Remapped(df: DataFrame, meta: EventMeta,
                            dropped: Option[DataFrame])

  /** Compile + apply a remap program to `df`. `passthrough` names
    * non-event columns (e.g. an arrival-order seq) carried through to
    * the output unchanged.
    */
  def remap(df: DataFrame, meta: EventMeta, program: Program,
            opts: RemapOpts = RemapOpts(),
            passthrough: Seq[String] = Nil,
            tables: Map[String, EnrichTableData] = Map.empty,
            roots: Option[ListMap[String, CV]] = None,
            wrapScalar: Boolean = true,
            secrets: Map[String, Column] = Map.empty): Remapped = {
    val env0 = envFromDf(df, meta, tables, roots, secrets).copy(wrapScalar = wrapScalar)
    val env = program.stmts.foldLeft(env0)((e, s) => compileStmt(e, s))

    val raiseC = env.raise.map(c => coalesce(c, lit(false)))
    val abortC = env.abort.map(c => coalesce(c, lit(false)))

    val dropPred = orOpt(
      if (opts.dropOnError) raiseC else None,
      if (opts.dropOnAbort) abortC else None)
    val revertPred = orOpt(
      if (!opts.dropOnError) raiseC else None,
      if (!opts.dropOnAbort) abortC else None)

    val kept = dropPred.map(p => df.filter(!coalesce(p, lit(false)))).getOrElse(df)

    val (outDf0, outMeta0) = materialize(kept, env0, env, revertPred, passthrough)
    val (outDf, outMeta) = env.unnest match {
      case Some(path) =>
        val top = path.head
        // walk to the array's type and column
        val (pathT, pathC) = path.tail.foldLeft(
          (outMeta0.types(top), outDf0.col(s"`$top`"))) {
          case ((VObj(fts), c0), seg) => (fts(seg), c0.getField(seg))
          case ((t, _), seg) => throw VrlUnsupported(s"unnest path $seg into $t")
        }
        val (arrCol, elemT) = pathT match {
          case VArrOf(e) => (pathC, e)
          case VHet(ts) =>
            // tuple array: explode the positional struct fields
            (array(ts.indices.map(i => pathC.getField(s"_$i").cast("string")): _*), VStr)
          case VAny => (try_variant_get(pathC, "$", "array<variant>"), VAny)
          case other => throw VrlUnsupported(s"unnest of $other")
        }
        // rebuild the top-level column with the exploded element spliced
        // back at the path (one explode — Spark's native generator)
        def rebuild(t: VT, c: Column, segs: Seq[String], elem: Column): (Column, VT) =
          segs match {
            case Seq() => (elem, elemT)
            case seg +: rest => t match {
              case VObj(fts) =>
                val rebuilt = fts.toSeq.map { case (k, ft) =>
                  if (k == seg) {
                    val (rc, rt) = rebuild(ft, c.getField(k), rest, elem)
                    (k, rc, rt)
                  } else (k, c.getField(k), ft)
                }
                (struct(rebuilt.map { case (k, rc, _) => rc.as(k) }: _*),
                  VObj(ListMap(rebuilt.map { case (k, _, rt) => k -> rt }: _*)))
              case other => throw VrlUnsupported(s"unnest path $seg into $other")
            }
          }
        val exploded0 = outDf0.withColumn("__unnest_elem", explode(arrCol))
        val (topC, topT) = rebuild(outMeta0.types(top),
          exploded0.col(s"`$top`"), path.tail, exploded0.col("__unnest_elem"))
        val exploded = exploded0.withColumn(top, topC).drop("__unnest_elem")
        val types = ListMap(outMeta0.types.toSeq.map { case (n, t) =>
          n -> (if (n == top) topT else t)
        }: _*)
        (exploded, EventMeta(types, None))
      case None => (outDf0, outMeta0)
    }
    val dropped =
      if (opts.rerouteDropped && dropPred.isDefined)
        Some(df.filter(coalesce(dropPred.get, lit(false))))
      else None
    Remapped(outDf, outMeta, dropped)
  }

  /** Compile a VRL condition program into a boolean Column: the value
    * of the LAST statement (matching the reference engine's program
    * result), false when the program raises or resolves null.
    */
  def condition(df: DataFrame, meta: EventMeta, program: Program,
                tables: Map[String, EnrichTableData] = Map.empty,
                roots: Option[ListMap[String, CV]] = None): Column = {
    require(program.stmts.nonEmpty, "empty condition program")
    val env0 = envFromDf(df, meta, tables, roots)
    val env1 = program.stmts.init.foldLeft(env0)((e, s) => compileStmt(e, s))
    val (value, env2) = program.stmts.last match {
      case ExprStmt(e) =>
        val (xv, envN) = compileExpr(env1, e)
        (XV(xv.cv, orOpt(envN.raise, xv.raise), xv.msg), envN)
      case other =>
        throw VrlUnsupported(s"condition ending in non-expression $other")
    }
    val bool = asBool(value.cv)
    val raised = orOpt(env2.raise, value.raise)
    raised match {
      case Some(r) => !coalesce(r, lit(false)) && coalesce(bool, lit(false))
      case None => coalesce(bool, lit(false))
    }
  }

  private def asBool(cv: CV): Column = cv.t match {
    case VBool => cv.col
    case VAny => try_variant_get(cv.col, "$", "boolean")
    case VNullT => lit(false)
    case other => throw VrlUnsupported(s"non-boolean condition of type $other")
  }

  // ------------------------------------------------------ materialize
  /** Build the output frame from the final env: new columns, with rows
    * matching `revert` restored to their input values (null where the
    * input had no such column, best-effort cast on type change).
    */
  private def materialize(df: DataFrame, env0: Env, env: Env,
                          revert: Option[Column],
                          passthrough: Seq[String] = Nil): (DataFrame, EventMeta) = {
    // `%` metadata rides along as the reserved column, never an event
    // field (whole-event reads/writes above already exclude it)
    val metaCol = env.metaRoot.map(cv => cv.col.as(MetaKey)).toSeq
    def withMeta(types: ListMap[String, VT]): ListMap[String, VT] =
      env.metaRoot.map(cv => types + (MetaKey -> cv.t)).getOrElse(types)
    val pass = passthrough.map(n => df.col(s"`$n`")) ++ metaCol
    // a whole-event replace / fan-out changes the SCHEMA. For a
    // DYNAMIC (variant) root the failing rows can still revert
    // row-conditionally — the original event blends in as its variant
    // object form (handled below). A TYPED root or a fan-out cannot
    // revert across the schema change: refuse loudly rather than emit
    // a null/garbage root for the failing rows.
    if (revert.isDefined &&
        (env.fanout.isDefined || env.root.exists(_.t != VAny)))
      throw VrlUnsupported(
        "fallible whole-event replacement without drop_on_error " +
          "(row revert cannot cross a typed schema replace)")
    env.fanout match {
      case Some(objs) =>
        // `. = [obj, obj, ...]`: each input row emits one row per object
        val keys = objs.flatMap(_.keys).distinct
        val types = ListMap(keys.map { k =>
          val ts = objs.flatMap(_.get(k).map(_.t)).distinct
          k -> (if (ts.size == 1) ts.head else VStr)
        }: _*)
        val structs = objs.map { o =>
          struct(keys.map { k =>
            val c0 = o.get(k).map(_.col).getOrElse(lit(null))
            // mixed types across objects declare VStr — cast the
            // columns to match, or the meta lies about the schema
            (if (types(k) == VStr && o.get(k).exists(_.t != VStr))
               c0.cast("string")
             else c0).as(k)
          }: _*)
        }
        val exploded = df.select(pass :+ explode(array(structs: _*)).as("__e"): _*)
        val out = exploded.select(
          (passthrough ++ env.metaRoot.map(_ => MetaKey)).map(n => col(s"`$n`")) ++
            keys.map(k => col(s"__e.`$k`").as(k)): _*)
        (out, EventMeta(withMeta(types), None))
      case None =>
        env.root match {
          case Some(rcv) =>
            // variant root + revert: failing rows carry the ORIGINAL
            // event (its variant object form) instead of a null parse
            // result — the reference's leave-unchanged error semantics
            val rootCol = revert match {
              case Some(r) if rcv.t == VAny =>
                val orig = try_parse_json(
                  VrlFunctions.jsonText(mkObj(env0.fields)))
                when(coalesce(r, lit(false)), orig).otherwise(rcv.col)
              case _ => rcv.col
            }
            (df.select(pass :+ rootCol.as("__root"): _*),
              EventMeta(withMeta(ListMap.empty), Some(rcv.t)))
          case None =>
            val cols = env.fields.map { case (n, cv) =>
              val blended = revert match {
                case None => cv.col
                case Some(r) =>
                  val orig = env0.fields.get(n) match {
                    case Some(o) if o.t == cv.t => o.col
                    case Some(o) => castTo(o, cv.t).getOrElse(lit(null))
                    case None => lit(null)
                  }
                  when(coalesce(r, lit(false)), orig).otherwise(cv.col)
              }
              env.meanings.get(n) match {
                case Some(m) => blended.as(n, new org.apache.spark.sql.types.MetadataBuilder()
                  .putString("semantic_meaning", m).build())
                case None => blended.as(n)
              }
            }.toSeq
            val types = env.fields.map { case (n, cv) => n -> cv.t }
            (df.select(pass ++ cols: _*), EventMeta(withMeta(types), None))
        }
    }
  }

  private def castTo(cv: CV, t: VT): Option[Column] = (cv.t, t) match {
    case (a, b) if a == b => Some(cv.col)
    case (VInt, VFloat) => Some(cv.col.cast("double"))
    case (VFloat, VInt) => Some(cv.col.cast("bigint"))
    case (VStr, VBytes) => Some(cv.col.cast("binary")) // UTF-8 bytes
    case (_, VStr) if scalar(cv.t) => Some(cv.col.cast("string"))
    case _ => None
  }
  private def scalar(t: VT): Boolean = t match {
    case VStr | VBytes | VInt | VFloat | VBool | VTime | VNullT => true
    case _ => false
  }

  // -------------------------------------------------------- statements
  private def compileStmt(env: Env, stmt: Stmt): Env = stmt match {
    case _ if env.unnest.isDefined =>
      throw VrlUnsupported("statement after unnest (unnest must be last)")

    case AbortStmt(_) => env.withAbort(Some(lit(true)))

    // `. = unnest!(.field)` (unnest.cue): one output event per array
    // element, all other fields duplicated — compiles to a single
    // `explode`, Spark's native generator (no shuffle, stays columnar).
    // Supported as the program's FINAL statement over a top-level field.
    case Assign(TWhole, _, c: Call) if c.name == "unnest" =>
      val path = c.args.headOption match {
        case Some(FieldRef(segs)) if segs.nonEmpty &&
          segs.forall(_.isInstanceOf[SegName]) =>
          segs.collect { case SegName(n) => n }
        case _ => throw VrlUnsupported("unnest of a non-field path")
      }
      resolve(env, path.map(SegName)).t match {
        case VArrOf(_) | VHet(_) | VAny => env.copy(unnest = Some(path))
        case other => throw VrlUnsupported(s"unnest of non-array field ($other)")
      }

    case Assign(TWhole, errTgt, expr) =>
      val (xv, env1) = compileExpr(env, expr)
      // `., err = expr`: reference VRL binds err and leaves the event
      // unchanged when expr errors on a row. A whole-event replace
      // changes the SCHEMA, which cannot be row-conditional in
      // columnar form, so the capture is supported only for
      // infallible expressions (err bound to null after the replace);
      // a fallible whole-event replace with capture raises
      // VrlUnsupported rather than silently discarding the capture
      // and dropping/reverting the event as if it were unhandled.
      if (errTgt.isDefined && xv.raise.isDefined)
        throw VrlUnsupported(
          "error capture on a fallible whole-event replacement")
      val env2 = env1.withRaise(xv.raise)
      val replaced = expr match {
        case ArrLit(items) if items.nonEmpty && items.forall(_.isInstanceOf[ObjLit]) =>
          val objs = items.collect { case o: ObjLit => // total: forall guard above
            ListMap(o.fields.map { case (k, v) =>
              k -> compileExpr(env1, v)._1.cv
            }: _*)
          }
          env2.copy(fanout = Some(objs))
        case _ =>
          xv.cv.t match {
            case VObj(fts) =>
              val fields = ListMap(fts.keys.map { k =>
                k -> CV(xv.cv.col.getField(k), fts(k))
              }.toSeq: _*)
              env2.copy(fields = fields, root = None, fanout = None)
            case VAny | VMap =>
              env2.copy(fields = ListMap.empty, root = Some(xv.cv), fanout = None)
            case _ if env2.wrapScalar =>
              env2.copy(fields = ListMap("message" -> xv.cv), root = None, fanout = None)
            case _ =>
              env2.copy(fields = ListMap.empty, root = Some(xv.cv), fanout = None)
          }
      }
      errTgt match {
        case None => replaced
        case Some(et) =>
          setTarget(replaced, et, CV(lit(null).cast("string"), VStr))
      }

    case Assign(TLocal(n), None, r @ LitRegex(_)) =>
      // plan-time regex binding: usable wherever a literal regex
      // argument is required (match/split/replace/parse_regex …);
      // regexes have no runtime column form, so no `locals` entry
      env.copy(consts = env.consts + (n -> r), locals = env.locals - n)

    case Assign(tgt, errTgt, expr) =>
      val (xv, env1) = compileExpr(env, expr)
      // scalar-literal locals are ALSO tracked as consts (usable where
      // a literal argument is required, e.g. a timestamp format)
      val constAdd: Map[String, Expr] = (tgt, errTgt, expr) match {
        case (TLocal(n), None, e @ (LitS(_) | LitI(_) | LitF(_) | LitB(_))) =>
          Map(n -> e)
        case _ => Map.empty
      }
      errTgt match {
        case None =>
          val set = setTarget(env1.withRaise(xv.raise), tgt, xv.cv)
          if (constAdd.isEmpty) set else set.copy(consts = set.consts ++ constAdd)
        case Some(et) =>
          val okCv = xv.raise match {
            case None => xv.cv
            case Some(r) =>
              CV(when(coalesce(r, lit(false)), zero(xv.cv.t)).otherwise(xv.cv.col), xv.cv.t)
          }
          val errCv = xv.raise match {
            case None => CV(lit(null).cast("string"), VStr)
            case Some(r) =>
              CV(when(coalesce(r, lit(false)), xv.msg).otherwise(lit(null).cast("string")), VStr)
          }
          setTarget(setTarget(env1, tgt, okCv), et, errCv)
      }

    case ExprStmt(e) =>
      val (xv, env1) = compileExpr(env, e)
      env1.withRaise(xv.raise)
  }

  private def setTarget(env: Env, t: Target, cv: CV): Env = t match {
    // reassignment invalidates any plan-time const binding of the name
    case TLocal(n) => env.copy(locals = env.locals + (n -> cv),
      consts = env.consts - n)
    case TWhole => throw VrlUnsupported("whole-event target in this position")
    case TMeta => env.copy(metaRoot = Some(cv))
    case TField(path) =>
      // a DYNAMIC (variant/map) root can't take field assignment — the
      // sibling keys aren't enumerable at plan time; a SCALAR root can:
      // VRL coerces the event to an object, discarding the scalar
      // (reference path assignment on a non-object root)
      val base = env.root.map(_.t) match {
        case Some(VAny) | Some(VMap) =>
          throw VrlUnsupported("field assignment after whole-event dynamic replace")
        case Some(_) => env.copy(root = None, fields = ListMap.empty)
        case None => env
      }
      path.head match {
        case SegIndex(_) => throw VrlUnsupported("index at path root")
        case SegName(top) =>
          val updated = setIn(base.fields.get(top), path.tail, cv)
          base.copy(fields = base.fields + (top -> updated))
      }
  }

  /** Functional nested update — rebuilds the struct/het tree.
    *
    * Base-value semantics mirror reference VRL path insertion: a
    * scalar / null / type-mismatched base is REPLACED by a fresh
    * object (or array, for an index segment) — VRL overwrites
    * non-containers on insert — while a container base keeps its
    * siblings: typed structs and tuples are rebuilt field-by-field,
    * map<string,string> is updated in place (map_filter +
    * map_concat), and a native array gets an in-place element
    * overwrite with VRL's null-padding up to the index. A VARIANT base
    * (parse_json! / parse_key_value! without a schema) routes the
    * whole remaining path through the Jackson path-set kernel
    * (StringExpressions.JsonPathSet) — a functional rebuild of the
    * JSON tree that preserves every sibling, exactly VRL's own `set`.
    */
  private def setIn(base: Option[CV], segs: Seq[PathSeg], v: CV): CV =
    if (segs.isEmpty) v
    else base match {
      case Some(CV(c, VAny)) =>
        val path = segs.map {
          case SegName(n) => Left(n)
          case SegIndex(i) => Right(i)
        }
        CV(try_parse_json(org.apache.spark.sql.graftvec.StringExpressions
          .jsonPathSet(to_json(c), VrlFunctions.jsonText(v), path)), VAny)
      case _ => segs.head match {
      case SegName(n) =>
        base match {
          case Some(CV(c, VMap)) =>
            if (segs.tail.nonEmpty)
              throw VrlUnsupported(
                "nested path assignment through a map<string,string> value")
            val vs = castTo(v, VStr).getOrElse(throw VrlUnsupported(
              s"map<string,string> entry assignment from ${v.t}"))
            val baseMap = coalesce(c, typedLit(Map.empty[String, String]))
            CV(map_concat(
                 map_filter(baseMap, (k, _) => k =!= lit(n)),
                 map_from_arrays(array(lit(n)), array(vs))),
               VMap)
          case _ =>
            val fields = base match {
              case Some(CV(c, VObj(fts))) =>
                ListMap(fts.keys.map(k => k -> CV(c.getField(k), fts(k))).toSeq: _*)
              case _ => ListMap.empty[String, CV]
            }
            mkObj(fields + (n -> setIn(fields.get(n), segs.tail, v)))
        }
      case SegIndex(i) =>
        base match {
          case Some(CV(c, VArrOf(et))) =>
            if (segs.tail.nonEmpty)
              throw VrlUnsupported(
                "nested path assignment through a native array element")
            val ve = castTo(v, et).orElse(
              if (v.t == VNullT) Some(lit(null).cast(sparkTypeName(et))) else None
            ).getOrElse(throw VrlUnsupported(
              s"array<$et> element assignment from ${v.t}"))
            val baseArr = coalesce(c, array().cast(s"array<${sparkTypeName(et)}>"))
            val padded = concat(baseArr, array_repeat(
              lit(null).cast(sparkTypeName(et)),
              greatest(lit(0), lit(i + 1) - size(baseArr))))
            CV(transform(padded, (x, j) => when(j === lit(i), ve).otherwise(x)),
               VArrOf(et))
          case _ =>
            val elems: Vector[CV] = base match {
              case Some(CV(c, VHet(ts))) =>
                ts.zipWithIndex.map { case (t, j) => CV(c.getField(s"_$j"), t) }.toVector
              case _ => Vector.empty
            }
            val padded =
              if (i < elems.length) elems
              else elems ++ Vector.fill(i + 1 - elems.length)(nullCV)
            val existing = if (i < elems.length) Some(elems(i)) else None
            mkHet(padded.updated(i, setIn(existing, segs.tail, v)))
        }
      }
    }

  private def mkObj(fields: ListMap[String, CV]): CV =
    if (fields.isEmpty) CV(lit(null), VObj(ListMap.empty))
    else CV(struct(fields.map { case (n, cv) => cv.col.as(n) }.toSeq: _*),
      VObj(fields.map { case (n, cv) => n -> cv.t }))

  private def mkHet(elems: Seq[CV]): CV =
    CV(struct(elems.zipWithIndex.map { case (cv, i) => cv.col.as(s"_$i") }: _*),
      VHet(elems.map(_.t)))

  // ------------------------------------------------------- resolution
  private def resolve(env: Env, path: Seq[PathSeg]): CV = env.root match {
    case Some(rcv) => walkDynamic(rcv, path)
    case None =>
      // whole-event read `.`: the event as one object value (static
      // schema → struct of the current fields)
      if (path.isEmpty) return mkObj(env.fields)
      path.head match {
        case SegIndex(_) => throw VrlUnsupported("index at path root")
        case SegName(top) =>
          env.fields.get(top) match {
            case None => nullCV
            case Some(cv) => path.tail.foldLeft(cv)(walk)
          }
      }
  }

  private def walk(cv: CV, seg: PathSeg): CV = (cv.t, seg) match {
    case (VObj(fts), SegName(n)) =>
      fts.get(n).map(t => CV(cv.col.getField(n), t)).getOrElse(nullCV)
    case (VHet(ts), SegIndex(i)) =>
      if (i < ts.length) CV(cv.col.getField(s"_$i"), ts(i)) else nullCV
    case (VArrOf(e), SegIndex(i)) => CV(get(cv.col, lit(i)), e)
    // try_element_at, not element_at: under ANSI mode (Spark 4 default)
    // a missing map key must resolve null per row — VRL path semantics —
    // not throw MAP_KEY_DOES_NOT_EXIST for the whole batch
    case (VMap, SegName(n)) => CV(try_element_at(cv.col, lit(n)), VStr)
    case (VAny, _) => walkDynamic(cv, Seq(seg))
    case (VNullT, _) => nullCV
    case (t, s) => throw VrlUnsupported(s"path step $s into $t")
  }

  private def walkDynamic(cv: CV, path: Seq[PathSeg]): CV = cv.t match {
    // bare `.` read: the root value itself, whatever its type (a
    // SCALAR root arises from the unit-test input builder's unwrapped
    // `. = "x"` programs)
    case _ if path.isEmpty => cv
    case VAny =>
      val p = "$" + path.map {
        case SegName(n) => s"['${n.replace("'", "\\'")}']"
        case SegIndex(i) => s"[$i]"
      }.mkString
      CV(try_variant_get(cv.col, p, "variant"), VAny)
    case VMap =>
      path match {
        case Seq(SegName(n)) => CV(try_element_at(cv.col, lit(n)), VStr)
        case _ => throw VrlUnsupported(s"path $path into map event")
      }
    case t => throw VrlUnsupported(s"dynamic path into $t")
  }

  private def removePath(env: Env, path: Seq[PathSeg]): Env = path.head match {
    case SegIndex(_) => throw VrlUnsupported("del of array index")
    case SegName(top) =>
      if (path.tail.isEmpty) env.copy(fields = env.fields - top)
      else env.fields.get(top) match {
        case Some(CV(c, VObj(fts))) if path.tail.forall(_.isInstanceOf[SegName]) =>
          val names = path.tail.map { case SegName(n) => n; case _ => "" }
          def rm(c0: Column, fts0: ListMap[String, VT], ns: Seq[String]): CV = {
            val fields = ListMap(fts0.keys.map(k => k -> CV(c0.getField(k), fts0(k))).toSeq: _*)
            if (ns.tail.isEmpty) mkObj(fields - ns.head)
            else fields.get(ns.head) match {
              case Some(CV(cc, VObj(ff))) => mkObj(fields + (ns.head -> rm(cc, ff, ns.tail)))
              case _ => mkObj(fields)
            }
          }
          env.copy(fields = env.fields + (top -> rm(c, fts, names)))
        case _ => env
      }
  }

  // ------------------------------------------------------ expressions
  private val tmplRe = """\{\{\s*(\.?[A-Za-z_][\w.]*)\s*\}\}""".r

  private[config] def compileExpr(env: Env, e: Expr): (XV, Env) = e match {
    case LitS(s) if tmplRe.findFirstIn(s).isDefined =>
      // VRL template strings: "{{ name }}" interpolates a local (or a
      // .field path) — replace_with.cue's named-capture example builds
      // its replacement this way
      val parts = mutable.ArrayBuffer.empty[Column]
      var last = 0
      tmplRe.findAllMatchIn(s).foreach { m =>
        if (m.start > last) parts += lit(s.substring(last, m.start))
        val name = m.group(1)
        val cv =
          if (name.startsWith("."))
            resolve(env, name.stripPrefix(".").split('.').toSeq.map(SegName))
          else env.locals.getOrElse(name,
            throw VrlUnsupported(s"template variable $name undefined"))
        parts += cv.col.cast("string")
        last = m.end
      }
      if (last < s.length) parts += lit(s.substring(last))
      (XV.pure(CV(concat(parts.toSeq: _*), VStr)), env)
    case LitS(s) => (XV.pure(CV(lit(s), VStr)), env)
    case LitI(n) => (XV.pure(CV(lit(n), VInt)), env)
    case LitF(d) => (XV.pure(CV(lit(d), VFloat)), env)
    case LitB(b) => (XV.pure(CV(lit(b), VBool)), env)
    case LitNull => (XV.pure(nullCV), env)
    // regex VALUE position: carried as its pattern string (the same
    // convention regex function arguments and array elements use)
    case LitRegex(p) => (XV.pure(CV(lit(p), VStr)), env)
    case LitTs(s) =>
      // VRL's t'…' grammar is RFC 3339 only (zone-less / bare-date
      // forms are compile errors in the reference too). Compiling the
      // parsed Instant — not a string cast — keeps the value exact
      // under any spark.sql.session.timeZone.
      val inst = try java.time.OffsetDateTime.parse(s).toInstant
      catch { case _: Exception =>
        throw VrlUnsupported(s"invalid timestamp literal t'$s' (RFC 3339 required)")
      }
      (XV.pure(CV(lit(inst), VTime)), env)
    case FieldRef(path) => (XV.pure(resolve(env, path)), env)
    case MetaRef =>
      // unset metadata reads as null (reference: empty metadata object
      // resolves null for value reads)
      (XV.pure(env.metaRoot.getOrElse(CV(lit(null).cast("string"), VNullT))), env)
    case LocalRef(n) =>
      env.locals.get(n) match {
        case Some(cv) => (XV.pure(cv), env)
        case None if env.consts.contains(n) =>
          // a regex-bound variable read outside a function argument —
          // regexes have no runtime column form
          throw VrlUnsupported(s"regex variable $n outside function argument")
        case None => throw VrlUnsupported(s"undefined variable $n")
      }
    case PathOn(base, path) =>
      val (xv, e2) = compileExpr(env, base)
      (XV(path.foldLeft(xv.cv)(walk), xv.raise, xv.msg), e2)
    case ArrLit(items) =>
      var e2 = env
      // regex VALUES are carried as their pattern strings (same
      // convention as regex function arguments)
      val cvs = items.map(_ match {
        case LitRegex(p) => LitS(p); case x => x
      }).map { it =>
        val (xv, en) = compileExpr(e2, it); e2 = en.withRaise(xv.raise); xv.cv
      }
      val ts = cvs.map(_.t).distinct
      if (ts.size == 1 && scalar(ts.head) && ts.head != VNullT)
        (XV.pure(CV(array(cvs.map(_.col): _*), VArrOf(ts.head))), e2)
      else (XV.pure(mkHet(cvs)), e2)
    case ObjLit(fields) =>
      var e2 = env
      val cvs = fields.map {
        case (k, LitRegex(p)) => k -> LitS(p) // pattern-string convention
        case kv => kv
      }.map { case (k, v) =>
        val (xv, en) = compileExpr(e2, v); e2 = en.withRaise(xv.raise); k -> xv.cv
      }
      (XV.pure(mkObj(ListMap(cvs: _*))), e2)
    case Un("!", x) =>
      val (xv, e2) = compileExpr(env, x)
      (XV(CV(!coalesce(asBool(xv.cv), lit(false)), VBool), xv.raise, xv.msg), e2)
    case Un("-", x) =>
      val (xv, e2) = compileExpr(env, x)
      (XV(CV(-xv.cv.col, xv.cv.t), xv.raise, xv.msg), e2)
    case Un(op, _) => throw VrlUnsupported(s"unary $op")
    case Coalesce(l, r) =>
      val (lx, e2) = compileExpr(env, l)
      val (rx, e3) = compileExpr(e2, r)
      lx.raise match {
        case None => (lx, e3)
        case Some(lr) =>
          val (la, ra, t) = unify(lx.cv, rx.cv)
          val v = when(coalesce(lr, lit(false)), ra).otherwise(la)
          val raise = rx.raise.map(rr => coalesce(lr, lit(false)) && coalesce(rr, lit(false)))
          (XV(CV(v, t), raise, rx.msg), e3)
      }
    case Bin(op, l, r) => compileBin(env, op, l, r)
    case IfE(cond, thenB, elseB) => compileIf(env, cond, thenB, elseB)
    case Block(stmts) =>
      // expression-position block: value of last statement — a VRL
      // assignment is itself an expression yielding the assigned value
      val envN = stmts.init.foldLeft(env)((e0, s) => compileStmt(e0, s))
      stmts.last match {
        case ExprStmt(x) => compileExpr(envN, x)
        case s @ Assign(tgt, _, _) =>
          val env2 = compileStmt(envN, s)
          val value = tgt match {
            case TField(path) => resolve(env2, path)
            case TLocal(n) => env2.locals.getOrElse(n, nullCV)
            case _ => nullCV
          }
          (XV.pure(value), env2)
        case s => (XV.pure(nullCV), compileStmt(envN, s))
      }
    case c: Call => VrlFunctions.call(env, c)
  }

  private def unify(a: CV, b: CV): (Column, Column, VT) = (a.t, b.t) match {
    case (x, y) if x == y => (a.col, b.col, x)
    case (VInt, VFloat) | (VFloat, VInt) =>
      (a.col.cast("double"), b.col.cast("double"), VFloat)
    // VRL strings ARE byte-strings: a branch mixing the two unifies on
    // the byte form (lossless; string display happens at render)
    case (VStr, VBytes) => (a.col.cast("binary"), b.col, VBytes)
    case (VBytes, VStr) => (a.col, b.col.cast("binary"), VBytes)
    case (VNullT, y) => (lit(null), b.col, y)
    case (x, VNullT) => (a.col, lit(null), x)
    case (VAny, y) if scalar(y) => (a.col, toVariant(b), VAny)
    case (x, VAny) if scalar(x) => (toVariant(a), b.col, VAny)
    case (x, y) => throw VrlUnsupported(s"cannot unify $x with $y")
  }

  private[config] def toVariant(cv: CV): Column =
    try_variant_get(parse_json(to_json(struct(cv.col.as("v")))), "$['v']", "variant")

  // -------------------------------------------------------- operators
  private def compileBin(env: Env, op: String, l: Expr, r: Expr): (XV, Env) = {
    val (lx, e2) = compileExpr(env, l)
    val (rx, e3) = compileExpr(e2, r)
    val prop = orOpt(lx.raise, rx.raise)
    def msg(m: String) = lit(m)

    op match {
      case "==" => (XV(CV(eq(lx.cv, rx.cv), VBool), prop, lx.msg), e3)
      case "!=" => (XV(CV(!eq(lx.cv, rx.cv), VBool), prop, lx.msg), e3)
      case "&&" =>
        (XV(CV(coalesce(asBool(lx.cv), lit(false)) && coalesce(asBool(rx.cv), lit(false)), VBool),
          prop, lx.msg), e3)
      case "||" =>
        (XV(CV(coalesce(asBool(lx.cv), lit(false)) || coalesce(asBool(rx.cv), lit(false)), VBool),
          prop, lx.msg), e3)
      case "<" | "<=" | ">" | ">=" =>
        val (la, ra, _) = unify(num(lx.cv), num(rx.cv))
        val v = op match {
          case "<" => la < ra; case "<=" => la <= ra
          case ">" => la > ra; case _ => la >= ra
        }
        val nullRaise = Some(la.isNull || ra.isNull)
        (XV(CV(v, VBool), orOpt(prop, nullRaise), msg("comparison on null")), e3)
      case "+" if (lx.cv.t == VBytes || rx.cv.t == VBytes) &&
          Seq(lx.cv.t, rx.cv.t).forall(t => t == VStr || t == VBytes) =>
        // byte-string concatenation (VRL strings are bytes)
        val lb = if (lx.cv.t == VBytes) lx.cv.col else lx.cv.col.cast("binary")
        val rb = if (rx.cv.t == VBytes) rx.cv.col else rx.cv.col.cast("binary")
        val bRaise = Some(lb.isNull || rb.isNull)
        (XV(CV(concat(lb, rb), VBytes), orOpt(prop, bRaise),
          msg("string concatenation on null")), e3)
      case "+" if lx.cv.t == VStr || rx.cv.t == VStr =>
        val strRaise = Some(lx.cv.col.isNull || rx.cv.col.isNull ||
          lit(lx.cv.t != VStr || rx.cv.t != VStr))
        (XV(CV(concat(lx.cv.col, rx.cv.col), VStr), orOpt(prop, strRaise),
          msg("string concatenation on non-string")), e3)
      case "+" | "-" | "*" | "%" =>
        val la = num(lx.cv); val ra = num(rx.cv)
        val t = if (lx.cv.t == VFloat || rx.cv.t == VFloat) VFloat else VInt
        val (lc, rc) =
          if (t == VFloat) (la.col.cast("double"), ra.col.cast("double"))
          else (la.col, ra.col)
        val v = op match {
          case "+" => lc + rc; case "-" => lc - rc
          case "*" => lc * rc
          // `% 0` raises in VRL ("can't divide by zero") — guard the
          // evaluation too: under ANSI mode an integer `x % 0` throws
          // for the whole batch, and the float path would yield NaN
          // without ever tripping the raise (CaseWhen evaluates the
          // otherwise branch lazily, so the guarded rows never run %)
          case _ => when(rc === 0, lit(null)).otherwise(lc % rc)
        }
        val nullRaise =
          if (op == "%") Some(lc.isNull || rc.isNull || rc === 0)
          else Some(lc.isNull || rc.isNull)
        (XV(CV(v, t), orOpt(prop, nullRaise),
          msg(if (op == "%") "arithmetic on null or modulo by zero"
              else "arithmetic on null")), e3)
      case "/" =>
        val la = num(lx.cv).col.cast("double")
        val ra = num(rx.cv).col.cast("double")
        val divRaise = Some(la.isNull || ra.isNull || ra === 0.0)
        (XV(CV(la / ra, VFloat), orOpt(prop, divRaise), msg("division by zero")), e3)
      case other => throw VrlUnsupported(s"operator $other")
    }
  }

  private def num(cv: CV): CV = cv.t match {
    case VInt | VFloat => cv
    case VAny => CV(try_variant_get(cv.col, "$", "double"), VFloat)
    case VNullT => CV(lit(null).cast("double"), VFloat)
    case t => throw VrlUnsupported(s"arithmetic on $t")
  }

  /** VRL equality: null-safe, type-strict across scalars, structural
    * for objects/arrays, numeric across int/float.
    */
  private[config] def eq(a: CV, b: CV): Column = (a.t, b.t) match {
    case (VNullT, _) => b.col.isNull
    case (_, VNullT) => a.col.isNull
    case (x, y) if x == y && scalar(x) => a.col <=> b.col
    case (VInt, VFloat) | (VFloat, VInt) =>
      a.col.cast("double") <=> b.col.cast("double")
    case (VStr, VBytes) => a.col.cast("binary") <=> b.col
    case (VBytes, VStr) => a.col <=> b.col.cast("binary")
    case (VAny, y) if scalar(y) =>
      try_variant_get(a.col, "$", sparkTypeName(y)) <=> b.col
    case (x, VAny) if scalar(x) => eq(b, a)
    case (VObj(fa), VObj(fb)) =>
      if (fa.keySet != fb.keySet) lit(false)
      else if (fa.isEmpty) a.col.isNotNull && b.col.isNotNull
      else fa.keys.map { k =>
        eq(CV(a.col.getField(k), fa(k)), CV(b.col.getField(k), fb(k)))
      }.reduce(_ && _)
    case (VHet(ta), VHet(tb)) =>
      if (ta.length != tb.length) lit(false)
      else if (ta.isEmpty) lit(true)
      else ta.indices.map { i =>
        eq(CV(a.col.getField(s"_$i"), ta(i)), CV(b.col.getField(s"_$i"), tb(i)))
      }.reduce(_ && _)
    case (VArrOf(ea), VHet(tb)) =>
      val sizeOk = size(a.col) === tb.length
      if (tb.isEmpty) sizeOk
      else sizeOk && tb.indices.map { i =>
        eq(CV(get(a.col, lit(i)), ea), CV(b.col.getField(s"_$i"), tb(i)))
      }.reduce(_ && _)
    case (VHet(_), VArrOf(_)) => eq(b, a)
    case (VArrOf(x), VArrOf(y)) if x == y => a.col <=> b.col
    case (VAny, VArrOf(_)) =>
      // variant vs native array: cast the variant to the array's Spark
      // type (elementwise; null on shape mismatch) and compare —
      // defined only down to scalar leaves (variant leaves have no
      // comparable Spark form)
      def arrTn(t: VT): Option[String] = t match {
        case VArrOf(e) => arrTn(e).map(x => s"array<$x>")
        case VStr | VBytes | VInt | VFloat | VBool | VTime =>
          Some(sparkTypeName(t))
        case _ => None
      }
      arrTn(b.t)
        .map(tn => try_variant_get(a.col, "$", tn) <=> b.col)
        .getOrElse(lit(false))
    case (VArrOf(_), VAny) => eq(b, a)
    case (VAny, VObj(_)) | (VObj(_), VAny) | (VAny, VHet(_)) | (VHet(_), VAny) =>
      val (av, bv) = if (a.t == VAny) (a, b) else (b, a)
      bv.t match {
        // an empty literal ({} / []) has no keys to probe — compare
        // the variant's canonical JSON form instead of defaulting false
        case VObj(fb) =>
          if (fb.isEmpty) coalesce(to_json(av.col) === "{}", lit(false))
          else fb.keys.map { k =>
            eq(walkDynamic(av, Seq(SegName(k))), CV(bv.col.getField(k), fb(k)))
          }.reduce(_ && _)
        case VHet(tb) =>
          if (tb.isEmpty) coalesce(to_json(av.col) === "[]", lit(false))
          else {
            // element-wise probe alone would accept a LONGER variant
            // array whose prefix matches — arrays are equal only at
            // equal length
            val sizeOk = coalesce(
              size(try_variant_get(av.col, "$", "array<variant>")) === tb.length,
              lit(false))
            sizeOk && tb.indices.map { i =>
              eq(walkDynamic(av, Seq(SegIndex(i))), CV(bv.col.getField(s"_$i"), tb(i)))
            }.reduce(_ && _)
          }
        case _ => lit(false)
      }
    case (VMap, VObj(fb)) =>
      if (fb.isEmpty) size(a.col) === 0
      else (size(a.col) === fb.size) && fb.keys.map { k =>
        // try_element_at: a map missing key k must compare unequal, not
        // throw MAP_KEY_DOES_NOT_EXIST under ANSI mode
        eq(CV(try_element_at(a.col, lit(k)), VStr), CV(b.col.getField(k), fb(k)))
      }.reduce(_ && _)
    case (VObj(_), VMap) => eq(b, a)
    case _ => lit(false)
  }

  // -------------------------------------------------------------- if
  private def compileIf(env: Env, cond: Expr, thenB: Block,
                        elseB: Option[Block]): (XV, Env) = {
    val (cx, envC) = compileExpr(env, cond)
    val c = coalesce(asBool(cx.cv), lit(false))
    val base = envC.withRaise(cx.raise)

    val cleared = base.copy(raise = None, abort = None)
    val (tv, tEnv) = compileExpr(cleared, thenB)
    val (ev, eEnv) = elseB match {
      case Some(b) => compileExpr(cleared, b)
      case None => (XV.pure(nullCV), cleared)
    }

    // merge branch deltas under the branch guard
    val mergedFields = mergeMaps(base.fields, tEnv.fields, eEnv.fields, c)
    val mergedLocals = mergeMaps(
      ListMap(base.locals.toSeq: _*),
      ListMap(tEnv.locals.toSeq: _*),
      ListMap(eEnv.locals.toSeq: _*), c)
    // the branches' raises travel on the VALUE, not the env: the
    // assignment machinery then gives `v, err = if …` its capture and
    // `(if …) ?? x` its fallback, while an uncaptured use merges them
    // back into the env via withRaise — the same program-level total
    val branchRaise = orOpt(
      guardOpt(c, orOpt(tEnv.raise, tv.raise)),
      guardOpt(!c, orOpt(eEnv.raise, ev.raise)))
    val mergedAbort = orOpt(orOpt(base.abort,
      guardOpt(c, tEnv.abort)), guardOpt(!c, eEnv.abort))

    // a whole-event replace / metadata write is a SCHEMA-level effect;
    // root/fanout cannot be row-conditional, and a silently-dropped
    // branch mutation would corrupt — refuse loudly
    if (tEnv.root != base.root || eEnv.root != base.root ||
        tEnv.fanout != base.fanout || eEnv.fanout != base.fanout)
      throw VrlUnsupported("whole-event replacement inside an if branch")
    val mergedMeta = (tEnv.metaRoot, eEnv.metaRoot) match {
      case (t, e) if t == e => t
      case (t, e) =>
        val tc = t.getOrElse(nullCV); val ec = e.getOrElse(nullCV)
        Some(mergeCV(c, tc, ec))
    }
    // secrets merge under the guard too — an else-branch set_secret
    // must not apply to then-rows
    val mergedSecrets = {
      val keys = (base.secrets.keys ++ tEnv.secrets.keys ++
        eEnv.secrets.keys).toSeq.distinct
      keys.flatMap { k =>
        val tb = tEnv.secrets.get(k); val eb = eEnv.secrets.get(k)
        (tb, eb) match {
          case (None, None) => None
          case (a, b) if a == b => a.map(k -> _)
          case _ => Some(k -> when(c, tb.getOrElse(lit(null).cast("string")))
            .otherwise(eb.getOrElse(lit(null).cast("string"))))
        }
      }.toMap
    }

    // a const survives the if only when NEITHER branch rebound it —
    // conditional rebinding has no single plan-time value
    val mergedConsts = base.consts.filter { case (k, v) =>
      tEnv.consts.get(k).contains(v) && eEnv.consts.get(k).contains(v)
    }
    val outEnv = base.copy(fields = mergedFields, locals = mergedLocals.toMap,
      raise = base.raise, abort = mergedAbort,
      secrets = mergedSecrets, consts = mergedConsts,
      metaRoot = mergedMeta)
    val msg = when(c, tv.msg).otherwise(ev.msg)
    val value =
      if (tv.cv.t == VNullT && ev.cv.t == VNullT)
        XV(nullCV, branchRaise, msg)
      else {
        val (ta, ea, t) = unify(tv.cv, ev.cv)
        XV(CV(when(c, ta).otherwise(ea), t), branchRaise, msg)
      }
    (value, outEnv)
  }

  /** Branch maps are COMPLETE post-branch states (each branch compiled
    * from a copy of the base env), so a key absent from one branch was
    * DELETED there: the merge must produce null on that branch's rows,
    * never resurrect the base value (`if c { del(.password) }` has to
    * scrub the then-rows). A key absent from both branches drops from
    * the output entirely.
    */
  private def mergeMaps(base: ListMap[String, CV], t: ListMap[String, CV],
                        e: ListMap[String, CV], c: Column): ListMap[String, CV] = {
    val keys = (base.keys ++ t.keys ++ e.keys).toSeq.distinct
    ListMap(keys.flatMap { k =>
      (t.get(k), e.get(k)) match {
        case (None, None) => None
        case (tb, eb) if tb == eb => tb.map(k -> _)
        case (tb, eb) =>
          Some(k -> mergeCV(c, tb.getOrElse(nullCV), eb.getOrElse(nullCV)))
      }
    }: _*)
  }

  private def mergeCV(c: Column, a: CV, b: CV): CV = (a.t, b.t) match {
    case (x, y) if x == y => CV(when(c, a.col).otherwise(b.col), x)
    case (VNullT, y) => CV(when(c, lit(null)).otherwise(b.col), y)
    case (x, VNullT) => CV(when(c, a.col).otherwise(lit(null)), x)
    case _ =>
      val (aa, bb, t) = unify(a, b)
      CV(when(c, aa).otherwise(bb), t)
  }

  // internal hooks for VrlFunctions
  private[config] def resolveField(env: Env, path: Seq[PathSeg]): CV = resolve(env, path)
  private[config] def removeField(env: Env, path: Seq[PathSeg]): Env = removePath(env, path)
  private[config] def nullValue: CV = nullCV
  private[config] def zeroOf(t: VT): Column = zero(t)
  private[config] def isScalar(t: VT): Boolean = scalar(t)
  private[config] def buildObj(fields: ListMap[String, CV]): CV = mkObj(fields)
  private[config] def buildHet(elems: Seq[CV]): CV = mkHet(elems)
  private[config] def typeName(t: VT): String = sparkTypeName(t)
  private[config] def dynWalk(cv: CV, segs: Seq[PathSeg]): CV = walkDynamic(cv, segs)
  private[config] def walkStep(cv: CV, seg: PathSeg): CV = walk(cv, seg)
  private[config] def boolOf(cv: CV): Column = asBool(cv)
}
