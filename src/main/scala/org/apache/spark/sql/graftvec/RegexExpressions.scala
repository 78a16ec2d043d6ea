package org.apache.spark.sql.graftvec

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass regex group extraction.
  *
  * `RegexGroups(text, pattern)` runs the pattern ONCE per row and returns
  * ALL capture groups as `array<string>` (null when the pattern does not
  * match; a non-participating optional group yields "" exactly like
  * `regexp_extract`). Field accessors become `element_at(groups, i)`.
  *
  * Why this exists: a k-field grok/regex parse written as k
  * `regexp_extract(text, pat, i)` calls runs the SAME regex k times per
  * row, and Catalyst can multiply that further — `SimplifyExtractValueOps`
  * re-inlines struct fields and predicate pushdown substitutes aliases
  * into filters (a config-compiled drop_on_error predicate was measured
  * carrying 32 inlined copies). Because every duplicated reference to
  * `RegexGroups(text, pat)` is the IDENTICAL deterministic subexpression,
  * whole-stage codegen's subexpression elimination collapses them to ONE
  * evaluation per operator — the duplication class becomes harmless by
  * construction instead of needing a projection-barrier workaround at
  * every call site.
  *
  * Match semantics are `find()` — identical to `regexp_extract` /
  * `RLIKE` — so the grok compiler's anchored patterns and the DuckDB
  * oracle's `regexp_extract(text, pat, i)` see the same groups.
  */
object RegexExpressions {

  /** Memo sentinel for "pattern did not match" (case object: serializable,
    * identity-stable across (de)serialization via readResolve).
    */
  private case object NoMatch

  /** Per-thread (input, result) memo of the LAST evaluation, keyed by
    * pattern text. JVM-global (companion-level) because the optimizer
    * clones an expression into many plan positions — per-instance state
    * would give each clone its own empty memo and no sharing. One
    * HashMap get (cached String hash) replaces a regex run for every
    * duplicate reference to the same (pattern, row input).
    *
    * Access-order LRU capped at 64 patterns: a long-lived executor
    * thread evaluating many distinct configs over its lifetime must not
    * pin one (cloned input + group array) entry per pattern forever.
    * Within one query the working set is the handful of patterns in
    * the plan, far under the cap, so the memo hit rate is unaffected.
    */
  private val MemoMaxPatterns = 64
  private val memoTL = new ThreadLocal[java.util.LinkedHashMap[String, Array[AnyRef]]] {
    override def initialValue(): java.util.LinkedHashMap[String, Array[AnyRef]] =
      new java.util.LinkedHashMap[String, Array[AnyRef]](32, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Array[AnyRef]]): Boolean =
          size() > MemoMaxPatterns
      }
  }

  case class RegexGroups(subject: Expression, regexp: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {

    require(regexp.foldable, "RegexGroups pattern must be a literal (compile-once)")

    override def left: Expression = subject
    override def right: Expression = regexp
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    // no-match yields null REGARDLESS of input nullability — without this
    // override BinaryExpression derives nullable from the children, and on
    // non-null inputs the optimizer folds `groups.isNotNull` to true
    override def nullable: Boolean = true
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "regex_groups"

    @transient private lazy val patternStr: String =
      regexp.eval(null).asInstanceOf[UTF8String].toString
    @transient private lazy val pattern: Pattern = Pattern.compile(patternStr)

    /** Shared by interpreted eval and codegen (via reference object).
      *
      * Codegen subexpression elimination only runs inside ProjectExec —
      * FilterExec short-circuits its predicate and evaluates each
      * reference independently, so a drop/raise predicate carrying k
      * inlined copies of this expression would still run the regex k
      * times per row. With the companion memo, copy 2..k of the same
      * row's input costs one UTF8String content-compare. The stored key
      * is a defensive clone because UnsafeRow-backed UTF8Strings alias
      * reusable buffers.
      */
    def extract(s: UTF8String): GenericArrayData = {
      val slot = memoTL.get().computeIfAbsent(patternStr, _ => new Array[AnyRef](2))
      if (s.equals(slot(0))) {
        return (if (slot(1) eq NoMatch) null else slot(1)).asInstanceOf[GenericArrayData]
      }
      val m: Matcher = pattern.matcher(s.toString)
      val res =
        if (!m.find()) null
        else {
          val n = m.groupCount()
          val arr = new Array[Any](n)
          var i = 0
          while (i < n) {
            val g = m.group(i + 1)
            arr(i) = if (g == null) UTF8String.EMPTY_UTF8 else UTF8String.fromString(g)
            i += 1
          }
          new GenericArrayData(arr)
        }
      slot(0) = s.clone()
      slot(1) = if (res == null) NoMatch else res
      res
    }

    override def nullSafeEval(t: Any, r: Any): Any = extract(t.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (t, _) => {
        val self = ctx.addReferenceObj("regexGroups", this,
          classOf[RegexGroups].getName)
        val res = ctx.freshName("groups")
        s"""
        org.apache.spark.sql.catalyst.util.GenericArrayData $res = $self.extract($t);
        if ($res == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $res;
        }
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(subject = newLeft, regexp = newRight)
  }

  /** array<string> of all capture groups; null when no match. */
  def regexGroups(text: Column, pattern: String): Column =
    ExpressionUtils.column(RegexGroups(
      ExpressionUtils.expression(text), Literal(pattern)))
}
