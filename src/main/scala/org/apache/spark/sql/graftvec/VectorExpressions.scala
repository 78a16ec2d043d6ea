package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Catalyst-internal half of graft's dense-vector kernels.
  *
  * Lives under `org.apache.spark.sql` because the two seams a custom
  * codegen expression needs — `ExpressionUtils.column` (Expression →
  * Column in Spark 4's ColumnNode world) and the `AbstractDataType`
  * hierarchy for `ImplicitCastInputTypes` — are `private[sql]`. This is
  * the conventional extension point third-party Spark libraries use for
  * native expressions; the public API is `graft.functions.VectorOps`.
  */
object VectorExpressions {

  /** Dot product of two array<double> columns, summed LEFT TO RIGHT in
    * IEEE double — the exact order `aggregate(zip_with(...))` and
    * DuckDB's `list_sum(list_transform(list_zip(...)))` use, so results
    * are bit-identical to both and 6dp-rounded cosines hash-match the
    * correctness oracle.
    *
    * PRECONDITION (embedding-column contract): both arrays are non-null,
    * contain no null elements, and have equal length — the shape every
    * graft embedding producer guarantees. Outside it this expression
    * diverges from the HOF form: a null ELEMENT reads as 0.0 (ArrayData
    * primitive access) instead of propagating null, and mismatched
    * lengths truncate to min(n) instead of yielding null. Top-level null
    * arrays DO propagate null (nullIntolerant).
    *
    * Codegen emits a fused primitive loop (no per-element lambda
    * dispatch, no allocation) inlined into the consuming stage by
    * whole-stage codegen — ~20x faster per pair than the interpreted
    * higher-order-function form (measured at sf0.1).
    */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {

    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "vec_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("acc")
        s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $s;
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
