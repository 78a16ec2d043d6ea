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

  /** Query-dependent multiprobe bucket set for sign-LSH (Lv et al.,
    * VLDB'07 — see `Similarity.signLshTopK`): the 2^q bucket keys
    * reachable from `bucket` by flipping any subset of the query
    * vector's `q` least-confident sign bits (the dimensions with the
    * smallest |v[j]| among the first `b` — ties broken by lower index,
    * the exact (|v[j]| asc, j asc) order the DuckDB oracle's struct
    * sort produces). Output order is subset-enumeration order (t = 0,
    * 1, …, 2^q−1 over which of the q bits are flipped), matching the
    * oracle's unnest list.
    *
    * This replaces a Column-DSL formulation whose sort/transform
    * lambdas were CodegenFallback AND whose `ranked` subtree was
    * re-embedded once per mask bit (~80 interpreted copies per row —
    * the Column DSL has no sharing). Here the selection of the q
    * smallest dimensions runs ONCE per row in a fused primitive loop,
    * inside whole-stage codegen.
    *
    * PRECONDITION (embedding-column contract, as DotProduct): the
    * array is non-null with no null elements and ≥ b entries. `b ≤ 63`
    * structurally (long bits); keep `b ≤ 52` when an oracle recomputes
    * the masks via pow-based doubles.
    */
  case class ProbeBuckets(left: Expression, right: Expression, b: Int, q: Int)
      extends BinaryExpression with ImplicitCastInputTypes {
    require(q >= 1 && q <= b && b <= 63,
      s"probe bits q=$q must be in [1, b] and b=$b <= 63")

    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(DoubleType), org.apache.spark.sql.types.LongType)
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "probe_buckets"

    override def nullSafeEval(a: Any, bkt: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val bucket = bkt.asInstanceOf[Long]
      val used = new Array[Boolean](b)
      val bits = new Array[Long](q)
      var i = 0
      while (i < q) {
        var best = -1; var bestA = 0.0
        var j = 0
        while (j < b) {
          if (!used(j)) {
            val aj = math.abs(v.getDouble(j))
            if (best < 0 || aj < bestA) { best = j; bestA = aj }
          }
          j += 1
        }
        used(best) = true
        bits(i) = 1L << best
        i += 1
      }
      val masks = new Array[Long](1 << q)
      var t = 0
      while (t < masks.length) {
        var m = bucket
        var k = 0
        while (k < q) { if ((t & (1 << k)) != 0) m ^= bits(k); k += 1 }
        masks(t) = m
        t += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(masks)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, bkt) => {
        val used = ctx.freshName("used")
        val bits = ctx.freshName("bits")
        val masks = ctx.freshName("masks")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val t = ctx.freshName("t")
        val k = ctx.freshName("k")
        val best = ctx.freshName("best")
        val bestA = ctx.freshName("bestA")
        val aj = ctx.freshName("aj")
        val m = ctx.freshName("m")
        s"""
        boolean[] $used = new boolean[$b];
        long[] $bits = new long[$q];
        for (int $i = 0; $i < $q; $i++) {
          int $best = -1; double $bestA = 0.0;
          for (int $j = 0; $j < $b; $j++) {
            if ($used[$j]) continue;
            double $aj = java.lang.Math.abs($a.getDouble($j));
            if ($best < 0 || $aj < $bestA) { $best = $j; $bestA = $aj; }
          }
          $used[$best] = true;
          $bits[$i] = 1L << $best;
        }
        long[] $masks = new long[${1 << q}];
        for (int $t = 0; $t < ${1 << q}; $t++) {
          long $m = $bkt;
          for (int $k = 0; $k < $q; $k++) {
            if (($t & (1 << $k)) != 0) $m ^= $bits[$k];
          }
          $masks[$t] = $m;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray($masks);
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def probeBuckets(v: Column, bucket: Column, b: Int, q: Int): Column =
    ExpressionUtils.column(ProbeBuckets(
      ExpressionUtils.expression(v), ExpressionUtils.expression(bucket), b, q))
}
