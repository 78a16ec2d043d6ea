package graft.functions

import org.apache.spark.sql.Column

/** Dense-vector kernels as native Catalyst expressions.
  *
  * The embedding-similarity family (ANN, cosine near-dup) evaluates a
  * dot product per candidate pair — the single hottest scalar in the
  * whole library at corpus scale. Spark's declarative formulation
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) runs the higher-order
  * functions INTERPRETED, one lambda dispatch per element (~20x slower
  * than a fused loop, measured at sf0.1). `dot` is the codegen form:
  * whole-stage codegen inlines a primitive-double loop directly into
  * the generated consumer, so pair evaluation stays inside one
  * JIT-compiled stage with no per-element allocation.
  *
  * Implementation lives in `org.apache.spark.sql.graftvec` (the
  * Expression → Column seam is `private[sql]`); numeric contract
  * (left-to-right double summation, bit-identical to the interpreted
  * form and to DuckDB's list_sum) is documented there.
  */
object VectorOps {

  /** Codegen'd dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftvec.VectorExpressions.dot(a, b)
}
