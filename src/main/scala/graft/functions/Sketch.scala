package graft.functions

import org.apache.spark.sql.Column

/** Mergeable-sketch aggregates (public API over the `private[sql]`
  * Catalyst seam in `org.apache.spark.sql.graftvec.SketchExpressions`).
  */
object Sketch {

  /** DDSketch quantile estimates of a double column as ONE mergeable
    * aggregate: returns array<double>, one estimate per requested
    * quantile, each within `alpha` relative error of the exact rank
    * statistic (while bucket count stays under `maxBins`). See
    * SketchExpressions for the algorithm + guarantees.
    */
  def ddQuantiles(value: Column, quantiles: Seq[Double],
                  alpha: Double = 0.01, maxBins: Int = 2048): Column =
    org.apache.spark.sql.graftvec.SketchExpressions
      .ddQuantiles(value, quantiles, alpha, maxBins)
}
