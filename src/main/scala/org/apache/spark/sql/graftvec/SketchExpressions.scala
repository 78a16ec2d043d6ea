package org.apache.spark.sql.graftvec

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Mergeable quantile sketch for metric summary fan-in.
  *
  * The reference's summary/sketch metric value
  * (lib/vector-core/src/event/metric/value.rs:20-95, the
  * `MetricValue::Sketch`/AgentDDSketch arm) is a DDSketch: logarithmic
  * buckets with RELATIVE error `alpha`, merged bucket-wise — the
  * property that lets a 1000-executor summary aggregation combine
  * per-partition partials without ever shipping raw values. This is the
  * Spark-native equivalent: a `TypedImperativeAggregate` whose buffer IS
  * the sketch, so map-side combine builds per-partition sketches and the
  * shuffle carries O(maxBins) state per group regardless of row count —
  * the exact-`percentile` path in `Metrics.summaryAgg` keeps the oracle
  * bit-exact at gate scale, this is the documented at-scale default.
  *
  * Algorithm (public paper: Masson, Rim & Lee, "DDSketch: a fast and
  * fully-mergeable quantile sketch with relative-error guarantees",
  * VLDB 2019): value x > 0 lands in bucket ceil(log_gamma(x)) with
  * gamma = (1+alpha)/(1-alpha); the bucket's representative value
  * 2*gamma^i/(gamma+1) is within alpha relative error of every value it
  * holds. Negatives mirror into a second bucket map; |x| below 1e-12
  * counts as zero. Memory is bounded by collapsing the lowest-magnitude
  * positive buckets into one (the paper's collapsing variant) once the
  * bin count exceeds `maxBins` — with alpha=0.01 and maxBins=2048 the
  * un-collapsed dynamic range already spans > [1e-9, 1e9].
  *
  * Guarantees (spec-checked in OperatorSpec):
  *  - merge associativity/commutativity: any partition split + merge
  *    order yields the same sketch (bucket-wise Long addition);
  *  - quantile relative error <= alpha vs the exact percentile while
  *    bins stay under `maxBins` (no collapse), and results clamp to the
  *    observed [min, max].
  */
object SketchExpressions {

  /** Sketch aggregation buffer. Not thread-safe (one per agg slot). */
  final class DDSketchState(val alpha: Double) {
    val gamma: Double = (1 + alpha) / (1 - alpha)
    private val logGamma = math.log(gamma)
    /** |x| <= this counts as exactly zero (avoids log underflow). */
    private val zeroEps = 1e-12

    var zero: Long = 0L
    var total: Long = 0L
    var minV: Double = Double.PositiveInfinity
    var maxV: Double = Double.NegativeInfinity
    val pos: mutable.HashMap[Int, Long] = mutable.HashMap.empty
    val neg: mutable.HashMap[Int, Long] = mutable.HashMap.empty

    def binCount: Int = pos.size + neg.size

    private def key(mag: Double): Int =
      math.ceil(math.log(mag) / logGamma).toInt
    private def value(k: Int): Double = 2.0 * math.pow(gamma, k) / (gamma + 1)

    def insert(x: Double): Unit = {
      if (x.isNaN) return
      total += 1
      if (x < minV) minV = x
      if (x > maxV) maxV = x
      if (math.abs(x) <= zeroEps) zero += 1
      else if (x > 0) { val k = key(x); pos.update(k, pos.getOrElse(k, 0L) + 1) }
      else { val k = key(-x); neg.update(k, neg.getOrElse(k, 0L) + 1) }
    }

    def mergeWith(o: DDSketchState): Unit = {
      zero += o.zero; total += o.total
      if (o.minV < minV) minV = o.minV
      if (o.maxV > maxV) maxV = o.maxV
      o.pos.foreach { case (k, c) => pos.update(k, pos.getOrElse(k, 0L) + c) }
      o.neg.foreach { case (k, c) => neg.update(k, neg.getOrElse(k, 0L) + c) }
    }

    /** Collapse lowest-magnitude buckets (either sign) once over
      * budget — they hold the values with the smallest absolute
      * contribution, so the absolute error introduced is the smallest
      * available (paper §2.3; collapse breaks the relative-error bound
      * only for the collapsed range). Each fold merges a bucket into
      * its next-larger-magnitude neighbor of the SAME sign; the last
      * bucket of a sign is never folded (so the floor is maxBins, +1
      * only when both signs are down to their final bucket).
      */
    def collapseIfNeeded(maxBins: Int): Unit = {
      var over = pos.size + neg.size - maxBins
      if (over <= 0) return
      // mirrored keys: sorted ascending = smallest |value| first for
      // both maps (neg stores key(-x))
      val pk = pos.keys.toArray.sorted
      val nk = neg.keys.toArray.sorted
      var pi = 0
      var ni = 0
      while (over > 0 && (pi < pk.length - 1 || ni < nk.length - 1)) {
        val pKey = if (pi < pk.length - 1) pk(pi) else Int.MaxValue
        val nKey = if (ni < nk.length - 1) nk(ni) else Int.MaxValue
        if (pKey <= nKey) {
          val c = pos.remove(pk(pi)).get
          pos.update(pk(pi + 1), pos.getOrElse(pk(pi + 1), 0L) + c)
          pi += 1
        } else {
          val c = neg.remove(nk(ni)).get
          neg.update(nk(ni + 1), neg.getOrElse(nk(ni + 1), 0L) + c)
          ni += 1
        }
        over -= 1
      }
    }

    /** Rank-walk quantile estimate, clamped to the observed range. */
    def quantile(q: Double): Double = {
      require(q >= 0 && q <= 1, s"quantile $q out of [0,1]")
      if (total == 0) return Double.NaN
      val rank = (q * (total - 1)).toLong
      // rank extremes are tracked exactly — return them, not a bucket
      if (rank <= 0) return minV
      if (rank >= total - 1) return maxV
      var cum = 0L
      // negatives: most negative first = largest mirrored key first
      val negKeys = neg.keys.toArray.sorted(Ordering.Int.reverse)
      var i = 0
      while (i < negKeys.length) {
        cum += neg(negKeys(i))
        if (cum > rank) return clamp(-value(negKeys(i)))
        i += 1
      }
      cum += zero
      if (cum > rank) return clamp(0.0)
      val posKeys = pos.keys.toArray.sorted
      i = 0
      while (i < posKeys.length) {
        cum += pos(posKeys(i))
        if (cum > rank) return clamp(value(posKeys(i)))
        i += 1
      }
      maxV
    }

    private def clamp(x: Double): Double =
      math.min(math.max(x, minV), maxV)

    def serialize(): Array[Byte] = {
      val buf = ByteBuffer.allocate(8 * 5 + 4 * 2 + (pos.size + neg.size) * 12)
      buf.putDouble(alpha).putLong(zero).putLong(total)
        .putDouble(minV).putDouble(maxV)
      buf.putInt(pos.size)
      pos.foreach { case (k, c) => buf.putInt(k); buf.putLong(c) }
      buf.putInt(neg.size)
      neg.foreach { case (k, c) => buf.putInt(k); buf.putLong(c) }
      buf.array()
    }
  }

  object DDSketchState {
    def deserialize(bytes: Array[Byte]): DDSketchState = {
      val buf = ByteBuffer.wrap(bytes)
      val st = new DDSketchState(buf.getDouble)
      st.zero = buf.getLong; st.total = buf.getLong
      st.minV = buf.getDouble; st.maxV = buf.getDouble
      var n = buf.getInt
      while (n > 0) { st.pos.update(buf.getInt, buf.getLong); n -= 1 }
      n = buf.getInt
      while (n > 0) { st.neg.update(buf.getInt, buf.getLong); n -= 1 }
      st
    }
  }

  /** `dd_sketch_quantiles(value)` → array<double> of quantile estimates
    * (one per requested q), NULL for an empty group.
    */
  case class DDSketchQuantiles(
      child: Expression,
      quantiles: Seq[Double],
      alpha: Double,
      maxBins: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DDSketchState]
    with ImplicitCastInputTypes with UnaryLike[Expression] {

    require(quantiles.nonEmpty && quantiles.forall(q => q >= 0 && q <= 1))
    require(alpha > 0 && alpha < 1, "relative accuracy alpha in (0,1)")
    require(maxBins >= 16, "maxBins >= 16")

    override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
    override def dataType: DataType = ArrayType(DoubleType)
    override def nullable: Boolean = true
    override def prettyName: String = "dd_sketch_quantiles"

    override def createAggregationBuffer(): DDSketchState = new DDSketchState(alpha)

    /** Collapse slack: a sketch sitting exactly at maxBins would pay a
      * full key-sort per NEW bucket (monotone counters opening a bucket
      * per row are the common worst case). Letting it overshoot by
      * maxBins/8 before folding back to maxBins amortizes one
      * O(B log B) collapse over B/8 inserts; the hard bound is restored
      * at every serialize/eval, so shuffle size and the answer see
      * maxBins exactly.
      */
    private val slackBins = maxBins + math.max(2, maxBins / 8)

    override def update(b: DDSketchState, input: InternalRow): DDSketchState = {
      val v = child.eval(input)
      if (v != null) {
        b.insert(v.asInstanceOf[Double])
        if (b.binCount > slackBins) b.collapseIfNeeded(maxBins)
      }
      b
    }

    override def merge(b: DDSketchState, o: DDSketchState): DDSketchState = {
      b.mergeWith(o)
      if (b.binCount > slackBins) b.collapseIfNeeded(maxBins)
      b
    }

    override def eval(b: DDSketchState): Any =
      if (b.total == 0) null
      else {
        b.collapseIfNeeded(maxBins)
        new GenericArrayData(quantiles.map(b.quantile).toArray)
      }

    override def serialize(b: DDSketchState): Array[Byte] = {
      b.collapseIfNeeded(maxBins)
      b.serialize()
    }
    override def deserialize(bytes: Array[Byte]): DDSketchState =
      DDSketchState.deserialize(bytes)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def withNewMutableAggBufferOffset(o: Int): DDSketchQuantiles =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): DDSketchQuantiles =
      copy(inputAggBufferOffset = o)
  }

  /** Aggregate Column: DDSketch quantile estimates of `value`. */
  def ddQuantiles(value: Column, quantiles: Seq[Double],
                  alpha: Double = 0.01, maxBins: Int = 2048): Column =
    ExpressionUtils.column(
      DDSketchQuantiles(ExpressionUtils.expression(value), quantiles, alpha, maxBins)
        .toAggregateExpression())
}
