package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Skew-handling specs: salted aggregation must be value-equal to the
  * plain aggregation while spreading hot keys across partitions.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish: one hot key with 10k rows, 100 cold keys with 10 each
  private lazy val skewed = {
    val hot = (0 until 10000).map(i => ("conv-hot", i, i % 997))
    val cold = for (k <- 0 until 100; i <- 0 until 10)
      yield (s"conv-$k", i, (k * 31 + i) % 997)
    (hot ++ cold).toDF("conv_id", "turn_idx", "latency_ms")
  }

  test("salted aggregate equals plain aggregate on a skewed key") {
    val plain = skewed.groupBy($"conv_id")
      .agg(count(lit(1)).as("n"), sum($"latency_ms").as("s"),
        max($"latency_ms").as("mx"))
    val salted = Skew.saltedAggregate(
      skewed,
      key = Seq($"conv_id"),
      saltBy = $"turn_idx",
      saltBuckets = 16,
      partial = Seq(count(lit(1)).as("n"), sum($"latency_ms").as("s"),
        max($"latency_ms").as("mx")),
      merge = Seq(sum($"n").as("n"), sum($"s").as("s"), max($"mx").as("mx")))
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("salt spreads the hot key over buckets") {
    val buckets = skewed.filter($"conv_id" === "conv-hot")
      .select(Skew.salt($"turn_idx", 16).as("b"))
      .distinct().count()
    assert(buckets == 16)
  }

  test("salted repartition keeps all rows and bounds per-partition hot-key load") {
    val parts = Skew.saltedRepartition(skewed, $"conv_id", $"turn_idx",
      saltBuckets = 16, numPartitions = 16)
    assert(parts.count() == skewed.count())
    import org.apache.spark.sql.Row
    val hotPerPartition = parts.filter($"conv_id" === "conv-hot")
      .rdd.mapPartitions(it => Iterator(it.size)).collect()
    // hot key no longer concentrated in a single partition
    assert(hotPerPartition.count(_ > 0) > 1)
    assert(hotPerPartition.max < 10000)
  }
}
