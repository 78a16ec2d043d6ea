package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal plumbing specs: schema, typed decode stub, partitioning,
  * frame sampling.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.fromDocuments(Tables.table(spark, sfDir, "documents"))

  test("media table has opaque binary payload + typed metadata") {
    val sch = media.schema
    assert(sch("bytes").dataType.typeName == "binary")
    assert(sch("meta").dataType.typeName == "struct")
    assert(media.count() > 0)
  }

  test("stub decode via batched mapPartitions agrees with the column projection") {
    val typed = Multimodal.decodeFeatures(Multimodal.asDataset(media), batchSize = 7)
      .select(col("id"), col("media_type"), col("n_bytes"), col("head_hex"))
    val cols = Multimodal.featureColumns(media)
      .select(col("id"), col("media_type"), col("n_bytes"), col("head_hex"))
    assert(typed.exceptAll(cols).count() == 0)
    assert(cols.exceptAll(typed).count() == 0)
  }

  test("decode stub checksum is deterministic") {
    val a = Multimodal.decodeFeatures(Multimodal.asDataset(media))
      .select("id", "checksum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Multimodal.decodeFeatures(Multimodal.asDataset(media))
      .select("id", "checksum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b && a.nonEmpty)
  }

  test("repartitionBySize bounds per-task volume") {
    val parts = Multimodal.repartitionBySize(media, targetBytes = 10000)
      .rdd.getNumPartitions
    assert(parts >= 2) // corpus is ~100KB at sf0.001
  }

  test("frame sampling covers the payload with stride") {
    val fs = Multimodal.frameSample(media, frameBytes = 32, stride = 4)
    val one = fs.filter(col("id") === 0).orderBy("frame_idx").collect()
    assert(one.nonEmpty)
    assert(one.map(_.getInt(1)).forall(_ % 4 == 0))
    // frame 0 hex = first 32 bytes of the payload
    val headHex = media.filter(col("id") === 0)
      .select(hex(col("bytes").substr(1, 32))).collect()(0).getString(0)
    assert(one(0).getString(2) == headHex)
  }
}
