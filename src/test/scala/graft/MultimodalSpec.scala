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

  // ---------------------------------------------------------- real decode

  test("synthesized BMP is a valid 24bpp file: magic, offsets, padded stride") {
    val b = Multimodal.synthesizeBmp(6) // w=7 -> stride 24 (3 pad bytes/row)
    assert(b(0) == 'B' && b(1) == 'M')
    def le32(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    assert(le32(2) == b.length)       // file size field
    assert(le32(10) == 54)            // pixel offset
    assert(le32(18) == 7 && le32(22) == 2) // w=6%8+1, h=6%5+1
    assert(((b(28) & 0xff) | ((b(29) & 0xff) << 8)) == 24)
    assert(b.length == 54 + 24 * 2)   // stride (3*7+3)/4*4 = 24
    // padding bytes at row end are zero; pixel bytes are the constants
    assert(b(54 + 21) == 0 && b(54 + 22) == 0 && b(54 + 23) == 0)
    assert((b(54) & 0xff) == (3 * 6 % 256) && (b(56) & 0xff) == (7 * 6 % 256))
  }

  test("synthesized WAV is a valid RIFF/PCM16 file") {
    val b = Multimodal.synthesizeWav(7) // rate 16000, n 17, sample -9300
    assert(new String(b, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(b, 8, 4, "US-ASCII") == "WAVE")
    assert(new String(b, 36, 4, "US-ASCII") == "data")
    assert(b.length == 44 + 2 * 17)
    val s0 = (((b(45) & 0xff) << 8) | (b(44) & 0xff)).toShort
    assert(s0 == (7 % 200) * 100 - 10000)
  }

  test("decodeMedia parses real headers and sample data distributed") {
    val decoded = Multimodal.decodeMedia(
      Multimodal.synthesizeMedia(Tables.table(spark, sfDir, "documents"))
        .repartition(3)).collect().map(d => d.id -> d).toMap
    assert(decoded.nonEmpty)
    decoded.values.foreach { d =>
      if (d.id % 2 == 0) {
        assert(d.format == "bmp")
        assert(d.width == (d.id % 8 + 1).toInt && d.height == (d.id % 5 + 1).toInt)
        assert(d.bits == 24 && d.channels == 3)
        assert(d.mean_signal == (7 * d.id % 256).toDouble) // exact: constant pixels
      } else {
        assert(d.format == "wav")
        assert(d.sample_rate_hz == (8000 * (d.id % 3 + 1)).toInt)
        assert(d.n_samples == d.id % 50 + 10)
        assert(d.duration_ms == d.n_samples * 1000.0 / d.sample_rate_hz)
        assert(d.mean_signal == ((d.id % 200) * 100 - 10000).toDouble)
      }
    }
  }

  test("wav decode walks chunks: a LIST chunk before fmt/data is skipped") {
    val base = Multimodal.synthesizeWav(3)
    // splice an 6-byte LIST chunk right after the WAVE tag
    val list = "LIST".getBytes("US-ASCII") ++ Array[Byte](6, 0, 0, 0) ++
      Array[Byte](1, 2, 3, 4, 5, 6)
    val spliced = base.take(12) ++ list ++ base.drop(12)
    // fix the RIFF size field
    val total = spliced.length - 8
    spliced(4) = (total & 0xff).toByte; spliced(5) = ((total >> 8) & 0xff).toByte
    import spark.implicits._
    val d = Multimodal.decodeMedia(Seq((3L, spliced)).toDF("id", "bytes"))
      .collect()(0)
    assert(d.format == "wav" && d.sample_rate_hz == 8000 && d.n_samples == 13)
  }

  test("hostile headers terminate: negative RIFF chunk size, lying BMP dimensions") {
    import spark.implicits._
    // RIFF/WAVE with a chunk whose size field is -8: o += 8 + size
    // would never advance — must end the walk, not hang the task
    val evil = "RIFF".getBytes("US-ASCII") ++ Array[Byte](16, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII") ++
      "junk".getBytes("US-ASCII") ++ Array[Byte](-8, -1, -1, -1) ++
      Array.fill[Byte](32)(7) // pad past the 44-byte wav sniff minimum
    // BMP header claiming 2^20 x 2^20 pixels over a 60-byte payload,
    // and one claiming 4 bpp (stride 0): both must fail fast -> unknown
    val lying = Multimodal.synthesizeBmp(2)
    lying(18) = 0; lying(19) = 0; lying(20) = 16; lying(21) = 0 // w = 2^20
    lying(22) = 0; lying(23) = 0; lying(24) = 16; lying(25) = 0 // h = 2^20
    val lowBpp = Multimodal.synthesizeBmp(2)
    lowBpp(28) = 4
    // 8bpp is a VALID BMP depth but has no red channel at pixel
    // offset +2 — decoding it would average palette indexes and
    // padding bytes, so it must land in unknown, not decode wrong
    val pal8 = Multimodal.synthesizeBmp(2)
    pal8(28) = 8
    val rows = Multimodal.decodeMedia(Seq(
        (1L, evil), (2L, lying), (3L, lowBpp), (4L, pal8)).toDF("id", "bytes"))
      .collect().map(d => d.id -> d.format).toMap
    assert(rows(1L) == "wav") // walk terminated; header fields best-effort
    assert(rows(2L) == "unknown" && rows(3L) == "unknown")
    assert(rows(4L) == "unknown")
  }

  test("malformed and unknown payloads fall back to the unknown shape, not task death") {
    import spark.implicits._
    val truncatedBmp = Multimodal.synthesizeBmp(2).take(60) // header says more pixels
    val rows = Multimodal.decodeMedia(Seq(
        (1L, "plain text".getBytes("UTF-8")),
        (2L, truncatedBmp),
        (3L, Array[Byte]())).toDF("id", "bytes"))
      .collect().map(d => d.id -> d.format).toMap
    assert(rows(1L) == "unknown" && rows(2L) == "unknown" && rows(3L) == "unknown")
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
