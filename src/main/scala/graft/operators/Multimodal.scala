package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: opaque
  * `binary` payload columns with typed metadata, batch-shaped decode /
  * feature-extraction, and frame/chunk sampling.
  *
  * The Spark-side plumbing — schema, partitioning, batch iteration —
  * is real and tested; the DECODE STEP IS A STUB (this container has no
  * image/audio codecs): `decodeFeatures` computes deterministic fake
  * features (length / head bytes / checksum) where a real deployment
  * would call an image library inside the same mapPartitions loop. The
  * batch shape mirrors Arrow-batch UDFs (mapInPandas): the partition
  * iterator is consumed in fixed-size batches so a vectorized decoder
  * can amortize per-batch setup.
  *
  * Scale notes: payloads stay opaque bytes end-to-end (no driver
  * collect); `repartitionBySize` bounds per-task byte volume so a task
  * never holds more than ~targetBytes of media in flight — the standard
  * defense against skewed media sizes at 100 TB.
  */
object Multimodal {

  final case class MediaMeta(media_type: String, width: Int, height: Int,
                             sample_rate_hz: Int)
  final case class MediaRow(id: Long, meta: MediaMeta, bytes: Array[Byte])
  final case class MediaFeatures(id: Long, media_type: String, n_bytes: Long,
                                 head_hex: String, checksum: Long,
                                 width: Int, height: Int)

  /** Derive a media table from the documents corpus: the text's UTF-8
    * bytes stand in for an opaque media payload; metadata is a
    * deterministic function of doc_id. (Fixture generator — a real
    * pipeline reads payloads from object storage.)
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("id"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        ((col("doc_id") % 8 + 1) * 64).cast("int").as("width"),
        ((col("doc_id") % 6 + 1) * 64).cast("int").as("height"),
        lit(16000).as("sample_rate_hz")).as("meta"),
      col("text").cast("binary").as("bytes"))

  /** Bound per-partition payload volume: hash-repartition on id with a
    * partition count derived from the total payload size.
    *
    * Sizing source, cheapest first: `estimatedTotalBytes` if the caller
    * knows it (catalog stats, manifest) — fully lazy; else the frame's
    * input FILES (driver-side metadata sum, no data read) when it maps
    * to files; else one counting aggregation over the payload column —
    * an EXTRA pass over the lineage, paid only in this last-resort
    * branch (it cannot be made lazy: the partition count is a plan
    * parameter).
    */
  def repartitionBySize(media: DataFrame, targetBytes: Long,
                        estimatedTotalBytes: Option[Long] = None): DataFrame = {
    val total = estimatedTotalBytes.getOrElse {
      val files = media.inputFiles
      if (files.nonEmpty) {
        val conf = media.sparkSession.sparkContext.hadoopConfiguration
        files.map { f =>
          val path = new org.apache.hadoop.fs.Path(f)
          path.getFileSystem(conf).getFileStatus(path).getLen
        }.sum
      } else {
        val stats = media.agg(sum(length(col("bytes")))).collect()(0)
        if (stats.isNullAt(0)) 0L else stats.getLong(0)
      }
    }
    val parts = math.max(1, math.min(10000, (total / math.max(1, targetBytes)).toInt))
    media.repartition(parts, col("id"))
  }

  /** STUB DECODE — deterministic fake features standing in for a real
    * decoder (???): replace the body of `decodeOne` with the actual
    * image/audio library call; everything around it (typed Dataset in,
    * batched partition iteration, typed Dataset out) is the production
    * plumbing.
    */
  def decodeFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real decoder would init per-batch state here (Arrow buffers,
        // codec contexts) — the batch shape is the point of this loop
        batch.iterator.map(decodeOne)
      }
    }
  }

  /** The per-row stub: deterministic fake "decode". */
  private def decodeOne(r: MediaRow): MediaFeatures = {
    val head = r.bytes.take(8).map(b => f"${b & 0xff}%02X").mkString
    val checksum = r.bytes.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
    MediaFeatures(r.id, r.meta.media_type, r.bytes.length.toLong, head,
      checksum, r.meta.width, r.meta.height)
  }

  /** Column-only feature projection (the SQL-expressible subset of the
    * stub decode — what the DuckDB oracle verifies).
    */
  def featureColumns(media: DataFrame): DataFrame =
    media.select(
      col("id"),
      col("meta.media_type").as("media_type"),
      length(col("bytes")).cast("long").as("n_bytes"),
      // hex of the FIRST 8 BYTES — hex()ing the whole payload doubles it
      // into a transient string (a 500MB video -> ~1GB string) just to
      // keep 16 chars; identical output incl. short payloads
      hex(col("bytes").substr(lit(1), lit(8))).as("head_hex"),
      col("meta.width").as("width"),
      col("meta.height").as("height"))

  /** Frame/chunk sampling: split the payload into frames of
    * `frameBytes`, keep every `stride`-th frame. Pure column
    * expressions (substring on binary) — narrow, codegen'd, no UDF.
    * Output: (id, frame_idx, frame_hex).
    */
  def frameSample(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = ceil(length(col("bytes")).cast("double") / frameBytes).cast("int")
    media
      .select(col("id"), col("bytes"), nFrames.as("n_frames"))
      .select(col("id"),
        // step the sequence by stride: exploding every index and then
        // filtering would materialize stride x the final rows, each
        // carrying the full bytes column
        explode(when(col("n_frames") > 0,
          sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .otherwise(array().cast("array<int>"))).as("frame_idx"),
        col("bytes"))
      .select(col("id"), col("frame_idx"),
        hex(col("bytes").substr(
          (col("frame_idx") * frameBytes + 1).cast("int"),
          lit(frameBytes))).as("frame_hex"))
  }

  /** Typed view of the media table. */
  def asDataset(media: DataFrame): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow]
  }

  // ---------------------------------------------------------- real decode
  //
  // Two self-contained formats whose decode needs no external codec —
  // BMP (BITMAPFILEHEADER + BITMAPINFOHEADER + padded 24bpp rows) and
  // WAV (RIFF/WAVE chunks + PCM16 samples) — decoded for real: header
  // fields parsed from the bytes, sample/pixel data walked with the
  // correct row stride / block align. Every other format still takes
  // the documented stub path (`decodeOne`), exactly as a production
  // pipeline would fan out by sniffed magic to per-format decoders.

  final case class MediaBlob(id: Long, bytes: Array[Byte])

  /** The unified decode record. Inapplicable fields are 0 by contract
    * (a BMP has no sample rate; a WAV no width): `format` is sniffed
    * from the payload magic, never trusted from metadata.
    */
  final case class DecodedMedia(id: Long, format: String, n_bytes: Long,
                                width: Int, height: Int, sample_rate_hz: Int,
                                channels: Int, bits: Int, n_samples: Long,
                                duration_ms: Double, mean_signal: Double)

  private def putIntLE(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }
  private def putShortLE(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
  }

  /** A real, openable 24bpp BMP: w = id%8+1 (exercises every row-padding
    * remainder), h = id%5+1, constant BGR pixel ((3id)%256,(5id)%256,
    * (7id)%256). Constant pixels + zero padding make stride bugs
    * visible: averaging padding bytes into the channel mean shifts it.
    */
  def synthesizeBmp(id: Long): Array[Byte] = {
    val w = (id % 8 + 1).toInt; val h = (id % 5 + 1).toInt
    val stride = (3 * w + 3) / 4 * 4
    val dataSize = stride * h
    val out = new java.io.ByteArrayOutputStream(54 + dataSize)
    out.write('B'); out.write('M')
    putIntLE(out, 54 + dataSize); putShortLE(out, 0); putShortLE(out, 0)
    putIntLE(out, 54)
    putIntLE(out, 40); putIntLE(out, w); putIntLE(out, h)
    putShortLE(out, 1); putShortLE(out, 24); putIntLE(out, 0)
    putIntLE(out, dataSize); putIntLE(out, 2835); putIntLE(out, 2835)
    putIntLE(out, 0); putIntLE(out, 0)
    val b = (3 * id % 256).toInt; val g = (5 * id % 256).toInt; val r = (7 * id % 256).toInt
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out.write(b); out.write(g); out.write(r); x += 1 }
      var pad = stride - 3 * w
      while (pad > 0) { out.write(0); pad -= 1 }
      y += 1
    }
    out.toByteArray
  }

  /** A real mono PCM16 WAV: rate = 8000*(id%3+1), n = id%50+10 samples,
    * every sample the int16 (id%200)*100-10000.
    */
  def synthesizeWav(id: Long): Array[Byte] = {
    val rate = (8000 * (id % 3 + 1)).toInt
    val n = (id % 50 + 10).toInt
    val sample = ((id % 200) * 100 - 10000).toInt
    val dataSize = 2 * n
    val out = new java.io.ByteArrayOutputStream(44 + dataSize)
    out.write("RIFF".getBytes("US-ASCII")); putIntLE(out, 36 + dataSize)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); putIntLE(out, 16)
    putShortLE(out, 1); putShortLE(out, 1); putIntLE(out, rate)
    putIntLE(out, rate * 2); putShortLE(out, 2); putShortLE(out, 16)
    out.write("data".getBytes("US-ASCII")); putIntLE(out, dataSize)
    var i = 0
    while (i < n) { putShortLE(out, sample & 0xffff); i += 1 }
    out.toByteArray
  }

  /** Deterministic media fixture over the documents corpus: even doc_id
    * becomes a BMP, odd a WAV — real files, reproducible everywhere.
    */
  def synthesizeMedia(docs: DataFrame): DataFrame = {
    val gen = udf((id: Long) => if (id % 2 == 0) synthesizeBmp(id) else synthesizeWav(id))
    docs.select(col("doc_id").as("id"), gen(col("doc_id")).as("bytes"))
  }

  private def leInt(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def leShort(b: Array[Byte], o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** Parse one BMP: header fields from the real offsets, red-channel
    * mean walked with the parsed row stride (padding excluded).
    */
  private def decodeBmp(id: Long, b: Array[Byte]): DecodedMedia = {
    val off = leInt(b, 10)
    val w = leInt(b, 18); val h = math.abs(leInt(b, 22))
    val bpp = leShort(b, 28)
    val bytesPP = bpp / 8
    // a lying header must FAIL (caught -> unknown row), not loop:
    // bpp<8 gives stride 0 (the scan would spin w*h iterations over
    // one byte), and a fabricated w*h far beyond the payload would
    // walk ~2^60 in-bounds reads before the first out-of-range index.
    // bytesPP < 3 (8/16bpp palette or packed formats) has no red
    // channel at pixel offset +2 — the scan below would average
    // neighboring pixels or padding — so those land in the unknown
    // fallback rather than decode wrong
    if (bytesPP < 3 || w <= 0 || off < 0 ||
      off.toLong + ((bytesPP.toLong * w + 3) / 4 * 4) * h > b.length)
      throw new IndexOutOfBoundsException("BMP header inconsistent with payload")
    val stride = (bytesPP * w + 3) / 4 * 4
    var sum = 0.0; var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { sum += (b(off + y * stride + x * bytesPP + 2) & 0xff); x += 1 }
      y += 1
    }
    val px = w.toLong * h
    DecodedMedia(id, "bmp", b.length.toLong, w, h, 0, bytesPP, bpp, px, 0.0,
      if (px == 0) 0.0 else sum / px)
  }

  /** Parse one WAV: walk RIFF chunks (not fixed offsets — fmt/data may
    * be preceded by LIST etc.), then average the PCM16 samples.
    */
  private def decodeWav(id: Long, b: Array[Byte]): DecodedMedia = {
    var rate = 0; var channels = 0; var bits = 0
    var nSamples = 0L; var sum = 0.0
    var o = 12
    while (o + 8 <= b.length) {
      val cid = new String(b, o, 4, "US-ASCII")
      val size = leInt(b, o + 4)
      if (cid == "fmt ") {
        channels = leShort(b, o + 10); rate = leInt(b, o + 12)
        bits = leShort(b, o + 22)
      } else if (cid == "data" && bits == 16) {
        val n = size / 2
        var i = 0
        while (i < n) { sum += leShort(b, o + 8 + 2 * i).toShort.toDouble; i += 1 }
        nSamples = n.toLong / math.max(1, channels)
      }
      // RIFF chunks are word-aligned; a negative/zero-advance size
      // field (hostile or corrupt) must end the walk, not loop forever,
      // and a huge one must not wrap the Int cursor
      val advance = 8L + size + (size & 1)
      if (advance <= 0 || o + advance > b.length) o = b.length
      else o += advance.toInt
    }
    val totalVals = nSamples * math.max(1, channels)
    DecodedMedia(id, "wav", b.length.toLong, 0, 0, rate, channels, bits, nSamples,
      if (rate == 0) 0.0 else nSamples * 1000.0 / rate,
      if (totalVals == 0) 0.0 else sum / totalVals)
  }

  private def sniffFormat(b: Array[Byte]): String =
    if (b.length >= 54 && b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F'
      && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') "wav"
    else "unknown"

  /** Real decode over a (id, bytes) media frame: dispatch on sniffed
    * magic to the BMP/WAV parsers; unknown formats fall back to the
    * stub-shaped features (length/checksum in mean_signal's place would
    * be misleading — they get zeros plus the true byte count).
    */
  def decodeMedia(media: DataFrame, batchSize: Int = 64): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id"), col("bytes")).as[MediaBlob].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { m =>
          // a malformed header (truncated data, lying size fields) is a
          // bad ROW, not a bad task: fall back to the unknown shape
          try sniffFormat(m.bytes) match {
            case "bmp" => decodeBmp(m.id, m.bytes)
            case "wav" => decodeWav(m.id, m.bytes)
            case _ => DecodedMedia(m.id, "unknown", m.bytes.length.toLong,
              0, 0, 0, 0, 0, 0L, 0.0, 0.0)
          } catch {
            case _: IndexOutOfBoundsException | _: ArithmeticException =>
              DecodedMedia(m.id, "unknown", m.bytes.length.toLong,
                0, 0, 0, 0, 0, 0L, 0.0, 0.0)
          }
        }
      }
    }
  }
}
