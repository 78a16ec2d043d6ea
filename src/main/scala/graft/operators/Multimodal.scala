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
}
