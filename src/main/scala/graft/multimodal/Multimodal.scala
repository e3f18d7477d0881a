package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north star surface): media payloads are
  * opaque `binary` columns with typed metadata; decode / feature-extract /
  * resize / frame-sample run as imperative per-partition batch jobs over
  * those bytes.
  *
  * The decode kernels themselves are STUBS — this container has no image
  * or audio codecs — replaced by deterministic byte arithmetic. Everything
  * Spark-side is real and tested: the schema, the binary encoding, the
  * mapPartitions batching shape, and the partition sizing concerns.
  *
  * Scale notes (100 TB of media):
  *   - payloads stay in one `binary` column; never explode bytes to rows;
  *   - `spark.sql.files.maxPartitionBytes` bounds decode-batch memory;
  *     decode is per-partition streaming (Iterator in, Iterator out — no
  *     partition-wide materialization);
  *   - feature outputs are tiny fixed-width rows, so the post-decode
  *     shuffle is negligible regardless of payload size.
  */
object Multimodal {

  /** Typed media row: opaque payload + metadata, the cross-modality
    * carrier schema. */
  case class Media(media_id: Long, bytes: Array[Byte], mime: String, meta: Map[String, String])

  /** Extracted per-media features (fixed-width; cheap to shuffle). */
  case class MediaFeatures(media_id: Long, n_bytes: Long, first_byte: Int,
                           last_byte: Int, byte_sum: Long)

  /** Wrap a text corpus as media rows: UTF-8 payload + mime + metadata.
    * With real images/audio this is a parquet/blob-store scan instead. */
  def textAsMedia(docs: DataFrame): Dataset[Media] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("bytes"),
        lit("text/plain").as("mime"),
        map(lit("lang"), col("lang"), lit("source"), col("source")).as("meta"))
      .as[Media]
  }

  /** Raw media ingestion from a directory tree via Spark's binaryFile
    * source — the actual on-ramp for image/audio dirs at scale: the scan
    * is split across executors by file, prunes on the path glob and the
    * optional `modifiedAfter` cutoff (incremental re-ingestion), and
    * never materializes a file list on the driver. media_id is the
    * 32-bit md5 prefix of the path (deterministic across runs and
    * clusters); mime is derived from the lowercased extension; the full
    * path, length and mtime ride along as metadata. */
  def filesAsMedia(spark: org.apache.spark.sql.SparkSession, dir: String,
                   glob: String = "*",
                   modifiedAfter: Option[String] = None): Dataset[Media] = {
    import spark.implicits._
    val reader = spark.read.format("binaryFile").option("pathGlobFilter", glob)
    val withCutoff = modifiedAfter.fold(reader)(reader.option("modifiedAfter", _))
    val p = lower(col("path"))
    withCutoff.load(dir)
      .select(
        graft.functions.GraftExpressions.md5Prefix32(col("path")).as("media_id"),
        col("content").as("bytes"),
        when(p.endsWith(".png"), "image/png")
          .when(p.endsWith(".jpg") || p.endsWith(".jpeg"), "image/jpeg")
          .when(p.endsWith(".wav"), "audio/wav")
          .when(p.endsWith(".mp4"), "video/mp4")
          .otherwise("application/octet-stream").as("mime"),
        map(lit("path"), col("path"),
          lit("length"), col("length").cast("string"),
          lit("mtime"), col("modificationTime").cast("string")).as("meta"))
      .as[Media]
  }

  /** STUB decode kernel: where an image/audio codec would run. The fake
    * is deterministic byte arithmetic so the pipeline stays
    * oracle-checkable; swap the body for a real codec call per mime type. */
  private def decodeStub(m: Media): MediaFeatures = {
    // real impl: mime match { case "image/jpeg" => jpegDecode(m.bytes) ... }
    var sum = 0L
    var i = 0
    while (i < m.bytes.length) { sum += m.bytes(i) & 0xff; i += 1 }
    MediaFeatures(m.media_id, m.bytes.length.toLong,
      if (m.bytes.isEmpty) -1 else m.bytes(0) & 0xff,
      if (m.bytes.isEmpty) -1 else m.bytes(m.bytes.length - 1) & 0xff,
      sum)
  }

  /** Per-partition batched decode: Iterator-in/Iterator-out keeps memory
    * at one payload (+ codec state) regardless of partition size. */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it => it.map(decodeStub) }
  }

  /** STUB resize: a real implementation decodes, resamples, re-encodes;
    * the fake truncates the payload deterministically, preserving the
    * batch shape (binary in, binary out, metadata updated). */
  def resizeStub(media: Dataset[Media], maxBytes: Int): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      if (m.bytes.length <= maxBytes) m
      else m.copy(bytes = m.bytes.take(maxBytes),
        meta = m.meta + ("truncated" -> "true"))
    })
  }

  /** STUB frame sample: a real implementation demuxes video and decodes
    * every k-th frame; the fake slices every k-th fixed-size "frame"
    * window from the payload. One row in, many rows out (the generator
    * shape of frame extraction). */
  def frameSampleStub(media: Dataset[Media], frameBytes: Int, everyK: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      m.bytes.grouped(frameBytes).zipWithIndex
        .filter(_._2 % everyK == 0)
        .map { case (frame, idx) => (m.media_id, idx, frame.length, frame) }
    }.toDF("media_id", "frame_idx", "frame_len", "frame_bytes")
  }
}
