package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north star surface): media payloads are
  * opaque `binary` columns with typed metadata; decode / feature-extract /
  * resize / frame-sample run as imperative per-partition batch jobs over
  * those bytes.
  *
  * IMAGE kernels are REAL: PNG/JPEG decode, pixel-feature extraction and
  * resize run through the JDK's `javax.imageio` (no external codec
  * dependency). AUDIO kernels are REAL too: WAV/AIFF/AU PCM decode runs
  * through the JDK's `javax.sound.sampled`. Only the VIDEO kernel remains
  * a STUB — the JDK ships no video codec — replaced by deterministic byte
  * arithmetic with the real pipeline shape around it. Everything
  * Spark-side is real and tested either way: the schema, the binary
  * encoding, the mapPartitions batching shape, and the partition sizing
  * concerns.
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

  // once per JVM — driver AND executors (the object initializes wherever
  // a kernel closure first runs): decode in-heap, never through ImageIO's
  // default temp-FILE cache, which would put a disk write in every decode
  javax.imageio.ImageIO.setUseCache(false)

  /** Typed media row: opaque payload + metadata, the cross-modality
    * carrier schema. */
  case class Media(media_id: Long, bytes: Array[Byte], mime: String, meta: Map[String, String])

  /** Dimension cap checked BEFORE committing to a full decode: a few-KB
    * decompression bomb can declare a raster worth gigabytes, and the
    * resulting OutOfMemoryError is uncatchable and takes the whole
    * partition down. Header dims cost pennies via the ImageReader. 64M
    * pixels ≈ 256 MB of ARGB — one payload per task stays bounded. */
  private val MaxPixels = 64L * 1024 * 1024

  /** Decode any ImageIO-supported payload, or null for anything broken:
    * unknown format, header dims over [[MaxPixels]], or a decoder blowup.
    * ImageIO plugins throw RuntimeExceptions (not just IOException) on
    * corrupt-but-plausible streams, so the net is NonFatal — at 100 TB
    * some payloads WILL be corrupt and must degrade, not kill the job. */
  private def readImageOrNull(bytes: Array[Byte]): java.awt.image.BufferedImage =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) null
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val w = reader.getWidth(0).toLong
            val h = reader.getHeight(0).toLong
            if (w <= 0 || h <= 0 || w * h > MaxPixels) null
            else reader.read(0)
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => null }

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

  /** Per-image pixel features from a REAL decode (fixed-width; cheap to
    * shuffle). `mean_luma` is the average of the integer per-pixel luma
    * `(299·R + 587·G + 114·B) / 1000` — integer weights so the value is
    * an exact rational both here and in any SQL oracle (the float-weight
    * form would differ in the last ulp across engines). Failed decodes
    * surface as width = height = channels = -1, mean_luma = NaN rather
    * than killing the job — at 100 TB some payloads WILL be corrupt. */
  case class ImageFeatures(media_id: Long, width: Int, height: Int,
                           channels: Int, n_pixels: Long, mean_luma: Double)

  /** REAL image decode via the JDK's ImageIO (PNG, JPEG, GIF, BMP):
    * dimensions, band count, and mean integer-luma over all pixels.
    * Pixels are read a ROW at a time (bulk getRGB / raster samples), not
    * per-pixel getRGB — this is the declared hot path at the design
    * point and per-pixel access pays a bounds check + color-model
    * conversion per call. */
  private[multimodal] def decodeImage(m: Media): ImageFeatures = {
    val img = readImageOrNull(m.bytes)
    if (img == null)
      return ImageFeatures(m.media_id, -1, -1, -1, 0L, Double.NaN)
    val (w, h) = (img.getWidth, img.getHeight)
    var lumaSum = 0L
    val row = new Array[Int](w)
    val raster = img.getRaster
    if (raster.getNumBands == 1) {
      // grayscale: read the STORED samples — getRGB would route them
      // through the JDK's linear-gray -> sRGB conversion and inflate
      // every value (a stored 128 reads back ≈ 186), disagreeing with
      // every other decoder and any oracle over the stored bytes
      var y = 0
      while (y < h) {
        raster.getSamples(0, y, w, 1, 0, row)
        var x = 0
        while (x < w) { lumaSum += 1000L * row(x); x += 1 }
        y += 1
      }
    } else {
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val rgb = row(x)
          lumaSum += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
            114L * (rgb & 0xff)
          x += 1
        }
        y += 1
      }
    }
    val n = w.toLong * h
    ImageFeatures(m.media_id, w, h, raster.getNumBands, n,
      if (n == 0) Double.NaN else lumaSum.toDouble / (1000.0 * n))
  }

  /** Per-partition batched REAL image decode over the image-mime rows:
    * Iterator-in/Iterator-out, one decoded image in memory at a time. */
  def extractImageFeatures(media: Dataset[Media]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.filter(col("mime").startsWith("image/"))
      .mapPartitions(_.map(decodeImage))
  }

  /** REAL image resize: decode, scale so the longer edge is `maxDim`
    * (never upscale), re-encode. JPEG inputs re-encode as JPEG (a
    * photographic JPEG re-encoded as PNG would GROW — the opposite of
    * what resize is for); everything else re-encodes as PNG, keeping the
    * alpha channel when the source has one (compositing RGBA onto an RGB
    * buffer would silently turn transparency into black). Non-image
    * payloads and failed decodes pass through untouched — resize is an
    * optimization, not a gate. Iterator-in/Iterator-out like every
    * kernel here. */
  def resizeImages(media: Dataset[Media], maxDim: Int): Dataset[Media] = {
    import media.sparkSession.implicits._
    require(maxDim > 0, s"maxDim must be positive, got $maxDim")
    media.mapPartitions(_.map { m =>
      if (!m.mime.startsWith("image/")) m
      else {
        val img = readImageOrNull(m.bytes)
        if (img == null || math.max(img.getWidth, img.getHeight) <= maxDim) m
        else {
          val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
          val (w, h) = (math.max(1, math.round(img.getWidth * scale).toInt),
            math.max(1, math.round(img.getHeight * scale).toInt))
          val jpeg = m.mime == "image/jpeg"
          val keepAlpha = img.getColorModel.hasAlpha && !jpeg
          val out = new java.awt.image.BufferedImage(w, h,
            if (keepAlpha) java.awt.image.BufferedImage.TYPE_INT_ARGB
            else java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g2 = out.createGraphics()
          try {
            g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g2.drawImage(img, 0, 0, w, h, null)
          } finally g2.dispose()
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, if (jpeg) "jpg" else "png", baos)
          m.copy(bytes = baos.toByteArray,
            mime = if (jpeg) "image/jpeg" else "image/png",
            meta = m.meta + ("resized" -> s"${w}x$h"))
        }
      }
    })
  }

  /** Deterministic synthetic PNG: a `w`×`h` gray gradient whose pixel
    * (x, y) has R = G = B = (7x + 13y + seed) mod 256. Encoded with the
    * real PNG codec, so decoding it exercises the real kernel while every
    * pixel value — hence [[ImageFeatures.mean_luma]] — is predictable by
    * plain integer arithmetic (the oracle-checkability hook for
    * [[decodeImage]]: PNG is lossless, so the round trip is exact). */
  def synthPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((7L * x + 13L * y + seed) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Per-audio features from a REAL decode (fixed-width; cheap to
    * shuffle). `abs_sum` is the exact integer sum of |sample| over all
    * channels and frames and `peak` the maximum |sample| — integer
    * outputs so any SQL oracle over the same synthetic samples matches
    * bit-for-bit (a float mean would differ in the last ulp across
    * engines; mean amplitude is `abs_sum / (n_frames * channels)` when
    * the caller wants it). Failed decodes surface as -1 dimensions
    * rather than killing the job. */
  case class AudioFeatures(media_id: Long, sample_rate: Int, channels: Int,
                           bits: Int, n_frames: Long, abs_sum: Long, peak: Int)

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU
    * PCM): format header (rate, channels, bit depth, frame count) plus
    * exact integer amplitude stats over every 16-bit sample. The stream
    * is read a FRAME BUFFER at a time (never the whole payload decoded
    * into one array) and non-16-bit or compressed payloads degrade to
    * header-only features — at 100 TB some payloads WILL be odd, and a
    * feature row with nulls beats a dead executor. */
  private[multimodal] def decodeAudio(m: Media): AudioFeatures = {
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(m.bytes))
      try {
        val fmt = in.getFormat
        val signed16 =
          fmt.getSampleSizeInBits == 16 &&
            fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        var absSum = 0L
        var peak = 0
        var frames = 0L
        if (signed16) {
          val frameSize = fmt.getFrameSize
          val buf = new Array[Byte](frameSize * 1024)
          var n = in.read(buf)
          while (n > 0) {
            var i = 0
            while (i + 1 < n) {
              val s =
                if (fmt.isBigEndian) ((buf(i) << 8) | (buf(i + 1) & 0xff)).toShort
                else ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort
              val a = math.abs(s.toInt)
              absSum += a
              if (a > peak) peak = a
              i += 2
            }
            frames += n / frameSize
            n = in.read(buf)
          }
        } else frames = in.getFrameLength
        AudioFeatures(m.media_id, fmt.getSampleRate.toInt, fmt.getChannels,
          fmt.getSampleSizeInBits, frames,
          if (signed16) absSum else -1L, if (signed16) peak else -1)
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) =>
      AudioFeatures(m.media_id, -1, -1, -1, -1L, -1L, -1)
    }
  }

  /** Per-partition batched REAL audio decode over the audio-mime rows:
    * Iterator-in/Iterator-out, one open codec stream at a time. */
  def extractAudioFeatures(media: Dataset[Media]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.filter(col("mime").startsWith("audio/"))
      .mapPartitions(_.map(decodeAudio))
  }

  /** Deterministic synthetic WAV: `nFrames` mono 16-bit PCM frames where
    * sample i = ((2731·i + seed) mod 65536) − 32768, encoded through the
    * real `AudioSystem` WAV writer. PCM is lossless, so decoding it
    * exercises the real codec while every sample — hence
    * [[AudioFeatures.abs_sum]]/`peak` — is predictable by plain integer
    * arithmetic (the oracle-checkability hook for [[decodeAudio]],
    * exactly parallel to [[synthPng]]). */
  def synthWav(seed: Long, nFrames: Int, sampleRate: Int = 8000): Array[Byte] = {
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s = (((2731L * i + seed) % 65536L).toInt - 32768).toShort
      pcm(2 * i) = (s & 0xff).toByte         // little-endian, as declared
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Byte-arithmetic decode for modalities the JDK has no codec for
    * (video) — deterministic and oracle-checkable; the pipeline
    * shape (schema, batching) is identical to the real image path. */
  private def decodeStub(m: Media): MediaFeatures = {
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

  /** VIDEO frame extraction through an EXTERNAL decoder subprocess — the
    * one modality the JDK ships no codec for, so the decode itself is an
    * explicit, off-by-default external dependency while the Spark-side
    * contract stays real and tested:
    *
    *  - `command` is the decoder invocation, container bytes on stdin,
    *    fixed-size raw frames on stdout. The production binding is
    *    ffmpeg's rawvideo pipe, e.g.
    *    `Seq("ffmpeg","-v","error","-i","pipe:0","-f","rawvideo",
    *    "-pix_fmt","rgb24","-s","WxH","pipe:1")` with
    *    `frameBytes = W*H*3`; tests bind a deterministic fake.
    *  - one subprocess per ROW (a container is one decoder run — ffmpeg
    *    cannot demux concatenated containers on one stdin), stdin fed
    *    from a writer thread, stderr drained (a full pipe would deadlock
    *    the decoder), stdout consumed INCREMENTALLY one frame at a time
    *    — executor memory stays at one frame regardless of video length.
    *  - every `everyK`-th frame is emitted; skipped frames are still
    *    read (the pipe must drain) but not buffered.
    *  - a payload whose decode fails (bad bytes, missing binary, decoder
    *    exit != 0 mid-stream) degrades to a single `error` row for that
    *    media_id — the corrupt-media policy of the image/audio kernels;
    *    it never kills the executor.
    *
    * Output: (media_id, frame_idx, frame_len, frame_bytes, error). */
  def frameExtractExternal(media: Dataset[Media], command: Seq[String],
                           frameBytes: Int, everyK: Int = 1): DataFrame = {
    require(command.nonEmpty, "decoder command must be nonempty")
    require(frameBytes > 0 && everyK > 0, "frameBytes and everyK must be positive")
    import media.sparkSession.implicits._
    val cmd = command // serializable capture
    media.flatMap { m =>
      new Iterator[(Long, Int, Int, Array[Byte], String)] {
        private var proc: Process = _
        private var out: java.io.InputStream = _
        private var failed: String = null
        private var done = false
        private var idx = -1
        private var nextFrame: Array[Byte] = _
        try {
          val pb = new ProcessBuilder(cmd: _*)
          proc = pb.start()
          // stderr drains on its own thread: a decoder chatty on a full
          // stderr pipe would block and deadlock the frame reads
          val errT = new Thread(() => {
            val buf = new Array[Byte](8192)
            val es = proc.getErrorStream
            try { while (es.read(buf) >= 0) () } catch { case _: Throwable => () }
          })
          errT.setDaemon(true); errT.start()
          val inT = new Thread(() => {
            val os = proc.getOutputStream
            try { os.write(m.bytes); os.close() }
            catch { case _: Throwable => () } // decoder died early: reader reports
          })
          inT.setDaemon(true); inT.start()
          out = proc.getInputStream
        } catch {
          case scala.util.control.NonFatal(e) =>
            failed = s"${e.getClass.getSimpleName}: ${e.getMessage}"
        }
        private def readFrame(): Array[Byte] = {
          val buf = new Array[Byte](frameBytes)
          var off = 0
          while (off < frameBytes) {
            val n = out.read(buf, off, frameBytes - off)
            if (n < 0) {
              if (off == 0) return null // clean end between frames
              throw new java.io.EOFException(
                s"decoder emitted a truncated frame ($off of $frameBytes bytes)")
            }
            off += n
          }
          buf
        }
        private def advance(): Unit = {
          nextFrame = null
          if (failed != null || done) return
          try {
            var f = readFrame()
            while (f != null && { idx += 1; idx % everyK != 0 }) f = readFrame()
            if (f == null) {
              done = true
              // a nonzero exit is corruption even AFTER clean frames
              // (ffmpeg reports a bad tail this way): flag it, keeping
              // whatever frames already decoded
              val code = proc.waitFor()
              if (code != 0) failed = s"decoder exited $code"
            } else nextFrame = f
          } catch {
            case scala.util.control.NonFatal(e) =>
              failed = s"${e.getClass.getSimpleName}: ${e.getMessage}"
          }
        }
        if (failed == null) advance()
        private var errorEmitted = false
        def hasNext: Boolean =
          nextFrame != null || (failed != null && !errorEmitted)
        def next(): (Long, Int, Int, Array[Byte], String) = {
          if (failed != null) {
            errorEmitted = true
            if (proc != null) proc.destroyForcibly()
            (m.media_id, -1, 0, Array.emptyByteArray, failed)
          } else {
            val f = nextFrame
            val i = idx
            advance()
            (m.media_id, i, f.length, f, null)
          }
        }
      }
    }.toDF("media_id", "frame_idx", "frame_len", "frame_bytes", "error")
  }
}
