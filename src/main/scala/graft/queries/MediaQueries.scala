package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked twins for the multimodal plumbing: the payloads here
  * are UTF-8 text bytes (pure printable ASCII in the testdata), so the
  * mapPartitions decode-stub features can be reproduced in DuckDB with
  * character arithmetic — proving the whole binary path (encode ->
  * Dataset[Media] -> per-partition decode -> features) end to end.
  */
object MediaQueries {

  def mediaDecode(spark: SparkSession, sfDir: String): DataFrame =
    Multimodal.extractFeatures(
      Multimodal.textAsMedia(Tables.documents(spark, sfDir))).toDF()

  val mediaDecodeOracle: String =
    """SELECT doc_id AS media_id,
      |       CAST(len(text) AS BIGINT) AS n_bytes,
      |       CASE WHEN len(text) = 0 THEN -1 ELSE ascii(substring(text, 1, 1)) END AS first_byte,
      |       CASE WHEN len(text) = 0 THEN -1 ELSE ascii(substring(text, len(text), 1)) END AS last_byte,
      |       CAST(list_sum(list_transform(range(1, len(text)+1),
      |              i -> ascii(substring(text, i, 1)))) AS BIGINT) AS byte_sum
      |FROM documents
      |""".stripMargin

  /** Frame sampling over the byte payload: 64-byte frames, every 2nd. */
  def mediaFrames(spark: SparkSession, sfDir: String): DataFrame =
    Multimodal.frameSampleStub(
      Multimodal.textAsMedia(Tables.documents(spark, sfDir)), 64, 2)
      .select("media_id", "frame_idx", "frame_len")

  val mediaFramesOracle: String =
    """WITH f AS (
      |  SELECT doc_id AS media_id,
      |         unnest(range(0, CAST(ceil(len(text) / 64.0) AS BIGINT))) AS frame_idx,
      |         len(text) AS n
      |  FROM documents WHERE len(text) > 0)
      |SELECT media_id, CAST(frame_idx AS INTEGER) AS frame_idx,
      |       CAST(least(64, n - frame_idx * 64) AS INTEGER) AS frame_len
      |FROM f WHERE frame_idx % 2 = 0
      |""".stripMargin

  /** REAL image decode through the JDK PNG codec, oracle-checked: each
    * document id seeds a deterministic gray-gradient PNG (pixel (x,y) has
    * R=G=B=(7x+13y+id) mod 256), the payload round-trips through the real
    * encoder+decoder (`ImageIO` — PNG is lossless, so the round trip is
    * exact), and the kernel's pixel features (dimensions, band count,
    * integer-luma mean) are reproduced by DuckDB with plain arithmetic
    * over the same formula. A codec stub could NOT pass this: the bytes
    * on the wire are real PNG streams only a real decoder can read. */
  def imageDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // fan the id scan out before the codec stage (guide §2.5): the ids
    // are one scan split, so the whole PNG encode+decode ran in ONE
    // task (measured 0.33 s single-task at sf0.1/local[32]). The codec
    // work per 8-byte id is ~10^3-10^4 byte-equivalents (a real ImageIO
    // round trip per row), hence the expansion multiplier; the Widen
    // guards keep production-scale inputs untouched and price the width
    // by work, not cores.
    val ids = graft.ops.Widen.byKeys(
      Tables.documents(spark, sfDir).select(col("doc_id")),
      expansion = 4096.0, col("doc_id"))
    val media = ids.as[Long]
      .mapPartitions(_.map { id =>
        val w = (id % 16).toInt + 1
        val h = (id % 8).toInt + 1
        Multimodal.Media(id, Multimodal.synthPng(id, w, h), "image/png",
          Map("synthetic" -> "true"))
      })
    Multimodal.extractImageFeatures(media).toDF()
  }

  val imageDecodeOracle: String =
    """WITH px AS (
      |  SELECT doc_id, x, y, (7 * x + 13 * y + doc_id) % 256 AS v
      |  FROM documents, range(0, 16) tx(x), range(0, 8) ty(y)
      |  WHERE x < (doc_id % 16) + 1 AND y < (doc_id % 8) + 1
      |)
      |SELECT doc_id AS media_id,
      |       CAST((doc_id % 16) + 1 AS INTEGER) AS width,
      |       CAST((doc_id % 8) + 1 AS INTEGER) AS height,
      |       CAST(3 AS INTEGER) AS channels,
      |       CAST(COUNT(*) AS BIGINT) AS n_pixels,
      |       CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_luma
      |FROM px GROUP BY doc_id
      |""".stripMargin

  /** REAL audio decode through the JDK WAV codec, oracle-checked: each
    * document id seeds a deterministic 16-bit PCM WAV (sample i =
    * (2731·i + id) mod 65536 − 32768), the payload round-trips through
    * the real encoder+parser (`javax.sound.sampled` — PCM is lossless,
    * so the round trip is exact), and the kernel's integer amplitude
    * stats (abs-sum, peak) plus the header fields are reproduced by
    * DuckDB with plain arithmetic over the same formula. A codec stub
    * could NOT pass this: the bytes on the wire are real RIFF/WAVE
    * streams only a real parser can read. */
  def audioDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // DELIBERATELY not widened like [[imageDecode]]: measured at
    // sf0.1/local[32], a 32-task fan-out made this stage 5x SLOWER
    // (0.33 s single-task -> 1.63 s at 33 tasks) — the JDK sampled-audio
    // stack serializes on process-global service/provider state, so
    // parallel decoders contend instead of scaling. The single-task scan
    // is the faster shape for this codec on any core count.
    val media = Tables.documents(spark, sfDir).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val n = (id % 200).toInt + 50
        Multimodal.Media(id, Multimodal.synthWav(id, n), "audio/wav",
          Map("synthetic" -> "true"))
      })
    Multimodal.extractAudioFeatures(media).toDF()
  }

  val audioDecodeOracle: String =
    """WITH s AS (
      |  SELECT doc_id,
      |         abs(((2731 * i + doc_id) % 65536) - 32768) AS a
      |  FROM documents, range(0, 250) t(i)
      |  WHERE i < (doc_id % 200) + 50
      |)
      |SELECT doc_id AS media_id,
      |       CAST(8000 AS INTEGER) AS sample_rate,
      |       CAST(1 AS INTEGER) AS channels,
      |       CAST(16 AS INTEGER) AS bits,
      |       CAST((doc_id % 200) + 50 AS BIGINT) AS n_frames,
      |       CAST(SUM(a) AS BIGINT) AS abs_sum,
      |       CAST(MAX(a) AS INTEGER) AS peak
      |FROM s GROUP BY doc_id
      |""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_decode" -> (mediaDecode _),
    "media_frames" -> (mediaFrames _),
    "image_decode" -> (imageDecode _),
    "audio_decode" -> (audioDecode _),
  )

  val oracles: Map[String, String] = Map(
    "media_decode" -> mediaDecodeOracle,
    "media_frames" -> mediaFramesOracle,
    "image_decode" -> imageDecodeOracle,
    "audio_decode" -> audioDecodeOracle,
  )
}
