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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_decode" -> (mediaDecode _),
    "media_frames" -> (mediaFrames _),
  )

  val oracles: Map[String, String] = Map(
    "media_decode" -> mediaDecodeOracle,
    "media_frames" -> mediaFramesOracle,
  )
}
