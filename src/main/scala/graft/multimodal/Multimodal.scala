package graft.multimodal

import graft.Tables
import graft.functions.PortableHash
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded in BATCHES through a typed mapPartitions —
  * the Spark-side shape a real vectorized image/audio decoder plugs
  * into (fixed batch size, one decoder instance per partition, columnar
  * in/out). The decode itself is a STUB (this container has no codec
  * libraries): a deterministic fake derives dimensions from the
  * payload's md5, which keeps the pipeline end-to-end testable and
  * oracle-checkable while the real codec is a drop-in replacement for
  * [[Decode.decodeBatch]].
  */
object Multimodal {

  /** Opaque media row: payload is the raw encoded bytes. */
  case class MediaRow(media_id: Long, payload: Array[Byte], kind: String)

  /** Typed decode output (what a codec would yield per item). */
  case class DecodedMedia(media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, aspect_milli: Int)

  /** Decoder batch size — real codecs amortize model/codec setup per
    * batch; the contract is batch-in/batch-out. */
  val BatchSize = 64

  object Decode {
    /** STUB decoder ???: stands in for an image codec (libjpeg etc.).
      * Deterministic fake — dimensions derived from md5(payload) — so
      * the surrounding plumbing (schema, batching, partitioning) is
      * real and verified even though no pixels are decoded. */
    def decodeBatch(batch: Seq[MediaRow]): Seq[DecodedMedia] =
      batch.map { m =>
        val h = PortableHash.h60(m.payload)
        val width = (16 + (h % 1024)).toInt
        val height = (16 + ((h / 1024) % 1024)).toInt
        DecodedMedia(m.media_id, m.kind, m.payload.length,
          width, height, (width * 1000 / height).toInt)
      }
  }

  /** Build the media table from the documents fixture (payload = utf-8
    * bytes of the text standing in for encoded media). */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).selectExpr(
      "doc_id AS media_id",
      "cast(text as binary) AS payload",
      "'image' AS kind")

  /** m01 — the full decode pipeline: binary payloads -> batched decode
    * -> typed metadata. Narrow plan (no shuffle); each partition streams
    * its rows through the decoder in BatchSize groups. */
  def m01(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).as[MediaRow]
      .mapPartitions(_.grouped(BatchSize).flatMap(Decode.decodeBatch))
      .toDF()
  }

  /** Oracle: md5(payload) == md5(text) because the payload IS the utf-8
    * text, so DuckDB replays the stub decoder arithmetic exactly. */
  val m01Sql: String =
    s"""SELECT media_id, kind, n_bytes, width, height,
       |  CAST(width * 1000 // height AS INT) AS aspect_milli
       |FROM (
       |  SELECT doc_id AS media_id, 'image' AS kind,
       |    CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       |    CAST(16 + h % 1024 AS INT) AS width,
       |    CAST(16 + (h // 1024) % 1024 AS INT) AS height
       |  FROM (SELECT doc_id, text, ${PortableHash.duckH60("text")} AS h
       |        FROM documents))""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_media_decode" -> (m01 _),
  )

  val oracleSql: Map[String, String] = Map(
    "m01_media_decode" -> m01Sql,
  )
}
