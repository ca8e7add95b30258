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

  /** Frame size for the frame-sampling stub (a video decoder would
    * yield real frames; chunking the payload keeps the plumbing and
    * arithmetic identical). */
  val FrameBytes = 1024
  val SampleEvery = 4

  // ---------------------------------------------------------------- m02
  /** m02 — frame sampling: treat the payload as fixed-size frames,
    * keep every SampleEvery-th (the standard video-pipeline decimation
    * shape). Emits frame counts and the portable hash of the first
    * sampled frame so the oracle can check the actual sampled BYTES,
    * not just the arithmetic. */
  /** Per-document frame stats: (n_frames, n_sampled, first_frame_hash).
    * Counts and slices by CODE POINTS, not UTF-16 units: DuckDB's
    * length/substr count code points, and slicing on a char index could
    * split a surrogate pair (different hashed bytes) for supplementary-
    * plane text even when the counts happen to agree. */
  private[multimodal] def frameStats(text: String): (Int, Int, Long) = {
    val nCp = text.codePointCount(0, text.length)
    val nFrames = (nCp + FrameBytes - 1) / FrameBytes
    val nSampled = (nFrames + SampleEvery - 1) / SampleEvery
    val first = text.substring(0,
      text.offsetByCodePoints(0, math.min(FrameBytes, nCp)))
    (nFrames, nSampled, PortableHash.h60(first))
  }

  def m02(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // frames are CHAR windows (not byte windows): DuckDB cannot slice
    // BLOBs, and a char window hashes to identical UTF-8 bytes on both
    // engines regardless of content
    mediaTable(s, d).as[MediaRow]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map { m =>
        val text = new String(m.payload, java.nio.charset.StandardCharsets.UTF_8)
        val (nFrames, nSampled, firstH) = frameStats(text)
        (m.media_id, nFrames, nSampled, firstH)
      }))
      .toDF("media_id", "n_frames", "n_sampled", "first_frame_h")
  }

  val m02Sql: String =
    s"""SELECT doc_id AS media_id,
       |  CAST((length(text) + ${FrameBytes - 1}) // $FrameBytes AS INT) AS n_frames,
       |  CAST(((length(text) + ${FrameBytes - 1}) // $FrameBytes + ${SampleEvery - 1}) // $SampleEvery AS INT) AS n_sampled,
       |  ${PortableHash.duckH60(s"substr(text, 1, $FrameBytes)")} AS first_frame_h
       |FROM documents""".stripMargin

  // ---------------------------------------------------------------- m03
  /** m03 — resize: fit decoded dimensions into a 256-box preserving
    * aspect ratio, integer arithmetic only (deterministic everywhere).
    * Composes on top of the m01 decode output — the typed pipeline
    * chains like any DataFrame transform. */
  def m03(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    m01(s, d).select(
      col("media_id"), col("width"), col("height"),
      when(col("width") >= col("height"),
        lit(256)).otherwise(expr("width * 256 div height")).as("new_width"),
      when(col("width") >= col("height"),
        expr("height * 256 div width")).otherwise(lit(256)).as("new_height"))
  }

  val m03Sql: String =
    s"""SELECT media_id, width, height,
       |  CAST(CASE WHEN width >= height THEN 256 ELSE width * 256 // height END AS INT) AS new_width,
       |  CAST(CASE WHEN width >= height THEN height * 256 // width ELSE 256 END AS INT) AS new_height
       |FROM (
       |  SELECT doc_id AS media_id,
       |    CAST(16 + h % 1024 AS INT) AS width,
       |    CAST(16 + (h // 1024) % 1024 AS INT) AS height
       |  FROM (SELECT doc_id, ${PortableHash.duckH60("text")} AS h FROM documents))""".stripMargin

  // ---------------------------------------------------------------- m04
  /** m04 — audio feature extraction: treat the payload as a PCM sample
    * stream (STUB: one signed-byte sample per code point, amp =
    * cp % 256 − 128 — a real decoder would emit true samples into the
    * same batch shape) and extract the classic clip-level features a
    * speech-filtering pipeline keys on: sample count, total energy
    * Σ amp², zero-crossing count (voicedness proxy), and peak |amp|
    * (clipping detector). Integer arithmetic only, so the oracle replays
    * it exactly; the Spark side runs the same batched typed
    * mapPartitions as the image decode (one "decoder" per partition,
    * BatchSize items per call, narrow plan). */
  private[multimodal] def audioFeatures(text: String): (Int, Long, Int, Int) = {
    val amps = text.codePoints().toArray.map(cp => cp % 256 - 128)
    var energy = 0L; var zcr = 0; var peak = 0
    var i = 0
    while (i < amps.length) {
      val a = amps(i)
      energy += a.toLong * a
      if (i > 0 && (amps(i - 1) < 0) != (a < 0)) zcr += 1
      if (math.abs(a) > peak) peak = math.abs(a)
      i += 1
    }
    (amps.length, energy, zcr, peak)
  }

  def m04(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).as[MediaRow]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map { m =>
        val text = new String(m.payload, java.nio.charset.StandardCharsets.UTF_8)
        val (n, energy, zcr, peak) = audioFeatures(text)
        (m.media_id, n, energy, zcr, peak)
      }))
      .toDF("media_id", "n_samples", "energy", "zcr", "peak")
  }

  val m04Sql: String =
    """SELECT media_id, CAST(len(a) AS INT) AS n_samples,
      |  CAST(coalesce(list_sum(list_transform(a, x -> CAST(x AS BIGINT) * x)), 0) AS BIGINT) AS energy,
      |  CAST(coalesce(list_sum(list_transform(range(2, len(a) + 1),
      |    i -> CASE WHEN (a[i-1] < 0) <> (a[i] < 0) THEN 1 ELSE 0 END)), 0) AS INT) AS zcr,
      |  CAST(coalesce(list_max(list_transform(a, x -> abs(x))), 0) AS INT) AS peak
      |FROM (
      |  SELECT doc_id AS media_id, list_transform(range(1, length(text) + 1),
      |    i -> unicode(substr(text, i, 1)) % 256 - 128) AS a
      |  FROM documents)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_media_decode" -> (m01 _),
    "m02_frame_sample" -> (m02 _),
    "m03_resize" -> (m03 _),
    "m04_audio_features" -> (m04 _),
  )

  val oracleSql: Map[String, String] = Map(
    "m01_media_decode" -> m01Sql,
    "m02_frame_sample" -> m02Sql,
    "m03_resize" -> m03Sql,
    "m04_audio_features" -> m04Sql,
  )
}
