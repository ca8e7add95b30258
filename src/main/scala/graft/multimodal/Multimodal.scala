package graft.multimodal

import graft.Tables
import graft.functions.PortableHash
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded in BATCHES through a typed mapPartitions —
  * the Spark-side shape a real vectorized image/audio decoder plugs
  * into (fixed batch size, one decoder instance per partition, columnar
  * in/out).
  *
  * EVERY media path decodes REAL bytes: payloads are valid binary PPM
  * (P6) images, RIFF/WAVE 16-bit PCM files, YUV4MPEG2 (.y4m)
  * uncompressed video streams, and baseline-sequential JPEGs
  * ([[Jpeg]]), and the parsers read them back — header walks, chunk
  * scans, frame-plane reads, and for m02 a full entropy-coded decode
  * (Huffman + dequant + IDCT) — with no codec libraries; all four
  * formats are fully specified by public docs (ITU-T T.81 for JPEG).
  * The generator and parser share no arithmetic: the oracle recomputes
  * every expected value independently from doc_id, so a parser bug
  * fails the gate. Inter-frame video (H.264) and perceptual audio
  * (Opus) remain out of scope — m05's Y4M path is the uncompressed
  * stand-in with the same plumbing.
  */
object Multimodal {

  /** Opaque media row: payload is the raw encoded bytes. */
  case class MediaRow(media_id: Long, payload: Array[Byte], kind: String)

  /** Typed decode output: header dimensions plus a checksum over the
    * actual pixel bytes (proof the parser read the payload body, not
    * just the header). */
  case class DecodedMedia(media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, aspect_milli: Int, pix_sum: Long)

  /** Decoder batch size — real codecs amortize model/codec setup per
    * batch; the contract is batch-in/batch-out. */
  val BatchSize = 64

  /** Deterministic VALID media payloads derived from doc_id alone, so
    * the DuckDB oracle can recompute the expected decode output without
    * parsing binary itself. */
  object MediaGen {
    /** Binary PPM (P6): `P6\n<w> <h>\n255\n` + 3·w·h RGB bytes.
      * w in [8,31], h in [8,31], pixel i = (id·31 + i·7) mod 256. */
    def ppm(docId: Long): Array[Byte] = {
      val w = (8 + Math.floorMod(docId, 24)).toInt
      val h = (8 + Math.floorMod(docId * 3, 24)).toInt
      val header = s"P6\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val px = Array.tabulate(3 * w * h)(i =>
        Math.floorMod(docId * 31 + i.toLong * 7, 256).toByte)
      header ++ px
    }

    /** RIFF/WAVE, mono 16-bit PCM @8 kHz: 44-byte canonical header +
      * n samples, n = 64 + id mod 128, sample i = (id·13 + i·17) mod
      * 2001 − 1000 (range ±1000, well inside 16-bit). */
    def wav(docId: Long): Array[Byte] = {
      val n = (64 + Math.floorMod(docId, 128)).toInt
      val dataSz = n * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataSz)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      bb.put("RIFF".getBytes(ascii)); bb.putInt(36 + dataSz)
      bb.put("WAVE".getBytes(ascii))
      bb.put("fmt ".getBytes(ascii)); bb.putInt(16)
      bb.putShort(1); bb.putShort(1)           // PCM, mono
      bb.putInt(8000); bb.putInt(16000)        // sample rate, byte rate
      bb.putShort(2); bb.putShort(16)          // block align, bits/sample
      bb.put("data".getBytes(ascii)); bb.putInt(dataSz)
      var i = 0
      while (i < n) {
        bb.putShort((Math.floorMod(docId * 13 + i.toLong * 17, 2001) - 1000).toShort)
        i += 1
      }
      bb.array()
    }

    /** YUV4MPEG2 uncompressed video: ASCII stream header
      * `YUV4MPEG2 W<w> H<h> F25:1 Ip A1:1 C444\n`, then per frame a
      * `FRAME\n` marker + 3·w·h raw plane bytes (Y,U,V at full
      * resolution under C444). w in [8,23], h in [8,23], frames
      * n = 2 + id mod 6, frame f's byte i = (id·7 + f·131 + i·3)
      * mod 256. */
    def y4m(docId: Long): Array[Byte] = {
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      val w = (8 + Math.floorMod(docId, 16)).toInt
      val h = (8 + Math.floorMod(docId * 5, 16)).toInt
      val nf = (2 + Math.floorMod(docId, 6)).toInt
      val out = new java.io.ByteArrayOutputStream()
      out.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C444\n".getBytes(ascii))
      var f = 0
      while (f < nf) {
        out.write("FRAME\n".getBytes(ascii))
        var i = 0
        val n = 3 * w * h
        while (i < n) {
          out.write(Math.floorMod(docId * 7 + f.toLong * 131 + i.toLong * 3, 256))
          i += 1
        }
        f += 1
      }
      out.toByteArray
    }
  }

  object Decode {
    /** Parse a binary PPM (P6): magic, whitespace/comment-tolerant
      * header ints, then the exact 3·w·h pixel body. Returns
      * (width, height, pixel byte sum). Throws on malformed input —
      * this is a parser, not a guesser. */
    def parsePpm(b: Array[Byte]): (Int, Int, Long) = {
      require(b.length > 2 && b(0) == 'P' && b(1) == '6', "not a P6 PPM")
      var i = 2
      def skipWs(): Unit = {
        while (i < b.length &&
          (b(i) == ' ' || b(i) == '\n' || b(i) == '\t' || b(i) == '\r')) i += 1
        if (i < b.length && b(i) == '#') { // header comment line
          while (i < b.length && b(i) != '\n') i += 1
          skipWs()
        }
      }
      def readInt(): Int = {
        skipWs()
        require(i < b.length && b(i) >= '0' && b(i) <= '9', "bad header int")
        var v = 0
        while (i < b.length && b(i) >= '0' && b(i) <= '9') {
          v = v * 10 + (b(i) - '0'); i += 1
        }
        v
      }
      val w = readInt(); val h = readInt(); val maxVal = readInt()
      require(maxVal == 255, s"unsupported maxval $maxVal")
      i += 1 // exactly one whitespace byte separates header from pixels
      require(b.length - i == 3 * w * h, "pixel body length mismatch")
      var s = 0L
      var j = i
      while (j < b.length) { s += (b(j) & 0xff); j += 1 }
      (w, h, s)
    }

    /** Parse a RIFF/WAVE file: verify the RIFF/WAVE magic, walk the
      * chunk list (word-aligned, per the RIFF spec) to `fmt ` (require
      * mono 16-bit PCM) and `data`, and return the little-endian
      * samples. Throws on malformed input. */
    def parseWav(b: Array[Byte]): Array[Short] = {
      def le32(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
      def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      def tag(o: Int): String =
        new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      require(b.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE",
        "not a RIFF/WAVE file")
      var o = 12
      var fmtOk = false
      var data: Array[Short] = null
      while (o + 8 <= b.length) {
        val id = tag(o); val sz = le32(o + 4)
        require(sz >= 0 && o + 8 + sz <= b.length, s"chunk $id overruns file")
        if (id == "fmt ") {
          require(le16(o + 8) == 1, "not PCM")
          require(le16(o + 10) == 1, "not mono")
          require(le16(o + 22) == 16, "not 16-bit")
          fmtOk = true
        } else if (id == "data") {
          val base = o + 8
          data = Array.tabulate(sz / 2)(k => le16(base + 2 * k).toShort)
        }
        o += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      require(fmtOk, "missing fmt chunk")
      require(data != null, "missing data chunk")
      data
    }

    /** Parsed Y4M clip: dimensions, frame count, and — for every
      * SampleEvery-th frame — the byte sum over its raw planes (proof
      * the parser read the sampled frame BODIES, not just counted
      * markers). */
    final case class Y4mClip(width: Int, height: Int, nFrames: Int,
        nSampled: Int, sampledSum: Long)

    /** Parse a YUV4MPEG2 stream: the ASCII stream-header line (require
      * the W/H tags; C defaults to 420 per spec, so an explicit C444 is
      * required here — subsampled layouts are a different plane size,
      * not a silent fallback), then per frame a FRAME line (parameters
      * after the marker are legal and skipped) followed by exactly
      * 3·w·h plane bytes. Decimation happens INSIDE the parse: frames
      * off the sample grid are skipped by offset arithmetic, never
      * summed — at real scale that is the whole point of sampled
      * decode (seek, don't read). Throws on malformed input. */
    def parseY4m(b: Array[Byte], sampleEvery: Int = SampleEvery): Y4mClip = {
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      var i = 0
      def readLine(): String = {
        val start = i
        while (i < b.length && b(i) != '\n') i += 1
        require(i < b.length, "unterminated header line")
        i += 1 // consume the newline
        new String(b, start, i - 1 - start, ascii)
      }
      val header = readLine()
      val toks = header.split(' ')
      require(toks.head == "YUV4MPEG2", "not a YUV4MPEG2 stream")
      def tagVal(t: Char): Option[String] =
        toks.tail.find(x => x.nonEmpty && x.head == t).map(_.tail)
      val w = tagVal('W').getOrElse(
        throw new IllegalArgumentException("missing W tag")).toInt
      val h = tagVal('H').getOrElse(
        throw new IllegalArgumentException("missing H tag")).toInt
      // bound the product in Long BEFORE the Int frame size: a crafted
      // W/H pair can overflow 3*w*h negative, walking the cursor
      // backward past every truncation check
      require(w > 0 && h > 0 && 3L * w * h <= b.length,
        "bad dimensions")
      val chroma = tagVal('C').getOrElse("420")
      require(chroma == "444", s"unsupported chroma layout C$chroma")
      val frameBytes = 3 * w * h
      var nFrames = 0
      var nSampled = 0
      var sum = 0L
      while (i < b.length) {
        val marker = readLine()
        require(marker == "FRAME" || marker.startsWith("FRAME "),
          "bad FRAME marker")
        require(i + frameBytes <= b.length, "truncated frame body")
        if (nFrames % sampleEvery == 0) {
          var j = i
          val end = i + frameBytes
          while (j < end) { sum += (b(j) & 0xff); j += 1 }
          nSampled += 1
        }
        i += frameBytes // skipped frames are a seek, not a read
        nFrames += 1
      }
      require(nFrames > 0, "no frames")
      Y4mClip(w, h, nFrames, nSampled, sum)
    }

    /** Image decode over a batch: parse each payload's header and
      * pixel body. Batch-in/batch-out — a vectorized codec drops into
      * this same signature. */
    def decodeBatch(batch: Seq[MediaRow]): Seq[DecodedMedia] =
      batch.map { m =>
        val (w, h, pixSum) = parsePpm(m.payload)
        DecodedMedia(m.media_id, m.kind, m.payload.length,
          w, h, w * 1000 / h, pixSum)
      }

    /** Clip-level PCM features from parsed samples: count, energy
      * Σ amp², zero crossings (voicedness proxy), peak |amp|
      * (clipping detector). */
    def pcmFeatures(samples: Array[Short]): (Int, Long, Int, Int) = {
      var energy = 0L; var zcr = 0; var peak = 0
      var i = 0
      while (i < samples.length) {
        val a = samples(i).toInt
        energy += a.toLong * a
        if (i > 0 && (samples(i - 1) < 0) != (a < 0)) zcr += 1
        if (math.abs(a) > peak) peak = math.abs(a)
        i += 1
      }
      (samples.length, energy, zcr, peak)
    }
  }

  /** Image table: one valid binary PPM per document row, synthesized
    * from doc_id (the fixture ships no real media; at deploy the same
    * schema reads encoded bytes from any binary column). */
  def imageTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select("doc_id").as[Long]
      .map(id => MediaRow(id, MediaGen.ppm(id), "image"))
      .toDF()
  }

  /** Audio table: one valid mono 16-bit PCM WAV per document row. */
  def audioTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select("doc_id").as[Long]
      .map(id => MediaRow(id, MediaGen.wav(id), "audio"))
      .toDF()
  }

  /** JPEG table: one valid baseline-sequential grayscale JPEG per
    * document row (real markers, real Huffman entropy coding — see
    * [[JpegGen]]). */
  def jpegTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select("doc_id").as[Long]
      .map(id => MediaRow(id, JpegGen.jpeg(id), "image_jpeg"))
      .toDF()
  }

  /** m01 — the full image decode pipeline: binary payloads -> batched
    * parse -> typed metadata + pixel checksum. Narrow plan (no
    * shuffle); each partition streams its rows through the decoder in
    * BatchSize groups. */
  def m01(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    imageTable(s, d).as[MediaRow]
      .mapPartitions(_.grouped(BatchSize).flatMap(Decode.decodeBatch))
      .toDF()
  }

  /** Oracle: recomputes the expected decode output from doc_id alone —
    * header length arithmetic for n_bytes, the generator's pixel
    * formula for pix_sum — sharing NO code with the Spark-side parser,
    * which must read the same numbers out of the actual bytes. */
  val m01Sql: String =
    """SELECT media_id, kind,
      |  CAST(9 + len(CAST(width AS VARCHAR)) + len(CAST(height AS VARCHAR))
      |       + 3 * width * height AS INT) AS n_bytes,
      |  width, height,
      |  CAST(width * 1000 // height AS INT) AS aspect_milli,
      |  CAST(list_sum(list_transform(range(0, 3 * width * height),
      |    i -> (media_id * 31 + i * 7) % 256)) AS BIGINT) AS pix_sum
      |FROM (
      |  SELECT doc_id AS media_id, 'image' AS kind,
      |    CAST(8 + doc_id % 24 AS INT) AS width,
      |    CAST(8 + (doc_id * 3) % 24 AS INT) AS height
      |  FROM documents)""".stripMargin

  /** Video frame-sampling stride (m05 keeps every 4th frame). */
  val SampleEvery = 4

  // ---------------------------------------------------------------- m02
  /** m02 — COMPRESSED-codec decode, the last media family that was a
    * declared stub: each payload is a real baseline-sequential JPEG
    * (markers, quantization + Annex K Huffman tables, entropy-coded
    * data with byte stuffing) and [[JpegDecode.parseJpeg]] runs the
    * full pipeline — Huffman decode, DC prediction, dequantization,
    * IDCT, level shift, edge crop — with no codec libraries. Same
    * batched typed mapPartitions (narrow plan) as the other decodes.
    * The gate hashes the decoded PIXEL SUM: the oracle recomputes it
    * from doc_id via the generator's block formula ([[JpegGen.dims]]),
    * which round-trips exactly because the fixture's blocks are
    * constant (DC-only, losslessly quantized by construction) — any
    * Huffman/IDCT/crop bug shifts the sum and fails the hash. */
  def m02(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    jpegTable(s, d).as[MediaRow]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map { m =>
        val img = JpegDecode.parseJpeg(m.payload)
        (m.media_id, img.width, img.height, img.nBlocks, img.pixSum)
      }))
      .toDF("media_id", "width", "height", "n_blocks", "pix_sum")
  }

  val m02Sql: String =
    """SELECT media_id, width, height, CAST(bw * bh AS INT) AS n_blocks,
      |  CAST(list_sum(list_transform(range(0, bw * bh), k ->
      |    ((media_id * 31 + k * 7) % 256) *
      |    least(8, width - (k % bw) * 8) *
      |    least(8, height - (k // bw) * 8))) AS BIGINT) AS pix_sum
      |FROM (
      |  SELECT doc_id AS media_id,
      |    CAST(1 + doc_id % 3 AS INT) AS bw,
      |    CAST(1 + (doc_id // 3) % 3 AS INT) AS bh,
      |    CAST(8 * (1 + doc_id % 3) - doc_id % 5 AS INT) AS width,
      |    CAST(8 * (1 + (doc_id // 3) % 3) - (doc_id * 7) % 5 AS INT) AS height
      |  FROM documents)""".stripMargin

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
    """SELECT media_id, width, height,
      |  CAST(CASE WHEN width >= height THEN 256 ELSE width * 256 // height END AS INT) AS new_width,
      |  CAST(CASE WHEN width >= height THEN height * 256 // width ELSE 256 END AS INT) AS new_height
      |FROM (
      |  SELECT doc_id AS media_id,
      |    CAST(8 + doc_id % 24 AS INT) AS width,
      |    CAST(8 + (doc_id * 3) % 24 AS INT) AS height
      |  FROM documents)""".stripMargin

  // ---------------------------------------------------------------- m04
  /** m04 — audio feature extraction: parse each WAV payload (RIFF
    * chunk walk, 16-bit LE PCM) and extract the classic clip-level
    * features a speech-filtering pipeline keys on. Same batched typed
    * mapPartitions as the image decode (one decoder per partition,
    * BatchSize items per call, narrow plan); the oracle recomputes the
    * expected samples from doc_id via the generator formula. */
  def m04(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    audioTable(s, d).as[MediaRow]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map { m =>
        val (n, energy, zcr, peak) = Decode.pcmFeatures(Decode.parseWav(m.payload))
        (m.media_id, n, energy, zcr, peak)
      }))
      .toDF("media_id", "n_samples", "energy", "zcr", "peak")
  }

  val m04Sql: String =
    """SELECT media_id, CAST(len(a) AS INT) AS n_samples,
      |  CAST(list_sum(list_transform(a, x -> x * x)) AS BIGINT) AS energy,
      |  CAST(list_sum(list_transform(range(2, len(a) + 1),
      |    i -> CASE WHEN (a[i-1] < 0) <> (a[i] < 0) THEN 1 ELSE 0 END)) AS INT) AS zcr,
      |  CAST(list_max(list_transform(a, x -> abs(x))) AS INT) AS peak
      |FROM (
      |  SELECT doc_id AS media_id,
      |    list_transform(range(0, 64 + doc_id % 128),
      |      i -> (doc_id * 13 + i * 17) % 2001 - 1000) AS a
      |  FROM documents)""".stripMargin

  /** Video table: one valid YUV4MPEG2 clip per document row. */
  def videoTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select("doc_id").as[Long]
      .map(id => MediaRow(id, MediaGen.y4m(id), "video"))
      .toDF()
  }

  // ---------------------------------------------------------------- m05
  /** m05 — REAL video decode + frame sampling: parse each Y4M payload
    * (stream header, FRAME markers, raw C444 planes), keep every
    * SampleEvery-th frame, and sum the sampled frames' plane bytes.
    * Same batched typed mapPartitions as the image/audio decodes;
    * skipped frames are seeks, so a sampled decode reads ~1/SampleEvery
    * of each clip's body — the I/O shape that matters when the clips
    * are gigabytes, not rows. The oracle recomputes dimensions, frame
    * counts, and the sampled byte sums from doc_id via the generator
    * formulas, sharing no code with the parser. */
  def m05(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    videoTable(s, d).as[MediaRow]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map { m =>
        val c = Decode.parseY4m(m.payload)
        (m.media_id, c.width, c.height, c.nFrames, c.nSampled, c.sampledSum)
      }))
      .toDF("media_id", "width", "height", "n_frames", "n_sampled",
        "sampled_sum")
  }

  val m05Sql: String =
    s"""SELECT media_id, width, height, n_frames,
       |  CAST((n_frames + ${SampleEvery - 1}) // $SampleEvery AS INT) AS n_sampled,
       |  CAST(list_sum(list_transform(range(0, n_frames), f ->
       |    CASE WHEN f % $SampleEvery = 0 THEN list_sum(list_transform(
       |      range(0, 3 * width * height),
       |      i -> (media_id * 7 + f * 131 + i * 3) % 256)) ELSE 0 END))
       |    AS BIGINT) AS sampled_sum
       |FROM (
       |  SELECT doc_id AS media_id,
       |    CAST(8 + doc_id % 16 AS INT) AS width,
       |    CAST(8 + (doc_id * 5) % 16 AS INT) AS height,
       |    CAST(2 + doc_id % 6 AS INT) AS n_frames
       |  FROM documents)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_media_decode" -> (m01 _),
    "m02_jpeg_decode" -> (m02 _),
    "m03_resize" -> (m03 _),
    "m04_audio_features" -> (m04 _),
    "m05_video_decode" -> (m05 _),
  )

  val oracleSql: Map[String, String] = Map(
    "m01_media_decode" -> m01Sql,
    "m02_jpeg_decode" -> m02Sql,
    "m03_resize" -> m03Sql,
    "m04_audio_features" -> m04Sql,
    "m05_video_decode" -> m05Sql,
  )
}
