package graft.multimodal

/** Baseline-sequential JPEG (ITU-T T.81), pure JVM — the compressed
  * codec the media pipeline previously declared out of scope. Two
  * independent halves:
  *
  *  - [[JpegGen]] ENCODES deterministic grayscale fixtures (the same
  *    synthesize-from-doc_id discipline as the PPM/WAV/Y4M generators):
  *    per-block constant values, so the decoded pixels are exactly
  *    predictable — a constant 8×8 block has only a DC coefficient
  *    (8·(c−128) under the T.81 FDCT), the DC quantizer is 8, and the
  *    double-precision IDCT of a DC-only block is division by 8, exact
  *    in IEEE doubles — quantization is lossless on this input BY
  *    CONSTRUCTION, so the oracle recomputes pixels from doc_id alone.
  *
  *  - [[JpegDecode]] is a REAL baseline decoder: marker walk, DQT
  *    (zigzag→natural), DHT (canonical Huffman via the spec's own
  *    MINCODE/MAXCODE/VALPTR algorithm, F.2.2.3), SOF0, SOS, entropy
  *    decode with byte-unstuffing and restart-marker handling, DC
  *    prediction, AC run-length (EOB/ZRL), dequantization, float IDCT,
  *    level shift + clamp, edge crop. It decodes any spec-conforming
  *    single-component baseline stream, not just the fixture's.
  *
  * The two halves share only public spec constants (the zigzag scan
  * and the Annex K example Huffman tables — which travel INSIDE the
  * file via DHT anyway); all arithmetic is implemented twice, so an
  * encoder bug and a decoder bug cannot cancel.
  */
object Jpeg {

  /** Zigzag scan order: zigzag index → natural (row-major) index
    * (T.81 Figure 5). */
  private[multimodal] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.3.1 luminance DC table: code counts per length 1..16 and
    * the category values in code order. */
  private[multimodal] val DcBits: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private[multimodal] val DcVals: Array[Int] = (0 to 11).toArray

  /** Annex K.3.2 luminance AC table. */
  private[multimodal] val AcBits: Array[Int] =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private[multimodal] val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** DC quantizer: 8 makes the DC of a constant block an exact integer
    * (see the object scaladoc); AC quantizer is the arbitrary 16 (every
    * fixture AC coefficient is 0 regardless). */
  private val QDc = 8
  private val QAc = 16
}

/** Fixture encoder: grayscale baseline JPEG whose 8×8 blocks are each
  * one constant value derived from doc_id. Dimensions are deliberately
  * NOT multiples of 8 (edge blocks pad by replication — a constant
  * block pads to itself), so the decoder's crop path is exercised. */
object JpegGen {
  import Jpeg._

  /** Block grid and pixel formula — the contract the DuckDB oracle
    * replays: bw = 1+id%3 block cols, bh = 1+(id/3)%3 block rows
    * (integer division, so bh cycles independently of bw and hits 2
    * and 3 — multi-row decode paths are exercised), width = 8·bw −
    * id%5, height = 8·bh − (id·7)%5, block k (raster order) is the
    * constant (id·31 + k·7) mod 256. */
  def dims(docId: Long): (Int, Int, Int, Int) = {
    val bw = (1 + Math.floorMod(docId, 3)).toInt
    val bh = (1 + Math.floorMod(docId / 3, 3)).toInt
    (bw, bh, 8 * bw - Math.floorMod(docId, 5).toInt,
      8 * bh - Math.floorMod(docId * 7, 5).toInt)
  }

  def blockValue(docId: Long, k: Int): Int =
    Math.floorMod(docId * 31 + k.toLong * 7, 256).toInt

  /** Canonical Huffman assignment: value → (code, length). */
  private def canonicalCodes(bits: Array[Int], vals: Array[Int])
      : Map[Int, (Int, Int)] = {
    var code = 0
    var vi = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      for (_ <- 0 until bits(len - 1)) {
        out += vals(vi) -> (code, len)
        code += 1
        vi += 1
      }
      code <<= 1
    }
    out.result()
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = if (nbits > 0) put((1 << (8 - nbits)) - 1, 8 - nbits)
  }

  def jpeg(docId: Long): Array[Byte] = {
    val (bw, bh, w, h) = dims(docId)
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def segment(m: Int, payload: Array[Int]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      payload.foreach(out.write)
    }
    marker(0xd8) // SOI
    // APP0/JFIF — carries no decode semantics; present so the decoder's
    // unknown-segment skip is a load-bearing path, not dead code
    segment(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // DQT: table 0, 8-bit, values in zigzag order (zigzag 0 IS the DC)
    segment(0xdb, Array(0x00) ++ Array.tabulate(64)(i => if (i == 0) 8 else 16))
    // SOF0: 8-bit precision, 1 component, no subsampling
    segment(0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 1,
      1, 0x11, 0))
    // DHT: DC class 0 id 0, AC class 1 id 0 (Annex K luminance tables)
    segment(0xc4, Array(0x00) ++ DcBits ++ DcVals)
    segment(0xc4, Array(0x10) ++ AcBits ++ AcVals)
    // SOS: 1 component, DC/AC table 0, full spectral range
    segment(0xda, Array(1, 1, 0x00, 0, 63, 0))
    val dcCodes = canonicalCodes(DcBits, DcVals)
    val acCodes = canonicalCodes(AcBits, AcVals)
    val bits = new BitWriter(out)
    var pred = 0
    var k = 0
    val n = bw * bh
    while (k < n) {
      val dc = blockValue(docId, k) - 128 // quantized DC = 8·dc / QDc=8
      val diff = dc - pred
      pred = dc
      val cat = 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (c, l) = dcCodes(cat)
      bits.put(c, l)
      if (cat > 0)
        bits.put(if (diff >= 0) diff else diff + (1 << cat) - 1, cat)
      val (eob, el) = acCodes(0x00) // all 63 ACs are zero
      bits.put(eob, el)
      k += 1
    }
    bits.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }
}

/** Baseline-sequential JPEG decoder (single-component / grayscale;
  * multi-component color needs chroma upsampling + YCbCr conversion and
  * is rejected with a clear message, not silently mis-decoded). */
object JpegDecode {
  import Jpeg._

  final case class JpegImage(width: Int, height: Int, nBlocks: Int,
      pixSum: Long)

  /** Spec-algorithm Huffman table (F.2.2.3): per code length, the
    * smallest/largest code and the index of its first value. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var vi = 0
      for (l <- 1 to 16) {
        if (bits(l - 1) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = vi
          minCode(l) = code
          code += bits(l - 1); vi += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
      }
    }
    def value(len: Int, code: Int): Int = vals(valPtr(len) + code - minCode(len))
  }

  /** Entropy-segment bit reader: unstuffs 0xFF00, resynchronizes at
    * RSTn. A non-stuffing marker reached mid-decode means the stream
    * lied about its coefficient count — malformed, throw. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0

    def bit(): Int = {
      if (nbits == 0) {
        require(pos < b.length, "truncated entropy segment")
        val byte = b(pos) & 0xff
        pos += 1
        if (byte == 0xff) {
          require(pos < b.length, "truncated after 0xFF")
          require((b(pos) & 0xff) == 0x00,
            "marker inside an entropy-coded segment")
          pos += 1 // the stuffed 0x00
        }
        acc = byte; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }

    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    def huff(t: HuffTable): Int = {
      var code = bit()
      var l = 1
      while (l <= 16 && (t.maxCode(l) < 0 || code > t.maxCode(l))) {
        code = (code << 1) | bit()
        l += 1
      }
      require(l <= 16, "invalid Huffman code")
      t.value(l, code)
    }

    /** Byte-align and consume an expected restart marker. */
    def restart(expected: Int): Unit = {
      nbits = 0
      require(pos + 1 < b.length && (b(pos) & 0xff) == 0xff &&
        (b(pos + 1) & 0xff) == expected,
        f"missing restart marker RST${expected - 0xd0}")
      pos += 2
    }

    /** Byte-align and return the next marker code. */
    def nextMarker(): Int = {
      nbits = 0
      require(pos + 1 < b.length && (b(pos) & 0xff) == 0xff,
        "missing trailing marker")
      pos += 1
      while (pos + 1 < b.length && (b(pos) & 0xff) == 0xff) pos += 1 // fill
      val m = b(pos) & 0xff
      pos += 1
      m
    }
  }

  /** T.81 F.2.2.1 EXTEND: map the `n` received magnitude bits to the
    * signed coefficient. */
  private def extend(v: Int, n: Int): Int =
    if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v

  private val CosTable: Array[Double] = {
    val t = new Array[Double](64)
    for (x <- 0 until 8; u <- 0 until 8)
      t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
    t
  }
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  /** Reference float IDCT (T.81 A.3.3) — O(64²) per block; a SIMD/AAN
    * kernel is a drop-in swap, exactness on DC-only blocks is what the
    * gate needs. Output: level-shifted, clamped pixels. */
  private def idct(coef: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cy = CosTable(y * 8 + v) * (if (v == 0) InvSqrt2 else 1.0)
          var u = 0
          while (u < 8) {
            val c = coef(v * 8 + u)
            if (c != 0)
              s += c * cy * CosTable(x * 8 + u) * (if (u == 0) InvSqrt2 else 1.0)
            u += 1
          }
          v += 1
        }
        val p = Math.round(s / 4.0 + 128.0).toInt
        out(y * 8 + x) = math.max(0, math.min(255, p))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Parse + fully decode a baseline grayscale JPEG; returns dimensions,
    * block count, and the sum of the decoded (cropped) pixels. Throws
    * on malformed input — a parser, not a guesser. */
  def parseJpeg(b: Array[Byte]): JpegImage = {
    require(b.length > 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8,
      "not a JPEG (missing SOI)")
    var pos = 2
    def u8(): Int = {
      require(pos < b.length, "truncated segment")
      val v = b(pos) & 0xff; pos += 1; v
    }
    def u16(): Int = {
      require(pos + 1 < b.length, "truncated segment")
      val v = ((b(pos) & 0xff) << 8) | (b(pos + 1) & 0xff); pos += 2; v
    }

    val qt = new Array[Array[Int]](4)
    val dcT = new Array[HuffTable](4)
    val acT = new Array[HuffTable](4)
    var w = 0; var h = 0
    var qSel = -1
    var dcSel = -1; var acSel = -1
    var restartInterval = 0
    var sos = false

    while (!sos) {
      require(pos + 1 < b.length, "truncated before SOS")
      require(u8() == 0xff, "expected marker")
      var m = u8()
      while (m == 0xff) m = u8() // fill bytes
      m match {
        case 0xd9 => throw new IllegalArgumentException("EOI before SOS")
        case 0xdb => // DQT
          val end = { val len = u16(); pos + len - 2 } // pos AFTER u16: payload spans [pos, end)
          while (pos < end) {
            val pqTq = u8()
            require((pqTq >> 4) == 0, "only 8-bit quantizers (baseline)")
            val id = pqTq & 15
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(Zigzag(i)) = u8(); i += 1 }
            qt(id) = t
          }
          require(pos == end, "DQT length mismatch")
        case 0xc4 => // DHT
          val end = { val len = u16(); pos + len - 2 } // pos AFTER u16: payload spans [pos, end)
          while (pos < end) {
            val tcTh = u8()
            val bits = Array.fill(16)(u8())
            val vals = Array.fill(bits.sum)(u8())
            val t = new HuffTable(bits, vals)
            if ((tcTh >> 4) == 0) dcT(tcTh & 15) = t else acT(tcTh & 15) = t
          }
          require(pos == end, "DHT length mismatch")
        case 0xc0 => // SOF0 baseline
          val end = { val len = u16(); pos + len - 2 } // pos AFTER u16: payload spans [pos, end)
          require(u8() == 8, "baseline precision must be 8")
          h = u16(); w = u16()
          require(w > 0 && h > 0, "bad dimensions")
          val nc = u8()
          require(nc == 1,
            s"$nc components: only single-component (grayscale) streams supported")
          u8() // component id
          require(u8() == 0x11, "subsampling on a single component")
          qSel = u8()
          require(pos == end, "SOF0 length mismatch")
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
             0xcd | 0xce | 0xcf =>
          throw new IllegalArgumentException(
            f"SOF marker 0xFF$m%02X: not baseline-sequential")
        case 0xdd => // DRI
          require(u16() == 4, "bad DRI length")
          restartInterval = u16()
        case 0xda => // SOS
          val end = { val len = u16(); pos + len - 2 } // pos AFTER u16: payload spans [pos, end)
          require(u8() == 1, "scan component count must be 1")
          u8() // component selector
          val tdTa = u8()
          dcSel = tdTa >> 4; acSel = tdTa & 15
          require(u8() == 0 && u8() == 63 && u8() == 0,
            "baseline scan must cover the full spectral range")
          require(pos == end, "SOS length mismatch")
          sos = true
        case _ => // APPn / COM / anything else with a length: skip
          val len = u16(); pos += len - 2 // skip the payload
      }
    }
    require(w > 0, "missing SOF0")
    require(qt(qSel) != null, s"missing quantization table $qSel")
    require(dcT(dcSel) != null && acT(acSel) != null, "missing Huffman tables")

    val q = qt(qSel)
    val dc = dcT(dcSel)
    val ac = acT(acSel)
    val bx = (w + 7) / 8
    val by = (h + 7) / 8
    val r = new BitReader(b, pos)
    var pred = 0
    var pixSum = 0L
    var mcu = 0
    var rst = 0
    val coef = new Array[Int](64)
    var blkY = 0
    while (blkY < by) {
      var blkX = 0
      while (blkX < bx) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          r.restart(0xd0 + rst)
          rst = (rst + 1) & 7
          pred = 0
        }
        java.util.Arrays.fill(coef, 0)
        val cat = r.huff(dc)
        pred += extend(r.receive(cat), cat)
        coef(0) = pred * q(0)
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val rs = r.huff(ac)
          val run = rs >> 4
          val size = rs & 15
          if (size == 0) {
            if (run == 15) k += 16 // ZRL
            else eob = true
          } else {
            k += run
            require(k < 64, "AC run past block end")
            coef(Zigzag(k)) = extend(r.receive(size), size) * q(Zigzag(k))
            k += 1
          }
        }
        val px = idct(coef)
        // crop: only pixels inside w×h count
        val xs = math.min(8, w - blkX * 8)
        val ys = math.min(8, h - blkY * 8)
        var yy = 0
        while (yy < ys) {
          var xx = 0
          while (xx < xs) { pixSum += px(yy * 8 + xx); xx += 1 }
          yy += 1
        }
        mcu += 1
        blkX += 1
      }
      blkY += 1
    }
    require(r.nextMarker() == 0xd9, "missing EOI")
    JpegImage(w, h, bx * by, pixSum)
  }
}
