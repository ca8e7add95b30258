package graft.multimodal

import graft.functions.PortableHash
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  test("JPEG decoder reads back exactly what the generator encoded") {
    for (id <- Seq(0L, 1L, 7L, 42L, 128L, 499L)) {
      val (bw, bh, w, h) = JpegGen.dims(id)
      val img = JpegDecode.parseJpeg(JpegGen.jpeg(id))
      assert(img.width == w && img.height == h, s"dims for id=$id")
      assert(img.nBlocks == bw * bh)
      // expected pixel sum: per block, its constant value times the
      // VISIBLE (cropped) pixel count
      val expected = (0 until bw * bh).map { k =>
        val bx = k % bw; val by = k / bw
        JpegGen.blockValue(id, k).toLong *
          math.min(8, w - 8 * bx) * math.min(8, h - 8 * by)
      }.sum
      assert(img.pixSum == expected, s"pixSum for id=$id")
    }
  }

  test("JPEG decoder handles a non-trivial AC coefficient stream") {
    // Hand-roll an 8x8 stream with one nonzero AC coefficient: DC cat 0
    // (diff 0) then AC (run=2, size=1, bit=1) then EOB. Exercises the
    // run-length skip, EXTEND on a 1-bit positive value, and the
    // dequant path the constant fixtures never hit. The decoded block
    // is IDCT(AC at zigzag index 3 = (1,0) vertical frequency).
    val out = new java.io.ByteArrayOutputStream()
    def seg(m: Int, p: Array[Int]): Unit = {
      out.write(0xff); out.write(m)
      out.write((p.length + 2) >> 8); out.write((p.length + 2) & 0xff)
      p.foreach(out.write)
    }
    out.write(0xff); out.write(0xd8)
    seg(0xdb, Array(0x00) ++ Array.fill(64)(16))
    seg(0xc0, Array(8, 0, 8, 0, 8, 1, 1, 0x11, 0))
    seg(0xc4, Array(0x00) ++ Jpeg.DcBits ++ Jpeg.DcVals)
    seg(0xc4, Array(0x10) ++ Jpeg.AcBits ++ Jpeg.AcVals)
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0))
    // entropy, canonical codes from the Annex K tables: DC cat 0 is
    // the length-2 code 00; AC rs=0x21 is the 9th value -> length-5
    // code 11100; one magnitude bit (1 = +1); EOB (0x00) is the
    // length-4 code 1010. Bits: 00 11100 1 1010 = 12 bits -> pad 4
    // ones: 0011 1001 1010 1111 = 0x39 0xAF
    out.write(0x39); out.write(0xaf)
    out.write(0xff); out.write(0xd9)
    val img = JpegDecode.parseJpeg(out.toByteArray)
    assert(img.width == 8 && img.height == 8 && img.nBlocks == 1)
    // run=2 skips to zigzag index 3 = natural (v=2, u=0): dequantized
    // coefficient 1*16, IDCT'd, +128, rounded, clamped
    val expected = (0 until 8).flatMap { y =>
      (0 until 8).map { x =>
        val s = 16.0 * (1.0 / math.sqrt(2.0)) *
          math.cos((2 * y + 1) * 2 * math.Pi / 16.0) / 4.0
        math.max(0L, math.min(255L, Math.round(s + 128.0)))
      }
    }.sum
    assert(img.pixSum == expected)
  }

  test("JPEG round-trip holds over arbitrary doc ids (property)") {
    // raw ScalaCheck, explicit seeds (the scalatest bridge is not on
    // the offline classpath — the PropertySpec convention)
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.chooseNum(0L, 1000000000L)
    val ids = (1L to 60L).map(s =>
      gen.apply(Gen.Parameters.default, Seed(s)).get)
    ids.foreach { id =>
      val (bw, bh, w, h) = JpegGen.dims(id)
      val img = JpegDecode.parseJpeg(JpegGen.jpeg(id))
      val expected = (0 until bw * bh).map { k =>
        JpegGen.blockValue(id, k).toLong *
          math.min(8, w - 8 * (k % bw)) * math.min(8, h - 8 * (k / bw))
      }.sum
      assert(img.width == w && img.height == h && img.pixSum == expected,
        s"round-trip broke for doc_id=$id")
    }
  }

  test("JPEG decoder rejects malformed and unsupported input") {
    intercept[IllegalArgumentException] { // not a JPEG
      JpegDecode.parseJpeg("not a jpeg at all".getBytes("US-ASCII"))
    }
    val good = JpegGen.jpeg(3L)
    intercept[IllegalArgumentException] { // truncated entropy segment
      JpegDecode.parseJpeg(good.dropRight(6))
    }
    // progressive SOF2 must be rejected, not mis-decoded
    val prog = good.clone()
    val sofAt = good.indices.find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    intercept[IllegalArgumentException] { JpegDecode.parseJpeg(prog) }
  }

  test("PPM parser reads back exactly what the generator wrote") {
    val b = Multimodal.MediaGen.ppm(42L)
    val (w, h, pixSum) = Multimodal.Decode.parsePpm(b)
    assert(w == 8 + 42 % 24)
    assert(h == 8 + (42 * 3) % 24)
    val expected = (0 until 3 * w * h).map(i => (42L * 31 + i * 7) % 256).sum
    assert(pixSum == expected)
    assert(b.length == s"P6\n$w $h\n255\n".length + 3 * w * h)
  }

  test("PPM parser handles comment lines and rejects malformed input") {
    // hand-built 1x1 image with a header comment, pixel (9, 8, 7)
    val withComment =
      "P6\n# a comment\n1 1\n255\n".getBytes("US-ASCII") ++
        Array[Byte](9, 8, 7)
    assert(Multimodal.Decode.parsePpm(withComment) == ((1, 1, 24L)))
    intercept[IllegalArgumentException] {
      Multimodal.Decode.parsePpm("P5\n1 1\n255\n ".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] { // truncated pixel body
      Multimodal.Decode.parsePpm(
        "P6\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3))
    }
  }

  test("WAV parser extracts the PCM samples the generator encoded") {
    val id = 7L
    val samples = Multimodal.Decode.parseWav(Multimodal.MediaGen.wav(id))
    assert(samples.length == 64 + id % 128)
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(s == (id * 13 + i * 17) % 2001 - 1000)
    }
    val (n, energy, zcr, peak) = Multimodal.Decode.pcmFeatures(samples)
    assert(n == samples.length)
    assert(energy == samples.map(s => s.toLong * s).sum)
    assert(peak == samples.map(s => math.abs(s.toInt)).max)
    assert(zcr == samples.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)))
  }

  test("WAV parser rejects non-WAV and stereo input") {
    intercept[IllegalArgumentException] {
      Multimodal.Decode.parseWav(Array.fill[Byte](44)(0))
    }
    // flip the channel-count field of a valid file to 2 (offset 22)
    val stereo = Multimodal.MediaGen.wav(1L).clone()
    stereo(22) = 2
    intercept[IllegalArgumentException] { Multimodal.Decode.parseWav(stereo) }
  }

  test("Y4M parser reads back exactly what the generator wrote") {
    val id = 11L
    val c = Multimodal.Decode.parseY4m(Multimodal.MediaGen.y4m(id))
    assert(c.width == 8 + id % 16)
    assert(c.height == 8 + (id * 5) % 16)
    assert(c.nFrames == 2 + id % 6)
    assert(c.nSampled == (c.nFrames + 3) / 4)
    val expected = (0 until c.nFrames).filter(_ % 4 == 0).map { f =>
      (0 until 3 * c.width * c.height)
        .map(i => (id * 7 + f * 131 + i * 3) % 256).sum
    }.sum
    assert(c.sampledSum == expected)
  }

  test("Y4M parser honors FRAME parameters and rejects malformed input") {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    // hand-built 1x1 C444 clip with a parameterized FRAME line
    val clip = "YUV4MPEG2 W1 H1 F25:1 C444\n".getBytes(ascii) ++
      "FRAME Ip\n".getBytes(ascii) ++ Array[Byte](5, 6, 7)
    val c = Multimodal.Decode.parseY4m(clip)
    assert(c == Multimodal.Decode.Y4mClip(1, 1, 1, 1, 18L))
    intercept[IllegalArgumentException] { // wrong magic
      Multimodal.Decode.parseY4m("MPEG4 W1 H1 C444\nFRAME\nxyz".getBytes(ascii))
    }
    intercept[IllegalArgumentException] { // C defaults to 420: unsupported
      Multimodal.Decode.parseY4m(
        "YUV4MPEG2 W1 H1\nFRAME\n".getBytes(ascii) ++ Array[Byte](1, 2, 3))
    }
    intercept[IllegalArgumentException] { // truncated frame body
      Multimodal.Decode.parseY4m(
        "YUV4MPEG2 W2 H2 C444\nFRAME\n".getBytes(ascii) ++ Array[Byte](1))
    }
  }
}
