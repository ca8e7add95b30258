package graft.multimodal

import graft.functions.PortableHash
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  test("frameStats counts code points, not UTF-16 units") {
    // 1500 supplementary-plane code points = 3000 UTF-16 chars. A
    // UTF-16-based count would see 3 frames; code points give 2.
    val emoji = "😀" // U+1F600, one code point, two chars
    val text = emoji * 1500
    val (nFrames, nSampled, firstH) = Multimodal.frameStats(text)
    assert(nFrames == 2)
    assert(nSampled == 1)
    // the first frame is the first 1024 CODE POINTS — 2048 chars —
    // never splitting a surrogate pair
    assert(firstH == PortableHash.h60(emoji * 1024))
  }

  test("frameStats on BMP text matches plain length arithmetic") {
    val text = "a" * 2500
    val (nFrames, nSampled, firstH) = Multimodal.frameStats(text)
    assert(nFrames == 3)
    assert(nSampled == 1)
    assert(firstH == PortableHash.h60("a" * 1024))
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
