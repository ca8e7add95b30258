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
}
