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

  test("audioFeatures computes energy, crossings, and peak by hand") {
    // 'a'=97 → amp 97%256−128 = −31; 'é'=233 → amp 105: one sign change
    val (n, energy, zcr, peak) = Multimodal.audioFeatures("aé")
    assert(n == 2)
    assert(energy == 31L * 31 + 105L * 105)
    assert(zcr == 1)
    assert(peak == 105)
    val (n0, e0, z0, p0) = Multimodal.audioFeatures("")
    assert(n0 == 0 && e0 == 0L && z0 == 0 && p0 == 0)
  }
}
