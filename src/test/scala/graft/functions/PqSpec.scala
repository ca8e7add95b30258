package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

class PqSpec extends AnyFunSuite {

  // m=2 subspaces, ds=2: codebook 0 has codewords at (0,0) and (1,1);
  // codebook 1 has (2,0) and (0,2)
  private val model = new PqModel(2,
    Array(Array(1, 2), Array(1, 2)),
    Array(
      Array(Array(0.0, 0.0), Array(1.0, 1.0)),
      Array(Array(2.0, 0.0), Array(0.0, 2.0))))

  private def arr(xs: Double*) = new GenericArrayData(xs.toArray)

  test("encode picks the L2-nearest codeword per subspace") {
    val codes = model.encode(arr(0.9, 0.9, 0.1, 1.9))
    assert(codes.toIntArray().toSeq == Seq(2, 2))
  }

  test("encode breaks distance ties toward the smaller code id") {
    // (0.5, 0.5) is equidistant from (0,0) and (1,1); (1,1) from the
    // two codewords of subspace 1
    val codes = model.encode(arr(0.5, 0.5, 1.0, 1.0))
    assert(codes.toIntArray().toSeq == Seq(1, 1))
  }

  test("adcScore is the micro-unit-floored per-subspace dot sum") {
    val qu = arr(0.5, 0.25, -1.0, 0.5)
    val codes = new GenericArrayData(Array(2, 2))
    // subspace 0: 0.5*1 + 0.25*1 = 0.75 -> 750000
    // subspace 1: -1.0*0 + 0.5*2 = 1.0  -> 1000000
    assert(model.adcScore(qu, codes) == 1750000L)
  }

  test("surviving-cell lists may shrink: lookups match on stored id") {
    // subspace 0 lost code 1 entirely — only code 2 survives
    val shrunk = new PqModel(2,
      Array(Array(2), Array(1, 2)),
      Array(
        Array(Array(1.0, 1.0)),
        Array(Array(2.0, 0.0), Array(0.0, 2.0))))
    val codes = shrunk.encode(arr(0.0, 0.0, 2.0, 0.0))
    assert(codes.toIntArray().toSeq == Seq(2, 1))
    // ADC must find code 2 at array position 0
    assert(shrunk.adcScore(arr(1.0, 0.0, 1.0, 0.0), codes) == 3000000L)
  }

  test("fromSeeds slices each seed into per-subspace codewords") {
    val m = PqModel.fromSeeds(2, 2,
      Array(Array(1.0, 2.0, 3.0, 4.0), Array(5.0, 6.0, 7.0, 8.0)))
    assert(m.cids(0).toSeq == Seq(1, 2))
    assert(m.cws(0)(0).toSeq == Seq(1.0, 2.0))
    assert(m.cws(1)(1).toSeq == Seq(7.0, 8.0))
  }
}
