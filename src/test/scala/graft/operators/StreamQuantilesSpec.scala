package graft.operators

import graft.SparkSpec

class StreamQuantilesSpec extends SparkSpec {

  test("s21 streaming bottom-k quantiles == batch x59 on the fixture") {
    val d = "/root/testdata/sf0.001"
    val cols = Seq("lang", "n", "m", "p25", "p50", "p75")
    val got = StreamingQueries.s21(spark, d)
      .select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq).sortBy(_.toString)
    val want = Sketches.x59(spark, d)
      .select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq).sortBy(_.toString)
    assert(got.toSeq == want.toSeq,
      "two micro-batches through state-store round trips must equal the batch sketch")
    assert(got.nonEmpty)
  }
}
