package graft.operators

import graft.SparkSpec

class StreamSampleSpec extends SparkSpec {

  test("s22 streaming priority sample == batch x75 on the fixture") {
    val d = "/root/testdata/sf0.001"
    val cols = Seq("source", "rk", "doc_id", "w", "est_u")
    val got = StreamingQueries.s22(spark, d)
      .select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq).sortBy(_.toString)
    val want = Sampling.x75(spark, d)
      .select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq).sortBy(_.toString)
    assert(got.toSeq == want.toSeq,
      "the priority heap through state-store round trips must equal the batch sample")
    assert(got.nonEmpty)
  }
}
