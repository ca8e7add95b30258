package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Pins [[SketchSim.sourceJaccard]]'s KMV estimator contract:
  * identical vocabularies estimate exactly 1, disjoint ones exactly 0
  * (KMV is exact at the extremes — every sketch element agrees), the
  * truncated-sketch estimate lands near the true Jaccard on a corpus
  * whose vocabulary genuinely exceeds k (deterministic, so an exact
  * tolerance holds forever), and the gate's fixture shape. */
class SketchSimSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  private def jacc(d: DataFrame, k: Int): Map[(String, String), Long] =
    SketchSim.sourceJaccard(d, k).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap

  test("identical vocabularies estimate exactly 1.0") {
    val d = docs(Seq(
      (1L, "alpha beta gamma delta", "sA"),
      (2L, "delta gamma beta alpha", "sB")))
    assert(jacc(d, 16)(("sA", "sB")) === 1000000L)
  }

  test("disjoint vocabularies estimate exactly 0.0") {
    val d = docs(Seq(
      (1L, "alpha beta gamma", "sA"),
      (2L, "delta epsilon zeta", "sB")))
    assert(jacc(d, 16)(("sA", "sB")) === 0L)
  }

  test("truncated sketch estimates true Jaccard on an over-k vocabulary") {
    // 120 shared + 2x60 private tokens: true J = 120/240 = 0.5; k=16
    // truncates hard. Deterministic hash -> the estimate is a constant;
    // assert the standard KMV error envelope rather than the constant
    // itself so a k or hash change fails loudly, not flakily.
    val shared = (0 until 120).map(i => s"tok$i")
    val aOnly = (0 until 60).map(i => s"left$i")
    val bOnly = (0 until 60).map(i => s"right$i")
    val d = docs(Seq(
      (1L, (shared ++ aOnly).mkString(" "), "sA"),
      (2L, (shared ++ bOnly).mkString(" "), "sB")))
    val est = jacc(d, 16)(("sA", "sB")) / 1e6
    assert(math.abs(est - 0.5) <= 0.25, s"estimate $est too far from 0.5")
  }

  test("x65 gate shape on sf0.001: all source pairs, bounded estimates") {
    val rows = SketchSim.x65(spark, sf).collect()
    assert(rows.length === 190) // C(20, 2) unordered source pairs
    assert(rows.forall { r =>
      val (ik, jm) = (r.getLong(2), r.getLong(3))
      ik >= 0 && ik <= 16 && jm >= 0L && jm <= 1000000L
    })
    // ordered pairs, src_a < src_b
    assert(rows.forall(r => r.getString(0) < r.getString(1)))
  }
}
