package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins [[Sampling.sourceQuota]]: merit-ranked quota per source (score
  * DESC, doc_id tie-break), rank positions from the aggregate's
  * ascending eval, under-quota sources keep everything, and the plan
  * uses the bounded-heap aggregate (no window sort). */
class QuotaSpec extends SparkSpec {

  private def scored(rows: Seq[(Long, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "score_u")
  }

  test("keeps the k best per source with deterministic tie-break") {
    val d = scored(Seq(
      (1L, "a", 50L), (2L, "a", 90L), (3L, "a", 70L),
      (4L, "a", 90L), (5L, "a", 10L), (6L, "b", 30L)))
    val got = Sampling.sourceQuota(d, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // source a: scores 90(doc2), 90(doc4), 70(doc3) - doc_id breaks the tie
    assert(got.filter(_._1 == "a").sortBy(_._2) ===
      Array(("a", 1L, 2L, 90L), ("a", 2L, 4L, 90L), ("a", 3L, 3L, 70L)))
    // source b is under quota: kept whole
    assert(got.filter(_._1 == "b") === Array(("b", 1L, 6L, 30L)))
  }

  test("plan uses topk_rows, not a row_number window") {
    val p = Sampling.sourceQuota(scored(Seq((1L, "a", 1L))), k = 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("topk_rows"), s"expected the bounded-heap aggregate:\n$p")
    assert(!p.contains("Window"), s"no window sort expected:\n$p")
  }

  test("x68 gate shape on sf0.001: 5 rows per source, ranks 1..5 descending") {
    val rows = Sampling.x68(spark, sf).collect()
    val bySrc = rows.groupBy(_.getString(0))
    assert(bySrc.size === 20)
    assert(bySrc.values.forall(_.length === 5))
    bySrc.values.foreach { g =>
      val sorted = g.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
      val scores = sorted.map(_.getLong(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }
}
