package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins [[Propagate.qualityPropagate]]'s contract: integer fixpoint
  * arithmetic against a hand-computed graph, the scored-endpoints-only
  * neighbor definition (an edge touching an unscored id is dropped
  * before deg is counted — no NULL score can reach the top-N), the
  * isolated-doc identity, and the checkpoint-truncated (flat) plan per
  * iteration that keeps analysis linear in rounds. */
class PropagateSpec extends SparkSpec {

  private def scores(rows: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "s0")
  }
  private def pairs(rows: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("a", "b")
  }

  /** The operator's exact recurrence, driver-side, for oracle values. */
  private def expected(s0: Map[Long, Long], edges: Seq[(Long, Long)],
      iters: Int): Map[Long, Long] = {
    val nbr = (edges ++ edges.map(_.swap)).distinct
      .filter { case (v, u) => v != u && s0.contains(v) && s0.contains(u) }
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var s = s0
    for (_ <- 1 to iters) {
      s = s0.map { case (id, base) =>
        id -> (nbr.get(id) match {
          case Some(ns) =>
            val sum = ns.map(s).sum
            Math.floorDiv(15 * base + 85 * Math.floorDiv(sum, ns.size), 100)
          case None => base
        })
      }
    }
    s
  }

  private def run(sc: Seq[(Long, Long)], pr: Seq[(Long, Long)],
      iters: Int): Map[Long, Long] =
    Propagate.qualityPropagate(scores(sc), pairs(pr), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

  test("one iteration matches the hand recurrence; isolated doc keeps s0") {
    val s0 = Seq(1L -> 1000L, 2L -> 2000L, 3L -> 600L, 4L -> 5000L)
    val pr = Seq(1L -> 2L, 2L -> 3L)
    assert(run(s0, pr, 1) === expected(s0.toMap, pr, 1))
    assert(run(s0, pr, 1)(4L) === 5000L) // isolated: s = s0
  }

  test("three iterations match the unrolled recurrence") {
    val s0 = Seq(1L -> 10L, 2L -> 90L, 3L -> 40L, 4L -> 70L, 5L -> 55L)
    val pr = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 4L -> 5L)
    assert(run(s0, pr, 3) === expected(s0.toMap, pr, 3))
  }

  test("edges touching an unscored id are dropped; no NULL score") {
    val s0 = Seq(1L -> 1000L, 2L -> 2000L, 3L -> 600L)
    // 99 is unscored: (1,99) must not count toward deg(1); (3,99) must
    // not turn node 3 into deg>0-with-NULL-sum (NULL score)
    val noisy = Seq(1L -> 2L, 1L -> 99L, 3L -> 99L)
    val clean = Seq(1L -> 2L)
    val got = Propagate.qualityPropagate(scores(s0), pairs(noisy), 2)
    assert(got.filter(col("s").isNull).count() === 0)
    assert(got.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      === expected(s0.toMap, clean, 2))
  }

  test("per-iteration checkpoint keeps the returned plan flat (no joins)") {
    val s0 = Seq(1L -> 10L, 2L -> 20L)
    val out = Propagate.qualityPropagate(scores(s0), pairs(Seq(1L -> 2L)), 3)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"expected checkpoint-truncated plan, got:\n$plan")
  }

  test("x64 gate shape on sf0.001: 50 rows, no NULLs, descending order") {
    val rows = Propagate.x64(spark, sf).collect()
    assert(rows.length === 50)
    assert(rows.forall(r => !r.isNullAt(2)))
    val svals = rows.map(_.getLong(2))
    assert(svals.zip(svals.tail).forall { case (a, b) => a >= b })
  }
}
