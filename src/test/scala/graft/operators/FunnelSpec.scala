package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins [[Funnel.orderedFunnel]]: steps count only when STRICTLY after
  * the previous step (the ordering property a per-type min-aggregate
  * fakes), NULL propagation past the deepest stage, and the gate
  * shape. */
class FunnelSpec extends SparkSpec {

  private def ev(rows: Seq[(Long, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("user_id", "event_type", "ms")
      .select(col("user_id"), col("event_type"),
        timestamp_millis(col("ms")).as("ts"))
  }

  private def run(rows: Seq[(Long, String, Long)]): Map[Long, (Option[Long], Option[Long], Option[Long], Long)] =
    Funnel.orderedFunnel(ev(rows)).collect().map { r =>
      def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      r.getLong(0) -> ((opt(1), opt(2), opt(3), r.getLong(4)))
    }.toMap

  test("full in-order funnel reaches stage 3 with earliest qualifying times") {
    val m = run(Seq(
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      // a second, later view/click must not move the firsts
      (1L, "view", 150L), (1L, "click", 250L)))
    assert(m(1L) === ((Some(100L), Some(200L), Some(300L), 3L)))
  }

  test("a click BEFORE the first view does not advance the funnel") {
    val m = run(Seq(
      (1L, "click", 50L), (1L, "view", 100L), (1L, "purchase", 300L)))
    // no click after the view: stage stops at 1; the purchase cannot
    // count either (needs a qualifying click first)
    assert(m(1L) === ((Some(100L), None, None, 1L)))
  }

  test("equal timestamps are NOT strictly after (no same-ms advance)") {
    val m = run(Seq((1L, "view", 100L), (1L, "click", 100L)))
    assert(m(1L) === ((Some(100L), None, None, 1L)))
  }

  test("the qualifying click is the first one AFTER the view, not the global first") {
    val m = run(Seq(
      (1L, "click", 10L), (1L, "view", 100L),
      (1L, "click", 500L), (1L, "purchase", 400L)))
    // click qualifies at 500; the purchase at 400 precedes it -> stage 2
    assert(m(1L) === ((Some(100L), Some(500L), None, 2L)))
  }

  test("users with no first-step event are absent") {
    val m = run(Seq((7L, "click", 10L), (7L, "purchase", 20L)))
    assert(!m.contains(7L))
  }

  test("x67 gate shape on sf0.001: rows per viewing user, stages in [1,3]") {
    val rows = Funnel.x67(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(4) >= 1L && r.getLong(4) <= 3L))
    // t columns are monotone where present
    assert(rows.forall { r =>
      (r.isNullAt(2) || r.getLong(2) > r.getLong(1)) &&
        (r.isNullAt(3) || r.isNullAt(2) || r.getLong(3) > r.getLong(2))
    })
  }
}
