package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("rangeCount counts exactly the in-window rows, keeps zero-match rows") {
    import spark.implicits._
    val left = Seq((1L, 1000L, "a"), (1L, 2000L, "b"), (2L, 500L, "c"))
      .toDF("k", "lts", "name")
    // window 600ms: for "a" (1000): rows in [400, 1000) -> 450, 999
    // (400 is included: >= lts-window); for "b" (2000): [1400, 2000)
    // -> 1400 only; "c": no key-2 rows
    val right = Seq((1L, 399L), (1L, 400L), (1L, 450L), (1L, 999L),
      (1L, 1000L), (1L, 1400L), (3L, 450L)).toDF("k", "rts")
    val got = RangeJoin.rangeCount(left, right, "k", "lts", "rts", 600L)
      .select(col("name"), col("range_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 1L, "c" -> 0L))
  }

  test("bucketing matches a brute-force inequality join on the fixture") {
    import spark.implicits._
    val events = graft.Tables.events(spark, sf)
    val ev = events.filter(col("event_type") =!= "purchase")
      .select(col("user_id").as("u"), unix_millis(col("ts")).as("ems"))
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("purchase_ms"))
    val got = RangeJoin.x15(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    val brute = p.join(ev,
        col("user_id") === col("u") &&
          col("ems") >= col("purchase_ms") - 300000L &&
          col("ems") < col("purchase_ms"), "left_outer")
      .groupBy(col("user_id"), col("purchase_ms"))
      .agg(count(col("ems")).as("c"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute)
    assert(got.exists(_._3 > 0), "fixture produced no in-window matches")
  }

  test("the range join plans as a hash join, not a nested loop") {
    val p = RangeJoin.x15(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must stay an equi-join on buckets:\n$p")
  }
}
