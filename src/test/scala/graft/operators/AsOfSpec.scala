package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "lts", "lname")
    val right = Seq((1L, 100L, "r100"), (1L, 150L, "r150"), (3L, 10L, "r10"))
      .toDF("k", "rts", "rname")
    (left, right)
  }

  test("strict as-of matches the greatest strictly-prior right row") {
    val (l, r) = fixture
    val out = AsOf.asofJoin(l, r, "k", "lts", "rts")
      .select(col("lname"), col("asof.rname"))
      .collect().map(x => x.getString(0) -> Option(x.getString(1))).toMap
    assert(out == Map(
      "p1" -> None, // r100 is simultaneous, strict excludes it
      "p2" -> Some("r150"), // latest of r100/r150 before 200
      "p3" -> None)) // key 2 has no right rows at all
  }

  test("inclusive as-of admits the simultaneous right row") {
    val (l, r) = fixture
    val out = AsOf.asofJoin(l, r, "k", "lts", "rts", strict = false)
      .select(col("lname"), col("asof.rname"))
      .collect().map(x => x.getString(0) -> Option(x.getString(1))).toMap
    assert(out("p1") == Some("r100"))
    assert(out("p2") == Some("r150"))
    assert(out("p3") == None)
  }

  test("as-of plan has one window exchange and no join node") {
    val (l, r) = fixture
    val p = AsOf.asofJoin(l, r, "k", "lts", "rts")
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    assert(p.contains("Window"), "running last() must be a window")
  }

  test("x14 matches a windowed reference computation on the fixture") {
    import spark.implicits._
    val got = AsOf.x14(spark, sf)
      .select("user_id", "purchase_ms", "prior_ms")
      .as[(Long, Long, Long)].collect().toSet
    // independent reference: self-join + max aggregation (quadratic —
    // fixture-only oracle for the windowed implementation)
    val ev = graft.Tables.events(spark, sf)
      .filter(col("event_type") =!= "purchase")
      .select(col("user_id").as("u"), unix_millis(col("ts")).as("ems"))
    val p = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("pms"))
    val want = p.join(ev, col("user_id") === col("u") && col("ems") < col("pms"))
      .groupBy(col("user_id"), col("pms"))
      .agg(max(col("ems")).as("prior_ms"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }
}
