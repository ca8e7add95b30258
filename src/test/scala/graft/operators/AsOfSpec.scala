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

  test("bucketed as-of matches the union+window form across bucket widths") {
    val (l, r) = fixture
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("lname"), col("asof.rname"))
      .collect().map(x => x.getString(0) -> Option(x.getString(1))).toMap
    for (strict <- Seq(true, false);
         w <- Seq(1L, 7L, 50L, 100L, 1000000L)) {
      val want = key(AsOf.asofJoin(l, r, "k", "lts", "rts", strict))
      val got = key(AsOf.asofJoinBucketed(l, r, "k", "lts", "rts", strict, w))
      assert(got == want, s"strict=$strict bucketMs=$w")
    }
  }

  test("bucketed as-of: cross-bucket carry skips empty buckets") {
    import spark.implicits._
    // right row at t=5, left probes at t=9999 — thousands of empty
    // buckets between them at width 10; the carry must come from the
    // summary window, not from bucket adjacency
    val l = Seq((1L, 9999L, "far"), (1L, 4L, "before")).toDF("k", "lts", "lname")
    val r = Seq((1L, 5L, "r5")).toDF("k", "rts", "rname")
    val out = AsOf.asofJoinBucketed(l, r, "k", "lts", "rts", bucketMs = 10L)
      .select(col("lname"), col("asof.rname"))
      .collect().map(x => x.getString(0) -> Option(x.getString(1))).toMap
    assert(out == Map("far" -> Some("r5"), "before" -> None))
  }

  test("bucketed as-of preserves duplicate left rows (no dedup by key+ts)") {
    import spark.implicits._
    val l = Seq((1L, 100L, "a"), (1L, 100L, "a"), (1L, 100L, "b"))
      .toDF("k", "lts", "lname")
    val r = Seq((1L, 50L, "r50")).toDF("k", "rts", "rname")
    val rows = AsOf.asofJoinBucketed(l, r, "k", "lts", "rts", bucketMs = 1000L)
      .collect()
    assert(rows.length == 3, "as-of is a per-ROW lookup, not a keyed dedup")
  }

  test("bucketed as-of plans no global row-level sort of the inputs") {
    val (l, r) = fixture
    val p = AsOf.asofJoinBucketed(l, r, "k", "lts", "rts")
      .queryExecution.executedPlan.toString()
    // the right side must flow through a hash aggregation (bucket
    // arrays), and the only Window — the carry — must consume that
    // aggregated side, i.e. appear above a HashAggregate in the tree,
    // never directly over a raw scan
    assert(p.contains("HashAggregate"),
      s"expected hash aggregation of the right side:\n$p")
    assert(p.contains("Window"), s"expected the summary-carry window:\n$p")
    val winAt = p.linesIterator.indexWhere(_.contains("Window"))
    val scanBeforeWin = p.linesIterator.take(winAt)
      .exists(_.contains("Scan parquet"))
    assert(!scanBeforeWin || p.linesIterator.take(winAt)
      .exists(_.contains("HashAggregate")),
      s"carry window must run over per-bucket summaries:\n$p")
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

  test("x14 bucketed form equals the gated fused-window form row-for-row") {
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("user_id", "purchase_ms", "prior_event_type", "prior_ms",
        "gap_ms")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(key(AsOf.x14Bucketed(spark, sf)) == key(AsOf.x14Window(spark, sf)))
  }
}
