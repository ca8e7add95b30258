package graft.operators

import graft.SparkSpec
import graft.functions.PortableHash
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) =
    (1L to n.toLong).map(i => i -> ("w " * (i % 37 + 1).toInt).trim).toDF("doc_id", "text")

  /** Driver-side reference: global order by (h60(doc_id), doc_id),
    * running sum, bin = prefix-before-doc div budget. */
  private def reference(rows: Seq[(Long, Int)], budget: Long): Map[Long, Long] = {
    var cum = 0L
    rows.sortBy { case (id, _) => (PortableHash.h60(id.toString), id) }
      .map { case (id, tok) =>
        val bin = cum / budget
        cum += tok
        id -> bin
      }.toMap
  }

  test("bin assignment matches the driver-side global prefix sum") {
    val docs = corpus(300)
    val toks = docs.select($"doc_id", size(split(lower($"text"), " ")).as("tok"))
      .as[(Long, Int)].collect().toSeq
    val want = reference(toks, budget = 64)
    val got = Packing.packByTokenBudget(docs, budget = 64, buckets = 8)
      .select($"doc_id", $"bin").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("bucket count never changes the packing (two-pass = global sum)") {
    val docs = corpus(200)
    val base = Packing.packByTokenBudget(docs, 128, 1)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    for (b <- Seq(2, 16, 64)) {
      val got = Packing.packByTokenBudget(docs, 128, b)
        .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
      assert(got == base, s"buckets=$b")
    }
  }

  test("a doc straddling the budget boundary stays in its starting bin") {
    // one doc of 10 tokens with budget 8: starts in bin 0, next doc
    // starts at prefix 10 → bin 1
    val docs = Seq(1L -> ("a " * 10).trim, 2L -> ("b " * 3).trim).toDF("doc_id", "text")
    val got = Packing.packByTokenBudget(docs, 8, 1)
      .select($"doc_id", $"bin").as[(Long, Long)].collect().toMap
    val first = // whichever doc the hash order puts first starts in bin 0
      Seq(1L, 2L).minBy(id => (PortableHash.h60(id.toString), id))
    assert(got(first) == 0L)
    assert(got(Seq(1L, 2L).find(_ != first).get) ==
      (if (first == 1L) 10L / 8 else 3L / 8))
  }

  test("bins fill to at least the budget (except the last)") {
    val docs = corpus(300)
    val byBin = Packing.packByTokenBudget(docs, 256, 8)
      .groupBy("bin").agg(sum("tok").as("btok"))
      .orderBy("bin").as[(Long, Long)].collect()
    // every bin except the last must have reached the budget (a bin
    // only closes once its running total passes the boundary)
    byBin.dropRight(1).foreach { case (bin, btok) =>
      assert(btok >= 256 - 36, s"bin $bin underfilled: $btok") // max doc = 37 tok straddle
    }
  }

  test("the corpus-wide window is partitioned by bucket, not global") {
    val plan = Packing.x51(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(bucket"))
    assert(!plan.contains("CartesianProduct"))
  }
}
