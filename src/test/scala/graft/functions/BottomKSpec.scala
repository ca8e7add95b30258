package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts of the bottom-k sample aggregate: driver-side reference
  * equality, partition/merge-order invariance (THE property that makes
  * it gateable where GK/KLL are not), eviction correctness, null
  * handling, and the sample-quantile accuracy of its x59 consumer
  * against x42's exact quartiles. */
class BottomKSpec extends SparkSpec {

  private val K = 8

  private def sampleOf(rows: Seq[(Long, Long)], parts: Int): Seq[Long] = {
    import spark.implicits._
    rows.toDF("hk", "v").repartition(parts)
      .agg(BottomK.sample(col("hk"), col("v"), K).as("s"))
      .head().getSeq[Long](0).toSeq
  }

  /** Driver-side reference: sort the multiset by (hk, v), keep k. */
  private def reference(rows: Seq[(Long, Long)]): Seq[Long] =
    rows.sorted.take(K).map(_._2)

  test("sample equals the driver-side bottom-k under (hk, v)") {
    val rows = (1L to 100L).map(i => (i * 2654435761L % 1000) -> i)
    assert(sampleOf(rows, 4) == reference(rows))
  }

  test("sample is invariant to partitioning (merge order)") {
    val rows = (1L to 500L).map(i => (i * 40503L % 4096) -> (i % 37))
    val expected = reference(rows)
    for (p <- Seq(1, 2, 7, 32))
      assert(sampleOf(rows, p) == expected, s"parts=$p must not change the sample")
  }

  test("groups smaller than k return the whole group") {
    val rows = Seq((5L, 50L), (3L, 30L), (9L, 90L))
    assert(sampleOf(rows, 2) == Seq(30L, 50L, 90L))
  }

  test("duplicate (hk, v) pairs keep multiset semantics") {
    val rows = Seq.fill(20)((1L, 7L)) ++ Seq((0L, 3L))
    // bottom-8 of the multiset: (0,3) then seven copies of (1,7)
    assert(sampleOf(rows, 3) == (3L +: Seq.fill(7)(7L)))
  }

  test("null inputs are skipped, not sampled") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (null, 99L), (2L, null), (3L, 30L))
      .toDF("hk", "v")
    val got = df.agg(BottomK.sample(col("hk"), col("v"), K))
      .head().getSeq[Long](0).toSeq
    assert(got == Seq(10L, 30L))
  }

  test("pairs emit (hk, v) ascending; union of shard pairs equals direct") {
    import spark.implicits._
    val rows = (1L to 400L).map(i => (i * 40503L % 4096, i % 53, i % 5))
    val df = rows.toDF("hk", "v", "shard").repartition(7)
    // direct bottom-k pairs over the whole set
    val direct = df.agg(BottomK.pairs(col("hk"), col("v"), K).as("ps"))
      .select(explode(col("ps")).as("p"))
      .collect().map(r => (r.getStruct(0).getLong(0), r.getStruct(0).getLong(1)))
      .toSeq
    assert(direct == rows.map(t => (t._1, t._2)).sorted.take(K),
      "pairs must be the k smallest (hk, v), ascending")
    // rollup: per-shard pair tables folded with bottomk_union
    val rolled = df.groupBy("shard")
      .agg(BottomK.pairs(col("hk"), col("v"), K).as("ps"))
      .agg(BottomK.union(col("ps"), K).as("ps"))
      .select(explode(col("ps")).as("p"))
      .collect().map(r => (r.getStruct(0).getLong(0), r.getStruct(0).getLong(1)))
      .toSeq
    assert(rolled == direct,
      "bottomk_union over fine-group pairs must equal the direct bottom-k")
  }

  test("union is invariant to the fine partitioning") {
    import spark.implicits._
    val rows = (1L to 300L).map(i => (i * 2654435761L % 997, i))
    val direct = rows.sorted.take(K)
    for (shards <- Seq(1, 3, 16)) {
      val got = rows.map { case (h, v) => (h, v, v % shards) }
        .toDF("hk", "v", "shard").repartition(5)
        .groupBy("shard").agg(BottomK.pairs(col("hk"), col("v"), K).as("ps"))
        .agg(BottomK.union(col("ps"), K).as("ps"))
        .select(explode(col("ps")).as("p"))
        .collect().map(r => (r.getStruct(0).getLong(0), r.getStruct(0).getLong(1)))
        .toSeq
      assert(got == direct, s"shards=$shards must not change the rollup")
    }
  }

  test("SQL registration matches the column API") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val df = (1L to 50L).map(i => (i * 7919L % 512) -> i).toDF("hk", "v")
    df.createOrReplaceTempView("bk_in")
    val viaSql = spark.sql(
      s"SELECT bottomk_sample(hk, v, $K) AS s FROM bk_in")
      .head().getSeq[Long](0).toSeq
    val viaCol = df.agg(BottomK.sample(col("hk"), col("v"), K))
      .head().getSeq[Long](0).toSeq
    assert(viaSql == viaCol)
    spark.catalog.dropTempView("bk_in")
  }

  test("x59 sample quartiles track the exact quartiles") {
    val sf = "/root/testdata/sf0.01"
    val approx = graft.operators.Sketches.x59(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val exact = graft.operators.TextOps.x42(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(approx.keySet == exact.keySet)
    for ((lang, (a25, a50, a75)) <- approx) {
      val (e25, e50, e75) = exact(lang)
      // 64-point sample: sampled quartiles sit within a generous
      // relative band of truth (median of a uniform 64-sample has
      // ~±12% rank error at 3 sigma; lengths are roughly uniform)
      def close(a: Double, e: Double): Boolean =
        math.abs(a - e) <= math.max(0.35 * e, 20.0)
      assert(close(a25, e25) && close(a50, e50) && close(a75, e75),
        s"$lang: sampled ($a25, $a50, $a75) vs exact ($e25, $e50, $e75)")
    }
  }
}
