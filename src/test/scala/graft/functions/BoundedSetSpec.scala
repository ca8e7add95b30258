package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts of the bounded distinct-set aggregate: reference equality
  * with collect_set under the cap, exact NULL past the cap, absorbing
  * overflow across partitions (each shard under the cap, the union
  * over it), merge-order invariance, null-input skipping, and the x18
  * consumer's equivalence with its former window+collect_set
  * formulation. */
class BoundedSetSpec extends SparkSpec {

  private val Cap = 8

  private def setsOf(rows: Seq[(Long, Long)], parts: Int): Map[Long, Option[Seq[Long]]] = {
    import spark.implicits._
    rows.toDF("g", "v").repartition(parts)
      .groupBy("g").agg(BoundedSet.collect(col("v"), Cap).as("s"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getSeq[Long](1).toSeq)))
      .toMap
  }

  private def reference(rows: Seq[(Long, Long)]): Map[Long, Option[Seq[Long]]] =
    rows.groupBy(_._1).map { case (g, vs) =>
      val d = vs.map(_._2).distinct.sorted
      g -> (if (d.size > Cap) None else Some(d))
    }

  test("equals distinct+sorted under the cap, NULL past it") {
    // group 1: 3 distinct; group 2: exactly Cap; group 3: Cap+1 -> NULL
    val rows =
      Seq.tabulate(20)(i => 1L -> (i % 3).toLong) ++
      Seq.tabulate(Cap)(i => 2L -> i.toLong) ++
      Seq.tabulate(Cap + 1)(i => 3L -> i.toLong)
    assert(setsOf(rows, 4) == reference(rows))
  }

  test("overflow is decided by the GLOBAL distinct count, not per-shard") {
    // Cap+1 distinct values, each appearing in its own partition range:
    // every map-side partial stays under the cap; only the merged
    // buffer crosses it. A non-absorbing merge would wrongly emit.
    val rows = (0 until (Cap + 1)).map(i => 9L -> i.toLong)
    for (p <- Seq(1, 3, Cap + 1))
      assert(setsOf(rows, p)(9L).isEmpty, s"parts=$p must overflow")
  }

  test("result is invariant to partitioning (merge order)") {
    val rows = (1L to 400L).map(i => (i % 13) -> (i * 2654435761L % 10))
    val expected = reference(rows)
    for (p <- Seq(1, 2, 7, 32))
      assert(setsOf(rows, p) == expected, s"parts=$p changed the result")
  }

  test("null inputs are skipped (the when()-guard idiom)") {
    import spark.implicits._
    val df = Seq[(Long, java.lang.Long)]((1L, 10L), (1L, null), (1L, 10L), (1L, 3L))
      .toDF("g", "v")
    val got = df.groupBy("g").agg(BoundedSet.collect(col("v"), Cap))
      .head().getSeq[Long](1).toSeq
    assert(got == Seq(3L, 10L))
  }

  test("SQL registration matches the column API") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    // values stay under the cap (7 distinct per group <= Cap=8), so
    // both paths return concrete arrays and the comparison sees sets,
    // not the overflow NULL (covered by the dedicated tests above)
    val df = (1L to 60L).map(i => (i % 5) -> (i % 7)).toDF("g", "v")
    df.createOrReplaceTempView("bs_in")
    val viaSql = spark.sql(
      s"SELECT g, bounded_set(v, $Cap) AS s FROM bs_in GROUP BY g ORDER BY g")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val viaCol = df.groupBy("g")
      .agg(BoundedSet.collect(col("v"), Cap).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(viaSql == viaCol)
    spark.catalog.dropTempView("bs_in")
  }

  test("x18's one-pass capped sets equal the window+collect_set form") {
    import org.apache.spark.sql.expressions.Window
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val isBench = col("doc_id") % 20 === 0
    val tagged = docs.filter(!isBench)
      .select(col("doc_id"), col("text"), lit(false).as("__bench"))
      .unionByName(docs.filter(isBench)
        .select(col("doc_id"), col("text"), lit(true).as("__bench")))
    val shd = tagged.select(col("doc_id"), col("__bench"),
      explode(CharShingleSig(lower(col("text")), 0, 0).getField("hs")).as("hf"))
    val cap = 50
    val viaBounded = shd.groupBy("hf").agg(
      BoundedSet.collect(when(col("__bench"), col("doc_id")), cap).as("bs"),
      BoundedSet.collect(when(!col("__bench"), col("doc_id")), cap).as("cs"))
      .filter(col("bs").isNotNull && col("cs").isNotNull &&
        size(col("bs")) + size(col("cs")) <= cap &&
        size(col("bs")) > 0 && size(col("cs")) > 0)
      .select(col("hf"), sort_array(col("bs")).as("bs"),
        sort_array(col("cs")).as("cs"))
    val viaWindow = shd
      .withColumn("df", count(lit(1)).over(Window.partitionBy("hf")))
      .filter(col("df") <= cap)
      .groupBy("hf").agg(
        collect_set(when(col("__bench"), col("doc_id"))).as("bs"),
        collect_set(when(!col("__bench"), col("doc_id"))).as("cs"))
      .filter(size(col("bs")) > 0 && size(col("cs")) > 0)
      .select(col("hf"), sort_array(col("bs")).as("bs"),
        sort_array(col("cs")).as("cs"))
    assert(viaBounded.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaBounded).isEmpty,
      "bounded-set one-pass form diverged from the window formulation")
  }
}
