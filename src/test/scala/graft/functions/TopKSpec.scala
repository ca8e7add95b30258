package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts of the bounded-heap per-group top-k aggregate: equality
  * with the row_number-window idiom it replaces, partition invariance
  * (merge correctness), serialization round-trip through a real
  * exchange, groups smaller than k, nulls, and SQL registration. */
class TopKSpec extends SparkSpec {

  private def data(parts: Int) = {
    import spark.implicits._
    (1L to 400L)
      .map(i => (i % 7, i * 2654435761L % 1000, s"t${i % 13}", i))
      .toDF("g", "score", "tag", "id").repartition(parts)
  }

  /** The window idiom the aggregate must reproduce exactly. */
  private def viaWindow(parts: Int, k: Int): Set[(Long, Long, String, Long)] = {
    import org.apache.spark.sql.expressions.Window
    data(parts)
      .withColumn("rn", row_number().over(
        Window.partitionBy("g")
          .orderBy(col("score").desc, col("tag"), col("id"))))
      .filter(col("rn") <= k).drop("rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
  }

  private def viaAgg(parts: Int, k: Int): Set[(Long, Long, String, Long)] =
    data(parts)
      .groupBy("g")
      .agg(TopK.rows(struct((-col("score")).as("ns"), col("tag"),
        col("id"), col("score")), k).as("top"))
      .select(col("g"), explode(col("top")).as("t"))
      .select(col("g"), col("t.score"), col("t.tag"), col("t.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet

  test("reproduces the row_number window idiom exactly") {
    assert(viaAgg(8, 5) == viaWindow(8, 5))
  }

  test("result is invariant to partitioning (merge + serde paths)") {
    val expected = viaAgg(1, 3)
    for (p <- Seq(2, 7, 32)) assert(viaAgg(p, 3) == expected, s"parts=$p")
  }

  test("groups smaller than k return all rows ascending") {
    import spark.implicits._
    val rows = Seq((1L, 30L), (1L, 10L), (1L, 20L)).toDF("g", "v")
      .groupBy("g").agg(TopK.rows(struct(col("v")), 10).as("top"))
      .select(explode(col("top")).as("t")).select(col("t.v"))
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(10L, 20L, 30L))
  }

  test("null structs are skipped") {
    import spark.implicits._
    val df = Seq((1L, Some(5L)), (1L, None), (1L, Some(2L)))
      .toDF("g", "v")
      .groupBy("g")
      .agg(TopK.rows(when(col("v").isNotNull, struct(col("v"))), 10).as("top"))
      .select(size(col("top")))
    assert(df.head().getInt(0) == 2)
  }

  test("SQL registration matches the column API") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val df = (1L to 60L).map(i => (i % 3, i * 37 % 50, i)).toDF("g", "s", "id")
    df.createOrReplaceTempView("tk_in")
    val viaSql = spark.sql(
      "SELECT g, topk_rows(struct(s, id), 4) AS top FROM tk_in GROUP BY g")
      .select(col("g"), col("top")).collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(_.toString))
      .toMap
    val viaCol = df.groupBy("g")
      .agg(TopK.rows(struct(col("s"), col("id")), 4).as("top"))
      .select(col("g"), col("top")).collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(_.toString))
      .toMap
    assert(viaSql == viaCol)
    spark.catalog.dropTempView("tk_in")
  }
}
