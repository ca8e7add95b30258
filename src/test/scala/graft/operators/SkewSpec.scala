package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedJoin returns exactly the plain inner join") {
    val o = graft.Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    // rename for a shared join key
    val cc = graft.Tables.customer(spark, sf)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val plain = o.join(cc, "o_custkey")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val salted = Skew.saltedJoin(o, cc, "o_custkey", saltBuckets = 8)
      .select("o_custkey", "o_orderkey", "c_mktsegment")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("salted join spreads a hot key across buckets") {
    import spark.implicits._
    // one pathological key with 10k rows
    val big = (1 to 10000).map(i => (42L, i)).toDF("k", "payload")
    val small = Seq((42L, "dim")).toDF("k", "name")
    val salted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(8)))
    val spread = salted.groupBy("__salt").count().collect()
    assert(spread.length == 8, "hot key must occupy every salt bucket")
    assert(spread.map(_.getLong(1)).max < 10000,
      "no single bucket may hold the whole hot key")
    val out = Skew.saltedJoin(big, small, "k", 8)
    assert(out.count() == 10000)
  }
}
