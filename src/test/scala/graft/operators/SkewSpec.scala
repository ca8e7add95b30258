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

  test("AQE splits a skewed sort-merge join at runtime (the non-salt path)") {
    import spark.implicits._
    // AQE skew-join is the runtime complement to explicit salting: it
    // needs no code change but only covers joins it can observe. Force
    // observably-skewed tiny data with thresholds scaled down, then
    // assert the FINAL adaptive plan really split the hot partition —
    // this is the mechanism the 100 TB posture leans on for ad-hoc
    // joins, so it gets a regression guard, not just a mention.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "10KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "10KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 50k rows on one key vs a uniform spread: one reducer partition
      // dwarfs the others
      val big = ((1 to 50000).map(_ => 42L) ++ (1L to 2000L))
        .toDF("k").withColumn("pad", lpad(col("k").cast("string"), 32, "x"))
      val dim = (1L to 2000L).toDF("k").withColumn("name", col("k").cast("string"))
      val joined = big.join(dim.hint("merge"), "k")
      // collect() (not count()) so THIS QueryExecution runs and its
      // AdaptiveSparkPlan finalizes — count() spawns a separate one
      assert(joined.collect().length == 52000) // 50k hot + 2k uniform
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE must mark the skewed join side(s):\n$finalPlan")
      assert(finalPlan.contains("AQEShuffleRead coalesced and skewed"),
        "the hot side's shuffle read must be split at runtime")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
