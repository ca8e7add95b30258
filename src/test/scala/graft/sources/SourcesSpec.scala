package graft.sources

import graft.SparkSpec
import graft.streaming.{Generator, MessageStatus}
import java.nio.file.Files

class SourcesSpec extends SparkSpec {

  test("avro wire roundtrip preserves every MessageStatus field") {
    import spark.implicits._
    val in = Generator.batch(spark, 50L).as[MessageStatus]
    val back = KafkaIO.unframe(KafkaIO.frame(in)).collect().toSet
    assert(back == in.collect().toSet)
    assert(back.nonEmpty)
  }

  test("avro frame produces non-empty binary key/value columns") {
    import spark.implicits._
    val framed = KafkaIO.frame(Generator.batch(spark, 5L).as[MessageStatus])
    assert(framed.schema.fieldNames.toSeq == Seq("key", "value"))
    framed.collect().foreach { r =>
      assert(r.getAs[Array[Byte]](0).nonEmpty)
      assert(r.getAs[Array[Byte]](1).nonEmpty)
    }
  }

  test("kafka writer carries the reference reliability options") {
    val opts = KafkaIO.producerOptions("broker:9092")
    assert(opts("kafka.acks") == "all")
    assert(opts("kafka.retries") == "3")
    assert(opts("kafka.delivery.timeout.ms") == "60000")
  }

  test("insertIfAbsent ignores duplicate keys across batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pqstore").toString + "/t"
    val b1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val b2 = Seq((2L, "B"), (3L, "c"), (3L, "c2")).toDF("k", "v")
    ParquetStore.insertIfAbsent(spark, b1, dir, "k")
    ParquetStore.insertIfAbsent(spark, b2, dir, "k")
    val got = spark.read.parquet(dir).as[(Long, String)].collect().toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(2L) == "b") // first write wins, OR IGNORE semantics
  }

  test("partitioned write prunes non-matching partitions at scan time") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pqpart").toString + "/msgs"
    val msgs = Seq(("m1", "sent", 1L), ("m2", "delivered", 2L),
      ("m3", "sent", 3L)).toDF("message_id", "status", "phone")
    ParquetStore.writePartitioned(msgs, dir, "status")
    val q = spark.read.parquet(dir).filter($"status" === "sent")
    val plan = q.queryExecution.executedPlan.toString
    // the status predicate must become a partition filter, not a data filter
    assert(plan.contains("PartitionFilters: [isnotnull(status"), plan)
    assert(q.count() == 2)
  }

  test("bucketed tables join with zero shuffle") {
    import org.apache.spark.sql.functions._
    val o = graft.Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val c = graft.Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
    // a previous JVM's warehouse dir survives while the in-memory
    // catalog does not — clear orphaned locations first
    Seq("b_orders", "b_customer").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = new org.apache.hadoop.fs.Path(s"spark-warehouse/$t")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    ParquetStore.writeBucketed(o, "b_orders", "o_custkey", 8)
    ParquetStore.writeBucketed(c, "b_customer", "c_custkey", 8)
    val joined = spark.table("b_orders")
      .join(spark.table("b_customer").hint("merge"),
        col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() > 0)
  }

  test("counters view reproduces the reference's per-phone tallies") {
    import spark.implicits._
    val msgs = Seq(
      ("m1", "sent", 100L), ("m1", "delivered", 100L),
      ("m2", "sent", 100L), ("m3", "sent", 200L))
      .toDF("messageId", "status", "phoneNumber")
    val c = ParquetStore.counters(msgs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(c(100L) == (3L, 1L))
    assert(c(200L) == (1L, 0L))
  }
}
