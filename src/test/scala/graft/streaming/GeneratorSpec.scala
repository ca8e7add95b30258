package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distribution and determinism properties of the reference-parity
  * generator (bounds from phone_message_producer.py:389-404, 463-472;
  * Config:47-49 rates). */
class GeneratorSpec extends SparkSpec {

  private lazy val df = Generator.batch(spark, 2000L).cache()

  test("phone numbers have a valid area code and 11 digits") {
    val bad = df.filter(
      !col("phoneNumber").between(2000000000L, 99999999999L) ||
        !floor(col("phoneNumber") / 10000000L)
          .isin(Generator.AreaCodes.map(_.toLong): _*))
    assert(bad.count() == 0)
  }

  test("carriers come from the reference domain") {
    val carr = df.select("carrier").distinct().collect().map(_.getString(0)).toSet
    assert(carr.subsetOf(Generator.Carriers.toSet))
  }

  test("delivery classification rates approximate 85/10/5") {
    val keys = df.filter(col("status") === "delivered")
      .select("messageId").distinct().count()
    val total = df.select("messageId").distinct().count()
    val deliveredRate = keys.toDouble / total
    // normal+delayed = 95% of keys get a delivered event
    assert(deliveredRate > 0.90 && deliveredRate < 0.99,
      s"deliveredRate=$deliveredRate")
  }

  test("same seed => identical transcript; different seed => different") {
    val a = Generator.batch(spark, 200L, seed = 1L).collect().toSet
    val b = Generator.batch(spark, 200L, seed = 1L).collect().toSet
    val c = Generator.batch(spark, 200L, seed = 2L).collect().toSet
    assert(a == b)
    assert(a != c)
  }

  test("heartbeats arrive every 30s until the terminal event") {
    import spark.implicits._
    val counts = df.filter(col("status") === "sent")
      .groupBy("messageId").count().as[(String, Long)].collect().toMap
    // normal: 30s window -> 1 sent; delayed: 180s -> 6; never: 120s cap -> 4
    assert(counts.values.toSet.subsetOf(Set(1L, 6L, 4L)))
  }

  test("streaming generator emits the wire schema") {
    val s = Generator.stream(spark, 100)
    assert(s.isStreaming)
    assert(s.schema.fieldNames.toSeq ==
      Seq("messageId", "status", "phoneNumber", "carrier", "timestamp"))
  }
}
