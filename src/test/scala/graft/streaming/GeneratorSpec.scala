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

  test("streaming generator runs the full lifecycle: sent -> heartbeats -> delivered") {
    // compressed clocks sized to the observed ~0.5s micro-batch cadence:
    // heartbeat timers fire roughly once per batch, so a 1.5s normal
    // delay yields 2-3 heartbeat re-sends before the delivered
    // transition; batch 0 alone takes ~3.5s of one-time streaming init
    val ds = Generator.stream(spark, rowsPerSecond = 30,
      heartbeatMs = 250L, timeoutMs = 4000L, normalMs = 1500L,
      delayedMeanMs = 2500L, delayedStdMs = 200L)
    val qn = "gen_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = Generator.streamWriter(ds, tickMs = 100L)
      .format("memory").queryName(qn).start()
    try {
      // wait on the observable condition, not wall clock: a loaded host
      // stretches micro-batch cadence and a fixed sleep would flake.
      // The condition must include BOTH observables asserted below:
      // waiting on delivered alone races the heartbeat timers — under
      // load every observed key can deliver before any heartbeat fires
      // (B8 flake, round-13 verdict)
      val deadline = System.currentTimeMillis() + 60000
      def done(): Boolean = {
        val st = spark.table(qn).groupBy("status").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val heartbeatSeen = spark.table(qn)
          .filter(col("status") === "sent")
          .groupBy("messageId").count()
          .filter(col("count") >= 2).limit(1).count() > 0
        st.getOrElse("delivered", 0L) >= 3L && heartbeatSeen
      }
      while (!done() && q.exception.isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(300)
      assert(q.exception.isEmpty, q.exception.toString)
    } finally q.stop()
    val rows = spark.table(qn).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(4)))
    spark.catalog.dropTempView(qn)
    assert(rows.nonEmpty, "generator emitted nothing")
    val byKey = rows.groupBy(_._1)
    val delivered = byKey.filter(_._2.exists(_._2 == "delivered"))
    assert(delivered.nonEmpty, "no key reached the delivered transition")
    delivered.foreach { case (k, evs) =>
      val sorted = evs.sortBy(_._3)
      assert(sorted.head._2 == "sent", s"$k did not start with sent")
      assert(evs.count(_._2 == "delivered") == 1, s"$k delivered twice")
      // delivered carries the terminal timestamp: sentTime + frozen delay
      val dts = evs.find(_._2 == "delivered").get._3
      assert(dts > sorted.head._3, s"$k delivered before sent")
    }
    // B8: at least one key re-sent a heartbeat while waiting
    assert(byKey.values.exists(evs => evs.count(_._2 == "sent") >= 2),
      "no heartbeat re-emission observed")
  }
}
