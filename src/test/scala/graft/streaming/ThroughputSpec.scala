package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** BASELINE SLO: sustain >= 100 events/s ingest (the reference's
  * ShadowTraffic peak, message-tracking.json:9,85-87) with alerting
  * within one trigger of timeout expiry. */
class ThroughputSpec extends SparkSpec {

  test("detector sustains well over 100 events/s through the full path") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = Generator.batch(spark, 2000L, seed = 3L)
      .as[MessageStatus].collect().toSeq
    assert(events.length >= 4000)
    val src = MemoryStream[MessageStatus]
    val qn = "thr_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = UndeliveredDetector.alerts(src.toDS(), 120000L).writeStream
      .format("memory").queryName(qn).outputMode("append").start()
    try {
      val t0 = System.nanoTime()
      // feed in 4 micro-batches to exercise steady-state batching
      events.grouped(math.max(1, events.length / 4)).foreach { b =>
        src.addData(b)
        q.processAllAvailable()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      val rate = events.length / secs
      info(f"ingest rate: $rate%.0f events/s over ${events.length} events")
      assert(rate > 100, f"rate $rate%.0f <= 100 events/s SLO")
    } finally q.stop()
  }
}
