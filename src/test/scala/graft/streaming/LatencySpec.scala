package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Alert-latency SLO for the E1 detectors (BASELINE.md derives "alert
  * within one trigger interval of timeout expiry"): once a micro-batch
  * advances the event-time watermark past a pending key's deadline,
  * the alert must surface by the NEXT trigger — the batch in which
  * Spark fires expired event-time timers. The test counts triggers,
  * not wall-clock (trigger cadence is the deployment's knob; the SLO
  * is detector-added latency in units of triggers). Covers both state
  * backends: flatMapGroupsWithState (HDFS store) and transformWithState
  * (RocksDB). */
class LatencySpec extends SparkSpec {

  private val T0 = 1700000000000L
  private val Timeout = 120000L
  private val WatermarkDelay = 60000L // detectors' default "1 minute"

  private def sent(id: String, t: Long) =
    MessageStatus(id, "sent", 12125551234L, "verizon", t)

  /** Drive one pending key to expiry and return how many triggers after
    * the watermark passed its deadline the alert appeared (0 = same
    * trigger that advanced the watermark, 1 = the next one, ...). */
  private def triggersToAlert(
      detector: Dataset[MessageStatus] => Dataset[UndeliveredAlert]): Int = {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[MessageStatus]
    val qn = "lat_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = detector(src.toDS()).writeStream
      .format("memory").queryName(qn).outputMode("append").start()
    try {
      def alerted: Boolean =
        spark.table(qn).as[UndeliveredAlert].collect()
          .exists(_.messageId == "slo")
      // trigger 1: the key under test starts its clock
      src.addData(Seq(sent("slo", T0)))
      q.processAllAvailable()
      assert(!alerted, "alert before the deadline is a correctness bug")
      // trigger 2: an advancer event whose timestamp puts the watermark
      // (maxEventTime - delay, computed at batch END) past the deadline
      src.addData(Seq(sent("adv1", T0 + Timeout + WatermarkDelay + 1000L)))
      q.processAllAvailable()
      var triggers = 0
      // subsequent triggers: each advances the watermark further; the
      // SLO demands the alert on the FIRST of these
      while (!alerted && triggers < 5) {
        triggers += 1
        src.addData(Seq(
          sent(s"adv${triggers + 1}",
            T0 + Timeout + WatermarkDelay + (triggers + 1) * 1000L)))
        q.processAllAvailable()
      }
      assert(alerted, "alert never fired within 5 triggers of expiry")
      triggers
    } finally q.stop()
  }

  test("flatMapGroupsWithState detector alerts within one trigger of expiry") {
    val t = triggersToAlert(UndeliveredDetector.alerts(_, Timeout))
    assert(t <= 1, s"alert took $t triggers after the watermark passed the deadline")
  }

  test("transformWithState detector alerts within one trigger of expiry") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val t = triggersToAlert(TwsDetector.alerts(_, Timeout))
      assert(t <= 1, s"alert took $t triggers after the watermark passed the deadline")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
