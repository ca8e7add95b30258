package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Transcript tests for the E1 detector (scenarios from FIXTURES.md A3,
  * timings from the reference's Config: sent -> delivered at 30s/180s,
  * heartbeats every 30s, 5% never delivered). */
class DetectorSpec extends SparkSpec {

  private val T0 = 1700000000000L
  private val Timeout = 120000L // 2 minutes, README's "configurable timeout"

  /** Replay a transcript through the real streaming path; sentinel
    * batches push the watermark far enough that every timer fires. */
  private def run(events: Seq[MessageStatus]): Seq[UndeliveredAlert] = {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[MessageStatus]
    val qn = "det_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = UndeliveredDetector.alerts(src.toDS(), Timeout).writeStream
      .format("memory").queryName(qn).outputMode("append").start()
    try {
      val maxTs = events.map(_.timestamp).max
      src.addData(events)
      q.processAllAvailable()
      val s1 = MessageStatus("sentinel", "delivered", 0L, "none",
        maxTs + 10 * Timeout)
      src.addData(Seq(s1))
      q.processAllAvailable()
      src.addData(Seq(s1.copy(timestamp = s1.timestamp + 10 * Timeout)))
      q.processAllAvailable()
      spark.table(qn).as[UndeliveredAlert].collect().toSeq
        .filterNot(_.messageId == "sentinel")
    } finally q.stop()
  }

  private def sent(id: String, t: Long) =
    MessageStatus(id, "sent", 12125551234L, "verizon", t)
  private def delivered(id: String, t: Long) =
    MessageStatus(id, "delivered", 12125551234L, "verizon", t)

  test("normal delivery within timeout -> no alert") {
    assert(run(Seq(sent("a", T0), delivered("a", T0 + 30000))).isEmpty)
  }

  test("never delivered -> exactly one alert at firstSent + timeout") {
    val alerts = run(Seq(
      sent("a", T0), sent("a", T0 + 30000), sent("a", T0 + 60000)))
    assert(alerts.map(a => (a.messageId, a.sentTime, a.deadline)) ==
      Seq(("a", T0, T0 + Timeout)))
  }

  test("heartbeats do not extend the deadline") {
    // delivered at t0+150s: after the 120s deadline even though a
    // heartbeat arrived at t0+90s — alert must stand (ref parity:
    // sent_time governs, phone_message_producer.py:547-558)
    val alerts = run(Seq(
      sent("a", T0), sent("a", T0 + 90000), delivered("a", T0 + 150000)))
    assert(alerts.map(_.messageId) == Seq("a"))
  }

  test("delayed delivery inside timeout -> no alert") {
    val alerts = run(Seq(
      sent("a", T0), sent("a", T0 + 30000), delivered("a", T0 + 110000)))
    assert(alerts.isEmpty)
  }

  test("duplicate delivered -> still no alert, no crash") {
    val alerts = run(Seq(
      sent("a", T0), delivered("a", T0 + 30000), delivered("a", T0 + 31000)))
    assert(alerts.isEmpty)
  }

  test("delivered arriving before sent (out of order) resolves the key") {
    val alerts = run(Seq(delivered("a", T0 + 30000), sent("a", T0)))
    assert(alerts.isEmpty)
  }

  test("backfilled event behind the watermark still alerts (timer clamp)") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[MessageStatus]
    val qn = "det_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = UndeliveredDetector.alerts(src.toDS(), Timeout).writeStream
      .format("memory").queryName(qn).outputMode("append").start()
    try {
      def push(ms: MessageStatus*): Unit = {
        src.addData(ms.toSeq); q.processAllAvailable()
      }
      // key starts normally; its deadline is T0 + Timeout
      push(sent("late", T0))
      // another key far ahead drags the watermark way past that deadline
      push(sent("fresh", T0 + 20 * Timeout))
      // a heartbeat for the pending key arrives (its own timestamp is
      // current, so it passes the late-row filter, and having data
      // suppresses this batch's timeout processing): the state update
      // recomputes deadline = T0 + Timeout, which the watermark has
      // ALREADY overtaken — an unclamped setTimeoutTimestamp throws
      // IllegalArgumentException here and kills the whole query
      push(sent("late", T0 + 20 * Timeout))
      // advance the watermark twice so the clamped watermark+1 timer fires
      push(sent("fresh2", T0 + 40 * Timeout))
      push(sent("fresh3", T0 + 60 * Timeout))
      assert(q.exception.isEmpty, q.exception.toString)
      val alerts = spark.table(qn).as[UndeliveredAlert].collect()
      assert(alerts.exists(_.messageId == "late"),
        "overdue key must still alert once its (clamped) timer fires")
      // the alert reports the TRUE deadline, not the clamped timer time
      val late = alerts.find(_.messageId == "late").get
      assert(late.sentTime == T0 && late.deadline == T0 + Timeout)
    } finally q.stop()
  }

  test("streaming answer equals the batch twin on a generated stream") {
    import spark.implicits._
    val transcript = Generator.batch(spark, 300L, seed = 7L)
      .as[MessageStatus].collect().toSeq
    val streaming = run(transcript).map(_.messageId).sorted
    val batch = UndeliveredDetector
      .alertsBatch(transcript.toDS(), Timeout)
      .collect().map(_.messageId).sorted.toSeq
    assert(streaming == batch)
    assert(streaming.nonEmpty) // ~5% never-delivered keys must alert
  }
}
