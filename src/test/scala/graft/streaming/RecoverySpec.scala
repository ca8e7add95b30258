package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** B12 parity: the reference reloads its active/delivered sets from
  * SQLite on restart (phone_message_producer.py:366-372); here the
  * checkpointed state store replays the same role — keyed state must
  * survive a stop/start of the query. */
class RecoverySpec extends SparkSpec {

  private val T0 = 1700000000000L
  private val Timeout = 120000L

  test("detector state survives a query restart via checkpoint") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = Files.createTempDirectory("ckpt")
    val ckpt = tmp.resolve("cp").toString
    val out = tmp.resolve("out").toString
    val src = MemoryStream[MessageStatus]
    def start() = UndeliveredDetector.alerts(src.toDS(), Timeout).writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    // phase 1: two in-flight keys, one resolves in time; then STOP
    val q1 = start()
    src.addData(Seq(
      MessageStatus("a", "sent", 1L, "att", T0),
      MessageStatus("b", "sent", 2L, "verizon", T0),
      MessageStatus("b", "delivered", 2L, "verizon", T0 + 30000)))
    q1.processAllAvailable()
    q1.stop()

    // phase 2: restart from the checkpoint; only the watermark moves
    val q2 = start()
    val s1 = MessageStatus("sentinel", "delivered", 0L, "none", T0 + 10 * Timeout)
    src.addData(Seq(s1))
    q2.processAllAvailable()
    src.addData(Seq(s1.copy(timestamp = s1.timestamp + 10 * Timeout)))
    q2.processAllAvailable()
    q2.stop()

    val alerts = spark.read.parquet(out).as[UndeliveredAlert]
      .collect().filterNot(_.messageId == "sentinel")
    // key "a" was only in pre-restart state: alerting proves recovery
    assert(alerts.map(_.messageId).toSeq == Seq("a"))
    assert(alerts.head.sentTime == T0)
  }

  test("generator lifecycle state survives a restart via checkpoint") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("genckpt")
    val ckpt = tmp.resolve("cp").toString
    val out = tmp.resolve("out").toString
    // delays long enough that keys born in phase 1 deliver only after
    // the restart — their delivered event then PROVES recovered state
    // (their birth offsets are committed and never replayed)
    def start() = Generator.streamWriter(
      Generator.stream(spark, rowsPerSecond = 30, heartbeatMs = 300L,
        timeoutMs = 60000L, normalMs = 4000L,
        delayedMeanMs = 8000L, delayedStdMs = 200L), tickMs = 100L)
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()

    val q1 = start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while ((q1.recentProgress.map(_.numInputRows).sum < 10 ||
        q1.recentProgress.length < 3) &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
    } finally q1.stop()
    val p1 = spark.read.parquet(out).as[MessageStatus].collect()
    assert(p1.exists(_.status == "sent"), "phase 1 produced no births")
    val pending = p1.filter(_.status == "sent").map(_.messageId).toSet --
      p1.filter(_.status == "delivered").map(_.messageId).toSet
    assert(pending.nonEmpty, "no in-flight keys at the restart point")

    val q2 = start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      def deliveredNow() = spark.read.parquet(out).as[MessageStatus]
        .filter(_.status == "delivered").map(_.messageId).collect().toSet
      while (deliveredNow().intersect(pending).isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(500)
    } finally q2.stop()
    val p2 = spark.read.parquet(out).as[MessageStatus].collect()
    val recovered = p2.filter(_.status == "delivered")
      .map(_.messageId).toSet.intersect(pending)
    assert(recovered.nonEmpty,
      "no pre-restart key delivered after restart — state was lost")
  }

  test("stream-stream join buffer survives a restart via checkpoint") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = Files.createTempDirectory("joinckpt")
    val ckpt = tmp.resolve("cp").toString
    val out = tmp.resolve("out").toString
    val src = MemoryStream[MessageStatus]
    def start() = {
      val base = src.toDS().toDF()
        .withColumn("eventTime", timestamp_millis(col("timestamp")))
      val sent = base.filter(col("status") === "sent")
        .select(col("messageId"), col("eventTime").as("sentTime"))
        .withWatermark("sentTime", "1 minute")
      val dlv = base.filter(col("status") === "delivered")
        .select(col("messageId").as("d_id"), col("eventTime").as("dlvTime"))
        .withWatermark("dlvTime", "1 minute")
      graft.operators.AsOf.intervalJoin(sent, dlv, "messageId", "d_id",
          "sentTime", "dlvTime", Timeout)
        .select(col("messageId"), col("sentTime"), col("dlvTime"))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
    }
    // phase 1: a sent event with no delivery yet — it lives only in the
    // left join buffer when the query stops
    val q1 = start()
    src.addData(Seq(MessageStatus("a", "sent", 1L, "att", T0)))
    q1.processAllAvailable()
    q1.stop()
    // phase 2: restart; the delivery arrives within the bound and must
    // match the BUFFERED sent row — emission proves buffer recovery
    val q2 = start()
    src.addData(Seq(MessageStatus("a", "delivered", 1L, "att", T0 + 30000)))
    q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(out).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a"))
  }

  test("monitor listener observes progress and bounded state") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val l = Monitor.attach(spark)
    try {
      val src = MemoryStream[MessageStatus]
      val qn = "mon_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = UndeliveredDetector.alerts(src.toDS(), Timeout).writeStream
        .format("memory").queryName(qn).outputMode("append").start()
      src.addData((0 until 500).map(i =>
        MessageStatus(s"m$i", "sent", i.toLong, "att", T0 + i)))
      q.processAllAvailable()
      q.stop()
      assert(l.lastSnapshot.isDefined)
      assert(l.totalInputRows == 500)
      assert(l.maxStateRows == 500) // one state row per in-flight key
      assert(l.lastError.isEmpty)
    } finally spark.streams.removeListener(l)
  }
}
