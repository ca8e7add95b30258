package graft.streaming

import graft.SparkSpec
import graft.functions.{Hll, PortableHash}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Proves s13's two claims the oracle gate cannot see: the window emits
  * ONCE with its final sketch when the watermark passes it, and its
  * state-store entry is EVICTED (bounded streaming-cardinality state).
  */
class WindowedHllSpec extends SparkSpec {
  import spark.implicits._

  private val H0 = 3600_000L * 1000 // some full hour, ms

  private def msg(id: String, ts: Long) =
    MessageStatus(id, "sent", 1L, "att", ts)

  /** Driver-side (z_scaled, v_empty) of a value set — same contract as
    * HllSpec's reference. */
  private def zv(values: Seq[String]): (Long, Int) = {
    val regs = new Array[Int](Hll.M)
    values.foreach { s =>
      val h = PortableHash.h60(s)
      val w = h >>> 6
      val rho = if (w == 0L) Hll.MaxRho
        else Hll.MaxRho - (64 - java.lang.Long.numberOfLeadingZeros(w))
      val j = (h % Hll.M).toInt
      if (rho > regs(j)) regs(j) = rho
    }
    (regs.map(r => 1L << (Hll.MaxRho - r)).sum, regs.count(_ == 0))
  }

  test("window emits once with the final sketch; closed-window state is evicted") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val l = Monitor.attach(spark)
    val src = MemoryStream[MessageStatus]
    val agg = src.toDS().toDF()
      .withColumn("eventTime", timestamp_millis(col("timestamp")))
      .withWatermark("eventTime", "1 minute")
      .groupBy(window(col("eventTime"), "1 hour"), col("carrier"))
      .agg(Hll.sketch(col("messageId")).as("sk"))
      .select(col("window.start").as("win_start"), col("carrier"),
        $"sk.z_scaled", $"sk.v_empty")
    val qn = "whll_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = agg.writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    try {
      // batch 1: 40 distinct + 10 repeated ids inside hour-window A
      val ids = (0 until 40).map(i => s"u$i")
      src.addData((ids ++ ids.take(10)).zipWithIndex.map {
        case (id, i) => msg(id, H0 + i * 1000L) })
      q.processAllAvailable()
      assert(spark.table(qn).count() == 0, "window A must not emit while open")
      // batch 2: one event 3 hours later — watermark passes window A
      src.addData(Seq(msg("late", H0 + 3 * 3600_000L)))
      q.processAllAvailable()
      val rows = spark.table(qn).collect()
      assert(rows.length == 1, s"window A emits exactly once: ${rows.toSeq}")
      val (wantZ, wantV) = zv(ids)
      assert((rows(0).getLong(2), rows(0).getInt(3)) == (wantZ, wantV),
        "emitted sketch must be the window's final register state")
      // eviction: after the emitting batch, only window B's group
      // remains. Progress events are ASYNC (see RecoverySpec) — poll
      // briefly so a loaded box can deliver the final event.
      val deadline = System.nanoTime() + 5_000_000_000L
      while (!l.lastSnapshot.exists(_.stateRows == 1) &&
          System.nanoTime() < deadline) Thread.sleep(50)
      assert(l.lastSnapshot.exists(_.stateRows == 1),
        s"closed window's state must be evicted, saw ${l.lastSnapshot}")
      assert(l.maxStateRows >= 2) // both windows coexisted at the peak
    } finally {
      q.stop()
      spark.catalog.dropTempView(qn)
      spark.streams.removeListener(l)
    }
  }
}
