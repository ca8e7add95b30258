package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Pins the streaming funnel's out-of-order semantics — the property a
  * naive min-per-step state silently gets wrong — and its agreement
  * with the x67 batch twin across multi-batch input. */
class FunnelDetectorSpec extends SparkSpec {

  private val Horizon = 1000000L

  /** Drive the detector over explicit micro-batches; the final two
    * sentinel batches (user −1) push the watermark past every timer. */
  private def run(batches: Seq[Seq[FunnelEvent]],
      watermarkDelayMs: Long = 60000L): Seq[FunnelVerdict] = {
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[FunnelEvent]
    val qn = "funnel_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = FunnelDetector.funnel(src.toDS(), Horizon, watermarkDelayMs)
      .writeStream
      .format("memory").queryName(qn).outputMode("append").start()
    try {
      batches.foreach { b => src.addData(b); q.processAllAvailable() }
      val maxTs = batches.flatten.map(_.tms).max
      val s1 = FunnelEvent(-1L, "sentinel", maxTs + 10 * Horizon)
      src.addData(Seq(s1)); q.processAllAvailable()
      src.addData(Seq(s1.copy(tms = s1.tms + 10 * Horizon)))
      q.processAllAvailable()
      spark.table(qn).as[FunnelVerdict].collect().toSeq
        .filterNot(_.user_id < 0)
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  private val T0 = 1700000000000L
  private def ev(u: Long, t: String, dt: Long) = FunnelEvent(u, t, T0 + dt)

  test("ordered chain in one batch: full funnel and stalled funnels") {
    val out = run(Seq(Seq(
      ev(1, "view", 0), ev(1, "click", 10), ev(1, "purchase", 20),
      ev(2, "view", 0), ev(2, "purchase", 5), // purchase before any click
      ev(3, "click", 0), ev(3, "purchase", 5) // no view: no row at all
    ))).map(v => v.user_id -> v).toMap
    assert(out(1L) == FunnelVerdict(1L, T0, Some(T0 + 10), Some(T0 + 20), 3L))
    assert(out(2L) == FunnelVerdict(2L, T0, None, None, 1L))
    assert(!out.contains(3L))
  }

  test("strictly-after: a click at the view's own timestamp does not count") {
    val out = run(Seq(Seq(ev(1, "view", 0), ev(1, "click", 0))))
    assert(out == Seq(FunnelVerdict(1L, T0, None, None, 1L)))
  }

  test("late view in a later batch lowers t1 and re-eligibilizes an earlier click") {
    // batch 1: view@50, click@30 (ineligible — before the only view);
    // batch 2 (within the watermark window): late view@10 — now the
    // click@30 IS after the first view. A running-min-per-step state
    // would have discarded the click's eligibility forever.
    val out = run(Seq(
      Seq(ev(1, "view", 50), ev(1, "click", 30)),
      Seq(ev(1, "view", 10))))
    assert(out == Seq(FunnelVerdict(1L, T0 + 10, Some(T0 + 30), None, 2L)))
  }

  test("post-finalize events never produce a second verdict for the same user") {
    // batch 1: user 1 reaches stage 2; the mid-sentinel at +10H pushes
    // the watermark past the +H finalize timer, so the verdict fires.
    // THEN a fresh full-funnel epoch for user 1 arrives at +20H (well
    // above the watermark — not a late row). Without the finalized
    // tombstone this rebuilds state, registers a +21H timer, and the
    // run() helper's closing sentinels (+30H/+40H) would fire it —
    // emitting a SECOND, different (stage-3) verdict for user 1.
    val late = 20 * Horizon
    val out = run(Seq(
      Seq(ev(1, "view", 0), ev(1, "click", 10)),
      Seq(FunnelEvent(-1L, "sentinel", T0 + 10 * Horizon)),
      Seq(ev(1, "view", late), ev(1, "click", late + 10),
        ev(1, "purchase", late + 20))))
    assert(out == Seq(FunnelVerdict(1L, T0, Some(T0 + 10), None, 2L)))
  }

  test("matches the x67 batch twin on the fixture replayed in many batches") {
    import spark.implicits._
    val fixture = graft.Tables.events(spark, sf)
      .selectExpr("user_id AS userId", "event_type AS eventType",
        "unix_millis(ts) AS tms")
      .as[FunnelEvent].collect().toSeq
    // 7 arbitrary batches — different batching must not change the
    // answer (watermark-pruned state, not batch-boundary luck).
    // Hash-split batches arrive in arbitrary TIME order, so the
    // watermark delay must span the fixture (40 days) or the later
    // batches would be legitimately dropped as late — this test is
    // about state maintenance across batches, not late-row policy
    // (the "late view" test above covers in-window lateness).
    val batches = fixture.groupBy(e => (e.userId * 2654435761L) % 7)
      .toSeq.sortBy(_._1).map(_._2)
    val horizon = 30L * 86400000L
    val wmDelay = 40L * 86400000L
    val got = {
      import spark.implicits._
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
      val src = MemoryStream[FunnelEvent]
      val qn = "funnel_fx_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = FunnelDetector.funnel(src.toDS(), horizon, wmDelay).writeStream
        .format("memory").queryName(qn).outputMode("append").start()
      try {
        batches.foreach { b => src.addData(b); q.processAllAvailable() }
        val maxTs = fixture.map(_.tms).max
        src.addData(Seq(FunnelEvent(-1L, "sentinel", maxTs + 10 * horizon)))
        q.processAllAvailable()
        src.addData(Seq(FunnelEvent(-1L, "sentinel", maxTs + 20 * horizon)))
        q.processAllAvailable()
        spark.table(qn).as[FunnelVerdict].collect().toSeq
          .filterNot(_.user_id < 0)
      } finally {
        q.stop()
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
    val batch = graft.operators.Funnel.x67(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4)))
      .sortBy(_._1).toSeq
    val stream = got.map(v => (v.user_id, v.t1_ms, v.t2_ms, v.t3_ms, v.stage))
      .sortBy(_._1)
    assert(stream == batch)
    assert(stream.nonEmpty)
  }
}
