package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** One event of the product-analytics stream the ordered funnel runs
  * over: (user, step name, event-time millis). */
case class FunnelEvent(userId: Long, eventType: String, tms: Long)

/** Per-user funnel state. `minView` is the running min view time
  * (Long.MaxValue = none yet); `clicks`/`purchases` are ASCENDING,
  * watermark-pruned candidate lists (see [[FunnelDetector]] for the
  * pruning invariant — they are bounded by the out-of-orderness
  * window, not by user history); `lastSeen` drives the finalize
  * timer. */
case class FunnelLife(
    minView: Long,
    clicks: Seq[Long],
    purchases: Seq[Long],
    lastSeen: Long)

/** Finalized funnel verdict for one user — the same row shape as the
  * batch twin (operators.Funnel.orderedFunnel / x67). */
case class FunnelVerdict(
    user_id: Long,
    t1_ms: Long,
    t2_ms: Option[Long],
    t3_ms: Option[Long],
    stage: Long)

/** Streaming ordered funnel (view → click → purchase) on
  * `transformWithState`: per-user tri-state finalized by an event-time
  * timer `horizonMs` past the user's last event, emitting one append
  * row per user who completed step 1 — the streaming twin of the x67
  * batch operator, with identical strictly-after semantics.
  *
  * Why the state is NOT the naive "min time per step": t2 is the min
  * click STRICTLY AFTER the final t1, and a late view (still inside
  * the watermark) can lower t1, which can make an earlier-timestamped
  * click newly eligible. A single running min per step silently
  * converges to the wrong funnel on out-of-order input. And the other
  * naive shape — buffer every event until the timer fires — is exact
  * but keeps O(user history) state, the thing the batch operator's
  * scaladoc already refuses to do.
  *
  * Instead the state keeps exactly the candidates that can still
  * matter, pruned per batch against the WATERMARK: no event below the
  * watermark can arrive anymore, so
  *
  *   L1 = min(minView, W)  — no future view lands below W, so the
  *        final t1 is ≥ L1: every click ≤ L1 is ineligible forever;
  *   U1 = minView          — the final t1 is ≤ the running min, so the
  *        first click after U1 is eligible for EVERY outcome: clicks
  *        above it can never be the minimum → keep clicks in
  *        (L1, succ(U1)];
  *
  * and the same cascade one level down for purchases against
  * L2 = min(smallest kept click, W) and U2 = succ(U1). Kept lists are
  * supersets of the true candidates, so the timer's final evaluation
  * applies the exact strictly-after chain over them; their size is
  * bounded by how far events arrive out of order (the watermark
  * window), independent of how long the user has been active. The
  * prune bound subtracts the watermark delay once more, so it stays
  * conservative even at the exact late-row boundary.
  *
  * One verdict per user, ever: when the finalize timer fires, the
  * state is replaced by a FINALIZED sentinel (`minView =
  * Long.MinValue` — below any epoch-ms event time) instead of being
  * cleared, and `handleInputRows` drops all further events for a
  * finalized user without re-arming a timer. Without the marker, a
  * post-horizon event would rebuild state from scratch and eventually
  * emit a SECOND row for the same user, diverging from the batch
  * twin's one-row-per-user contract. The cost is one tombstone row
  * per finalized user (a 4-field record, candidate lists empty) —
  * bounded by distinct users, not by events; callers that need
  * reclamation can layer a processing-time TTL on the store.
  */
object FunnelDetector {

  /** Sentinel `minView` marking a user whose verdict already fired —
    * below any epoch-ms event time, so unreachable by real input. */
  private val Finalized = Long.MinValue

  class Processor(horizonMs: Long, delayMs: Long)
      extends StatefulProcessor[Long, FunnelEvent, FunnelVerdict] {

    @transient private var state: ValueState[FunnelLife] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[FunnelLife](
        "funnel", Encoders.product[FunnelLife], TTLConfig.NONE)

    /** Elements of `xs` in (lo, succ(hi)] — the pruning window: drop
      * what can never be eligible (≤ lo), drop what can never be the
      * minimum (beyond the first element above hi). `xs` ascending. */
    private def pruneWindow(xs: Seq[Long], lo: Long, hi: Long): Seq[Long] = {
      val kept = xs.dropWhile(_ <= lo)
      val i = kept.indexWhere(_ > hi)
      if (i < 0) kept else kept.take(i + 1)
    }

    private def insertAsc(xs: Seq[Long], t: Long): Seq[Long] = {
      val i = xs.indexWhere(_ >= t)
      if (i < 0) xs :+ t
      else if (xs(i) == t) xs // duplicates never change a min
      else (xs.take(i) :+ t) ++ xs.drop(i)
    }

    override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
        timerValues: TimerValues): Iterator[FunnelVerdict] = {
      val prev = if (state.exists()) state.get()
        else FunnelLife(Long.MaxValue, Nil, Nil, Long.MinValue)
      if (prev.minView == Finalized) { // verdict already emitted: drop
        rows.foreach(_ => ())
        return Iterator.empty
      }
      var life = prev
      rows.foreach { ev =>
        life = ev.eventType match {
          case "view" => life.copy(
            minView = math.min(life.minView, ev.tms),
            lastSeen = math.max(life.lastSeen, ev.tms))
          case "click" => life.copy(
            clicks = insertAsc(life.clicks, ev.tms),
            lastSeen = math.max(life.lastSeen, ev.tms))
          case "purchase" => life.copy(
            purchases = insertAsc(life.purchases, ev.tms),
            lastSeen = math.max(life.lastSeen, ev.tms))
          case _ => life.copy(lastSeen = math.max(life.lastSeen, ev.tms))
        }
      }
      // conservative floor: one delay below the operator's late-row
      // bound, so a row admitted exactly at the boundary still finds
      // its candidates
      val w = timerValues.getCurrentWatermarkInMs() - delayMs
      val l1 = math.min(life.minView, w)
      val clicks = pruneWindow(life.clicks, l1, life.minView)
      val l2 = math.min(clicks.headOption.getOrElse(Long.MaxValue), w)
      val u2 = clicks.lastOption.filter(_ > life.minView).getOrElse(Long.MaxValue)
      val purchases = pruneWindow(life.purchases, l2, u2)
      state.update(FunnelLife(life.minView, clicks, purchases, life.lastSeen))
      // re-arm only when the horizon moved — late rows must not
      // re-register (the pending timer already covers them)
      if (life.lastSeen != prev.lastSeen) {
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(life.lastSeen + horizonMs)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[FunnelVerdict] = {
      if (!state.exists()) return Iterator.empty
      val p = state.get()
      if (p.minView == Finalized) return Iterator.empty
      // tombstone, not clear: post-finalize events must not rebuild
      // state and double-emit (one-row-per-user contract)
      state.update(FunnelLife(Finalized, Nil, Nil, p.lastSeen))
      if (p.minView == Long.MaxValue) return Iterator.empty
      // exact strictly-after chain over the kept supersets
      val t1 = p.minView
      val t2 = p.clicks.find(_ > t1)
      val t3 = t2.flatMap(c => p.purchases.find(_ > c))
      val stage = 1L + (if (t2.isDefined) 1L else 0L) +
        (if (t3.isDefined) 1L else 0L)
      Iterator.single(FunnelVerdict(key, t1, t2, t3, stage))
    }
  }

  /** Funnel rows for an event stream; finalize `horizonMs` after each
    * user's last event (event time), watermark-driven. One delay knob
    * feeds both the watermark and the processor's conservative prune
    * floor, so they cannot drift apart. */
  def funnel(ds: Dataset[FunnelEvent], horizonMs: Long,
      watermarkDelayMs: Long = 60000L): Dataset[FunnelVerdict] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.withColumn("eventTime", timestamp_millis(col("tms")))
      .withWatermark("eventTime", s"$watermarkDelayMs milliseconds")
      .as[FunnelEvent]
      .groupByKey(_.userId)
      .transformWithState(new Processor(horizonMs, watermarkDelayMs),
        TimeMode.EventTime(), OutputMode.Append(),
        implicitly[org.apache.spark.sql.Encoder[FunnelVerdict]])
  }
}
