package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The north-star stateful stream query (reference E1: "alert when
  * messages remain undelivered after a configurable timeout",
  * README.md:31-35; undelivered-message-alert/README.md:150-156 — the
  * reference declares it in prose but never implements it).
  *
  * Semantics (identical to the relational twin [[alertsBatch]]):
  *  - first `sent` for a key starts the clock: deadline = firstSent + timeout
  *  - repeated `sent` heartbeats are no-ops (state stays one record/key)
  *  - a `delivered` with timestamp <= deadline resolves the key: no alert
  *  - a `delivered` AFTER the deadline does not cancel the alert (the
  *    message was late — that is exactly the alert condition)
  *  - when the event-time watermark passes the deadline the alert fires
  *    and state is dropped
  *
  * Scale: state is bounded at one MsgState per in-flight key and is
  * hash-partitioned by messageId across executors; watermark-driven
  * timeouts guarantee eviction even when `delivered` never arrives.
  */
object UndeliveredDetector {

  /** Streaming detector over a MessageStatus stream. */
  def alerts(ds: Dataset[MessageStatus], timeoutMs: Long,
      watermarkDelay: String = "1 minute"): Dataset[UndeliveredAlert] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.withColumn("eventTime", timestamp_millis(col("timestamp")))
      .withWatermark("eventTime", watermarkDelay)
      .as[MessageStatus]
      .groupByKey(_.messageId)
      .flatMapGroupsWithState[MsgState, UndeliveredAlert](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update(timeoutMs))
  }

  /** State transition for one key and one micro-batch's events. */
  private[streaming] def update(timeoutMs: Long)(
      messageId: String,
      events: Iterator[MessageStatus],
      state: GroupState[MsgState]): Iterator[UndeliveredAlert] = {
    if (state.hasTimedOut) {
      val p = state.get
      state.remove()
      p.firstSent match {
        case Some(t0) if !p.firstDelivered.exists(_ <= t0 + timeoutMs) =>
          Iterator.single(UndeliveredAlert(
            messageId, p.phoneNumber, p.carrier, t0, t0 + timeoutMs))
        case _ => Iterator.empty // GC of a delivered-only orphan
      }
    } else {
      val evs = events.toSeq
      def mergedMin(cur: Option[Long], st: String): Option[Long] = {
        val ts = evs.filter(_.status == st).map(_.timestamp)
        (cur ++ ts).reduceOption(_ min _)
      }
      val prev = state.getOption
      val head = evs.head
      val merged = MsgState(
        prev.map(_.phoneNumber).getOrElse(head.phoneNumber),
        prev.map(_.carrier).getOrElse(head.carrier),
        mergedMin(prev.flatMap(_.firstSent), "sent"),
        mergedMin(prev.flatMap(_.firstDelivered), "delivered"))
      merged.firstSent match {
        case Some(t0) =>
          val deadline = t0 + timeoutMs
          if (merged.firstDelivered.exists(_ <= deadline)) {
            if (state.exists) state.remove() // resolved in time
          } else {
            state.update(merged) // pending (or late-delivered): alert at deadline
            state.setTimeoutTimestamp(clampToWatermark(state, deadline))
          }
        case None =>
          // delivered before its sent was seen: hold, GC after timeout
          state.update(merged)
          merged.firstDelivered.foreach(t =>
            state.setTimeoutTimestamp(clampToWatermark(state, t + timeoutMs)))
      }
      Iterator.empty
    }
  }

  /** GroupState.setTimeoutTimestamp throws when the timestamp is at or
    * below the current event-time watermark — reachable whenever an event
    * arrives more than timeout+watermarkDelay out of order (Kafka
    * backfill from earliest, skewed partitions with small timeouts).
    * Clamping to watermark+1 fires the already-expired timer on the next
    * micro-batch, which is the intended semantics for a deadline the
    * watermark has overtaken. */
  private def clampToWatermark(state: GroupState[MsgState], ts: Long): Long =
    math.max(ts, state.getCurrentWatermarkMs() + 1)

  /** Batch twin over the same Dataset — identical answer set computed
    * relationally (the oracle for the streaming path; SURVEY Q15 is this
    * shape over the events fixture). */
  def alertsBatch(ds: Dataset[MessageStatus], timeoutMs: Long)
      : Dataset[UndeliveredAlert] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupBy(col("messageId"))
      .agg(
        min(when(col("status") === "sent", col("timestamp"))).as("firstSent"),
        min(when(col("status") === "delivered", col("timestamp"))).as("firstDelivered"),
        first(col("phoneNumber")).as("phoneNumber"),
        first(col("carrier")).as("carrier"))
      .filter(col("firstSent").isNotNull &&
        (col("firstDelivered").isNull ||
          col("firstDelivered") > col("firstSent") + timeoutMs))
      .select(col("messageId"), col("phoneNumber"), col("carrier"),
        col("firstSent").as("sentTime"),
        (col("firstSent") + timeoutMs).as("deadline"))
      .as[UndeliveredAlert]
  }
}
