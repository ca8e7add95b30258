package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** E2 monitoring views (reference: undelivered-message-alert/
  * README.md:12, 125-131 — "Real-time Statistics", carrier
  * distribution): tumbling event-time windows with a watermark so state
  * is bounded and late rows beyond the delay are dropped.
  */
object WindowedCounts {

  /** status x carrier counts per tumbling window. Works for both batch
    * and streaming inputs (same plan — Spark picks the incremental
    * execution under writeStream). */
  def byCarrier(ds: Dataset[MessageStatus], window_ : String = "1 minute",
      watermarkDelay: String = "2 minutes"): DataFrame =
    ds.withColumn("eventTime", timestamp_millis(col("timestamp")))
      .withWatermark("eventTime", watermarkDelay)
      .groupBy(window(col("eventTime"), window_), col("carrier"), col("status"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("carrier"),
        col("status"), col("cnt"))

  /** status × carrier counts per HOPPING (sliding) window: duration >
    * slide, so each event lands in duration/slide overlapping windows
    * — the "last hour, refreshed every 30 minutes" monitoring shape
    * tumbling windows can't express (a tumbling hour answers stale by
    * up to an hour). State per open (window, carrier, status) key is
    * still watermark-bounded: a window's state is evicted once the
    * watermark passes its END, so overlap multiplies live state by
    * duration/slide, not by history. */
  def byCarrierHopping(ds: Dataset[MessageStatus],
      duration: String = "1 hour", slide: String = "30 minutes",
      watermarkDelay: String = "2 minutes"): DataFrame =
    ds.withColumn("eventTime", timestamp_millis(col("timestamp")))
      .withWatermark("eventTime", watermarkDelay)
      .groupBy(window(col("eventTime"), duration, slide), col("carrier"),
        col("status"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("carrier"),
        col("status"), col("cnt"))
}
