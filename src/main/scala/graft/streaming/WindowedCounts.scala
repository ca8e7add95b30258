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
}
