package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed range (interval) join — "right rows within a time window
  * of each left row, per key" without a nested-loop plan. A naive
  * `ON key AND ts BETWEEN ...` inequality join degenerates to
  * per-key cartesian products (4k events/key at sf0.1 is already 16M
  * pairs/key); the engine instead quantizes time into window-sized
  * buckets, equi-joins on (key, bucket) with each left row probing its
  * own and the preceding bucket, and applies the exact range predicate
  * to the tiny candidate set. Candidates per left row are bounded by
  * two buckets' occupancy, the join is a plain hash shuffle on a
  * uniform composite key, and no double-counting is possible because
  * every right row lives in exactly one bucket.
  */
object RangeJoin {

  /** Count of right events in [leftTs - windowMs, leftTs) per left row
    * (zero-match left rows kept with count 0). Columns: left.* +
    * `range_count`. `leftTs`/`rightTs` are epoch-ms long columns.
    *
    * Duplicate semantics: the result has one row per DISTINCT left row
    * — fully-identical left rows collapse into one output row whose
    * count sums their matches, exactly like the SQL twin
    * `LEFT JOIN ... GROUP BY left.*`. Callers needing row-per-row
    * output for duplicated inputs should first attach a unique id
    * column (e.g. `monotonically_increasing_id()`); it then rides
    * through as part of left.* and keeps every row distinct. */
  def rangeCount(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, windowMs: Long): DataFrame = {
    val r2 = right.select(col(key).as("__k"), col(rightTs).as("__rt"),
      floor(col(rightTs) / windowMs).as("__b"))
    val probes = left
      .withColumn("__bucket", explode(array(
        floor(col(leftTs) / windowMs) - 1, floor(col(leftTs) / windowMs))))
    val leftCols = left.columns.map(col)
    probes
      .join(r2,
        probes("__bucket") === r2("__b") && col(key) === col("__k") &&
          col("__rt") >= col(leftTs) - windowMs && col("__rt") < col(leftTs),
        "left_outer")
      .groupBy(leftCols: _*)
      .agg(count(col("__rt")).as("range_count"))
  }

  // ---------------------------------------------------------------- x15
  /** Session intensity: for every purchase, how many non-purchase
    * events the same user produced in the preceding 5 minutes. */
  def x15(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d)
    val ev = events.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("ems"))
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("purchase_ms"))
    rangeCount(p, ev, "user_id", "purchase_ms", "ems", 300000L)
      .withColumnRenamed("range_count", "prior_5m_events")
  }

  val x15Sql: String =
    """WITH e AS (SELECT user_id, epoch_ms(ts) AS ems FROM events
      |           WHERE event_type <> 'purchase'),
      |p AS (SELECT user_id, epoch_ms(ts) AS purchase_ms FROM events
      |      WHERE event_type = 'purchase')
      |SELECT p.user_id, p.purchase_ms, count(e.ems) AS prior_5m_events
      |FROM p LEFT JOIN e ON e.user_id = p.user_id
      |  AND e.ems >= p.purchase_ms - 300000 AND e.ems < p.purchase_ms
      |GROUP BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x15_range_join" -> (x15 _),
  )

  val oracleSql: Map[String, String] = Map(
    "x15_range_join" -> x15Sql,
  )
}
