package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic message-status generator with the reference producer's
  * dataflow semantics, as seedable column-expression pipelines (no
  * driver-side loops — a narrow plan that scales to any row count).
  *
  * Reference semantics reproduced:
  *  - phone numbers: area code oneOf{212,415,713,404,602,503} +
  *    exchange U[200,999] + line U[1000,9999]
  *    (phone_message_producer.py:389-404)
  *  - carrier oneOf{verizon,att,t-mobile} (phone_message_producer.py:62)
  *  - delivery classification: normal 0.85 / delayed 0.10 / never 0.05
  *    (phone_message_producer.py:463-472, Config:47-49)
  *  - delivery delay: normal_delivery_time 30s, delayed_delivery_time
  *    180s (Config:52-53)
  *  - heartbeat re-send every 30s while undelivered
  *    (phone_message_producer.py:540-568)
  *  - per-key frozen vars and sent->delivered state machine
  *    (message-tracking.json:14-35, 56-71)
  *
  * Determinism: every column derives from the row id through the
  * portable md5 hash — not rand(), whose draw order is
  * partition-dependent — so the same (n, seed, t0) produces identical
  * rows on any cluster layout, and DuckDB can replay the exact stream.
  */
object Generator {

  val Carriers: Seq[String] = Seq("verizon", "att", "t-mobile")
  val AreaCodes: Seq[Int] = Seq(212, 415, 713, 404, 602, 503)

  /** Deterministic batch transcript (sent + heartbeats + delivered) of
    * n message lifecycles starting at epochMs t0. */
  def batch(spark: SparkSession, n: Long, seed: Long = 42L,
      t0: Long = 1700000000000L, timeoutMs: Long = 120000L,
      heartbeatMs: Long = 30000L): DataFrame = {
    val keyed = spark.range(0, n, 1, math.max(1, (n / 100000L).toInt))
      .selectExpr("id",
        s"cast(conv(substring(md5(cast(concat('k', id + $seed) as binary)), 1, 15), 16, 10) as bigint) AS h")
      .selectExpr(
        "concat('msg-', id) AS messageId",
        s"element_at(array(${AreaCodes.map(_ + "L").mkString(", ")}), cast(h % 6 + 1 as int)) * 10000000" +
          " + ((h div 6) % 800 + 200) * 10000" +
          " + ((h div 4800) % 9000 + 1000) AS phoneNumber",
        s"element_at(array(${Carriers.map(c => s"'$c'").mkString(", ")}), cast((h div 43200000) % 3 + 1 as int)) AS carrier",
        "(h % 10000) / 10000.0 AS u",
        s"$t0 + h % 60000 AS sentTime")
      .withColumn("delivery_type",
        when(col("u") < 0.85, "normal")
          .when(col("u") < 0.95, "delayed")
          .otherwise("never"))
      .withColumn("deliveryDelay",
        when(col("delivery_type") === "normal", 30000L)
          .when(col("delivery_type") === "delayed", 180000L))
      .withColumn("endMs", coalesce(col("deliveryDelay"), lit(timeoutMs)))

    val sent = keyed
      .selectExpr("messageId", "phoneNumber", "carrier", "sentTime",
        s"explode(sequence(0L, endMs - 1, ${heartbeatMs}L)) AS off")
      .select(col("messageId"), lit("sent").as("status"), col("phoneNumber"),
        col("carrier"), (col("sentTime") + col("off")).as("timestamp"))
    val delivered = keyed.filter(col("deliveryDelay").isNotNull)
      .select(col("messageId"), lit("delivered").as("status"),
        col("phoneNumber"), col("carrier"),
        (col("sentTime") + col("deliveryDelay")).as("timestamp"))
    sent.unionByName(delivered)
      .select("messageId", "status", "phoneNumber", "carrier", "timestamp")
  }

  /** DuckDB mirror of [[batch]] — same hash, same arithmetic. */
  def batchSql(n: Long, seed: Long = 42L, t0: Long = 1700000000000L,
      timeoutMs: Long = 120000L, heartbeatMs: Long = 30000L): String = {
    val areas = AreaCodes.mkString("[", ", ", "]")
    val carr = Carriers.map(c => s"'$c'").mkString("[", ", ", "]")
    s"""WITH ids AS (SELECT unnest(range(0, $n)) AS id),
       |keyed AS (SELECT id,
       |    CAST(concat('0x', substr(md5(concat('k', id + $seed)), 1, 15)) AS BIGINT) AS h
       |  FROM ids),
       |base AS (SELECT
       |    concat('msg-', id) AS messageId,
       |    CAST($areas[CAST(h % 6 + 1 AS INT)] AS BIGINT) * 10000000
       |      + ((h // 6) % 800 + 200) * 10000
       |      + ((h // 4800) % 9000 + 1000) AS phoneNumber,
       |    $carr[CAST((h // 43200000) % 3 + 1 AS INT)] AS carrier,
       |    (h % 10000) / 10000.0 AS u,
       |    $t0 + h % 60000 AS sentTime
       |  FROM keyed),
       |cls AS (SELECT *,
       |    CASE WHEN u < 0.85 THEN 30000 WHEN u < 0.95 THEN 180000 END AS deliveryDelay
       |  FROM base),
       |horizon AS (SELECT *, coalesce(deliveryDelay, $timeoutMs) AS endMs FROM cls),
       |sent AS (SELECT messageId, 'sent' AS status, phoneNumber, carrier,
       |    sentTime + off AS timestamp
       |  FROM (SELECT *, unnest(range(0, endMs, $heartbeatMs)) AS off FROM horizon)),
       |delivered AS (SELECT messageId, 'delivered' AS status, phoneNumber, carrier,
       |    sentTime + deliveryDelay AS timestamp
       |  FROM horizon WHERE deliveryDelay IS NOT NULL)
       |SELECT * FROM sent UNION ALL SELECT * FROM delivered""".stripMargin
  }

  /** Streaming variant over the rate source (D1/D5: rowsPerSecond
    * events/s; reference peak is 100/s from 100 forks x 1/s,
    * message-tracking.json:9,85-87). */
  def stream(spark: SparkSession, rowsPerSecond: Int = 100): DataFrame = {
    val raw = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
    raw.selectExpr(
      "concat('msg-', value) AS messageId",
      "'sent' AS status",
      s"element_at(array(${AreaCodes.map(_ + "L").mkString(", ")}), cast(value % 6 + 1 as int)) * 10000000" +
        " + (value * 7919) % 8000000 + 2001000 AS phoneNumber",
      s"element_at(array(${Carriers.map(c => s"'$c'").mkString(", ")}), cast(value % 3 + 1 as int)) AS carrier",
      "unix_millis(timestamp) AS timestamp")
  }
}
