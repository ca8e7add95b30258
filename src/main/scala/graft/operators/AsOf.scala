package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed AS-OF join — for every left row, the single right row
  * with the greatest timestamp at-or-before (or strictly before) the
  * left row's timestamp, per key. Spark has no native ASOF operator;
  * the engine expresses it as the classic union + per-key ordered
  * window: tag both sides, sort each key's rows by (ts, tag) so
  * visibility at equal timestamps encodes strictness, and carry the
  * last-seen right row forward with a running `last(..., ignoreNulls)`.
  *
  * Scale: ONE shuffle (hash on the key) and a per-key sort — no join
  * node, no range explosion, no per-row probing. This is the shape
  * that survives 100 TB: both inputs stream through the same exchange,
  * and AQE's skew handling applies to the single window shuffle. The
  * DuckDB oracle uses its native ASOF JOIN, pinning the semantics
  * (inner, greatest-prior, strictness) across engines.
  */
object AsOf {

  /** Generic library entry: left columns plus an `asof` struct holding
    * the matched right row (null when no prior right row exists).
    * `strict = true` matches rightTs < leftTs; false allows equality.
    * Right side should be unique per (key, ts) — pre-aggregate if not,
    * or the tie-winner among equal timestamps is unspecified.
    *
    * `leftTs`/`rightTs` are epoch-MS long columns, the same unit
    * contract as [[RangeJoin.rangeCount]]. TimestampType columns are
    * converted with `unix_millis` (a bare long cast would silently
    * yield SECONDS and mis-order against ms-based data). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, strict: Boolean = true): DataFrame = {
    val rType = org.apache.spark.sql.types.StructType(right.schema.fields)
    def ms(df: DataFrame, c: String) = df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_millis(col(c))
      case _ => col(c).cast("long")
    }
    // at equal ts the row sorting FIRST is invisible to the other side:
    // strict => left first (left must not see same-ts right rows)
    val (lTag, rTag) = if (strict) (0, 1) else (1, 0)
    val l2 = left.select(
      col(key).as("__k"), ms(left, leftTs).as("__t"),
      lit(lTag).as("__tag"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rType).as("__r"))
    val r2 = right.select(
      col(key).as("__k"), col(rightTs).cast("long").as("__t"),
      lit(rTag).as("__tag"),
      lit(null).cast(org.apache.spark.sql.types.StructType(left.schema.fields)).as("__l"),
      struct(right.columns.map(col): _*).as("__r"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn("asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__l").isNotNull)
      .select(col("__l.*"), col("asof"))
  }

  /** Event-time interval join: every left row paired with the right
    * rows sharing the key whose `rightTs` lies in the closed interval
    * [leftTs, leftTs + boundMs]. Both ts columns must be TimestampType
    * (event time). Works on batch AND streaming inputs with the same
    * plan; for stream-stream use, the caller puts a watermark on each
    * ts column first — the bounded predicate then lets Spark derive
    * eviction watermarks for both join buffers, so state is bounded by
    * the interval span (the s05 replay drives exactly that). The join
    * condition is side-qualified, so `leftKey == rightKey` (and any
    * other shared column names) analyze fine; the output is
    * left.* ++ right.* with Spark's usual duplicate-name caveat —
    * select through the same `l`/`r` qualifiers to disambiguate.
    *
    * `joinType` admits the outer variants: with "left_outer" a left row
    * with no in-interval match is emitted once with nulls on the right
    * — in streaming, that emission happens when the watermark passes
    * `leftTs + boundMs` (the row provably can no longer match), which
    * is the join-shaped form of the timeout alert (the s08 replay). */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String, boundMs: Long,
      joinType: String = "inner"): DataFrame = {
    val l = left.alias("l")
    val r = right.alias("r")
    l.join(r,
      col(s"l.$leftKey") === col(s"r.$rightKey") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") +
          expr(s"INTERVAL $boundMs MILLISECOND"),
      joinType)
  }

  // ---------------------------------------------------------------- x14
  /** Purchase attribution over the events stream: each `purchase` is
    * joined as-of to the user's latest strictly-prior non-purchase
    * event. Equal-timestamp events are pre-aggregated (max event_type)
    * so the tie-winner is deterministic in both engines. */
  def x14(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d)
    val ev = events.filter(col("event_type") =!= "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_type")).as("prior_event_type"))
      .select(col("user_id"), unix_millis(col("ts")).as("ems"),
        col("prior_event_type"))
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("pms"))
    asofJoin(p, ev, "user_id", "pms", "ems", strict = true)
      .filter(col("asof").isNotNull)
      .select(col("user_id"), col("pms").as("purchase_ms"),
        col("asof.prior_event_type").as("prior_event_type"),
        col("asof.ems").as("prior_ms"),
        (col("pms") - col("asof.ems")).as("gap_ms"))
  }

  val x14Sql: String =
    """WITH ev AS (SELECT user_id, ts, max(event_type) AS prior_event_type
      |            FROM events WHERE event_type <> 'purchase' GROUP BY user_id, ts),
      |p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
      |j AS (SELECT p.user_id, p.ts AS pts, e.prior_event_type, e.ts AS ets
      |      FROM p ASOF JOIN ev e ON p.user_id = e.user_id AND p.ts > e.ts)
      |SELECT user_id, epoch_ms(pts) AS purchase_ms, prior_event_type,
      |       epoch_ms(ets) AS prior_ms, epoch_ms(pts) - epoch_ms(ets) AS gap_ms
      |FROM j""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x14_asof_join" -> (x14 _),
  )

  val oracleSql: Map[String, String] = Map(
    "x14_asof_join" -> x14Sql,
  )
}
