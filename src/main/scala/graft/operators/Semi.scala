package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Semi-structured payload extraction — the `events.props` column is a
  * JSON string (ref: the producer's free-form message metadata,
  * phone_message_producer.py:390-408 builds dict payloads), and a real
  * pipeline parses it into typed columns before aggregating.
  *
  * Scale posture: `from_json` with an EXPLICIT schema is a narrow
  * per-row expression — no inference pass over the corpus (schema
  * inference at 100 TB is a full extra scan; a production job samples
  * once offline and pins the schema, which is what the hardcoded
  * struct here models). The aggregation is a plain partial+final hash
  * agg on the low-cardinality event_type key.
  */
object Semi {

  private val propsSchema = new StructType().add("k", LongType)

  /** Library entry: parse a JSON column by schema and aggregate a typed
    * field per group. */
  def jsonFieldStats(df: DataFrame, jsonCol: String, groupCol: String)
      : DataFrame =
    df.select(col(groupCol),
        from_json(col(jsonCol), propsSchema).getField("k").as("k"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))

  def x31(s: SparkSession, d: String): DataFrame =
    jsonFieldStats(Tables.events(s, d), "props", "event_type")

  // json_valid guard pins DuckDB to the declared malformed-payload
  // semantic: Spark's from_json yields NULL for a payload that doesn't
  // parse, DuckDB's json_extract RAISES — found by the fuzz/degenerate
  // gate injecting empty and non-JSON props values
  val x31Sql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k
      |FROM (SELECT event_type,
      |        CAST(json_extract(
      |          CASE WHEN json_valid(props) THEN props END, '$.k')
      |          AS BIGINT) AS k
      |      FROM events)
      |GROUP BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x31_json_extract" -> (x31 _),
  )

  val oracleSql: Map[String, String] = Map(
    "x31_json_extract" -> x31Sql,
  )
}
