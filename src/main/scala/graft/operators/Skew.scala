package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join handling covers sort-merge
  * joins it can observe at runtime; explicit salting remains the tool
  * when a known-hot key must never land on one reducer (or when the
  * skewed side feeds a non-SMJ plan). The salted AGGREGATION twin of
  * this technique is oracle-checked as q21.
  */
object Skew {

  /** Inner equi-join with the big side's rows scattered across
    * `saltBuckets` sub-partitions per key and the small side replicated
    * once per bucket: the hot key's probe rows spread over saltBuckets
    * reducers instead of one. Result is exactly `big.join(small, key)`.
    *
    * The salt mixes a whole-row hash with a partition-local row index
    * (`monotonically_increasing_id` = partitionId << 33 | row counter):
    * the index term guarantees spread even when a hot key's rows are
    * byte-identical duplicates (all hashing to one bucket otherwise —
    * the exact pathology salting exists to fix). Salt values can differ
    * across task retries, but the salt never reaches the output and any
    * bucket assignment yields the same join result. Inputs must not
    * already carry a `__salt` column. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int = 16): DataFrame = {
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedJoin: inputs must not already have a __salt column")
    val b = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*) + monotonically_increasing_id(),
        lit(saltBuckets)))
    val s = small.withColumn("__salt",
      explode(array((0 until saltBuckets).map(i => lit(i)): _*)))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Hot-key probe side for q22: half of lineitem lands on key 0 (the
    * pathology salting exists for), the rest spreads over nation's 25
    * keys. Both engines derive it with the same integer arithmetic. */
  private def hotKeyed(lineitem: DataFrame): DataFrame =
    lineitem.select(
      when(col("l_orderkey") % 10 < 5, lit(0L))
        .otherwise(col("l_orderkey") % 25).as("k"),
      col("l_quantity"))

  /** q22 — salted join, oracle-checked: result must equal the PLAIN
    * join (the salt is pure partitioning mechanics and never reaches
    * the output), aggregated to a stable integer-only shape. */
  def q22(s: SparkSession, d: String): DataFrame =
    saltedJoin(
      hotKeyed(Tables.lineitem(s, d)),
      Tables.nation(s, d).select(col("n_nationkey").as("k"), col("n_name")),
      "k")
      .groupBy("k", "n_name")
      .agg(count(lit(1)).as("n_rows"),
        // quantities are small exact integers stored as double: the
        // double sum is exact and the long cast loses nothing
        sum(col("l_quantity")).cast("long").as("sum_qty"))

  val q22Sql: String =
    """SELECT k, n_name, count(*) AS n_rows,
      |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
      |FROM (SELECT CASE WHEN l_orderkey % 10 < 5 THEN 0
      |             ELSE l_orderkey % 25 END AS k, l_quantity
      |      FROM lineitem)
      |JOIN (SELECT n_nationkey AS k, n_name FROM nation) USING (k)
      |GROUP BY k, n_name""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_salted_join" -> (q22 _),
  )

  val oracleSql: Map[String, String] = Map(
    "q22_salted_join" -> q22Sql,
  )
}
