package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delta-style MERGE (upsert) as a pure relational transform — the
  * batch analogue of the reference's read-modify-write store updates
  * (SURVEY §2 A11-A13 family: the reference's sqlite upsert loop in
  * banking-streamprocessing-demos' producer persistence), re-expressed
  * as ONE full-outer shuffle join instead of per-row point writes.
  *
  * Semantics (MERGE INTO target USING source ON key):
  *   - matched        -> apply `whenMatched` column rewrites
  *   - not matched    -> insert the source row via `whenNotMatched`
  *   - target-only    -> carried through unchanged
  *
  * Scale posture: one equi-join shuffle on the merge key; AQE handles
  * skew, and a small source side becomes a broadcast join under the
  * threshold, making the merge a map-only pass over the target. The
  * output is a full new relation snapshot — at 100 TB this pairs with
  * partition-overwrite (dynamic partitionOverwriteMode) so only
  * partitions containing touched keys rewrite; a transactional table
  * format would take the same join plan as its rewrite stage.
  */
object Merge {

  /** Generic merge. `whenMatched`/`insertValues` map output column name
    * to its value expression; columns not mentioned keep the target's
    * value (matched/target-only) or stay null on inserts.
    *
    * @param target       keyed relation (unique on `targetKey`)
    * @param source       updates relation (unique on `sourceKey`)
    * @param targetKey    merge key column in `target`
    * @param sourceKey    merge key column in `source`
    * @param whenMatched  rewrites applied where both sides matched;
    *                     expressions see `t.`-/`s.`-qualified columns
    * @param insertValues values for source-only rows, per target column
    */
  def merge(target: DataFrame, source: DataFrame,
      targetKey: String, sourceKey: String,
      whenMatched: Map[String, Column],
      insertValues: Map[String, Column]): DataFrame = {
    val t = target.alias("t")
    val s = source.alias("s")
    val joined = t.join(s, col(s"t.$targetKey") === col(s"s.$sourceKey"),
      "full_outer")
    val matched = col(s"t.$targetKey").isNotNull &&
      col(s"s.$sourceKey").isNotNull
    val insertOnly = col(s"t.$targetKey").isNull
    val outCols = target.columns.map { c =>
      val base = col(s"t.$c")
      val up = whenMatched.get(c).map(u => when(matched, u).otherwise(base))
        .getOrElse(base)
      val ins = insertValues.get(c)
        .map(iv => when(insertOnly, iv).otherwise(up))
        .getOrElse(up)
      ins.as(c)
    }
    joined.select(outCols.toIndexedSeq: _*)
  }

  // ---------------------------------------------------------------- x23
  /** Upsert order-volume deltas into customer balances: customers with
    * orders get their balance bumped by their order total; customers
    * without orders pass through; a deterministic slice of order keys
    * (o_custkey % 100 == 7) plays the "new account" insert branch,
    * mapped to the NEGATIVE key space (-k-1) — disjoint from real
    * customer keys at EVERY scale factor, unlike an additive offset
    * which collides once custkey cardinality passes it. Balances are
    * sums of 2-decimal money values, so round(,2) recovers the exact
    * decimal identically in both engines (the portable idiom used by
    * Q12). */
  def x23(sp: SparkSession, d: String): DataFrame = {
    val cust = Tables(sp, d, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
    val deltas = Tables(sp, d, "orders")
      .groupBy(col("o_custkey")).agg(
        sum(col("o_totalprice")).as("delta"),
        count(lit(1)).as("n_orders"))
    // source: updates on real keys + inserts on shifted synthetic keys
    val src = deltas
      .select(
        when(col("o_custkey") % 100 === 7,
          -col("o_custkey") - lit(1L)).otherwise(col("o_custkey"))
          .as("k"),
        col("delta"), col("n_orders"))
    val merged = merge(
      cust, src, "c_custkey", "k",
      whenMatched = Map(
        "c_acctbal" -> (col("t.c_acctbal") + col("s.delta"))),
      insertValues = Map(
        "c_custkey" -> col("s.k"),
        "c_name" -> concat(lit("NEW ACCOUNT "), col("s.k").cast("string")),
        "c_nationkey" -> lit(-1),
        "c_acctbal" -> col("s.delta"),
        "c_mktsegment" -> lit("NEW")))
    merged.select(col("c_custkey"), col("c_name"), col("c_nationkey"),
      round(col("c_acctbal"), 2).as("bal"),
      col("c_mktsegment"))
  }

  val x23Sql: String =
    """WITH d AS (
      |  SELECT o_custkey, sum(o_totalprice) AS delta, count(*) AS n_orders
      |  FROM orders GROUP BY o_custkey),
      |src AS (
      |  SELECT CASE WHEN o_custkey % 100 = 7 THEN -o_custkey - 1
      |              ELSE o_custkey END AS k, delta, n_orders FROM d)
      |SELECT
      |  coalesce(c.c_custkey, s.k) AS c_custkey,
      |  coalesce(c.c_name, 'NEW ACCOUNT ' || CAST(s.k AS VARCHAR)) AS c_name,
      |  coalesce(c.c_nationkey, -1) AS c_nationkey,
      |  round(CASE
      |     WHEN c.c_custkey IS NOT NULL AND s.k IS NOT NULL
      |       THEN c.c_acctbal + s.delta
      |     WHEN c.c_custkey IS NULL THEN s.delta
      |     ELSE c.c_acctbal END, 2) AS bal,
      |  coalesce(c.c_mktsegment, 'NEW') AS c_mktsegment
      |FROM customer c FULL OUTER JOIN src s ON c.c_custkey = s.k""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x23_merge_upsert" -> (x23 _),
  )

  val oracleSql: Map[String, String] = Map(
    "x23_merge_upsert" -> x23Sql,
  )
}
