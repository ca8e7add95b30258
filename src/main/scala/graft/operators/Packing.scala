package graft.operators

import graft.Tables
import graft.functions.PortableHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data preparation: assign documents to
  * fixed-token-budget bins ("which 2048-token pack does this doc start
  * in"), the sharding step every LLM training pipeline runs between
  * dedup/filtering and the trainer.
  *
  * The semantics need a GLOBAL running token total over a deterministic
  * document order — the naive Spark form is a window with no PARTITION
  * BY, which executes on ONE partition and is exactly the
  * single-reducer wall this engine must avoid at 100 TB. Instead this
  * is the classic two-pass distributed prefix sum:
  *
  *   1. order docs by (h, doc_id) where h = portable hash of doc_id
  *      (uniform, deterministic, engine-checkable); bucket = top bits
  *      of h, so bucket ranges ARE contiguous ranges of the global
  *      order;
  *   2. pass 1: per-bucket token sums (tiny: B rows) → exclusive
  *      running offsets via a window over those B rows only;
  *   3. pass 2: per-bucket windows (PARTITION BY bucket — all B run in
  *      parallel) compute local prefix sums; global = broadcast offset
  *      + local.
  *
  * Cost: one narrow scan, one B-row agg + broadcast, one hash exchange
  * on bucket. The only sequential region is the B-row offset window;
  * B is a parameter (gate uses 32) and scales with the cluster, so the
  * per-bucket sort handles |docs|/B rows — the textbook scale-out of a
  * prefix sum, not a single-reducer sort.
  *
  * A doc that straddles a budget boundary belongs to the bin it STARTS
  * in: bin = (prefix_before_doc) div budget.
  *
  * Relation to [[Sampling.shardAssign]] (x34): same packing semantics,
  * but x34's window is PARTITION BY source, so its parallelism is
  * bounded by the handful of sources — each source is one reducer.
  * This operator is the scale path: bucket count is a free parameter,
  * so the sequential region stays B rows no matter the corpus size.
  */
object Packing {

  private val GateBudget = 2048L
  private val GateBuckets = 32

  // ---------------------------------------------------------------- x51
  def x51(s: SparkSession, d: String): DataFrame =
    packByTokenBudget(Tables.documents(s, d), GateBudget, GateBuckets)

  /** Library entry over any (doc_id, text) DataFrame. Tokenization is
    * lowercase whitespace (the corpus-stats convention of TextOps).
    * Returns (doc_id, tok, bin). `buckets` must be ≤ 2^20 — top-bit
    * bucketing shifts by (60 - log2 buckets) and needs the shift to
    * stay inside the 60-bit hash. */
  def packByTokenBudget(docs: DataFrame, budget: Long, buckets: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(buckets > 0 && (buckets & (buckets - 1)) == 0 && buckets <= (1 << 20),
      "buckets must be a power of two in [1, 2^20]")
    val shift = 60 - java.lang.Integer.numberOfTrailingZeros(buckets)
    val t = docs.select(
      col("doc_id"),
      size(split(lower(col("text")), " ")).as("tok"),
      PortableHash.h60(col("doc_id").cast("string")).as("hv"))
      .withColumn("bucket", expr(s"shiftright(hv, $shift)"))
    // Pass 1: B-row bucket totals → exclusive offsets. The window here
    // runs over `buckets` rows total — the deliberate, bounded
    // sequential region of the prefix sum.
    val offsets = t.groupBy("bucket").agg(sum(col("tok")).as("btok"))
      .withColumn("offset", coalesce(
        sum(col("btok")).over(
          Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("bucket", "offset")
    // Pass 2: per-bucket local prefix sums, all buckets in parallel.
    val local = Window.partitionBy("bucket").orderBy("hv", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.withColumn("cum", sum(col("tok")).over(local))
      .join(broadcast(offsets), "bucket")
      .select(
        col("doc_id"),
        col("tok").cast("long").as("tok"),
        expr(s"((offset + cum) - tok) div $budget").as("bin"))
  }

  /** Oracle: the single global window DuckDB can afford at oracle scale
    * — same order key, same bin arithmetic. */
  val x51Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, len(string_split(lower(text), ' ')) AS tok,
       |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, tok,
       |    sum(tok) OVER (ORDER BY hv, doc_id
       |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gcum
       |  FROM t)
       |SELECT doc_id, CAST(tok AS BIGINT) AS tok,
       |  CAST((gcum - tok) // $GateBudget AS BIGINT) AS bin
       |FROM c""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x51_token_pack" -> (x51 _))

  val oracleSql: Map[String, String] = Map(
    "x51_token_pack" -> x51Sql)
}
