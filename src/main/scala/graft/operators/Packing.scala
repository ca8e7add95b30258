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
  def packByTokenBudget(docs: DataFrame, budget: Long, buckets: Int): DataFrame =
    assignBins(
      // a NULL text would contribute tok = size(split(NULL)) = -1 and
      // silently shift every later bin boundary — drop token-less docs,
      // like chunkDocuments (the oracle filters identically)
      docs.filter(col("text").isNotNull).select(
        col("doc_id"),
        size(split(lower(col("text")), " ")).cast("long").as("tok"),
        PortableHash.h60(col("doc_id").cast("string")).as("hv")),
      budget, buckets, tieCols = Seq("doc_id"))
      .select("doc_id", "tok", "bin")

  /** The two-pass prefix-sum core, over ARBITRARY rows: `t` must carry
    * `tok` (long token count) and `hv` (uniform 60-bit portable hash —
    * the global order AND bucket key), plus `tieCols` for a total
    * order under hash collisions. Appends `bin` = (global prefix sum
    * before the row) div budget. Shared by [[packByTokenBudget]] (doc
    * rows) and [[Pipeline.assembleTrainingSet]] (chunk rows). */
  private[operators] def assignBins(t0: DataFrame, budget: Long,
      buckets: Int, tieCols: Seq[String]): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(buckets > 0 && (buckets & (buckets - 1)) == 0 && buckets <= (1 << 20),
      "buckets must be a power of two in [1, 2^20]")
    val shift = 60 - java.lang.Integer.numberOfTrailingZeros(buckets)
    val t = t0.withColumn("bucket", expr(s"shiftright(hv, $shift)"))
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
    val local = Window.partitionBy("bucket")
      .orderBy(col("hv") +: tieCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.withColumn("cum", sum(col("tok")).over(local))
      .join(broadcast(offsets), "bucket")
      .withColumn("bin", expr(s"((offset + cum) - tok) div $budget"))
      .drop("bucket", "cum", "offset")
  }

  /** Oracle: the single global window DuckDB can afford at oracle scale
    * — same order key, same bin arithmetic. */
  val x51Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, len(string_split(lower(text), ' ')) AS tok,
       |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
       |  FROM documents WHERE text IS NOT NULL),
       |c AS (
       |  SELECT doc_id, tok,
       |    sum(tok) OVER (ORDER BY hv, doc_id
       |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gcum
       |  FROM t)
       |SELECT doc_id, CAST(tok AS BIGINT) AS tok,
       |  CAST((gcum - tok) // $GateBudget AS BIGINT) AS bin
       |FROM c""".stripMargin

  // ---------------------------------------------------------------- x54
  /** Overlapping token-window document chunking — the segmentation step
    * of RAG/context preparation: fixed-size windows with a fixed
    * overlap, a stable (doc_id, chunk_idx) identity, and a portable
    * fingerprint per chunk (the input to chunk-level dedup, which is
    * x01's groupBy over `fp`).
    *
    * Chunk count for a doc of L tokens is max(1, ceil((L−overlap)/step))
    * with step = chunk − overlap: every token is covered, consecutive
    * chunks share `overlap` tokens, and a short doc is one chunk.
    *
    * Scale shape: one narrow pass — sequence+explode fans each doc into
    * its own chunks WITHIN the partition (no shuffle anywhere), and the
    * output is ≈ L/step rows per doc. The slice/fingerprint work is
    * per-row expression code. At 100 TB this pipelines with the scan.
    *
    * The gate uses (chunk=16, overlap=4) so fixture docs (~30 tokens)
    * actually produce multi-chunk fans; the library default is the
    * common 128/32. */
  def x54(s: SparkSession, d: String): DataFrame =
    chunkDocuments(Tables.documents(s, d), chunkTokens = 16, overlap = 4)

  /** Library entry over any (doc_id, text) DataFrame. Returns
    * (doc_id, chunk_idx, n_tokens, fp). */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int = 128,
      overlap: Int = 32): DataFrame = {
    require(chunkTokens > overlap && overlap >= 0,
      s"need chunkTokens > overlap >= 0, got ($chunkTokens, $overlap)")
    val step = chunkTokens - overlap
    // a NULL text would emit one bogus chunk (size(null) = -1 →
    // n_tokens = -1, fp = hash of ""); the oracle's greatest() IGNORES
    // NULLs (Postgres semantics, nc = 1 → its own bogus chunk) — so
    // BOTH sides drop token-less docs explicitly (the SQL filters too)
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
      .withColumn("nc", expr(
        s"greatest(cast(ceil((size(w) - $overlap) / $step.0) as int), 1)"))
      .select(col("doc_id"), col("w"),
        expr("explode(sequence(0, nc - 1))").as("chunk_idx"))
      .select(
        col("doc_id"),
        col("chunk_idx"),
        expr(s"cast(size(slice(w, chunk_idx * $step + 1, $chunkTokens)) as int)")
          .as("n_tokens"),
        PortableHash.h60(expr(
          s"concat_ws(' ', slice(w, chunk_idx * $step + 1, $chunkTokens))"))
          .as("fp"))
  }

  val x54Sql: String =
    s"""WITH ws AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
       |  WHERE text IS NOT NULL),
       |n AS (
       |  SELECT doc_id, w,
       |    greatest(CAST(ceil((len(w) - 4) / 12.0) AS INT), 1) AS nc
       |  FROM ws),
       |c AS (SELECT doc_id, unnest(range(0, nc)) AS ci, w FROM n)
       |SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
       |  CAST(len(w[ci * 12 + 1 : ci * 12 + 16]) AS INT) AS n_tokens,
       |  ${PortableHash.duckH60("array_to_string(w[ci * 12 + 1 : ci * 12 + 16], ' ')")} AS fp
       |FROM c""".stripMargin

  // ---------------------------------------------------------------- x58
  /** Chunk-level duplicate report — the consumer of x54's fingerprint
    * column: boilerplate shared ACROSS documents shows up as a chunk
    * fingerprint with multiple owners even when no whole document is a
    * duplicate (headers, disclaimers, templated spans — the
    * sub-document redundancy doc-level dedup cannot see). Emits only
    * duplicated fingerprints: copies, distinct owning docs, and the
    * keep-first representative.
    *
    * Scale shape: the narrow chunk fan followed by ONE hash aggregation
    * on fp (partial map-side — each partition reduces its chunk stream
    * to per-fp partials before the exchange). The distinct-doc count
    * rides the same groupBy. */
  def x58(s: SparkSession, d: String): DataFrame =
    chunkDupStats(Tables.documents(s, d), chunkTokens = 16, overlap = 4)

  /** Library entry over any (doc_id, text) DataFrame. */
  def chunkDupStats(docs: DataFrame, chunkTokens: Int = 128,
      overlap: Int = 32): DataFrame =
    chunkDocuments(docs, chunkTokens, overlap)
      .groupBy("fp")
      .agg(
        count(lit(1)).as("n_copies"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_copies") >= 2)

  val x58Sql: String =
    s"""WITH ws AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
       |  WHERE text IS NOT NULL),
       |n AS (
       |  SELECT doc_id, w,
       |    greatest(CAST(ceil((len(w) - 4) / 12.0) AS INT), 1) AS nc
       |  FROM ws),
       |c AS (SELECT doc_id, unnest(range(0, nc)) AS ci, w FROM n),
       |ch AS (SELECT doc_id,
       |  ${PortableHash.duckH60("array_to_string(w[ci * 12 + 1 : ci * 12 + 16], ' ')")} AS fp
       |  FROM c)
       |SELECT fp, count(*) AS n_copies,
       |  count(DISTINCT doc_id) AS n_docs,
       |  CAST(min(doc_id) AS BIGINT) AS first_doc
       |FROM ch GROUP BY fp HAVING count(*) >= 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x51_token_pack" -> (x51 _),
    "x54_doc_chunks" -> (x54 _),
    "x58_chunk_dups" -> (x58 _))

  val oracleSql: Map[String, String] = Map(
    "x51_token_pack" -> x51Sql,
    "x54_doc_chunks" -> x54Sql,
    "x58_chunk_dups" -> x58Sql)
}
