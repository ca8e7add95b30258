package graft.operators

import graft.Tables
import graft.functions.PortableHash.{duckH60, h60}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composite corpus-preparation pipeline — the end-to-end shape an LLM
  * training-data job actually runs, composed from the per-stage
  * operators and oracle-checked as one query (x13).
  *
  * Stages, in order:
  *  1. exact dedup, keep-first: a document survives iff its doc_id is
  *     the minimum of its md5(lower(text)) group (A11 OR-IGNORE policy
  *     applied corpus-wide);
  *  2. near-dup removal, keep-first: drop every doc that appears as the
  *     LARGER id of a verified MinHash near-dup pair (Dedup.x02
  *     semantics, word 3-gram Jaccard >= 0.8);
  *  3. annotate survivors with language id (x08), quality score (x09)
  *     and whitespace token count (x10).
  *
  * Scale: stage 1 is one hash aggregation; stage 2 is the banded LSH
  * join (never all-pairs); stage 3 is narrow per-row expressions. The
  * anti-joins are on doc_id (uniform key). Nothing here collects.
  */
object Pipeline {

  /** Stages 1–2 (exact + near-dup keep-first) as a reusable survivor
    * set, all original columns intact. */
  private[operators] def retainedDocs(docs: DataFrame,
      nearDupThresh: Double = 0.8): DataFrame = {
    val keepExact = docs
      .select(col("doc_id"), md5(lower(col("text")).cast("binary")).as("h"))
      .groupBy("h").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val nearDupLosers = Dedup.nearDupWordPairs(docs, nearDupThresh)
      .select(col("b").as("doc_id")).distinct()
    docs
      .join(keepExact, Seq("doc_id"), "left_semi")
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
  }

  /** Library entry over any (doc_id, text) DataFrame. */
  def cleanCorpus(docs: DataFrame, nearDupThresh: Double = 0.8): DataFrame = {
    val retained = retainedDocs(docs, nearDupThresh)
    TextOps.languageId(retained).select("doc_id", "pred_lang")
      .join(TextOps.qualityScore(retained).select("doc_id", "score_u"), "doc_id")
      .join(TextOps.tokenCounts(retained).select("doc_id", "ws_tokens"), "doc_id")
  }

  def x13(s: SparkSession, d: String): DataFrame =
    cleanCorpus(Tables.documents(s, d))

  val x13Sql: String =
    s"""WITH pairs AS (
       |${Dedup.x02Sql}
       |),
       |keep AS (SELECT min(doc_id) AS doc_id
       |  FROM (SELECT doc_id, md5(lower(text)) AS h FROM documents) GROUP BY h),
       |retained AS (SELECT doc_id, text FROM documents
       |  WHERE doc_id IN (SELECT doc_id FROM keep)
       |    AND doc_id NOT IN (SELECT b FROM pairs)),
       |lang AS (
       |${TextOps.x08SqlOn("retained")}
       |),
       |qual AS (
       |${TextOps.x09SqlOn("retained")}
       |),
       |tok AS (
       |${TextOps.x10SqlOn("retained")}
       |)
       |SELECT l.doc_id, l.pred_lang, q.score_u, t.ws_tokens
       |FROM lang l JOIN qual q USING (doc_id) JOIN tok t USING (doc_id)""".stripMargin

  // ---------------------------------------------------------------- x40
  /** Rebuild pipeline: line-level dedup ([[Dedup.lineDedup]], x39)
    * feeding training-shard packing (the x34 shape) — the cleaned,
    * reassembled corpus is re-tokenized and greedily packed into
    * fixed-capacity shards per source. What this gates beyond its
    * stages is the COMPOSITION: the dedup stage's rebuilt text (not
    * the original) must drive every downstream token count, so a
    * column/type drift between stages fails the hash, not just a
    * review. Scale: x39's two shuffles + the join back to `source` on
    * uniform doc_id + one cumulative-sum shuffle. */
  def rebuildShards(docs: DataFrame, chunkWords: Int = 20,
      capacity: Long = 1500L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cleaned = Dedup.lineDedup(docs, chunkWords)
      .select(col("doc_id"), col("text"))
    val w = Window.partitionBy("source").orderBy(col("hk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cleaned.join(docs.select("doc_id", "source"), "doc_id")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("toks"),
        h60(concat(lit("rebuild_"), col("doc_id").cast("string"))).as("hk"))
      .withColumn("cum_toks", sum(col("toks")).over(w))
      .select(col("doc_id"), col("source"), col("toks"),
        expr(s"(cum_toks - toks) div $capacity").as("shard_id"))
  }

  def x40(s: SparkSession, d: String): DataFrame =
    rebuildShards(Tables.documents(s, d))

  val x40Sql: String =
    s"""WITH clean AS (
       |${Dedup.x39Sql}
       |),
       |j AS (SELECT c.doc_id, d.source,
       |    CAST(len(string_split(c.text, ' ')) AS BIGINT) AS toks,
       |    ${duckH60("concat('rebuild_', CAST(c.doc_id AS VARCHAR))")} AS hk
       |  FROM clean c JOIN documents d USING (doc_id)),
       |c2 AS (SELECT doc_id, source, toks,
       |  CAST(sum(toks) OVER (PARTITION BY source ORDER BY hk, doc_id
       |                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_toks
       |  FROM j)
       |SELECT doc_id, source, toks,
       |  CAST((cum_toks - toks) // 1500 AS BIGINT) AS shard_id
       |FROM c2""".stripMargin

  // ---------------------------------------------------------------- x57
  /** The FULL training-data assembly chain as one gated query — the
    * end-to-end job a training run launches, each stage the library
    * operator, composed so every cross-stage contract is inside the
    * hash: clean (exact + near-dup keep-first, x13 stages 1–2) →
    * sqrt-temperature mixture sample over the CLEANED corpus (the
    * rates must derive from post-dedup token masses, x53) → overlapping
    * chunking of the SAMPLED docs (x54) → token-budget packing of the
    * CHUNKS via the distributed prefix sum (x51's core over chunk
    * rows). What this gates beyond its stages is the composition:
    * sampling rates computed on the wrong corpus, chunks cut from
    * unsampled docs, or packing keyed on the wrong identity all break
    * the row hash, not just a review.
    *
    * Scale: the chain inherits each stage's posture — banded LSH join,
    * tiny-stats broadcast, narrow chunk fan, B-row prefix-sum — and
    * adds only doc_id semi-joins between stages. */
  def assembleTrainingSet(docs: DataFrame, frac: Double = 0.5,
      chunkTokens: Int = 16, overlap: Int = 4,
      budget: Long = 64L, buckets: Int = 32): DataFrame = {
    val retained = retainedDocs(docs)
    val sampled = retained.join(
      Sampling.mixtureSample(retained, frac).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val chunks = Packing.chunkDocuments(sampled, chunkTokens, overlap)
    Packing.assignBins(
      chunks.select(col("doc_id"), col("chunk_idx"),
        col("n_tokens").cast("long").as("tok"),
        h60(concat(lit("pack_"), col("doc_id").cast("string"),
          lit("_"), col("chunk_idx").cast("string"))).as("hv")),
      budget, buckets, tieCols = Seq("doc_id", "chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        col("tok").cast("int").as("n_tokens"), col("bin"))
  }

  def x57(s: SparkSession, d: String): DataFrame =
    assembleTrainingSet(Tables.documents(s, d))

  val x57Sql: String =
    s"""WITH pairs AS (
       |${Dedup.x02Sql}
       |),
       |keep AS (SELECT min(doc_id) AS doc_id
       |  FROM (SELECT doc_id, md5(lower(text)) AS h FROM documents) GROUP BY h),
       |retained AS (SELECT * FROM documents
       |  WHERE doc_id IN (SELECT doc_id FROM keep)
       |    AND doc_id NOT IN (SELECT b FROM pairs)),
       |t AS (SELECT doc_id, source,
       |  CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS toks
       |  FROM retained WHERE text IS NOT NULL),
       |ps AS (SELECT source, CAST(sum(toks) AS BIGINT) AS tok_s,
       |  CAST(floor(sqrt(CAST(sum(toks) AS DOUBLE)) * 1000000.0) AS BIGINT) AS w_s
       |  FROM t GROUP BY source),
       |tot AS (SELECT CAST(sum(tok_s) AS BIGINT) AS T,
       |  CAST(sum(w_s) AS BIGINT) AS W FROM ps),
       |r AS (SELECT source,
       |  least(1.0, (0.5 * (CAST(T AS DOUBLE) * CAST(w_s AS DOUBLE)))
       |        / (CAST(W AS DOUBLE) * CAST(tok_s AS DOUBLE))) AS rate
       |  FROM ps CROSS JOIN tot),
       |samp AS (SELECT t.doc_id FROM t JOIN r ON t.source = r.source
       |  WHERE ${duckH60("concat('mix_', CAST(t.doc_id AS VARCHAR))")} % 1048576
       |        < CAST(floor(rate * 1048576.0) AS BIGINT)),
       |ws AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM retained
       |  WHERE doc_id IN (SELECT doc_id FROM samp) AND text IS NOT NULL),
       |n AS (SELECT doc_id, w,
       |  greatest(CAST(ceil((len(w) - 4) / 12.0) AS INT), 1) AS nc FROM ws),
       |c AS (SELECT doc_id, unnest(range(0, nc)) AS ci, w FROM n),
       |ch AS (SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
       |  CAST(len(w[ci * 12 + 1 : ci * 12 + 16]) AS BIGINT) AS tok FROM c),
       |h AS (SELECT doc_id, chunk_idx, tok,
       |  ${duckH60("concat('pack_', CAST(doc_id AS VARCHAR), '_', CAST(chunk_idx AS VARCHAR))")} AS hv
       |  FROM ch),
       |g AS (SELECT doc_id, chunk_idx, tok,
       |  sum(tok) OVER (ORDER BY hv, doc_id, chunk_idx
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gcum
       |  FROM h)
       |SELECT doc_id, chunk_idx, CAST(tok AS INT) AS n_tokens,
       |  CAST((gcum - tok) // 64 AS BIGINT) AS bin
       |FROM g""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x13_clean_corpus" -> (x13 _),
    "x40_corpus_rebuild" -> (x40 _),
    "x57_training_assembly" -> (x57 _),
  )

  val oracleSql: Map[String, String] = Map(
    "x13_clean_corpus" -> x13Sql,
    "x40_corpus_rebuild" -> x40Sql,
    "x57_training_assembly" -> x57Sql,
  )
}
