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

  /** Library entry over any (doc_id, text) DataFrame. */
  def cleanCorpus(docs: DataFrame, nearDupThresh: Double = 0.8): DataFrame = {
    val keepExact = docs
      .select(col("doc_id"), md5(lower(col("text")).cast("binary")).as("h"))
      .groupBy("h").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val nearDupLosers = Dedup.nearDupWordPairs(docs, nearDupThresh)
      .select(col("b").as("doc_id")).distinct()
    val retained = docs
      .join(keepExact, Seq("doc_id"), "left_semi")
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x13_clean_corpus" -> (x13 _),
    "x40_corpus_rebuild" -> (x40 _),
  )

  val oracleSql: Map[String, String] = Map(
    "x13_clean_corpus" -> x13Sql,
    "x40_corpus_rebuild" -> x40Sql,
  )
}
