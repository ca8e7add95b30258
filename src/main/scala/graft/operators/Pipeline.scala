package graft.operators

import graft.Tables
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x13_clean_corpus" -> (x13 _),
  )

  val oracleSql: Map[String, String] = Map(
    "x13_clean_corpus" -> x13Sql,
  )
}
