package graft.operators

import graft.Tables
import graft.functions.PortableHash.{duckH60, h60}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the ingest-delta operator a pipeline runs
  * between corpus versions ("what changed since the last crawl?"):
  * classify every document as added / removed / changed / unchanged by
  * content hash. The scale-critical choice: hash FIRST, then join —
  * the full-outer join on the (uniform) doc key carries 16-byte rows,
  * never document text, so at 100 TB the diff costs one narrow
  * projection of each snapshot plus one fixed-width shuffle. (x27's
  * incremental-dedup gate covers the "admit the new batch" side; this
  * is the audit side — the report that drives re-embedding,
  * re-scoring, and downstream cache invalidation.)
  */
object Diff {

  /** Library entry: diff two (doc_id, text) snapshots by h60 content
    * hash. Returns (doc_id, status) for the UNION of both key sets,
    * status ∈ added | removed | changed | unchanged (relative to `a`
    * as the old version). */
  def corpusDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val ha = a.filter(col("text").isNotNull)
      .select(col("doc_id"), h60(col("text")).as("hash_a"))
    val hb = b.filter(col("text").isNotNull)
      .select(col("doc_id"), h60(col("text")).as("hash_b"))
    ha.join(hb, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("hash_a").isNull, "added")
          .when(col("hash_b").isNull, "removed")
          .when(col("hash_a") === col("hash_b"), "unchanged")
          .otherwise("changed").as("status"))
  }

  // ---------------------------------------------------------------- x69
  /** x69 — diff the fixture corpus against a deterministically-derived
    * "next crawl" (the x27 simulate-the-new-batch convention): docs
    * with id % 7 = 0 dropped (removals), id % 5 = 0 edited (changes),
    * and id % 11 = 0 re-ingested under id+offset (additions). The
    * rules overlap on purpose — doc 0 matches all three, so the gate
    * pins the precedence (a dropped doc is `removed` even if the edit
    * rule also matched it).
    *
    * The addition offset is max(doc_id)+1, derived from the corpus
    * itself: a fixed literal (the previous 1e6) silently collides with
    * real ids once a fixture crosses that size — and the 100× rehearsal
    * corpus is within an order of magnitude of it. ONE aggregated row
    * attached by broadcast cross join (the x36/x45 sanctioned idiom). */
  /** The simulated "next crawl" (shared by x69 and its streaming twin
    * s19): drops, edits, and re-ingests per the rules above. */
  private[operators] def nextCrawl(docs: DataFrame): DataFrame = {
    val off = docs.agg((max(col("doc_id")) + 1L).as("off"))
    docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" edited")))
          .otherwise(col("text")).as("text"))
      .unionByName(docs.filter(col("doc_id") % 11 === 0)
        .crossJoin(broadcast(off))
        .select((col("doc_id") + col("off")).as("doc_id"), col("text")))
  }

  def x69(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    corpusDiff(docs, nextCrawl(docs))
  }

  /** DuckDB twin of [[nextCrawl]] as a CTE body yielding (doc_id,
    * text) — shared by x69 and the streaming re-arrival gate (s24). */
  private[operators] val nextCrawlSqlBody: String =
    """SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN text || ' edited' ELSE text END AS text
      |  FROM documents WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents) AS doc_id, text
      |  FROM documents WHERE doc_id % 11 = 0""".stripMargin

  val x69Sql: String =
    s"""WITH a AS (
       |  SELECT doc_id, ${duckH60("text")} AS h
       |  FROM documents WHERE text IS NOT NULL),
       |bn AS (
       |  $nextCrawlSqlBody),
       |b AS (
       |  SELECT doc_id, ${duckH60("text")} AS h
       |  FROM bn WHERE text IS NOT NULL)
       |SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
       |  CASE WHEN a.h IS NULL THEN 'added'
       |       WHEN b.h IS NULL THEN 'removed'
       |       WHEN a.h = b.h THEN 'unchanged'
       |       ELSE 'changed' END AS status
       |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x69_corpus_diff" -> (x69 _))

  val oracleSql: Map[String, String] = Map(
    "x69_corpus_diff" -> x69Sql)
}
