package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data hygiene op: find
  * corpus documents that share enough character n-grams with any
  * document of a held-out benchmark set that they would leak evaluation
  * data into training. The standard reported form is n-gram overlap:
  * a (corpus_doc, benchmark_doc) pair is contaminated when they share
  * at least `minOverlap` distinct 8-gram hashes. The default 50 sits
  * past the shared-phrase noise knee measured on the fixture (overlap
  * >=10 flags half of all pairs; >=50 flags the actual near-dup tail).
  *
  * Scale shape (same skeleton as the LSH dedup family): shingles are
  * set-aggregated PER DOCUMENT first — map-side partial collect_set
  * compresses the shuffle — then re-exploded (distinct by
  * construction) and grouped once by shingle hash, where each hash
  * yields its benchmark-side and corpus-side doc lists. The
  * document-frequency prefilter (drop shingles occurring in more than
  * `maxShingleDocFreq` documents — boilerplate phrases, licenses,
  * headers) bounds that fanout at maxShingleDocFreq² pairs per hash,
  * which is what keeps the final pair aggregation skew-free at corpus
  * scale; it also removes exactly the n-grams that carry no
  * contamination signal. No join anywhere — three hash aggregations.
  */
object Decontaminate {

  /** Contaminated pairs: (doc_id, bench_id, overlap) with overlap =
    * count of shared distinct 8-gram hashes >= minOverlap. `corpus` and
    * `benchmark` are (doc_id, text) DataFrames; ids must be unique
    * across both inputs (document frequency is computed over the
    * union). */
  def overlapPairs(corpus: DataFrame, benchmark: DataFrame,
      minOverlap: Int = 50, maxShingleDocFreq: Int = 50): DataFrame = {
    val tagged = corpus
      .select(col("doc_id"), col("text"), lit(false).as("__bench"))
      .unionByName(benchmark
        .select(col("doc_id"), col("text"), lit(true).as("__bench")))
    import graft.functions.PortableHash.h60
    val sh = tagged
      .select(col("doc_id"), col("__bench"), lower(col("text")).as("t"))
      .selectExpr("doc_id", "__bench", "t",
        "explode(sequence(1, greatest(length(t)-7, 1))) AS i")
      .select(col("doc_id"), col("__bench"), h60(expr("substr(t, i, 8)")).as("hf"))
    // ONE wide shuffle: group raw shingle occurrences by hash with a
    // collect_set per role — the set gives per-document distinctness
    // and the map-side partial aggregation compresses repeat
    // occurrences before the exchange; collect_set also drops the
    // other role's nulls
    val perHash = sh.groupBy("hf").agg(
      collect_set(when(col("__bench"), col("doc_id"))).as("bs"),
      collect_set(when(!col("__bench"), col("doc_id"))).as("cs"))
      .filter(size(col("bs")) > 0 && size(col("cs")) > 0 &&
        size(col("bs")) + size(col("cs")) <= maxShingleDocFreq)
    perHash
      .select(explode(col("cs")).as("doc_id"), col("bs"))
      .select(col("doc_id"), explode(col("bs")).as("bench_id"))
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
  }

  // ---------------------------------------------------------------- x18
  /** Fixture split: every 20th doc_id plays the benchmark (5%, present
    * at every scale factor), the rest are the corpus — the fixture's
    * near-dup groups guarantee contamination straddles the split. */
  private def isBench = col("doc_id") % 20 === 0

  def x18(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    overlapPairs(docs.filter(!isBench), docs.filter(isBench))
  }

  val x18Sql: String =
    s"""WITH sh AS (SELECT DISTINCT doc_id, hf FROM (${Dedup.charShingleHashesSql})),
       |rare AS (SELECT hf FROM sh GROUP BY hf HAVING count(*) <= 50),
       |c AS (SELECT doc_id, hf FROM sh WHERE doc_id % 20 <> 0),
       |b AS (SELECT doc_id AS bench_id, hf FROM sh WHERE doc_id % 20 = 0)
       |SELECT c.doc_id, b.bench_id, count(*) AS overlap
       |FROM c JOIN rare USING (hf) JOIN b USING (hf)
       |GROUP BY 1, 2 HAVING count(*) >= 50""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x18_decontaminate" -> (x18 _),
  )

  val oracleSql: Map[String, String] = Map(
    "x18_decontaminate" -> x18Sql,
  )
}
