package graft.operators

import graft.Tables
import graft.functions.ArrayMath
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval — reciprocal-rank fusion (RRF, Cormack et al.
  * SIGIR'09) of a lexical BM25 list and a semantic cosine list, the
  * standard first-stage retrieval shape of a RAG pipeline: each
  * retriever contributes 1/(K + rank) for the items on its top-k list,
  * fused scores rank the union.
  *
  * Scale shape: each leg is the already-proven linear pass — the BM25
  * projection (x49: one codegen'd tokenize+count pass, 1-row stats
  * broadcast) and the one-query cosine scan (x06's corpus-streams /
  * query-broadcasts layout) — each ending in TakeOrderedAndProject
  * (per-partition heaps, k rows to the driver). The fusion itself then
  * touches only 2·k rows: ranks are positions WITHIN the k-row lists,
  * never a global window over the corpus, so the rank windows and the
  * fused groupBy run on driver-sized relations no matter the corpus
  * size. At 100 TB the cost is two corpus scans; nothing downstream
  * grows with the data.
  *
  * Fixture convention the gate pins: `documents.doc_id` and
  * `embeddings.vec_id` name the same corpus item where both exist, so
  * the fused id space is their union (an item on one list only gets
  * that list's contribution — standard RRF, no inner join that would
  * silently drop lexical-only hits).
  *
  * Float determinism: contributions are 1.0 / (K + r) from integer
  * ranks, summed over at most two elements (IEEE addition of two
  * doubles is commutative, so aggregation order cannot matter), and
  * reported as floor(sum * 1e12) — the same floor-micro-units contract
  * as x49/x06 (see TextOps x09 for why floor, not round).
  */
object Hybrid {

  /** Depth of each retriever's candidate list. */
  private val KPer = 100
  /** Standard RRF constant (SIGIR'09 uses 60). */
  private val RrfK = 60
  /** Fused results returned. */
  private val FinalK = 20
  /** The semantic query: vec 0's embedding (excluded from candidates). */
  private val QueryVecId = 0L

  /** Library entry: RRF fusion of BM25(terms) and cosine(queryVecId)
    * over any (doc_id, text) / (vec_id, embedding) pair of relations.
    * Returns (id, rrf_pico, n_lists) — n_lists ∈ {1, 2} says whether
    * both retrievers surfaced the item. */
  def rrfHybrid(docs: DataFrame, emb: DataFrame, terms: Seq[String],
      queryVecId: Long, kPer: Int = KPer, rrfK: Int = RrfK,
      k: Int = FinalK): DataFrame = {
    // ---- lexical leg: BM25 top-kPer (x49's exact scoring contract).
    // The query item is excluded from BOTH candidate lists (it would
    // trivially self-retrieve on each); its text still counts toward
    // the BM25 corpus stats, exactly as its vector still defines the
    // semantic query.
    val lex = Retrieval.bm25TopK(docs, terms, kPer, Some(queryVecId))
      .select(col("doc_id").as("id"), col("score_micro").as("s"))
    // ---- semantic leg: one-query cosine top-kPer (x06's layout: the
    // corpus streams, the 1-row query broadcasts)
    val e = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", ArrayMath.l2norm(col("v")))
    val q = e.filter(col("vec_id") === queryVecId)
      .select(col("v").as("vq"), col("nrm").as("nq"))
    val sem = e.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("id"),
        floor(ArrayMath.dot(col("vq"), col("v")) / (col("nq") * col("nrm"))
          * 1000000).cast("long").as("s"))
      .orderBy(col("s").desc, col("id"))
      .limit(kPer)
    // ---- fuse: rank = position within each k-row list. The
    // single-partition rank window is driver-sized BY CONSTRUCTION
    // (its input is a limit(kPer) result), not a scale hazard.
    def ranked(list: DataFrame): DataFrame = list
      .withColumn("r",
        row_number().over(Window.orderBy(col("s").desc, col("id"))))
      .select(col("id"),
        expr(s"1.0 / CAST($rrfK + r AS DOUBLE)").as("contrib"))
    ranked(lex).unionByName(ranked(sem))
      .groupBy("id")
      .agg(
        expr("CAST(floor(sum(contrib) * 1000000000000.0) AS BIGINT)")
          .as("rrf_pico"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_pico").desc, col("id"))
      .limit(k)
  }

  // ---------------------------------------------------------------- x63
  def x63(s: SparkSession, d: String): DataFrame =
    rrfHybrid(Tables.documents(s, d), Tables.embeddings(s, d),
      Retrieval.gateTerms, QueryVecId)

  val x63Sql: String = {
    val terms = Retrieval.gateTerms
    s"""WITH ${Retrieval.bm25SqlCtes(terms)},
       |lexall AS (
       |  SELECT doc_id AS id,
       |    CAST(floor(${Retrieval.bm25ScoreSql(terms.size)} * 1000000.0) AS BIGINT) AS s
       |  FROM t CROSS JOIN st WHERE doc_id <> $QueryVecId),
       |lex AS (
       |  SELECT id, row_number() OVER (ORDER BY s DESC, id) AS r FROM lexall
       |  QUALIFY r <= $KPer),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
       |q AS (SELECT v, nrm FROM n WHERE vec_id = $QueryVecId),
       |semall AS (
       |  SELECT e.vec_id AS id,
       |    CAST(floor(list_sum(list_transform(range(1, 65), i -> q.v[i] * e.v[i])) / (q.nrm * e.nrm) * 1000000) AS BIGINT) AS s
       |  FROM n e CROSS JOIN q WHERE e.vec_id <> $QueryVecId),
       |sem AS (
       |  SELECT id, row_number() OVER (ORDER BY s DESC, id) AS r FROM semall
       |  QUALIFY r <= $KPer),
       |u AS (
       |  SELECT id, 1.0 / CAST($RrfK + r AS DOUBLE) AS contrib FROM lex
       |  UNION ALL
       |  SELECT id, 1.0 / CAST($RrfK + r AS DOUBLE) AS contrib FROM sem)
       |SELECT id,
       |  CAST(floor(sum(contrib) * 1000000000000.0) AS BIGINT) AS rrf_pico,
       |  CAST(count(*) AS BIGINT) AS n_lists
       |FROM u GROUP BY id
       |ORDER BY rrf_pico DESC, id
       |LIMIT $FinalK""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x63_hybrid_rrf" -> (x63 _))

  val oracleSql: Map[String, String] = Map(
    "x63_hybrid_rrf" -> x63Sql)
}
