package graft.operators

import graft.Tables
import graft.functions.BottomK
import graft.functions.PortableHash.{duckH60, h60}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-based cross-source SET similarity — pairwise vocabulary
  * Jaccard between corpus sources estimated from bottom-k (KMV)
  * sketches (Bar-Yossef et al. RANDOM'02; Beyer et al. SIGMOD'07),
  * the question a curation pipeline asks before mixing sources
  * ("how much does src A's vocabulary overlap src B's?") at a cost
  * that never materializes a vocabulary join.
  *
  * HLL (x50/x60) answers per-set cardinality and UNIONS but cannot
  * intersect; the bottom-k sample (x59/x62) is exactly the sketch
  * that CAN: with h a uniform portable hash over the universe, the k
  * smallest distinct hashes of A∪B are a uniform k-sample of A∪B, so
  *
  *   Ĵ(A,B) = |bottomk(A∪B) ∩ bottomk(A) ∩ bottomk(B)| / |bottomk(A∪B)|
  *
  * is the standard KMV Jaccard estimator — and because bottomk is a
  * SELECTION under a deterministic total order (not a random draw),
  * the estimate is bit-identical across engines, partitionings and
  * retries, and the sketch union bottomk(A)∪bottomk(B) ⊇
  * bottomk(A∪B) makes it computable from STORED per-source sketches
  * alone (the x60/x62 rollup pattern: no raw-data rescan to compare a
  * new source pair).
  *
  * Scale shape: one corpus pass (explode + map-side-combined distinct
  * on (source, h)), one bounded aggregation to |sources| rows of
  * 16·k-byte state, then an all-pairs comparison of the |sources|-row
  * sketch TABLE — driver-sized by construction (the sanctioned
  * nested-loop: both sides are the k-row sketch relation, the x06
  * broadcast idiom). At 100 TB the corpus pass dominates and nothing
  * downstream grows with the data; with S sources the pair stage is
  * S²·k long-comparisons on one executor.
  */
object SketchSim {

  /** Sketch size: small enough that the fixture's vocabulary (~31
    * words global) genuinely TRUNCATES — the estimator runs as an
    * estimator, not a degenerate exact compare. */
  private val K = 16

  /** Library entry: pairwise KMV vocabulary Jaccard over any
    * (source, text) relation. Returns one row per unordered source
    * pair: (src_a, src_b, inter_k, jacc_micro). */
  def sourceJaccard(docs: DataFrame, k: Int = K): DataFrame = {
    val tok = docs.filter(col("text").isNotNull)
      .select(col("source"), explode(split(lower(col("text")), " ")).as("w"))
    // distinct BEFORE the sketch: KMV is defined over the SET of
    // hashes; the groupBy dedup is map-side-combinable and bounded by
    // |sources| × |vocab|, not the corpus
    val hs = tok.select(col("source"), h60(col("w")).as("h")).distinct()
    val sk = hs.groupBy("source")
      .agg(BottomK.sample(col("h"), col("h"), k).as("sk"))
    val a = sk.select(col("source").as("src_a"), col("sk").as("ska"))
    val b = sk.select(col("source").as("src_b"), col("sk").as("skb"))
    a.join(b, col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        slice(array_sort(array_union(col("ska"), col("skb"))), 1, k).as("u"),
        array_intersect(col("ska"), col("skb")).as("both"))
      .select(col("src_a"), col("src_b"),
        size(array_intersect(col("u"), col("both"))).cast("long").as("inter_k"),
        floor(lit(1000000.0)
          * size(array_intersect(col("u"), col("both")))
          / size(col("u"))).cast("long").as("jacc_micro"))
      .orderBy(col("src_a"), col("src_b"))
  }

  // ---------------------------------------------------------------- x65
  def x65(s: SparkSession, d: String): DataFrame =
    sourceJaccard(Tables.documents(s, d))

  val x65Sql: String =
    s"""WITH tok AS (
       |  SELECT source, unnest(string_split(lower(text), ' ')) AS w
       |  FROM documents WHERE text IS NOT NULL),
       |hh AS (SELECT DISTINCT source, ${duckH60("w")} AS h FROM tok),
       |rk AS (SELECT source, h,
       |  row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM hh),
       |sk AS (SELECT source, h FROM rk WHERE rn <= $K),
       |pr AS (
       |  SELECT a.source AS src_a, b.source AS src_b
       |  FROM (SELECT DISTINCT source FROM sk) a
       |  JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source),
       |pu AS (
       |  SELECT pr.src_a, pr.src_b, sk.h,
       |    max(CASE WHEN sk.source = pr.src_a THEN 1 ELSE 0 END) AS ia,
       |    max(CASE WHEN sk.source = pr.src_b THEN 1 ELSE 0 END) AS ib
       |  FROM pr JOIN sk ON sk.source = pr.src_a OR sk.source = pr.src_b
       |  GROUP BY pr.src_a, pr.src_b, sk.h),
       |ru AS (SELECT src_a, src_b, h, ia, ib,
       |  row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn FROM pu)
       |SELECT src_a, src_b,
       |  CAST(sum(CASE WHEN ia = 1 AND ib = 1 THEN 1 ELSE 0 END) AS BIGINT) AS inter_k,
       |  CAST(floor(1000000.0 * sum(CASE WHEN ia = 1 AND ib = 1 THEN 1 ELSE 0 END)
       |    / count(*)) AS BIGINT) AS jacc_micro
       |FROM ru WHERE rn <= $K
       |GROUP BY src_a, src_b
       |ORDER BY src_a, src_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x65_sketch_jaccard" -> (x65 _))

  val oracleSql: Map[String, String] = Map(
    "x65_sketch_jaccard" -> x65Sql)
}
