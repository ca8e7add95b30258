package graft.operators

import graft.Tables
import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT similarity self-join via prefix filtering (the AllPairs /
  * PPJoin candidate bound of Bayardo et al., WWW'07 / Xiao et al.,
  * WWW'08) — the exact counterpart of [[Dedup]]'s x02 MinHash banding.
  *
  * x02 answers "find MOST near-dup pairs cheaply" (banding can miss a
  * pair whose signature never agrees on a full band); this operator
  * answers "find EVERY pair with Jaccard >= t" — the contract a
  * decontamination or eval-split audit needs — still without the
  * O(n^2) cross product:
  *
  *   Under ANY global total order on tokens, if J(A,B) >= t then
  *   |A∩B| >= ceil(t·|A|) and >= ceil(t·|B|) (since J <= |B|/|A| forces
  *   |B| >= t·|A|, so i >= t(|A|+|B|)/(1+t) >= t·|A|), and the SMALLEST
  *   common token (in the global order) must sit within the first
  *   |X| − ceil(t·|X|) + 1 tokens of BOTH sets — fewer than the
  *   required overlap can follow it otherwise. So an equi-join of the
  *   per-doc PREFIXES alone (rare-tokens-first order keeps prefixes
  *   collision-poor) is a complete candidate generator, and only those
  *   candidates are exact-verified. SimJoinSpec pins completeness
  *   against the brute-force join on adversarial corpora; the DuckDB
  *   oracle IS the brute-force join, so the gate re-proves it on every
  *   fixture.
  *
  * Tokens are the x02 word-3-gram shingle 60-bit hashes (one shared
  * representation across the exact and approximate paths — reference
  * dedup semantics per SURVEY §2F). Global order = (document frequency
  * asc, hash asc): rarest shingles first, the order that minimizes
  * prefix collisions (a boilerplate shingle shared by every doc sits at
  * the END of every prefix-eligible list and almost never enters one).
  *
  * 100 TB posture: four linear-size shuffles (distinct, df count,
  * per-doc rank, prefix equi-join) — the quadratic term is confined to
  * genuine near-dup pairs plus prefix collisions, both output-scale,
  * never corpus-scale². The per-doc rank window partitions by doc_id
  * (high-cardinality, skew-free; ~|doc| rows per partition). Verify
  * joins carry sorted hash arrays only to CANDIDATE rows.
  */
object SimJoin {

  /** Jaccard threshold t = TN/TD as an exact rational: prefix lengths
    * and the >= t verification both run in integer arithmetic, so the
    * two engines can never disagree on a boundary pair. */
  private val TN = 4
  private val TD = 5

  /** Exact Jaccard-threshold pairs (a < b, jac_u floor micro-units)
    * over any (doc_id, text) relation. Output schema matches x02. */
  /** Shared core: the persisted per-doc sorted hash-set relation and
    * the df-rank-annotated token relation (doc_id, hf, n, rn) under the
    * global (document frequency asc, hash asc) token order. */
  private def rankedOf(docs: DataFrame): (DataFrame, DataFrame) = {
    // verification relation: sorted distinct hash set per doc — ONE
    // shuffle on doc_id; the per-(doc, hash) set rows and the per-doc
    // sizes both derive from it narrowly (no separate distinct shuffle)
    // persist: the relation feeds four consumers (prefix build + both
    // verify lookups) — unmaterialized, the merge-side agg replays per
    // consumer (x02's materializeSig finding). Routed through Dedup's
    // session-lifecycle registry: repeat invocations share one cached
    // copy, the LRU bounds the total, and Graft.unpersistSignatures
    // releases it — a bare persist here leaked one cached relation per
    // (plan, scale factor) for the session lifetime (round-11 ADVICE).
    val sig = Dedup.persistShared(
      Dedup.wordShingleHashes(docs).groupBy("doc_id")
        .agg(sort_array(collect_set(col("hf"))).as("hs")))
    val hv = sig.select(col("doc_id"), size(col("hs")).cast("long").as("n"),
      explode(col("hs")).as("hf"))
    val dfc = hv.groupBy("hf").agg(count(lit(1)).as("dfc"))
    val ranked = hv.join(dfc, "hf")
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("dfc").asc, col("hf").asc)))
      .select(col("doc_id"), col("hf"), col("n"), col("rn"))
    (sig, ranked)
  }

  def exactPairs(docs: DataFrame): DataFrame = {
    val (sig, ranked) = rankedOf(docs)
    // prefix length |X| - ceil(t|X|) + 1; ceil(TN*n/TD) = (TN*n+TD-1) div TD
    val prefix = ranked
      .filter(col("rn") <= col("n") - expr(s"($TN * n + ${TD - 1}) DIV $TD") + 1)
      .hint("shuffle_hash")
    // PPJoin pruning inside the join condition — both filters keep
    // completeness (SimJoinSpec re-proves vs brute force):
    //  * LENGTH: J>=t forces t|A| <= |B| <= |A|/t (integer cross-mult);
    //  * POSITIONAL: overlap <= 1 + min(|A|-i, |B|-j) at a collision's
    //    prefix positions (i,j) — every common token sits at or after
    //    the FIRST one, where the bound >= the true overlap >= o, so a
    //    qualifying pair always survives via that first collision while
    //    later redundant collisions (and hopeless ones) are dropped
    //    before the distinct. Required overlap o = ceil(t/(1+t)(na+nb))
    //    = ceil(TN(na+nb)/(TN+TD)).
    val o = expr(s"($TN * (x.n + y.n) + ${TN + TD - 1}) DIV ${TN + TD}")
    val cand = prefix.alias("x")
      .join(prefix.alias("y"),
        col("x.hf") === col("y.hf") && col("x.doc_id") < col("y.doc_id")
          && col("y.n") * TD >= col("x.n") * TN
          && col("x.n") * TD >= col("y.n") * TN
          && lit(1) + least(col("x.n") - col("x.rn"),
                            col("y.n") - col("y.rn")) >= o)
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val sa = sig.select(col("doc_id").as("a"), col("hs").as("hsa"))
    val sb = sig.select(col("doc_id").as("b"), col("hs").as("hsb"))
    import graft.functions.ArrayMath
    cand.join(sa, "a").join(sb, "b")
      .withColumn("inter", ArrayMath.sortedIntersectSize(col("hsa"), col("hsb")))
      .withColumn("uni",
        (size(col("hsa")) + size(col("hsb")) - col("inter")).cast("long"))
      // integer threshold test: inter/uni >= TN/TD <=> TD*inter >= TN*uni
      .filter(col("inter") * TD >= col("uni") * TN)
      .select(col("a"), col("b"),
        floor(col("inter") / col("uni").cast("double") * 1000000)
          .cast("long").as("jac_u"))
  }

  def x74(s: SparkSession, d: String): DataFrame =
    exactPairs(Tables.documents(s, d))

  /** Oracle: the brute-force token join — the natural single-machine
    * formulation (every pair sharing >= 1 shingle, then the exact
    * Jaccard filter). The Spark side must produce the IDENTICAL pair
    * set from prefix collisions alone. */
  val x74Sql: String = {
    val hvHash = PortableHash.duckH60("s")
    s"""WITH base AS (SELECT doc_id, ${Dedup.admissionShinglesSql} AS sg FROM documents),
       |hv AS (SELECT DISTINCT doc_id, $hvHash AS hf
       |  FROM (SELECT doc_id, unnest(sg) AS s FROM base)),
       |sz AS (SELECT doc_id, count(*) AS n FROM hv GROUP BY 1),
       |pairs AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
       |  FROM hv x JOIN hv y ON x.hf = y.hf AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2)
       |SELECT a, b,
       |  CAST(floor(inter / CAST(sa.n + sb.n - inter AS DOUBLE) * 1000000)
       |       AS BIGINT) AS jac_u
       |FROM pairs
       |JOIN sz sa ON sa.doc_id = a
       |JOIN sz sb ON sb.doc_id = b
       |WHERE $TD * inter >= $TN * (sa.n + sb.n - inter)""".stripMargin
  }

  // ---------------------------------------------------------------- x76
  /** EXACT containment-threshold join — the exact variant x30's
    * scaladoc wishes for: every pair with C = |A∩B| / min(|A|,|B|)
    * >= t (partial-duplicate detection: a small doc quoted inside a
    * larger one scores C ≈ 1 while its Jaccard — and therefore x74 and
    * x02's recall guarantee — collapses with the size ratio; x30's
    * single-row banding catches such pairs only probabilistically).
    *
    * Prefix filtering is ASYMMETRIC for containment (the standard
    * set-containment-join shape): the required overlap o >= ceil(t·nA)
    * is known only on the SMALLER side A, and a tiny contained set
    * forces the larger side's full set into play. So candidates come
    * from prefix(SMALLER side) equi-joined against the FULL ranked
    * token relation: the first common token c1 (global order) sits in
    * A's prefix — fewer than o common tokens can follow it — and
    * trivially somewhere in B. The positional filter carries over with
    * o = ceil(t·nA): overlap <= 1 + min(nA−i, nB−j). Candidate volume
    * = Σ_{prefix tokens} df(token): rare-first ordering keeps prefix
    * tokens low-df, so the full-index side costs collisions, not a
    * cross product. Output (a < b by id, cont_u floor micro-units)
    * matches x30's shape. */
  def exactContainment(docs: DataFrame): DataFrame = {
    val (sig, ranked) = rankedOf(docs)
    val prefix = ranked
      .filter(col("rn") <= col("n") - expr(s"($TN * n + ${TD - 1}) DIV $TD") + 1)
      .hint("shuffle_hash")
    // x = the min-size side (prefix-restricted); y = the full index.
    // Equal sizes take the smaller id as x: c1 lies in BOTH prefixes
    // then, so one orientation suffices.
    val o = expr(s"($TN * x.n + ${TD - 1}) DIV $TD")
    val cand = prefix.alias("x")
      .join(ranked.alias("y"),
        col("x.hf") === col("y.hf")
          && (col("x.n") < col("y.n")
            || (col("x.n") === col("y.n")
              && col("x.doc_id") < col("y.doc_id")))
          && lit(1) + least(col("x.n") - col("x.rn"),
                            col("y.n") - col("y.rn")) >= o)
      .select(least(col("x.doc_id"), col("y.doc_id")).as("a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("b"))
      .distinct()
    val sa = sig.select(col("doc_id").as("a"), col("hs").as("hsa"))
    val sb = sig.select(col("doc_id").as("b"), col("hs").as("hsb"))
    import graft.functions.ArrayMath
    cand.join(sa, "a").join(sb, "b")
      .withColumn("inter", ArrayMath.sortedIntersectSize(col("hsa"), col("hsb")))
      .withColumn("mn",
        least(size(col("hsa")), size(col("hsb"))).cast("long"))
      .filter(col("inter") * TD >= col("mn") * TN)
      .select(col("a"), col("b"),
        floor(col("inter") / col("mn").cast("double") * 1000000)
          .cast("long").as("cont_u"))
  }

  def x76(s: SparkSession, d: String): DataFrame =
    exactContainment(Tables.documents(s, d))

  val x76Sql: String = {
    val hvHash = PortableHash.duckH60("s")
    s"""WITH base AS (SELECT doc_id, ${Dedup.admissionShinglesSql} AS sg FROM documents),
       |hv AS (SELECT DISTINCT doc_id, $hvHash AS hf
       |  FROM (SELECT doc_id, unnest(sg) AS s FROM base)),
       |sz AS (SELECT doc_id, count(*) AS n FROM hv GROUP BY 1),
       |pairs AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
       |  FROM hv x JOIN hv y ON x.hf = y.hf AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2)
       |SELECT a, b,
       |  CAST(floor(inter / CAST(least(sa.n, sb.n) AS DOUBLE) * 1000000)
       |       AS BIGINT) AS cont_u
       |FROM pairs
       |JOIN sz sa ON sa.doc_id = a
       |JOIN sz sb ON sb.doc_id = b
       |WHERE $TD * inter >= $TN * least(sa.n, sb.n)""".stripMargin
  }

  // ---------------------------------------------------------------- x77
  /** EXACT cosine-threshold join over the binary shingle sets —
    * cos = |A∩B| / √(|A|·|B|) ≥ t — completing the exact-join trilogy
    * (x74 Jaccard, x76 containment): cosine sits between them
    * (size-ratio-tolerant like containment, symmetric like Jaccard) and
    * is the form text-similarity systems usually threshold.
    *
    * The prefix bound needs t² (not t): cos ≥ t forces max ≤ min/t²
    * (length filter) and therefore overlap ≥ t·√(na·nb) ≥ t²·|X| for
    * BOTH sides — so prefixes of length |X| − ⌈t²|X|⌉ + 1 are complete
    * by the same first-common-token lemma. With t = 4/5, t² = 16/25
    * stays an exact rational, and every threshold test is pure integer:
    * the verify is 25·inter² ≥ 16·na·nb, the positional filter is
    * 25·b² ≥ 16·na·nb on the remaining-overlap bound b (no √ ever
    * enters a comparison; the emitted cos_u pays one IEEE sqrt + one
    * division, deterministic cross-engine). Prefixes are ~2.6× longer
    * than x74's (1−t² vs 1−t of each set) — the price of tolerating
    * size skew exactly. */
  def exactCosine(docs: DataFrame): DataFrame = {
    val (sig, ranked) = rankedOf(docs)
    // t² = TN²/TD²: prefix length |X| − ⌈t²|X|⌉ + 1
    val (tn2, td2) = (TN * TN, TD * TD)
    val prefix = ranked
      .filter(col("rn") <=
        col("n") - expr(s"($tn2 * n + ${td2 - 1}) DIV $td2") + 1)
      .hint("shuffle_hash")
    val cand = prefix.alias("x")
      .join(prefix.alias("y"),
        col("x.hf") === col("y.hf") && col("x.doc_id") < col("y.doc_id")
          // length filter: max ≤ min/t² (both orientations)
          && col("y.n") * td2 >= col("x.n") * tn2
          && col("x.n") * td2 >= col("y.n") * tn2
          // positional: remaining-overlap bound b must reach t·√(na·nb)
          && lit(td2) * pow2(lit(1) + least(col("x.n") - col("x.rn"),
               col("y.n") - col("y.rn"))) >= lit(tn2) * col("x.n") * col("y.n"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val sa = sig.select(col("doc_id").as("a"), col("hs").as("hsa"))
    val sb = sig.select(col("doc_id").as("b"), col("hs").as("hsb"))
    import graft.functions.ArrayMath
    cand.join(sa, "a").join(sb, "b")
      .withColumn("inter", ArrayMath.sortedIntersectSize(col("hsa"), col("hsb")))
      .withColumn("na", size(col("hsa")).cast("long"))
      .withColumn("nb", size(col("hsb")).cast("long"))
      .filter(lit(td2) * col("inter") * col("inter") >=
        lit(tn2) * col("na") * col("nb"))
      .select(col("a"), col("b"),
        floor(col("inter") / sqrt((col("na") * col("nb")).cast("double"))
          * 1000000).cast("long").as("cos_u"))
  }

  private def pow2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c * c

  def x77(s: SparkSession, d: String): DataFrame =
    exactCosine(Tables.documents(s, d))

  val x77Sql: String = {
    val hvHash = PortableHash.duckH60("s")
    s"""WITH base AS (SELECT doc_id, ${Dedup.admissionShinglesSql} AS sg FROM documents),
       |hv AS (SELECT DISTINCT doc_id, $hvHash AS hf
       |  FROM (SELECT doc_id, unnest(sg) AS s FROM base)),
       |sz AS (SELECT doc_id, count(*) AS n FROM hv GROUP BY 1),
       |pairs AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
       |  FROM hv x JOIN hv y ON x.hf = y.hf AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2)
       |SELECT a, b,
       |  CAST(floor(inter / sqrt(CAST(sa.n * sb.n AS DOUBLE)) * 1000000)
       |       AS BIGINT) AS cos_u
       |FROM pairs
       |JOIN sz sa ON sa.doc_id = a
       |JOIN sz sb ON sb.doc_id = b
       |WHERE ${TD * TD} * inter * inter >= ${TN * TN} * sa.n * sb.n""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x74_exact_simjoin" -> (x74 _),
    "x76_exact_containment" -> (x76 _),
    "x77_exact_cosine" -> (x77 _),
  )

  val oracleSql: Map[String, String] = Map(
    "x74_exact_simjoin" -> x74Sql,
    "x76_exact_containment" -> x76Sql,
    "x77_exact_cosine" -> x77Sql,
  )
}
