package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Duplicate-CLUSTER resolution: the near-dup operators (x02/x03/x04/
  * x05) emit PAIRS, but a training-data pipeline needs one surviving
  * representative per transitive group — A~B and B~C must collapse A, B
  * and C together even when A~C was never emitted. That is connected
  * components over the pair graph.
  *
  * Algorithm: alternating LARGE-STAR / SMALL-STAR contraction
  * (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected
  * Components in MapReduce and Beyond", SoCC'14). Each pass rewires
  * edges toward neighborhood minima: large-star hangs every
  * strictly-larger neighbor of a node off its neighborhood minimum;
  * small-star collapses the smaller-or-equal neighborhood onto the
  * minimum. Both preserve connectivity exactly, and the pair converges
  * in O(log n) passes on ANY topology — a path graph needs ~log
  * passes, not diameter passes — with no correctness dependence on the
  * graph being clique-shaped. At the fixpoint the edge set IS a star
  * forest: every non-root points directly at its component's global
  * minimum id.
  *
  * All per-pass work is two aggregation+equi-join kernels — no driver
  * materialization of nodes or edges; the driver sees one count and
  * one empty-diff scalar per pass. Each pass's output is
  * lineage-truncated (lazy localCheckpoint materialized by the
  * convergence count), so an N-pass run holds one edge-set copy, not N
  * nested plans; a multi-executor deployment would use reliable
  * checkpoint() on shared storage instead (same call shape).
  *
  * Scale posture: per-pass shuffle footprint is a constant number of
  * hash exchanges on node ids (PlanSpec-pinned); edge-set cardinality
  * only shrinks (distinct star edges ≤ original undirected edges), and
  * the O(log n) bound removes the long-chain pathology the previous
  * min-label-propagation build had to `require(converged)` against.
  */
object Clusters {

  /** Connected components over an undirected pair graph.
    *
    * @param pairs one row per undirected edge; `aCol`/`bCol` are the
    *              two endpoint columns (any orderable numeric id)
    * @return (id, cluster_id): one row per node that appears in at
    *         least one pair, labeled with the minimum id reachable from
    *         it. Singletons (docs in no pair) are absent by design —
    *         callers keep them unconditionally.
    */
  /** LARGE-STAR pass (SoCC'14 Alg. 3): for every node u with
    * neighborhood N(u) (symmetric view) and m = min(N(u) ∪ {u}), emit
    * (v, m) for each v ∈ N(u) with v > u — all strictly-larger
    * neighbors re-hang off the local minimum. Input/output edges keep
    * the src > dst orientation.
    *
    * The per-node minimum is a WINDOW min over partitionBy(node), not a
    * groupBy + self-join: one shuffle computes m and keeps every
    * neighbor row, where the join form would shuffle the edge set twice
    * more. Per pass: exactly one hash exchange for the window plus one
    * for the output distinct. Exposed so PlanSpec can audit the
    * per-pass kernel UN-truncated — the loop checkpoints each pass,
    * which hides this plan from the final query tree (PLANS.md marks
    * those rows as lower bounds). */
  private[graft] def largeStar(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    sym.select(col("src"), col("dst"),
        least(col("src"), min(col("dst")).over(Window.partitionBy("src")))
          .as("m"))
      .where(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
  }

  /** SMALL-STAR pass (SoCC'14 Alg. 4): orient every edge large→small;
    * for node u with smaller-neighbors N(u) and m = min(N(u)), emit
    * (v, m) for v ∈ (N(u) ∪ {u}) \ {m} — the whole small neighborhood
    * collapses onto the minimum. Same window-min kernel as large-star;
    * the two per-row emissions ((v, m) and (u, m)) come out of one
    * explode so the window is computed once. */
  private[graft] def smallStar(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dir = e.select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .where(col("src") =!= col("dst"))
    dir.select(col("src"), col("dst"),
        min(col("dst")).over(Window.partitionBy("src")).as("m"))
      .select(explode(array(
        struct(col("dst").as("src"), col("m").as("dst")),
        struct(col("src").as("src"), col("m").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
  }

  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxPasses: Int = 50): DataFrame = {
    val s = pairs.sparkSession
    // Normalize once: undirected distinct edge set, src > dst, no
    // self-loops. Every subsequent pass preserves that orientation.
    var edges = pairs
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .where(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("src"),
        least(col("a"), col("b")).as("dst"))
      .distinct()
      .localCheckpoint(eager = false)
    // Each pass MUST rebase the edge DataFrame on materialized data:
    // a mere persist() leaves the logical plan nesting the previous
    // pass's plan, so the tree doubles each iteration and analysis
    // itself goes exponential. Lazy checkpoint + the convergence count:
    // the count is the pass's materializing job and the checkpoint
    // piggybacks on it. Old checkpoint RDDs are reclaimed by the
    // ContextCleaner once unreferenced.
    var prevCount = edges.count()
    var pass = 0
    var converged = false
    while (!converged && pass < maxPasses) {
      val next = smallStar(largeStar(edges)).localCheckpoint(eager = false)
      val nextCount = next.count()
      // Fixpoint test is exact set equality (both sides are distinct
      // sets): equal cardinality + empty one-sided difference. The
      // except job only runs on the candidate-converged passes.
      converged = nextCount == prevCount &&
        next.exceptAll(edges).limit(1).count() == 0L
      edges = next
      prevCount = nextCount
      pass += 1
    }
    // With the star-contraction kernels the O(log n) bound makes the
    // default cap unreachable for any physically storable graph
    // (2^50 nodes); the check stays as a loud invariant guard.
    require(converged,
      s"connected components did not converge within $maxPasses passes")
    // Fixpoint edge set IS the answer: every non-root points at its
    // component minimum; roots appear only on the dst side.
    edges.select(col("src").as("id"), col("dst").as("lbl"))
      .union(edges.select(col("dst").as("id"), col("dst").as("lbl"))
        .distinct())
  }

  // ---------------------------------------------------------------- x17
  /** Near-dup clusters over the x02 word-shingle pair graph: every doc
    * that belongs to a duplicate group, labeled with the group's
    * minimum doc_id (= the surviving representative a keep-first policy
    * retains; x13's pair-based drop is the special case where the graph
    * is already transitively closed). */
  def x17(s: SparkSession, d: String): DataFrame =
    connectedComponents(Dedup.nearDupWordPairs(Tables.documents(s, d)),
      "a", "b")
      .select(col("id").as("doc_id"), col("lbl").as("cluster_id"))

  /** Exact fixpoint via a recursive transitive-closure CTE — same
    * answer as the propagation loop, any number of hops. */
  val x17Sql: String =
    s"""WITH RECURSIVE pairs AS (${Dedup.x02Sql}),
       |edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
       |reach(n, m) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
       |)
       |SELECT n AS doc_id, least(n, min(m)) AS cluster_id
       |FROM reach GROUP BY n""".stripMargin

  /** x47 — duplicate-cluster size histogram: how many clusters exist of
    * each size (the headline stat of every dedup report — "N docs
    * collapsed into M clusters, largest K"). Two tiny aggregations on
    * top of the x17 labels: |docs-in-clusters| rows in, |distinct
    * sizes| rows out. Singleton docs never enter the pair graph, so
    * size ≥ 2 by construction. */
  def x47(s: SparkSession, d: String): DataFrame =
    x17(s, d)
      .groupBy("cluster_id").agg(count(lit(1)).as("sz"))
      .groupBy("sz").agg(count(lit(1)).as("n_clusters"))

  val x47Sql: String =
    s"""WITH labels AS ($x17Sql),
       |sizes AS (SELECT cluster_id, count(*) AS sz FROM labels GROUP BY 1)
       |SELECT sz, count(*) AS n_clusters FROM sizes GROUP BY sz""".stripMargin

  // ---------------------------------------------------------------- x55
  /** Leakage-free train/test split: the split unit is the DUPLICATE
    * CLUSTER, not the document — two near-dup docs must land on the
    * same side, or the held-out set leaks training data and evaluation
    * is contaminated (the standard pitfall naive random splits hit).
    * Docs in no cluster split by their own id; the coin is the portable
    * hash of the unit, so the split is deterministic across runs,
    * engines, and partitioning, and REPRODUCIBLE as data is added
    * (existing units never flip sides).
    *
    * Scale shape: cluster labels from the O(log n) star contraction;
    * one left equi-join of the corpus against the (small: only docs
    * that belong to some pair) label set; the coin is a narrow
    * expression. */
  def x55(s: SparkSession, d: String): DataFrame =
    leakageFreeSplit(Tables.documents(s, d),
      Dedup.nearDupWordPairs(Tables.documents(s, d)), trainPct = 80)

  /** The deterministic per-UNIT coin both split forms share (batch
    * x55 and the streaming s20 twin): hashing the unit — not the doc —
    * is what keeps whole clusters on one side. */
  private[operators] def splitCoin(unit: org.apache.spark.sql.Column,
      trainPct: Int): org.apache.spark.sql.Column = {
    import graft.functions.PortableHash
    when(PortableHash.h60(concat(lit("split_"), unit.cast("string")))
      % 100L < trainPct, "train").otherwise("test")
  }

  /** Library entry: split `docs` into train/test with whole `pairs`
    * connectivity clusters on one side. */
  def leakageFreeSplit(docs: DataFrame, pairs: DataFrame,
      trainPct: Int): DataFrame = {
    require(trainPct > 0 && trainPct < 100, s"trainPct in (0,100): $trainPct")
    val labels = connectedComponents(pairs, "a", "b")
      .withColumnRenamed("id", "doc_id")
    docs.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lbl"), col("doc_id")).as("unit"))
      .withColumn("split", splitCoin(col("unit"), trainPct))
  }

  val x55Sql: String =
    s"""WITH labels AS ($x17Sql),
       |u AS (
       |  SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS unit
       |  FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id)
       |SELECT doc_id, unit,
       |  CASE WHEN ${graft.functions.PortableHash.duckH60("concat('split_', CAST(unit AS VARCHAR))")} % 100 < 80
       |       THEN 'train' ELSE 'test' END AS split
       |FROM u""".stripMargin

  // ---------------------------------------------------------------- x28
  /** Survivor corpus: the end-to-end output of cluster-level dedup.
    * x17 labels duplicate-group members; this picks ONE representative
    * per group — the longest document (max `lenCol`), ties broken by
    * minimum doc_id — and unions it with the singletons (docs in no
    * pair), i.e. the corpus a training run would actually read.
    *
    * Keep-longest (not keep-first) is the production policy: near-dup
    * groups usually contain truncated/boilerplate-stripped variants and
    * the longest member dominates the others' content.
    *
    * Scale: representative selection is ONE hash aggregation on the
    * cluster label (min over an orderable (−len, id) struct — no
    * window, no sort, map-side partials); membership/singleton
    * filtering is two semi/anti joins on doc_id. Nothing beyond the CC
    * loop itself is iterative.
    */
  def survivorCorpus(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id", lenCol: String = "n_chars"): DataFrame = {
    val cc = connectedComponents(pairs, "a", "b")
    val members = docs
      .join(cc, docs(idCol) === cc("id"))
      .select(col("lbl"), (-col(lenCol)).as("ng"), col(idCol).as("did"))
    // arg-min over the orderable struct (−len, id) == longest, tie min id
    val reps = members
      .groupBy("lbl").agg(min(struct(col("ng"), col("did"))).as("w"))
      .select(col("w.did").as(idCol))
    val singles = docs.join(cc, docs(idCol) === cc("id"), "left_anti")
      .select(col(idCol))
    docs.join(singles.union(reps), Seq(idCol), "left_semi")
  }

  def x28(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    survivorCorpus(docs, Dedup.nearDupWordPairs(docs))
      .select("doc_id", "lang", "source", "n_chars")
  }

  val x28Sql: String =
    s"""WITH cc AS ($x17Sql),
       |m AS (SELECT c.cluster_id, d.doc_id,
       |    row_number() OVER (PARTITION BY c.cluster_id
       |      ORDER BY d.n_chars DESC, d.doc_id) AS rn
       |  FROM cc c JOIN documents d ON d.doc_id = c.doc_id),
       |keep AS (
       |  SELECT doc_id FROM documents
       |  WHERE doc_id NOT IN (SELECT doc_id FROM cc)
       |  UNION ALL SELECT doc_id FROM m WHERE rn = 1)
       |SELECT d.doc_id, d.lang, d.source, d.n_chars
       |FROM documents d JOIN keep USING (doc_id)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x17_dedup_clusters" -> (x17 _),
    "x47_cluster_sizes" -> (x47 _),
    "x28_dedup_survivors" -> (x28 _),
    "x55_leakage_split" -> (x55 _),
  )

  val oracleSql: Map[String, String] = Map(
    "x17_dedup_clusters" -> x17Sql,
    "x47_cluster_sizes" -> x47Sql,
    "x28_dedup_survivors" -> x28Sql,
    "x55_leakage_split" -> x55Sql,
  )
}
