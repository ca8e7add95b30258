package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate-CLUSTER resolution: the near-dup operators (x02/x03/x04/
  * x05) emit PAIRS, but a training-data pipeline needs one surviving
  * representative per transitive group — A~B and B~C must collapse A, B
  * and C together even when A~C was never emitted. That is connected
  * components over the pair graph.
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with the smallest id among itself and its direct neighbors;
  * each pass sends labels across edges and keeps the minimum; at the
  * fixpoint every member of a component carries the component's global
  * minimum id. All per-pass work is one shuffle join plus one
  * aggregation — no driver materialization of nodes or edges; the
  * driver sees a single convergence scalar per pass.
  *
  * Scale posture: passes needed = graph diameter. LSH dup-clusters are
  * near-cliques (every duplicate collides with most of its siblings
  * directly), so real corpora converge in 2-3 passes. For adversarial
  * long-chain graphs the same join-shaped kernel would be swapped for
  * the large-star/small-star variant (O(log²) passes); the per-pass
  * plan here is identical, so the operator's shuffle footprint is the
  * scale contract either way. Label state is persisted per pass with
  * spill (MEMORY_AND_DISK) and the previous pass is explicitly
  * unpersisted and lineage-truncated via the persisted barrier, so an
  * N-pass run holds one labels copy, not N.
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
  /** Both directions of every pair — the propagation graph. */
  private[graft] def symmetricEdges(pairs: DataFrame, aCol: String,
      bCol: String): DataFrame =
    pairs
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .union(pairs.select(col(bCol).cast("long"), col(aCol).cast("long")))

  /** One min-label propagation pass: send labels across edges, keep the
    * minimum seen. Exposed so PlanSpec can audit the per-pass kernel
    * UN-truncated — the loop checkpoints each pass, which hides this
    * plan from the final query tree (PLANS.md marks those rows as lower
    * bounds). */
  private[graft] def propagationPass(edges: DataFrame,
      labels: DataFrame): DataFrame = {
    val msgs = edges.join(labels, edges("src") === labels("id"))
      .select(col("dst").as("id"), col("lbl"))
    labels.union(msgs).groupBy("id").agg(min(col("lbl")).as("lbl"))
  }

  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxPasses: Int = 50): DataFrame = {
    val edges = symmetricEdges(pairs, aCol, bCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Each pass MUST rebase the labels DataFrame on materialized data
    // (localCheckpoint, eager): a mere persist() leaves the logical plan
    // nesting the previous pass's plan — labels appears twice per pass,
    // so the tree doubles each iteration and analysis itself goes
    // exponential. The checkpoint truncates lineage to a constant-size
    // scan; a multi-executor deployment would use reliable checkpoint()
    // on shared storage instead (same call shape). Old checkpoint RDDs
    // are reclaimed by the ContextCleaner once unreferenced.
    // Lazy checkpoint + the checksum action: the checksum is the pass's
    // ONE materializing job and the checkpoint piggybacks on it — an
    // eager localCheckpoint would run a second job per pass for nothing
    // (measured: the loop is pure scheduling overhead at small graph
    // sizes, so jobs-per-pass is the cost driver).
    var labels = edges.groupBy("src").agg(min(col("dst")).as("mn"))
      .select(col("src").as("id"), least(col("src"), col("mn")).as("lbl"))
      .localCheckpoint(eager = false)
    // Labels only ever decrease, so sum(lbl) strictly decreases until
    // the fixpoint: equal consecutive sums == converged. One scalar to
    // the driver per pass, no row-level comparison join.
    // coalesce: sum over ZERO rows is null (empty pair input — the
    // normal case for a clean corpus) and must read as 0, not NPE.
    def checksum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("lbl")), lit(0L))).head().getLong(0)
    var prevSum = checksum(labels)
    var pass = 0
    var converged = false
    while (!converged && pass < maxPasses) {
      labels = propagationPass(edges, labels)
        .localCheckpoint(eager = false)
      val nextSum = checksum(labels)
      converged = nextSum == prevSum
      prevSum = nextSum
      pass += 1
    }
    edges.unpersist()
    // Unconverged labels are WRONG labels (distant members of one
    // component still carry different ids) — fail loudly rather than
    // hand a dedup pipeline multiple "representatives" per group. Real
    // duplicate graphs are near-cliques (diameter 2-3); hitting this
    // means the input is adversarially chain-shaped and needs the
    // large-star/small-star variant, not a bigger cap.
    require(converged,
      s"connected components did not converge within $maxPasses passes")
    labels
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
    s"""WITH RECURSIVE pairs AS (${Dedup.x02Sql}),
       |edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
       |reach(n, m) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
       |),
       |cc AS (SELECT n AS doc_id, least(n, min(m)) AS cluster_id
       |  FROM reach GROUP BY n),
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
  )

  val oracleSql: Map[String, String] = Map(
    "x17_dedup_clusters" -> x17Sql,
    "x47_cluster_sizes" -> x47Sql,
    "x28_dedup_survivors" -> x28Sql,
  )
}
