package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Benchmark decontamination — the training-data hygiene op: find
  * corpus documents that share enough character n-grams with any
  * document of a held-out benchmark set that they would leak evaluation
  * data into training. The standard reported form is n-gram overlap:
  * a (corpus_doc, benchmark_doc) pair is contaminated when they share
  * at least `minOverlap` distinct 8-gram hashes. The default 50 sits
  * past the shared-phrase noise knee measured on the fixture (overlap
  * >=10 flags half of all pairs; >=50 flags the actual near-dup tail).
  *
  * Scale shape: ONE exchange of the raw shingle occurrences keyed by
  * shingle hash; everything downstream — per-(hash, doc) distinctness,
  * the per-hash document-frequency stats, the rare-hash filter, and
  * the benchmark×corpus self-join — runs under that same partitioning
  * (hash-partitioning on hf satisfies every later clustering on hf, so
  * Catalyst inserts no further exchange, and the two self-join
  * branches reuse the one shuffle). The document-frequency prefilter
  * (drop shingles in more than `maxShingleDocFreq` documents —
  * boilerplate, licenses, headers) is applied to COUNTS, before any
  * per-hash document list exists: a shingle shared by a million
  * documents costs one counter, never a million-element set, and the
  * join fanout is bounded at maxShingleDocFreq² pairs per hash. (An
  * earlier collect_set formulation materialized the full doc list per
  * hash before filtering — an OOM at corpus scale.)
  */
object Decontaminate {

  /** Contaminated pairs: (doc_id, bench_id, overlap) with overlap =
    * count of shared distinct 8-gram hashes >= minOverlap. `corpus` and
    * `benchmark` are (doc_id, text) DataFrames; ids must be unique
    * across both inputs (document frequency is computed over the
    * union). */
  def overlapPairs(corpus: DataFrame, benchmark: DataFrame,
      minOverlap: Int = 50, maxShingleDocFreq: Int = 50): DataFrame = {
    // fanOut: the shingle explode below is the expensive stage; spread
    // it even when the input arrives as one small file (identity at
    // corpus scale — see Tables.fanOut).
    val tagged = Tables.fanOut(corpus
      .select(col("doc_id"), col("text"), lit(false).as("__bench"))
      .unionByName(benchmark
        .select(col("doc_id"), col("text"), lit(true).as("__bench"))))
    // One-pass distinct gram sets (same md5 scheme as x04, nSlots=0),
    // exploded to (doc, hf) rows that are ALREADY distinct per doc: the
    // exchange below ships the per-doc distinct grams, not every
    // occurrence, and the old per-(hash, doc) dedup aggregation
    // disappears entirely.
    val shd0 = tagged.select(col("doc_id"), col("__bench"),
      explode(graft.functions.CharShingleSig(lower(col("text")), 0, 0)
        .getField("hs")).as("hf"))
    // ONE pinned exchange keyed by shingle hash; every later step's
    // clustering requirement is satisfied by it, so the whole chain
    // below is exchange-free until the final tiny pair aggregation.
    // The plan is deliberately LINEAR — a branching formulation (stats
    // + two join sides over a shared relation) was measured to re-run
    // the expensive shingle map stage once per branch (the adaptive
    // stage cache does not dedup sibling exchanges, and persist() raced
    // concurrent consumer stages), and an unpinned repartition lets AQE
    // coalesce the tiny test-scale shuffle below the session's
    // parallelism.
    // partition count scales with the file-backed input size (1 MB of
    // compressed input per partition ≈ 64 MB of shingle rows after the
    // ~8× explode + hash amplification): at test scale this IS
    // defaultParallelism; at the 100× rehearsal it is what keeps the
    // per-partition aggregation below spill
    val parts = Tables.sizeScaledPartitions(corpus)
    val shd = shd0.repartition(parts, col("hf"))
    // Frequency cap and set collection in ONE aggregation pass: each
    // side's distinct doc ids via the bounded-set aggregate
    // ([[graft.functions.BoundedLongSet]]), whose state is ≤ cap+1
    // longs per hash no matter how many documents share the shingle —
    // a boilerplate shingle shared by a million documents overflows at
    // cap+1 and frees its contents (NULL here = df > cap = dropped,
    // EXACTLY the frequency filter). The former formulation pre-counted
    // df with a window over the same partitioning, which sorted the
    // full shingle relation ONCE for the window and AGAIN inside the
    // (sort-fallback) collect_set aggregation — at the 100× corpus the
    // two ~half-billion-row sorts were the row's entire gap to the
    // single-node baseline.
    val cap = maxShingleDocFreq
    val perHash = shd.groupBy("hf").agg(
      graft.functions.BoundedSet.collect(
        when(col("__bench"), col("doc_id")), cap).as("bs"),
      graft.functions.BoundedSet.collect(
        when(!col("__bench"), col("doc_id")), cap).as("cs"))
      // overflow on EITHER side implies combined df > cap; the size sum
      // applies the cap when both sides stayed under it individually
      .filter(col("bs").isNotNull && col("cs").isNotNull &&
        size(col("bs")) + size(col("cs")) <= cap &&
        size(col("bs")) > 0 && size(col("cs")) > 0)
    perHash
      .select(explode(col("cs")).as("doc_id"), col("bs"))
      .select(col("doc_id"), explode(col("bs")).as("bench_id"))
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
  }

  /** Bloom-prefiltered decontamination — the production ingest shape at
    * 100 TB, where the corpus must NOT be shuffled just to discover that
    * 99% of it shares nothing with the benchmark.
    *
    * Plan shape: a Bloom filter over the benchmark's distinct long-gram
    * hashes is built once (distributed aggregation, driver holds only
    * the ~megabyte sketch) and probed INSIDE the corpus scan's narrow
    * pipeline via the codegen'd [[graft.functions.BloomMightContainLong]]
    * — corpus rows whose gram cannot be in the benchmark die before any
    * exchange. Survivors (measured ~1% of corpus shingles on the
    * fixture) meet the benchmark shingles in a broadcast equi-join whose
    * exact match discards the Bloom's false positives, so the result is
    * EXACTLY the no-bloom computation — the sketch only prunes, never
    * decides. The one hash exchange that remains moves survivor pairs,
    * not the corpus.
    *
    * Versus [[overlapPairs]] (x18): that operator's document-frequency
    * cap needs global per-gram counts over corpus ∪ benchmark — a full
    * corpus shuffle by construction. This variant gets rarity by
    * CONSTRUCTION instead: `gramLen` is long (default 24 chars ≈ 4
    * words, the "long n-gram" decontamination convention), so grams are
    * near-unique (fixture max document frequency 18 at sf0.1, join
    * fanout 13k pairs from 1.3M shingle rows) and no frequency cap is
    * needed. `expectedItems`/`fpp` size the sketch; undersizing only
    * raises the false-positive rate (more survivors to verify), never
    * changes the result — while OVERSIZING is not free: every build
    * task allocates the full bitset and the driver merges one per
    * partition, so the build costs sketch-size × partitions regardless
    * of the data (a 58×-oversized default was measured 6× slower
    * under session memory pressure at the 10× rehearsal). Size to the
    * benchmark's distinct gram count, not to a safety margin. */
  def bloomDecontaminate(corpus: DataFrame, benchmark: DataFrame,
      minOverlap: Int = 20, gramLen: Int = 24,
      expectedItems: Long = 1L << 20, fpp: Double = 0.01): DataFrame = {
    def shingles(docs: DataFrame, idAs: String): DataFrame =
      docs.select(col("doc_id").as(idAs),
        explode(graft.functions.CharShingleSig(lower(col("text")), 0, 0, gramLen)
          .getField("hs")).as("hf"))
    val benchSh = shingles(benchmark, "bench_id")
    // Spark 4's stat.bloomFilter NPEs deserializing the aggregate's
    // null result when the build side has NO rows (found by the
    // degenerate-corpus sweep). An empty benchmark is legitimate at
    // scale (nothing to decontaminate against); a zero-insertion
    // filter keeps the plan total — it rejects every probe, so the
    // result is the correct empty set. The isEmpty probe is a
    // limit-1 scan, driver-sized by construction.
    val bf =
      if (benchSh.isEmpty) BloomFilter.create(1, fpp)
      else benchSh.stat.bloomFilter("hf", expectedItems, fpp)
    val survivors = shingles(Tables.fanOut(corpus), "doc_id")
      .filter(graft.functions.BloomMightContainLong(col("hf"), bf))
    survivors.join(broadcast(benchSh), "hf")
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

  def x41(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    bloomDecontaminate(docs.filter(!isBench), docs.filter(isBench))
  }

  /** The oracle computes the NO-BLOOM exact answer (plain join on the
    * 24-gram hashes, no frequency cap) — identical output proves the
    * sketch is a pure prefilter. */
  val x41Sql: String =
    s"""WITH sh AS (SELECT DISTINCT doc_id, hf FROM (${Dedup.charShingleHashesSqlN(24)})),
       |c AS (SELECT doc_id, hf FROM sh WHERE doc_id % 20 <> 0),
       |b AS (SELECT doc_id AS bench_id, hf FROM sh WHERE doc_id % 20 = 0)
       |SELECT c.doc_id, b.bench_id, count(*) AS overlap
       |FROM c JOIN b USING (hf)
       |GROUP BY 1, 2 HAVING count(*) >= 20""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x18_decontaminate" -> (x18 _),
    "x41_bloom_decontaminate" -> (x41 _),
  )

  val oracleSql: Map[String, String] = Map(
    "x18_decontaminate" -> x18Sql,
    "x41_bloom_decontaminate" -> x41Sql,
  )
}
