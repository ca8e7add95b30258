package graft

import org.apache.spark.sql.{DataFrame, Dataset}
import graft.streaming.{MessageStatus, UndeliveredAlert}

/** Public library facade — DataFrame-in/DataFrame-out entry points for
  * every capability, independent of the test fixtures. A user of the
  * reference system programs against this surface:
  *
  * {{{
  * import graft.Graft
  * val dups   = Graft.nearDupPairs(myDocs)              // (a, b, jac_u)
  * val knn    = Graft.annTopK(myVectors, Seq(1L, 2L))   // (qid, vec_id, score, rn)
  * val langs  = Graft.languageId(myDocs)                // (doc_id, pred_lang, hits)
  * val alerts = Graft.undeliveredAlerts(stream, 120000) // streaming Dataset
  * }}}
  *
  * Expected schemas: documents = (doc_id: long, text: string);
  * embeddings = (vec_id: long, embedding: array<float|double>);
  * message streams = [[graft.streaming.MessageStatus]].
  */
object Graft {

  // ---- deduplication ------------------------------------------------
  /** MinHash+LSH near-duplicate pairs on word 3-gram shingles. */
  def nearDupPairs(docs: DataFrame, threshold: Double = 0.8,
      maxBandBucket: Option[Int] = None): DataFrame =
    operators.Dedup.nearDupWordPairs(docs, threshold, maxBandBucket)

  /** Character-8-gram variant (catches word reordering). */
  def nearDupCharPairs(docs: DataFrame, threshold: Double = 0.7,
      maxBandBucket: Option[Int] = None): DataFrame =
    operators.Dedup.nearDupCharPairs(docs, threshold, maxBandBucket)

  /** Exact Levenshtein re-scoring of the char-gram LSH candidates
    * over bounded lowercased prefixes (O(len^2) priced per candidate
    * pair, never corpus^2). */
  def editDistancePairs(docs: DataFrame, prefixLen: Int = 120,
      threshold: Double = 0.7): DataFrame =
    operators.Dedup.editDistancePairs(docs, prefixLen, threshold)

  /** SimHash pairs within a Hamming radius (exact via chunk banding). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    operators.Dedup.simhashPairs(docs, maxHamming)

  /** Embedding-cosine near-duplicates, LSH-banded (the scale path). */
  def embeddingDupPairs(embeddings: DataFrame, threshold: Double = 0.4,
      maxBandBucket: Option[Int] = None): DataFrame =
    operators.Dedup.embeddingDupPairs(embeddings, threshold, maxBandBucket)

  /** Global top-k most-similar embedding pairs (closest-pairs mining)
    * over the banded candidate set — LSH-bounded recall, no cross
    * product, top-k fused (TakeOrderedAndProject). */
  def closestPairs(embeddings: DataFrame, k: Int = 100): DataFrame =
    operators.Dedup.closestPairs(embeddings, k)

  /** Exact all-pairs variant — the recall baseline; fixture-scale only. */
  def embeddingDupPairsExact(embeddings: DataFrame, threshold: Double = 0.4): DataFrame =
    operators.Dedup.embeddingDupPairsExact(embeddings, threshold)

  /** End-to-end corpus preparation: exact dedup (keep-first) ->
    * near-dup removal (keep-first) -> language/quality/token
    * annotation of the survivors. */
  def cleanCorpus(docs: DataFrame, nearDupThreshold: Double = 0.8): DataFrame =
    operators.Pipeline.cleanCorpus(docs, nearDupThreshold)

  /** Transitive duplicate groups: connected components over any pair
    * relation — (id, cluster_id = min id of the group). */
  def dupClusters(pairs: DataFrame, aCol: String = "a", bCol: String = "b"): DataFrame =
    operators.Clusters.connectedComponents(pairs, aCol, bCol)

  /** Incremental ingest dedup: near-dup pairs of an incoming batch
    * against the existing corpus (directed batch_id -> corpus_id;
    * candidates scale with the batch, never corpus x corpus). */
  def incrementalDupPairs(corpus: DataFrame, batch: DataFrame,
      threshold: Double = 0.8): DataFrame =
    operators.Dedup.incrementalDupPairs(corpus, batch, threshold)

  /** Benchmark-contamination pairs by distinct char-8-gram overlap. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      minOverlap: Int = 50, maxShingleDocFreq: Int = 50): DataFrame =
    operators.Decontaminate.overlapPairs(corpus, benchmark, minOverlap,
      maxShingleDocFreq)

  /** Bloom-prefiltered contamination pairs by long-char-gram overlap:
    * the corpus is pruned inside its scan by a broadcast Bloom sketch
    * of the benchmark's grams; exact verify downstream makes the result
    * identical to the no-bloom computation. */
  def bloomDecontaminate(corpus: DataFrame, benchmark: DataFrame,
      minOverlap: Int = 20, gramLen: Int = 24,
      expectedItems: Long = 1L << 20, fpp: Double = 0.01): DataFrame =
    operators.Decontaminate.bloomDecontaminate(corpus, benchmark,
      minOverlap, gramLen, expectedItems, fpp)

  /** Cluster-level dedup output: one keep-longest representative per
    * connected component of `pairs`, plus all singletons. */
  def survivorCorpus(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id", lenCol: String = "n_chars"): DataFrame =
    operators.Clusters.survivorCorpus(docs, pairs, idCol, lenCol)

  /** Partial-duplicate pairs by containment |A∩B|/min(|A|,|B|) —
    * catches a doc quoted inside a larger one (recall floor documented
    * on the operator). */
  def containmentPairs(docs: DataFrame, threshold: Double = 0.8,
      maxBandBucket: Option[Int] = None): DataFrame =
    operators.Dedup.containmentPairs(docs, threshold, maxBandBucket)

  /** Per-doc fraction of distinct char-8-grams first introduced by
    * that document (novelty admission signal). */
  def noveltyScores(docs: DataFrame): DataFrame =
    operators.Dedup.noveltyScores(docs)

  /** Exact-substring duplication signal: per-doc count/fraction of
    * distinct windowLen-char windows that also occur in another
    * document (boilerplate and quoted-span detector). */
  def exactSubstrStats(docs: DataFrame, windowLen: Int = 50): DataFrame =
    operators.Dedup.exactSubstrStats(docs, windowLen)

  /** C4-style line-level exact dedup: keep the first instance of every
    * distinct chunkWords-word chunk corpus-wide and reassemble each
    * document from its surviving chunks (emits the cleaned corpus). */
  def lineDedup(docs: DataFrame, chunkWords: Int = 20): DataFrame =
    operators.Dedup.lineDedup(docs, chunkWords)

  /** Release the signature relations the near-dup entry points persist
    * (call between corpora in a long-lived driver). */
  def unpersistSignatures(blocking: Boolean = false): Int =
    operators.Dedup.unpersistSignatures(blocking)

  // ---- similarity search -------------------------------------------
  /** Exact top-k cosine neighbors for the given query vector ids. */
  def annTopK(embeddings: DataFrame, queryIds: Seq[Long]): DataFrame =
    operators.Similarity.annBrute(embeddings, queryIds)

  /** LSH-bucketed ANN (sign random projections; equi-join on bucket). */
  def annTopKLsh(embeddings: DataFrame, queryIds: Seq[Long]): DataFrame =
    operators.Similarity.annLsh(embeddings, queryIds)

  /** IVF-style ANN (coarse cells; queries probe 2 nearest cells). */
  /** Metadata-filtered exact top-k: neighbors restricted to the
    * query's label; the filter constrains candidate generation (label
    * equi-join), not the output. */
  def annTopKFiltered(embeddings: DataFrame, queryIds: Seq[Long]): DataFrame =
    operators.Similarity.annFiltered(embeddings, queryIds)

  def annTopKIvf(embeddings: DataFrame, queryIds: Seq[Long]): DataFrame =
    operators.Similarity.annIvf(embeddings, queryIds)

  /** Symmetric int8 embedding quantization with per-vector
    * reconstruction-error stats (narrow, shuffle-free). */
  def quantizeInt8(embeddings: DataFrame): DataFrame =
    operators.Similarity.quantizeInt8(embeddings)

  /** SemDeDup-style semantic dedup: k-means cells (same quantizer as
    * the IVF index), exact cosine verified within cells only, drop
    * vectors with a smaller-id cell-mate above the threshold. Returns
    * one (vec_id, cid, kept) verdict per vector. */
  def semDedup(embeddings: DataFrame, threshold: Double = 0.3): DataFrame =
    operators.Similarity.semDedup(embeddings, threshold)

  /** Distributed Gram matrix Σ v·vᵀ (upper triangle, 1e-4 units):
    * per-partition outer-product fold, shuffle volume partitions·d². */
  def gramMatrix(embeddings: DataFrame, dim: Int = 64): DataFrame =
    operators.Similarity.gramMatrix(embeddings, dim)

  /** Fit a PCA model: one distributed (count, mean, Gram) pass, then a
    * driver-side d×d Jacobi eigendecomposition (bounded model state). */
  def pcaFit(embeddings: DataFrame, dim: Int = 64): operators.Pca.PcaModel =
    operators.Pca.fit(embeddings, dim)

  /** Mean-center and project embeddings onto the model's top-k
    * components (narrow, broadcast literal basis, no UDF). */
  def pcaProject(embeddings: DataFrame, model: operators.Pca.PcaModel,
      k: Int = 8): DataFrame =
    operators.Pca.project(embeddings, model, k)

  // ---- text analysis ------------------------------------------------
  def languageId(docs: DataFrame): DataFrame = operators.TextOps.languageId(docs)
  def qualityScore(docs: DataFrame): DataFrame = operators.TextOps.qualityScore(docs)
  def tokenCounts(docs: DataFrame): DataFrame = operators.TextOps.tokenCounts(docs)
  def fingerprints(docs: DataFrame): DataFrame = operators.TextOps.fingerprints(docs)

  /** Gopher-style repetition signal: duplicate/dominant word-bigram
    * fractions per document (micro-units). */
  def repetitionStats(docs: DataFrame): DataFrame =
    operators.TextOps.repetitionStats(docs)

  /** Top-k tf-idf terms per document (integer score = tf·1e12 div df).
    * `broadcastVocab = false` shuffle-joins the document-frequency
    * relation instead of broadcasting it — for corpora whose
    * vocabulary outgrows the driver. */
  def tfIdfTopK(docs: DataFrame, k: Int = 3,
      broadcastVocab: Boolean = true): DataFrame =
    operators.TextOps.tfIdfTopK(docs, k, broadcastVocab)

  /** Unigram corpus-frequency score per doc (micro-units) — the
    * integer-portable perplexity-filter stand-in. */
  def unigramScores(docs: DataFrame): DataFrame =
    operators.TextOps.unigramScores(docs)

  /** Bigram LM plausibility per doc: mean add-one-smoothed p(w2|w1) in
    * integer micro-units, model estimated from the corpus itself. */
  def bigramScores(docs: DataFrame): DataFrame =
    operators.TextOps.bigramScores(docs)

  /** Exact per-language document-length quartiles. */
  def lengthQuartiles(docs: DataFrame): DataFrame =
    operators.TextOps.lengthQuartiles(docs)

  /** Admission verdicts: keep/drop plus the first failing rule
    * (too_short | low_quality | repetitive), thresholds per corpus. */
  def qualityFilter(docs: DataFrame, minTokens: Int = 15,
      minScoreU: Long = 550000L, maxDupU: Long = 120000L): DataFrame =
    operators.TextOps.qualityFilter(docs, minTokens, minScoreU, maxDupU)

  /** PII scrub: mask emails / IPv4s / phone numbers in the text column
    * and report per-doc match counts (narrow, shuffle-free). */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame =
    operators.TextOps.redactPii(docs, textCol)

  /** Typed field extraction from a JSON string column (explicit
    * schema — no corpus inference pass), aggregated per group. */
  def jsonFieldStats(df: DataFrame, jsonCol: String,
      groupCol: String): DataFrame =
    operators.Semi.jsonFieldStats(df, jsonCol, groupCol)

  // ---- corpus composition ------------------------------------------
  /** Top-k vocabulary by document frequency (deterministic order). */
  def vocabTopK(docs: DataFrame, k: Int = 100): DataFrame =
    operators.Sampling.vocabTopK(docs, k)

  /** Deterministic stratified sample: n docs per predicted language,
    * picked by portable-hash order. */
  def stratifiedSample(docs: DataFrame, perStratum: Int = 20): DataFrame =
    operators.Sampling.stratifiedSample(docs, perStratum)

  /** Per-source discrete length percentiles (p25/p50/p90/p99/max). */
  def lengthStats(docs: DataFrame): DataFrame =
    operators.Sampling.lengthStats(docs)

  /** Token-budget corpus mixing: admit docs per source in portable-hash
    * order until the running token total hits the budget. */
  def tokenBudgetSample(docs: DataFrame, budget: Long = 5000L): DataFrame =
    operators.Sampling.tokenBudgetSample(docs, budget)

  /** Training-shard packing: greedy sequential assignment of documents
    * to fixed-token-capacity shards, deterministic per source. */
  def shardAssign(docs: DataFrame,
      capacity: Long = operators.Sampling.ShardCapacity): DataFrame =
    operators.Sampling.shardAssign(docs, capacity)

  /** Per-user time-ordered event-type sequences (deterministic on any
    * partitioning: sort_array over collected (ts, type) structs). */
  def userSequences(events: DataFrame): DataFrame =
    operators.Sequences.userSequences(events)

  /** Scale-path sequence packing: fixed-token-budget bin assignment via
    * a two-pass distributed prefix sum (the sequential region is
    * `buckets` rows, not the corpus — see [[operators.Packing]]). */
  def packByTokenBudget(docs: DataFrame, budget: Long = 2048L,
      buckets: Int = 32): DataFrame =
    operators.Packing.packByTokenBudget(docs, budget, buckets)

  /** BM25 top-k retrieval (rational-idf Okapi) over (doc_id, text). */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int = 50): DataFrame =
    operators.Retrieval.bm25TopK(docs, terms, k)

  /** Overlapping token-window chunking (RAG/context prep): stable
    * (doc_id, chunk_idx) identity + portable per-chunk fingerprint;
    * shuffle-free. */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int = 128,
      overlap: Int = 32): DataFrame =
    operators.Packing.chunkDocuments(docs, chunkTokens, overlap)

  /** Leakage-free train/test split: whole duplicate clusters (from the
    * `pairs` graph) land on one side; deterministic and stable as the
    * corpus grows. */
  def leakageFreeSplit(docs: DataFrame, pairs: DataFrame,
      trainPct: Int = 80): DataFrame =
    operators.Clusters.leakageFreeSplit(docs, pairs, trainPct)

  /** sqrt-temperature mixture sampling over sources (mT5-style). */
  def mixtureSample(docs: DataFrame, frac: Double = 0.5): DataFrame =
    operators.Sampling.mixtureSample(docs, frac)

  /** The full assembly chain in one call: clean → mixture-sample →
    * chunk → pack; returns (doc_id, chunk_idx, n_tokens, bin). */
  def assembleTrainingSet(docs: DataFrame, frac: Double = 0.5,
      chunkTokens: Int = 128, overlap: Int = 32,
      budget: Long = 2048L, buckets: Int = 32): DataFrame =
    operators.Pipeline.assembleTrainingSet(docs, frac, chunkTokens,
      overlap, budget, buckets)

  // ---- sketches -----------------------------------------------------
  /** Approximate distinct of `key` per `groupCol` via the portable
    * 64-register HLL aggregate (64 B state/group). `withExact = true`
    * adds the exact count for calibration — at the cost of the distinct
    * expand+shuffle the sketch exists to avoid. */
  def approxDistinct(df: DataFrame, key: org.apache.spark.sql.Column,
      groupCol: String, withExact: Boolean = false): DataFrame =
    operators.Sketches.hllDistinct(df, key, groupCol, withExact)

  /** Count-min point estimates + exact counts for `probes` over a token
    * column `t` (8 KiB sketch state, single corpus pass). */
  def cmsProbe(tokens: DataFrame, probes: Seq[String]): DataFrame =
    operators.Sketches.cmsProbe(tokens, probes)

  /** Deterministic sampled quantiles of `valueCol` per `groupCol` (the
    * merge-order-independent bottom-k sketch; `idCol` seeds the sample
    * hash — any per-row-unique column). */
  def sampleQuantiles(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, k: Int = 64): DataFrame =
    operators.Sketches.sampleQuantiles(df, groupCol, idCol, valueCol, k)

  /** The storable sketch table: one 64-register HLL array per fine
    * group — the input to [[rollupSketches]]. */
  def sketchTable(df: DataFrame, key: org.apache.spark.sql.Column,
      groupCols: Seq[org.apache.spark.sql.Column]): DataFrame =
    operators.Sketches.sketchTable(df, key, groupCols)

  /** Fold a stored sketch table to a coarser grouping without
    * rescanning raw data (register-max union — bit-identical to
    * sketching the coarse group directly). */
  def rollupSketches(table: DataFrame, groupCols: Seq[String]): DataFrame =
    operators.Sketches.rollupSketches(table, groupCols)

  /** Aggregate Column: the k lexicographically-smallest `row` structs
    * per group, ascending — the bounded-heap replacement for
    * `row_number() OVER (...) <= k` (no per-group sort; encode DESC
    * fields by negating them). Use inside `groupBy(...).agg(...)`,
    * then `explode` the result. */
  def topkRows(row: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    functions.TopK.rows(row, k)

  /** Aggregate Column: values of the k rows with smallest (hk, v) —
    * the deterministic merge-order-independent sample behind
    * [[sampleQuantiles]]. */
  def bottomkSample(hk: org.apache.spark.sql.Column,
      v: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    functions.BottomK.sample(hk, v, k)

  // ---- keyed upsert -------------------------------------------------
  /** Delta-style MERGE: one full-outer shuffle join applying matched
    * updates, source-only inserts, and target pass-through. */
  def merge(target: DataFrame, source: DataFrame,
      targetKey: String, sourceKey: String,
      whenMatched: Map[String, org.apache.spark.sql.Column],
      insertValues: Map[String, org.apache.spark.sql.Column]): DataFrame =
    operators.Merge.merge(target, source, targetKey, sourceKey,
      whenMatched, insertValues)

  /** Small-file compaction of a parquet directory to ~targetMB files
    * (post-streaming-sink hygiene); returns (filesBefore, filesAfter). */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetMB: Int = 128): (Int, Int) =
    sources.ParquetStore.compact(spark, path, targetMB)

  // ---- streaming ----------------------------------------------------
  /** The north-star stateful timeout detector (works on batch or
    * streaming Datasets; streaming needs a watermark-capable source). */
  def undeliveredAlerts(stream: Dataset[MessageStatus], timeoutMs: Long,
      watermarkDelay: String = "1 minute"): Dataset[UndeliveredAlert] =
    streaming.UndeliveredDetector.alerts(stream, timeoutMs, watermarkDelay)

  /** Relational twin of the detector (identical answer set). */
  def undeliveredAlertsBatch(ds: Dataset[MessageStatus], timeoutMs: Long)
      : Dataset[UndeliveredAlert] =
    streaming.UndeliveredDetector.alertsBatch(ds, timeoutMs)

  /** Tumbling carrier/status monitoring counts. */
  def windowedCounts(ds: Dataset[MessageStatus]): DataFrame =
    streaming.WindowedCounts.byCarrier(ds)

  // ---- temporal joins ----------------------------------------------
  /** AS-OF join: left columns plus an `asof` struct of the right row
    * with the greatest timestamp (strictly) before the left row's, per
    * key. One shuffle, no join node — see operators.AsOf. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, strict: Boolean = true): DataFrame =
    operators.AsOf.asofJoin(left, right, key, leftTs, rightTs, strict)

  /** Bucketed range join: count of right rows within [leftTs-window,
    * leftTs) per key — equi-join on time buckets, never a nested loop. */
  def rangeCount(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, windowMs: Long): DataFrame =
    operators.RangeJoin.rangeCount(left, right, key, leftTs, rightTs, windowMs)

  /** Event-time interval join (batch or watermarked stream-stream):
    * right rows within [leftTs, leftTs + boundMs] per key; TimestampType
    * ts columns. Stream-stream state stays bounded by the interval.
    * With joinType "left_outer", an unmatched left row emits once with
    * nulls when the watermark passes leftTs + boundMs — the join-shaped
    * timeout alert. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String, boundMs: Long,
      joinType: String = "inner"): DataFrame =
    operators.AsOf.intervalJoin(left, right, leftKey, rightKey,
      leftTs, rightTs, boundMs, joinType)

  /** Inner join with the big side salted across buckets — the explicit
    * skew-mitigation form for known-hot keys. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int = 16): DataFrame =
    operators.Skew.saltedJoin(big, small, key, saltBuckets)

  // ---- synthetic generation ----------------------------------------
  /** Deterministic batch transcript of n message lifecycles. */
  def generate(spark: org.apache.spark.sql.SparkSession, n: Long,
      seed: Long = 42L): DataFrame =
    streaming.Generator.batch(spark, n, seed)

  /** Live generator stream: per-key sent/heartbeat/delivered state
    * machine on processing-time timers (reference producer parity). */
  def generatorStream(spark: org.apache.spark.sql.SparkSession,
      rowsPerSecond: Int = 100): Dataset[MessageStatus] =
    streaming.Generator.stream(spark, rowsPerSecond)

  // ---- wire format --------------------------------------------------
  /** Avro-frame a message stream as Kafka (key, value) binary. */
  def frame(ds: Dataset[MessageStatus]): DataFrame = sources.KafkaIO.frame(ds)

  /** [[frame]] with the Confluent Schema-Registry 5-byte header. */
  def frameConfluent(ds: Dataset[MessageStatus]): DataFrame =
    sources.KafkaIO.frameConfluent(ds)

  /** [[frame]] with header ids issued by a schema registry (the
    * register-then-use flow; pass an [[sources.InMemorySchemaRegistry]]
    * offline or an [[sources.HttpSchemaRegistry]] at deploy). */
  def frameConfluent(ds: Dataset[MessageStatus],
      registry: sources.SchemaIdResolver): DataFrame =
    sources.KafkaIO.frameConfluent(ds, registry)

  /** Decode (key, value) binary back to messages (bare Avro bodies). */
  def unframe(df: DataFrame): Dataset[MessageStatus] = sources.KafkaIO.unframe(df)

  /** Decode Confluent-framed (key, value) binary back to messages. */
  def unframeConfluent(df: DataFrame): Dataset[MessageStatus] =
    sources.KafkaIO.unframeConfluent(df)

  /** [[unframe]] with registry-resolved header ids. */
  def unframeConfluent(df: DataFrame,
      registry: sources.SchemaIdResolver): Dataset[MessageStatus] =
    sources.KafkaIO.unframeConfluent(df, registry)
}
