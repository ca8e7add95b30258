package graft.operators

import graft.Tables
import graft.functions.PortableHash._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` — language ID, quality
  * scoring, token counting, fingerprinting (north-star LLM-pipeline
  * surface). All are narrow per-row expression pipelines (no shuffle at
  * all), so they scale embarrassingly: at 100 TB each partition scans,
  * computes, and writes with zero exchange.
  */
object TextOps {

  private val StopEn = Seq("the", "a", "of", "and", "in", "to", "is")
  private val StopDe = Seq("der", "die", "und", "das", "ein", "ist")
  private val StopEs = Seq("el", "la", "los", "las", "una", "de", "es")
  private val StopFr = Seq("le", "les", "des", "une", "du", "et", "est")

  private def inList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("(", ", ", ")")

  private def withWords(s: SparkSession, d: String): DataFrame =
    withWordsOf(Tables.documents(s, d))

  private def withWordsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), lower(col("text")).as("t"))
      .withColumn("w", split(col("t"), " "))

  // ---------------------------------------------------------------- x08
  /** Stopword-marker language ID: score each language by marker-word
    * hits, argmax with a fixed priority order, 'und' when nothing hits. */
  /** Library entry over any (doc_id, text) DataFrame. */
  def languageId(docs: DataFrame): DataFrame = x08Impl(withWordsOf(docs))
  def x08(s: SparkSession, d: String): DataFrame = x08Impl(withWords(s, d))
  private def x08Impl(ww: DataFrame): DataFrame =
    ww
      .withColumn("s_en", expr(s"size(filter(w, x -> x IN ${inList(StopEn)}))"))
      .withColumn("s_de", expr(s"size(filter(w, x -> x IN ${inList(StopDe)}))"))
      .withColumn("s_es", expr(s"size(filter(w, x -> x IN ${inList(StopEs)}))"))
      .withColumn("s_fr", expr(s"size(filter(w, x -> x IN ${inList(StopFr)}))"))
      .withColumn("pred_lang", expr(
        """CASE WHEN s_en >= greatest(s_de, s_es, s_fr) AND s_en > 0 THEN 'en'
          |     WHEN s_de >= greatest(s_es, s_fr) AND s_de > 0 THEN 'de'
          |     WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
          |     WHEN s_fr > 0 THEN 'fr'
          |     ELSE 'und' END""".stripMargin))
      .select(col("doc_id"), col("pred_lang"),
        greatest(col("s_en"), col("s_de"), col("s_es"), col("s_fr")).as("hits"))

  val x08Sql: String = x08SqlOn("documents")
  /** x08 oracle over any (doc_id, text) relation. */
  def x08SqlOn(rel: String): String =
    s"""WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM $rel),
       |sc AS (SELECT doc_id,
       |  len(list_filter(w, x -> x IN ${inList(StopEn)})) AS s_en,
       |  len(list_filter(w, x -> x IN ${inList(StopDe)})) AS s_de,
       |  len(list_filter(w, x -> x IN ${inList(StopEs)})) AS s_es,
       |  len(list_filter(w, x -> x IN ${inList(StopFr)})) AS s_fr
       |  FROM ws)
       |SELECT doc_id,
       |  CASE WHEN s_en >= greatest(s_de, s_es, s_fr) AND s_en > 0 THEN 'en'
       |       WHEN s_de >= greatest(s_es, s_fr) AND s_de > 0 THEN 'de'
       |       WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
       |       WHEN s_fr > 0 THEN 'fr'
       |       ELSE 'und' END AS pred_lang,
       |  CAST(greatest(s_en, s_de, s_es, s_fr) AS INT) AS hits
       |FROM sc""".stripMargin

  // ---------------------------------------------------------------- x09
  /** Quality score: token count, stopword ratio, chars-per-token,
    * combined into a bounded heuristic. All ratios are emitted as
    * FLOOR-based micro-units (x*1e6 floored): round() half-ties at the
    * rounding scale resolve differently across engines (Spark HALF_UPs
    * the exact binary value; DuckDB rounds the multiplied double), and
    * these token ratios DO land on exact scale-6 ties — observed at
    * sf0.1. floor(x*1e6) is a pure IEEE multiply+floor, bit-identical
    * everywhere. */
  def qualityScore(docs: DataFrame): DataFrame = x09Impl(withWordsOf(docs))
  def x09(s: SparkSession, d: String): DataFrame = x09Impl(withWords(s, d))
  private def x09Impl(ww: DataFrame): DataFrame =
    ww
      .withColumn("n_tokens", size(col("w")))
      .withColumn("stop_ratio_u", floor(
        expr(s"size(filter(w, x -> x IN ${inList(StopEn)}))") /
          col("n_tokens").cast("double") * 1000000).cast("long"))
      .withColumn("cpt_u",
        floor(length(col("t")) / col("n_tokens").cast("double") * 1000000)
          .cast("long"))
      .withColumn("score_u", floor(
        (least(col("n_tokens") / lit(100.0), lit(1.0)) * 0.5 +
          (lit(1.0) - col("stop_ratio_u") / lit(1000000.0)) * 0.3 +
          least(col("cpt_u") / lit(1000000.0) / 8.0, lit(1.0)) * 0.2)
          * 1000000).cast("long"))
      .select("doc_id", "n_tokens", "stop_ratio_u", "cpt_u", "score_u")

  val x09Sql: String = x09SqlOn("documents")
  /** x09 oracle over any (doc_id, text) relation. */
  def x09SqlOn(rel: String): String =
    s"""WITH ws AS (SELECT doc_id, lower(text) AS t, string_split(lower(text), ' ') AS w FROM $rel),
       |m AS (SELECT doc_id, CAST(len(w) AS INT) AS n_tokens,
       |  CAST(floor(len(list_filter(w, x -> x IN ${inList(StopEn)})) / CAST(len(w) AS DOUBLE) * 1000000) AS BIGINT) AS stop_ratio_u,
       |  CAST(floor(len(t) / CAST(len(w) AS DOUBLE) * 1000000) AS BIGINT) AS cpt_u
       |  FROM ws)
       |SELECT doc_id, n_tokens, stop_ratio_u, cpt_u,
       |  CAST(floor((least(n_tokens / 100.0, 1.0) * 0.5 + (1.0 - stop_ratio_u / 1000000.0) * 0.3 +
       |        least(cpt_u / 1000000.0 / 8.0, 1.0) * 0.2) * 1000000) AS BIGINT) AS score_u
       |FROM m""".stripMargin

  // ---------------------------------------------------------------- x10
  /** Token counting two ways: whitespace split and a BPE-ish regex
    * ([a-z]+ runs | digit runs | any other non-space char). */
  def tokenCounts(docs: DataFrame): DataFrame = x10Impl(withWordsOf(docs))
  def x10(s: SparkSession, d: String): DataFrame = x10Impl(withWords(s, d))
  private def x10Impl(ww: DataFrame): DataFrame =
    ww
      .withColumn("ws_tokens", size(col("w")))
      .withColumn("re_tokens",
        size(regexp_extract_all(col("t"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))))
      .select("doc_id", "ws_tokens", "re_tokens")

  val x10Sql: String = x10SqlOn("documents")
  /** x10 oracle over any (doc_id, text) relation. */
  def x10SqlOn(rel: String): String =
    s"""SELECT doc_id,
      |  CAST(len(string_split(lower(text), ' ')) AS INT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS re_tokens
      |FROM $rel""".stripMargin

  // ---------------------------------------------------------------- x11
  /** Document fingerprint: min portable-hash over word 5-gram shingles
    * (a 1-permutation MinHash — equal fingerprints ⇒ shared rare
    * shingle, the cheap pre-filter for near-dup candidate generation). */
  def fingerprints(docs: DataFrame): DataFrame = x11Impl(withWordsOf(docs))
  def x11(s: SparkSession, d: String): DataFrame = x11Impl(withWords(s, d))
  private def x11Impl(ww: DataFrame): DataFrame =
    ww
      .withColumn("fp", expr(
        s"array_min(transform(sequence(1, greatest(size(w)-4, 1)), i -> ${sparkH60("concat_ws(' ', slice(w, i, 5))")}))"))
      .select("doc_id", "fp")

  val x11Sql: String =
    s"""WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)
       |SELECT doc_id,
       |  list_min(list_transform(range(1, greatest(len(w)-3, 2)),
       |    i -> ${duckH60("concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4])")})) AS fp
       |FROM ws""".stripMargin

  // ---------------------------------------------------------------- x21
  /** Repetition metrics (Gopher-style quality signal): per document,
    * the fraction of word 2-grams that are duplicates of an earlier one
    * and the fraction covered by the single most-frequent 2-gram. High
    * values mark boilerplate/spam for corpus filtering. Shape: ONE
    * narrow pass — the compiled [[graft.functions.BigramStats]] kernel
    * computes (n_bigrams, n_distinct, top_cnt) per row, so the query
    * has ZERO shuffles (the earlier explode-every-bigram → two-exchange
    * form shipped a corpus-sized (doc, bigram-string) relation — larger
    * than the corpus itself — through the cluster; see the kernel's
    * scaladoc). Ratios emitted as floor(x*1e6) micro-units (IEEE
    * multiply+floor, engine-portable). Documents with fewer than two
    * words have no 2-grams and are absent by construction (the kernel
    * yields NULL, filtered here; both engines drop them identically). */
  def repetitionStats(docs: DataFrame): DataFrame = x21Impl(docs)
  def x21(s: SparkSession, d: String): DataFrame =
    x21Impl(Tables.documents(s, d))
  private def x21Impl(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        graft.functions.BigramStats(col("text")).as("st"))
      .filter(col("st").isNotNull)
      .select(col("doc_id"),
        col("st.n_bigrams").as("n_bigrams"),
        col("st.n_distinct").as("n_distinct"),
        floor((lit(1.0) - col("st.n_distinct") / col("st.n_bigrams").cast("double"))
          * 1000000).cast("long").as("dup_frac_u"),
        floor(col("st.top_cnt") / col("st.n_bigrams").cast("double") * 1000000)
          .cast("long").as("top_frac_u"))

  val x21Sql: String = x21SqlOn("documents")
  def x21SqlOn(rel: String): String =
    s"""WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM $rel),
       |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
       |         i -> w[i] || ' ' || w[i+1])) AS b FROM ws),
       |pb AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2)
       |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
       |  CAST(count(*) AS BIGINT) AS n_distinct,
       |  CAST(floor((1.0 - count(*) / CAST(sum(c) AS DOUBLE)) * 1000000) AS BIGINT) AS dup_frac_u,
       |  CAST(floor(max(c) / CAST(sum(c) AS DOUBLE) * 1000000) AS BIGINT) AS top_frac_u
       |FROM pb GROUP BY doc_id""".stripMargin

  // ---------------------------------------------------------------- x22
  /** TF-IDF top-k terms per document. The per-doc term frequencies are
    * derived NARROWLY — one codegen'd [[graft.functions.TermCounts]]
    * call per document (tokenize, count, hash in a compiled kernel) —
    * so the corpus-sized (doc, term) exchange the round-6/7 shapes
    * paid (explode every occurrence, hash-aggregate by (doc, term))
    * does not exist at all: a document's tf rows are a per-row map.
    * Each tf row carries the 60-bit portable hash of its term (the
    * x45/x36 hashing trick), so the df aggregation and the scoring
    * join — the only wide operations left — move fixed-width longs,
    * never term strings. (A same-doc h60 collision keeps both terms
    * as separate tf rows and counts both in df, identically in both
    * engines — part of the shared contract.) Document frequency is a
    * |vocab|-row aggregate of the tf rows (distinct per doc, so
    * count(*) per hash IS df) BROADCAST-joined back onto them. Score
    * is pure integer arithmetic (tf·1e12 div df): monotone in tf/df
    * and bit-identical across engines — no floating-point log.
    *
    * `broadcastVocab`: the broadcast holds the vocabulary (megabytes
    * for natural-language corpora — word vocabularies grow
    * sub-linearly); callers whose vocab outgrows the driver pass
    * false and the planner picks a shuffle join on the long key (AQE
    * still downgrades to broadcast at runtime when the model is
    * actually small). */
  def tfIdfTopK(docs: DataFrame, k: Int = 3,
      broadcastVocab: Boolean = true): DataFrame =
    x22Impl(docs, k, broadcastVocab)
  def x22(s: SparkSession, d: String): DataFrame =
    x22Impl(Tables.documents(s, d), 3, broadcastVocab = true)
  private def x22Impl(docs: DataFrame, k: Int,
      broadcastVocab: Boolean): DataFrame = {
    // materialized: tf feeds the df build AND the scoring probe --
    // unmaterialized, the tokenize+count pass runs once per consumer
    // (same lazy-materialize trade as x45/x49). The checkpointed plan
    // is NARROW (no exchange above it): materialization is one scan.
    val tf = docs
      .select(col("doc_id"),
        explode(graft.functions.TermCounts(col("text"))).as("r"))
      .select(col("doc_id"), col("r.th").as("th"),
        col("r.term").as("term"), col("r.tf").as("tf"))
      .localCheckpoint(eager = false)
    val dfBase = tf.groupBy("th").agg(count(lit(1)).as("df"))
    val df = if (broadcastVocab) broadcast(dfBase) else dfBase
    // per-doc top-k via the bounded-heap topk_rows aggregate, NOT a
    // row_number window: the window sorts every doc's full term set on
    // its reducer; the aggregate reduces each partition to <=k rows per
    // doc before the exchange and never sorts more than k (see
    // functions/TopK.scala). Leading -score field encodes the
    // (score DESC, term ASC) window order losslessly.
    tf.join(df, "th")
      .withColumn("score", expr("tf * 1000000000000L div df"))
      .groupBy("doc_id")
      .agg(graft.functions.TopK.rows(
        struct((-col("score")).as("ns"), col("term"),
          col("tf"), col("df"), col("score")), k).as("top"))
      .select(col("doc_id"), explode(col("top")).as("t"))
      .select(col("doc_id"), col("t.term").as("term"), col("t.tf").as("tf"),
        col("t.df").as("df"), col("t.score").as("score"))
  }

  val x22Sql: String =
    s"""WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
       |tf AS (SELECT doc_id, unnest(w) AS term FROM ws),
       |tfc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM tf GROUP BY 1, 2),
       |tfh AS (SELECT doc_id, term, tf, ${duckH60("term")} AS th FROM tfc),
       |dfr AS (SELECT th, CAST(count(*) AS BIGINT) AS df FROM tfh GROUP BY th),
       |sc AS (SELECT doc_id, term, tf, df, tf * 1000000000000 // df AS score,
       |  row_number() OVER (PARTITION BY doc_id ORDER BY tf * 1000000000000 // df DESC, term) AS rn
       |  FROM tfh JOIN dfr USING (th))
       |SELECT doc_id, term, tf, df, score FROM sc WHERE rn <= 3""".stripMargin

  // ---------------------------------------------------------------- x32
  /** Quality-filter verdicts: the Gopher-style admission stage that
    * turns the per-doc signals into a keep/drop decision plus the FIRST
    * failing rule, in fixed order — too_short (ws_tokens < minTokens),
    * low_quality (score_u < minScoreU), repetitive (dup_frac_u >
    * maxDupU). Rule order is part of the contract: a short repetitive
    * doc reports too_short.
    *
    * Scale: three narrow per-doc signal relations (x09/x10/x21 shapes)
    * equi-joined on the uniform doc_id key; docs with fewer than two
    * words have no bigram row and LEFT-join in with dup 0. Thresholds
    * are data-calibrated defaults (sf0.01: 19 too_short / 71
    * low_quality / 410 ok) — callers tune per corpus. */
  def qualityFilter(docs: DataFrame, minTokens: Int = 15,
      minScoreU: Long = 550000L, maxDupU: Long = 120000L): DataFrame = {
    val t = tokenCounts(docs).select("doc_id", "ws_tokens")
    val q = qualityScore(docs).select("doc_id", "score_u")
    val r = repetitionStats(docs).select("doc_id", "dup_frac_u")
    t.join(q, "doc_id").join(r, Seq("doc_id"), "left")
      .withColumn("reason",
        when(col("ws_tokens") < minTokens, "too_short")
          .when(col("score_u") < minScoreU, "low_quality")
          .when(coalesce(col("dup_frac_u"), lit(0L)) > maxDupU, "repetitive")
          .otherwise("ok"))
      .select(col("doc_id"), (col("reason") === "ok").as("keep"),
        col("reason"))
  }

  def x32(s: SparkSession, d: String): DataFrame =
    qualityFilter(Tables.documents(s, d))

  val x32Sql: String =
    s"""WITH q AS (${x09SqlOn("documents")}),
       |t AS (${x10SqlOn("documents")}),
       |r AS (${x21SqlOn("documents")}),
       |v AS (SELECT t.doc_id, CASE WHEN t.ws_tokens < 15 THEN 'too_short'
       |    WHEN q.score_u < 550000 THEN 'low_quality'
       |    WHEN coalesce(r.dup_frac_u, 0) > 120000 THEN 'repetitive'
       |    ELSE 'ok' END AS reason
       |  FROM t JOIN q USING (doc_id) LEFT JOIN r USING (doc_id))
       |SELECT doc_id, (reason = 'ok') AS keep, reason FROM v""".stripMargin

  // ---------------------------------------------------------------- x36
  /** Unigram corpus-frequency score — the integer-portable stand-in for
    * LM-perplexity filtering: per document, the mean corpus frequency
    * of its tokens in micro-units (each token contributes
    * `wf·1e6 div total`). Documents full of tokens the corpus has
    * never seen score near zero (gibberish/noise); boilerplate scores
    * high — used WITH x09/x21 as a band-pass, not alone. All
    * arithmetic is integer division, so both engines floor
    * identically (a log-prob variant would hit libm ulp divergence).
    *
    * Scale shape: the model is a HASHED unigram table (the x45 hashing
    * trick): the token stream carries only the 60-bit portable hash of
    * each token, so the frequency aggregation and the scoring join key
    * on fixed-width longs, and the model is SHUFFLE-joined back — not
    * broadcast. (Round 7 broadcast the vocab relation; the 10×
    * rehearsal showed the broadcast grows with the corpus — a
    * word-perturbed corpus mints near-occurrence-scale vocabulary — so
    * the "megabytes at any scale" assumption does not survive growth.
    * With AQE the planner still picks a broadcast at runtime when the
    * model really is small.) Collisions (≈ n²/2^61) merge counts
    * identically in both engines — part of the shared contract. The
    * only corpus-sized exchanges are the model aggregation and the
    * scoring join, both on uniform long keys. */
  def unigramScores(docs: DataFrame): DataFrame = {
    // materialized: the token stream feeds the vocab build AND the
    // scoring join — unmaterialized, the explode re-ran per consumer
    // (measured super-linear at the 10× rehearsal, the x45/x49/x22
    // disease); 16 B/token, lazily localCheckpointed like those three
    val words = withWordsOf(docs)
      .select(col("doc_id"), explode(col("w")).as("wd"))
      .select(col("doc_id"), h60(col("wd")).as("hw"))
      .localCheckpoint(eager = false)
    // per-token micro-unit weight attached to the VOCAB relation; the
    // corpus total is a 1-row agg broadcast back (a no-partition
    // window would drag the vocab through ONE reducer)
    val freqBase = words.groupBy("hw").agg(count(lit(1)).as("wf"))
    val total = freqBase.agg(sum(col("wf")).as("total"))
    val freq = freqBase.crossJoin(broadcast(total))
      .select(col("hw"), expr("wf * 1000000 div total").as("u"))
    words
      .join(freq, "hw")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"),
        expr("sum(u) div count(1)").as("mean_freq_u"))
  }

  def x36(s: SparkSession, d: String): DataFrame =
    unigramScores(Tables.documents(s, d))

  val x36Sql: String =
    s"""WITH w AS (SELECT doc_id, ${duckH60("wd")} AS hw
      |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS wd
      |        FROM documents)),
      |f AS (SELECT hw, count(*) AS wf FROM w GROUP BY hw),
      |t AS (SELECT sum(wf) AS total FROM f),
      |u AS (SELECT doc_id, (wf * 1000000) // total AS u
      |  FROM w JOIN f USING (hw) CROSS JOIN t)
      |SELECT doc_id, count(*) AS n_toks,
      |  CAST(sum(u) // count(*) AS BIGINT) AS mean_freq_u
      |FROM u GROUP BY doc_id""".stripMargin

  // ------------------------------------------------------------- redact
  /** PII redaction: mask emails, IPv4 addresses, and phone numbers in
    * the text column and report per-document match counts — the scrub
    * pass a corpus runs before anything ships to training. Entirely
    * narrow (codegen'd regexp_replace/regexp_count, no shuffle at any
    * scale). Patterns are masked in precedence order (email → ip →
    * phone), and each count is taken on the SAME intermediate text its
    * masking pass sees, so n_emails/n_ips/n_phones equal exactly the
    * number of [EMAIL]/[IP]/[PHONE] tokens in the output — an IP
    * absorbed into an email match counts once, as an email.
    *
    * Gated by x38: the synthetic fixture corpus contains no PII, so
    * the driver query synthesizes PII-bearing text deterministically
    * from doc_id INSIDE the query (both engines build the identical
    * string), making the masked output and per-kind counts nonzero and
    * fully oracle-checked. */
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  private val PhoneRe = "\\+?\\d[\\d().-]{6,}\\d\\b"

  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val afterEmail = regexp_replace(col(textCol), EmailRe, "[EMAIL]")
    val afterIp = regexp_replace(afterEmail, Ipv4Re, "[IP]")
    docs
      .withColumn("n_emails", regexp_count(col(textCol), lit(EmailRe)))
      .withColumn("n_ips", regexp_count(afterEmail, lit(Ipv4Re)))
      .withColumn("n_phones", regexp_count(afterIp, lit(PhoneRe)))
      .withColumn(textCol, regexp_replace(afterIp, PhoneRe, "[PHONE]"))
  }

  /** PII-bearing fixture built from doc_id alone: every doc gets one
    * email and one private-range IP; every third doc a second email;
    * every fourth a phone. Both engines construct the identical bytes,
    * so the redacted text and counts are exact-match checkable. */
  private def piiFixture(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat(
        lit("Reach u"), col("doc_id").cast("string"),
        lit("@mail"), (col("doc_id") % 7).cast("string"), lit(".com"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" cc admin"), col("doc_id").cast("string"),
            lit("@corp.net"))).otherwise(lit("")),
        lit(" via 192.168."), (col("doc_id") % 256).cast("string"),
        lit("."), ((col("doc_id") * 7) % 256).cast("string"),
        when(col("doc_id") % 4 === 1,
          concat(lit(" or call +1-202-"),
            lpad((col("doc_id") % 10000).cast("string"), 7, "0")))
          .otherwise(lit(" no phone")),
        lit(" end.")).as("text"))

  def x38(s: SparkSession, d: String): DataFrame =
    redactPii(piiFixture(Tables.documents(s, d)))
      .select(col("doc_id"), col("text"),
        col("n_emails").cast("long").as("n_emails"),
        col("n_ips").cast("long").as("n_ips"),
        col("n_phones").cast("long").as("n_phones"))

  val x38Sql: String =
    s"""WITH p AS (SELECT doc_id,
       |  concat('Reach u', CAST(doc_id AS VARCHAR),
       |    '@mail', CAST(doc_id % 7 AS VARCHAR), '.com',
       |    CASE WHEN doc_id % 3 = 0
       |      THEN concat(' cc admin', CAST(doc_id AS VARCHAR), '@corp.net')
       |      ELSE '' END,
       |    ' via 192.168.', CAST(doc_id % 256 AS VARCHAR),
       |    '.', CAST((doc_id * 7) % 256 AS VARCHAR),
       |    CASE WHEN doc_id % 4 = 1
       |      THEN concat(' or call +1-202-',
       |        lpad(CAST(doc_id % 10000 AS VARCHAR), 7, '0'))
       |      ELSE ' no phone' END,
       |    ' end.') AS t
       |  FROM documents),
       |e AS (SELECT doc_id,
       |  len(regexp_extract_all(t, '$EmailRe')) AS n_emails,
       |  regexp_replace(t, '$EmailRe', '[EMAIL]', 'g') AS t1 FROM p),
       |i AS (SELECT doc_id, n_emails,
       |  len(regexp_extract_all(t1, '$Ipv4Re')) AS n_ips,
       |  regexp_replace(t1, '$Ipv4Re', '[IP]', 'g') AS t2 FROM e),
       |f AS (SELECT doc_id, n_emails, n_ips,
       |  len(regexp_extract_all(t2, '$PhoneRe')) AS n_phones,
       |  regexp_replace(t2, '$PhoneRe', '[PHONE]', 'g') AS text FROM i)
       |SELECT doc_id, text, n_emails, n_ips, n_phones FROM f""".stripMargin

  /** x42 — corpus length distribution: EXACT quartiles of document
    * length per language (the curation report every dataset release
    * ships). `percentile` is the exact sort-based aggregate — one
    * shuffle of |langs| groups, each group's values gathered to its
    * reducer; for a 100 TB corpus with bounded group count this is the
    * intended plan (the approximate sketch `percentile_approx` is the
    * escape hatch when a single group's values exceed one reducer, at
    * the cost of oracle-exactness). Quartile fractions are exact
    * binary rationals (k/4), so the linear interpolation between the
    * two integer neighbors is exact double arithmetic — bit-identical
    * across engines, no rounding canonicalization needed. */
  def lengthQuartiles(docs: DataFrame): DataFrame =
    docs
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n"),
        expr("percentile(n_chars, 0.25)").as("p25"),
        expr("percentile(n_chars, 0.5)").as("p50"),
        expr("percentile(n_chars, 0.75)").as("p75"))

  def x42(s: SparkSession, d: String): DataFrame =
    lengthQuartiles(Tables.documents(s, d))

  val x42Sql: String =
    """SELECT lang, count(*) AS n,
      |  quantile_cont(n_chars, 0.25) AS p25,
      |  quantile_cont(n_chars, 0.5) AS p50,
      |  quantile_cont(n_chars, 0.75) AS p75
      |FROM documents GROUP BY lang""".stripMargin

  /** x45 — bigram language-model plausibility: each document scored by
    * the mean add-one-smoothed conditional probability of its bigrams,
    * with the model estimated from the corpus itself — the classic
    * cheap fluency/quality signal (boilerplate and shuffled text score
    * low, natural prose scores high). p(w2|w1) = (c(w1,w2)+1) /
    * (c(w1·)+V) is computed ENTIRELY in integer micro-units (the x36
    * convention): both engines do the same BIGINT multiply and floor
    * divide, so there is no transcendental or float-association drift
    * to canonicalize — log-space scoring would tie the gate to libm.
    * Plan shape: bigrams derive narrowly (zip_with over the token
    * array, no posexplode self-join), then the occurrence stream is
    * IMMEDIATELY reduced to per-doc bigram TYPES (doc_id, w1, w2, c) —
    * the scored unit is the type, since every occurrence of a type
    * scores the same pu, so the per-doc mean Σpu/n over occurrences is
    * exactly Σ(c·pu)/Σc over types (same integer arithmetic).
    *
    * The model is a HASHED n-gram LM (the standard hashing trick for
    * at-scale LM features): bigram and unigram counts key on the
    * 60-bit portable hash of the token bytes (`h60(w1·0x1F·w2)`,
    * `h60(w1)`), NOT on the strings — both engines hash identically,
    * so collisions (≈ n²/2^61 — a handful of merged counts on a
    * trillion-type corpus) are part of the shared contract and results
    * stay bit-identical. Everything downstream of the one narrow
    * tokenize+hash projection is fixed-width longs: the two model
    * aggregations and the two scoring equi-joins shuffle 24-byte rows
    * on uniform long keys. (Round-6 joined on the raw strings — two
    * wide string-key joins, 7× the oracle and super-linear at 10×; a
    * round-7 window-sum variant kept strings and sorted them twice,
    * no better at 10×.) Documents with fewer than two tokens have no
    * bigrams and drop out (both engines). */
  def bigramScores(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      split(lower(col("text")), " ").as("ts"))
    // one narrow pass: per occurrence, hashed bigram + hashed-w1 keys
    val occ = toks.select(col("doc_id"), explode(expr(
      "zip_with(slice(ts, 1, size(ts)-1), slice(ts, 2, size(ts)-1)," +
        " (a, b) -> struct(a AS w1, b AS w2))")).as("bg"))
      .select(col("doc_id"),
        h60(concat(col("bg.w1"), lit("\u001f"), col("bg.w2"))).as("bh"),
        h60(col("bg.w1")).as("h1"))
      // localCheckpoint: occ feeds BOTH model aggregations and the
      // scoring probe -- unmaterialized, the tokenize+hash pass runs
      // once per consumer. Fixed-width longs, ~24 B/occurrence; same
      // lazy-materialize / no-cross-run-cache trade as x49.
      .localCheckpoint(eager = false)
    val cb = occ.groupBy("bh").agg(count(lit(1)).as("cb"))
    // the unigram (context) model: vocab-sized, BROADCAST back -- the
    // x36 argument (word vocabularies are megabytes at any corpus
    // scale), so the occurrence stream shuffles ONLY for the bh join
    // (whose exchange Spark reuses from cb's aggregation)
    val c1 = occ.groupBy("h1").agg(count(lit(1)).as("c1"))
    // smoothing vocabulary V = |distinct left contexts| -- derivable
    // from the c1 relation itself (one tiny agg over vocab rows)
    // instead of a THIRD full tokenize pass over the corpus
    val v = c1.agg(count(lit(1)).as("v"))
    occ.join(cb, "bh").join(broadcast(c1), "h1").crossJoin(broadcast(v))
      .select(col("doc_id"), expr("((cb + 1) * 1000000) DIV (c1 + v)").as("pu"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(pu) DIV count(*)").as("mean_p_u"))
  }

  def x45(s: SparkSession, d: String): DataFrame =
    bigramScores(Tables.documents(s, d))

  val x45Sql: String =
    s"""WITH w AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
      |occ AS (
      |  SELECT doc_id,
      |    ${duckH60("ws[i] || chr(31) || ws[i+1]")} AS bh,
      |    ${duckH60("ws[i]")} AS h1
      |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM w)),
      |cb AS (SELECT bh, count(*) AS cb FROM occ GROUP BY 1),
      |c1 AS (SELECT h1, count(*) AS c1 FROM occ GROUP BY 1),
      |v AS (SELECT count(*) AS v FROM c1),
      |p AS (SELECT doc_id, ((cb + 1) * 1000000) // (c1 + v) AS pu
      |  FROM occ JOIN cb USING (bh) JOIN c1 USING (h1) CROSS JOIN v)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  CAST(sum(pu) // count(*) AS BIGINT) AS mean_p_u
      |FROM p GROUP BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x45_bigram_lm" -> (x45 _),
    "x42_length_quartiles" -> (x42 _),
    "x08_lang_id" -> (x08 _),
    "x09_quality_score" -> (x09 _),
    "x10_token_count" -> (x10 _),
    "x11_fingerprint" -> (x11 _),
    "x21_repetition" -> (x21 _),
    "x22_tfidf_topk" -> (x22 _),
    "x32_quality_filter" -> (x32 _),
    "x36_unigram_score" -> (x36 _),
    "x38_redact_pii" -> (x38 _),
  )

  val oracleSql: Map[String, String] = Map(
    "x45_bigram_lm" -> x45Sql,
    "x42_length_quartiles" -> x42Sql,
    "x08_lang_id" -> x08Sql,
    "x09_quality_score" -> x09Sql,
    "x10_token_count" -> x10Sql,
    "x11_fingerprint" -> x11Sql,
    "x21_repetition" -> x21Sql,
    "x22_tfidf_topk" -> x22Sql,
    "x32_quality_filter" -> x32Sql,
    "x36_unigram_score" -> x36Sql,
    "x38_redact_pii" -> x38Sql,
  )
}
