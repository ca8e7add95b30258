package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE-style tokenizer induction (Sennrich et al. ACL'16)
  * — the first merge rounds of training a subword vocabulary on a
  * corpus, the genuinely-distributed part of tokenizer training at
  * 100 TB. Round r: count adjacent symbol pairs over the word
  * dictionary (weighted by corpus word frequency), pick the most
  * frequent pair (cnt DESC, then lexicographic — a deterministic
  * tie-break), and re-tokenize every word by merging that pair
  * greedily left-to-right (leftmost non-overlapping occurrences, the
  * textbook semantics).
  *
  * Scale shape — the real BPE trainer's: ONE pass over the corpus
  * builds the word-frequency dictionary (explode + map-side-combined
  * count, the only corpus-sized stage); every merge round then runs on
  * the |vocab|-row dict — a pair explode bounded by Σ|word|, an
  * aggregation to the pair space, a 1-row winner attach (the x36/x45
  * sanctioned broadcast), and a per-row array fold for the merge. At
  * 100 TB the dict is ~10⁶ rows regardless of corpus size, so rounds
  * are fixed-cost; each round's dict is lazily checkpointed so plans
  * stay flat in the round count (the Propagate discipline).
  *
  * Merge-equivalence note (why the two engines agree bit-for-bit):
  * Spark re-tokenizes with a greedy left FOLD (aggregate() carrying a
  * pending symbol); the oracle uses gaps-and-islands — match
  * positions i (a[i]=p ∧ a[i+1]=q) form islands of consecutive
  * integers, and greedy leftmost non-overlap selects exactly the
  * EVEN-OFFSET positions within each island (the fold consumes i and
  * i+1 on a merge, so within an island every other match survives;
  * across a gap the scan is fresh). BpeSpec pins the equivalence on
  * the adversarial shapes (same-symbol runs, alternating pairs,
  * shared-boundary occurrences).
  */
object Bpe {

  /** Unrolled merge rounds. */
  private val Rounds = 3
  /** Final symbol-inventory rows gated. */
  private val TopN = 40

  /** One greedy left-to-right merge of pair (`p`,`q`) over symbol
    * array column `a` — the textbook single BPE merge, as a Catalyst
    * fold (no UDF): the accumulator carries the emitted prefix and a
    * pending symbol; a (pend=p, next=q) hit emits the merged symbol
    * and clears the pending slot so an overlapping occurrence cannot
    * double-consume. Built in the Column DSL with the winner pair as
    * `lit` values — no SQL-text interpolation, so any corpus byte
    * (quotes, backslashes) round-trips regardless of the session's
    * parser/escaping configuration. */
  private def mergeFold(a: Column, p: Column, q: Column): Column = {
    val nullStr = lit(null).cast("string")
    def st(out: Column, pend: Column) =
      struct(out.as("out"), pend.as("pend"))
    aggregate(
      a,
      st(array().cast("array<string>"), nullStr),
      (s, x) =>
        when(s.getField("pend").isNull, st(s.getField("out"), x))
          .when(s.getField("pend") === p && x === q,
            st(concat(s.getField("out"), array(concat(p, q))), nullStr))
          .otherwise(
            st(concat(s.getField("out"), array(s.getField("pend"))), x)),
      s =>
        when(s.getField("pend").isNull, s.getField("out"))
          .otherwise(concat(s.getField("out"), array(s.getField("pend")))))
  }

  /** Adjacent-pair frequency over the current dict (f-weighted). */
  private def pairCounts(dict: DataFrame): DataFrame = dict
    .filter(size(col("a")) >= 2)
    // sequence(1, n) is DESCENDING when n < 1, hence the guard above
    .select(col("f"), explode(expr(
      "transform(sequence(1, size(a) - 1)," +
        " i -> struct(element_at(a, i) AS p, element_at(a, i + 1) AS q))"))
      .as("pq"))
    .groupBy(col("pq.p").as("p"), col("pq.q").as("q"))
    .agg(sum(col("f")).as("cnt"))

  /** Library entry: run `rounds` BPE merges over any (text) relation;
    * returns (merges, finalDict) — the per-round winning pairs with
    * their counts, and the re-tokenized word dictionary (w, f, a):
    * the word, its corpus frequency, and its symbol segmentation —
    * i.e. the TRAINED TOKENIZER, applied to a corpus by an equi-join
    * on w (x73).
    *
    * EAGER-EXECUTION CONTRACT: each round collect()s its ≤1-row winner
    * (the driver-held-model discipline), so CALLING this method runs
    * `rounds` Spark jobs immediately — it does not return a lazy plan
    * to construct speculatively. Build it only when you intend to
    * train; the returned relations are then lazy as usual. */
  def bpeTrain(docs: DataFrame, rounds: Int = Rounds)
      : (Seq[DataFrame], DataFrame) = {
    var dict = docs.filter(col("text").isNotNull)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .select(col("w"), col("f"),
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
          .as("a"))
      .localCheckpoint(eager = false)
    val s = docs.sparkSession
    val winSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("q",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("cnt",
        org.apache.spark.sql.types.LongType, nullable = true)))
    val merges = (1 to rounds).map { _ =>
      // The winner is the round's MODEL: ≤1 row under a total order
      // (cnt desc, p, q), held on the driver and folded back in as
      // string LITERALS — the x12/x70 driver-held-model discipline.
      // This replaces the former 1-row broadcast-left-join attach: the
      // results are identical (BpeSpec pins them), but each round now
      // costs one TakeOrdered job instead of a broadcast exchange +
      // join stage, which at 8 rounds (x71) halved the query.
      val winRows = pairCounts(dict)
        .orderBy(col("cnt").desc, col("p"), col("q")).limit(1)
        .collect()
      // A round with no adjacent pair anywhere (rounds > available
      // merges — every word a single symbol) yields an EMPTY winner:
      // the dict passes through unchanged, exactly the oracle's
      // NULL-scalar-subquery behavior.
      winRows.headOption.foreach { r =>
        dict = dict
          .select(col("w"), col("f"),
            mergeFold(col("a"), lit(r.getString(0)), lit(r.getString(1)))
              .as("a"))
          .localCheckpoint(eager = false)
      }
      s.createDataFrame(java.util.Arrays.asList(winRows: _*), winSchema)
    }
    (merges, dict)
  }

  // ---------------------------------------------------------------- x66
  /** Gate relation for an N-round training run: the N merge decisions
    * plus the resulting top-`TopN` symbol inventory (f-weighted), one
    * (item, cnt) relation — a drifted merge in ANY round changes both
    * its own `m<r>:` row and the downstream inventory, so the whole
    * chain is pinned by one hash. */
  private def gateDf(s: SparkSession, d: String, rounds: Int): DataFrame = {
    val (merges, dict) = bpeTrain(Tables.documents(s, d), rounds)
    val mergeRows = merges.zipWithIndex.map { case (win, i) =>
      win.select(
        concat(lit(s"m${i + 1}:"), col("p"), lit("+"), col("q")).as("item"),
        col("cnt"))
    }.reduce(_ unionByName _)
    val inv = dict
      .select(col("f"), explode(col("a")).as("sym"))
      .groupBy("sym").agg(sum(col("f")).as("cnt"))
      .orderBy(col("cnt").desc, col("sym"))
      .limit(TopN)
      .select(concat(lit("s:"), col("sym")).as("item"), col("cnt"))
    mergeRows.unionByName(inv)
  }

  /** x66 — the canonical 3-round gate. */
  def x66(s: SparkSession, d: String): DataFrame = gateDf(s, d, Rounds)

  // ---------------------------------------------------------------- x71
  /** Deeper merge schedule for x71 — enough rounds that later winners
    * are themselves products of earlier merges (multi-character
    * symbols merging with each other), the regime a real tokenizer
    * spends almost all its training in. */
  private val DeepRounds = 8

  /** x71 — the same chain-gate at [[DeepRounds]] rounds: proves the
    * merge loop is stable when iterated (each round's winner hash is
    * folded into the gate), where a real tokenizer runs thousands of
    * merges. Per-round cost is fixed (|vocab|-row dict), so the round
    * count is a pure loop-stability axis, not a scale axis. */
  def x71(s: SparkSession, d: String): DataFrame = gateDf(s, d, DeepRounds)

  // ---------------------------------------------------------------- x73
  /** Library entry: APPLY a trained segmentation dict (w, f, a) to a
    * (doc_id, text) corpus — per-document word and token counts under
    * the learned merges, the statistic a token-budgeted training
    * pipeline actually keys on (x10's whitespace/regex count is the
    * pre-tokenizer approximation). One equi-join of the corpus word
    * relation against the |vocab|-row dict on the (uniform) word key —
    * at 100 TB the dict is ~10⁶ rows regardless of corpus size, so the
    * join broadcasts or hash-shuffles cheaply while the corpus streams
    * through once; no per-row re-segmentation, because BPE merges are
    * a pure function of the word. */
  def bpeEncodeCounts(docs: DataFrame, dict: DataFrame): DataFrame = {
    val words = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
    words.join(dict.select(col("w"), size(col("a")).as("n_tok")), "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_tok")).as("n_tokens"))
  }

  /** x73 — the corpus tokenized by its own [[Rounds]]-merge tokenizer:
    * (doc_id, n_words, n_tokens). A drifted merge in ANY round changes
    * some word's segmentation length and fails the hash. */
  def x73(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val (_, dict) = bpeTrain(docs, Rounds)
    bpeEncodeCounts(docs, dict)
  }

  /** One oracle merge round: pc → win → match positions → islands →
    * even-offset selection → rebuild (see the equivalence note).
    * `pos` and the rebuilt dict are MATERIALIZED: each round references
    * its predecessor more than once, so default CTE inlining re-derives
    * the whole prefix per reference — exponential in the round count
    * (x71's 8 rounds exhausted file handles re-scanning the base
    * parquet 2^8 times before materialization). */
  private def roundSql(prev: String, r: Int): String =
    s"""pc$r AS (
       |  SELECT a[i] AS p, a[i + 1] AS q, CAST(sum(f) AS BIGINT) AS cnt
       |  FROM (SELECT f, a, unnest(range(1, len(a))) AS i
       |        FROM $prev WHERE len(a) >= 2)
       |  GROUP BY 1, 2),
       |win$r AS (SELECT p, q, cnt FROM pc$r ORDER BY cnt DESC, p, q LIMIT 1),
       |pos$r AS MATERIALIZED (
       |  SELECT w, f, a, i, a[i] AS sym,
       |    (i < len(a) AND a[i] = (SELECT p FROM win$r)
       |                AND a[i + 1] = (SELECT q FROM win$r)) AS m
       |  FROM (SELECT w, f, a, unnest(range(1, len(a) + 1)) AS i FROM $prev)),
       |mm$r AS (
       |  SELECT w, i, i - row_number() OVER (PARTITION BY w ORDER BY i) AS isl
       |  FROM pos$r WHERE m),
       |sel$r AS (
       |  SELECT w, i FROM (
       |    SELECT w, i, i - min(i) OVER (PARTITION BY w, isl) AS off FROM mm$r)
       |  WHERE off % 2 = 0),
       |a$r AS MATERIALIZED (
       |  SELECT p.w, p.f,
       |    list(CASE WHEN s.i IS NOT NULL THEN p.a[p.i] || p.a[p.i + 1]
       |              ELSE p.sym END ORDER BY p.i) AS a
       |  FROM pos$r p
       |  LEFT JOIN sel$r s  ON s.w = p.w AND s.i = p.i
       |  LEFT JOIN sel$r s2 ON s2.w = p.w AND s2.i = p.i - 1
       |  WHERE s2.i IS NULL
       |  GROUP BY p.w, p.f)""".stripMargin

  /** Oracle CTE chain through the trained dict relation `a<nRounds>`
    * (w, f, a) — shared by the chain gates and the x73 encode. */
  private def dictSql(nRounds: Int): String = {
    val rounds = (1 to nRounds).map(r => roundSql(s"a${r - 1}", r))
      .mkString(",\n")
    s"""WITH w0 AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS f FROM (
       |    SELECT unnest(string_split(lower(text), ' ')) AS w
       |    FROM documents WHERE text IS NOT NULL)
       |  WHERE len(w) > 0 GROUP BY w),
       |a0 AS (
       |  SELECT w, f,
       |    list_transform(range(1, len(w) + 1), i -> substring(w, i, 1)) AS a
       |  FROM w0),
       |$rounds""".stripMargin
  }

  private def gateSql(nRounds: Int): String = {
    val mergeSelects = (1 to nRounds).map(r =>
      s"SELECT 'm$r:' || p || '+' || q AS item, cnt FROM win$r")
      .mkString("\n  UNION ALL ")
    s"""${dictSql(nRounds)},
       |inv AS (
       |  SELECT 's:' || sym AS item, CAST(sum(f) AS BIGINT) AS cnt FROM (
       |    SELECT f, unnest(a) AS sym FROM a$nRounds)
       |  GROUP BY sym ORDER BY sum(f) DESC, sym LIMIT $TopN)
       |SELECT item, cnt FROM (
       |  $mergeSelects
       |  UNION ALL SELECT item, cnt FROM inv)""".stripMargin
  }

  val x66Sql: String = gateSql(Rounds)
  val x71Sql: String = gateSql(DeepRounds)

  /** x73 oracle: the shared dict chain, then one corpus-word join —
    * token count per word = its segmentation length. */
  val x73Sql: String =
    s"""${dictSql(Rounds)}
       |SELECT doc_id,
       |  count(*) AS n_words,
       |  CAST(sum(len(a)) AS BIGINT) AS n_tokens
       |FROM (
       |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
       |  FROM documents WHERE text IS NOT NULL) dw
       |JOIN a$Rounds USING (w)
       |WHERE len(w) > 0
       |GROUP BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x66_bpe_merges" -> (x66 _),
    "x71_bpe_deep" -> (x71 _),
    "x73_bpe_encode" -> (x73 _))

  val oracleSql: Map[String, String] = Map(
    "x66_bpe_merges" -> x66Sql,
    "x71_bpe_deep" -> x71Sql,
    "x73_bpe_encode" -> x73Sql)
}
