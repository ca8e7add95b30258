package graft.operators

import graft.Tables
import graft.functions.{Cms, Hll, PortableHash}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregation — the cardinality arm of the
  * LLM-pipeline surface (alongside the Bloom decontamination probe in
  * [[Decontaminate]]). The reference's consumer keeps exact per-key
  * counters (phone_message_producer.py:207-233, the `messages` table);
  * at 100 TB an exact distinct over a high-cardinality key is an
  * expand+shuffle of every distinct value, so the engine needs the
  * sketch form as a first-class operator. See [[graft.functions.Hll]]
  * for the portability contract.
  */
object Sketches {

  // ---------------------------------------------------------------- x50
  /** Per-type approximate distinct users via the HLL sketch, next to the
    * exact count so the gate verifies BOTH the deterministic register
    * state (z_scaled, v_empty) and the final estimate against DuckDB
    * replaying the identical hash→register→estimator arithmetic.
    *
    * Fixture cardinalities make this a real branch test: 15 distinct
    * users/type at sf0.001 and 150 at sf0.01 exercise linear counting
    * (and the threshold boundary), 1500 at sf0.1 the raw-HLL branch.
    *
    * Plan shape: one partial agg (64-byte sketch state per type per
    * partition) + one exchange on event_type. The exact count rides the
    * same groupBy only for demo contrast — the sketch column is the one
    * that scales. */
  def x50(s: SparkSession, d: String): DataFrame =
    hllDistinct(Tables.events(s, d), col("user_id").cast("string"),
        groupCol = "event_type", withExact = true)
      .withColumnRenamed("approx_micro", "est_micro")

  /** Library entry: approximate-distinct of `key` per `groupCol`.
    * `key` must already be the canonical string form (the hash is over
    * its UTF-8 bytes). The default is sketch-only — the 64-byte-state
    * plan that motivates the operator; `withExact = true` adds the
    * exact `count(distinct)` column for calibration, at the cost of
    * the distinct expand+shuffle the sketch exists to avoid (the gate
    * uses it so the oracle verifies estimate against truth). */
  def hllDistinct(df: DataFrame, key: org.apache.spark.sql.Column,
      groupCol: String, withExact: Boolean = false): DataFrame = {
    val aggs =
      if (withExact) Seq(Hll.sketch(key).as("sk"),
        countDistinct(key).as("exact_cnt"))
      else Seq(Hll.sketch(key).as("sk"))
    val outs = Seq(
      col(groupCol),
      col("sk").getField("z_scaled").as("z_scaled"),
      col("sk").getField("v_empty").as("v_empty"),
      expr(Hll.estMicroSpark("sk.z_scaled", "sk.v_empty")).as("approx_micro")) ++
      (if (withExact) Seq(col("exact_cnt")) else Nil)
    df.groupBy(groupCol)
      .agg(aggs.head, aggs.tail: _*)
      .select(outs: _*)
  }

  val x50Sql: String =
    s"""WITH h AS (
       |  SELECT event_type, user_id,
       |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
       |  FROM events WHERE user_id IS NOT NULL),
       |r AS (
       |  SELECT event_type, hv % 64 AS j,
       |    max(CASE WHEN hv // 64 = 0 THEN 55
       |             ELSE 55 - length(bin(hv // 64)) END) AS mj
       |  FROM h GROUP BY 1, 2),
       |a AS (
       |  SELECT event_type,
       |    CAST(sum(1::BIGINT << (55 - mj))
       |         + (64 - count(*)) * (1::BIGINT << 55) AS BIGINT) AS z_scaled,
       |    CAST(64 - count(*) AS INT) AS v_empty
       |  FROM r GROUP BY 1),
       |e AS (
       |  SELECT event_type, count(DISTINCT CAST(user_id AS VARCHAR)) AS exact_cnt
       |  FROM events GROUP BY 1)
       |SELECT a.event_type, z_scaled, v_empty,
       |  ${Hll.estMicroDuck("z_scaled", "v_empty")} AS est_micro,
       |  exact_cnt
       |FROM a JOIN e ON a.event_type = e.event_type""".stripMargin

  // ---------------------------------------------------------------- x52
  /** Token-frequency point estimates from ONE count-min pass over the
    * corpus, next to the exact counts: probes span a corpus-top word,
    * mid-frequency words, and an absent word (whose estimate is pure
    * collision noise — still deterministic, still oracle-checked).
    *
    * Plan shape: explode is narrow (tokens never shuffle); the CMS agg
    * and the per-probe exact counts ride the SAME single pass, reducing
    * each partition to one 8 KiB state + a handful of longs; the final
    * exchange carries one such state per partition. The probe fan-out is
    * a stack() over the single result row. */
  def x52(s: SparkSession, d: String): DataFrame =
    cmsProbe(
      Tables.documents(s, d)
        .select(explode(split(lower(col("text")), " ")).as("t")),
      ProbeTerms)

  private val ProbeTerms =
    Seq("table", "spark", "vector", "customer", "window", "zzz_absent")

  /** Library entry: CMS point estimates + exact counts for `probes`
    * over a single string column `t` of tokens. */
  def cmsProbe(tokens: DataFrame, probes: Seq[String]): DataFrame = {
    require(probes.nonEmpty, "need at least one probe term")
    // probes are rendered into stack()/estimate expression text
    require(probes.forall(_.matches("[A-Za-z0-9_.-]+")),
      s"probe terms must be plain tokens, got: ${probes.mkString(", ")}")
    val aggs: Seq[org.apache.spark.sql.Column] =
      Cms.sketch(col("t")).as("cms") +:
        probes.zipWithIndex.map { case (p, i) =>
          // coalesce: a probe over an EMPTY token stream counts 0, not
          // SQL's NULL-sum (degenerate sweep; matches the CMS estimate)
          coalesce(sum(when(col("t") === p, 1L).otherwise(0L)), lit(0L))
            .as(s"exact$i")
        }
    val one = tokens.agg(aggs.head, aggs.tail: _*)
    val stack = probes.zipWithIndex.map { case (p, i) =>
      s"'$p', ${Cms.estimateSpark("cms", p)}, exact$i"
    }.mkString(s"stack(${probes.size}, ", ", ", ")")
    one.select(expr(s"$stack AS (term, est_cnt, exact_cnt)"))
  }

  val x52Sql: String = {
    val hv = PortableHash.duckH60("t")
    // Per-probe conditional cell counts replaying the JVM cell
    // arithmetic with literal cells, plus the exact count, in ONE pass.
    // coalesce: SUM over an empty token stream is NULL in SQL, but the
    // CMS estimate (and the exact count) of any probe over no data is 0
    // — the sketch semantic, pinned for the degenerate sweep
    val sums = ProbeTerms.zipWithIndex.flatMap { case (p, i) =>
      Cms.cells(p).zipWithIndex.map { case (c, row) =>
        s"CAST(coalesce(sum(CASE WHEN ${Cms.cellDuck("hv", row)} = $c THEN 1 ELSE 0 END), 0) AS BIGINT) AS cell${i}_$row"
      } :+ s"CAST(coalesce(sum(CASE WHEN t = '$p' THEN 1 ELSE 0 END), 0) AS BIGINT) AS exact$i"
    }.mkString(",\n    ")
    val rows = ProbeTerms.zipWithIndex.map { case (p, i) =>
      val est = (0 until Cms.Depth).map(r => s"cell${i}_$r").mkString("least(", ", ", ")")
      s"SELECT '$p' AS term, $est AS est_cnt, exact$i AS exact_cnt FROM agg"
    }.mkString("\nUNION ALL\n")
    s"""WITH tok AS (
       |  SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents),
       |h AS (SELECT t, $hv AS hv FROM tok),
       |agg AS (
       |  SELECT
       |    $sums
       |  FROM h)
       |$rows""".stripMargin
  }

  // ---------------------------------------------------------------- x59
  /** Per-language document-length quartiles from the BOTTOM-K SAMPLE
    * sketch ([[graft.functions.BottomKSample]]) — the deterministic,
    * merge-order-independent quantile sketch (the round-6 candidate:
    * GK/KLL compact lazily and are order-sensitive, so they can never
    * hash-match an oracle; a bottom-k set under the total order
    * (hash, value) is a pure function of the input multiset). The gate
    * verifies the SAMPLE ITSELF (size m) and the interpolated sample
    * quartiles against DuckDB reproducing the identical selection with
    * ORDER BY hk, v LIMIT k — wrong eviction, a lost pair in a merge,
    * or order-dependent state all change the sample and break the hash.
    * x42's exact quartiles are the accuracy oracle (spec-checked).
    *
    * Plan shape: ONE hash aggregation — each partition reduces to a
    * ≤16·k-byte heap per group before the exchange, so the shuffle
    * carries |groups|·k pairs no matter the corpus size (x42's exact
    * percentile gathers every group value to its reducer; this is the
    * escape hatch when a group outgrows one reducer, now with a
    * deterministic contract instead of percentile_approx's
    * order-sensitive one). Quartile interpolation runs on the k-row
    * sample array: exact binary-rational fractions, bit-identical
    * across engines (see x42's note). */
  private val QsK = 64

  def x59(s: SparkSession, d: String): DataFrame =
    sampleQuantiles(Tables.documents(s, d), groupCol = "lang",
      idCol = "doc_id", valueCol = "n_chars", k = QsK)

  /** The (sv, m)-relative quartile interpolation, rendered per engine:
    * h = (m-1)·p, q = sv[⌊h⌋+1] + (h−⌊h⌋)·(sv[⌊h⌋+2 ∧ m] − sv[⌊h⌋+1]). */
  private def qInterp(p: String, at: String => String): String = {
    val lo = s"CAST(floor((m - 1) * $p) AS INT)"
    val a = s"CAST(${at(s"$lo + 1")} AS DOUBLE)"
    val b = s"CAST(${at(s"least($lo + 2, m)")} AS DOUBLE)"
    s"($a + ((m - 1) * $p - floor((m - 1) * $p)) * ($b - $a))"
  }

  /** Library entry: sampled quantiles of `valueCol` per `groupCol`.
    * `idCol` seeds the deterministic sampling hash — any column unique
    * per row keeps the sample uniform. */
  def sampleQuantiles(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, k: Int = QsK): DataFrame = {
    import graft.functions.BottomK
    val hk = PortableHash.h60(concat(lit("qs_"), col(idCol).cast("string")))
    df.groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        BottomK.sample(hk, col(valueCol).cast("long"), k).as("vals"))
      .withColumn("sv", sort_array(col("vals")))
      .withColumn("m", size(col("sv")))
      .select(col(groupCol), col("n"), col("m"),
        expr(qInterp("0.25", i => s"element_at(sv, $i)")).as("p25"),
        expr(qInterp("0.5", i => s"element_at(sv, $i)")).as("p50"),
        expr(qInterp("0.75", i => s"element_at(sv, $i)")).as("p75"))
  }

  val x59Sql: String = {
    val hk = PortableHash.duckH60("concat('qs_', CAST(doc_id AS VARCHAR))")
    def at(i: String): String = s"sv[$i]"
    s"""WITH t AS (
       |  SELECT lang, CAST(n_chars AS BIGINT) AS v, $hk AS hk
       |  FROM documents),
       |g AS (SELECT lang, count(*) AS n FROM t GROUP BY lang),
       |r AS (SELECT lang, v,
       |    row_number() OVER (PARTITION BY lang ORDER BY hk, v) AS rn
       |  FROM t),
       |s AS (SELECT lang, list_sort(list(v)) AS sv
       |  FROM r WHERE rn <= $QsK GROUP BY lang),
       |q AS (SELECT lang, sv, CAST(len(sv) AS INT) AS m FROM s)
       |SELECT q.lang, n, m,
       |  ${qInterp("0.25", at)} AS p25,
       |  ${qInterp("0.5", at)} AS p50,
       |  ${qInterp("0.75", at)} AS p75
       |FROM q JOIN g ON q.lang = g.lang""".stripMargin
  }

  // ---------------------------------------------------------------- x60
  /** Sketch-table ROLLUP — the sketch-algebra pattern a 100 TB pipeline
    * actually runs: the raw stream is sketched ONCE into a stored
    * per-(fine-group) register table (|groups|·64 B), and every coarser
    * aggregation derives from `hll_union` over that table without ever
    * rescanning raw data. The gate exploits union associativity:
    * per-(event_type, user_id%16) registers rolled up to per-event_type
    * must be BIT-IDENTICAL to sketching event_type directly — so the
    * oracle is simply the direct x50 register arithmetic, and any
    * lossy/asymmetric union (or a registers/summary mismatch between
    * the two aggregates) breaks the row hash. */
  def x60(s: SparkSession, d: String): DataFrame =
    rollupSketches(
      sketchTable(Tables.events(s, d), col("user_id").cast("string"),
        Seq(col("event_type"), pmod(col("user_id"), lit(16)).as("sub"))),
      Seq("event_type"))

  /** Library entry: the storable sketch table — one 64-register array
    * per fine group. */
  def sketchTable(df: DataFrame, key: org.apache.spark.sql.Column,
      groupCols: Seq[org.apache.spark.sql.Column]): DataFrame =
    df.groupBy(groupCols: _*).agg(Hll.registers(key).as("registers"))

  /** Library entry: fold a sketch table to a coarser grouping —
    * (groupCols..., z_scaled, v_empty, est_micro). */
  def rollupSketches(table: DataFrame, groupCols: Seq[String]): DataFrame =
    table.groupBy(groupCols.map(col): _*)
      .agg(Hll.union(col("registers")).as("sk"))
      .select(groupCols.map(col) ++ Seq(
        col("sk").getField("z_scaled").as("z_scaled"),
        col("sk").getField("v_empty").as("v_empty"),
        expr(Hll.estMicroSpark("sk.z_scaled", "sk.v_empty"))
          .as("est_micro")): _*)

  val x60Sql: String =
    s"""WITH h AS (
       |  SELECT event_type,
       |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
       |  FROM events WHERE user_id IS NOT NULL),
       |r AS (
       |  SELECT event_type, hv % 64 AS j,
       |    max(CASE WHEN hv // 64 = 0 THEN 55
       |             ELSE 55 - length(bin(hv // 64)) END) AS mj
       |  FROM h GROUP BY 1, 2),
       |a AS (
       |  SELECT event_type,
       |    CAST(sum(1::BIGINT << (55 - mj))
       |         + (64 - count(*)) * (1::BIGINT << 55) AS BIGINT) AS z_scaled,
       |    CAST(64 - count(*) AS INT) AS v_empty
       |  FROM r GROUP BY 1)
       |SELECT event_type, z_scaled, v_empty,
       |  ${Hll.estMicroDuck("z_scaled", "v_empty")} AS est_micro
       |FROM a""".stripMargin

  // ---------------------------------------------------------------- x61
  /** CMS sketch-table rollup — the frequency companion of x60: counter
    * arrays form a commutative monoid under elementwise ADD, so a
    * stored per-(fine-group) CMS table folds to coarser groupings
    * without rescanning the token stream, bit-identically to sketching
    * the coarse group directly (the gated associativity property — the
    * oracle is the direct cell arithmetic over all tokens, exactly
    * x52's). Probe estimates come from the ROLLED-UP sketch. */
  def x61(s: SparkSession, d: String): DataFrame = {
    val tokens = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("t"))
    val fine = tokens
      .groupBy(pmod(col("doc_id"), lit(8)).as("sub"))
      .agg(Cms.sketch(col("t")).as("cms"))
    val rolled = fine.agg(Cms.union(col("cms")).as("cms"))
    val stack = ProbeTerms.map { p =>
      s"'$p', ${Cms.estimateSpark("cms", p)}"
    }.mkString(s"stack(${ProbeTerms.size}, ", ", ", ")")
    rolled.select(expr(s"$stack AS (term, est_cnt)"))
  }

  val x61Sql: String = {
    val hv = PortableHash.duckH60("t")
    // coalesce: see x52Sql — 0, not NULL, over an empty stream
    val sums = ProbeTerms.zipWithIndex.flatMap { case (p, i) =>
      Cms.cells(p).zipWithIndex.map { case (c, row) =>
        s"CAST(coalesce(sum(CASE WHEN ${Cms.cellDuck("hv", row)} = $c THEN 1 ELSE 0 END), 0) AS BIGINT) AS cell${i}_$row"
      }
    }.mkString(",\n    ")
    val rows = ProbeTerms.zipWithIndex.map { case (p, i) =>
      val est = (0 until Cms.Depth).map(r => s"cell${i}_$r").mkString("least(", ", ", ")")
      s"SELECT '$p' AS term, $est AS est_cnt FROM agg"
    }.mkString("\nUNION ALL\n")
    s"""WITH tok AS (
       |  SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents),
       |h AS (SELECT t, $hv AS hv FROM tok),
       |agg AS (
       |  SELECT
       |    $sums
       |  FROM h)
       |$rows""".stripMargin
  }

  // ---------------------------------------------------------------- x62
  /** Bottom-k sample-table rollup — the x60/x61 algebra applied to the
    * x59 quantile sketch, completing the sketch-ALGEBRA family: a
    * stored per-(fine-group) bottom-k PAIR table (`bottomk_pairs`,
    * 16·k B per group) folds to any coarser grouping via
    * `bottomk_union` without rescanning raw data. Sound because
    * bottom-k under the (hk, v) total order is a SELECTION: every
    * member of the coarse group's bottom-k is in its fine group's
    * bottom-k, so bottomk(∪ fine bottomk) ≡ bottomk(coarse) EXACTLY —
    * not approximately — and the gate compares the rolled-up pairs
    * bit-for-bit against the direct per-lang computation (the oracle
    * never sees the fine partition, so any union loss breaks the
    * hash). The fixture's per-lang group sizes exceed k while some
    * (lang, shard) fine groups fall below it — both the full-heap and
    * underfull branches are exercised. */
  def x62(s: SparkSession, d: String): DataFrame = {
    import graft.functions.BottomK
    val docs = Tables.documents(s, d)
    val hk = PortableHash.h60(
      concat(lit("qs_"), col("doc_id").cast("string")))
    val fine = docs
      .groupBy(col("lang"), pmod(col("doc_id"), lit(8)).as("shard"))
      .agg(BottomK.pairs(hk, col("n_chars").cast("long"), QsK).as("ps"))
    fine.groupBy("lang")
      .agg(BottomK.union(col("ps"), QsK).as("ps"))
      .select(col("lang"), posexplode(col("ps")).as(Seq("pos", "p")))
      .select(col("lang"), (col("pos") + 1).cast("long").as("rk"),
        col("p.hk").as("hk"), col("p.v").as("v"))
  }

  val x62Sql: String = {
    val hk = PortableHash.duckH60("concat('qs_', CAST(doc_id AS VARCHAR))")
    s"""WITH t AS (
       |  SELECT lang, CAST(n_chars AS BIGINT) AS v, $hk AS hk
       |  FROM documents),
       |r AS (SELECT lang, hk, v,
       |    row_number() OVER (PARTITION BY lang ORDER BY hk, v) AS rk
       |  FROM t)
       |SELECT lang, CAST(rk AS BIGINT) AS rk, hk, v FROM r
       |WHERE rk <= $QsK""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x50_hll_distinct" -> (x50 _),
    "x52_cms_heavy_hitters" -> (x52 _),
    "x59_sample_quantiles" -> (x59 _),
    "x60_sketch_rollup" -> (x60 _),
    "x61_cms_rollup" -> (x61 _),
    "x62_sample_rollup" -> (x62 _))

  val oracleSql: Map[String, String] = Map(
    "x50_hll_distinct" -> x50Sql,
    "x52_cms_heavy_hitters" -> x52Sql,
    "x59_sample_quantiles" -> x59Sql,
    "x60_sketch_rollup" -> x60Sql,
    "x61_cms_rollup" -> x61Sql,
    "x62_sample_rollup" -> x62Sql)
}
