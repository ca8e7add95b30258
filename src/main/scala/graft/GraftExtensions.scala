package graft

import graft.functions.{BigramStats, CmsSketch, DotProduct, HllSketch, Md5Prefix60, SortedIntersectSize, TermCounts}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's custom Catalyst expressions as
  * SQL functions, so the full SQL-expressible surface is reachable from
  * `spark.sql(...)` as well as the Column API:
  *
  *   spark.sql("SELECT dot_product(a.embedding, b.embedding) ...")
  *
  * Registered (15): dot_product, sorted_intersect_size, md5_prefix60,
  * bigram_stats, term_counts, hll_sketch, hll_registers, hll_union,
  * cms_sketch, cms_union, topk_rows, bottomk_sample, bottomk_pairs,
  * bottomk_union, bounded_set. Deliberately NOT registered: the
  * model-parameterized expressions (PqEncode, PqAdcScore,
  * CentroidTopCids, BloomMightContainLong, QueryTf, ShingleSig) — each
  * closes over a driver-built model/config object that has no SQL
  * literal form; they stay Column-API-only by design.
  *
  * Enable with
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * or programmatically via [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  private[graft] val registrations
      : Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("dot_product",
      info("dot_product",
        "dot_product(a, b) - double dot product of two float/double arrays"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("sorted_intersect_size",
      info("sorted_intersect_size",
        "sorted_intersect_size(a, b) - |a ∩ b| for sorted distinct bigint arrays"),
      (es: Seq[Expression]) => SortedIntersectSize(es(0), es(1))),
    ("md5_prefix60",
      info("md5_prefix60",
        "md5_prefix60(bin) - first 60 bits of md5 as bigint (the engine's portable hash)"),
      (es: Seq[Expression]) => Md5Prefix60(es(0))),
    ("bigram_stats",
      info("bigram_stats",
        "bigram_stats(str) - struct(n_bigrams, n_distinct, top_cnt) of " +
          "adjacent lowercase word pairs in one compiled pass (NULL for " +
          "<2-word documents)"),
      (es: Seq[Expression]) => BigramStats(es(0))),
    ("term_counts",
      info("term_counts",
        "term_counts(str) - array<struct(term, tf, th)> per-document " +
          "term frequencies with md5-prefix60 term hashes in one " +
          "compiled pass"),
      (es: Seq[Expression]) => TermCounts(es(0))),
    ("hll_sketch",
      info("hll_sketch",
        "hll_sketch(str) - aggregate: portable 64-register HyperLogLog state " +
          "as struct(z_scaled, v_empty)"),
      (es: Seq[Expression]) => HllSketch(es(0)).toAggregateExpression()),
    ("cms_sketch",
      info("cms_sketch",
        "cms_sketch(str) - aggregate: portable 4x256 count-min counters as array<bigint>"),
      (es: Seq[Expression]) => CmsSketch(es(0)).toAggregateExpression()),
    ("cms_union",
      info("cms_union",
        "cms_union(array<bigint>) - aggregate: fold stored count-min " +
          "counter arrays (elementwise add) without rescanning tokens"),
      (es: Seq[Expression]) =>
        graft.functions.CmsUnion(es(0)).toAggregateExpression()),
    ("hll_registers",
      info("hll_registers",
        "hll_registers(str) - aggregate: the raw 64-register HLL array " +
          "(the storable sketch-table form consumed by hll_union)"),
      (es: Seq[Expression]) =>
        HllSketch(es(0), emitRegisters = true).toAggregateExpression()),
    ("hll_union",
      info("hll_union",
        "hll_union(array<int>) - aggregate: fold stored HLL register " +
          "arrays to struct(z_scaled, v_empty) without rescanning raw data"),
      (es: Seq[Expression]) =>
        graft.functions.HllUnion(es(0)).toAggregateExpression()),
    ("topk_rows",
      info("topk_rows",
        "topk_rows(struct, k) - aggregate: the k lexicographically-" +
          "smallest structs per group, ascending (bounded heap - " +
          "replaces row_number()<=k windows without the per-group sort)"),
      (es: Seq[Expression]) => {
        val k = es(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
            if v != null => v.asInstanceOf[Number].intValue()
          case other => throw new IllegalArgumentException(
            s"topk_rows k must be an integer literal, got $other")
        }
        graft.functions.TopKRows(es(0), k).toAggregateExpression()
      }),
    ("bottomk_sample",
      info("bottomk_sample",
        "bottomk_sample(hk, v, k) - aggregate: values of the k rows with " +
          "smallest (hk, v) - deterministic merge-order-independent sample"),
      (es: Seq[Expression]) => {
        val k = es(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
            if v != null => v.asInstanceOf[Number].intValue()
          case other => throw new IllegalArgumentException(
            s"bottomk_sample k must be an integer literal, got $other")
        }
        graft.functions.BottomKSample(es(0), es(1), k).toAggregateExpression()
      }),
    ("bottomk_pairs",
      info("bottomk_pairs",
        "bottomk_pairs(hk, v, k) - aggregate: the k smallest (hk, v) " +
          "pairs as array<struct> (the storable sample-table form " +
          "consumed by bottomk_union)"),
      (es: Seq[Expression]) => {
        val k = es(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
            if v != null => v.asInstanceOf[Number].intValue()
          case other => throw new IllegalArgumentException(
            s"bottomk_pairs k must be an integer literal, got $other")
        }
        graft.functions.BottomKSample(es(0), es(1), k, emitPairs = true)
          .toAggregateExpression()
      }),
    ("bounded_set",
      info("bounded_set",
        "bounded_set(bigint, cap) - aggregate: the group's distinct " +
          "values as a sorted array when there are at most cap of them, " +
          "NULL past the cap (state <= cap+1 longs per group - the " +
          "document-frequency-cap shape: over-cap groups are dropped " +
          "without their contents ever existing)"),
      (es: Seq[Expression]) => {
        val cap = es(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
            if v != null => v.asInstanceOf[Number].intValue()
          case other => throw new IllegalArgumentException(
            s"bounded_set cap must be an integer literal, got $other")
        }
        graft.functions.BoundedLongSet(es(0), cap).toAggregateExpression()
      }),
    ("bottomk_union",
      info("bottomk_union",
        "bottomk_union(pairs, k) - aggregate: fold stored bottom-k pair " +
          "arrays to a coarser grouping (exact - bottom-k is a " +
          "selection) without rescanning raw data"),
      (es: Seq[Expression]) => {
        val k = es(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
            if v != null => v.asInstanceOf[Number].intValue()
          case other => throw new IllegalArgumentException(
            s"bottomk_union k must be an integer literal, got $other")
        }
        graft.functions.BottomKUnion(es(0), k).toAggregateExpression()
      }),
  )

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (name, i, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), i, builder)
    }
}
