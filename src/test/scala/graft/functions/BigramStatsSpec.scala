package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts of the codegen'd per-document bigram-stats kernel (x21):
  * exact equality with the composed explode(bigrams) → groupBy(doc, b)
  * → groupBy(doc) pipeline, <2-word NULL semantics (matching the
  * composed form's empty-array drop), Spark split() edge cases
  * (empty/whitespace-heavy text), and codegen/interpreted agreement. */
class BigramStatsSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "The cat the CAT sat"),      // case folding; repeated bigram
      (2L, "a b a b a"),                // dominant bigram "a b" x2, "b a" x2
      (3L, ""),                         // one '' token -> no bigrams
      (4L, " x  y "),                   // '' tokens participate in bigrams
      (5L, "unique"),                   // one word -> no bigrams
      (6L, "z z z z z z")               // single distinct bigram
    ).toDF("doc_id", "text")
  }

  private def viaExpr: Set[(Long, Long, Long, Long)] =
    docs.select(col("doc_id"), BigramStats(col("text")).as("st"))
      .filter(col("st").isNotNull)
      .select(col("doc_id"), col("st.n_bigrams"), col("st.n_distinct"),
        col("st.top_cnt"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  private def viaComposed: Set[(Long, Long, Long, Long)] =
    docs.select(col("doc_id"),
        split(lower(col("text")), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(w) >= 2
          |  THEN transform(sequence(1, size(w)-1),
          |         i -> concat(element_at(w, i), ' ', element_at(w, i+1)))
          |  ELSE CAST(array() AS array<string>) END""".stripMargin)).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum(col("c")).as("n_bigrams"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_cnt"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("bigram_stats equals the composed explode+groupBy pipeline") {
    val e = viaExpr
    assert(e == viaComposed)
    // docs 3 and 5 have <2 words: absent from both forms
    assert(e.map(_._1) == Set(1L, 2L, 4L, 6L))
    // doc 1: lower -> "the cat the cat sat", bigrams: "the cat" x2,
    // "cat the" x1, "cat sat" x1 -> (4, 3, 2)
    assert(e.contains((1L, 4L, 3L, 2L)))
    // doc 2: "a b" x2, "b a" x2 -> (4, 2, 2)
    assert(e.contains((2L, 4L, 2L, 2L)))
    // doc 6: "z z" x5 -> (5, 1, 5)
    assert(e.contains((6L, 5L, 1L, 5L)))
  }

  test("null text and <2-word docs yield NULL (null-filtered upstream)") {
    import spark.implicits._
    val d = Seq((1L, Option("a b")), (2L, Option.empty[String]),
      (3L, Option("solo"))).toDF("doc_id", "text")
    val got = d.select(col("doc_id"), BigramStats(col("text")).as("st"))
      .filter(col("st").isNotNull).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }

  test("kernel agrees between codegen and interpreted eval paths") {
    val e = BigramStats(
      org.apache.spark.sql.catalyst.expressions.Literal("a b a b a"))
    val row = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(row.getLong(0) == 4L && row.getLong(1) == 2L && row.getLong(2) == 2L)
    val none = BigramStats(
      org.apache.spark.sql.catalyst.expressions.Literal("solo"))
    assert(none.eval(null) == null)
  }

  test("x21 over the fixture matches the former composed formulation") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d)
    val kernel = graft.operators.TextOps.x21(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val composed = docs
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(w) >= 2
          |  THEN transform(sequence(1, size(w)-1),
          |         i -> concat(element_at(w, i), ' ', element_at(w, i+1)))
          |  ELSE CAST(array() AS array<string>) END""".stripMargin)).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum(col("c")).as("n_bigrams"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_cnt"))
      .select(col("doc_id"), col("n_bigrams"), col("n_distinct"),
        floor((lit(1.0) - col("n_distinct") / col("n_bigrams").cast("double"))
          * 1000000).cast("long").as("dup_frac_u"),
        floor(col("top_cnt") / col("n_bigrams").cast("double") * 1000000)
          .cast("long").as("top_frac_u"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(kernel == composed)
    assert(kernel.nonEmpty)
  }
}
