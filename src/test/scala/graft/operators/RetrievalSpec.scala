package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  /** Driver-side BM25 (rational idf, no log — same variant as the
    * operator) for a hand-checkable corpus. */
  private def bm25(corpus: Seq[(Long, String)], terms: Seq[String]): Map[Long, Double] = {
    val toks = corpus.map { case (id, t) => id -> t.toLowerCase.split(" ").toSeq }
    val nd = toks.size
    val avgdl = toks.map(_._2.size).sum.toDouble / nd
    val dfs = terms.map(t => t -> toks.count(_._2.contains(t))).toMap
    toks.map { case (id, ws) =>
      val dl = ws.size
      id -> terms.map { t =>
        val tf = ws.count(_ == t).toDouble
        val idf = (nd - dfs(t) + 0.5) / (dfs(t) + 0.5)
        // same constant DERIVATION as the operator (k1+1, 1-b), so a
        // rendering change there is mirrored here
        idf * ((tf * (1.2 + 1.0)) / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / avgdl))))
      }.sum
    }.toMap
  }

  test("scores match a driver-side reference on a tiny corpus") {
    val corpus = Seq(
      1L -> "spark merge spark spark",
      2L -> "merge vector data data data data",
      3L -> "data table row",
      4L -> "vector vector vector spark")
    val got = Retrieval.bm25TopK(docs(corpus: _*), Seq("spark", "vector"), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = bm25(corpus, Seq("spark", "vector"))
    corpus.foreach { case (id, _) =>
      assert(got(id) == math.floor(want(id) * 1e6).toLong, s"doc $id")
    }
  }

  test("rarer term outranks common term at equal tf (idf ordering)") {
    // 'rare' in 1 of 8 docs, 'common' in 6 of 8; probe docs have one hit
    // each with identical length: rare-hit doc must score higher.
    val corpus = (1L to 6L).map(i => i -> "common x y z") ++
      Seq(7L -> "rare a b c", 8L -> "none u v w")
    val top = Retrieval.bm25TopK(docs(corpus: _*), Seq("common", "rare"), 8)
      .collect().map(_.getLong(0))
    assert(top.head == 7L)
  }

  test("tf saturation: 10x term repetition does not give 10x score") {
    val corpus = Seq(
      1L -> ("spark " * 10).trim,
      2L -> ("spark " + "pad " * 9).trim)
    val s = Retrieval.bm25TopK(docs(corpus: _*), Seq("spark"), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(1L) > s(2L))            // more hits still rank higher...
    assert(s(1L) < 4 * s(2L), s)     // ...but far from linearly (k1 saturation)
  }

  test("top-k is a deterministic set under score ties (doc_id break)") {
    val corpus = (1L to 20L).map(i => i -> "same text spark here")
    val top = Retrieval.bm25TopK(docs(corpus: _*), Seq("spark"), 5)
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("gate plan broadcasts the 1-row stats and uses a top-k sort") {
    val plan = Retrieval.x49(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.toLowerCase.contains("explode"))
  }
}
