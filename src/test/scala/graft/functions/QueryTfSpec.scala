package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins query_tf's exact parity with the composed split+filter
  * pipeline it replaces (dl and per-term tf, including split()'s
  * empty-token edge semantics) and null pass-through. */
class QueryTfSpec extends SparkSpec {

  private val terms = Seq("the", "cat", "zz")

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "The cat the CAT sat"),
      (2L, "a b a"),
      (3L, ""),
      (4L, " the  the ")
    ).toDF("doc_id", "text")
  }

  private def viaExpr =
    docs.select(col("doc_id"), QueryTf(col("text"), terms).as("q"))
      .select(col("doc_id"), col("q.*"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4))).toSet

  private def viaComposed =
    docs.select(col("doc_id"), split(lower(col("text")), " ").as("w"))
      .select(col("doc_id"), size(col("w")).as("dl"),
        expr("size(filter(w, x -> x = 'the'))").as("tf1"),
        expr("size(filter(w, x -> x = 'cat'))").as("tf2"),
        expr("size(filter(w, x -> x = 'zz'))").as("tf3"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4))).toSet

  test("query_tf equals the composed split+filter projection") {
    val e = viaExpr
    assert(e == viaComposed)
    assert(e.contains((1L, 5, 2, 2, 0)))
    assert(e.contains((2L, 3, 0, 0, 0)))
    assert(e.contains((3L, 1, 0, 0, 0)))   // split('') -> ['']
    assert(e.contains((4L, 5, 2, 0, 0)))   // empty tokens count in dl
  }

  test("null text projects null (filtered upstream by bm25TopK)") {
    import spark.implicits._
    val d = Seq((1L, Option("the")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = d.select(QueryTf(col("text"), terms).as("q"))
      .filter(col("q").isNull).count()
    assert(got == 1L)
  }
}
