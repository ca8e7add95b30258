package graft.functions

import graft.SparkSpec
import graft.functions.PortableHash._
import org.apache.spark.sql.functions._

/** Contracts of the codegen'd per-document term-count kernel: exact
  * equality with the composed `explode(split(lower(text))) → groupBy`
  * pipeline (tokens, counts, hashes), Spark split() edge semantics
  * (empty string, trailing separators), null pass-through, and h60
  * parity with the portable md5-prefix hash. */
class TermCountsSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "The cat the CAT sat"),
      (2L, "a b a b a"),
      (3L, ""),              // split('', ' ') -> ['']
      (4L, " x  y "),        // leading/trailing/double spaces -> '' tokens
      (5L, "unique")
    ).toDF("doc_id", "text")
  }

  private def viaExpr: Set[(Long, String, Long, Long)] =
    docs.select(col("doc_id"), explode(TermCounts(col("text"))).as("r"))
      .select(col("doc_id"), col("r.term"), col("r.tf"), col("r.th"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

  private def viaComposed: Set[(Long, String, Long, Long)] =
    docs.select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .select(col("doc_id"), col("term"), col("tf"),
        h60(col("term")).as("th"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("term_counts equals the composed explode+groupBy pipeline") {
    val e = viaExpr
    assert(e == viaComposed)
    assert(e.nonEmpty)
    // spot checks: case folding, multiplicity, empty-token handling
    assert(e.contains((1L, "the", 2L, h60("the"))))
    assert(e.contains((1L, "cat", 2L, h60("cat"))))
    assert(e.contains((2L, "a", 3L, h60("a"))))
    assert(e.contains((3L, "", 1L, h60(""))))
    // " x  y " splits to ["", "x", "", "y", ""] — three empty tokens
    assert(e.contains((4L, "", 3L, h60(""))))
  }

  test("null text yields no rows (explode of null)") {
    import spark.implicits._
    val d = Seq((1L, Option("a b")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = d.select(col("doc_id"), explode(TermCounts(col("text"))))
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }

  test("kernel agrees between codegen and interpreted eval paths") {
    // interpreted path: eval the expression directly
    val expr = TermCounts(
      org.apache.spark.sql.catalyst.expressions.Literal("b a b"))
    val arr = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(arr.numElements() == 2)
    val r0 = arr.getStruct(0, 3)
    assert(r0.getUTF8String(0).toString == "b" && r0.getLong(1) == 2L &&
      r0.getLong(2) == h60("b"))
    val r1 = arr.getStruct(1, 3)
    assert(r1.getUTF8String(0).toString == "a" && r1.getLong(1) == 1L &&
      r1.getLong(2) == h60("a"))
  }
}
