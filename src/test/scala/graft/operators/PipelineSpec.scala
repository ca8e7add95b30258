package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  private lazy val docs = graft.Tables.documents(spark, sf)

  test("cleanCorpus drops exact-dup losers and keeps group minima") {
    val out = Pipeline.cleanCorpus(docs)
    val retained = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val groups = docs
      .select(col("doc_id"), md5(lower(col("text")).cast("binary")).as("h"))
      .collect().map(r => r.getString(1) -> r.getLong(0))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    groups.values.filter(_.size > 1).foreach { ids =>
      assert(retained.contains(ids.head) || // min survives unless a near-dup loser
        Dedup.nearDupWordPairs(docs).filter(col("b") === ids.head).count() > 0)
      ids.tail.foreach(id => assert(!retained.contains(id),
        s"exact-dup loser $id retained"))
    }
  }

  test("cleanCorpus retains no near-dup loser and annotates every survivor") {
    val out = Pipeline.cleanCorpus(docs).cache()
    val retained = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val losers = Dedup.nearDupWordPairs(docs)
      .select("b").collect().map(_.getLong(0)).toSet
    assert(retained.intersect(losers).isEmpty)
    assert(retained.nonEmpty && retained.size < docs.count())
    // annotations are complete: one row per survivor, no null columns
    assert(out.count() == retained.size)
    assert(out.filter(col("pred_lang").isNull || col("score_u").isNull ||
      col("ws_tokens").isNull).count() == 0)
    out.unpersist()
  }
}
