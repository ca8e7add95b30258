package graft.operators

import graft.SparkSpec
import graft.functions.PortableHash
import org.apache.spark.sql.functions._

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replication of the documented contract. */
  private def reference(docs: Seq[(Long, String, Int)], frac: Double): Set[Long] = {
    val bySource = docs.groupBy(_._2).map { case (s, ds) =>
      s -> ds.map(_._3.toLong).sum }
    val ws = bySource.map { case (s, tok) =>
      s -> math.floor(math.sqrt(tok.toDouble) * 1e6).toLong }
    val t = bySource.values.sum
    val w = ws.values.sum
    docs.filter { case (id, s, _) =>
      val rate = math.min(1.0,
        (frac * (t.toDouble * ws(s).toDouble)) / (w.toDouble * bySource(s).toDouble))
      (PortableHash.h60(s"mix_$id") % 1048576L) < math.floor(rate * 1048576.0).toLong
    }.map(_._1).toSet
  }

  private def corpus(rows: Seq[(Long, String, Int)]) =
    rows.map { case (id, s, n) => (id, s, ("w " * n).trim) }
      .toDF("doc_id", "source", "text")

  test("admission matches the driver-side rate/coin contract exactly") {
    val rows = (1L to 300L).map(i =>
      (i, s"src${(i % 4).toInt}", (i % 29 + 1).toInt))
    val got = Sampling.mixtureSample(corpus(rows), 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(got == reference(rows, 0.5))
  }

  test("partitioning never changes the sample") {
    val rows = (1L to 200L).map(i => (i, s"src${(i % 3).toInt}", 10))
    val base = Sampling.mixtureSample(corpus(rows), 0.4)
      .select("doc_id").as[Long].collect().toSet
    val shuffled = Sampling.mixtureSample(corpus(rows).repartition(13), 0.4)
      .select("doc_id").as[Long].collect().toSet
    assert(shuffled == base)
  }

  test("temperature up-weights the small source above its natural share") {
    // big: 100 docs x 100 tokens; small: 20 docs x 10 tokens (2% of mass)
    val rows = (1L to 100L).map(i => (i, "big", 100)) ++
      (101L to 120L).map(i => (i, "small", 10))
    val got = Sampling.mixtureSample(corpus(rows), 0.3)
      .groupBy("source").agg(sum("toks").as("tok")).as[(String, Long)]
      .collect().toMap
    val naturalSmallShare = 200.0 / 10200.0
    val sampledSmallShare =
      got.getOrElse("small", 0L).toDouble / math.max(1L, got.values.sum)
    assert(sampledSmallShare > naturalSmallShare,
      s"sqrt temperature must up-weight the small source: $got")
  }

  test("a tiny source's rate caps at 1 (never over-samples)") {
    val rows = (1L to 100L).map(i => (i, "big", 50)) ++ Seq((999L, "tiny", 2))
    val got = Sampling.mixtureSample(corpus(rows), 0.9)
      .filter($"source" === "tiny").count()
    assert(got <= 1, "rate is capped: the tiny source cannot emit phantom rows")
  }
}
