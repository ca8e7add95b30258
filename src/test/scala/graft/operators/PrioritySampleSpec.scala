package graft.operators

import graft.SparkSpec
import graft.functions.PortableHash
import org.apache.spark.sql.functions._

class PrioritySampleSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, Long)]) =
    rows.toDF("doc_id", "source", "n_chars")

  /** JVM replay of the DLT scheme for one source's (id, w) rows. */
  private def replay(rows: Seq[(Long, Long)], k: Int = 8): Seq[(Long, Long, Long, Long)] = {
    val pri = rows.map { case (id, w) =>
      val u = (PortableHash.h60(s"pri_$id") + 1).toDouble
      (id, w, w.toDouble / u)
    }.sortBy { case (id, _, p) => (-p, id) }
    val tau = if (pri.size >= k + 1) pri(k)._3 else 0.0
    pri.take(k).zipWithIndex.map { case ((id, w, _), i) =>
      (i + 1L, id, w, math.floor(math.max(w.toDouble, tau) * 1000000).toLong)
    }
  }

  test("matches the JVM replay, large and small strata") {
    val big = (1L to 40L).map(i => (i, "a", 50 + i * 7))
    val small = (100L to 103L).map(i => (i, "b", 10 + i))
    val out = Sampling.prioritySample(
        docs(big ++ small), "source", "doc_id", "n_chars")
      .select($"source", $"rk", $"doc_id", $"w", $"est_u")
      .as[(String, Long, Long, Long, Long)].collect()
    val bySrc = out.groupBy(_._1)
    assert(bySrc("a").map(t => (t._2, t._3, t._4, t._5)).sortBy(_._1).toSeq ==
      replay(big.map(t => (t._1, t._3))))
    assert(bySrc("b").map(t => (t._2, t._3, t._4, t._5)).sortBy(_._1).toSeq ==
      replay(small.map(t => (t._1, t._3))))
  }

  test("stratum with n <= k: every row sampled, estimator exact (tau=0)") {
    val rows = (1L to 5L).map(i => (i, "s", i * 100))
    val out = Sampling.prioritySample(docs(rows), "source", "doc_id", "n_chars")
      .select($"doc_id", $"w", $"est_u").as[(Long, Long, Long)].collect().toSet
    assert(out == rows.map { case (id, _, w) => (id, w, w * 1000000L) }.toSet)
  }

  test("estimator floor: each sampled row's est_u >= w in micro-units") {
    val rows = (1L to 30L).map(i => (i, "s", 1 + (i % 7)))
    val bad = Sampling.prioritySample(docs(rows), "source", "doc_id", "n_chars")
      .filter($"est_u" < $"w" * 1000000L).count()
    assert(bad == 0, "max(w, tau) can never fall below w")
  }
}
