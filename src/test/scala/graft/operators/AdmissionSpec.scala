package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** s17 streaming near-dup admission: the micro-batched pipeline must
  * reproduce the batch-computed lexicographic-predecessor gate exactly
  * — same signatures, same banding, same Jaccard threshold, and state
  * reads confined to strictly-earlier batches. The twin here is
  * computed independently (full pair relation + driver-side predecessor
  * count), so any drift in the streaming state machinery (a state read
  * leaking into the current batch, a missed same-batch predecessor, a
  * batch-assignment change in the replay split) fails the comparison.
  */
class AdmissionSpec extends SparkSpec {

  test("s17 streaming admission matches the batch lexicographic-predecessor gate") {
    val out = StreamingQueries.queries("s17_stream_admission")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getLong(3))))
      .toMap

    // batch twin: the full x02-family pair relation at the admission
    // threshold, then predecessor counts in (batch, id) arrival order
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val sig = Dedup.admissionSig(docs)
    val bands = Dedup.admissionBands(sig)
    val cand = bands.alias("x")
      .join(bands.alias("y"),
        col("x.bk") === col("y.bk") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val hs = sig.select(col("doc_id"), col("hs"))
    val pairs = cand
      .join(hs.select(col("doc_id").as("a"), col("hs").as("ha")), "a")
      .join(hs.select(col("doc_id").as("b"), col("hs").as("hb")), "b")
      .withColumn("inter",
        graft.functions.ArrayMath.sortedIntersectSize(col("ha"), col("hb")))
      .withColumn("jac", col("inter") /
        (size(col("ha")) + size(col("hb")) - col("inter")).cast("double"))
      .filter(col("jac") >= 0.8)
      .select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    def key(id: Long) = (id % 3, id) // replay arrival order
    val nPrior =
      scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    pairs.foreach { case (a, b) =>
      val later = if (Ordering[(Long, Long)].lt(key(a), key(b))) b else a
      nPrior(later) += 1
    }

    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    assert(out.keySet == ids.toSet)
    ids.foreach { id =>
      val (bt, adm, np) = out(id)
      assert(bt == id % 3, s"doc $id rode batch $bt, split pins ${id % 3}")
      assert(np == nPrior(id), s"doc $id n_prior $np, twin ${nPrior(id)}")
      assert(adm == (np == 0L), s"doc $id admitted=$adm with n_prior=$np")
    }
    // the gate has teeth: the fixture rejects real near-duplicates
    assert(out.values.count(v => !v._2) > 0)
  }
}
