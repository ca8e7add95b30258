package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test for the prefix-filter completeness lemma: on random
  * corpora drawn to maximize shared-token structure (small vocabulary,
  * heavy reuse, replicated docs with point edits), [[SimJoin]]'s
  * prefix-filtered exact joins must equal brute force EXACTLY — both
  * the Jaccard form (x74: symmetric prefixes + PPJoin length/positional
  * pruning) and the containment form (x76: asymmetric prefix vs full
  * index). Random generation explores the boundary geometry the
  * hand-written SimJoinSpec fixtures cannot enumerate: near-threshold
  * sizes, ties in the (df, hash) global order, one-token sets, and
  * identical twins. */
class SimJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  /** Corpus generator: words from a tiny vocabulary so 3-gram shingle
    * sets collide aggressively; some docs are near-copies of earlier
    * ones (suffix/point edits) to populate every similarity band. */
  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    vocab <- Gen.chooseNum(6, 14)
    nBase <- Gen.chooseNum(4, 10)
    base <- Gen.listOfN(nBase, for {
      len <- Gen.chooseNum(1, 24)
      ws <- Gen.listOfN(len, Gen.chooseNum(0, vocab - 1).map(i => s"w$i"))
    } yield ws.mkString(" "))
    nEdit <- Gen.chooseNum(2, 8)
    edits <- Gen.listOfN(nEdit, for {
      src <- Gen.chooseNum(0, nBase - 1)
      mode <- Gen.chooseNum(0, 3)
      tag <- Gen.chooseNum(0, 99)
    } yield {
      val t = base(src)
      mode match {
        case 0 => t                        // exact twin
        case 1 => t + s" e$tag"            // appended token
        case 2 => s"e$tag " + t            // prepended token
        case _ => t.split(" ").dropRight(1) match {
          case Array() => t
          case a       => a.mkString(" ")  // truncated copy
        }
      }
    })
  } yield (base ++ edits).zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }

  private def brute(docs: org.apache.spark.sql.DataFrame, containment: Boolean) = {
    val hv = Dedup.wordShingleHashes(docs).distinct()
    val sz = hv.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val denom =
      if (containment) least(col("na"), col("nb"))
      else col("na") + col("nb") - col("inter")
    hv.alias("x").join(hv.alias("y"),
        col("x.hf") === col("y.hf") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("inter"))
      .join(sz.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sz.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .filter(col("inter") * 5 >= denom * 4)
      .select(col("a"), col("b"))
      .as[(Long, Long)].collect().toSet
  }

  private def bruteCos(docs: org.apache.spark.sql.DataFrame) = {
    val hv = Dedup.wordShingleHashes(docs).distinct()
    val sz = hv.groupBy("doc_id").agg(count(lit(1)).as("n"))
    hv.alias("x").join(hv.alias("y"),
        col("x.hf") === col("y.hf") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("inter"))
      .join(sz.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sz.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .filter(lit(25) * col("inter") * col("inter") >=
        lit(16) * col("na") * col("nb"))
      .select(col("a"), col("b")).as[(Long, Long)].collect().toSet
  }

  test("x74/x76/x77 equal brute force on 12 random adversarial corpora") {
    (1 to 12).foreach { i =>
      val corpus = sample(corpusGen, 7000L + i)
      val docs = corpus.toDF("doc_id", "text")
      val gotJ = SimJoin.exactPairs(docs)
        .select($"a", $"b").as[(Long, Long)].collect().toSet
      val gotC = SimJoin.exactContainment(docs)
        .select($"a", $"b").as[(Long, Long)].collect().toSet
      val gotS = SimJoin.exactCosine(docs)
        .select($"a", $"b").as[(Long, Long)].collect().toSet
      assert(gotJ == brute(docs, containment = false),
        s"jaccard mismatch on seed ${7000 + i}: corpus $corpus")
      assert(gotC == brute(docs, containment = true),
        s"containment mismatch on seed ${7000 + i}: corpus $corpus")
      assert(gotS == bruteCos(docs),
        s"cosine mismatch on seed ${7000 + i}: corpus $corpus")
    }
  }
}
