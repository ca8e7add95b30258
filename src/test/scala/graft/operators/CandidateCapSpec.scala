package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The per-band candidate cap (`maxBandBucket`): OFF must be exact
  * (identical pairs to the uncapped plan — the gates stay byte-stable),
  * ON must bound the quadratic worst case (a bucket of B replicas emits
  * C(K,2) pairs, not C(B,2)) while returning a deterministic SUBSET of
  * the uncapped result. */
class CandidateCapSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  // enough shared text that every replica pair is a true near-dup
  private val boiler =
    "the quick brown fox jumps over the lazy dog again and again today"

  test("a non-binding cap returns exactly the uncapped pairs") {
    val mixed = (1L to 12L).map(i => i -> s"$boiler copy number $i") ++
      (13L to 20L).map(i => i -> s"unique document $i with its own words ${i * 7} and ${i * 13}")
    val un = pairs(Dedup.nearDupWordPairs(docs(mixed)))
    val capped = pairs(Dedup.nearDupWordPairs(docs(mixed),
      maxBandBucket = Some(1000)))
    assert(capped == un, "a cap larger than any bucket must change nothing")
  }

  test("the cap bounds a hot bucket to C(K,2) pairs and keeps a subset") {
    val replicas = (1L to 40L).map(i => i -> boiler)
    val un = pairs(Dedup.nearDupWordPairs(docs(replicas)))
    assert(un.size == 40 * 39 / 2, "identical docs must all pair uncapped")
    val capped = pairs(Dedup.nearDupWordPairs(docs(replicas),
      maxBandBucket = Some(4)))
    // all 40 docs share every band bucket; the 4 smallest ids survive
    assert(capped == (for (a <- 1L to 4L; b <- (a + 1) to 4L)
      yield (a, b)).toSet,
      s"cap=4 on one hot bucket must keep exactly C(4,2) smallest-id pairs, got $capped")
    assert(capped.subsetOf(un))
  }

  test("capped containment and embedding paths stay subsets too") {
    val mixed = (1L to 15L).map(i => i -> boiler) ++
      (16L to 22L).map(i => i -> s"other text $i entirely different ${i * 3}")
    val unC = pairs(Dedup.containmentPairs(docs(mixed)))
    val capC = pairs(Dedup.containmentPairs(docs(mixed),
      maxBandBucket = Some(3)))
    assert(capC.subsetOf(unC) && capC.nonEmpty && capC.size < unC.size)

    import spark.implicits._
    val emb = (1L to 12L)
      .map(i => i -> (0 until 64).map(d =>
        (if (i <= 8) 1.0 else -1.0) * (d + 1) / 64.0f).map(_.toFloat).toArray)
      .toDF("vec_id", "embedding")
    val unE = pairs(Dedup.embeddingDupPairs(emb, thresh = 0.9))
    val capE = pairs(Dedup.embeddingDupPairs(emb, thresh = 0.9,
      maxBandBucket = Some(3)))
    assert(capE.subsetOf(unE) && capE.nonEmpty && capE.size < unE.size)
  }

  test("a cap below 2 is rejected (cannot form pairs)") {
    intercept[IllegalArgumentException] {
      Dedup.nearDupWordPairs(docs(Seq(1L -> boiler)),
        maxBandBucket = Some(1))
    }
  }
}
