package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SimJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force exact pairs: every pair sharing >= 1 shingle hash,
    * exact-verified — the oracle's formulation, in Spark. */
  private def brute(docs: DataFrame): Set[(Long, Long, Long)] = {
    val hv = Dedup.wordShingleHashes(docs).distinct()
    val sz = hv.groupBy("doc_id").agg(count(lit(1)).as("n"))
    hv.alias("x").join(hv.alias("y"),
        col("x.hf") === col("y.hf") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("inter"))
      .join(sz.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sz.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .filter(col("inter") * 5 >= (col("na") + col("nb") - col("inter")) * 4)
      .select(col("a"), col("b"),
        floor(col("inter") / (col("na") + col("nb") - col("inter")).cast("double")
          * 1000000).cast("long").as("jac_u"))
      .as[(Long, Long, Long)].collect().toSet
  }

  private def run(docs: DataFrame): Set[(Long, Long, Long)] =
    SimJoin.exactPairs(docs).as[(Long, Long, Long)].collect().toSet

  test("prefix-filtered result equals brute force on the fixture") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val got = run(docs)
    assert(got == brute(docs))
    assert(got.nonEmpty, "fixture must exercise the >= t path")
  }

  test("boundary pairs: exactly at, just below, and subset-shaped") {
    // 9 shared words + distinct tails: shingle sets overlap on the 7
    // common interior 3-grams; crafted so one pair sits exactly ON the
    // 0.8 boundary and another just under it.
    val common = (1 to 19).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, common + " a1"),              // 18 shingles, 17 shared w/ doc 2
      (2L, common + " b1"),              // J(1,2) = 17/19 = 0.894 >= .8
      (3L, common),                      // 17 shingles, subset: J(3,1)=17/18
      (4L, (1 to 12).map(i => s"w$i").mkString(" ") + " c1 c2 c3 c4 c5 c6")
      // doc4 shares first 10 shingles with docs 1-3: J = 10/(18+18-10) too low
    ).toDF("doc_id", "text")
    assert(run(docs) == brute(docs))
  }

  test("adversarial order: common tokens are the globally most frequent") {
    // boilerplate shared by ALL docs (max document frequency -> sorted
    // LAST in every prefix order) is exactly what near-dup pairs share;
    // completeness must come from the prefix bound, not from luck.
    val boiler = (1 to 30).map(i => s"b$i").mkString(" ")
    val docs = (1L to 12L).map { i =>
      (i, boiler + s" u${i}x")           // every pair ~28/32 similar
    }.toDF("doc_id", "text")
    val got = run(docs)
    assert(got == brute(docs))
    assert(got.size == 12 * 11 / 2, "all pairs are true near-dups here")
  }

  /** Brute-force exact containment pairs (a < b, cont_u). */
  private def bruteCont(docs: DataFrame): Set[(Long, Long, Long)] = {
    val hv = Dedup.wordShingleHashes(docs).distinct()
    val sz = hv.groupBy("doc_id").agg(count(lit(1)).as("n"))
    hv.alias("x").join(hv.alias("y"),
        col("x.hf") === col("y.hf") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("inter"))
      .join(sz.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sz.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .filter(col("inter") * 5 >= least(col("na"), col("nb")) * 4)
      .select(col("a"), col("b"),
        floor(col("inter") / least(col("na"), col("nb")).cast("double")
          * 1000000).cast("long").as("cont_u"))
      .as[(Long, Long, Long)].collect().toSet
  }

  private def runCont(docs: DataFrame): Set[(Long, Long, Long)] =
    SimJoin.exactContainment(docs).as[(Long, Long, Long)].collect().toSet

  test("containment: subset-shaped pairs that Jaccard misses are found") {
    // doc 2 is doc 1's first quarter: containment 1.0, Jaccard ~0.25 —
    // invisible to exactPairs at t=0.8, MUST be found by containment
    val big = (1 to 80).map(i => s"w$i").mkString(" ")
    val small = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, big), (2L, small),
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8"),          // disjoint filler
      (4L, (30 to 55).map(i => s"w$i").mkString(" "))  // interior slice of 1
    ).toDF("doc_id", "text")
    val got = runCont(docs)
    assert(got == bruteCont(docs))
    assert(got.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1000000L),
      "fully-contained subset must appear with cont_u = 1e6")
    assert(got.exists(p => p._1 == 1L && p._2 == 4L),
      "interior slice must appear")
    assert(SimJoin.exactPairs(docs).as[(Long, Long, Long)].collect()
      .forall(p => !(p._1 == 1L && p._2 == 2L)),
      "the same pair is below the Jaccard threshold (sanity)")
  }

  test("containment equals brute force on the fixture") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    assert(runCont(docs) == bruteCont(docs))
  }

  test("containment: equal-size docs resolve via the smaller id") {
    val common = (1 to 19).map(i => s"w$i").mkString(" ")
    val docs = Seq((7L, common + " a1"), (9L, common + " b1"))
      .toDF("doc_id", "text")
    val got = runCont(docs)
    assert(got == bruteCont(docs))
    assert(got.exists(p => p._1 == 7L && p._2 == 9L))
  }

  test("single-shingle docs and disjoint docs") {
    val docs = Seq(
      (1L, "only"), (2L, "only"),        // identical 1-shingle sets: J=1
      (3L, "alpha beta gamma delta"), (4L, "zeta eta theta iota")
    ).toDF("doc_id", "text")
    val got = run(docs)
    assert(got == brute(docs))
    assert(got.contains((1L, 2L, 1000000L)))
  }

  /** Brute-force exact cosine pairs (a < b). */
  private def bruteCos(docs: DataFrame): Set[(Long, Long)] = {
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

  test("cosine: size-skewed pairs between Jaccard's reach and containment's") {
    // doc 2 = first 60 of doc 1's 80 words: shingles 58/78,
    // J = 58/98 ≈ 0.59 (x74 misses), cos = 58/√(78·58) ≈ 0.862 (x77
    // finds), cont = 1.0 (x76 finds) — the three thresholds genuinely
    // order the same pair differently.
    val docs = Seq(
      (1L, (1 to 80).map(i => s"w$i").mkString(" ")),
      (2L, (1 to 60).map(i => s"w$i").mkString(" ")),
      (3L, "z1 z2 z3 z4 z5 z6")
    ).toDF("doc_id", "text")
    val cos = SimJoin.exactCosine(docs)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(cos == bruteCos(docs))
    assert(cos.contains((1L, 2L)), "cosine must catch the 0.86 pair")
    assert(!run(docs).exists(p => p._1 == 1L && p._2 == 2L),
      "the same pair is below the Jaccard threshold (sanity)")
  }

  test("cosine equals brute force on the fixture") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val cos = SimJoin.exactCosine(docs)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(cos == bruteCos(docs))
    assert(cos.nonEmpty)
  }
}
