package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks (raw ScalaCheck generators, explicit seeds —
  * the scalatest bridge artifact is not on the offline classpath) for
  * the expressions the oracle model leans on. */
class PropertySpec extends SparkSpec {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("JVM and Spark portable hashes agree on arbitrary strings") {
    import spark.implicits._
    val gen = Gen.listOfN(30, Gen.asciiPrintableStr)
    (1L to 5L).foreach { seed =>
      val strings = sample(gen, seed)
      val got = strings.toDF("s")
        .select(PortableHash.h60(col("s"))).collect().map(_.getLong(0))
      assert(got.toSeq == strings.map(PortableHash.h60), s"seed=$seed")
    }
  }

  test("sortedIntersectSize equals Set intersection for arbitrary long sets") {
    import spark.implicits._
    val gen = Gen.listOf(Gen.chooseNum(-1000L, 1000L))
    val cases = (1L to 20L).map { seed =>
      (sample(gen, seed).distinct.sorted, sample(gen, seed + 100).distinct.sorted)
    }
    val got = cases.toDF("a", "b")
      .select(ArrayMath.sortedIntersectSize(col("a"), col("b")))
      .collect().map(_.getInt(0)).toSeq
    val want = cases.map { case (a, b) => (a.toSet & b.toSet).size }
    assert(got == want)
  }

  test("dot product is within fp tolerance of a reference fold") {
    import spark.implicits._
    val gen = Gen.listOfN(16, Gen.chooseNum(-100.0, 100.0))
    val cases = (1L to 10L).map { seed =>
      (sample(gen, seed), sample(gen, seed + 50))
    }
    val got = cases.toDF("a", "b")
      .select(ArrayMath.dot(col("a"), col("b")))
      .collect().map(_.getDouble(0)).toSeq
    cases.zip(got).foreach { case ((a, b), g) =>
      val ref = a.zip(b).map { case (x, y) => x * y }.sum
      assert(math.abs(g - ref) <= math.abs(ref) * 1e-12 + 1e-12)
    }
  }
}
