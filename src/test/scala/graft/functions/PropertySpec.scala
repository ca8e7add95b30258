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

  test("latest-wins upsert fold is split-invariant on random event logs") {
    import graft.operators.StreamingQueries
    import spark.implicits._
    val rowGen = for {
      key <- Gen.chooseNum(0, 5).map(i => s"k$i")
      ts <- Gen.chooseNum(0L, 50L)
      st <- Gen.oneOf("sent", "delivered", "failed")
    } yield (key, ts, st)
    val logGen = Gen.listOfN(40, rowGen)
    (1L to 5L).foreach { seed =>
      val rows = sample(logGen, seed)
      def latestOf(batch: Seq[(String, Long, String)]) =
        batch.toDF("messageId", "timestamp", "status")
          .groupBy("messageId")
          .agg(max(struct(col("timestamp"), col("status"))).as("m"))
          .select(col("messageId"), col("m.timestamp").as("timestamp"),
            col("m.status").as("status"))
      val empty = latestOf(Seq(("x", 0L, "x"))).filter(lit(false))
      // random split point: fold the log in two batches vs one
      val cut = (seed * 7 % 40).toInt
      val (b1, b2) = rows.splitAt(cut)
      val folded = Seq(b1, b2).filter(_.nonEmpty).foldLeft(empty) {
        (acc, b) => StreamingQueries.latestWinsMerge(acc, latestOf(b))
      }
      val oneShot = StreamingQueries.latestWinsMerge(empty, latestOf(rows))
      def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
        .sortBy(_._1).toSeq
      assert(canon(folded) == canon(oneShot), s"seed=$seed cut=$cut")
    }
  }

  test("jacobi eigen solves random symmetric matrices") {
    import graft.operators.Pca
    val d = 6
    val entryGen = Gen.chooseNum(-5.0, 5.0)
    val matGen = Gen.listOfN(d * d, entryGen)
    (1L to 10L).foreach { seed =>
      val raw = sample(matGen, seed)
      val a = Array.tabulate(d, d) { (i, j) =>
        (raw(i * d + j) + raw(j * d + i)) / 2.0 // symmetrize
      }
      val (values, vectors) = Pca.jacobiEigen(a)
      // trace preserved
      assert(math.abs(values.sum - (0 until d).map(i => a(i)(i)).sum) < 1e-9)
      // residual ||A v - lambda v|| small, columns orthonormal
      (0 until d).foreach { c =>
        val v = Array.tabulate(d)(vectors(_)(c))
        val av = a.map(row => row.zip(v).map { case (x, y) => x * y }.sum)
        av.zip(v.map(_ * values(c))).foreach { case (x, y) =>
          assert(math.abs(x - y) < 1e-8, s"seed=$seed col=$c") }
        (c until d).foreach { c2 =>
          val v2 = Array.tabulate(d)(vectors(_)(c2))
          val want = if (c == c2) 1.0 else 0.0
          assert(math.abs(v.zip(v2).map { case (x, y) => x * y }.sum - want)
            < 1e-9, s"seed=$seed ${c}x$c2")
        }
      }
    }
  }
}
