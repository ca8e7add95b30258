package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class CmsSpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  /** Driver-side reference counters mirroring the documented contract. */
  private def countersOf(values: Seq[String]): Array[Long] = {
    val buf = new Array[Long](Cms.Depth * Cms.Width)
    values.foreach { s =>
      val h = PortableHash.h60(s)
      (0 until Cms.Depth).foreach(i => buf(i * Cms.Width + Cms.cell(h, i)) += 1L)
    }
    buf
  }

  private def sketchOf(values: Seq[String], parts: Int): Seq[Long] = {
    val df = if (values.isEmpty) spark.emptyDataset[String].toDF("t")
      else values.toDF("t").repartition(parts)
    df.agg(Cms.sketch(col("t")).as("cms")).head().getSeq[Long](0)
  }

  test("aggregate counters match the driver-side reference contract") {
    val gen = Gen.listOf(Gen.asciiPrintableStr)
    (1L to 10L).foreach { seed =>
      val vs = sample(gen, seed)
      assert(sketchOf(vs, parts = 3) == countersOf(vs).toSeq, s"seed=$seed")
    }
  }

  test("partition count never changes the counters (merge = elementwise add)") {
    val vs = (1 to 400).flatMap(i => Seq.fill(i % 5 + 1)(s"tok-${i % 40}"))
    val one = sketchOf(vs, 1)
    assert(sketchOf(vs, 8) == one)
    assert(one.sum == vs.size.toLong * Cms.Depth) // every token hits every row once
  }

  test("union of per-subgroup sketches equals the direct sketch") {
    val vs = sample(Gen.listOf(Gen.asciiPrintableStr), 7L) ++
      (1 to 300).map(i => s"w${i % 40}")
    val direct = countersOf(vs).toSeq
    val rolled = vs.zipWithIndex.map { case (v, i) => (i % 5, v) }
      .toDF("sub", "t").repartition(4)
      .groupBy("sub").agg(Cms.sketch(col("t")).as("cms"))
      .agg(Cms.union(col("cms")).as("cms"))
      .head().getSeq[Long](0)
    assert(rolled == direct)
    // empty-table union: the zero sketch
    val empty = Seq((1, "x")).toDF("sub", "t").filter(lit(false))
      .groupBy("sub").agg(Cms.sketch(col("t")).as("cms"))
      .agg(Cms.union(col("cms")).as("cms"))
      .head().getSeq[Long](0)
    assert(empty == Seq.fill(Cms.Depth * Cms.Width)(0L))
  }

  test("point estimate is an upper bound and exact without collisions") {
    val vs = Seq.fill(7)("alpha") ++ Seq.fill(3)("beta") ++
      (1 to 200).map(i => s"noise-$i")
    val est = vs.toDF("t").agg(Cms.sketch(col("t")).as("cms"))
      .select(
        expr(Cms.estimateSpark("cms", "alpha")).as("a"),
        expr(Cms.estimateSpark("cms", "beta")).as("b"),
        expr(Cms.estimateSpark("cms", "never-seen")).as("z"))
      .head()
    assert(est.getLong(0) >= 7 && est.getLong(1) >= 3 && est.getLong(2) >= 0)
    // forced-collision floor: estimates can only over-count, never under
    val heavy = Seq.fill(1000)("alpha")
    val e2 = heavy.toDF("t").agg(Cms.sketch(col("t")).as("cms"))
      .select(expr(Cms.estimateSpark("cms", "alpha"))).head().getLong(0)
    assert(e2 == 1000L)
  }

  test("nulls are skipped and the empty sketch is all zeros") {
    val withNull = Seq[Option[String]](None, Some("x")).toDF("t")
      .agg(Cms.sketch(col("t")).as("cms")).head().getSeq[Long](0)
    assert(withNull == countersOf(Seq("x")).toSeq)
    assert(sketchOf(Nil, 1).forall(_ == 0L))
  }
}
