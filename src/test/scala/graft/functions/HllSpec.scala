package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class HllSpec extends SparkSpec {
  import spark.implicits._

  // Raw ScalaCheck generators with explicit seeds — the scalatest bridge
  // artifact is not on the offline classpath (see PropertySpec).
  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  /** Reference (slow, obviously-correct) register computation on the
    * driver, mirroring the documented portability contract. */
  private def registersOf(values: Seq[String]): Array[Int] = {
    val regs = new Array[Int](Hll.M)
    values.foreach { s =>
      val h = PortableHash.h60(s)
      val j = (h % Hll.M).toInt
      val w = h >>> 6
      val rho =
        if (w == 0L) Hll.MaxRho
        else Hll.MaxRho - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > regs(j)) regs(j) = rho
    }
    regs
  }

  private def zvOf(regs: Array[Int]): (Long, Int) =
    (regs.map(r => 1L << (Hll.MaxRho - r)).sum, regs.count(_ == 0))

  private def sketchZV(values: Seq[String], parts: Int): (Long, Int) = {
    val row = values.toDF("v").repartition(parts)
      .agg(Hll.sketch(col("v")).as("sk"))
      .select($"sk.z_scaled", $"sk.v_empty").head()
    (row.getLong(0), row.getInt(1))
  }

  test("aggregate state matches the driver-side reference contract") {
    val gen = Gen.listOf(Gen.asciiPrintableStr)
    (1L to 10L).foreach { seed =>
      val vs = sample(gen, seed)
      assert(sketchZV(vs, parts = 3) == zvOf(registersOf(vs)), s"seed=$seed")
    }
  }

  test("partition count never changes the sketch (merge = elementwise max)") {
    val vs = (1 to 500).map(i => s"user-$i")
    val one = sketchZV(vs, parts = 1)
    assert(sketchZV(vs, parts = 7) == one)
    assert(sketchZV(vs ++ vs, parts = 5) == one) // idempotent under dups
  }

  test("nulls are skipped, empty input is the empty sketch") {
    val (z, v) = {
      val row = Seq[Option[String]](None, Some("a"), None).toDF("v")
        .agg(Hll.sketch(col("v")).as("sk"))
        .select($"sk.z_scaled", $"sk.v_empty").head()
      (row.getLong(0), row.getInt(1))
    }
    assert((z, v) == zvOf(registersOf(Seq("a"))))
    val empty = spark.emptyDataset[String].toDF("v")
      .agg(Hll.sketch(col("v")).as("sk"))
      .select($"sk.z_scaled", $"sk.v_empty").head()
    assert(empty.getLong(0) == Hll.M.toLong * (1L << Hll.MaxRho))
    assert(empty.getInt(1) == Hll.M)
  }

  /** Estimator accuracy: HLL's standard error is 1.04/√m ≈ 13% at m=64;
    * assert within 3σ across a cardinality sweep spanning both the
    * linear-counting and raw branches. */
  test("estimate lands within 3 sigma across both estimator branches") {
    for (n <- Seq(10, 100, 1000, 20000)) {
      val df = (1 to n).map(i => s"item-$i-salt").toDF("v")
        .agg(Hll.sketch(col("v")).as("sk"))
        .select(expr(Hll.estMicroSpark("sk.z_scaled", "sk.v_empty")).as("e"))
      val est = df.head().getLong(0).toDouble / 1e6
      assert(math.abs(est - n) / n < 3 * 1.04 / math.sqrt(Hll.M),
        s"n=$n est=$est")
    }
  }

  test("registers output matches the reference; union rollup is lossless") {
    val gen = Gen.listOf(Gen.asciiPrintableStr)
    val vs = sample(gen, 42L) ++ (1 to 500).map(i => s"u$i")
    // hll_registers emits the reference register array
    val regs = vs.toDF("v").repartition(5)
      .agg(Hll.registers(col("v")).as("r"))
      .head().getSeq[Int](0).toArray
    assert(regs.toSeq == registersOf(vs).toSeq)
    // associativity: per-subgroup registers unioned == direct sketch
    val fine = vs.zipWithIndex.map { case (v, i) => (i % 7, v) }
      .toDF("sub", "v").repartition(4)
      .groupBy("sub").agg(Hll.registers(col("v")).as("r"))
    val u = fine.agg(Hll.union(col("r")).as("sk"))
      .select($"sk.z_scaled", $"sk.v_empty").head()
    assert((u.getLong(0), u.getInt(1)) == zvOf(registersOf(vs)))
    // empty-table union: no rows -> empty sketch summary
    val e = fine.filter(lit(false)).agg(Hll.union(col("r")).as("sk"))
      .select($"sk.z_scaled", $"sk.v_empty").head()
    assert((e.getLong(0), e.getInt(1)) == zvOf(new Array[Int](Hll.M)))
  }

  test("union rejects a wrong-width register array") {
    val bad = Seq(Seq(1, 2, 3)).toDF("r")
    val ex = intercept[Exception] {
      bad.agg(Hll.union(col("r"))).collect()
    }
    assert(ex.getMessage != null)
  }

  test("linear-counting table matches direct ln computation") {
    (1 to Hll.M).foreach { v =>
      assert(Hll.LcMicro(v - 1) ==
        math.floor(Hll.M * math.log(Hll.M.toDouble / v) * 1e6).toLong)
    }
    assert(Hll.LcMicro(Hll.M - 1) == 0L) // V = m → estimate 0
  }
}
