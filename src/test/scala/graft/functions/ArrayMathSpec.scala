package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ArrayMathSpec extends SparkSpec {

  test("dot product over double arrays matches manual fold") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val got = df.select(ArrayMath.dot(col("a"), col("b"))).head.getDouble(0)
    assert(got == 1.0 * 4 + 2.0 * 5 + 3.0 * 6)
  }

  test("dot product over float arrays accumulates in double") {
    import spark.implicits._
    val df = Seq((Seq(1.5f, 2.5f), Seq(2.0f, 4.0f))).toDF("a", "b")
    val got = df.select(ArrayMath.dot(col("a"), col("b"))).head.getDouble(0)
    assert(got == 1.5 * 2.0 + 2.5 * 4.0)
  }

  test("dot of embedding with itself equals squared l2norm") {
    val e = graft.Tables.embeddings(spark, sf).limit(10)
      .select(col("embedding").cast("array<double>").as("v"))
    val rows = e.select(ArrayMath.dot(col("v"), col("v")).as("d"),
      (ArrayMath.l2norm(col("v")) * ArrayMath.l2norm(col("v"))).as("n2"))
      .collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("sortedIntersectSize counts common elements of sorted sets") {
    import spark.implicits._
    val cases = Seq(
      (Seq(1L, 3L, 5L), Seq(2L, 3L, 5L, 9L), 2),
      (Seq.empty[Long], Seq(1L), 0),
      (Seq(1L, 2L), Seq(3L, 4L), 0),
      (Seq(7L), Seq(7L), 1))
    cases.foreach { case (a, b, want) =>
      val got = Seq((a, b)).toDF("a", "b")
        .select(ArrayMath.sortedIntersectSize(col("a"), col("b")))
        .head.getInt(0)
      assert(got == want, s"$a ∩ $b")
    }
  }

  test("multiple dot/intersect instances in one codegen scope compile (no fallback)") {
    // Regression guard for the round-1 Janino "Redefinition of local
    // variable" bug: non-nullable children make nullSafeCodeGen emit the
    // snippet unbraced at function scope, and CollapseProject duplicates a
    // reused expression — fixed local names then fail to compile and the
    // stage silently runs interpreted. fallback=false turns that silent
    // fallback into a test failure.
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      import org.apache.spark.sql.functions.{array, lit, size}
      // array(lit...) is non-nullable, which is the scope-collision case.
      val df = spark.range(50).select(
        array(lit(1.0), col("id").cast("double")).as("a"),
        array(lit(2.0), lit(3.0)).as("b"),
        array(lit(1L), lit(5L), lit(9L)).as("s"),
        array(lit(1L), lit(9L)).as("t"))
      val inter = ArrayMath.sortedIntersectSize(col("s"), col("t"))
      val out = df.select(
        ArrayMath.dot(col("a"), col("b")).as("d1"),
        ArrayMath.dot(col("b"), col("b")).as("d2"),
        inter.as("i"),
        // reusing `inter` in arithmetic mirrors the Jaccard verify stage
        // that triggered the duplicate-variable collision in round 1
        (inter.cast("double") / (size(col("s")) + size(col("t")) - inter))
          .as("j")).collect()
      assert(out.length == 50)
      assert(out.head.getInt(2) == 2)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }

  test("portable hash matches between JVM and Spark SQL") {
    import spark.implicits._
    val strings = Seq("hello", "", "a b c", "ünïcode ✓")
    val got = strings.toDF("s")
      .select(PortableHash.h60(col("s"))).collect().map(_.getLong(0)).toSeq
    assert(got == strings.map(PortableHash.h60))
  }
}
