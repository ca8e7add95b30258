package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }

    import graft.functions.PortableHash._
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), lower(col("text")).as("t"))
    val hv = docs
      .selectExpr("doc_id", "t",
        "explode(sequence(1, greatest(length(t)-7, 1))) AS i")
      .select(col("doc_id"), (h60(expr("substr(t, i, 8)")) % P).as("h"))
    val aggs = (0 until 16).map { j =>
      min((col("h") * permA(100 + j) + permB(100 + j)) % P).as(s"m$j")
    }
    val sig = hv.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    val bandCol = explode(array((0 until 8).map { bn =>
      concat_ws("_", lit(bn) +: (0 until 2).map(k => col(s"m${bn * 2 + k}")): _*)
    }: _*))
    val bands = sig.select(col("doc_id"), bandCol.as("bk"))
    time("bands")(bands.count())
    val cand = bands.alias("x")
      .join(bands.alias("y"),
        col("x.bk") === col("y.bk") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    time("cand")(cand.count())
    val sh = docs.select(col("doc_id"), expr(
      "array_distinct(transform(sequence(1, greatest(length(t)-7, 1)), i -> substr(t, i, 8)))").as("sg"))
    val sa = sh.select(col("doc_id").as("a"), col("sg").as("sga"))
    val sb = sh.select(col("doc_id").as("b"), col("sg").as("sgb"))
    val withArrays = cand.join(sa, "a").join(sb, "b")
    time("join_arrays")(withArrays.count())
    val out = withArrays
      .withColumn("jac",
        expr("size(array_intersect(sga, sgb)) / cast(size(array_union(sga, sgb)) as double)"))
      .filter(col("jac") >= 0.7)
    time("verify")(out.count())
    spark.stop()
  }
}
