package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ad-hoc drive main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    SparkEntry.entry(spark).count()
    def t(name: String)(f: => Any): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"[t] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }
    import graft.functions.ArrayMath
    val e = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", ArrayMath.l2norm(col("v")))
    val ctr = e.withColumn("hk", graft.functions.PortableHash.h60(
        concat(lit("ctr_"), col("vec_id").cast("string"))))
      .orderBy(col("hk").asc, col("vec_id").asc).limit(16)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    val scored = e.crossJoin(broadcast(ctr))
      .withColumn("cos_c", ArrayMath.dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
    t("scored")(scored.count())
    val assigned = scored
      .withColumn("crn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("cos_c").desc, col("cid").asc)))
      .filter(col("crn") === 1)
    t("assigned-window")(assigned.count())
    val aggs = (0 until 64).map { dd =>
      sum(floor(element_at(col("v"), dd + 1) * 1000000)).as(s"s$dd")
    } :+ count(lit(1)).as("cnt")
    t("stats")(assigned.groupBy("cid").agg(aggs.head, aggs.tail: _*).count())
    t("x12-full")(operators.Similarity.x12(spark, d).count())
    t("x12-seeded")(operators.Similarity.annIvf(
      Tables.embeddings(spark, d), 0L until 10L, lloydIters = 0).count())
    spark.stop()
  }
}
