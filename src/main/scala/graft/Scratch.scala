package graft

import org.apache.spark.sql.SparkSession

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
    t("x02")(operators.Dedup.x02(spark, d).count())
    t("x04")(operators.Dedup.x04(spark, d).count())
    t("x05")(operators.Dedup.x05(spark, d).count())
    spark.stop()
  }
}
