package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("CPUS", "32")
    val parts = sys.env.getOrElse("PARTS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", sys.env.getOrElse("PFIRST", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    SparkEntry.entry(spark).count()
    Tables.events(spark, d).count()
    def t(name: String)(f: => Any): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[t] $name: ${runs.min}%.3f")
    }
    t("q05_cold_plan")(operators.Relational.q05(spark, d).count())
    val cached = operators.Relational.q05(spark, d)
    t("q05_same_df")(cached.count())
    t("q01")(operators.Relational.q01(spark, d).count())
    t("q13")(operators.Relational.q13(spark, d).count())
    t("x02")(operators.Dedup.x02(spark, d).count())
    t("x04")(operators.Dedup.x04(spark, d).count())
    spark.stop()
  }
}
