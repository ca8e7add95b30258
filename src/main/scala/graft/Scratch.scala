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
      .config("spark.sql.maxPlanStringLength", "65536")
      .config("spark.sql.ui.explainMode", "simple")
      .config("spark.sql.ui.retainedExecutions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = sys.env.getOrElse("SPARK_GRAFT_QUERY", "q12_multi_agg")
    def t(tag: String)(f: => Any): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"[t] $tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }
    SparkEntry.queries.get(name) match {
      case Some(fn) =>
        if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
          val df = fn(spark, d)
          df.count() // populate AQE final plan
          println(df.queryExecution.executedPlan.toString.take(20000))
        }
        t(name)(fn(spark, d).count())
      case None =>
        System.err.println(s"Unknown query '$name'. Known queries:\n  " +
          SparkEntry.queries.keys.toSeq.sorted.mkString("\n  "))
        spark.stop()
        sys.exit(1)
    }
    spark.stop()
  }
}
