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
    operators.StreamingQueries.s01(spark, "/root/testdata/sf0.001").count()
    def t(name: String)(f: => Any): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"[t] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[l] started ${System.currentTimeMillis() % 100000}")
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        println(s"[l] batch=${e.progress.batchId} in=${e.progress.numInputRows} dur=${e.progress.durationMs}")
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[l] terminated ${System.currentTimeMillis() % 100000}")
    }
    spark.streams.addListener(listener)
    t("s01")(operators.StreamingQueries.s01(spark, d).count())
    spark.streams.removeListener(listener)
    spark.stop()
  }
}
