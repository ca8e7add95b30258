package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc drive main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ds = streaming.Generator.stream(spark, rowsPerSecond = 60,
      heartbeatMs = 150L, timeoutMs = 900L, normalMs = 300L,
      delayedMeanMs = 500L, delayedStdMs = 50L)
    val q = streaming.Generator.streamWriter(ds, tickMs = 100L)
      .format("memory").queryName("genx").start()
    Thread.sleep(6000)
    println("exception: " + q.exception)
    q.recentProgress.foreach(p => println(
      s"progress: batch=${p.batchId} in=${p.numInputRows} " +
        s"durMs=${p.durationMs} stateRows=${Option(p.stateOperators).map(_.toSeq.map(_.numRowsTotal)).getOrElse(Seq())}"))
    q.stop()
    spark.table("genx").groupBy("status").count().show()
    spark.stop()
  }
}
