package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Diagnostic main: job/stage counts and wall per streaming replay row
  * — attribution for the per-micro-batch fixed cost. */
object ReplayProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    @volatile var stages = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages += 1
    })
    val progress = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val dm = p.durationMs
        progress.add(f"batch${p.batchId} total=${dm.getOrDefault("triggerExecution", -1L)} addBatch=${dm.getOrDefault("addBatch", -1L)} getBatch=${dm.getOrDefault("getBatch", -1L)} latestOffset=${dm.getOrDefault("latestOffset", -1L)} planning=${dm.getOrDefault("queryPlanning", -1L)} walCommit=${dm.getOrDefault("walCommit", -1L)} commitOffsets=${dm.getOrDefault("commitOffsets", -1L)}")
      }
    })
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("s15_late_drop", "s01_undelivered_stream",
        "s24_diff_rearrive", "s19_stream_diff", "s20_leakage_split"))
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      fn(spark, d).count() // warm (builds replay dirs)
      Thread.sleep(500)
      progress.clear()
      val (j0, s0) = (jobs, stages); val t0 = System.nanoTime()
      fn(spark, d).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $n wall=$sec%.2fs jobs=${jobs - j0} stages=${stages - s0}")
      Thread.sleep(300)
      progress.forEach(l => println(s"  $n $l"))
    }
    spark.stop()
  }
}
