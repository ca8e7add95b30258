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
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192"))
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_AFS",
          "org.apache.hadoop.fs.local.RawLocalFs"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.contains("SPARK_GRAFT_PROBE_DUMPGEN"))
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
        org.apache.logging.log4j.Level.DEBUG)
    @volatile var jobs = 0
    @volatile var stages = 0
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1
        jobStart.put(j.jobId, System.nanoTime())
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        // remove() both bounds the map and keeps the null (missed start
        // event) distinguishable — get() on the Long-valued map would
        // unbox null to 0L and log a garbage multi-hour elapsed time
        Option(jobStart.remove(e.jobId): java.lang.Long).foreach { t0 =>
          val ms = (System.nanoTime() - t0.longValue) / 1000000
          jobLog.add(f"job${e.jobId} ${ms}ms")
        }
      }
      override def onStageCompleted(st: SparkListenerStageCompleted): Unit = {
        stages += 1
        val i = st.stageInfo
        val ms = (for {c <- i.completionTime; s <- i.submissionTime} yield c - s)
          .getOrElse(-1L)
        if (ms > 150) {
          val tm = i.taskMetrics
          jobLog.add(f"  SLOWSTAGE ${i.stageId} ${ms}ms tasks=${i.numTasks} " +
            f"run=${tm.executorRunTime}ms deser=${tm.executorDeserializeTime}ms " +
            f"gc=${tm.jvmGCTime}ms cpu=${tm.executorCpuTime / 1000000}ms " +
            f"resSer=${tm.resultSerializationTime}ms ${i.name.take(60)}")
        }
      }
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
      progress.clear(); jobLog.clear()
      val cg = org.apache.spark.metrics.source.CodegenMetrics.METRIC_SOURCE_CODE_SIZE.getCount
      val cgT0 = org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount
      val (j0, s0) = (jobs, stages); val t0 = System.nanoTime()
      fn(spark, d).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val cg1 = org.apache.spark.metrics.source.CodegenMetrics.METRIC_SOURCE_CODE_SIZE.getCount
      val cgT1 = org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount
      val snap = org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getSnapshot
      // reservoir mean × window count ≈ compile wall in this window
      val compMs = ((cgT1 - cgT0) * snap.getMean).toLong
      println(f"PROBE $n wall=$sec%.2fs jobs=${jobs - j0} stages=${stages - s0} " +
        f"codegenCompiles=${cgT1 - cgT0} genSources=${cg1 - cg} ~compileMs=$compMs")
      Thread.sleep(300)
      progress.forEach(l => println(s"  $n $l"))
      if (sys.env.contains("SPARK_GRAFT_PROBE_JOBS"))
        jobLog.forEach(l => println(s"  $n $l"))
    }
    spark.stop()
  }
}
