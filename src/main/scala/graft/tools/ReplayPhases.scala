package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

import java.util.concurrent.ConcurrentHashMap

/** Diagnostic main for the round-13 verdict ask #2: attribute the
  * s-family replay constant into phases, per row, so the remaining
  * cost is either shavable or provably Spark-machinery floor.
  *
  * For each s-row (warm, second run measured):
  *   wall     — harness wall time for the whole queries() call
  *   life     — Σ per-streaming-query (terminated − started)
  *   trig     — Σ per-batch triggerExecution (the time the stream was
  *              actually executing micro-batches)
  *   startup  — Σ (first-batch start − query start): stream planning,
  *              source init, checkpoint dir creation
  *   outside  — wall − life: harness work outside any stream (replay
  *              dir reuse, memory-sink drain, batch-twin joins,
  *              checkpoint scratch setup/teardown)
  *   idle+stop = life − trig − startup: trigger scheduling gaps and
  *              stop() teardown
  *
  * Also measures NOOP scaffold rows — a 3-file replay through the same
  * maxFilesPerTrigger=1 / memory-sink / scratch-checkpoint shape with
  * (a) an identity projection and (b) a stateful groupBy count — whose
  * wall is the irreducible per-replay session constant that bounds any
  * future shave: 25 × noop is the floor of the whole family.
  */
object ReplayPhases {

  private class Phases {
    val qStart = new ConcurrentHashMap[java.util.UUID, Long]()
    val qFirstBatch = new ConcurrentHashMap[java.util.UUID, Long]()
    @volatile var life = 0L
    @volatile var trig = 0L
    @volatile var addBatch = 0L
    @volatile var walCommit = 0L
    @volatile var planning = 0L
    @volatile var batches = 0
    @volatile var queries = 0
    @volatile var startup = 0L
    def reset(): Unit = {
      qStart.clear(); qFirstBatch.clear()
      life = 0; trig = 0; addBatch = 0; walCommit = 0; planning = 0
      batches = 0; queries = 0; startup = 0
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_AFS",
          "graft.sources.GraftRawLocalFs"))
      .config("spark.hadoop.fs.file.impl",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_FS",
          "graft.sources.GraftLocalFileSystem"))
      .config("spark.local.dir", graft.TempDirs.sparkLocalDir())
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1048576")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ph = new Phases
    spark.streams.addListener(new StreamingQueryListener {
      import StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = {
        ph.qStart.put(e.runId, System.nanoTime()); ph.queries += 1
      }
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        ph.qFirstBatch.putIfAbsent(p.runId, System.nanoTime() -
          p.durationMs.getOrDefault("triggerExecution", 0L) * 1000000L)
        ph.batches += 1
        ph.trig += p.durationMs.getOrDefault("triggerExecution", 0L)
        ph.addBatch += p.durationMs.getOrDefault("addBatch", 0L)
        ph.walCommit += p.durationMs.getOrDefault("walCommit", 0L) +
          p.durationMs.getOrDefault("commitOffsets", 0L)
        ph.planning += p.durationMs.getOrDefault("queryPlanning", 0L)
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {
        Option(ph.qStart.get(e.runId): java.lang.Long).foreach { t0 =>
          ph.life += (System.nanoTime() - t0.longValue) / 1000000L
          Option(ph.qFirstBatch.get(e.runId): java.lang.Long).foreach { fb =>
            ph.startup += math.max(0L, (fb.longValue - t0.longValue) / 1000000L)
          }
        }
      }
    })

    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(SparkEntry.queries.keys.filter(_.startsWith("s")).toSeq.sorted)

    println("row wall_s life_s trig_s startup_s outside_s idlestop_s " +
      "batches queries addBatch_s walCommit_s planning_s")
    var tw, tl, tt, tsu, tout = 0.0
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      fn(spark, d).count() // warm: replay dirs built, codegen cached
      Thread.sleep(300)
      ph.reset()
      val t0 = System.nanoTime()
      fn(spark, d).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400) // let async terminated events land
      val life = ph.life / 1e3; val trig = ph.trig / 1e3
      val su = ph.startup / 1e3
      val outside = wall - life
      val idleStop = life - trig - su
      println(f"$n $wall%.2f $life%.2f $trig%.2f $su%.2f $outside%.2f " +
        f"$idleStop%.2f ${ph.batches} ${ph.queries} ${ph.addBatch / 1e3}%.2f " +
        f"${ph.walCommit / 1e3}%.2f ${ph.planning / 1e3}%.2f")
      tw += wall; tl += life; tt += trig; tsu += su; tout += outside
    }
    println(f"TOTAL wall=$tw%.1f life=$tl%.1f trig=$tt%.1f startup=$tsu%.1f " +
      f"outside=$tout%.1f")

    // ---- irreducible scaffold: noop replays through the same shape
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(
      new java.io.File("/dev/shm").toPath, "graft_noop_src_").toFile
    (0 until 3).foreach { n =>
      val stage = new java.io.File(dir, s"stage$n")
      Seq.tabulate(10)(i => (n * 10 + i).toLong).toDF("v")
        .coalesce(1).write.parquet(stage.getAbsolutePath)
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        new java.io.File(dir, f"gen$n%02d.parquet").toPath)
      stage.listFiles().foreach(_.delete()); stage.delete()
    }
    val schema = spark.read.parquet(dir.getAbsolutePath).schema
    def noop(stateful: Boolean): Double = {
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set(
        "spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      try {
        val ckpt = java.nio.file.Files.createTempDirectory(
          new java.io.File("/dev/shm").toPath, "graft_noop_ck_").toFile
        val t0 = System.nanoTime()
        val src = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
        val df = if (stateful) src.groupBy(pmod(col("v"), lit(4))).count()
          else src.select(col("v") + 1)
        val qn = "noop_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val q = df.writeStream.format("memory").queryName(qn)
          .outputMode(if (stateful) "update" else "append")
          .option("checkpointLocation", ckpt.getAbsolutePath).start()
        q.processAllAvailable(); q.stop()
        spark.table(qn).collect()
        spark.catalog.dropTempView(qn)
        val w = (System.nanoTime() - t0) / 1e9
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(ckpt)
        w
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", prevParts)
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }
    }
    noop(stateful = false) // warm the streaming machinery path
    for (k <- 1 to 3)
      println(f"NOOP stateless run$k = ${noop(stateful = false)}%.2f s")
    for (k <- 1 to 3)
      println(f"NOOP stateful  run$k = ${noop(stateful = true)}%.2f s")
    spark.stop()
  }
}
