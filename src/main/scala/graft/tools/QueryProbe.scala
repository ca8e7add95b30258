package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Per-query measurement probe with the EXACT Bench session confs
  * (shuffle partitions from $SPARK_GRAFT_CPUS, AQE bytes-first
  * coalescing, codegen cache, artifact isolation off, RawLocalFs, OHA
  * threshold) so a plan or timing read here is the plan the bench
  * executes. For each name in $SPARK_GRAFT_PROBE_ONLY (comma-separated):
  * warm once on sf0.001, then run N timed counts at $SPARK_GRAFT_SF_DIR
  * and write the post-run `explain("formatted")` (final AQE plan) to
  * $SPARK_GRAFT_PROBE_OUT/<name>_<tag>.txt when that env is set.
  * SPARK_GRAFT_PROBE_CACHE=1 replicates the bench fixture cache. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_REPART", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "65536")
      .config("spark.sql.ui.explainMode", "simple")
      .config("spark.sql.ui.retainedExecutions", "4")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OHA_FALLBACK", "1048576"))
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192"))
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_AFS",
          "graft.sources.GraftRawLocalFs"))
      .config("spark.hadoop.fs.file.impl",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_FS",
          "graft.sources.GraftLocalFileSystem"))
      .config("spark.local.dir", graft.TempDirs.sparkLocalDir())
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "15s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = sys.env.getOrElse("SPARK_GRAFT_PROBE_ONLY", "q12_multi_agg")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "3").toInt
    val outDir = sys.env.get("SPARK_GRAFT_PROBE_OUT")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PROBE_TAG", "before")

    if (sys.env.getOrElse("SPARK_GRAFT_PROBE_CACHE", "1") != "0") {
      import graft.Tables
      val tables = Seq[(SparkSession, String) => org.apache.spark.sql.DataFrame](
        Tables.region, Tables.nation, Tables.customer, Tables.supplier,
        Tables.part, Tables.orders, Tables.lineitem, Tables.events,
        Tables.documents, Tables.embeddings)
      tables.foreach { t =>
        try t(spark, sfDir).persist().count() catch { case _: Throwable => }
      }
    }

    for (name <- names) {
      val fn = SparkEntry.queries(name)
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case t: Throwable =>
        System.err.println(s"WARMUP FAIL $name: ${t.getMessage}") }
      var lastDf: org.apache.spark.sql.DataFrame = null
      for (r <- 1 to runs) {
        spark.sparkContext.setJobDescription(s"$name run$r")
        val t0 = System.nanoTime()
        val ok = try { lastDf = fn(spark, sfDir); lastDf.count(); true }
          catch { case t: Throwable =>
            System.err.println(s"PROBE FAIL $name: ${t.getMessage}"); false }
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"PROBE $name run$r ${sec}%.3f s ok=$ok")
        spark.sparkContext.setJobDescription(null)
      }
      outDir.foreach { dir =>
        try {
          val txt = lastDf.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val f = new java.io.File(dir, s"${name}_$tag.txt")
          f.getParentFile.mkdirs()
          java.nio.file.Files.writeString(f.toPath, txt)
          println(s"PLAN  $name -> ${f.getPath}")
        } catch { case t: Throwable =>
          System.err.println(s"PLAN FAIL $name: ${t.getMessage}") }
      }
    }
    spark.stop()
  }
}
