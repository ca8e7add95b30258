package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line {"metric":...} as the LAST stdout line (and
  * mirrors it to bench_result.json) so the driver can parse it even if
  * Spark logs interleave. A warmup pass (flagship query + events read)
  * runs first so the timed loop measures query execution, not
  * JVM/codegen/parquet-reader initialization.
  *
  * Per query: three timed runs, median reported — dampens host-level
  * throttling variance (observed 2× swings on identical code) without
  * hiding a genuinely slow query the way min-of-N would.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // size reducers by bytes, not cluster parallelism: tiny shuffles
      // coalesce to a few tasks locally; at scale AQE keeps thousands
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    try { SparkEntry.entry(spark).count() } catch { case _: Throwable => }
    try { Tables.events(spark, sfDir).count() } catch { case _: Throwable => }
    // Warm every compile-heavy machinery on the tiny fixture so the
    // timed runs measure steady state, not one-time init: streaming
    // (state store + incremental-plan codegen, ~8s), plus one query per
    // distinct codegen-heavy shape — word + char LSH dedup, brute +
    // IVF ANN, generator, grouping sets. Logged per-run traces showed
    // exactly these run1 >> run3 before warmup covered them.
    Seq("s01_undelivered_stream", "x02_dedup_minhash", "x04_dedup_chargram",
      "x06_ann_brute", "x12_ann_ivf", "s03_generator", "q18_rollup")
      .foreach { w =>
        try {
          SparkEntry.queries.get(w)
            .foreach(_(spark, "/root/testdata/sf0.001").count())
        } catch { case _: Throwable => }
      }

    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // Optional comma-separated query-name filter for bisection runs.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    // (name, Some(medianSec)) on success; (name, None) if ANY run threw —
    // a broken query must read as a failure, not a near-zero "speedup".
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      val times = (1 to runs).map { r =>
        val t0 = System.nanoTime(); val gc0 = gcMs
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case t: Throwable =>
            System.err.println(s"BENCH FAIL $name: ${t.getClass.getName}: ${t.getMessage}")
            false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        // Per-run trace (stderr, not the JSON contract): exposes run-to-run
        // degradation inside one session — run1 >> run3 means first-run
        // codegen/compile, run3 >> run1 means session-state accumulation.
        val rt = Runtime.getRuntime
        System.err.println(f"BENCH RUN $name run$r ${sec}%.3fs gc+${gcMs - gc0}ms " +
          f"heap${(rt.totalMemory - rt.freeMemory) / (1 << 20)}MB")
        if (ok) Some(sec) else None
      }
      val median =
        if (times.forall(_.isDefined)) Some(times.flatten.sorted.apply(times.size / 2))
        else None
      name -> median
    }
    val qs = results.map {
      case (k, Some(v)) => "\"" + k + "\":" + v
      case (k, None) => "\"" + k + "\":null"
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, None) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.flatMap(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    // File mirror first, then stdout last line, then flush: the driver can
    // use either; neither passes through a logging prefix.
    val pw = new java.io.PrintWriter("bench_result.json")
    try pw.println(line) finally pw.close()
    spark.stop()
    println(line)
    System.out.flush()
  }
}
