package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Diagnostic main: run one (or more) SparkEntry queries with a
  * [[StreamingQueryListener]] attached and print each micro-batch's
  * progress line — batchId, numInputRows, and the full `durationMs`
  * breakdown (addBatch / getBatch / walCommit / commitOffsets /
  * queryPlanning / triggerExecution). This is how the streaming-replay
  * fixed costs get attributed: the bench reports only wall time per
  * query, which cannot distinguish "too many micro-batches" from
  * "slow state commits" from "planning overhead".
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ReplayProbe s08_outer_join"
  */
object ReplayProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"PROBE start ${e.name}")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs
        println(s"PROBE batch=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=${new java.util.TreeMap[String, java.lang.Long](d)}")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"PROBE end")
    })
    // args: query names, or "conf:key=value" to set a session conf
    // before the queries that follow it (e.g. a state-store provider).
    args.foreach {
      case c if c.startsWith("conf:") =>
        val kv = c.stripPrefix("conf:").split("=", 2)
        require(kv.length == 2 && kv(0).nonEmpty,
          s"malformed conf argument '$c' — expected conf:key=value")
        spark.conf.set(kv(0), kv(1))
        println(s"PROBE conf ${kv(0)}=${kv(1)}")
      case name =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
        println(f"PROBE $name total=${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
    }
    // listener events are async; let the bus drain before the JVM exits
    Thread.sleep(2000)
    spark.stop()
  }
}
