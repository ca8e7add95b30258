package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-attribution probe for x18 at rehearsal scales. */
object X18Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf100x")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "65536")
      .config("spark.sql.ui.explainMode", "simple")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mx = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def time(name: String)(f: => Long): Unit = {
      val c0 = mx.getProcessCpuTime
      val t0 = System.nanoTime(); val n = f
      val w = (System.nanoTime() - t0) / 1e9
      val c = (mx.getProcessCpuTime - c0) / 1e9
      println(f"XPROBE $name wall=$w%.2f cpu=$c%.1f cores=${c / w}%.1f rows=$n")
    }
    val docs = Tables.documents(spark, d)
    val isBench = col("doc_id") % 20 === 0
    val tagged = Tables.fanOut(docs.filter(!isBench)
      .select(col("doc_id"), col("text"), lit(false).as("__bench"))
      .unionByName(docs.filter(isBench)
        .select(col("doc_id"), col("text"), lit(true).as("__bench"))))
    val shd0 = tagged.select(col("doc_id"), col("__bench"),
      explode(graft.functions.CharShingleSig(lower(col("text")), 0, 0)
        .getField("hs")).as("hf"))
    args.headOption.getOrElse("all") match {
      case "scan" =>
        time("scan_sum_length") {
          tagged.select(sum(length(col("text")))).collect()(0).getLong(0)
        }
      case "scan_nofan" =>
        val raw = docs.select(col("doc_id"), col("text"))
        time("scan_nofan") {
          raw.select(sum(length(col("text")))).collect()(0).getLong(0)
        }
      case "explode_nofan" =>
        val raw = docs.select(col("doc_id"), col("text"))
        time("explode_nofan") {
          raw.select(explode(graft.functions.CharShingleSig(
              lower(col("text")), 0, 0).getField("hs")).as("hf"))
            .select(count(col("hf"))).collect()(0).getLong(0)
        }
      case "explode" =>
        time("explode_only") {
          shd0.select(count(col("hf"))).collect()(0).getLong(0)
        }
      case "exchange" =>
        val parts = Tables.sizeScaledPartitions(docs.filter(!isBench))
        println("XPROBE parts=" + parts)
        time("explode_plus_exchange") {
          shd0.repartition(parts, col("hf"))
            .select(count(col("hf"))).collect()(0).getLong(0)
        }
      case "agg" =>
        val parts = Tables.sizeScaledPartitions(docs.filter(!isBench))
        val cap = 50
        val perHash = shd0.repartition(parts, col("hf")).groupBy("hf").agg(
          graft.functions.BoundedSet.collect(
            when(col("__bench"), col("doc_id")), cap).as("bs"),
          graft.functions.BoundedSet.collect(
            when(!col("__bench"), col("doc_id")), cap).as("cs"))
          .filter(col("bs").isNotNull && col("cs").isNotNull &&
            size(col("bs")) + size(col("cs")) <= cap &&
            size(col("bs")) > 0 && size(col("cs")) > 0)
        time("through_agg") { perHash.count() }
      case "full" =>
        time("full_x18") {
          graft.operators.Decontaminate.x18(spark, d).count()
        }
    }
    spark.stop()
  }
}
