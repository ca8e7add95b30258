package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc drive main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.001"
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
    sources.ParquetStore.writeBucketed(o, "drv_orders", "o_custkey", 8)
    sources.ParquetStore.writeBucketed(c, "drv_customer", "c_custkey", 8)
    val joined = spark.table("drv_orders")
      .join(spark.table("drv_customer").hint("merge"),
        col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    println("[drive] join rows = " + joined.count())
    println("[drive] exchanges in plan = " + "Exchange".r.findAllIn(plan).length)
    println(plan.linesIterator.take(6).mkString("\n"))
    spark.stop()
  }
}
