package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: x02 edge-count scaling across fixture scales (x64's 100×
  * attribution — is |E| linear or quadratic in replicas?). */
object EdgeCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for ((tag, d) <- Seq("1x" -> "/root/testdata/sf0.1",
        "10x" -> "/tmp/sfbig", "100x" -> "/tmp/sf100x")) {
      val docs = graft.Tables.documents(spark, d)
      val nd = docs.count()
      val t0 = System.nanoTime()
      val e = graft.operators.Dedup.nearDupWordPairs(docs).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"EDGES $tag docs=$nd pairs=$e (${sec}%.1f s)")
      graft.Graft.unpersistSignatures()
    }
    spark.stop()
  }
}
