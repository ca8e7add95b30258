package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc drive main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val useShm = sys.env.get("GRAFT_SHM").contains("1")
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    if (useShm) {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("/dev/shm/graft-scratch"))
      b.config("spark.local.dir", "/dev/shm/graft-scratch")
        .config("spark.sql.streaming.checkpointLocation", "/dev/shm/graft-ckpt")
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    operators.StreamingQueries.s01(spark, "/root/testdata/sf0.001").count()
    def t(name: String)(f: => Any): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"[t] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }
    t("s01")(operators.StreamingQueries.s01(spark, d).count())
    t("s02")(operators.StreamingQueries.s02(spark, d).count())
    t("x04")(operators.Dedup.x04(spark, d).count())
    spark.stop()
  }
}
