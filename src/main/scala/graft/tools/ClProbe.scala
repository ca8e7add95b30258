package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-off diagnostic: does the context classloader (the codegen
  * cache's key component) change between streaming query runs? */
object ClProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.artifact.isolation.enabled",
        sys.env.getOrElse("CLPROBE_ISOLATION", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (run <- 1 to 2) {
      val src = java.nio.file.Files.createTempDirectory("clprobe_src_")
      Seq(1L, 2L).toDF("v").write.parquet(src.toString + "/f")
      val ck = java.nio.file.Files.createTempDirectory("clprobe_ck_")
      val q = spark.readStream.schema("v long").parquet(src.toString + "/*")
        .writeStream.option("checkpointLocation", ck.toString)
        .foreachBatch { (b: DataFrame, id: Long) =>
          val execCl = b.rdd.mapPartitions { _ =>
            Iterator(String.valueOf(Thread.currentThread().getContextClassLoader))
          }.collect().toSet
          println(s"CLPROBE run$run batch$id " +
            s"driverThread=${Thread.currentThread().getName} " +
            s"driverCl=${Thread.currentThread().getContextClassLoader} " +
            s"execCl=$execCl")
          ()
        }.start()
      q.processAllAvailable(); q.stop()
    }
    spark.stop()
  }
}
