package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: x64 and its edge count on the LINEAR-edge 100x fixture
  * (build_sfbig.py mode=distinct), for the round-13 attribution of
  * x64's 100x absolute on the near-dup replica fixture. */
object X64Linear {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf100x_lin")
    val docs = graft.Tables.documents(spark, d)
    val t0 = System.nanoTime()
    val e = graft.operators.Dedup.nearDupWordPairs(docs).count()
    println(f"X64LIN edges=$e (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    graft.Graft.unpersistSignatures()
    // two timed x64 runs, min reported (first run warms)
    val times = (1 to 2).map { _ =>
      val t = System.nanoTime()
      graft.operators.Propagate.x64(spark, d).count()
      graft.Graft.unpersistSignatures()
      (System.nanoTime() - t) / 1e9
    }
    println(f"X64LIN x64 runs=${times.map(t => f"$t%.1f").mkString(",")} min=${times.min}%.1f s")
    spark.stop()
  }
}
