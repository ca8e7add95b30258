package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc drive main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // drive the Avro wire + Kafka frame path through the public API
    val msgs = streaming.Generator.batch(spark, 20L).as[streaming.MessageStatus]
    val framed = sources.KafkaIO.frame(msgs)
    framed.show(3, truncate = true)
    val back = sources.KafkaIO.unframe(framed).collect().toSet
    println(s"[drive] avro roundtrip equal: ${back == msgs.collect().toSet} (n=${back.size})")

    // drive ParquetStore insert-if-absent
    val dir = java.nio.file.Files.createTempDirectory("drive").toString + "/t"
    sources.ParquetStore.insertIfAbsent(spark, Seq((1L,"a"),(2L,"b")).toDF("k","v"), dir, "k")
    sources.ParquetStore.insertIfAbsent(spark, Seq((2L,"X"),(3L,"c")).toDF("k","v"), dir, "k")
    val rows = spark.read.parquet(dir).collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    println(s"[drive] store rows: $rows")

    // drive SQL registration
    GraftExtensions.register(spark)
    println("[drive] sql dot = " + spark.sql("SELECT dot_product(array(1.0D,2.0D), array(3.0D,4.0D))").head.getDouble(0))
    spark.stop()
  }
}
