package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The s10 exactly-once story under an actual STOP and RESTART: a
  * foreachBatch bucketed-upsert stream is stopped after its first
  * batches, more source files arrive, and a new query resumes from the
  * SAME checkpoint — the final table must equal the one-shot fold.
  * This pins the two halves of the contract the gated query can't
  * exercise in one uninterrupted run: offset recovery (no batch lost,
  * no batch re-consumed into a different version) and sink idempotence
  * across the restart boundary — now through [[BucketedUpsert]], so
  * the restart also crosses the per-bucket version chains. */
class UpsertRecoverySpec extends SparkSpec {

  private val NumBuckets = 4

  private def latestOf(batch: DataFrame): DataFrame =
    batch.groupBy("messageId")
      .agg(max(struct(col("timestamp"), col("status"))).as("m"))
      .select(col("messageId"), col("m.timestamp").as("timestamp"),
        col("m.status").as("status"))

  test("upsert sink survives stop + new files + checkpoint restart") {
    import spark.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("graft_rec_src_")
    val stateBase = java.nio.file.Files.createTempDirectory("graft_rec_st_")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rec_ck_")
    def writeFile(n: Int, rows: Seq[(String, Long, String)]): Unit =
      rows.toDF("messageId", "timestamp", "status").coalesce(1)
        .write.mode("overwrite")
        .parquet(srcDir.resolve(s"gen$n").toString)
    // generation 1: two files = two batches (maxFilesPerTrigger=1)
    writeFile(0, Seq(("a", 10L, "sent"), ("b", 5L, "sent")))
    writeFile(1, Seq(("a", 20L, "delivered"), ("c", 1L, "sent")))
    val schema = latestOf(Seq(("x", 0L, "x"))
      .toDF("messageId", "timestamp", "status")).schema

    def startQuery() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir.toString)
      .writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        BucketedUpsert.applyBatch(spark,
          new org.apache.hadoop.fs.Path(stateBase.toString), NumBuckets,
          batchId, latestOf(batch), "messageId",
          StreamingQueries.latestWinsMerge)
      }
      .start()

    try {
      val q1 = startQuery()
      q1.processAllAvailable()
      q1.stop() // hard stop: the "failure"
      assert(stateBase.resolve("v1").toFile.isDirectory,
        "two batches must have committed before the stop")
      // generation 2 lands while the pipeline is down
      writeFile(2, Seq(("b", 7L, "delivered"), ("d", 3L, "sent")))
      writeFile(3, Seq(("a", 15L, "late"), ("d", 9L, "delivered")))
      val q2 = startQuery() // SAME checkpoint: resumes at batch 2
      q2.processAllAvailable()
      q2.stop()
      val lastV = stateBase.toFile.listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("v"))
        .map(_.getName.drop(1).toInt).max
      assert(lastV == 3, s"restart must continue numbering, got v$lastV")
      val got = BucketedUpsert
        .currentState(spark, new org.apache.hadoop.fs.Path(stateBase.toString),
          NumBuckets).get
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
        .sortBy(_._1).toSeq
      // one-shot truth over all four generations; ("a",15,"late") loses
      // to ("a",20,"delivered") — a late arrival must NOT regress state
      assert(got == Seq(("a", 20L, "delivered"), ("b", 7L, "delivered"),
        ("c", 1L, "sent"), ("d", 9L, "delivered")))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      Seq(srcDir, stateBase, ckpt).foreach(p => rm(p.toFile))
    }
  }
}
