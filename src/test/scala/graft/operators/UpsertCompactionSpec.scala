package graft.operators

import java.io.File

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The file-count-hygiene contract of [[BucketedUpsert.compact]]:
  * leaves over the file threshold shrink, rows are preserved exactly,
  * leaves at or under the threshold stay byte-identical, and a batch
  * REPLAYED through a compacted state (the crash window) still
  * converges to the same table — compaction changes layout, never
  * content, so the exactly-once proof survives it. */
class UpsertCompactionSpec extends SparkSpec {

  private val B = 4

  private def df(rows: Seq[(String, Long, String)], parts: Int): DataFrame = {
    import spark.implicits._
    rows.toDF("messageId", "timestamp", "status").repartition(parts)
  }

  private def hp(f: File): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(f.getAbsolutePath)

  private def apply(state: File, id: Long, parts: Int,
      rows: Seq[(String, Long, String)]): Unit =
    BucketedUpsert.applyBatch(spark, hp(state), B, id, df(rows, parts),
      "messageId", StreamingQueries.latestWinsMerge)

  private def state(root: File): Seq[(String, Long, String)] =
    BucketedUpsert.currentState(spark, hp(root), B).get.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq

  private def leafFiles(root: File): Map[String, Seq[String]] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[File]).toSeq.flatMap(walk)
      else Seq(f)
    walk(root)
      .filter(_.getName.endsWith(".parquet"))
      .groupBy(f => root.toPath.relativize(f.getParentFile.toPath).toString)
      .view.mapValues(_.map(_.getName).sorted.toSeq).toMap
  }

  private def fileMap(root: File): Map[String, (Long, Seq[Byte])] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[File]).toSeq.flatMap(walk)
      else Seq(f)
    walk(root).map { f =>
      root.toPath.relativize(f.toPath).toString ->
        ((f.length(), java.nio.file.Files.readAllBytes(f.toPath).toSeq))
    }.toMap
  }

  test("compaction shrinks over-threshold leaves and preserves rows") {
    val root = java.nio.file.Files.createTempDirectory("graft_cp_").toFile
    try {
      // a wide batch written from many partitions -> many part files
      val keys = (0 until 64).map(i => s"k$i")
      apply(root, 0, 16, keys.map(k => (k, 10L, "sent")))
      val before = state(root)
      val filesBefore = leafFiles(root)
      assert(filesBefore.values.exists(_.size > 2),
        "fixture must produce multi-file leaves for the test to bite")
      val (n, was, now) =
        BucketedUpsert.compact(spark, hp(root), B, maxFiles = 2)
      assert(n > 0 && now < was, s"expected shrink, got n=$n $was->$now")
      val filesAfter = leafFiles(root)
      assert(filesAfter.values.forall(_.size <= 2),
        s"every compacted leaf must come out small: $filesAfter")
      assert(state(root) == before, "compaction must not change rows")
      // no staging/aside directories may survive
      assert(!fileMap(root).keys.exists(p =>
        p.contains("_compact_tmp") || p.contains("_compact_old")))
    } finally graft.TempDirs.deleteRecursively(root)
  }

  test("leaves at or under the threshold stay byte-identical") {
    val root = java.nio.file.Files.createTempDirectory("graft_cp_").toFile
    try {
      // single-partition write -> one file per leaf, under any threshold
      apply(root, 0, 1, (0 until 16).map(i => (s"k$i", 10L, "sent")))
      val before = fileMap(root)
      val (n, _, _) = BucketedUpsert.compact(spark, hp(root), B, maxFiles = 2)
      assert(n == 0, "no leaf over threshold -> nothing to compact")
      assert(fileMap(root) == before,
        "under-threshold leaves must not be rewritten")
    } finally graft.TempDirs.deleteRecursively(root)
  }

  test("a batch replayed through a compacted state is idempotent") {
    val root = java.nio.file.Files.createTempDirectory("graft_cp_").toFile
    try {
      val keys = (0 until 32).map(i => s"k$i")
      apply(root, 0, 8, keys.map(k => (k, 10L, "sent")))
      // batch 1 updates half the keys, then the sink compacts
      val upd = keys.take(16).map(k => (k, 20L, "delivered"))
      apply(root, 1, 8, upd)
      val expected = state(root)
      BucketedUpsert.compact(spark, hp(root), B, maxFiles = 1)
      assert(state(root) == expected, "compaction must not change rows")
      // crash-replay of batch 1 (checkpoint never committed): re-apply
      // over the compacted layout -- must re-read the same prior rows
      // and converge to the same table
      apply(root, 1, 8, upd)
      assert(state(root) == expected,
        "replay through a compacted state must be a no-op")
      // and the sink keeps working after the replay
      apply(root, 2, 8, Seq((keys.head, 30L, "read")))
      assert(state(root).find(_._1 == keys.head).get._3 == "read")
    } finally graft.TempDirs.deleteRecursively(root)
  }

  // ---- skewed-cluster fixture: s20's (label, member) members store ----

  /** s20's members-store merge: the batch's rows for a touched label
    * REPLACE that label's row set; del markers clear merged-away
    * labels. Mirrors StreamingQueries.s20's memUpserts lambda. */
  private val memMerge: (DataFrame, DataFrame) => DataFrame =
    (t, u) => t.drop("del")
      .join(u.select("lbl"), Seq("lbl"), "left_anti")
      .unionByName(u.filter(!col("del")).drop("del"))

  private def memDf(rows: Seq[(Long, java.lang.Long, Boolean)],
      parts: Int): DataFrame = {
    import spark.implicits._
    rows.toDF("lbl", "member", "del").repartition(parts)
  }

  private def memState(root: File): Set[(Long, Long)] =
    BucketedUpsert.currentState(spark, hp(root), B).get.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("skewed multi-row-per-key store: mega-cluster merge, compaction, replay") {
    val root = java.nio.file.Files.createTempDirectory("graft_cp_").toFile
    try {
      // batch 0: one mega-cluster (label 0, 10k members — the common-
      // boilerplate shape at scale) plus 50 singletons. Row layout
      // means the mega-cluster spreads over partitions/files like any
      // relation — the array-per-label layout this replaced would have
      // concentrated it into one row.
      val mega = (0L until 10000L).map(m => (0L, java.lang.Long.valueOf(m), false))
      val singles = (20000L until 20050L)
        .map(l => (l, java.lang.Long.valueOf(l), false))
      BucketedUpsert.applyBatch(spark, hp(root), B, 0,
        memDf(mega ++ singles, 16), "lbl", memMerge)
      assert(memState(root).size == 10050)
      // batch 1: singleton 20007 merges INTO the mega-cluster (rewrite
      // label 0's complete row set + delete marker for 20007)
      val merged = (0L until 10000L).map(m => (0L, java.lang.Long.valueOf(m), false)) ++
        Seq((0L, java.lang.Long.valueOf(20007L), false),
          (20007L, null.asInstanceOf[java.lang.Long], true))
      BucketedUpsert.applyBatch(spark, hp(root), B, 1,
        memDf(merged, 16), "lbl", memMerge)
      val expected = memState(root)
      assert(expected.count(_._1 == 0L) == 10001)
      assert(!expected.exists(_._1 == 20007L))
      assert(expected.size == 10050) // 10001 mega + 49 singletons
      // compaction over the skewed layout preserves every row
      BucketedUpsert.compact(spark, hp(root), B, maxFiles = 1)
      assert(memState(root) == expected)
      // crash-replay of the merge batch through the compacted state
      BucketedUpsert.applyBatch(spark, hp(root), B, 1,
        memDf(merged, 16), "lbl", memMerge)
      assert(memState(root) == expected,
        "replayed mega-cluster merge must be a no-op")
    } finally graft.TempDirs.deleteRecursively(root)
  }
}
