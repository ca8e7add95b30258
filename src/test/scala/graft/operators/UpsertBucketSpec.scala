package graft.operators

import java.io.File

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The scale contract of [[BucketedUpsert]]: a batch rewrites ONLY the
  * buckets its keys hash into. Byte-identity of every untouched
  * bucket's files across a batch is asserted directly (path + length +
  * mtime + content), as is replay idempotence AFTER the GC pass — the
  * crash window the versioned layout is designed around. */
class UpsertBucketSpec extends SparkSpec {

  private val B = 8

  private def df(rows: Seq[(String, Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("messageId", "timestamp", "status")
  }

  private def hp(f: File): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(f.getAbsolutePath)

  private def apply(state: File, id: Long,
      rows: Seq[(String, Long, String)]): Unit =
    BucketedUpsert.applyBatch(spark, hp(state), B, id, df(rows), "messageId",
      StreamingQueries.latestWinsMerge)

  private def bucketOf(key: String): Int =
    df(Seq((key, 0L, "x")))
      .select(BucketedUpsert.bucketExpr(col("messageId"), B))
      .head().getInt(0)

  /** Every regular file under `root`, keyed by relative path, with the
    * observable identity a rewrite would disturb. */
  private def fileMap(root: File): Map[String, (Long, Long, Seq[Byte])] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[File]).toSeq.flatMap(walk)
      else Seq(f)
    walk(root).map { f =>
      val rel = root.toPath.relativize(f.toPath).toString
      rel -> ((f.length(), f.lastModified(),
        java.nio.file.Files.readAllBytes(f.toPath).toSeq))
    }.toMap
  }

  private def state(root: File): Seq[(String, Long, String)] =
    BucketedUpsert.currentState(spark, hp(root), B).get.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq

  test("a batch leaves untouched buckets byte-identical") {
    val root = java.nio.file.Files.createTempDirectory("graft_bk_").toFile
    try {
      val keys = (0 until 20).map(i => s"k$i")
      apply(root, 0, keys.map(k => (k, 10L, "sent")))
      val hot = keys.head
      val hotBucket = bucketOf(hot)
      // batch 1 touches exactly one key -> exactly one bucket
      val before = fileMap(root)
      apply(root, 1, Seq((hot, 20L, "delivered")))
      val after = fileMap(root)
      val (hotBefore, coldBefore) =
        before.partition(_._1.contains(s"${BucketedUpsert.BucketCol}=$hotBucket"))
      // every untouched bucket's files: still present, same lengths,
      // same mtimes, same bytes — provably not rewritten
      assert(after.view.filterKeys(coldBefore.contains).toMap == coldBefore,
        "untouched buckets must not be rewritten")
      assert(coldBefore.keys.forall(after.contains),
        "no untouched-bucket file may be deleted")
      // everything NEW lives under the batch's own version dir
      assert((after.keySet -- before.keySet).forall(_.startsWith("v1/")),
        "a batch may only add files under its own version dir")
      // the touched bucket's new content lives in v1; its v0 leaf is
      // RETAINED (it is batch 1's replay input — the crash window) ...
      assert(after.keys.exists(_.startsWith(
        s"v1/${BucketedUpsert.BucketCol}=$hotBucket")))
      assert(hotBefore.keys.forall(after.contains),
        "the leaf a batch read must survive that batch's GC (replay input)")
      // ... and is GC'd once a LATER batch supersedes it (batch 2 reads
      // v1, so v0's leaf can no longer be anyone's replay input)
      apply(root, 2, Seq((hot, 30L, "read")))
      val afterGc = fileMap(root)
      assert(hotBefore.keys.forall(p => !afterGc.contains(p)),
        "a twice-superseded leaf must be GC'd")
      assert(afterGc.view.filterKeys(coldBefore.contains).toMap == coldBefore,
        "untouched buckets must still be byte-identical after GC")
      // and the merged table is the fold
      val expect = keys.map(k =>
        if (k == hot) (k, 30L, "read") else (k, 10L, "sent"))
        .sortBy(_._1)
      assert(state(root) == expect)
    } finally graft.TempDirs.deleteRecursively(root)
  }

  test("replaying a batch after its GC pass is a no-op (crash window)") {
    val root = java.nio.file.Files.createTempDirectory("graft_bk_").toFile
    try {
      apply(root, 0, Seq(("a", 10L, "sent"), ("b", 5L, "sent")))
      apply(root, 1, Seq(("a", 20L, "delivered"), ("c", 1L, "sent")))
      val once = state(root)
      // crash between sink write+GC and checkpoint commit -> the SAME
      // batchId replays in full; the leaf batch 1 read (a/b's newest
      // below v1) must have survived GC for this to reproduce
      apply(root, 1, Seq(("a", 20L, "delivered"), ("c", 1L, "sent")))
      assert(state(root) == once, "replay must reproduce the same table")
      // a later batch over the same keys still folds correctly
      apply(root, 2, Seq(("b", 9L, "delivered")))
      assert(state(root) == Seq(("a", 20L, "delivered"),
        ("b", 9L, "delivered"), ("c", 1L, "sent")))
    } finally graft.TempDirs.deleteRecursively(root)
  }

  test("bucketState(before) reads strictly-pre-batch state (replay determinism)") {
    val root = java.nio.file.Files.createTempDirectory("graft_bk_").toFile
    try {
      apply(root, 0, Seq(("a", 10L, "sent")))
      apply(root, 1, Seq(("a", 20L, "delivered")))
      val b = bucketOf("a")
      def at(before: Long): Seq[(String, Long, String)] =
        BucketedUpsert.bucketState(spark, hp(root), B, Seq(b), before)
          .map(_.select("messageId", "timestamp", "status").collect()
            .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq)
          .getOrElse(Nil)
      // a consumer classifying batch 1 must see batch 0's row even
      // AFTER v1 landed — that is what makes a replayed batch's
      // derived output (s19's diff verdicts) byte-identical
      assert(at(1L) == Seq(("a", 10L, "sent")))
      assert(at(2L) == Seq(("a", 20L, "delivered")))
      // a bucket with no state at the horizon reads as None/empty
      assert(at(0L).isEmpty)
    } finally graft.TempDirs.deleteRecursively(root)
  }

  test("state path may carry an explicit filesystem scheme (file:)") {
    // the HDFS/S3 claim's local proof: discovery, write, GC and
    // read-back all resolve the FileSystem FROM the path URI — a
    // scheme-qualified root must behave identically to a bare path
    val root = java.nio.file.Files.createTempDirectory("graft_bk_").toFile
    try {
      val qualified =
        new org.apache.hadoop.fs.Path(root.toURI) // file:/... URI form
      def applyQ(id: Long, rows: Seq[(String, Long, String)]): Unit =
        BucketedUpsert.applyBatch(spark, qualified, B, id, df(rows),
          "messageId", StreamingQueries.latestWinsMerge)
      applyQ(0, Seq(("a", 10L, "sent"), ("b", 5L, "sent")))
      applyQ(1, Seq(("a", 20L, "delivered")))
      val got = BucketedUpsert.currentState(spark, qualified, B).get
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
        .sortBy(_._1).toSeq
      assert(got == Seq(("a", 20L, "delivered"), ("b", 5L, "sent")))
      // and the bare-path view of the same root reads the same state
      assert(state(root) == got)
    } finally graft.TempDirs.deleteRecursively(root)
  }

  test("knownTouched path is equivalent to the self-computed bucket set") {
    // the r15 job shave: a caller that already collected its batch's
    // bucket set passes it in; the resulting layout, GC and table must
    // be identical to the self-computed path, including an unsorted /
    // duplicated caller-side set
    val a = java.nio.file.Files.createTempDirectory("graft_bk_").toFile
    val b = java.nio.file.Files.createTempDirectory("graft_bk_").toFile
    try {
      val batches = Seq(
        0L -> Seq(("a", 10L, "sent"), ("b", 5L, "sent"), ("c", 2L, "sent")),
        1L -> Seq(("a", 20L, "delivered"), ("d", 1L, "sent")),
        2L -> Seq(("b", 9L, "delivered")))
      for ((id, rows) <- batches) {
        apply(a, id, rows)
        val touched = rows.map(r => bucketOf(r._1))
        BucketedUpsert.applyBatch(spark, hp(b), B, id, df(rows),
          "messageId", StreamingQueries.latestWinsMerge,
          knownTouched = Some(touched.reverse ++ touched)) // unsorted+dups
      }
      assert(state(a) == state(b), "tables must match")
      def layout(root: File): Set[String] = {
        def walk(f: File): Seq[File] =
          if (f.isDirectory)
            Option(f.listFiles()).getOrElse(Array.empty[File]).toSeq.flatMap(walk)
          else Seq(f)
        walk(root).map(f => root.toPath.relativize(f.toPath).getParent.toString)
          .toSet
      }
      assert(layout(a) == layout(b),
        "version/bucket leaf layout (incl. GC) must match")
    } finally {
      graft.TempDirs.deleteRecursively(a)
      graft.TempDirs.deleteRecursively(b)
    }
  }

  test("empty batches write no version; state readable across versions") {
    val root = java.nio.file.Files.createTempDirectory("graft_bk_").toFile
    try {
      assert(BucketedUpsert.currentState(spark, hp(root), B).isEmpty)
      apply(root, 0, Seq(("a", 10L, "sent")))
      apply(root, 1, Seq.empty)
      assert(!new File(root, "v1").exists(),
        "an empty batch must not write a version dir")
      apply(root, 2, Seq(("z", 3L, "sent")))
      // a/z may live in different version dirs -> multi-path scan
      assert(state(root) == Seq(("a", 10L, "sent"), ("z", 3L, "sent")))
    } finally graft.TempDirs.deleteRecursively(root)
  }
}
