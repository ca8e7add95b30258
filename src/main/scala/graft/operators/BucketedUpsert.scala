package graft.operators

import java.io.File

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-bucketed, versioned upsert state for foreachBatch sinks — the
  * scale fix for the "rewrite the whole key table every micro-batch"
  * upsert wall (the reference keeps its `messages` table current with
  * per-row SQLite upserts, phone_message_producer.py:207-233; a
  * columnar store can't point-write, so the unit of rewrite must be
  * something smaller than "all keys": here, a hash bucket of keys).
  *
  * Layout: `stateBase/v<batchId>/gbucket=<b>/part-*.parquet`. Each
  * micro-batch writes ONE version directory holding ONLY the buckets
  * its keys hash into (one Spark write job, `partitionBy(gbucket)`);
  * a bucket's current content is the newest version that contains it.
  * Untouched buckets are never read, never rewritten — per-batch I/O is
  * O(|keys in touched buckets|), not O(|all keys|). At 100 TB this is
  * the difference between a sink that keeps up and one whose batch time
  * grows with table size: with enough buckets (thousands at cluster
  * scale — the count is a parameter), a batch touching k keys rewrites
  * ≈ k/|keys| of the table. A transactional table format's MERGE does
  * the same dance with its own file-level conflict tracking; this is
  * the dependency-free equivalent with an explicit exactly-once proof.
  *
  * Exactly-once without transactions: batch N's inputs are (a) the
  * batch rows and (b) each touched bucket's newest version STRICTLY
  * BELOW N — never vN itself — so a replayed batch (failure between
  * sink write and checkpoint commit) re-reads exactly what the first
  * attempt read and overwrites vN with the same content. Superseded
  * leaves are GC'd only BELOW the version just read: the replay's
  * inputs survive GC by construction, and batches before N cannot
  * replay (their checkpoint entries are committed).
  */
object BucketedUpsert {

  /** Partition column the state layout uses. Not underscore-prefixed:
    * Spark's file listing treats `_`-prefixed paths as hidden, which
    * would make the bucket leaves invisible to read-back. */
  val BucketCol = "gbucket"

  def bucketExpr(key: Column, numBuckets: Int): Column =
    pmod(hash(key), lit(numBuckets))

  /** All committed version dirs under `stateBase`, as (id, dir). */
  private def versionDirs(stateBase: File): Seq[(Long, File)] =
    Option(stateBase.listFiles()).getOrElse(Array.empty[File]).toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
      .flatMap(f =>
        scala.util.Try(f.getName.drop(1).toLong).toOption.map(_ -> f))

  private def leafOf(vDir: File, b: Int): Option[File] = {
    val leaf = new File(vDir, s"$BucketCol=$b")
    if (leaf.isDirectory) Some(leaf) else None
  }

  /** For each requested bucket: (version id, leaf dir) of the newest
    * version strictly below `before` that contains it. Buckets that
    * have never been written are absent from the result. */
  private def latestLeaves(stateBase: File, buckets: Iterable[Int],
      before: Long): Map[Int, (Long, File)] = {
    val vs = versionDirs(stateBase).filter(_._1 < before).sortBy(-_._1)
    buckets.iterator.flatMap { b =>
      vs.iterator
        .flatMap { case (id, d) => leafOf(d, b).map(l => b -> ((id, l))) }
        .nextOption()
    }.toMap
  }

  /** Apply one micro-batch. `reduced` must already be the batch's
    * per-key reduction (unique on `keyCol`); `merge` is the caller's
    * upsert semantics (target, updates) => new target — it sees only
    * the touched buckets' rows and must carry target-only rows through
    * (e.g. [[Merge.merge]]). Idempotent per the contract above. */
  def applyBatch(s: SparkSession, stateBase: File, numBuckets: Int,
      batchId: Long, reduced: DataFrame, keyCol: String,
      merge: (DataFrame, DataFrame) => DataFrame): Unit = {
    require(numBuckets > 0, s"numBuckets must be positive: $numBuckets")
    require(!reduced.columns.contains(BucketCol),
      s"input must not already carry a '$BucketCol' column")
    // Touched-bucket set: ≤ numBuckets small ints to the driver — the
    // one driver materialization, bounded by the bucket count, never by
    // data volume.
    val touched = reduced
      .select(bucketExpr(col(keyCol), numBuckets).as(BucketCol))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    if (touched.isEmpty) return // empty batch: state unchanged, no version
    val prior = latestLeaves(stateBase, touched, batchId)
    val target =
      if (prior.isEmpty) reduced.filter(lit(false))
      else s.read.parquet(prior.valuesIterator.map(_._2.getAbsolutePath)
        .toSeq: _*)
    val merged = merge(target, reduced)
      .withColumn(BucketCol, bucketExpr(col(keyCol), numBuckets))
    // One job; static overwrite replaces any partial vN from a crashed
    // earlier attempt at this same batch.
    merged.write.partitionBy(BucketCol).mode("overwrite")
      .parquet(new File(stateBase, s"v$batchId").getAbsolutePath)
    // GC leaves superseded by this batch: every touched bucket's leaves
    // OLDER than the one just read (the read one stays — it is the
    // replay's input). Then drop version dirs left with no leaves.
    val older = versionDirs(stateBase).filter(_._1 < batchId)
    for ((vid, vdir) <- older; b <- touched
         if !prior.get(b).exists(_._1 == vid))
      leafOf(vdir, b).foreach(graft.TempDirs.deleteRecursively)
    for ((_, vdir) <- older
         if Option(vdir.listFiles()).getOrElse(Array.empty[File])
           .forall(!_.isDirectory))
      graft.TempDirs.deleteRecursively(vdir)
  }

  /** The table as of the last applied batch: every bucket's newest
    * leaf, one multi-path scan (no bucket column — it lives in the
    * directory names, and the leaves are the read roots). Returns None
    * when no batch has ever written. */
  def currentState(s: SparkSession, stateBase: File,
      numBuckets: Int): Option[DataFrame] = {
    val leaves = latestLeaves(stateBase, 0 until numBuckets, Long.MaxValue)
    if (leaves.isEmpty) None
    else Some(s.read.parquet(
      leaves.valuesIterator.map(_._2.getAbsolutePath).toSeq: _*))
  }
}
