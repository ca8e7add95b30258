package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table write paths replacing the reference's SQLite store (C3):
  * columnar parquet instead of a row store; the B-tree indexes'
  * filter-acceleration role (A15) is played by partition pruning +
  * parquet min/max row-group skipping.
  */
object ParquetStore {

  /** A10 — append (INSERT INTO messages ...,
    * phone_message_producer.py:189-194). */
  def append(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** ONE lock namespace per qualified path, shared by every same-driver
    * mutator of a directory: insertIfAbsent's read-then-append window
    * AND compact/recoverCompact's rename window — a writer proceeding
    * under a separate lock while the compactor swaps directories would
    * have its just-committed rows deleted with the _compact_old copy.
    * Keys are scheme-qualified so "/data/t" and "file:/data/t" resolve
    * to the same lock. Cross-driver coordination still needs a
    * transactional table format. */
  private val pathLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def pathLock(spark: SparkSession, path: String): Object = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    pathLocks.computeIfAbsent(fs.makeQualified(p).toString, _ => new Object)
  }

  /** A11 — insert-if-absent on a unique key (INSERT OR IGNORE,
    * phone_message_producer.py:133-151): dedup the incoming batch on
    * the key, then anti-join against what the table already holds.
    * At scale both sides stay distributed (shuffle on the key); with a
    * transactional table format the same statement is a MERGE.
    *
    * Atomicity: the reference's INSERT OR IGNORE is atomic; a plain
    * read-then-append is not — two concurrent writers can both pass the
    * anti-join and double-insert. Within one driver JVM a per-path lock
    * serializes writers (covered by a concurrent-writer test); ACROSS
    * drivers this operation requires a transactional table format's
    * MERGE or an external single-writer arrangement — plain parquet
    * directories have no commit protocol to coordinate on. */
  def insertIfAbsent(spark: SparkSession, df: DataFrame, path: String,
      key: String): Unit = {
    pathLock(spark, path).synchronized {
      val fresh = df.dropDuplicates(key)
      val toWrite =
        if (!exists(spark, path)) fresh
        else {
          val existing = spark.read.parquet(path).select(key)
          fresh.join(existing, Seq(key), "left_anti")
        }
      toWrite.write.mode(SaveMode.Append).parquet(path)
    }
  }

  /** A12/A13 counters as a derived view instead of point UPDATEs: the
    * reference mutates total_messages_sent/delivered per row
    * (phone_message_producer.py:197-233); columnar-idiomatic form is a
    * groupBy recount, which is exactly what the UPDATE maintained. */
  def counters(messages: DataFrame): DataFrame =
    messages.groupBy("phoneNumber")
      .agg(
        count(lit(1)).as("total_messages_sent"),
        count(when(col("status") === "delivered", 1))
          .as("total_messages_delivered"))

  /** A15 — the reference's secondary indexes (idx_messages_status /
    * idx_messages_phone, phone_message_producer.py:108-109) map to
    * partition layout: writing partitioned by the filter column turns
    * `WHERE status = ...` into directory pruning (the scan never opens
    * non-matching partitions), the columnar analogue of an index seek. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: String*): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed write: pre-shuffles the table ONCE at write time so every
    * subsequent equi-join/aggregation on the bucket key runs with no
    * exchange at all — the decisive technique for repeated big joins at
    * 100 TB (both sides bucketed on the join key => zero-shuffle
    * sort-merge join). Requires a catalog table (saveAsTable). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      nBuckets: Int): Unit = {
    // Unqualified names only: the stale-location cleanup below derives
    // the managed path from (current database, name), and a qualified
    // name would make that derivation — and the recursive delete it
    // feeds — point somewhere else.
    require(!table.contains("."),
      s"writeBucketed takes an unqualified table name, got '$table'")
    val s = df.sparkSession
    // Idempotent re-create: the in-memory catalog forgets tables across
    // JVMs but the managed-table directory survives, and CREATE refuses
    // a location that already exists — drop the table, then remove the
    // directory ONLY if it is now orphaned (no catalog entry).
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    if (!s.catalog.tableExists(table)) {
      val db = s.catalog.currentDatabase
      val wh = new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir"))
      val loc = new org.apache.hadoop.fs.Path(
        if (db == "default") wh else new org.apache.hadoop.fs.Path(wh, s"$db.db"),
        table.toLowerCase)
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ~targetMB-sized files, preserving every row — the hygiene pass
    * that follows streaming sinks and fine-grained appends at scale
    * (thousands of KB-sized files turn a scan into a file-listing
    * benchmark). Output file count = ceil(inputBytes / targetMB),
    * floor 1; the rewrite stages into a sibling directory, renames the
    * live directory aside, renames the staging directory into place,
    * then deletes the old data — the live path is absent only between
    * two metadata renames (not during the data rewrite), and a crash at
    * any point leaves the full dataset in a discoverable named
    * directory (`path`, `path + "_compact_old"`, or
    * `path + "_compact_tmp"`) and the next [[compact]] call recovers it
    * automatically (see [[recoverCompact]], also callable standalone
    * from read paths). NOTE a contract change vs the pre-round-4 swap:
    * a concurrent reader hitting the two-rename window sees a transient
    * FileNotFound rather than old-or-new data — retry the read, or
    * schedule compaction in a maintenance window. Directory rename is
    * atomic on HDFS and POSIX but NOT on object stores (S3 renames are
    * copies), and, like [[insertIfAbsent]], cross-driver coordination
    * needs a transactional table format. Returns
    * (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, path: String, targetMB: Int = 128): (Int, Int) = pathLock(spark, path).synchronized {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverCompact(spark, path)
    val parts = fs.listStatus(p)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val bytes = parts.map(_.getLen).sum
    val nOut = math.max(1L, (bytes + targetMB * (1L << 20) - 1) /
      (targetMB * (1L << 20))).toInt
    val tmp = new org.apache.hadoop.fs.Path(path + "_compact_tmp")
    val old = new org.apache.hadoop.fs.Path(path + "_compact_old")
    spark.read.parquet(path).repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val nAfter = fs.listStatus(tmp)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    if (fs.exists(old)) fs.delete(old, true) // leftover from a prior crash
    // Hadoop rename reports failure by RETURNING false, not throwing —
    // an unchecked false here would silently lose the swap
    require(fs.rename(p, old), s"compact: rename $p -> $old failed")
    require(fs.rename(tmp, p), s"compact: rename $tmp -> $p failed")
    fs.delete(old, true)
    (parts.length, nAfter)
  }

  /** Recover from a [[compact]] crash: if the live directory is absent
    * but `_compact_old` survives (crash between the two renames), the
    * old data is renamed back into place; an orphaned `_compact_tmp`
    * (crash during the staging rewrite) is deleted — its contents were
    * never the only copy. Idempotent and cheap (two metadata probes) —
    * safe to call from read paths before opening a compacted
    * directory. */
  def recoverCompact(spark: SparkSession, path: String): Unit = pathLock(spark, path).synchronized {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + "_compact_tmp")
    val old = new org.apache.hadoop.fs.Path(path + "_compact_old")
    if (!fs.exists(p) && fs.exists(old))
      require(fs.rename(old, p), s"recoverCompact: rename $old -> $p failed")
    if (fs.exists(tmp)) fs.delete(tmp, true)
  }

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }
}
