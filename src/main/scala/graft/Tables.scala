package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader over a driver-provided scale-factor directory
  * (TESTDATA.md). One parquet file per table; schema inferred from the
  * file footer so predicate pushdown / column pruning apply from the scan.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** `events.ts` has shipped in two physical encodings across fixture
    * generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized
    * reader rejects unless read as Long via the legacy nanosAsLong
    * session flag) and plain TIMESTAMP(MICROS) (which reads natively).
    * Normalize BOTH to a session-zone TimestampType column carrying the
    * same instant, so every downstream query is fixture-encoding
    * agnostic. The NTZ->LTZ cast is instant-preserving because every
    * graft entry point pins spark.sql.session.timeZone=UTC, matching
    * DuckDB's naive-timestamp reading of the same file.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(s.read.parquet(eventsPath(s, d)))

  private val NanosKey = "spark.sql.legacy.parquet.nanosAsLong"

  private val eventsPathCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A parquet path for the events fixture that THIS session can read
    * natively, without mutating session configuration: the original
    * file when the session's reader accepts it (TIMESTAMP(MICROS)
    * encoding, or a session that already carries the legacy nanos
    * flag — all graft entry points do); otherwise a once-per-app
    * normalized temp copy with ts rewritten to standard
    * TIMESTAMP(MICROS). The legacy flag is set only around the EAGER
    * normalization write — safe to save/restore, unlike around a lazy
    * scan, which consults the conf later at physical-planning time —
    * so no configuration leaks into co-tenant queries of a caller's
    * session. Shared by the batch loader and both streaming replay
    * sources, so every path reads one encoding. First call per
    * (app, dir) pays one read+write job of the events table (the
    * fixture-normalization cost the session-wide flag used to hide);
    * cached and cleaned at JVM exit after that. */
  def eventsPath(s: SparkSession, d: String): String =
    eventsPathCache.computeIfAbsent(
      s"${s.sparkContext.applicationId}|$d", _ => {
        val raw = s"$d/events.parquet"
        val readable =
          try { s.read.parquet(raw).schema; true }
          catch { case _: Exception => false }
        if (readable) raw
        else normalizeLock.synchronized {
          // the global lock serializes only NORMALIZATIONS (rare: once
          // per fixture dir per app) so two concurrent normalizations
          // of different dirs cannot interleave their set/restore of
          // the session flag and leak a stale value
          val dir = TempDirs.deleteOnExit(
            java.nio.file.Files.createTempDirectory("graft_events_norm_")
              .toFile)
          val out = new java.io.File(dir, "events").getAbsolutePath
          val prev = s.conf.getOption(NanosKey)
          s.conf.set(NanosKey, "true")
          try normalizeEventTs(s.read.parquet(raw))
            .write.mode("overwrite").parquet(out)
          finally prev match {
            case Some(v) => s.conf.set(NanosKey, v)
            case None => s.conf.unset(NanosKey)
          }
          out
        }
      })

  private val normalizeLock = new Object

  /** Nanos-as-long => integer DIV to micros (a double roundtrip would
    * lose precision above 2^53); native timestamp => cast to the
    * session-zone type. Shared by the batch loader and the streaming
    * replay source so the two paths cannot drift. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Spread a narrow input across the cluster when it arrives in fewer
    * splits than the session's parallelism. The shingle operators
    * multiply input bytes ~8× in their map stage (explode + one md5 per
    * character position), so a small-file input — one row group at test
    * scale factors — serializes exactly the most compute-heavy stage on
    * one core (measured: x18's shingle stage ran at ~1.2 cores of 32).
    * The repartition shuffles only the raw input bytes, trivial next to
    * the blowup behind it. At corpus scale the scan already carries
    * >= cores splits and this is an identity — no shuffle is added.
    *
    * Use ONLY on linear single-consumer pipelines (x18). On the LSH
    * dedup family it was measured 1.2-4× SLOWER: their signature
    * relation feeds multiple join branches whose exchange-reuse pattern
    * the extra repartition breaks (x02 0.83s -> 3.48s). */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < math.max(2, target / 2))
      df.repartition(target)
    else df
  }

  /** Partition count for an exchange whose row volume scales with the
    * byte size of a file-backed input: `max(defaultParallelism,
    * inputBytes / bytesPerPartition)`, capped at 1024. Partition COUNT
    * never changes a result — only where a fixed count would sort/spill
    * partitions far larger than executor memory at a rehearsal scale
    * the session's parallelism was not sized for (x18's one pinned
    * shingle exchange ships ~500 M rows at the 100× corpus; 32
    * partitions sort-spilled it to 69 s). Non-file inputs (or any
    * listing failure) fall back to the floor — identical to the old
    * fixed behavior. */
  def sizeScaledPartitions(df: DataFrame,
      bytesPerPartition: Long = 1L << 20): Int = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism.toLong
    val bytes = inputBytes(df)
    // The parallelism floor only applies as far as the DATA can fill
    // it: a pinned 32-way exchange under a sub-MB input is 32 task
    // launches for a handful of near-empty sorts/aggregations (r14
    // scaling table: x18's 8-core run beat its 32-core run ~2x on
    // identical code). One floor "slot" per bytesPerPartition/16 of
    // input (64 KB at the 1 MB default) reproduces the measured-good
    // counts: sf0.1 (~0.6 MB) -> ~9, the 10x rehearsal (~6 MB) -> the
    // full parallelism, exactly as before. Non-file inputs (bytes 0)
    // keep the old fixed-parallelism behavior.
    val floor =
      if (bytes == 0L) parallelism
      else math.min(parallelism,
        math.max(2L, bytes / math.max(1L, bytesPerPartition / 16)))
    math.min(1024L, math.max(floor, bytes / bytesPerPartition)).toInt
  }

  /** As [[sizeScaledPartitions]] but with NO parallelism floor: purely
    * `clamp(inputBytes / bytesPerPartition, 1, 1024)`. For exchanges a
    * query PINS because AQE's byte-based coalescing under-parallelizes
    * its CPU-heavy follow-up work (x14's per-key window): the count
    * must track the DATA, not the machine — at bench scale a
    * core-count floor put 32 near-empty tasks under a ~2 MB input
    * (measured 1.9x the 8-partition wall), while at the 10x rehearsal
    * the same bytes rule yields >= the core count. Partition count
    * never changes a result. */
  def bytesScaledPartitions(df: DataFrame, bytesPerPartition: Long): Int =
    math.min(1024L, math.max(1L, inputBytes(df) / bytesPerPartition)).toInt

  /** Total length of the file-backed inputs of `df`; 0 for non-file
    * inputs or on any listing failure. Reads the ANALYZED plan, not
    * `df.inputFiles`: the latter walks the optimized plan, where cache
    * substitution (e.g. the bench's fixture cache) has already replaced
    * the file relation with an InMemoryRelation and the file list comes
    * back empty — which silently collapsed every byte-scaled partition
    * count to its floor. */
  private def inputBytes(df: DataFrame): Long =
    try {
      val conf = df.sparkSession.sparkContext.hadoopConfiguration
      val files: Seq[String] = df.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fr: org.apache.spark.sql.execution.FileRelation =>
              fr.inputFiles.toSeq
            case _ => Seq.empty[String]
          }
      }.flatten
      files.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(conf).getFileStatus(p).getLen
      }.sum
    } catch { case scala.util.control.NonFatal(t) =>
      System.err.println(s"inputBytes fallback (0): ${t.getClass.getName}: ${t.getMessage}")
      0L
    }
}
