package graft

/** Shared temp-directory lifecycle for the fixture-shaped caches
  * (sentinels, event splits, dims, evolved layouts): one recursive
  * delete implementation and one register-at-exit path instead of a
  * copy per call site. */
private[graft] object TempDirs {

  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }

  /** Register `dir` for recursive deletion at JVM exit and return it. */
  def deleteOnExit(dir: java.io.File): java.io.File = {
    Runtime.getRuntime.addShutdownHook(
      new Thread(() => deleteRecursively(dir)))
    dir
  }

  /** Scratch root for `spark.local.dir` (shuffle files, spills, block
    * manager): tmpfs when the host has one, else the JVM temp dir —
    * the same host-shortcut rationale as the replays' scratch
    * checkpoints. The r15 jstack profile of the replay bench showed
    * RUNNABLE executor threads concentrated in
    * BypassMergeSortShuffleWriter's per-partition file writes +
    * concatenation on the default /tmp (a virtualized, co-tenant-
    * contended disk); shuffle data here is transient by definition and
    * never needs to survive the app. Production clusters point
    * spark.local.dir at their fast local devices — this picks this
    * box's. SPARK_GRAFT_LOCAL_DIR overrides (e.g. back to /tmp for
    * A/B). */
  def sparkLocalDir(): String =
    sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) "/dev/shm"
      else System.getProperty("java.io.tmpdir")
    })
}
