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
}
