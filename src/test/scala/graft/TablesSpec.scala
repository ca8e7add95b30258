package graft

/** The events-fixture encoding contract: a session WITHOUT the legacy
  * parquet-nanos flag must still read the NANOS-encoded fixture through
  * [[Tables.events]] — via the once-per-app normalized copy — and the
  * loader must not leave any session configuration behind. (Sessions
  * that carry the flag, like every graft entry point, read the original
  * file directly; that path is exercised by every other suite.) */
class TablesSpec extends SparkSpec {

  private val NanosKey = "spark.sql.legacy.parquet.nanosAsLong"

  test("events reads a NANOS fixture without the session flag, no conf leak") {
    // a fresh fixture dir => a fresh eventsPath cache key, so this test
    // exercises the probe+normalize branch even though earlier suites
    // already cached the flag-assisted raw path for the shared sf dir
    val tmpD = java.nio.file.Files.createTempDirectory("graft_tables_")
    try {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/events.parquet"),
        tmpD.resolve("events.parquet"))
      val withFlag = Tables.events(spark, sf).count()
      spark.conf.unset(NanosKey)
      // unset reverts a registered conf to its DEFAULT ("false"), not
      // to absence — capture that baseline and require the loader to
      // leave it untouched
      val baseline = spark.conf.getOption(NanosKey)
      assert(!baseline.contains("true"))
      try {
        // the raw probe must fail for this test to mean anything — if
        // the fixture generation moved to MICROS this becomes vacuous
        // (and the raw path is then the one taken, equally conf-clean)
        val df = Tables.events(spark, tmpD.toString)
        assert(df.schema("ts").dataType ==
          org.apache.spark.sql.types.TimestampType)
        assert(df.count() == withFlag,
          "normalized copy must carry every fixture row")
        assert(spark.conf.getOption(NanosKey) == baseline,
          "the loader must not leak the legacy flag into the session")
      } finally spark.conf.set(NanosKey, "true")
    } finally TempDirs.deleteRecursively(tmpD.toFile)
  }
}
