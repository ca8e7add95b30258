package graft

class GraftExtensionsSpec extends SparkSpec {

  test("custom expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .head.getDouble(0)
    assert(dot == 11.0)
    val inter = spark.sql(
      "SELECT sorted_intersect_size(array(1L, 2L, 5L), array(2L, 5L, 7L))")
      .head.getInt(0)
    assert(inter == 2)
    val h = spark.sql("SELECT md5_prefix60(cast('hello' as binary))")
      .head.getLong(0)
    assert(h == functions.PortableHash.h60("hello"))
    // the sketch AGGREGATES resolve and aggregate from plain SQL too
    val hll = spark.sql(
      "SELECT hll_sketch(v).v_empty FROM VALUES ('a'), ('b'), ('a') AS t(v)")
      .head.getInt(0)
    assert(hll == functions.Hll.M - 2)
    val cms = spark.sql(
      "SELECT aggregate(cms_sketch(v), 0L, (a, x) -> a + x) " +
        "FROM VALUES ('a'), ('b'), ('a') AS t(v)")
      .head.getLong(0)
    assert(cms == 3L * functions.Cms.Depth)
  }

  test("compiled text kernels are callable from SQL (round-13 gap)") {
    GraftExtensions.register(spark)
    val bg = spark.sql("SELECT bigram_stats('A b a b a') AS s")
      .selectExpr("s.n_bigrams", "s.n_distinct", "s.top_cnt").head
    // bigrams of [a b a b a]: "a b"×2, "b a"×2 -> 4 total, 2 distinct
    assert((bg.getLong(0), bg.getLong(1), bg.getLong(2)) == (4L, 2L, 2L))
    assert(spark.sql("SELECT bigram_stats('one')").head.isNullAt(0),
      "<2-word doc must yield NULL")
    val tc = spark.sql(
      "SELECT inline(term_counts('b a b')) ORDER BY term").collect()
    assert(tc.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 1L), ("b", 2L)))
    // th carries the engine's portable hash
    assert(tc.find(_.getString(0) == "a").get.getLong(2) ==
      functions.PortableHash.h60("a"))
  }

  test("extensions class wires into a fresh session") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[1]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // same JVM: builder returns the active session; registration still
    // must leave the function resolvable
    GraftExtensions.register(s2)
    assert(s2.sql("SELECT dot_product(array(1.0D), array(2.0D))")
      .head.getDouble(0) == 2.0)
  }
}
