package graft.tools

import graft.{SparkEntry, SparkSpec}

/** Spark-side pins for the differential fuzz harness (the DuckDB half
  * runs via tools/fuzz_gate.py — this suite proves the generator is
  * deterministic and that every target query survives the degenerate
  * shapes, so a failing fuzz seed is always replayable and always a
  * semantics diff, never a generator race or a crash). */
class FuzzSpec extends SparkSpec {

  test("same seed generates identical tables; different seeds differ") {
    val a = Fuzz.genRows(7L)
    val b = Fuzz.genRows(7L)
    val c = Fuzz.genRows(8L)
    assert(a.keySet == b.keySet)
    a.foreach { case (t, (schema, rows)) =>
      assert(b(t)._1 == schema)
      assert(b(t)._2 == rows, s"table $t not deterministic")
    }
    assert(a.exists { case (t, (_, rows)) => c(t)._2 != rows })
  }

  test("generated corpus hits the degenerate shapes it promises") {
    // across a handful of seeds: at least one empty table, one 1-row
    // table, NULLs, an empty document, and a duplicate text — the
    // shapes the fuzz gate exists to exercise (a pool drift that stops
    // generating them would silently weaken the gate)
    val all = (1L to 8L).map(s => Fuzz.genRows(s))
    val counts = all.flatMap(_.collect { case (t, (_, rows))
      if t != "region" && t != "nation" => rows.size })
    assert(counts.contains(0), "no empty table in seeds 1-8")
    assert(counts.contains(1), "no single-row table in seeds 1-8")
    val docs = all.flatMap(_.apply("documents")._2)
    val texts = docs.map(_.get(1)).filter(_ != null).map(_.toString)
    assert(docs.exists(_.get(1) == null), "no NULL text")
    assert(texts.contains(""), "no 0-byte document")
    assert(texts.size != texts.distinct.size, "no duplicate text")
    assert(texts.exists(_.exists(_ > 0x7f)), "no non-ASCII text")
  }

  test("every fuzz target runs green on a degenerate seed") {
    // seed 1's tables land on the small/empty end; the queries must
    // not throw and must produce their declared columns
    val dir = java.nio.file.Files
      .createTempDirectory("graft_fuzz_spec_").toFile
    try {
      Fuzz.writeSeed(spark, 1L, dir.getAbsolutePath)
      Fuzz.Targets.foreach { name =>
        val df = SparkEntry.queries(name)(spark, dir.getAbsolutePath)
        df.collect() // must not throw on empty/1-row/NULL-laden input
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }
}
