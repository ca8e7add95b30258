package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Pins [[Diff.corpusDiff]]'s classification (all four statuses from a
  * hand-built snapshot pair, including the removed-AND-edited
  * precedence) and the gate's overlap rules on the fixture. */
class DiffSpec extends SparkSpec {

  private def snap(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("classifies added, removed, changed, unchanged") {
    val a = snap(Seq(1L -> "one", 2L -> "two", 3L -> "three"))
    val b = snap(Seq(2L -> "two", 3L -> "three EDITED", 4L -> "four"))
    val got = Diff.corpusDiff(a, b).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("identical snapshots are fully unchanged") {
    val a = snap(Seq(1L -> "x", 2L -> "y"))
    val st = Diff.corpusDiff(a, a).collect().map(_.getString(1)).toSet
    assert(st === Set("unchanged"))
  }

  test("x69 gate on sf0.001: statuses follow the simulation rules") {
    // the addition offset is max(doc_id)+1, derived from the corpus —
    // collision-proof at any fixture size (round-9 advice)
    val off = graft.Tables.documents(spark, sf)
      .agg(org.apache.spark.sql.functions.max("doc_id")).head().getLong(0) + 1L
    val rows = Diff.x69(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val byStatus = rows.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    // removals: exactly the id % 7 == 0 docs (precedence over the edit
    // rule — doc 0 matches both and must be removed)
    assert(byStatus("removed").forall(_ % 7 == 0))
    assert(byStatus("removed").contains(0L))
    // additions: exactly the re-ingested id+offset keys
    assert(byStatus("added").forall(id => id >= off && (id - off) % 11 == 0))
    // changes: edited (id % 5 == 0) and not removed
    assert(byStatus("changed").forall(id => id % 5 == 0 && id % 7 != 0))
    // everything else unchanged
    assert(byStatus("unchanged").forall(id =>
      id < off && id % 7 != 0 && id % 5 != 0))
  }
}
