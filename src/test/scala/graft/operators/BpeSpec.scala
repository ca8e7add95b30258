package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins [[Bpe.bpeTrain]]: the greedy leftmost-non-overlapping merge on
  * the adversarial symbol shapes (same-symbol runs, alternating pairs,
  * shared-boundary occurrences — exactly where a string-replace
  * implementation or a naive window formulation diverges from textbook
  * BPE), the deterministic winner tie-break, and the gate shape. */
class BpeSpec extends SparkSpec {

  private def docs(texts: String*): DataFrame = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  /** One merge round's re-tokenization of a single word, via the
    * library entry (rounds = 1, the word is the whole corpus). */
  private def mergeOnce(word: String): (String, String, Seq[String]) = {
    val (merges, dict) = Bpe.bpeTrain(docs(word), rounds = 1)
    val m = merges.head.collect().head
    val a = dict.select(col("a")).collect().head.getSeq[String](0)
    (m.getString(0), m.getString(1), a)
  }

  test("same-symbol run merges every other pair (textbook greedy)") {
    // "aaaa": pair (a,a) wins with count 3; greedy -> [aa, aa]
    assert(mergeOnce("aaaa") === (("a", "a", Seq("aa", "aa"))))
    // odd run: [aa, aa, a]
    assert(mergeOnce("aaaaa") === (("a", "a", Seq("aa", "aa", "a"))))
  }

  test("alternating pair merges every occurrence despite shared boundaries") {
    // "xyxyxy": (x,y) count 3 beats (y,x) count 2; all three merge
    assert(mergeOnce("xyxyxy") === (("x", "y", Seq("xy", "xy", "xy"))))
  }

  test("winner tie-break is (cnt DESC, p, q)") {
    // "abcd" has pairs ab, bc, cd each once -> lexicographic first: (a,b)
    val (p, q, a) = mergeOnce("abcd")
    assert((p, q) === (("a", "b")))
    assert(a === Seq("ab", "c", "d"))
  }

  test("merged symbols participate in later rounds") {
    // Round 1 on "abab abab": (a,b) -> [ab, ab]; round 2 must merge the
    // MERGED symbols: (ab, ab) -> [abab]
    val (merges, dict) = Bpe.bpeTrain(docs("abab abab"), rounds = 2)
    val m2 = merges(1).collect().head
    assert((m2.getString(0), m2.getString(1)) === (("ab", "ab")))
    val arrays = dict.select(col("a")).collect().map(_.getSeq[String](0)).toSet
    assert(arrays === Set(Seq("abab")))
  }

  test("winner symbols containing quotes/backslashes fold correctly") {
    // the winner pair is ((', ') from the word ''''' — symbols that
    // would corrupt any SQL-text interpolation of the fold; the DSL
    // lit() path must round-trip them (same for backslash)
    val (m1, dict1) = Bpe.bpeTrain(docs("'' '' \\z"), rounds = 1)
    val w1 = m1.head.collect().head
    assert((w1.getString(0), w1.getString(1)) === (("'", "'")))
    val a1 = dict1.select(col("a")).collect().map(_.getSeq[String](0)).toSet
    assert(a1 === Set(Seq("''"), Seq("\\", "z")))
    val (m2, dict2) = Bpe.bpeTrain(docs("\\\\ \\\\"), rounds = 1)
    val w2 = m2.head.collect().head
    assert((w2.getString(0), w2.getString(1)) === (("\\", "\\")))
    assert(dict2.select(col("a")).collect().map(_.getSeq[String](0)).toSet
      === Set(Seq("\\\\")))
  }

  test("single-char and non-matching words pass through untouched") {
    val (_, dict) = Bpe.bpeTrain(docs("aa z qr"), rounds = 1)
    val byWord = dict.select(col("a")).collect().map(_.getSeq[String](0)).toSet
    // winner is (a,a); z stays [z], qr stays [q, r]
    assert(byWord === Set(Seq("aa"), Seq("z"), Seq("q", "r")))
  }

  test("x73 encode: hand corpus token counts under the trained merges") {
    // corpus "aa ab" x2 + "b": round-1 winner is (a,a) (cnt 2 beats
    // (a,b)'s 2? no - both 2, tie-break (p,q) picks (a,a)); after one
    // merge: aa->[aa] (1 token), ab->[a,b] (2), b->[b] (1)
    val d = docs("aa ab aa ab b")
    val (_, dict) = Bpe.bpeTrain(d, rounds = 1)
    val got = Bpe.bpeEncodeCounts(
      d, dict).collect().map(r => (r.getLong(1), r.getLong(2))).head
    // 5 words; tokens: aa(1)+ab(2)+aa(1)+ab(2)+b(1) = 7
    assert(got === ((5L, 7L)))
  }

  test("x73 invariants on sf0.001: n_words <= n_tokens, join is total") {
    import org.apache.spark.sql.functions._
    val rows = Bpe.x73(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(2) >= r.getLong(1)),
      "a word is never fewer than one token")
    // the tokenizer was trained on this corpus, so the encode join is
    // TOTAL: per-doc word counts must equal the raw word relation's
    val raw = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.forall(r => raw(r.getLong(0)) == r.getLong(1)))
  }

  test("x66 gate shape on sf0.001: 3 merge rows + inventory, positive counts") {
    val rows = Bpe.x66(spark, sf).collect()
    val items = rows.map(_.getString(0))
    assert(items.count(_.startsWith("m")) === 3)
    assert(items.filter(_.startsWith("m")).toSet
      === Set("m1:e+r", "m2:o+r", "m3:i+n")) // pinned fixture merges
    assert(rows.forall(_.getLong(1) > 0))
    assert(items.count(_.startsWith("s:")) === rows.length - 3)
  }
}
