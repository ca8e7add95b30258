package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The public facade must work on arbitrary user DataFrames (not the
  * fixtures), and the streaming generator must compose with the
  * detector end-to-end over a live rate source. */
class GraftFacadeSpec extends SparkSpec {

  test("facade operators run on user-constructed DataFrames") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content with nothing shared at all here"))
      .toDF("doc_id", "text")
    val dups = Graft.nearDupPairs(docs).collect()
    assert(dups.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(dups.head.getLong(2) == 1000000L) // identical docs: jaccard 1.0

    val langs = Graft.languageId(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(langs(1L) == "en" && langs(2L) == "en")
    assert(langs(3L) == "und") // no stopword markers present

    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val knn = Graft.annTopK(emb, Seq(0L)).collect()
    assert(knn.head.getLong(1) == 1L) // nearest to (1,0) is (0.9,0.1)

    // survivor corpus: the near-dup pair {1,2} collapses to the longer
    // member (tie -> smaller id = 1); the unique doc 3 survives
    val withLen = docs.withColumn("n_chars", length(col("text")))
    val kept = Graft.survivorCorpus(withLen, Graft.nearDupPairs(docs))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))

    // novelty: doc 2 duplicates doc 1 exactly -> zero novel grams
    val nov = Graft.noveltyScores(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(nov(1L) == 1000000L && nov(2L) == 0L)

    val verdicts = Graft.qualityFilter(docs, minTokens = 50).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(verdicts.values.toSet == Set("too_short")) // all < 50 tokens

    val js = Seq(("a", """{"k": 7}""")).toDF("g", "props")
    assert(Graft.jsonFieldStats(js, "props", "g").collect()
      .head.getLong(2) == 7L)

    // sampled quantiles: a 3-row group fits inside k, so the sample IS
    // the group and the median is the exact middle length
    val lens = docs.withColumn("len", length(col("text")))
      .withColumn("g", lit("all"))
    val sq = Graft.sampleQuantiles(lens, "g", "doc_id", "len").collect().head
    assert(sq.getAs[Long]("n") == 3L && sq.getAs[Int]("m") == 3)
    val exactLens = docs.collect().map(_.getString(1).length.toDouble).sorted
    assert(sq.getAs[Double]("p50") == exactLens(1))
  }

  test("text operators tolerate null and empty text without throwing") {
    import spark.implicits._
    val docs = Seq(
      (1L, "normal document text here with several words"),
      (2L, null.asInstanceOf[String]),
      (3L, ""),
      (4L, "x")).toDF("doc_id", "text")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(coalesce(col("text"), lit(""))))
    // every text-surface entry must run to completion on degenerate rows
    val results = Seq(
      "nearDupPairs" -> Graft.nearDupPairs(docs),
      "nearDupCharPairs" -> Graft.nearDupCharPairs(docs),
      "simhashPairs" -> Graft.simhashPairs(docs),
      "languageId" -> Graft.languageId(docs),
      "qualityScore" -> Graft.qualityScore(docs),
      "tokenCounts" -> Graft.tokenCounts(docs),
      "fingerprints" -> Graft.fingerprints(docs),
      "repetitionStats" -> Graft.repetitionStats(docs),
      "tfIdfTopK" -> Graft.tfIdfTopK(docs),
      "qualityFilter" -> Graft.qualityFilter(docs),
      "unigramScores" -> Graft.unigramScores(docs),
      "noveltyScores" -> Graft.noveltyScores(docs),
      "exactSubstrStats" -> Graft.exactSubstrStats(docs),
      "containmentPairs" -> Graft.containmentPairs(docs),
      "vocabTopK" -> Graft.vocabTopK(docs),
      "stratifiedSample" -> Graft.stratifiedSample(docs),
      "lengthStats" -> Graft.lengthStats(docs),
      "tokenBudgetSample" -> Graft.tokenBudgetSample(docs),
      "shardAssign" -> Graft.shardAssign(docs),
      "redactPii" -> Graft.redactPii(docs),
      "cleanCorpus" -> Graft.cleanCorpus(docs),
      "editDistancePairs" -> Graft.editDistancePairs(docs),
      "bigramScores" -> Graft.bigramScores(docs),
      "lengthQuartiles" -> Graft.lengthQuartiles(docs.withColumn("lang",
        lit("en"))))
    results.foreach { case (name, df) =>
      val n = try df.count() catch {
        case t: Throwable => fail(s"$name threw on null/empty text: $t")
      }
      assert(n >= 0, name)
    }
  }

  test("gram matrix and user sequences are exact on tiny inputs") {
    import spark.implicits._
    // 2-dim vectors with a hand-computable second moment:
    // G = [[1+4, 2+6], [., 4+9]] = [[5, 8], [., 13]]
    val emb = Seq((0L, Array(1.0f, 2.0f)), (1L, Array(2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val g = Graft.gramMatrix(emb, dim = 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(g == Map((0, 0) -> 50000L, (0, 1) -> 80000L, (1, 1) -> 130000L))

    val ev = Seq(
      (7L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), "b"),
      (7L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), "a"),
      (7L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), "a"),
      (9L, java.sql.Timestamp.valueOf("2024-01-01 00:00:05"), "z"))
      .toDF("user_id", "ts", "event_type")
    val seqs = Graft.userSequences(ev).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    // same-instant events tie-break by event_type: a before b
    assert(seqs == Map(7L -> "a,a,b", 9L -> "z"))
  }

  test("rate-source generator composes with the detector end-to-end") {
    import spark.implicits._
    // live Structured Streaming pipeline: rate source -> generator
    // projection -> stateful detector -> memory sink
    val stream = streaming.Generator.stream(spark, rowsPerSecond = 200)
      .as[streaming.MessageStatus]
    val qn = "e2e_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = Graft.undeliveredAlerts(stream, timeoutMs = 1000L,
        watermarkDelay = "1 second").writeStream
      .format("memory").queryName(qn).outputMode("append")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    try {
      // rate events are all 'sent' with real wall-clock event times; as
      // the watermark advances past t+1s each key must alert
      val deadline = System.currentTimeMillis() + 60000
      var n = 0L
      while (n == 0 && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        n = spark.table(qn).count()
      }
      assert(n > 0, "no alerts emitted within 60s of rate-source run")
    } finally q.stop()
  }
}
