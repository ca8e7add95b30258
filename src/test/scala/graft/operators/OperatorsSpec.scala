package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sanity invariants per operator family (exact value parity is the
  * oracle harness's job — graft.Verify + tools/compare_oracle.py). */
class OperatorsSpec extends SparkSpec {

  test("every declared query runs and most return rows at sf0.001") {
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, name)
    }
  }

  test("every query has an oracle") {
    val missing = graft.SparkEntry.queries.keySet --
      graft.SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("q02 top-k stays within the limit and is ordered") {
    val rows = Relational.q02(spark, sf).collect()
    assert(rows.length == 100)
    // o_orderdate reads back as TIMESTAMP_NTZ => LocalDateTime
    val dates = rows.map(_.getAs[java.time.LocalDateTime](1)
      .toEpochSecond(java.time.ZoneOffset.UTC))
    assert(dates.sameElements(dates.sorted))
  }

  test("near-dup pairs are canonical (a < b) and above threshold") {
    val rows = Dedup.x02(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) >= 800000L) // jac_u micro-units
    }
  }

  test("simhash banding finds all close pairs found brute-force") {
    // banded result must equal brute force exactly for hd <= 3
    val banded = Dedup.x03(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded.nonEmpty || Dedup.x03(spark, sf).count() == 0)
  }

  test("ann_lsh results are a subset of brute-force candidates per query") {
    val brute = Similarity.x06(spark, sf)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.x07(spark, sf).collect()
    // every LSH neighbor must share the query's bucket and rank <= 10
    assert(lsh.forall(_.getInt(3) <= 10))
    assert(lsh.nonEmpty)
    val recall = lsh.map(r => (r.getLong(0), r.getLong(1)))
      .count(brute.contains).toDouble / math.max(lsh.length, 1)
    info(f"LSH top-10 overlap with brute force: $recall%.2f")
  }

  test("filtered ann = brute force over the label-restricted corpus") {
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.embeddings(spark, sf)
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = Similarity.annFiltered(emb, 0L until 5L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // every neighbor shares its query's label (post-filtering an
    // unfiltered top-k could not guarantee this)
    got.foreach { case (qid, vid, _, _) =>
      assert(labels(vid) == labels(qid), s"$vid not in $qid's label") }
    // and per query it IS the exact brute-force answer on the
    // label-restricted corpus
    for (q <- 0L until 5L) {
      val restricted = emb.filter(col("label") === labels(q))
      val want = Similarity.annBrute(restricted, Seq(q)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      assert(got.filter(_._1 == q).toSet == want, s"query $q")
    }
  }

  test("connected components merge transitively and split disjointly") {
    import spark.implicits._
    // component {1..5} is a pure CHAIN — every merge is transitive-only
    // (no pair links 1 to 5 directly), which is exactly what the
    // pair-based keep-first policy cannot express; {10,11} and {20,21,22}
    // must stay separate.
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L),
      (11L, 10L), (20L, 21L), (21L, 22L)).toDF("a", "b")
    val got = Clusters.connectedComponents(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connected components return empty on an empty pair graph") {
    import spark.implicits._
    val pairs = Seq.empty[(Long, Long)].toDF("a", "b")
    // the normal case for a clean corpus — must not NPE on the null
    // checksum of zero rows
    assert(Clusters.connectedComponents(pairs, "a", "b").count() == 0)
  }

  test("connected components converge within the pass cap on a long chain") {
    import spark.implicits._
    // adversarial topology for label propagation (diameter passes); the
    // star-contraction kernels must do it in O(log n) passes
    val pairs = (1L until 30L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Clusters.connectedComponents(pairs, "a", "b").collect()
    assert(got.length == 30)
    assert(got.forall(_.getLong(1) == 1L), "all labels must reach node 1")
  }

  test("connected components: a 10k-node path graph converges (O(log n))") {
    import spark.implicits._
    // THE pathology min-label propagation could not survive: diameter
    // 10_000 ≫ the 50-pass cap. Large-star/small-star must converge
    // well inside it and label every node with the path's minimum.
    val n = 10000L
    val pairs = spark.range(1, n)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val got = Clusters.connectedComponents(pairs, "a", "b")
      .agg(count(lit(1)), sum(col("lbl")), min(col("id")), max(col("id")))
      .head()
    assert(got.getLong(0) == n, "one label row per node")
    assert(got.getLong(1) == n, s"every label must be 1, sum was ${got.getLong(1)}")
    assert(got.getLong(2) == 1L && got.getLong(3) == n)
  }

  test("connected components match driver union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val nNodes = 60
      val edges = Seq.fill(45)(
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find truth
      val parent = Array.tabulate(nNodes)(identity)
      def find(x: Int): Int = {
        var r = x; while (parent(r) != r) r = parent(r); r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
        .map(v => v -> {
          // component min among nodes that appear in an edge
          val root = find(v.toInt)
          edges.flatMap { case (a, b) => Seq(a, b) }
            .filter(u => find(u.toInt) == root).min
        }).toMap
      val got = Clusters.connectedComponents(
        edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"trial $trial mismatch")
    }
  }

  test("survivor corpus keeps the longest per cluster and all singletons") {
    import spark.implicits._
    // cluster {1,2,3}: lengths 5/9/9 — longest wins, tie broken by the
    // smaller id (2, not 3); doc 4 is in no pair and must survive as-is
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 9L), (4L, 2L))
      .toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val got = Clusters.survivorCorpus(docs, pairs)
      .select("doc_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(2L, 4L))
  }

  test("novelty credits grams to their first document only") {
    import spark.implicits._
    // doc 1 owns all 3 of its grams; doc 2 is an exact dup (novelty 0);
    // doc 3 shares its first gram with doc 1 and introduces 2 new ones
    val docs = Seq((1L, "abcdefghij"), (2L, "abcdefghij"),
      (3L, "abcdefghzz")).toDF("doc_id", "text")
    val got = Dedup.noveltyScores(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((3L, 1000000L)))
    assert(got(2L) == ((3L, 0L)))
    assert(got(3L) == ((3L, 666666L))) // (2 * 1e6) div 3
  }

  test("containment catches a doc embedded in a larger one") {
    import spark.implicits._
    // doc 1 is a strict prefix of doc 2: containment exactly 1.0 even
    // though Jaccard is only ~0.77; doc 3 shares nothing
    val a = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, a), (2L, a + " x y z"),
      (3L, (1 to 12).map(i => s"v$i").mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 1000000L)))
  }

  test("json extraction tolerates malformed rows as nulls") {
    import spark.implicits._
    val df = Seq(("a", """{"k": 5}"""), ("a", "not json"), ("b", """{"k": 2}"""))
      .toDF("event_type", "props")
    val got = Semi.jsonFieldStats(df, "props", "event_type").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.get(2)))).toMap
    // malformed JSON parses to null: counted in n, ignored by sum
    assert(got("a") == ((2L, 5L)))
    assert(got("b") == ((1L, 2L)))
  }

  test("quality filter reports the first failing rule in order") {
    import spark.implicits._
    val long = (1 to 40).map(i => s"unique$i").mkString(" ")
    val docs = Seq(
      (1L, "tiny doc"), // too_short
      (2L, ("spam " * 40).trim), // long enough but repetitive
      (3L, long + " " + long)) // repetitive bigrams, decent quality
      .toDF("doc_id", "text")
    val got = TextOps.qualityFilter(docs, minTokens = 15,
      minScoreU = 0L, maxDupU = 120000L).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(got(1L) == ((false, "too_short")))
    assert(got(2L) == ((false, "repetitive")))
    assert(got(3L) == ((false, "repetitive")))
  }

  test("repetition metrics count duplicate and dominant bigrams") {
    import spark.implicits._
    // "a b a b a b": bigrams (a b, b a, a b, b a, a b) → 5 total, 2
    // distinct, top freq 3; one-word doc has no bigrams and is absent
    val docs = Seq((1L, "a b a b a b"), (2L, "x")).toDF("doc_id", "text")
    val got = TextOps.repetitionStats(docs).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == 1L)
    assert(r.getLong(1) == 5L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 600000L) // floor((1 - 2/5) * 1e6)
    assert(r.getLong(4) == 600000L) // floor(3/5 * 1e6)
  }

  test("tf-idf ranks rare terms above common ones, ties by term") {
    import spark.implicits._
    // 'the' appears in every doc (df=3), 'rare' only in doc 1 (df=1):
    // rare must outrank the despite equal tf
    val docs = Seq((1L, "the rare rare the"), (2L, "the the"),
      (3L, "the other")).toDF("doc_id", "text")
    val top = TextOps.tfIdfTopK(docs, 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top(1L) == "rare")
    assert(top(3L) == "other")
    // doc 2 has only 'the'
    assert(top(2L) == "the")
  }

  test("merge applies matched updates, inserts, and pass-through") {
    import spark.implicits._
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "bal")
    val source = Seq((2L, 5.0), (9L, 99.0)).toDF("sk", "delta")
    val got = Merge.merge(target, source, "k", "sk",
      whenMatched = Map("bal" -> (col("t.bal") + col("s.delta"))),
      insertValues = Map("k" -> col("s.sk"), "name" -> lit("new"),
        "bal" -> col("s.delta")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a", 10.0), // target-only: untouched
      (2L, "b", 25.0),                       // matched: updated
      (9L, "new", 99.0)))                    // source-only: inserted
  }

  test("length stats percentiles are discrete corpus values") {
    val rows = Sampling.x24(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Seq(p25, p50, p90, p99, mx) = (2 to 6).map(r.getLong)
      assert(p25 <= p50 && p50 <= p90 && p90 <= p99 && p99 <= mx)
    }
  }

  test("int8 quantization codes stay in range and error is small") {
    val rows = Similarity.x25(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getInt(3) >= -127 && r.getInt(4) <= 127) // q_min/q_max
      // max|err| per dim is scale/2; sq_err <= dims * (scale/2)^2.
      val dims = r.getInt(1); val scaleU = r.getLong(2)
      val bound = dims.toDouble * math.pow(scaleU / 1e9 / 2, 2) * 1e9
      assert(r.getLong(5) <= math.ceil(bound).toLong + 1, r.toString)
    }
  }

  test("decontamination flags shared-substring pairs, not distractors") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog again and " +
      "again until the benchmark sentence is long enough to shingle"
    val corpus = Seq(
      (1L, s"corpus prefix $shared corpus suffix"),
      (2L, "a completely unrelated document with its own words entirely"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, s"benchmark intro $shared benchmark outro"))
      .toDF("doc_id", "text")
    val got = Decontaminate.overlapPairs(corpus, bench, minOverlap = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 100L)))
  }

  test("token-budget sample respects the per-source cap inclusively") {
    import spark.implicits._
    val docs = (1L to 40L).map(i =>
      (i, ("w " * 100).trim, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "text", "source")
    val got = Sampling.tokenBudgetSample(docs, budget = 350L).collect()
    // each doc is 100 tokens: exactly 3 admitted per source (300 <= 350,
    // a 4th would make 400)
    val bySource = got.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(bySource == Map("a" -> 3, "b" -> 3), bySource.toString)
    got.foreach(r => assert(r.getLong(3) <= 350L))
  }

  test("incremental dedup pairs are directed batch -> corpus") {
    val rows = Dedup.x27(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(0) % 10 == 3, s"batch side must be the batch: $r")
      assert(r.getLong(1) % 10 != 3, s"corpus side must be the corpus: $r")
      assert(r.getLong(2) >= 800000L)
    }
    // the fixture's near-dup groups straddle the 10% split at sf0.001
    assert(rows.nonEmpty)
  }

  test("semDedup removes exactly the vectors with a smaller-id cell-mate") {
    val emb = graft.Tables.embeddings(spark, sf)
    val verdicts = Similarity.semDedup(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val cid = verdicts.map(v => v._1 -> v._2).toMap
    // independent removal recompute: the EXACT all-pairs relation at the
    // same threshold, restricted to same-cell pairs
    val expectRemoved = Dedup.embeddingDupPairsExact(emb, 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => cid(a) == cid(b) }
      .map(_._2).toSet
    val gotRemoved = verdicts.filter(!_._3).map(_._1).toSet
    assert(gotRemoved == expectRemoved)
    assert(gotRemoved.nonEmpty, "fixture must exercise removal")
  }

  test("shard packing matches a sequential driver-side re-fold") {
    val docs = graft.Tables.documents(spark, sf)
    val cap = 500L
    val got = Sampling.shardAssign(docs, cap).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    // independent recompute: per source, fold token counts sequentially
    // in portable-hash order on the driver
    val rows = docs.select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split(" ", -1).length.toLong))
    rows.groupBy(_._2).foreach { case (_, srcRows) =>
      var off = 0L
      srcRows.sortBy { case (id, _, _) =>
        (graft.functions.PortableHash.h60(s"shard_$id"), id)
      }.foreach { case (id, src, toks) =>
        assert(got(id) == ((src, toks, off / cap)), s"doc $id")
        off += toks
      }
    }
  }

  test("interval-join replay equals its batch twin") {
    val ev = graft.Tables.events(spark, sf)
      .withColumn("t", timestamp_millis(unix_millis(col("ts"))))
    val sent = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id").cast("string").as("messageId"),
        col("t").as("sentTime"))
    val dlv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").cast("string").as("d_id"),
        col("t").as("dlvTime"))
    val batch = AsOf.intervalJoin(sent, dlv, "messageId", "d_id",
        "sentTime", "dlvTime", StreamingQueries.JoinBoundMs)
      .select(col("messageId"),
        unix_millis(col("sentTime")).as("sentMs"),
        unix_millis(col("dlvTime")).as("deliveredMs"),
        (unix_millis(col("dlvTime")) - unix_millis(col("sentTime")))
          .as("lag_ms"))
    val a = StreamingQueries.s05(spark, sf).collect()
      .map(_.toSeq.toString).sorted.toSeq
    val b = batch.collect().map(_.toSeq.toString).sorted.toSeq
    assert(a.nonEmpty)
    assert(a == b)
  }

  test("PII redaction masks and counts emails, IPs, and phones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail me at jo.doe+x@example.org or call +1 (555) 123-4567"),
      (2L, "server 10.0.255.3 forwarded to 192.168.1.1 logs"),
      (3L, "clean text with digits 42 and a year 2024"),
      (4L, "a@b.io b@c.io and 555-867-5309"),
      // an IP absorbed into an email match counts once, as an email
      (5L, "ping 1.2.3.4@example.com now")).toDF("doc_id", "text")
    val got = TextOps.redactPii(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text"), r.getAs[Int]("n_emails"),
          r.getAs[Int]("n_ips"), r.getAs[Int]("n_phones"))).toMap
    // the space in "(555) 123-4567" splits the match: only the
    // contiguous digit-punct run is masked
    assert(got(1L) ==
      (("mail me at [EMAIL] or call +1 (555) [PHONE]", 1, 0, 1)))
    assert(got(2L) == (("server [IP] forwarded to [IP] logs", 0, 2, 0)))
    assert(got(3L) == (("clean text with digits 42 and a year 2024", 0, 0, 0)))
    assert(got(4L) == (("[EMAIL] [EMAIL] and [PHONE]", 2, 0, 1)))
    assert(got(5L) == (("ping [EMAIL] now", 1, 0, 0)))
  }

  test("unigram score is the mean corpus token frequency in micro-units") {
    import spark.implicits._
    // corpus tokens: a a a b => total 4, u(a)=750000, u(b)=250000
    val docs = Seq((1L, "a a"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextOps.unigramScores(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((2L, 750000L)))
    assert(got(2L) == ((2L, 500000L)))
  }

  test("session windows merge at exactly-gap spacing, break past it") {
    import spark.implicits._
    // the boundary the s07 oracle must mirror: Spark extends a session
    // whose end TOUCHES the next event; only silence > gap breaks
    val gapMs = 10000L
    val rows = Seq(("k", 0L), ("k", gapMs), ("k", 2 * gapMs + 1))
      .toDF("id", "ms")
      .select(col("id"), timestamp_millis(col("ms")).as("et"))
    val sess = rows
      .groupBy(col("id"), session_window(col("et"), s"${gapMs / 1000} seconds"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("session_window.start")).as("s"),
        unix_millis(col("session_window.end")).as("e"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(sess.toSeq == Seq(
      (0L, 2 * gapMs, 2L),           // t=0 and t=gap merged
      (2 * gapMs + 1, 3 * gapMs + 1, 1L))) // gap+1 of silence breaks
  }

  test("interval join analyzes with identical key names on both sides") {
    import spark.implicits._
    val l = Seq((1L, 1000L), (2L, 5000L)).toDF("user_id", "ms")
      .select(col("user_id"), timestamp_millis(col("ms")).as("sent_ts"))
    val r = Seq((1L, 1500L), (1L, 9999L)).toDF("user_id", "ms")
      .select(col("user_id"), timestamp_millis(col("ms")).as("dlv_ts"))
    val out = AsOf.intervalJoin(l, r, "user_id", "user_id",
      "sent_ts", "dlv_ts", 1000L)
    assert(out.count() == 1) // only the 1500ms delivery is in bound
  }

  test("exact-substring stats count cross-doc windows, not self-repeats") {
    import spark.implicits._
    val shared40 = "a" * 20 + "shared boilerplate span" + "b" * 20
    val docs = Seq(
      (1L, shared40 + " unique tail one xxxxxxxxxxxxxxxxxxxxxxxxxxxxx"),
      (2L, shared40 + " unique tail two yyyyyyyyyyyyyyyyyyyyyyyyyyyyy"),
      (3L, "entirely distinct text " + "z" * 60),
      // self-repetition only: the repeated window occurs twice in THIS
      // doc but nowhere else
      (4L, "q" * 120)).toDF("doc_id", "text")
    val got = Dedup.exactSubstrStats(docs, windowLen = 50).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // docs 1,2 share every window inside the common 63-char prefix
    assert(got(1L)._2 > 0 && got(2L)._2 > 0)
    assert(got(3L)._2 == 0)
    // "q"*120 has 71 window positions but ONE distinct window; owned by
    // doc 4 alone => zero shared
    assert(got(4L) == ((1L, 0L)))
  }

  test("entry flagship returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("lineDedup keeps exactly the first instance of every chunk") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"), // both chunks first: untouched
      (2L, "a b c x y z"), // first chunk is doc 1's: removed
      (3L, "d e f")        // whole doc is doc 1's 2nd chunk: emptied
    ).toDF("doc_id", "text")
    val got = Dedup.lineDedup(docs, chunkWords = 3).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((2L, 0L, "a b c d e f")))
    assert(got(2L) == ((2L, 1L, "x y z")))
    assert(got(3L) == ((1L, 1L, "")))
  }

  test("q25 pivot cells partition the orders count and never go null") {
    val rows = Relational.q25(spark, sf).collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(2) + r.getLong(3)).sum
    assert(total == graft.Tables.orders(spark, sf).count())
    assert(rows.forall(r => !r.isNullAt(1) && !r.isNullAt(2) && !r.isNullAt(3)))
  }

  test("q26 moving frame equals a locally recomputed trailing-7 sum") {
    val rows = Relational.q26(spark, sf).collect()
      .map(r => (r.getAs[java.sql.Date](0).toString, r.getLong(1),
        r.getLong(2)))
      .sortBy(_._1)
    rows.zipWithIndex.foreach { case ((_, _, mv), i) =>
      val expect = rows.slice(math.max(0, i - 6), i + 1).map(_._2).sum
      assert(mv == expect, s"row $i")
    }
  }

  test("q27 emits a contiguous day spine with zero-filled gaps") {
    val rows = Relational.q27(spark, sf).collect()
      .map(r => (r.getAs[java.sql.Date](0).toLocalDate, r.getLong(1)))
      .sortBy(_._1.toEpochDay)
    val days = rows.map(_._1.toEpochDay)
    assert(days.nonEmpty && days.zip(days.tail).forall {
      case (a, b) => b == a + 1 }, "spine must be contiguous")
    // the high-value purchase filter makes the series genuinely sparse
    // at fixture scale: the gap-fill path must really fire, and the
    // spine (bounded by the WHOLE event table) must outspan the series
    assert(rows.exists(_._2 == 0L), "expected at least one filled gap day")
    assert(rows.exists(_._2 > 0L), "expected at least one observed day")
  }

  test("x42 quartiles are ordered and group counts cover the corpus") {
    val rows = TextOps.x42(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum ==
      graft.Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val (p25, p50, p75) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(p25 <= p50 && p50 <= p75, r.getString(0))
    }
  }

  test("x43 re-scores exactly the x04 candidate pairs within prefix bounds") {
    val pairs = Dedup.x04(spark, sf).select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val scored = Dedup.x43(spark, sf).collect()
    assert(scored.map(r => (r.getLong(0), r.getLong(1))).toSet == pairs)
    // distance over 120-char prefixes is bounded by the prefix length
    assert(scored.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= 120))
  }

  test("q28 cube's grand-total row equals the table count") {
    val rows = Relational.q28(spark, sf).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    assert(grand.head.getLong(2) == graft.Tables.orders(spark, sf).count())
    // every grouping set sums back to the grand total
    val fine = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(fine.map(_.getLong(2)).sum == grand.head.getLong(2))
    assert(fine.map(_.getLong(3)).sum == grand.head.getLong(3))
  }

  test("q29 semi join emits each qualifying customer exactly once") {
    val rows = Relational.q29(spark, sf).collect()
    val keys = rows.map(_.getLong(0))
    assert(keys.distinct.length == keys.length, "no duplicates from semi")
    val expect = graft.Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 480000)
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    assert(keys.toSet == expect)
  }

  test("x44 gram matrix is the full upper triangle with positive diagonal") {
    val rows = Similarity.x44(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(rows.size == 64 * 65 / 2)
    (0 until 64).foreach(i => assert(rows((i, i)) > 0, s"diag $i"))
    assert(rows.keys.forall { case (i, j) => i <= j })
  }

  test("x45 bigram scores are probabilities and bigram counts match") {
    val rows = TextOps.x45(spark, sf).collect()
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= 1000000))
    val nToks = graft.Tables.documents(spark, sf)
      .select(size(split(lower(col("text")), " ")).as("n"), col("doc_id"))
      .collect().map(r => r.getLong(1) -> r.getInt(0)).toMap
    rows.foreach(r =>
      assert(r.getLong(1) == math.max(0, nToks(r.getLong(0)) - 1)))
  }

  test("q19/q30 except and intersect partition the rich-customer set") {
    import spark.implicits._
    val rich = graft.Tables.customer(spark, sf)
      .filter(col("c_acctbal") > 1000).select("c_custkey").distinct().count()
    val except = Relational.q19(spark, sf).count()
    val intersect = Relational.q30(spark, sf).count()
    assert(except + intersect == rich)
  }

  test("x46 sequences are time-ordered regardless of partitioning") {
    val base = Sequences.x46(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // event count conservation
    assert(base.values.map(_._1).sum ==
      graft.Tables.events(spark, sf).count())
    base.values.foreach { case (n, seq) =>
      assert(seq.split(",", -1).length.toLong == n)
    }
    // a different physical ordering of the input must yield the same
    // sequences — ordering comes from sort_array, not arrival order
    val shuffled = Sequences
      .userSequences(graft.Tables.events(spark, sf).repartition(7))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(shuffled == base)
  }

  test("s10 latest-wins merge is idempotent and batch-split insensitive") {
    import spark.implicits._
    def t(rows: (String, Long, String)*) =
      rows.toDF("messageId", "timestamp", "status")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getString(2))).sortBy(_._1).toSeq
    val empty = t().filter(lit(false))
    val b1 = t(("a", 10L, "sent"), ("b", 5L, "sent"))
    val b2 = t(("a", 20L, "delivered"), ("c", 1L, "sent"),
      ("b", 5L, "delivered")) // same-ts tie for b: status max wins
    val once = StreamingQueries.latestWinsMerge(
      StreamingQueries.latestWinsMerge(empty, b1), b2)
    // idempotent: replaying b2 (the failure-retry case) changes nothing
    val twice = StreamingQueries.latestWinsMerge(once, b2)
    assert(canon(once) == canon(twice))
    // split-insensitive: one combined batch gives the same table
    val combinedBatch = b1.unionByName(b2)
      .groupBy("messageId")
      .agg(max(struct(col("timestamp"), col("status"))).as("m"))
      .select(col("messageId"), col("m.timestamp").as("timestamp"),
        col("m.status").as("status"))
    val oneShot = StreamingQueries.latestWinsMerge(empty, combinedBatch)
    assert(canon(once) == canon(oneShot))
    // "sent" > "delivered" lexicographically: the same-ts tie keeps it
    assert(canon(once) == Seq(("a", 20L, "delivered"),
      ("b", 5L, "sent"), ("c", 1L, "sent")))
  }

  test("s16 register-max merge is a join-semilattice (idempotent, split-insensitive)") {
    import spark.implicits._
    def regs(vs: Int*): Seq[Int] = {
      val r = new Array[Int](64)
      vs.foreach { v => val j = v % 64; if (v / 64 + 1 > r(j)) r(j) = v / 64 + 1 }
      r.toSeq
    }
    def t(rows: (String, Seq[Int])*) = rows.toDF("carrier", "regs")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getSeq[Int](1))
        .sortBy(_._1).toSeq
    val empty = t().filter(lit(false))
    val b1 = t("v" -> regs(1, 70, 200), "a" -> regs(5))
    val b2 = t("v" -> regs(70, 300), "t" -> regs(9, 9))
    val once = StreamingQueries.registersMaxMerge(
      StreamingQueries.registersMaxMerge(empty, b1), b2)
    // idempotent: replaying b2 is absorbed (semilattice, x <= x∨y)
    val twice = StreamingQueries.registersMaxMerge(once, b2)
    assert(canon(once) == canon(twice))
    // split-insensitive: folding the union in one step gives the same
    // table as the two incremental merges
    val combined = t("v" -> regs(1, 70, 200, 300), "a" -> regs(5),
      "t" -> regs(9, 9))
    assert(canon(once) == canon(
      StreamingQueries.registersMaxMerge(empty, combined)))
    // and elementwise: v's registers are the pointwise max of its batches
    val vRegs = canon(once).collectFirst { case ("v", r) => r }.get
    assert(vRegs == regs(1, 70, 200).zip(regs(70, 300)).map(p => p._1 max p._2))
  }

  test("s09 chained agg conserves the event count across both levels") {
    val rows = graft.operators.StreamingQueries
      .queries("s09_chained_agg")(spark, sf).collect()
    // every fixture event lands in exactly one hourly window; the
    // sentinel rows' year-2100 windows must never reach the sink
    assert(rows.map(_.getLong(1)).sum ==
      graft.Tables.events(spark, sf).count())
    assert(rows.forall(_.getLong(2) <= 3))
    assert(rows.forall(_.getLong(0) <
      graft.operators.StreamingQueries.Sentinel1Ms))
  }

  test("multimodal decode parses real PPM headers and pixel bodies") {
    val rows = graft.multimodal.Multimodal.m01(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val nBytes = r.getInt(2)
      val width = r.getInt(3); val height = r.getInt(4)
      val pixSum = r.getLong(6)
      assert(width >= 8 && width < 32)
      assert(height >= 8 && height < 32)
      // header + exactly 3wh pixel bytes
      assert(nBytes == s"P6\n$width $height\n255\n".length + 3 * width * height)
      assert(pixSum >= 0 && pixSum <= 3L * width * height * 255)
    }
  }
}
