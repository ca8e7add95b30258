package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(n: Int) =
    Seq((1L, (1 to n).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")

  private def chunks(n: Int, chunk: Int, overlap: Int): Seq[(Int, Int)] =
    Packing.chunkDocuments(doc(n), chunk, overlap)
      .orderBy("chunk_idx")
      .select($"chunk_idx", $"n_tokens").as[(Int, Int)].collect().toSeq

  test("chunk fan matches the documented count/coverage/overlap contract") {
    for ((len, chunk, overlap) <- Seq((100, 16, 4), (30, 16, 4), (129, 128, 32),
        (1, 8, 2), (16, 16, 4), (17, 16, 4))) {
      val step = chunk - overlap
      val got = chunks(len, chunk, overlap)
      val wantN = math.max(1, math.ceil((len - overlap).toDouble / step).toInt)
      assert(got.size == wantN, s"(len=$len chunk=$chunk ov=$overlap)")
      got.foreach { case (ci, nt) =>
        val want = math.min(chunk, len - ci * step)
        assert(nt == want, s"chunk $ci of (len=$len chunk=$chunk ov=$overlap)")
      }
      // full coverage: last chunk reaches the last token
      val (lastCi, lastN) = got.last
      assert(lastCi * step + lastN == len)
    }
  }

  test("consecutive chunks share exactly `overlap` token positions") {
    val got = chunks(100, 16, 4)
    got.sliding(2).foreach {
      case Seq((c1, n1), (c2, _)) =>
        val end1 = c1 * 12 + n1        // exclusive token end of chunk 1
        val start2 = c2 * 12           // inclusive token start of chunk 2
        assert(end1 - start2 == 4, s"chunks $c1/$c2")
      case _ =>
    }
  }

  test("fingerprints equal the portable hash of the joined chunk slice") {
    val words = (1 to 40).map(i => s"t$i")
    val got = Packing.chunkDocuments(doc(40), 16, 4)
      .orderBy("chunk_idx").select($"fp").as[Long].collect().toSeq
    val want = got.indices.map { ci =>
      graft.functions.PortableHash.h60(
        words.slice(ci * 12, ci * 12 + 16).mkString(" "))
    }
    assert(got == want)
  }

  test("the chunk fan is shuffle-free (pipelines with the scan)") {
    val plan = Packing.x54(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle\n$plan")
  }

  test("chunk dup report finds cross-doc boilerplate and only that") {
    // docs 1/2 share text → every chunk duplicated across both docs;
    // doc 3 is unique → contributes no report rows
    val shared = (1 to 40).map(i => s"s$i").mkString(" ")
    val docs = Seq((1L, shared), (2L, shared),
      (3L, (1 to 40).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val rep = Packing.chunkDupStats(docs, 16, 4)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val nChunks = math.max(1, math.ceil((40 - 4) / 12.0).toInt)
    assert(rep.size == nChunks, s"every shared chunk reported once: $rep")
    rep.foreach { case (_, copies, nDocs, firstDoc) =>
      assert(copies == 2 && nDocs == 2 && firstDoc == 1L, rep)
    }
  }
}
