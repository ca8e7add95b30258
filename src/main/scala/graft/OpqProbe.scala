package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main (not part of the library surface): agreement of the
  * PQ / OPQ ADC rankings and re-rank depths against IVF, at two SFs. */
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = Tables.embeddings(spark, sf)
      val qids = 0L until 10L
      def topk(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ivf = topk(operators.Similarity.annIvf(emb, qids))
      val pq = topk(operators.Similarity.annIvfPq(emb, qids))
      val rr = topk(operators.Similarity.annIvfPqRerank(emb, qids))
      val opq = topk(operators.Similarity.annIvfPqOpqRerank(emb, qids))
      val opqAdc = topk(operators.Similarity.annIvfPqOpq(emb, qids))
      def r(x: Set[(Long, Long)]) = x.intersect(ivf).size.toDouble / ivf.size
      val byDepth = Seq(30, 35, 40, 45, 50).map { dep =>
        f"opq$dep=${r(topk(operators.Similarity.annIvfPqOpqRerank(emb, qids, depth = dep)))}%.3f"
      }.mkString(" ")
      println(f"SF=$sf pqAdc=${r(pq)}%.3f opqAdc=${r(opqAdc)}%.3f rr50=${r(rr)}%.3f opq25=${r(opq)}%.3f $byDepth")
    }
    spark.stop()
  }
}
