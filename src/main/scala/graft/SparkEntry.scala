package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`: name → (session, sfDir) => DataFrame, one per implemented
  * operator from SURVEY.md §2. `oracleSql`: DuckDB-dialect equivalent of
  * each query over the same parquet tables (omitted only for operators
  * not expressible in SQL — those get a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Q12 (TPC-H Q1 shape) — scan → partial agg → final agg. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q12(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.Dedup.queries ++
      operators.SimJoin.queries ++
      operators.Similarity.queries ++
      operators.TextOps.queries ++
      operators.Pipeline.queries ++
      operators.AsOf.queries ++
      operators.RangeJoin.queries ++
      operators.Merge.queries ++
      operators.Clusters.queries ++
      operators.Decontaminate.queries ++
      operators.Sampling.queries ++
      operators.Semi.queries ++
      operators.Skew.queries ++
      operators.Sequences.queries ++
      operators.Bucketed.queries ++
      operators.Pca.queries ++
      operators.Packing.queries ++
      operators.Retrieval.queries ++
      operators.Hybrid.queries ++
      operators.Propagate.queries ++
      operators.SketchSim.queries ++
      operators.Bpe.queries ++
      operators.Funnel.queries ++
      operators.Diff.queries ++
      operators.Sketches.queries ++
      operators.StreamingQueries.queries ++
      multimodal.Multimodal.queries

  def oracleSql: Map[String, String] =
    operators.Relational.oracleSql ++
      operators.Dedup.oracleSql ++
      operators.SimJoin.oracleSql ++
      operators.Similarity.oracleSql ++
      operators.TextOps.oracleSql ++
      operators.Pipeline.oracleSql ++
      operators.AsOf.oracleSql ++
      operators.RangeJoin.oracleSql ++
      operators.Merge.oracleSql ++
      operators.Clusters.oracleSql ++
      operators.Decontaminate.oracleSql ++
      operators.Sampling.oracleSql ++
      operators.Semi.oracleSql ++
      operators.Skew.oracleSql ++
      operators.Sequences.oracleSql ++
      operators.Bucketed.oracleSql ++
      operators.Pca.oracleSql ++
      operators.Packing.oracleSql ++
      operators.Retrieval.oracleSql ++
      operators.Hybrid.oracleSql ++
      operators.Propagate.oracleSql ++
      operators.SketchSim.oracleSql ++
      operators.Bpe.oracleSql ++
      operators.Funnel.oracleSql ++
      operators.Diff.oracleSql ++
      operators.Sketches.oracleSql ++
      operators.StreamingQueries.oracleSql ++
      multimodal.Multimodal.oracleSql
}
